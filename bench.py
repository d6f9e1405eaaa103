#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing = full query execution including the action (count on the result —
forces the whole plan without driver-side collection of wide rows).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "cdc_diff_customer",
    "cdc_incremental_scan",
    "cdc_keep_last_per_key",
    "cdc_replay_state",
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "topk_orders_per_customer",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_token_stats",
    "knn_cosine_topk",
    "events_hourly_stats",
    "events_sessionize",
    "asof_join_error_purchase",
    "events_sliding_window",
    "ann_embedding_pairs",
    "q6_forecast_revenue",
    "q18_large_orders",
    "window_running_total",
    "text_top_bigrams",
    "events_funnel",
    "dedup_embedding_cosine",
    "q17_small_quantity_revenue",
    "range_join_click_windows",
    "cdc_incremental_agg",
    "q7_nation_volume",
    "q13_order_count_distribution",
    "q21_sole_late_supplier",
    "sample_split_train_valid",
    "shard_global_shuffle",
    "pack_token_chunks",
    "tfidf_top_terms",
    "cdc_state_asof",
    "events_cohort_retention",
    "decontam_benchmark_overlap",
    "text_repetition_stats",
    "events_transition_matrix",
    "q9_profit_by_nation_year",
    "events_hourly_anomalies",
    # r9 retrieval tier (appended, so every prior round's per-query
    # comparisons stay aligned; compare totals per-query, not headline
    # sums, across rounds that changed this list)
    "bm25_topk",
    "hybrid_rrf_topk",
    # r10: the windows-only subsequence search and the portable SimHash
    # fingerprint (both pure-Catalyst operators worth tracking per round)
    "ts_subsequence_match",
    "dedup_simhash",
    # r11: the one-shot fingerprint-edge clustering, now star-edge
    # seeded (linear per fingerprint group — the r10 quadratic fix)
    "dedup_components_labels",
    # r13: the verified near-dup clustering pipeline (winnow-pinned
    # candidates -> Jaccard verify -> components -> survivors)
    "dedup_cluster_verified",
]

# r13 (VERDICT r12 item 5): the maintained-STATE paths, which the
# one-shot kernels above never exercise at sf0.1 — each is a full
# multi-epoch drain over fresh manifest tables (state commits,
# folds/compaction policies, epoch guards included in the timing).
# Their cost is dominated by per-epoch fixed overhead (5 resp. 3 epochs
# of small Spark jobs + manifest commits), not data volume: first r13
# measurements are the baseline, later rounds must stay within 2x.
# Timed in their OWN phase AFTER the sentinel-bracketed classic pass:
# hundreds of small jobs + tempdir state churn between the two classic
# passes would inject GC/scheduler noise into numbers every prior
# round's artifact is compared against.
DRAINS = [
    "cdc_ts_reorder_keyed",   # 4 skewed epochs + flush, per-key wm
    "cdc_components_sync",    # 3 insert epochs, resolve/compact wired
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

    # Ambient load BEFORE Spark starts: anything above ~a few here is other
    # processes competing for the same cores, and the timings below are
    # inflated by contention, not plan regressions.
    try:
        load_ambient = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load_ambient = None

    from cdc_audit_spark.queries import queries
    from cdc_audit_spark.session import get_spark

    spark = get_spark(app_name="cdc_audit_spark-bench", cpus=cpus,
                      shuffle_partitions=cpus)
    qs = queries()

    # Warm-up: run every headline query once at the smallest SF. This
    # compiles the same whole-stage-codegen plans and spins up Python
    # workers, so the timed pass measures execution at the target SF, not
    # one-shot JIT/codegen/worker-fork costs (~0.5 s/query of pure
    # compilation otherwise).
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in HEADLINE + DRAINS:
        try:
            qs[name](spark, warm_dir).count()
        except Exception:
            pass  # warm-up is best-effort; the timed run surfaces real errors

    settle_target = float(os.environ.get("SPARK_GRAFT_SETTLE_LOAD", "1.0"))
    settle_max = float(os.environ.get("SPARK_GRAFT_SETTLE_MAX_SEC", "180"))
    drift_max = float(os.environ.get("SPARK_GRAFT_SENTINEL_DRIFT_MAX", "0.10"))
    max_attempts = int(os.environ.get("SPARK_GRAFT_BENCH_ATTEMPTS", "3"))
    sentinel = "text_token_stats"

    def settle() -> tuple[list | None, float]:
        # Settle-wait (VERDICT r07 item 5): the r6/r7 artifacts were
        # captured at ambient loadavg > 2 and their "regressions" were
        # other tenants. Hold the timed pass until the 1-min loadavg
        # drops below the target (bounded — a busy box eventually
        # proceeds and the env block shows it). Spark is idle here.
        waited = 0.0
        try:
            while (os.getloadavg()[0] > settle_target
                   and waited < settle_max):
                time.sleep(5)
                waited += 5
            return [round(x, 2) for x in os.getloadavg()], waited
        except OSError:
            return None, waited

    def timed_pass() -> dict[str, float]:
        # Two timed passes per query, keep the min: steady-state
        # throughput rather than one-off scheduler/GC noise (run-to-run
        # variance on local[32] is ±20% otherwise).
        t: dict[str, float] = {}
        for _ in range(2):
            for name in HEADLINE:
                fn = qs[name]
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                elapsed = round(time.perf_counter() - t0, 4)
                if name not in t or elapsed < t[name]:
                    t[name] = elapsed
        return t

    # Self-adjudicating measurement (VERDICT r08 item 3): the sentinel —
    # one cheap map-only query re-timed after the full pass — detects
    # mid-bench contention; three rounds of committed artifacts were
    # noise the sentinel had flagged but nothing acted on. Now a pass
    # whose sentinel re-run drifts beyond the threshold is DISCARDED and
    # re-run (bounded attempts); the artifact records every attempt so
    # a still-dirty final accept is visible, not ambiguous.
    attempts: list[dict] = []
    per_attempt_timings: list[dict[str, float]] = []
    for attempt in range(1, max_attempts + 1):
        load_settled, settle_waited = settle()
        timings = timed_pass()
        t0 = time.perf_counter()
        qs[sentinel](spark, sf_dir).count()
        sentinel_sec = round(time.perf_counter() - t0, 4)
        drift = (abs(sentinel_sec - timings[sentinel])
                 / max(timings[sentinel], 1e-9))
        per_attempt_timings.append(timings)
        attempts.append({
            "total_sec": round(sum(timings.values()), 4),
            "sentinel_timed_sec": timings[sentinel],
            "sentinel_rerun_sec": sentinel_sec,
            "sentinel_drift": round(drift, 4),
            "loadavg_settled_pretimed": load_settled,
            "settle_waited_sec": settle_waited,
        })
        if drift <= drift_max:
            break
    # accept the lowest-drift attempt (normally the last — a clean one
    # breaks the loop; when every attempt was contended the reader sees
    # sentinel_drift > drift_max plus every attempt's numbers, so the
    # artifact adjudicates itself)
    best_i = min(range(len(attempts)),
                 key=lambda i: attempts[i]["sentinel_drift"])
    best = attempts[best_i]
    timings = per_attempt_timings[best_i]

    # Maintained-state drains, in their own phase (see DRAINS): two
    # passes, keep the min, AFTER the accepted classic window so their
    # job/state churn can't pollute the cross-round-comparable numbers.
    # A trailing sentinel probe records (env-only, non-gating) whether
    # the box degraded during this phase.
    for _ in range(2):
        for name in DRAINS:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            elapsed = round(time.perf_counter() - t0, 4)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed
    t0 = time.perf_counter()
    qs[sentinel](spark, sf_dir).count()
    sentinel_post_drains = round(time.perf_counter() - t0, 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        loadavg = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        loadavg = None
    # Environment metadata: lets a reader distinguish "plan regression"
    # from "contended sandbox" without re-running the bench. Printed as
    # its OWN line, BEFORE the result line: the external recorder keeps
    # only the last ~2000 chars of stdout and parses the final line as
    # JSON, so the result line below must be self-contained and compact
    # (VERDICT r11 item 4 — every prior round's artifact had the bulky
    # env blob inline, pushing the line past the capture window and
    # leaving the recorder's parsed field null).
    print(json.dumps({
        "env": {
            "loadavg_ambient_prestart": load_ambient,
            "loadavg_settled_pretimed": best["loadavg_settled_pretimed"],
            "settle_waited_sec": best["settle_waited_sec"],
            "loadavg_1_5_15": loadavg,
            "os_cpus": os.cpu_count(),
            "spark_cpus": cpus,
            "unix_ts": round(time.time(), 1),
            "sentinel": sentinel,
            "sentinel_timed_sec": best["sentinel_timed_sec"],
            "sentinel_rerun_sec": best["sentinel_rerun_sec"],
            "sentinel_post_drains_sec": sentinel_post_drains,
            "sentinel_drift_max": drift_max,
            "attempts": attempts,
        },
    }, separators=(",", ":")))
    result_line = json.dumps({
        "metric": "headline_queries_total_runtime",
        # all timed queries (classic + drains) so value == sum(queries);
        # attempts[].total_sec stays classic-only (the settled window)
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "clean": best["sentinel_drift"] <= drift_max,
        "sentinel_drift": best["sentinel_drift"],
    }, separators=(",", ":"))
    # Hard guard on the capture-window contract: better to fail loudly in
    # a local run than to commit another tail-truncated artifact.
    assert len(result_line) < 1950, len(result_line)
    print(result_line)
    spark.stop()


if __name__ == "__main__":
    main()
