#!/usr/bin/env python
"""Generate PLANS.md: a physical-plan audit of every registered query.

For each query in the registry, count the plan features that determine
scale behavior — parquet scans, shuffle exchanges, broadcast joins,
sort-merge joins, global-sort stages, whole-stage-codegen coverage — and
flag the shapes that would NOT survive a 100× scale-up (single-partition
windows, nested-loop joins, global sorts that aren't top-k).

Run: python tools/plan_audit.py [sf_dir]   (writes PLANS.md at repo root)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def audit(plan: str) -> dict:
    return {
        "scans": plan.count("Scan parquet"),
        "exchanges": plan.count("Exchange hashpartitioning"),
        "range_exchanges": plan.count("Exchange rangepartitioning"),
        "single_part": plan.count("Exchange SinglePartition"),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "nlj": plan.count("BroadcastNestedLoopJoin") + plan.count("CartesianProduct"),
        "topk": plan.count("TakeOrderedAndProject"),
        "codegen": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "python": plan.count("MapInPandas")
        + plan.count("ArrowEvalPython")
        + plan.count("BatchEvalPython")
        + plan.count("FlatMapGroupsInPandas"),
    }


# Flagged-but-documented cases: the flag is real, the design is deliberate.
_CDC_NOTE_FWD = (
    "audit_pk assignment is size-gated (capture.assign_audit_pk auto): at "
    "this audit's KB-scale change set it compiles to a bounded single-task "
    "window; the audit re-compiled the query with the gate forced to its "
    "at-scale side and verified the window re-plans to the distributed "
    "range-exchange + Arrow shape (both gate sides pinned in test_capture)"
)

EXPLANATIONS = {
    "dedup_embedding_cosine": "exact all-pairs baseline is inherently O(N²); "
    "the scale path is `ann_embedding_pairs` (LSH buckets) / `ann_ivf_topk`",
    "q22_idle_rich_customers": "BroadcastNestedLoopJoin's build side is the "
    "1-row scalar-subquery result — the standard scalar-subquery plan",
    "cdc_diff_customer": _CDC_NOTE_FWD,
    "window_percent_rank": "the range exchange + Arrow stage is the "
    "scale-safe ranked export (operators.ranks): parallel range-partitioned "
    "row ids + closed-form percent_rank/cume_dist — replaced the "
    "single-partition global window in r02",
    "ntile_price_quartiles": "same ranked-export machinery: positional "
    "ntile arithmetic over distributed row ids — no single-partition "
    "window",
    "cdc_keep_last": "keep-last parity op: orderBy desc + limit 1 — output "
    "is one row",
    "events_funnel": "funnel step-match window is per-user; the single "
    "partition is the final step-count aggregate (bounded)",
}

_CDC_NOTE = "derives from the audit log built by snapshot_diff: " + _CDC_NOTE_FWD
for _q in ("cdc_audit_stats", "cdc_incremental_scan", "cdc_keep_last_per_key",
           "cdc_replay_state", "cdc_watermark_recovery", "cdc_incremental_agg",
           "cdc_scd2_history"):
    EXPLANATIONS.setdefault(_q, _CDC_NOTE)

_ARROW_NOTE = (
    "deliberate Arrow-batched numpy stage — measured faster than the "
    "interpreted higher-order-function SQL form (see module docstring)"
)
for _q in ("ann_embedding_pairs", "dedup_minhash_lsh", "dedup_ngram_jaccard",
           "multimodal_features"):
    EXPLANATIONS.setdefault(_q, _ARROW_NOTE)

EXPLANATIONS["sample_unimax_budget"] = (
    "the water-filling windows run over the per-LANGUAGE table (one row "
    "per group, bounded by group cardinality); the corpus sees only the "
    "group-count aggregate"
)
EXPLANATIONS["text_compression_ratio"] = (
    "zlib deflate has no Catalyst form; Arrow-batched C deflate, map-side "
    "(same cost model as the multimodal codec path)"
)
EXPLANATIONS["dedup_ngram_jaccard_exact"] = (
    "the candidate cross-pairs come from an id-bounded (< 64) non-equi "
    "self-join — the hash-checked analog of the LSH verify stage; at scale "
    "candidates come from MinHash-LSH buckets (dedup_ngram_jaccard)"
)
EXPLANATIONS["dedup_levenshtein_pairs"] = (
    "bounded (< 48 ids) non-equi self-join — exact edit-distance verify "
    "baseline; at scale run inside LSH buckets like the cosine baseline"
)
EXPLANATIONS["corpus_source_accounting"] = (
    "the share-of-total window runs over the already-aggregated per-source "
    "frame — cardinality = number of sources, bounded at any corpus size"
)
EXPLANATIONS["cdc_state_asof"] = _CDC_NOTE
EXPLANATIONS["cdc_diff_event_counts"] = _CDC_NOTE
EXPLANATIONS["q11_important_parts"] = (
    "BroadcastNestedLoopJoin's build side is the 1-row global-total scalar "
    "— the standard scalar-subquery plan (same shape as q22)"
)
EXPLANATIONS["bpe_trained_token_counts"] = (
    "rank-greedy BPE merge application is inherently sequential per word "
    "(no Catalyst form); the Arrow stage memoizes per unique word, so "
    "Python cost tracks the vocabulary, not the corpus (see operators.bpe)"
)
EXPLANATIONS["quality_classifier_scores"] = (
    "the python stage is the bounded per-iteration gradient aggregate "
    "(n_buckets rows); scoring itself is zero-shuffle codegen — "
    "plan-asserted in test_classifier"
)
EXPLANATIONS["pack_chunks_bestfit"] = (
    "best-fit-decreasing packing is sequential per group (no Catalyst "
    "form); the Arrow stage holds only (key, size) pairs per group and "
    "groups pack in parallel — see sampling.pack_chunks_bfd"
)
EXPLANATIONS["hybrid_rrf_topk"] = (
    "the single-partition windows rank each retriever's OWN bounded "
    "top-100 head (TakeOrdered output, never the corpus); the fusion "
    "join touches two ≤100-row frames — RRF fuses heads by construction "
    "(see bm25.rrf_fuse); the python stage is the BM25 scan scorer's "
    "deliberate Arrow tokenize+count pass (see bm25_topk's note)"
)
_BM25_ARROW_NOTE = (
    "the scan scorer's per-doc tokenize+count is a deliberate Arrow "
    "stage — the Catalyst forms re-evaluate each per-term count tree "
    "once per reference (interpreted HOFs get no CSE; CollapseProject "
    "inlines regex-split counts into every consumer), measured ~2s vs "
    "~0.1s for a 5k-doc pass; one narrow map behind the scan, zero "
    "shuffle, integer micro arithmetic identical to the oracle (see "
    "operators.bm25.bm25_score_scan)"
)
for _q in ("bm25_topk", "hybrid_rrf_topk", "cdc_bm25_serving_topk"):
    EXPLANATIONS.setdefault(_q, _BM25_ARROW_NOTE)

_PCA_NOTE = (
    "the Arrow stage is the quantized-covariance partial pass — per-row "
    "float work + int64 partial sums emitted once per batch (d(d+1)/2 "
    "BIGINTs), the order-independent formulation that makes the matrix "
    "bit-identical under any partitioning and oracle-checkable; no "
    "Catalyst form computes 2080 per-row products without exploding rows "
    "(see operators.pca)"
)
EXPLANATIONS["pca_covariance_q"] = _PCA_NOTE
EXPLANATIONS["pca_embedding_projection"] = _PCA_NOTE
EXPLANATIONS["cdc_pca_moments_sync"] = (
    "python×3 = the same quantized-moment Arrow partial pass run on the "
    "three bounded inputs (bootstrap corpus, debited old images, credited "
    "finals) — each per-row + one partial row per batch; see "
    "operators.pca moments_delta"
)
EXPLANATIONS["ann_pq_topk"] = (
    "PQ encode + asymmetric-distance scan are Arrow-batched numpy stages "
    "(argmin/matmul kernels — the compressed-domain math has no Catalyst "
    "form); the rerank stage is JVM-side cosine over broadcast candidates"
)
EXPLANATIONS["ts_subsequence_long"] = (
    "BroadcastNestedLoopJoin's build side is the m-row (j, q_j) "
    "coefficient table — the deliberate bounded fan-out that keeps the "
    "plan width CONSTANT in the query length (the short form compiles "
    "one lead() tap per point and is capped at 512); each point emits m "
    "exact BIGINT nano-grain contributions folded by one (key, start) "
    "aggregate (see operators.timeseries.znorm_distances_long)"
)


def flags(a: dict, name: str, plan: str) -> str:
    out = []
    if a["nlj"]:
        out.append("NESTED-LOOP")
    if a["range_exchanges"] and not a["topk"]:
        out.append("global-sort")
    if a["single_part"]:
        # a single-partition exchange feeding a final global aggregate is a
        # bounded (≤ one row per agg) reduce — fine; feeding a Window or a
        # big sort is the scale smell
        if "Window" in plan:
            out.append("GLOBAL-WINDOW")
        elif a["single_part"] == 1 and plan.count("HashAggregate") >= 2:
            pass  # partial → final global agg, bounded
        else:
            out.append("single-partition-stage")
    if a["python"]:
        out.append(f"python×{a['python']}")
    return " ".join(out) or "ok"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from cdc_audit_spark.queries import _REGISTRY
    from cdc_audit_spark.session import get_spark

    spark = get_spark(app_name="plan-audit", cpus=8, shuffle_partitions=8)
    rows, flagged = [], []
    for name, qd in sorted(_REGISTRY.items()):
        try:
            # Cold-cache plans: a prior query's persisted fragments would
            # otherwise substitute into this plan (accurate small stats flip
            # capture's auto pk strategy to the informed window path) and
            # the audit would record warm-session shapes instead of the
            # conservative cold ones a fresh cluster run sees.
            spark.catalog.clearCache()
            plan = qd.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # streaming-only entries etc.
            rows.append((name, None, f"(not plannable in batch: {type(e).__name__})"))
            continue
        a = audit(plan)
        fl = flags(a, name, plan)
        if "GLOBAL-WINDOW" in fl:
            # Verify the gate instead of trusting a hard-coded list: force
            # capture's size gate to its at-scale side and re-compile. If
            # the global window re-plans away (distributed id assignment),
            # the shape is size-gated — correct at both ends of the gate —
            # not a scale bug.
            import cdc_audit_spark.capture as capture

            saved = capture._WINDOW_MAX_EST_BYTES
            capture._WINDOW_MAX_EST_BYTES = 0
            try:
                spark.catalog.clearCache()
                big_plan = (
                    qd.fn(spark, sf_dir)._jdf.queryExecution()
                    .executedPlan().toString()
                )
                if "GLOBAL-WINDOW" not in flags(audit(big_plan), name, big_plan):
                    fl = fl.replace("GLOBAL-WINDOW", "size-gated-window")
            finally:
                capture._WINDOW_MAX_EST_BYTES = saved
        rows.append((name, a, fl))
        if fl != "ok":
            flagged.append((name, fl))

    lines = [
        "# PLANS — physical-plan audit of the query surface",
        "",
        f"Auto-generated by `tools/plan_audit.py` at {sf_dir} "
        "(regenerate after plan-affecting changes; tests/test_plans.py pins "
        "the load-bearing shapes).",
        "",
        "Legend: scans = parquet scans · xchg = hash-shuffle exchanges · "
        "bhj/smj = broadcast/sort-merge joins · topk = TakeOrdered · "
        "wscg = whole-stage-codegen spans · flags = scale concerns "
        "(`python×N` = Arrow-batched Python stages, deliberate; "
        "`single-partition-stage` = a global window/limit — only on "
        "bounded-size intermediates; `size-gated-window` = a "
        "single-partition window chosen by capture's size gate for this "
        "audit's KB-scale input, VERIFIED here to re-plan to the "
        "distributed range-exchange shape when the gate reads large — the "
        "shape a 100 TB run gets).",
        "",
        "| query | scans | xchg | bhj | smj | topk | wscg | flags |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, a, fl in rows:
        if a is None:
            lines.append(f"| `{name}` | — | — | — | — | — | — | {fl} |")
        else:
            lines.append(
                f"| `{name}` | {a['scans']} | {a['exchanges']} | {a['bhj']} | "
                f"{a['smj']} | {a['topk']} | {a['codegen']} | {fl} |"
            )
    lines += [
        "",
        f"**{len(rows)} queries audited; {len(flagged)} flagged.**",
        "",
    ]
    if flagged:
        lines.append("Flagged queries and why the shape is deliberate:")
        lines.append("")
        for name, fl in flagged:
            why = EXPLANATIONS.get(name, "")
            lines.append(f"- `{name}` — {fl}" + (f": {why}" if why else ""))
        lines.append("")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}: {len(rows)} queries, {len(flagged)} flagged")
    spark.stop()


if __name__ == "__main__":
    main()
