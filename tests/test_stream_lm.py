"""Always-on LM maintenance: streamed micro-batches ≡ retraining on the
final corpus; checkpoint resume applies only new files; epoch replay is
safe on both sides of the pointer flip (same genstate contract as the
dedup index / mview streams)."""

from __future__ import annotations

import datetime as dt
import json
import os

from cdc_audit_spark.operators.ngram_lm import train_ngram_lm

SCH = ("doc_id long, text string, audit_event string, "
       "audit_timestamp timestamp, audit_pk long")
TS = dt.datetime(2026, 1, 1)

BASE = [
    (1, "the cat sat on the mat"),
    (2, "the cat ate the fish"),
    (3, "a dog sat on a log"),
]

FINAL = [
    (1, "the cat sat on the mat"),
    (2, "the dog and the cat"),     # updated twice
    (4, "a cat and a dog"),         # inserted; doc 3 deleted
]


def _counts_set(df):
    return {(r["order"], r["gram"], r["cnt"]) for r in df.collect()}


def test_stream_lm_sync_manifest_matches_retrain(spark, tmp_path):
    """Exactly-once manifest form: drained micro-batches leave a counts
    LSM whose FOLD equals retraining on the final corpus; a restarted
    drain applies only new audit files."""
    from cdc_audit_spark.sinks.manifest import ManifestTable
    from cdc_audit_spark.streaming.stream_lm import (
        current_manifest_lm,
        stream_lm_sync_manifest,
    )

    src = str(tmp_path / "audit_src")
    batches = [
        [(i, t, "insert", TS, i) for i, (_, t) in enumerate(BASE, 1)],
        [(4, "a cat and a dog", "insert", TS, 10)],
        [(2, "the dog and the cat", "update", TS, 11),
         (3, "a dog sat on a log", "delete", TS, 12)],
    ]
    for rows in batches:
        spark.createDataFrame(
            [(r[0] if isinstance(r[0], int) else r[0],) + tuple(r[1:])
             for r in rows], SCH).coalesce(1).write.mode("append").parquet(src)

    base_p, counts_p = str(tmp_path / "base_t"), str(tmp_path / "counts_t")
    ck = str(tmp_path / "ck")
    schema = spark.read.parquet(src).schema
    q = stream_lm_sync_manifest(spark, src, schema, base_p, counts_p, ck,
                                "text", ["doc_id"], max_files_per_trigger=1)
    q.awaitTermination(240)

    final = [(1, BASE[0][1]), (2, "the dog and the cat"),
             (4, "a cat and a dog")]
    expect = train_ngram_lm(
        spark.createDataFrame(final, "doc_id long, text string"), "text", n=2)
    got_base, model = current_manifest_lm(spark, base_p, counts_p, n=2)
    assert _counts_set(model.counts) == _counts_set(expect.counts)
    assert model.total == expect.total
    assert {(r["doc_id"], r["text"])
            for r in got_base.select("doc_id", "text").collect()} \
        == set(final)
    # O(delta) storage: every post-bootstrap commit on both tables is an
    # append or a dir-granular merge, never a full-state overwrite
    base_t = ManifestTable(spark, base_p)
    counts_t = ManifestTable(spark, counts_p)
    assert all(counts_t.manifest(v)["action"] == "append"
               for v in counts_t.versions())
    acts = [base_t.manifest(v)["action"] for v in base_t.versions()]
    assert all(a in ("merge", "overwrite") for a in acts)
    assert "overwrite" not in acts[1:]  # only the bootstrap snapshots

    # restart with a new batch: only it applies
    spark.createDataFrame([(1, BASE[0][1], "delete", TS, 13)], SCH
                          ).coalesce(1).write.mode("append").parquet(src)
    q2 = stream_lm_sync_manifest(spark, src, schema, base_p, counts_p, ck,
                                 "text", ["doc_id"])
    q2.awaitTermination(120)
    expect2 = train_ngram_lm(
        spark.createDataFrame(final[1:], "doc_id long, text string"),
        "text", n=2)
    _, model2 = current_manifest_lm(spark, base_p, counts_p, n=2)
    assert _counts_set(model2.counts) == _counts_set(expect2.counts)


def test_lm_manifest_half_committed_replay_window(spark, tmp_path):
    """Crash BETWEEN the two commits: the counts LSM holds the epoch's
    delta append, the base merge never ran. The replay skips the counts
    half (epoch guard) and catches the base up (watermark guard) — zero
    double-application; replaying the whole epoch again is a no-op."""
    from cdc_audit_spark.operators.ngram_lm import (
        lm_from_counts,
        ngram_count_delta,
    )
    from cdc_audit_spark.sinks.manifest import ManifestTable
    from cdc_audit_spark.streaming.stream_lm import (
        apply_lm_manifest_epoch,
        current_manifest_lm,
    )

    base_t = ManifestTable(spark, str(tmp_path / "base_t"))
    counts_t = ManifestTable(spark, str(tmp_path / "counts_t"))
    b0 = spark.createDataFrame(
        [(i, t, "insert", TS, i) for i, (_, t) in enumerate(BASE, 1)], SCH)
    apply_lm_manifest_epoch(base_t, counts_t, b0, 0, "r1", "text", ["doc_id"])

    b1 = spark.createDataFrame(
        [(2, "the dog and the cat", "update", TS, 10)], SCH)
    # simulate the crash: commit ONLY the counts half of epoch 1 (the
    # epoch-tagged LSM delta append — the hook's own write shape)
    half = ngram_count_delta(base_t.read(), b1, "text", ["doc_id"], n=2)
    counts_t.append(half, extra={"epoch": 1, "run_id": "r1"})

    # replay epoch 1 through the hook: base catches up, counts skip
    apply_lm_manifest_epoch(base_t, counts_t, b1, 1, "r1", "text", ["doc_id"])
    final = [(1, BASE[0][1]), (2, "the dog and the cat"), (3, BASE[2][1])]
    expect = train_ngram_lm(
        spark.createDataFrame(final, "doc_id long, text string"), "text", n=2)
    _, got = current_manifest_lm(spark, base_t.path, counts_t.path, n=2)
    assert _counts_set(got.counts) == _counts_set(expect.counts)
    assert {(r["doc_id"], r["text"]) for r in
            base_t.read().select("doc_id", "text").collect()} == set(final)
    # replaying the whole epoch again is a durable no-op
    apply_lm_manifest_epoch(base_t, counts_t, b1, 1, "r1", "text", ["doc_id"])
    _, again = current_manifest_lm(spark, base_t.path, counts_t.path, n=2)
    assert _counts_set(again.counts) == _counts_set(expect.counts)


def test_lm_manifest_commits_scale_with_delta_not_corpus(spark, tmp_path):
    """VERDICT r08 #1 'done' criterion: a micro-batch's committed
    dirs/bytes scale with the DELTA, not the corpus. A 200-doc corpus is
    bootstrapped across 8 key-range dirs; a 2-doc batch then commits (a)
    a counts append whose bytes are a small fraction of the model, and
    (b) a base merge that rewrites ONLY the touched range dirs, carrying
    the rest verbatim."""
    from cdc_audit_spark.sinks.manifest import ManifestTable
    from cdc_audit_spark.streaming.stream_lm import apply_lm_manifest_epoch

    base_t = ManifestTable(spark, str(tmp_path / "base_t"))
    counts_t = ManifestTable(spark, str(tmp_path / "counts_t"))
    from pyspark.sql import functions as F

    boot = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document number "), F.col("id").cast("string"),
                 F.lit(" talks about topic "),
                 (F.col("id") % 17).cast("string")).alias("text"),
        F.lit("insert").alias("audit_event"),
        F.lit(TS).alias("audit_timestamp"),
        (F.col("id") + 1).alias("audit_pk"))
    apply_lm_manifest_epoch(base_t, counts_t, boot, 0, "r1", "text",
                            ["doc_id"], range_buckets=8)
    m0 = base_t.manifest(base_t.current_version())
    n_dirs0 = len(m0["dirs"])
    assert n_dirs0 >= 6  # the bootstrap laid out multiple range dirs

    def commit_stats(t):
        m = t.manifest(t.current_version())
        added = m.get("added", m["dirs"])
        meta = m.get("dir_meta", {})
        b = sum(int(meta.get(d, {}).get("bytes", 0)) for d in added)
        return added, b

    _, counts_bytes0 = commit_stats(counts_t)

    # tiny delta: two adjacent keys -> one touched range dir
    delta = spark.createDataFrame(
        [(3, "a fresh tiny document", "update", TS, 300),
         (4, "another fresh tiny one", "update", TS, 301)], SCH)
    apply_lm_manifest_epoch(base_t, counts_t, delta, 1, "r1", "text",
                            ["doc_id"], range_buckets=8)

    m1 = base_t.manifest(base_t.current_version())
    assert m1["action"] == "merge"
    rewritten = [d for d in m1["dirs"] if d not in set(m0["dirs"])]
    carried = [d for d in m1["dirs"] if d in set(m0["dirs"])]
    # only the touched range dir(s) were rewritten; the rest carried
    assert len(rewritten) <= 2
    assert len(carried) >= n_dirs0 - 2
    # counts commit: the delta append is a fraction of the model
    counts_added, counts_bytes1 = commit_stats(counts_t)
    assert counts_bytes1 < counts_bytes0 / 3


def test_stream_lm_quality_gate_accepts_fluent_rejects_junk(spark, tmp_path):
    """The streaming quality gate scores each batch under the maintained
    PRE-batch model: bootstrap passes through unscored (no model mass),
    later batches keep fluent docs and reject junk; the accepted table
    equals a manual recompute with the same pre-batch model, and a
    restarted drain appends nothing (exactly-once)."""
    from cdc_audit_spark.operators.ngram_lm import (
        fold_ngram_count_deltas,
        lm_from_counts,
        score_perplexity,
    )
    from cdc_audit_spark.sinks.manifest import ManifestTable
    from cdc_audit_spark.streaming.stream_lm import stream_lm_quality_gate

    src = str(tmp_path / "src")
    boot = [(i, t, "insert", TS, i) for i, (_, t) in enumerate(BASE, 1)]
    b2 = [(10, "the cat sat on the mat again", "insert", TS, 10),
          (11, "zxqv wrbl kpth znorg vlmx qwpt", "insert", TS, 11)]
    for rows in (boot, b2):
        spark.createDataFrame(rows, SCH).coalesce(1).write.mode(
            "append").parquet(src)

    base_p, counts_p = str(tmp_path / "base_t"), str(tmp_path / "counts_t")
    acc_p, ck = str(tmp_path / "acc_t"), str(tmp_path / "ck")
    schema = spark.read.parquet(src).schema
    q = stream_lm_quality_gate(
        spark, src, schema, base_p, counts_p, acc_p, ck,
        "text", ["doc_id"], max_avg_neg_log10=1.5,
        max_files_per_trigger=1)
    q.awaitTermination(240)

    acc = ManifestTable(spark, acc_p)
    got = {(r["doc_id"], r["text"]) for r in acc.read().collect()}
    assert (10, b2[0][1]) in got        # fluent: bootstrap bigrams
    assert (11, b2[1][1]) not in got    # junk: all-OOV, rejected
    assert {d for d, _ in got} >= {1, 2, 3}  # bootstrap passed through

    # the gate's decision equals a manual recompute under the pre-batch
    # model (counts as of the bootstrap epoch)
    counts_t = ManifestTable(spark, counts_p)
    pre = counts_t.versions()[0]
    model = lm_from_counts(
        fold_ngram_count_deltas(counts_t.read(pre)), n=2)
    b2df = spark.createDataFrame(b2, SCH).drop(
        "audit_event", "audit_timestamp", "audit_pk")
    scored = {r["doc_id"]: -r["avg_log10_score"] for r in score_perplexity(
        b2df, "text", "doc_id", model, micro=True).collect()}
    assert scored[10] <= 1.5 < scored[11]

    # restarted drain: nothing new -> no duplicate appends
    n0 = acc.read().count()
    q2 = stream_lm_quality_gate(
        spark, src, schema, base_p, counts_p, acc_p, ck,
        "text", ["doc_id"], max_avg_neg_log10=1.5)
    q2.awaitTermination(120)
    assert acc.read().count() == n0
    # and the LM kept maintaining through the gate: the model now holds
    # batch-2 grams too
    _, live = __import__("cdc_audit_spark.streaming.stream_lm",
                         fromlist=["current_manifest_lm"]
                         ).current_manifest_lm(spark, base_p, counts_p)
    grams = {r["gram"] for r in live.counts.filter("order = 1").collect()}
    assert "zxqv" in grams and "again" in grams


def test_lm_counts_fold_then_vacuum_reclaims_delta_dirs(spark, tmp_path):
    """LSM lifecycle close-out: after enough epochs the fold fires
    (maybe_fold_lm_counts), and a vacuum then RECLAIMS the superseded
    delta dirs — the counts table's disk footprint tracks the model,
    not the history — while the fold's inherited epoch guard and the
    live model survive."""
    import os

    from cdc_audit_spark.operators.ngram_lm import train_ngram_lm
    from cdc_audit_spark.sinks.manifest import ManifestTable
    from cdc_audit_spark.streaming.stream_lm import (
        apply_lm_manifest_epoch,
        current_manifest_lm,
    )

    base_t = ManifestTable(spark, str(tmp_path / "base_t"))
    counts_t = ManifestTable(spark, str(tmp_path / "counts_t"))
    docs = [(i, f"doc number {i} talks about topic {i % 3}") for i in range(8)]
    for e, (i, t) in enumerate(docs):
        b = spark.createDataFrame([(i, t, "insert", TS, e + 1)], SCH)
        apply_lm_manifest_epoch(base_t, counts_t, b, e, "r1", "text",
                                ["doc_id"], fold_max_dirs=3)

    def live_dirs():
        m = counts_t.manifest(counts_t.current_version())
        return set(m["dirs"])

    all_dirs = {d for v in counts_t.versions()
                for d in counts_t.manifest(v)["dirs"]}
    assert len(all_dirs) > len(live_dirs())  # history holds stale deltas

    got = counts_t.vacuum(keep_versions=1, force=True)
    assert got["data_dirs"] > 0            # superseded deltas reclaimed
    for d in all_dirs - live_dirs():
        assert not os.path.exists(os.path.join(counts_t.path, d))

    # guard + model intact after the sweep
    assert counts_t.epoch_applied(7, "r1")
    _, model = current_manifest_lm(spark, base_t.path, counts_t.path)
    expect = train_ngram_lm(
        spark.createDataFrame(docs, "doc_id long, text string"), "text", n=2)
    assert _counts_set(model.counts) == _counts_set(expect.counts)


def test_lm_manifest_debit_reads_fraction_of_base_dirs(spark, tmp_path):
    """VERDICT r09 #1 'done' criterion — the READ-side twin of the
    O(delta) commit proof above: a 2-doc batch onto a 200-doc replica
    laid out as 8 key-range dirs computes its debit by LISTING only the
    touched dirs (never the full replica), and the maintained counts
    still equal retraining on the final corpus."""
    from pyspark.sql import functions as F

    from cdc_audit_spark.operators.ngram_lm import fold_ngram_count_deltas
    from cdc_audit_spark.sinks.manifest import ManifestTable
    from cdc_audit_spark.streaming.stream_lm import apply_lm_manifest_epoch

    base_t = ManifestTable(spark, str(tmp_path / "base_t"))
    counts_t = ManifestTable(spark, str(tmp_path / "counts_t"))
    boot = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document number "), F.col("id").cast("string"),
                 F.lit(" talks about topic "),
                 (F.col("id") % 17).cast("string")).alias("text"),
        F.lit("insert").alias("audit_event"),
        F.lit(TS).alias("audit_timestamp"),
        (F.col("id") + 1).alias("audit_pk"))
    apply_lm_manifest_epoch(base_t, counts_t, boot, 0, "r1", "text",
                            ["doc_id"], range_buckets=8)
    n_dirs0 = len(base_t.manifest(base_t.current_version())["dirs"])
    assert n_dirs0 >= 6

    reads = []
    orig = base_t._read_dirs_dv

    def spy(m, dirs, at_version=None):
        reads.append(list(dirs))
        return orig(m, dirs, at_version=at_version)

    base_t._read_dirs_dv = spy
    delta = spark.createDataFrame(
        [(3, "a fresh tiny document", "update", TS, 300),
         (4, "another fresh tiny one", "update", TS, 301)], SCH)
    apply_lm_manifest_epoch(base_t, counts_t, delta, 1, "r1", "text",
                            ["doc_id"], range_buckets=8)
    base_t._read_dirs_dv = orig

    # every base listing during the epoch touched a fraction of the dirs
    assert reads, "the debit read never went through the manifest reader"
    assert max(len(d) for d in reads) <= 2 < n_dirs0

    # and the maintained model is still exact: folded counts == retrain
    final = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") == 3, F.lit("a fresh tiny document"))
        .when(F.col("id") == 4, F.lit("another fresh tiny one"))
        .otherwise(F.concat(F.lit("document number "),
                            F.col("id").cast("string"),
                            F.lit(" talks about topic "),
                            (F.col("id") % 17).cast("string")))
        .alias("text"))
    want = train_ngram_lm(final, "text", n=2)
    got = fold_ngram_count_deltas(counts_t.read())
    assert _counts_set(got) == _counts_set(want.counts)
