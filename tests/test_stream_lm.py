"""Always-on LM maintenance: streamed micro-batches ≡ retraining on the
final corpus; checkpoint resume applies only new files; epoch replay is
safe on both sides of the pointer flip (same genstate contract as the
dedup index / mview streams)."""

from __future__ import annotations

import datetime as dt
import json
import os

from cdc_audit_spark.operators.ngram_lm import train_ngram_lm
from cdc_audit_spark.streaming.stream_lm import (
    apply_lm_epoch,
    current_lm,
    stream_lm_sync,
)

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


def test_stream_lm_sync_matches_retrain(spark, tmp_path):
    base = spark.createDataFrame(BASE, "doc_id long, text string")
    batches = [
        [(4, "a cat and a dog", "insert", TS, 1)],
        [(2, "the fish ate the dog", "update", TS, 2),
         (3, "a dog sat on a log", "delete", TS, 3)],
        [(2, "the dog and the cat", "update", TS, 4)],
    ]
    src = str(tmp_path / "audit_src")
    for rows in batches:
        spark.createDataFrame(rows, SCH).coalesce(1).write.mode(
            "append").parquet(src)

    state = str(tmp_path / "lm_state")
    q = stream_lm_sync(
        spark, src, spark.read.parquet(src).schema, state,
        str(tmp_path / "ck"), base, "text", ["doc_id"],
        max_files_per_trigger=1)
    q.awaitTermination(240)

    final_base, model = current_lm(spark, state)
    expect = train_ngram_lm(
        spark.createDataFrame(FINAL, "doc_id long, text string"), "text", n=2)
    assert _counts_set(model.counts) == _counts_set(expect.counts)
    assert model.total == expect.total
    got_base = {(r["doc_id"], r["text"]) for r in final_base.collect()}
    assert got_base == set(FINAL)


def test_stream_lm_sync_resumes_from_checkpoint(spark, tmp_path):
    base = spark.createDataFrame(BASE[:1], "doc_id long, text string")
    src = str(tmp_path / "audit_src")
    state = str(tmp_path / "lm_state")
    ck = str(tmp_path / "ck")
    spark.createDataFrame([(2, "the cat ate", "insert", TS, 1)], SCH
                          ).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    q = stream_lm_sync(spark, src, schema, state, ck, base, "text", ["doc_id"])
    q.awaitTermination(120)

    spark.createDataFrame([(1, BASE[0][1], "delete", TS, 2)], SCH
                          ).coalesce(1).write.mode("append").parquet(src)
    q2 = stream_lm_sync(spark, src, schema, state, ck, base, "text", ["doc_id"])
    q2.awaitTermination(120)

    _, model = current_lm(spark, state)
    expect = train_ngram_lm(
        spark.createDataFrame([(2, "the cat ate")], "doc_id long, text string"),
        "text", n=2)
    # doc 1's grams debited once, not twice (no double-apply on resume)
    assert _counts_set(model.counts) == _counts_set(expect.counts)


def test_lm_epoch_replay_both_crash_windows(spark, tmp_path):
    base = spark.createDataFrame(BASE, "doc_id long, text string")
    state = str(tmp_path / "lm_state")
    b1 = spark.createDataFrame([(4, "a cat and a dog", "insert", TS, 1)], SCH)
    b2 = spark.createDataFrame([(3, "a dog sat on a log", "delete", TS, 2)], SCH)

    apply_lm_epoch(spark, state, b1, 0, base, "text", ["doc_id"], run_id="r1")
    _, m1 = current_lm(spark, state)
    snap1 = _counts_set(m1.counts)

    # replay AFTER the flip: durable no-op
    apply_lm_epoch(spark, state, b1, 0, base, "text", ["doc_id"], run_id="r1")
    _, m1b = current_lm(spark, state)
    assert _counts_set(m1b.counts) == snap1

    # crash BEFORE the flip of epoch 1: first attempt wrote nothing —
    # a replay re-derives the identical counts from gen 0
    apply_lm_epoch(spark, state, b2, 1, base, "text", ["doc_id"], run_id="r1")
    with open(os.path.join(state, "_current.json")) as f:
        assert json.load(f)["epoch"] == 1
    _, m2 = current_lm(spark, state)
    expect = train_ngram_lm(
        spark.createDataFrame(
            [(1, BASE[0][1]), (2, BASE[1][1]), (4, "a cat and a dog")],
            "doc_id long, text string"), "text", n=2)
    assert _counts_set(m2.counts) == _counts_set(expect.counts)


def test_stream_lm_sync_manifest_matches_retrain(spark, tmp_path):
    """Exactly-once manifest form: drained micro-batches leave a counts
    TABLE equal to retraining on the final corpus; a restarted drain
    applies only new audit files."""
    from cdc_audit_spark.operators.ngram_lm import lm_from_counts
    from cdc_audit_spark.sinks.manifest import ManifestTable
    from cdc_audit_spark.streaming.stream_lm import stream_lm_sync_manifest

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
    counts_t = ManifestTable(spark, counts_p)
    model = lm_from_counts(counts_t.read(), n=2)
    assert _counts_set(model.counts) == _counts_set(expect.counts)
    assert model.total == expect.total
    base_t = ManifestTable(spark, base_p)
    assert {(r["doc_id"], r["text"])
            for r in base_t.read().select("doc_id", "text").collect()} \
        == set(final)

    # restart with a new batch: only it applies
    spark.createDataFrame([(1, BASE[0][1], "delete", TS, 13)], SCH
                          ).coalesce(1).write.mode("append").parquet(src)
    q2 = stream_lm_sync_manifest(spark, src, schema, base_p, counts_p, ck,
                                 "text", ["doc_id"])
    q2.awaitTermination(120)
    expect2 = train_ngram_lm(
        spark.createDataFrame(final[1:], "doc_id long, text string"),
        "text", n=2)
    model2 = lm_from_counts(counts_t.read(), n=2)
    assert _counts_set(model2.counts) == _counts_set(expect2.counts)


def test_lm_manifest_half_committed_replay_window(spark, tmp_path):
    """Crash BETWEEN the two commits: one table holds the epoch, the other
    doesn't. The replay recomputes from PINNED pre-epoch state, the lagging
    table catches up, the leading one skips — zero double-application."""
    from cdc_audit_spark.operators.ngram_lm import lm_from_counts
    from cdc_audit_spark.sinks.manifest import ManifestTable
    from cdc_audit_spark.streaming.stream_lm import apply_lm_manifest_epoch

    base_t = ManifestTable(spark, str(tmp_path / "base_t"))
    counts_t = ManifestTable(spark, str(tmp_path / "counts_t"))
    b0 = spark.createDataFrame(
        [(i, t, "insert", TS, i) for i, (_, t) in enumerate(BASE, 1)], SCH)
    apply_lm_manifest_epoch(base_t, counts_t, b0, 0, "r1", "text", ["doc_id"])

    b1 = spark.createDataFrame(
        [(2, "the dog and the cat", "update", TS, 10)], SCH)
    # simulate the crash: commit ONLY the counts half of epoch 1
    from cdc_audit_spark.capture import apply_changes
    from cdc_audit_spark.operators.ngram_lm import maintain_ngram_counts

    pre_base, pre_counts = base_t.read(), counts_t.read()
    half = maintain_ngram_counts(pre_counts, pre_base, b1, "text",
                                 ["doc_id"], n=2)
    counts_t.overwrite(half, extra={"epoch": 1, "run_id": "r1"})

    # replay epoch 1 through the hook: base catches up, counts skip
    apply_lm_manifest_epoch(base_t, counts_t, b1, 1, "r1", "text", ["doc_id"])
    final = [(1, BASE[0][1]), (2, "the dog and the cat"), (3, BASE[2][1])]
    expect = train_ngram_lm(
        spark.createDataFrame(final, "doc_id long, text string"), "text", n=2)
    got = lm_from_counts(counts_t.read(), n=2)
    assert _counts_set(got.counts) == _counts_set(expect.counts)
    assert {(r["doc_id"], r["text"]) for r in
            base_t.read().select("doc_id", "text").collect()} == set(final)
    # replaying the whole epoch again is a durable no-op
    apply_lm_manifest_epoch(base_t, counts_t, b1, 1, "r1", "text", ["doc_id"])
    assert _counts_set(lm_from_counts(counts_t.read(), 2).counts) \
        == _counts_set(expect.counts)
