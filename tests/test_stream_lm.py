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
