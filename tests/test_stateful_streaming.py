"""Stateful streaming operators: cross-batch dedup and
applyInPandasWithState running aggregates, driven end-to-end with file
sources + availableNow (one bounded drain per test)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_audit_spark.streaming.stateful import (
    running_user_stats,
    stream_dedup_exact,
)


def _drain(stream_df, name: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_dedup_exact_drops_cross_batch_duplicates(spark, tmp_path):
    src = str(tmp_path / "docs")
    # two files → (typically) separate batches; duplicates within and across
    spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma"), (3, "alpha beta")],
        "doc_id long, text string",
    ).write.parquet(src)

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = stream_dedup_exact(stream, "text")
    q = (
        out.writeStream.format("memory").queryName("dedup_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM dedup_out").collect()
    texts = [r["text"] for r in rows]
    assert sorted(texts) == ["alpha beta", "gamma"]


def test_running_user_stats_accumulates(spark, tmp_path):
    src = str(tmp_path / "events")
    spark.createDataFrame(
        [
            (7, "2026-01-01 00:00:00", 10.0),
            (7, "2026-01-01 01:00:00", 5.0),
            (9, "2026-01-01 02:00:00", 2.5),
        ],
        "user_id long, ts_s string, value double",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s").write.parquet(src)

    stream = spark.readStream.schema("user_id long, value double, ts timestamp").parquet(src)
    out = running_user_stats(stream)
    _drain(out, "user_stats_out")
    rows = {r["user_id"]: r for r in spark.sql(
        "SELECT * FROM user_stats_out").collect()}
    assert rows[7]["n_events"] == 2 and rows[7]["total_value"] == pytest.approx(15.0)
    assert rows[9]["n_events"] == 1 and rows[9]["total_value"] == pytest.approx(2.5)
    assert rows[7]["last_ts"].hour == 1


def test_running_user_stats_state_carries_across_restarts(spark, tmp_path):
    """Checkpointed GroupState: a second run over new data resumes the
    per-user totals instead of starting from zero."""
    src = str(tmp_path / "ev2")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id long, value double, ts timestamp"

    def write_batch(rows):
        spark.createDataFrame(
            rows, "user_id long, ts_s string, value double"
        ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s").select(
            "user_id", "value", "ts"
        ).write.mode("append").parquet(src)

    out_dir = str(tmp_path / "out")

    def run_once():
        # memory sinks cannot recover from a checkpoint — use foreachBatch
        # to a file sink, the production shape
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            running_user_stats(stream)
            .writeStream.foreachBatch(
                lambda bdf, eid: bdf.write.mode("append").parquet(out_dir)
            )
            .outputMode("update").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(out_dir).collect()
        best = {}
        for r in rows:  # latest running total per user = max n_events
            if r["user_id"] not in best or r["n_events"] > best[r["user_id"]]["n_events"]:
                best[r["user_id"]] = r
        return best

    write_batch([(1, "2026-01-01 00:00:00", 1.0)])
    first = run_once()
    assert first[1]["n_events"] == 1

    write_batch([(1, "2026-01-01 01:00:00", 2.0)])
    second = run_once()
    assert second[1]["n_events"] == 2  # resumed, not restarted
    assert second[1]["total_value"] == pytest.approx(3.0)
