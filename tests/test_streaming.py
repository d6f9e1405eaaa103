import datetime as dt

from pyspark.sql import functions as F

from cdc_audit_spark.queries import normalize_events_ts
from cdc_audit_spark.schema import audit_schema
from cdc_audit_spark.streaming.stream_sync import stream_audit_sync
from cdc_audit_spark.streaming.windows import (
    sessionize,
    stream_windowed_stats,
    windowed_event_stats,
)

TS = dt.datetime(2026, 1, 1)


def _audit_rows(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("k"),
            (F.col("id") * 2.0).alias("v"),
            F.lit("insert").alias("audit_event"),
            F.lit(TS).alias("audit_timestamp"),
            F.col("id").alias("audit_pk"),
        )
    )


def test_stream_audit_sync_drains_and_resumes(spark, tmp_path):
    src = str(tmp_path / "log")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    _audit_rows(spark, 1, 11).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    q = stream_audit_sync(spark, src, schema, sink, ckpt, fmt="parquet")
    q.awaitTermination(120)
    assert spark.read.parquet(sink).count() == 10

    # new rows arrive; a second availableNow drain picks up ONLY the delta
    _audit_rows(spark, 11, 16).write.mode("append").parquet(src)
    q2 = stream_audit_sync(spark, src, schema, sink, ckpt, fmt="parquet")
    q2.awaitTermination(120)
    out = spark.read.parquet(sink)
    assert out.count() == 15
    assert out.select("audit_pk").distinct().count() == 15  # no re-emission


def test_stream_audit_sync_json_source(spark, tmp_path):
    """The drain is source-format-agnostic: a JSON audit bus streams into a
    parquet sink with the same checkpointed-offset semantics."""
    src = str(tmp_path / "log_json")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    rows = _audit_rows(spark, 1, 11)
    rows.write.mode("append").json(src)
    q = stream_audit_sync(spark, src, rows.schema, sink, ckpt,
                          fmt="parquet", source_fmt="json")
    q.awaitTermination(120)
    out = spark.read.parquet(sink)
    assert out.count() == 10
    assert dict(out.dtypes)["audit_timestamp"] == "timestamp"


def test_stream_audit_sync_foreach_batch_hook(spark, tmp_path):
    # M4 capability: user logic per micro-batch (legacy-trigger analog)
    src = str(tmp_path / "log")
    sink = str(tmp_path / "sink")
    seen = []
    _audit_rows(spark, 1, 6).write.parquet(src)
    schema = spark.read.parquet(src).schema
    q = stream_audit_sync(
        spark, src, schema, sink, str(tmp_path / "ck"), fmt="parquet",
        foreach_batch=lambda df, epoch: seen.append(df.count()),
    )
    q.awaitTermination(120)
    assert sum(seen) == 5
    assert spark.read.parquet(sink).count() == 5


def test_windowed_event_stats_batch(spark):
    rows = [
        (1, dt.datetime(2026, 1, 1, 10, 5), 1, "click", 1.0),
        (2, dt.datetime(2026, 1, 1, 10, 55), 1, "click", 2.0),
        (3, dt.datetime(2026, 1, 1, 11, 5), 2, "view", 3.0),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string, value double")
    out = {(r["window_start"], r["event_type"]): r for r in windowed_event_stats(ev).collect()}
    k10 = (dt.datetime(2026, 1, 1, 10), "click")
    assert out[k10]["n_events"] == 2
    assert out[k10]["n_users"] == 1
    assert float(out[k10]["total_value"]) == 3.0


def test_stream_windowed_stats_runs(spark, tmp_path, sf_dir):
    # same plan as the batch query, driven through readStream on fixture data
    src = str(tmp_path / "events")
    ev = normalize_events_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    ev.write.parquet(src)
    agg = stream_windowed_stats(spark, src, spark.read.parquet(src).schema)
    q = (
        agg.writeStream.format("memory").queryName("win_out")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    batch = windowed_event_stats(ev).select("window_start", "event_type", "n_events", "total_value")
    stream_out = spark.sql("select * from win_out")
    assert sorted(map(tuple, stream_out.collect())) == sorted(map(tuple, batch.collect()))


def test_sessionize(spark):
    rows = [
        (1, dt.datetime(2026, 1, 1, 10, 0), 1, "a", 0.0),
        (2, dt.datetime(2026, 1, 1, 10, 10), 1, "a", 0.0),   # same session (10 min gap)
        (3, dt.datetime(2026, 1, 1, 12, 0), 1, "a", 0.0),    # new session (>30 min)
        (4, dt.datetime(2026, 1, 1, 10, 0), 2, "a", 0.0),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string, value double")
    out = sessionize(ev, gap_minutes=30)
    sess = {(r["user_id"], r["session_idx"]): r for r in out.collect()}
    assert len(sess) == 3
    assert sess[(1, 1)]["n_events"] == 2
    assert sess[(1, 2)]["n_events"] == 1
    assert sess[(2, 1)]["n_events"] == 1


def test_stream_session_stats(spark, sf_dir, tmp_path):
    from cdc_audit_spark.streaming.windows import sessionize, stream_session_stats

    from pyspark.sql import functions as F

    ev = normalize_events_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = str(tmp_path / "ev_src")
    ev.write.parquet(src)
    ev = spark.read.parquet(src)
    schema = spark.read.parquet(src).schema

    out = stream_session_stats(spark, src, schema, gap="30 minutes",
                               watermark="10 days")
    q = (
        out.writeStream.format("memory").queryName("sess_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM sess_stream")
    # streaming emits only watermark-closed sessions; every emitted session
    # must match the batch-mode session_window aggregation exactly (same
    # gap semantics — batch `sessionize` differs at exact-gap boundaries)
    batch = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "n_events")
    )
    emitted = got.select("user_id", "session_start", "session_end", "n_events")
    assert emitted.count() > 0
    assert emitted.exceptAll(batch).count() == 0


def test_stream_stream_interval_join_matches_batch(spark, tmp_path, sf_dir):
    """Stream-stream interval join (click→purchase attribution): the
    streaming result over file sources must equal the batch interval join
    of the same data — one plan, two execution modes."""
    from cdc_audit_spark.streaming.windows import stream_interval_join

    ev = normalize_events_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    lpath, rpath = str(tmp_path / "clicks"), str(tmp_path / "purch")
    clicks.write.parquet(lpath)
    purchases.write.parquet(rpath)

    joined = stream_interval_join(
        spark, lpath, rpath, spark.read.parquet(lpath).schema, upper="15 minutes"
    )
    q = (
        joined.writeStream.format("memory").queryName("ssj_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql(
        "select user_id, l_event_id, r_event_id from ssj_out").collect()))

    l = clicks.select("user_id", F.col("event_id").alias("l_event_id"),
                      F.col("ts").alias("l_ts"))
    r = purchases.select(F.col("user_id").alias("r_uid"),
                         F.col("event_id").alias("r_event_id"),
                         F.col("ts").alias("r_ts"))
    want = sorted(map(tuple, l.join(
        r,
        (l.user_id == r.r_uid)
        & (r.r_ts >= l.l_ts)
        & (r.r_ts <= l.l_ts + F.expr("INTERVAL 15 minutes")),
    ).select("user_id", "l_event_id", "r_event_id").collect()))
    assert got == want
    assert len(got) > 0  # fixture must actually produce attributed pairs
