"""Windowed event analytics — one plan, batch and streaming.

``windowed_event_stats`` builds the aggregation against whatever DataFrame
it is given: a batch read (oracle-checkable) or a ``readStream`` source with
a watermark (the production shape). The reference has no event-time
semantics at all — its only "stream" is the cron-polled audit_pk scan
(README:194-195) — so these are extension operators (SURVEY §2.9/§2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "windowed_event_stats",
    "sessionize",
    "stream_windowed_stats",
    "stream_session_stats",
]


def windowed_event_stats(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    user_col: str = "user_id",
) -> DataFrame:
    """Tumbling-window stats per event type.

    Shuffles once on (window, event_type); counts/sums are partially
    aggregated map-side. countDistinct forces exact distinct — at extreme
    scale swap for approx_count_distinct (documented tradeoff).
    """
    return (
        events.groupBy(F.window(ts_col, window).alias("w"), F.col(type_col))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct(user_col).alias("n_users"),
            F.sum(F.col(value_col).cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), type_col,
                "n_events", "n_users", "total_value")
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Batch sessionization: lag + cumulative-sum-over-gap pattern.

    One shuffle on user_id; session ids are deterministic
    (user, session_index), with an optional ``tiebreak_col`` making the
    intra-user order total when timestamps can repeat. Gap comparison uses
    exact microsecond arithmetic (unix_micros), never second-truncated
    casts. The streaming analog is ``F.session_window(ts, gap)`` (see
    stream_windowed_stats).
    """
    from pyspark.sql import Window as W

    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = W.partitionBy(user_col).orderBy(*order)
    us = F.unix_micros(F.col(ts_col))
    gap = us - F.lag(us).over(w)
    with_breaks = events.withColumn(
        "__new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)).otherwise(F.lit(0)),
    )
    with_ids = with_breaks.withColumn(
        "session_idx", F.sum("__new_session").over(w).cast("long")
    ).drop("__new_session")
    return (
        with_ids.groupBy(user_col, "session_idx")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            ((F.max(us) - F.min(us)) / F.lit(1_000_000.0)).alias("duration_secs"),
        )
    )


def stream_windowed_stats(
    spark,
    source_path: str,
    schema,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """The same windowed aggregation as a Structured Streaming query over a
    file source — late rows beyond ``watermark`` are dropped, state is
    bounded. Returns the streaming DataFrame (caller starts the sink)."""
    stream = spark.readStream.schema(schema).parquet(source_path)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def stream_session_stats(
    spark,
    source_path: str,
    schema,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
):
    """Streaming sessionization via ``F.session_window`` — the native
    stateful form of ``sessionize``: sessions close when no event arrives
    within ``gap``; state for a session is dropped once the watermark
    passes its end. Returns the streaming DataFrame (caller starts the
    sink; append mode emits each session exactly once, on close)."""
    stream = spark.readStream.schema(schema).parquet(source_path)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events", "total_value",
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    lower: str = "0 seconds",
    upper: str = "15 minutes",
) -> DataFrame:
    """Event-time interval join: pair each left row with right rows of the
    same key whose timestamp falls in [left_ts + lower, left_ts + upper] —
    the click→purchase attribution shape.

    One plan, batch and streaming. In streaming BOTH inputs must carry
    ``withWatermark`` before calling this; the time-bound condition is what
    lets Spark's stream-stream join evict state (without it, both sides
    buffer forever — the classic unbounded-state trap). Batch executes the
    same plan as a sort-merge join with the range condition as a residual
    filter.
    """
    lo = F.expr(f"INTERVAL {lower}")
    hi = F.expr(f"INTERVAL {upper}")
    cond = (
        (left[key] == right[key])
        & (right[right_ts] >= left[left_ts] + lo)
        & (right[right_ts] <= left[left_ts] + hi)
    )
    return left.join(right, cond)


def stream_interval_join(
    spark,
    left_path: str,
    right_path: str,
    schema,
    key: str = "user_id",
    watermark: str = "30 minutes",
    upper: str = "15 minutes",
) -> DataFrame:
    """The streaming instantiation of :func:`interval_join` over two file
    sources (the test/fixture harness; production swaps in Kafka readers —
    same plan). Watermarks bound the join state on both sides: left rows
    are dropped once older than watermark+upper, right rows once older than
    watermark."""
    lf = (
        spark.readStream.schema(schema).parquet(left_path)
        .withColumnRenamed("ts", "l_ts")
        .withWatermark("l_ts", watermark)
    )
    rf = (
        spark.readStream.schema(schema).parquet(right_path)
        .withColumnRenamed("ts", "r_ts")
        .withWatermark("r_ts", watermark)
    )
    lf = lf.select(key, "l_ts", F.col("event_id").alias("l_event_id"))
    rf = rf.select(
        F.col(key).alias("r_user_id"), "r_ts", F.col("event_id").alias("r_event_id")
    )
    cond = (
        (lf[key] == rf["r_user_id"])
        & (rf["r_ts"] >= lf["l_ts"])
        & (rf["r_ts"] <= lf["l_ts"] + F.expr(f"INTERVAL {upper}"))
    )
    return lf.join(rf, cond).select(key, "l_event_id", "r_event_id", "l_ts", "r_ts")
