"""Stateful streaming operators: cross-batch dedup and per-key running
aggregates.

The reference's only state is the sync watermark scalar (SURVEY §2.9).
These extension operators use Spark's state store for the stateful pieces a
live training-data pipeline needs:

  * ``stream_dedup_exact`` — drop documents whose content hash was already
    seen, across micro-batches, with watermark-bounded state: the streaming
    form of operators.dedup.exact_dedup. State holds only (digest,
    event-time) pairs — 32-byte keys, never document text — so state size
    is O(distinct keys within the watermark horizon).
  * ``running_user_stats`` — per-key running aggregates via
    ``applyInPandasWithState`` (Arrow-batched, GroupState-backed): the
    pattern for custom stateful operators Spark's built-ins can't express.
    Output after each batch is the updated running total per key seen in
    that batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType, TimestampType,
)

__all__ = ["stream_dedup_exact", "running_user_stats", "USER_STATS_SCHEMA"]


def stream_dedup_exact(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """First occurrence of each distinct ``text_col`` value survives;
    later duplicates are dropped, across micro-batches.

    With ``ts_col`` the dedup state is watermark-bounded (duplicates
    arriving later than ``watermark`` after the original are NOT dropped —
    the documented tradeoff that keeps state finite on unbounded streams).
    Without it, state grows with distinct keys (exact global dedup; only
    for bounded backfills via trigger(availableNow)).
    """
    hashed = stream.withColumn("__digest", F.md5(F.col(text_col)))
    if ts_col is not None:
        # dropDuplicatesWithinWatermark evicts digest state once the
        # watermark passes; plain dropDuplicates on a non-event-time subset
        # would keep state forever.
        out = hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["__digest"]
        )
    else:
        out = hashed.dropDuplicates(["__digest"])
    return out.drop("__digest")


USER_STATS_SCHEMA = StructType([
    StructField("user_id", LongType(), False),
    StructField("n_events", LongType(), False),
    StructField("total_value", DoubleType(), False),
    StructField("last_ts", TimestampType(), True),
])

_STATE_SCHEMA = StructType([
    StructField("n", LongType(), False),
    StructField("total", DoubleType(), False),
])


def _update_user_stats(key, pdfs, state):
    """GroupState update: fold this batch's rows into (n, total)."""
    import pandas as pd

    n, total = state.get if state.exists else (0, 0.0)
    last_ts = None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        ts_max = pdf["ts"].max()
        last_ts = ts_max if last_ts is None else max(last_ts, ts_max)
    state.update((n, total))
    yield pd.DataFrame({
        "user_id": [key[0]],
        "n_events": [n],
        "total_value": [total],
        "last_ts": [last_ts],
    })


def running_user_stats(stream: DataFrame) -> DataFrame:
    """Running (count, sum(value), last ts) per user, updated every
    micro-batch — ``applyInPandasWithState`` with update output mode.

    Requires columns (user_id, ts, value). State per key is two scalars —
    at 100 TB/day the state store holds |users| × 16 bytes, partitioned by
    user hash; the Arrow transfer carries only each batch's rows.
    """
    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=USER_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )
