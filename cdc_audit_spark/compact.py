"""Audit-log compaction — the reference's wipe feature, Spark-first.

The reference's wipe (cdc_audit_sync_mysql.php:284-319) deletes synced audit
rows in batches of 100 with a 1 s pause until exactly one row — the one with
the global max audit_pk — remains (stop condition sync:304). The retained
row exists so the next sync's watermark recovery still works.

Spark-native compaction is a rewrite, not a delete loop: select the rows to
keep, write them out atomically. The reference's batching/sleeping existed to
bound load on a live OLTP master — in Spark that concern maps to writing with
a bounded number of output partitions, not to row-batched deletes.

Two forms:
  * keep_last        — strict parity: one global survivor (W1).
  * keep_last_per_key — the useful generalization: latest audit row per
    source key = "current state + last event" materialization. One shuffle
    on the PK; at 100 TB this is the standard log-compaction pattern
    (identical shape to Kafka compaction / SCD1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdc_audit_spark.schema import AUDIT_PK
from cdc_audit_spark.sync import text_write_options

__all__ = ["keep_last", "keep_last_per_key", "compact_log", "throttled_wipe"]


def keep_last(audit_df: DataFrame) -> DataFrame:
    """The single audit row with the global max audit_pk (sync:304 keep-1).

    orderBy+limit(1) lets Spark run a per-partition top-1 followed by a
    driver-side merge of partition maxima (TakeOrdered) — no full sort, no
    single-partition shuffle of the data.
    """
    return audit_df.orderBy(F.desc(AUDIT_PK)).limit(1)


def keep_last_per_key(audit_df: DataFrame, pk_cols: list[str]) -> DataFrame:
    """Latest audit row per source key — per-key generalization of the wipe.

    max_by-style window: one hash shuffle on pk_cols, then a per-partition
    sort. Skewed keys are handled by AQE; for pathological skew, pre-salt.
    """
    w = Window.partitionBy(*pk_cols).orderBy(F.desc(AUDIT_PK))
    return (
        audit_df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def compact_log(
    audit_df: DataFrame,
    sink_path: str,
    fmt: str = "parquet",
    pk_cols: list[str] | None = None,
) -> int:
    """Rewrite a sink keeping only the survivor rows; returns rows kept.

    The rewrite-to-temp-then-replace dance is needed because the source of
    the read is the sink being rewritten; with a transactional table format
    (Delta/Iceberg) this would be a single MERGE/DELETE. Kept simple here:
    materialize survivors, overwrite.
    """
    survivors = keep_last_per_key(audit_df, pk_cols) if pk_cols else keep_last(audit_df)
    survivors = survivors.cache()
    n = survivors.count()
    # The globally-last row survives either compaction mode, so its pk is
    # the wipe boundary (== the sink's watermark at compaction time).
    mx = survivors.agg(F.max(AUDIT_PK).alias("mx")).first()["mx"]
    # same text conventions as sync_table's appends (µs timestamps, NULL
    # and empty-string sentinels) — a compaction rewrite must not change
    # what the sync kept
    writer = text_write_options(survivors.write.mode("overwrite").format(fmt),
                                fmt)
    writer.save(sink_path)
    survivors.unpersist()
    if mx is not None:
        # The overwrite deleted the sink's state file; restore the
        # watermark and record the wipe so verify_sink can reconstruct the
        # expected (compacted) content instead of flagging corruption.
        from cdc_audit_spark.sync import record_compaction

        record_compaction(sink_path, int(mx), pk_cols)
    return n


def throttled_wipe(
    conn,
    table: str,
    pk_col: str = AUDIT_PK,
    batch_size: int = 100,
    pause_s: float = 1.0,
    sleep_fn=None,
) -> int:
    """Load-bounded wipe of a *live source database's* audit table: delete
    everything except the single max-``pk_col`` row, ``batch_size`` rows per
    statement with a pause between batches — the reference's wipe loop
    (cdc_audit_sync_mysql.php:284-319: DELETE ... LIMIT 100 + sleep 1 until
    one row remains, stop condition sync:304).

    This is deliberately a driver-side loop over a DB-API connection, not a
    Spark job: the constraint it serves is bounding write load on an OLTP
    master, which parallelism would defeat. Batches are *ranged* on the
    ordered surrogate key (pk >= lo AND pk < hi) rather than LIMIT-ed, so
    each statement is an index range scan with a bounded lock footprint and
    the loop is restartable from any point. Spark-side sinks use the
    rewrite-based ``compact_log`` / ``retention_compact`` instead.

    Returns rows deleted. ``sleep_fn`` is injectable for tests.
    """
    import time

    sleep = sleep_fn if sleep_fn is not None else time.sleep
    cur = conn.cursor()
    cur.execute(f"SELECT min({pk_col}), max({pk_col}) FROM {table}")  # noqa: S608
    lo, hi = cur.fetchone()
    if lo is None or lo == hi:
        return 0  # empty or already wiped to the single retained row
    deleted = 0
    # ranged batches over [lo, hi): the max-pk row is never touched
    start = lo
    while start < hi:
        end = min(start + batch_size, hi)
        cur.execute(
            f"DELETE FROM {table} WHERE {pk_col} >= ? AND {pk_col} < ?",  # noqa: S608
            (start, end),
        )
        deleted += cur.rowcount
        conn.commit()
        start = end
        if start < hi:
            sleep(pause_s)
    return deleted


def retention_compact(
    audit_df: DataFrame,
    horizon_pk: int,
    pk_cols: list[str],
) -> DataFrame:
    """Bounded-history retention: full audit history is kept only AFTER the
    horizon; at-or-before it, each key collapses to its latest row — a
    per-key checkpoint that preserves every replay a consumer can still ask
    for (any watermark ≥ horizon reconstructs identically; the property
    test pins apply_changes-equivalence for the full log and per-key
    as-of). The middle ground between the reference's all-history audit
    table and its keep-1 wipe (sync:284-319): log-retention-with-checkpoint
    semantics, expressed as a filter + one per-key window + a union — no
    driver loop, no batched deletes.
    """
    recent = audit_df.filter(F.col(AUDIT_PK) > F.lit(horizon_pk))
    base = keep_last_per_key(
        audit_df.filter(F.col(AUDIT_PK) <= F.lit(horizon_pk)), pk_cols
    )
    return base.unionByName(recent)
