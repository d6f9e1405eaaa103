"""JDBC incremental change-capture source — the live-MySQL consumption mode.

The reference's sync does ``SELECT * FROM `t` WHERE audit_pk > :last``
against the audit table (cdc_audit_sync_mysql.php:243) in a single-threaded
PHP loop. The Spark-native form of the same scan (SURVEY §2.1 S5, §3.3a
log-consumption mode):

  * the watermark predicate is baked into the JDBC *subquery* / partition
    WHERE clauses, so MySQL — which indexes ``audit_pk`` (it is the primary
    key, cdc_audit_gen_mysql.php:333) — does an index range scan, never a
    full table scan;
  * the read is *partitioned* on ``audit_pk``: N tasks each pull a
    disjoint, contiguous pk range in parallel. Ranges are contiguous because
    audit_pk is an auto-increment sequence (gen:359), so a uniform stride
    over (watermark, max] is balanced up to deletion gaps;
  * ``poll_sync`` is the reference's cron loop (README:194-195) run
    in-process: poll → sync delta → advance watermark → sleep, with the
    watermark carried by the sink's atomic state file between iterations
    (and across restarts).

No MySQL server exists in the test environment, so batch-plan construction
is pure (unit-tested strings) and the execution path is exercised against
parquet via an injected ``read_fn``.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from cdc_audit_spark.schema import AUDIT_PK
from cdc_audit_spark.sync import SyncResult, get_watermark, sync_table

__all__ = [
    "incremental_subquery",
    "partition_predicates",
    "JdbcBatchPlan",
    "plan_incremental_batch",
    "poll_sync",
    "poll_sync_manifest",
]


def incremental_subquery(table: str, watermark: int, pk_col: str = AUDIT_PK,
                         quote: str = "`") -> str:
    """The pushed-down incremental scan as a JDBC dbtable subquery.

    Mirrors sync:243 with the predicate inside the subquery so the source
    database applies it (index range scan), not Spark after transfer.
    ``quote`` is the identifier quote char: backtick for MySQL (reference
    parity), double-quote for ANSI databases (Derby, Postgres), "" for none.
    """
    q = quote
    return (f"(SELECT * FROM {q}{table}{q} WHERE {q}{pk_col}{q} > "
            f"{int(watermark)}) AS cdc_delta")


def partition_predicates(
    watermark: int,
    max_pk: int,
    num_partitions: int,
    pk_col: str = AUDIT_PK,
    quote: str = "`",
) -> list[str]:
    """Disjoint, covering pk-range predicates for a partitioned JDBC read.

    Uniform stride over (watermark, max_pk]; the last partition is
    unbounded above so rows committed between the max-probe and the read
    are not lost (at-least-once across the probe race; the sink's
    append-then-advance watermark makes re-delivery idempotent).
    """
    if num_partitions < 1:
        raise ValueError("num_partitions must be >= 1")
    q = quote
    span = max_pk - watermark
    if span <= 0 or num_partitions == 1:
        return [f"{q}{pk_col}{q} > {int(watermark)}"]
    stride = max(1, -(-span // num_partitions))  # ceil division
    preds, lo = [], watermark
    for i in range(num_partitions):
        hi = min(lo + stride, max_pk)
        if i == num_partitions - 1 or hi >= max_pk:
            preds.append(f"{q}{pk_col}{q} > {int(lo)}")
            break
        preds.append(f"{q}{pk_col}{q} > {int(lo)} AND {q}{pk_col}{q} <= {int(hi)}")
        lo = hi
    return preds


@dataclass
class JdbcBatchPlan:
    """One incremental micro-batch over a JDBC audit table, as data.

    Pure and inspectable (tests assert on it without a database); ``load``
    executes it via ``spark.read.jdbc`` with per-partition predicates.
    """

    url: str
    table: str
    watermark: int
    predicates: list[str]
    properties: dict = field(default_factory=dict)
    quote: str = "`"

    def load(self, spark: SparkSession) -> DataFrame:
        q = self.quote
        return spark.read.jdbc(
            url=self.url,
            table=f"{q}{self.table}{q}",
            predicates=self.predicates,
            properties=self.properties,
        )


def plan_incremental_batch(
    url: str,
    table: str,
    watermark: int,
    max_pk: int | None = None,
    num_partitions: int = 8,
    pk_col: str = AUDIT_PK,
    properties: dict | None = None,
    quote: str = "`",
) -> JdbcBatchPlan:
    """Plan one incremental read.

    ``max_pk`` comes from a cheap ``SELECT max(audit_pk)`` probe (the same
    aggregate the reference's wipe loop runs, sync:297); with it the batch
    splits into ``num_partitions`` disjoint index range scans. Without it,
    a single-stream read. Each partition is one database connection —
    bound ``num_partitions`` by what the source database tolerates, not by
    cluster size (a 1000-executor cluster must not open 1000 connections).
    """
    if max_pk is None:
        preds = [f"{quote}{pk_col}{quote} > {int(watermark)}"]
    else:
        preds = partition_predicates(watermark, max_pk, num_partitions, pk_col,
                                     quote=quote)
    return JdbcBatchPlan(url, table, watermark, preds, dict(properties or {}),
                         quote=quote)


def poll_sync(
    spark: SparkSession,
    read_fn: Callable[[int], DataFrame],
    sink_path: str,
    fmt: str = "parquet",
    max_polls: int = 1,
    sleep_secs: float = 0.0,
    stop_when_empty: bool = True,
) -> list[SyncResult]:
    """The reference's cron loop, in-process: poll → sync → sleep.

    ``read_fn(watermark)`` returns the audit rows with pk > watermark —
    ``plan_incremental_batch(...).load(spark)`` in production, any
    DataFrame source in tests. Each iteration is one reference "sync run"
    (cdc_audit_sync_mysql.php:238-265); the 1 s inter-batch pause of the
    reference's wipe loop (sync:293-295) generalizes to ``sleep_secs``.
    """
    results: list[SyncResult] = []
    for i in range(max_polls):
        wm = get_watermark(spark, sink_path, fmt=fmt)
        res = sync_table(read_fn(wm), sink_path, fmt=fmt, watermark=wm)
        results.append(res)
        if stop_when_empty and res.rows_synced == 0:
            break
        if sleep_secs and i + 1 < max_polls:
            time.sleep(sleep_secs)
    return results


def poll_sync_manifest(
    spark: SparkSession,
    read_fn: Callable[[int], DataFrame],
    table_path: str,
    max_polls: int = 1,
    sleep_secs: float = 0.0,
    stop_when_empty: bool = True,
    auto_compact_dirs: int | None = None,
) -> list[SyncResult]:
    """The cron loop draining a live database into a manifest table.

    Same cadence as ``poll_sync``, but each drained batch lands as ONE
    atomic manifest commit carrying its watermark
    (sinks.manifest.ManifestTable.sync_audit) — exactly-once instead of
    the plain sink's append-then-state-file window, with time travel over
    every poll. ``auto_compact_dirs`` applies the small-files policy
    between polls (maybe_compact) so a long-lived loop doesn't accrete
    one dir per poll forever.
    """
    from cdc_audit_spark.sinks.manifest import ManifestTable

    t = ManifestTable(spark, table_path)
    results: list[SyncResult] = []
    for i in range(max_polls):
        res = t.sync_audit(read_fn(t.watermark()))
        results.append(res)
        if auto_compact_dirs is not None:
            t.maybe_compact(max_dirs=auto_compact_dirs)
        if stop_when_empty and res.rows_synced == 0:
            break
        if sleep_secs and i + 1 < max_polls:
            time.sleep(sleep_secs)
    return results
