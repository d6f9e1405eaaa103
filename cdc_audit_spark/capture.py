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

    old = old_df.alias("__old")
    new = new_df.alias("__new")
    # Null-safe equi-join on the PK: planned as sort-merge (or broadcast when
    # one side is small) — `<=>` keeps equi-join strategies available.
    cond = None
    for k in pk_cols:
        c = F.col(f"__old.{k}").eqNullSafe(F.col(f"__new.{k}"))
        cond = c if cond is None else (cond & c)
    joined = old.join(new, cond, "full_outer")

    old_present = F.col(f"__old.{pk_cols[0]}").isNotNull()
    new_present = F.col(f"__new.{pk_cols[0]}").isNotNull()
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


# A change set whose Catalyst size estimate fits comfortably in one task's
# sort buffer may take the cheaper single-shuffle window path; anything
# larger — or unestimable — takes the distributed path. Join-heavy plans
# overestimate, which only pushes toward distributed: the safe direction.
_WINDOW_MAX_EST_BYTES = 64 * 1024 * 1024


def _plan_size_estimate(df: DataFrame) -> int | None:
    """Catalyst's optimized-plan sizeInBytes — free (no job), conservative."""
    try:
        return int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
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
    # id-assigning output job. Only the *post-shuffle* frame is persisted
    # (below) — persisting the raw input here is tempting (one source scan
    # instead of two) but WRONG session-wide: Spark's cache manager
    # substitutes a cached plan into ANY later query containing an equal
    # subtree, so caching a bare table scan (ranked exports pass base
    # tables straight in) silently rewrites every other query on that
    # table to InMemoryTableScan and destroys parquet filter pushdown.
    # The repartitioned+__pid shape below can only match an identical
    # ranked call, where reuse is exactly what we want.
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
    offsets = {}
    acc = base
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    out_schema = parted.drop("__pid").schema.add(out_col, "long", False)

    def add_ids(iterator):
        seen = 0
        off = None
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            if off is None:
                off = offsets[int(pdf["__pid"].iloc[0])]
            pdf = pdf.drop(columns="__pid")
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
