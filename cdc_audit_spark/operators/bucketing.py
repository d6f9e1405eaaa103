"""Bucketed-table layout: pre-shuffle once at write time, join forever
shuffle-free (beyond-reference scale infrastructure).

At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders,
audit-log ⋈ snapshot) is the shuffle of both sides. Hive-style bucketing
moves that shuffle to write time: `bucketBy(n, key)` hash-partitions rows
into a fixed number of files per partition, and Spark's scan reports the
resulting `HashPartitioning`, so a join of two tables bucketed on the same
key with the same bucket count needs NO Exchange on either side — the plan
goes scan → sort → merge-join. With `sortBy` the sort disappears too for
the read-side of many plans. This is the CDC-specific win: the audit log
and the base snapshot are both keyed by PK, every `snapshot_diff`/apply
cycle re-joins them, and bucketing amortizes the shuffle across every run.

Spark only honors bucketing through the session catalog (`saveAsTable`),
not path-based `parquet(path)` writes — a deliberate constraint: the
catalog is what records the bucket spec a future reader must trust.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist df as a bucketed (optionally sorted) catalog table.

    n_buckets is the contract every co-located reader relies on — pick it
    from target file size (total_bytes / ~256 MB), and keep it IDENTICAL
    across the tables that will join, or Spark re-shuffles the mismatched
    side. With `path` the table is external (data at the given location);
    otherwise it lands in the session warehouse (warehouse dir is a static
    conf — set it at session build time, not after).
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back; the scan carries the bucket spec, which
    is what lets Catalyst elide the join-side Exchange."""
    return spark.table(table)


def assert_colocated_join_plan(joined: DataFrame) -> str:
    """Return the executed plan string, raising if the join still shuffles —
    the machine-checkable definition of 'co-located'."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    if "Exchange hashpartitioning" in plan:
        raise AssertionError(
            "bucketed join still shuffles — bucket counts/keys mismatch:\n" + plan
        )
    return plan


def write_range_sorted(
    df: DataFrame,
    path: str,
    range_cols: list[str],
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Range-partitioned, sorted export — the data-skipping layout.

    ``repartitionByRange`` samples the key distribution and splits rows into
    n contiguous, DISJOINT key ranges (one file each); ``sortWithinPartitions``
    orders rows inside each file, so every parquet row group carries tight
    min/max stats on the key. A later filtered scan (`WHERE ts BETWEEN ...`)
    then skips whole files/row groups at the footer level — at 100 TB this
    is the difference between scanning a day and scanning a decade. The
    complement of bucketing: bucket for join keys, range-sort for
    range-filtered keys (time, ids).
    """
    (
        df.repartitionByRange(n_files, *range_cols)
        .sortWithinPartitions(*range_cols)
        .write.mode(mode)
        .parquet(path)
    )
