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

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


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


def zorder_value(
    cols: list[Column], mins: list[int], maxs: list[int], bits: int = 8
) -> Column:
    """Morton (Z-order) key: per-column equal-width bucket ids, bit-interleaved.

    Each column is scaled to a ``bits``-bit bucket id from its [min, max]
    domain, then bit i of column j lands at position ``i*k + j`` of the key.
    The whole thing is one codegen-friendly integer expression — no UDF, no
    shuffle; the single pass that computes min/max is the only extra cost.
    Equal-width bucketing is the right variant for roughly-uniform keys
    (surrogate ids, timestamps); rank-normalize heavily skewed columns
    before z-ordering them.
    """
    k = len(cols)
    buckets = []
    for c, lo, hi in zip(cols, mins, maxs):
        span = max(int(hi) - int(lo), 0) + 1
        b = F.floor(
            (c.cast("long") - F.lit(int(lo)))
            * F.lit(1 << bits) / F.lit(span)
        ).cast("long")
        buckets.append(F.least(b, F.lit((1 << bits) - 1)))
    z = F.lit(0).cast("long")
    for j, b in enumerate(buckets):
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), i * k + j)
            )
    return z


def write_zorder(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    n_files: int,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Z-ordered export — multi-dimensional data skipping.

    ``write_range_sorted`` gives perfect skipping on ONE key and none on any
    other; interleaving the bits of k bucket ids makes every contiguous
    z-range a small hyper-rectangle, so each output file carries TIGHT
    min/max footer stats on ALL k columns at once. A scan filtered on any
    subset of them prunes files — the layout behind Delta/Iceberg Z-order,
    built from public Spark primitives: one min/max pass, a map-side Morton
    key, ``repartitionByRange`` + ``sortWithinPartitions`` on it.

    Per-dimension selectivity trades off against k: with n_files = 2^m, each
    dimension's per-file width shrinks to ~2^-(m/k) of its domain (vs 2^-m
    for single-key range sort on that key alone, and 1 for every other key).
    """
    stats = df.agg(
        *[F.min(c).cast("long").alias(f"lo_{c}") for c in zorder_cols],
        *[F.max(c).cast("long").alias(f"hi_{c}") for c in zorder_cols],
    ).first()
    mins = [stats[f"lo_{c}"] for c in zorder_cols]
    maxs = [stats[f"hi_{c}"] for c in zorder_cols]
    z = zorder_value([F.col(c) for c in zorder_cols], mins, maxs, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def compact_files(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    target_bytes: int = 256 << 20,
    mode: str = "overwrite",
) -> int:
    """Small-file compaction: rewrite a parquet dataset into ~target-size files.

    Long-running incremental sinks (every micro-batch of `stream_sync`, every
    `sync_table` append) accrete small files; at scale the per-file open/footer
    cost dominates scans and the NameNode/listing cost dominates planning. The
    fix is a periodic rewrite sized by bytes, not partition count: total size
    via Hadoop's FileSystem (works on HDFS/S3A, not just local), then one
    round-robin repartition to ceil(total/target) writers. Returns the file
    count written. Layout-preserving variants: re-apply `write_range_sorted` /
    `write_zorder` instead when the sink has a sort contract.
    """
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(jpath).getLength()
    n_files = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(src_path)
    df.repartition(n_files).write.mode(mode).parquet(dest_path)
    return n_files
