"""Bucketed-layout tests: a join of two tables bucketed on the same key
with the same bucket count must produce NO Exchange, and identical results
to the plain join. This is the write-once-join-forever contract that
amortizes the fact-fact shuffle at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_audit_spark.operators.bucketing import (
    assert_colocated_join_plan,
    read_table,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_dir, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 4,
                   sort_cols=["o_orderkey"], path=str(warehouse / "b_orders"))
    write_bucketed(lineitem, "b_lineitem", ["l_orderkey"], 4,
                   sort_cols=["l_orderkey"], path=str(warehouse / "b_lineitem"))
    yield orders, lineitem
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_no_shuffle(spark, bucketed_pair):
    bo, bl = read_table(spark, "b_orders"), read_table(spark, "b_lineitem")
    joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey).groupBy("o_orderstatus").agg(
        F.count("*").alias("n")
    )
    # disable broadcast so the join strategy itself is under test
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = assert_colocated_join_plan(
            bl.join(bo, bl.l_orderkey == bo.o_orderkey).select("l_orderkey", "o_orderstatus")
        )
        assert "SortMergeJoin" in plan
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_pair):
    orders, lineitem = bucketed_pair
    bo, bl = read_table(spark, "b_orders"), read_table(spark, "b_lineitem")
    plain = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus").agg(F.count("*").alias("n"))
    )
    bucketed = (
        bl.join(bo, bl.l_orderkey == bo.o_orderkey)
        .groupBy("o_orderstatus").agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, bucketed.collect()))


def test_mismatched_bucket_count_detected(spark, bucketed_pair):
    """The assertion helper must catch the silent-reshuffle case (one side
    bucketed differently) rather than report co-location."""
    _, lineitem = bucketed_pair
    write_bucketed(lineitem, "b_lineitem_8", ["l_orderkey"], 8,
                   path="/tmp/spark_bucket_test_b_lineitem_8")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo = read_table(spark, "b_orders")           # 4 buckets
        bl8 = read_table(spark, "b_lineitem_8")      # 8 buckets
        with pytest.raises(AssertionError, match="still shuffles"):
            assert_colocated_join_plan(
                bl8.join(bo, bl8.l_orderkey == bo.o_orderkey).select("l_orderkey")
            )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_lineitem_8")


def test_range_sorted_export_disjoint_file_ranges(spark, sf_dir, tmp_path):
    """The exported files must carry DISJOINT, sorted key ranges — verified
    from the parquet footers themselves (the stats a filtered scan prunes
    on), plus content identity with the source."""
    import glob

    import pyarrow.parquet as pq

    from cdc_audit_spark.operators.bucketing import write_range_sorted

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "orders_by_key")
    write_range_sorted(orders, out, ["o_orderkey"], n_files=4)

    ranges = []
    for f in glob.glob(f"{out}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "o_orderkey"
        )
        mins = [md.row_group(g).column(col_idx).statistics.min for g in range(md.num_row_groups)]
        maxs = [md.row_group(g).column(col_idx).statistics.max for g in range(md.num_row_groups)]
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) == 4
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"file key ranges overlap: ({lo1},{hi1}) vs ({lo2},{hi2})"

    # layout change must not change content
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    assert back.exceptAll(orders).count() == 0


def _file_bounds(out_dir, col):
    """Per-file (min, max) of a column, read from the parquet footers."""
    import glob

    import pyarrow.parquet as pq

    bounds = []
    for f in glob.glob(f"{out_dir}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == col
        )
        mins = [md.row_group(g).column(col_idx).statistics.min
                for g in range(md.num_row_groups)]
        maxs = [md.row_group(g).column(col_idx).statistics.max
                for g in range(md.num_row_groups)]
        bounds.append((min(mins), max(maxs)))
    return bounds


def test_zorder_tight_bounds_on_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order's contract: every file's footer min/max is tight on BOTH
    z-columns simultaneously. Single-key range sort fails this on the second
    key (per-file width ≈ full domain); z-order must bound each dimension's
    mean per-file width well below the domain — that bound is exactly what a
    filtered scan on either column prunes with."""
    from cdc_audit_spark.operators.bucketing import write_range_sorted, write_zorder

    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    zout = str(tmp_path / "z")
    write_zorder(lineitem, zout, ["l_orderkey", "l_partkey"], n_files=16)

    lin_out = str(tmp_path / "linear")
    write_range_sorted(lineitem, lin_out, ["l_orderkey"], n_files=16)

    for col in ("l_orderkey", "l_partkey"):
        lo, hi = (lineitem.agg(F.min(col), F.max(col)).first())
        domain = hi - lo + 1
        widths = [(mx - mn + 1) / domain for mn, mx in _file_bounds(zout, col)]
        assert sum(widths) / len(widths) < 0.5, (col, widths)

    # the single-key layout leaves the OTHER column unskippable — the gap
    # z-order closes
    pk_widths = [(mx - mn + 1) for mn, mx in _file_bounds(lin_out, "l_partkey")]
    lo, hi = lineitem.agg(F.min("l_partkey"), F.max("l_partkey")).first()
    assert sum(pk_widths) / len(pk_widths) / (hi - lo + 1) > 0.8

    back = spark.read.parquet(zout)
    assert back.count() == lineitem.count()
    assert back.exceptAll(lineitem).count() == 0


def test_compact_files_reduces_count_preserves_content(spark, sf_dir, tmp_path):
    import glob

    from cdc_audit_spark.operators.bucketing import compact_files

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    fragmented = str(tmp_path / "fragmented")
    orders.repartition(64).write.parquet(fragmented)
    assert len(glob.glob(f"{fragmented}/part-*.parquet")) == 64

    compacted = str(tmp_path / "compacted")
    n = compact_files(spark, fragmented, compacted, target_bytes=1 << 20)
    files = glob.glob(f"{compacted}/part-*.parquet")
    assert len(files) == n < 64

    back = spark.read.parquet(compacted)
    assert back.count() == orders.count()
    assert back.exceptAll(orders).count() == 0
