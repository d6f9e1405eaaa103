"""Range join: bin equi-join + residual must equal the naive
cross-join-and-filter result, at any bin width."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cdc_audit_spark.operators.rangejoin import point_in_interval_join


def _ts(h, m=0):
    return dt.datetime(2026, 1, 1, h, m)


@pytest.fixture()
def points(spark):
    rows = [(i, _ts(i % 24, (i * 7) % 60)) for i in range(200)]
    return spark.createDataFrame(rows, "point_id long, ts timestamp")


@pytest.fixture()
def intervals(spark):
    rows = [
        (100, _ts(1), _ts(3)),
        (101, _ts(2, 30), _ts(2, 45)),   # sub-bin interval
        (102, _ts(5), _ts(23, 59)),      # spans many bins
        (103, _ts(7, 15), _ts(7, 15)),   # zero-length
    ]
    return spark.createDataFrame(rows, "iv_id long, lo timestamp, hi timestamp")


@pytest.mark.parametrize("bin_width", [600, 3600, 86400])
def test_matches_naive_join(spark, points, intervals, bin_width):
    naive = points.join(
        intervals,
        (F.col("ts") >= F.col("lo")) & (F.col("ts") <= F.col("hi")),
    ).select("point_id", "iv_id")
    binned = point_in_interval_join(
        points, intervals, "ts", "lo", "hi", bin_width_secs=bin_width
    ).select("point_id", "iv_id")
    assert binned.exceptAll(naive).count() == 0
    assert naive.exceptAll(binned).count() == 0


def test_no_duplicate_pairs(spark, points, intervals):
    out = point_in_interval_join(points, intervals, "ts", "lo", "hi",
                                 bin_width_secs=600)
    pairs = out.select("point_id", "iv_id")
    assert pairs.count() == pairs.distinct().count()


def test_left_join_keeps_uncontained_points(spark, points, intervals):
    out = point_in_interval_join(points, intervals, "ts", "lo", "hi",
                                 bin_width_secs=3600, how="left")
    assert out.select("point_id").distinct().count() == 200
    # contained pairs identical to inner
    inner = point_in_interval_join(points, intervals, "ts", "lo", "hi",
                                   bin_width_secs=3600)
    matched = out.filter(F.col("iv_id").isNotNull()).select("point_id", "iv_id")
    assert matched.exceptAll(inner.select("point_id", "iv_id")).count() == 0
    assert inner.select("point_id", "iv_id").exceptAll(matched).count() == 0


def test_equi_join_not_nested_loop(spark, points, intervals):
    out = point_in_interval_join(points, intervals, "ts", "lo", "hi")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan  # the thing we're avoiding
