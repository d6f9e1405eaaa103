"""JDBC incremental source: pure batch-plan construction (no database in
the test env) + the poll_sync loop executed against parquet fixtures."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

import cdc_audit_spark as cas
from cdc_audit_spark.sources import (
    incremental_subquery,
    partition_predicates,
    plan_incremental_batch,
    poll_sync,
)


def test_incremental_subquery_pushes_predicate():
    q = incremental_subquery("orders_audit", 12345)
    assert q == "(SELECT * FROM `orders_audit` WHERE `audit_pk` > 12345) AS cdc_delta"


def test_partition_predicates_disjoint_and_covering():
    preds = partition_predicates(100, 1100, 4)
    assert preds == [
        "`audit_pk` > 100 AND `audit_pk` <= 350",
        "`audit_pk` > 350 AND `audit_pk` <= 600",
        "`audit_pk` > 600 AND `audit_pk` <= 850",
        "`audit_pk` > 850",  # unbounded tail: race-safe vs late commits
    ]


def test_partition_predicates_degenerate_cases():
    # empty span and single partition both collapse to one open range
    assert partition_predicates(50, 50, 4) == ["`audit_pk` > 50"]
    assert partition_predicates(0, 10, 1) == ["`audit_pk` > 0"]
    # more partitions than rows: stride clamps to 1, ranges stay disjoint
    preds = partition_predicates(0, 3, 8)
    assert preds[-1].count("<=") == 0
    with pytest.raises(ValueError):
        partition_predicates(0, 10, 0)


def test_plan_incremental_batch_shapes():
    p1 = plan_incremental_batch("jdbc:mysql://h/db", "t_audit", 7)
    assert p1.predicates == ["`audit_pk` > 7"]
    p2 = plan_incremental_batch("jdbc:mysql://h/db", "t_audit", 0,
                                max_pk=1000, num_partitions=4)
    assert len(p2.predicates) == 4
    assert p2.url == "jdbc:mysql://h/db" and p2.table == "t_audit"


def test_poll_sync_drains_and_stops(spark, sf_dir, tmp_path):
    v0 = spark.read.parquet(f"{sf_dir}/customer.parquet")
    v1 = v0.withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 3 == 0, F.round(F.col("c_acctbal") + 1.0, 2))
        .otherwise(F.col("c_acctbal")),
    )
    audit = cas.snapshot_diff(v0, v1, ["c_custkey"], ts=dt.datetime(2026, 1, 1))
    audit.cache()
    total = audit.count()
    sink = str(tmp_path / "sink")

    def read_fn(wm: int):
        # stands in for plan_incremental_batch(...).load(spark): the source
        # itself applies the watermark predicate
        return audit.filter(F.col("audit_pk") > F.lit(wm))

    results = poll_sync(spark, read_fn, sink, fmt="parquet", max_polls=5)
    # first poll drains everything, second sees an empty delta and stops
    assert [r.rows_synced for r in results] == [total, 0]
    assert results[0].watermark == total
    assert cas.read_sink(spark, sink, fmt="parquet").count() == total
    audit.unpersist()
