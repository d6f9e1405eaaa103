"""salted_join must be result-identical to a plain join while spreading a
hot key across salt sub-keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_audit_spark.operators.skew import salted_join, with_salt


@pytest.fixture()
def skewed_orders(spark):
    # 90% of rows share o_custkey = 1 — the shape AQE's partition splitting
    # cannot rebalance when a single key exceeds one reducer
    hot = spark.range(900).select(
        F.lit(1).alias("custkey"), (F.col("id") + 1000).alias("orderkey")
    )
    cold = spark.range(100).select(
        (F.col("id") % 50 + 2).alias("custkey"), F.col("id").alias("orderkey")
    )
    return hot.union(cold)


@pytest.fixture()
def dim_customers(spark):
    return spark.range(60).select(
        (F.col("id") + 1).alias("custkey"),
        F.concat(F.lit("cust_"), F.col("id") + 1).alias("name"),
    )


def test_salted_inner_join_matches_plain(spark, skewed_orders, dim_customers):
    plain = skewed_orders.join(dim_customers, "custkey")
    salted = salted_join(skewed_orders, dim_customers, "custkey", salts=8)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_left_join_matches_plain(spark, skewed_orders, dim_customers):
    # drop some dim keys so left-join null rows exist
    dim = dim_customers.filter(F.col("custkey") % 7 != 0)
    plain = skewed_orders.join(dim, "custkey", "left")
    salted = salted_join(skewed_orders, dim, "custkey", how="left", salts=4)
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salt_spreads_hot_key(spark, skewed_orders):
    salts = with_salt(skewed_orders.filter(F.col("custkey") == 1), 8)
    used = salts.select("__salt").distinct().count()
    assert used >= 6  # 900 hashed rows must cover most of 8 salt values


def test_salt_is_deterministic(spark, skewed_orders):
    a = sorted(map(tuple, with_salt(skewed_orders, 8).collect()))
    b = sorted(map(tuple, with_salt(skewed_orders.repartition(13), 8).collect()))
    assert a == b  # independent of physical partitioning


def test_rejects_unsupported_how(spark, skewed_orders, dim_customers):
    with pytest.raises(ValueError):
        salted_join(skewed_orders, dim_customers, "custkey", how="full")
