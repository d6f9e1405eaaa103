"""operators.ranks: scale-safe ranked exports must be SQL-window-exact."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cdc_audit_spark.operators.ranks import ntile_buckets, ranked_export


def _orders(spark, n=157):
    # deliberately collision-heavy values (v = i % 13) to exercise ties
    return spark.createDataFrame(
        [(i, float(i % 13)) for i in range(n)], "k long, v double"
    )


def test_ranked_export_unique_matches_sql_window(spark):
    df = _orders(spark)
    got = {
        r["k"]: (r["percent_rank"], r["cume_dist"])
        for r in ranked_export(df, ["v", "k"]).collect()
    }
    w = Window.orderBy("v", "k")
    want = {
        r["k"]: (r["pr"], r["cd"])
        for r in df.select(
            "k", F.percent_rank().over(w).alias("pr"), F.cume_dist().over(w).alias("cd")
        ).collect()
    }
    assert got == want  # bit-exact: same integer-operand double divisions


def test_ranked_export_tie_semantics_matches_sql(spark):
    df = _orders(spark)
    got = {
        r["k"]: (r["percent_rank"], r["cume_dist"])
        for r in ranked_export(
            df, ["v"], assume_unique=False, strategy="distributed"
        ).collect()
    }
    w = Window.orderBy("v")
    want = {
        r["k"]: (r["pr"], r["cd"])
        for r in df.select(
            "k", F.percent_rank().over(w).alias("pr"), F.cume_dist().over(w).alias("cd")
        ).collect()
    }
    assert got == want


def test_ntile_matches_sql_window(spark):
    for n, k in [(157, 4), (160, 4), (7, 3), (100, 7), (5, 8)]:
        df = _orders(spark, n)
        got = {r["k"]: r["ntile"] for r in ntile_buckets(df, ["v", "k"], k).collect()}
        w = Window.orderBy("v", "k")
        want = {
            r["k"]: r["nt"] for r in df.select("k", F.ntile(k).over(w).alias("nt")).collect()
        }
        assert got == want, (n, k)


def test_ranked_export_single_row(spark):
    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    row = ranked_export(df, ["v", "k"]).collect()[0]
    assert row["percent_rank"] == 0.0 and row["cume_dist"] == 1.0
