"""Sketch-based aggregates: accuracy bounds of the approx query vs the
exact answers on the fixture data."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_audit_spark.queries import _REGISTRY, load_tables


def test_events_approx_stats_within_bounds(spark, sf_dir):
    approx = {
        r["event_type"]: r
        for r in _REGISTRY["events_approx_stats"].fn(spark, sf_dir).collect()
    }
    ev = load_tables(spark, sf_dir)["events"]
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("median_value"),
            F.count("*").alias("n"),
        ).collect()
    }
    assert set(approx) == set(exact)
    for etype, e in exact.items():
        a = approx[etype]
        assert a["n"] == e["n"]  # plain count stays exact
        # HLL++ at rsd=0.01: generous 5% acceptance band
        assert abs(a["approx_users"] - e["users"]) <= max(2, 0.05 * e["users"])
        # percentile_approx with accuracy=10000 on ~2k rows per group is
        # near-exact; allow a small value-scale tolerance
        assert abs(a["approx_median_value"] - e["median_value"]) <= 1.0
