"""Fixture-schema smoke test (VERDICT r03 item 3).

The r03 outage happened because the code *assumed* the parquet encoding of
``events.ts`` (nanos-as-long) instead of observing it, and the environment
shifted under it — 50/50 driver queries died in the shared loader. This test
fails loudly and specifically if the fixture schemas drift again, so the
failure is one readable assert instead of 50 opaque AnalysisExceptions.
"""

from __future__ import annotations

import pytest

from cdc_audit_spark.queries import TABLES, load_tables

# Expected dtypes per FIXTURES.md §A. Timestamp-typed columns accept either
# tz flavor: parquet isAdjustedToUTC decides timestamp vs timestamp_ntz, both
# behave identically here (session tz pinned UTC, naive literals).
_TS = ("timestamp", "timestamp_ntz")

EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint", "c_name": "string", "c_nationkey": "int",
        "c_acctbal": "double", "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint", "s_name": "string", "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint", "p_name": "string", "p_brand": "string",
        "p_type": "string", "p_size": "int", "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint", "o_custkey": "bigint", "o_orderstatus": "string",
        "o_totalprice": "double", "o_orderdate": _TS, "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint", "l_partkey": "bigint", "l_suppkey": "bigint",
        "l_linenumber": "int", "l_quantity": "double", "l_extendedprice": "double",
        "l_discount": "double", "l_tax": "double", "l_returnflag": "string",
        "l_linestatus": "string", "l_shipdate": _TS,
    },
    "events": {
        "event_id": "bigint", "ts": _TS, "user_id": "bigint",
        "event_type": "string", "value": "double", "props": "string",
    },
    "documents": {
        "doc_id": "bigint", "text": "string", "lang": "string",
        "source": "string", "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint", "embedding": "array<float>", "label": "int"},
}


@pytest.mark.parametrize("table", TABLES)
def test_fixture_schema(spark, sf_dir, table):
    got = dict(load_tables(spark, sf_dir)[table].dtypes)
    exp = EXPECTED[table]
    assert set(got) == set(exp), (
        f"{table}: column set drifted — got {sorted(got)}, expected {sorted(exp)}")
    for col, want in exp.items():
        ok = got[col] in want if isinstance(want, tuple) else got[col] == want
        assert ok, (
            f"{table}.{col}: fixture dtype drifted — got {got[col]!r}, "
            f"expected {want!r}. If the environment re-encoded the parquet, "
            f"update normalize_events_ts / this table's loader to key off the "
            f"observed dtype (see VERDICT r03).")


def test_events_ts_is_usable_timestamp(spark, sf_dir):
    # the exact r03 failure mode: ts must come out of the loader as a
    # timestamp type regardless of the on-disk encoding
    ev = load_tables(spark, sf_dir)["events"]
    assert dict(ev.dtypes)["ts"] in _TS
    assert ev.selectExpr("min(ts)").first()[0] is not None


def test_normalize_events_ts_all_encodings(spark):
    """The loader's ts normalization must handle every encoding the
    environment has ever produced: micros-timestamp (current fixtures),
    TIMESTAMP_NTZ, and nanos-as-long (the r01 environment) — keyed off the
    OBSERVED dtype, never an assumption (the r03 outage)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from cdc_audit_spark.queries import normalize_events_ts

    want = dt.datetime(2026, 1, 2, 3, 4, 5, 123456)

    # nanos-as-long: exact integer division, no float precision loss
    nanos = int(want.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) * 1000
    as_long = spark.createDataFrame([(1, nanos)], "event_id long, ts long")
    out = normalize_events_ts(as_long)
    assert dict(out.dtypes)["ts"] == "timestamp"
    assert out.first()["ts"] == want

    # already-timestamp passes through unchanged
    as_ts = spark.createDataFrame([(1, want)], "event_id long, ts timestamp")
    assert normalize_events_ts(as_ts).first()["ts"] == want

    # TIMESTAMP_NTZ → TIMESTAMP is identity on values under the UTC session
    as_ntz = spark.createDataFrame([(1, want)], "event_id long, ts timestamp_ntz")
    out3 = normalize_events_ts(as_ntz)
    assert dict(out3.dtypes)["ts"] == "timestamp"
    assert out3.first()["ts"] == want


def test_table_cache_evicts_stopped_sessions():
    """Weak keys alone cannot reclaim the loader cache (cached DataFrames
    strongly reference their session), so eviction must actively drop
    entries whose session is stopped — or unreadable."""
    from cdc_audit_spark.queries import (
        _ACTIVE_VIEWS,
        _TABLE_CACHE,
        _evict_stopped_sessions,
    )

    class FakeSession:
        def __init__(self, stopped):
            self._stopped = stopped

        @property
        def sparkContext(self):
            if self._stopped == "raise":
                raise RuntimeError("context gone")

            class _S:
                isStopped = staticmethod(lambda s=self: s._stopped)

            class _J:
                sc = staticmethod(lambda: _S)

            class _C:
                _jsc = _J

            return _C

    live, dead, broken = FakeSession(False), FakeSession(True), FakeSession("raise")
    for s in (live, dead, broken):
        _TABLE_CACHE[s] = {}
        _ACTIVE_VIEWS[s] = "sf"
    try:
        _evict_stopped_sessions()
        assert live in _TABLE_CACHE and live in _ACTIVE_VIEWS
        assert dead not in _TABLE_CACHE and dead not in _ACTIVE_VIEWS
        assert broken not in _TABLE_CACHE and broken not in _ACTIVE_VIEWS
    finally:
        _TABLE_CACHE.pop(live, None)
        _ACTIVE_VIEWS.pop(live, None)
