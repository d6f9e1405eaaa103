"""The local correctness gate: every declared query must hash-match its
DuckDB oracle at sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from cdc_audit_spark.queries import _REGISTRY, oracle_sql, queries
from tests.oracle_harness import compare_query, duck_connection

ORACLE_QUERIES = sorted(oracle_sql().keys())


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    qd = _REGISTRY[name]
    problems = compare_query(spark, duck, qd.fn, qd.oracle, sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_every_query_runs_and_is_nonempty(spark, sf_dir):
    for name, fn in queries().items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_oracle_keys_subset_of_queries():
    assert set(oracle_sql()) <= set(queries())


def test_no_unhashable_output_types(spark, sf_dir):
    """The driver's canonicalization makes DECIMAL outputs hash-unstable
    (Decimal str keeps scale, float64 repr doesn't), crashes on
    array/map/binary cells, and formats DATE differently per engine.
    Ban them at the schema level for every registered query — including
    rows-only (no-oracle) ones, which still pass through the canon."""
    from pyspark.sql import types as T

    banned = (T.DecimalType, T.ArrayType, T.MapType, T.BinaryType,
              T.StructType, T.DateType)
    offenders = []
    for name, fn in queries().items():
        for f in fn(spark, sf_dir).schema.fields:
            if isinstance(f.dataType, banned):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, offenders
