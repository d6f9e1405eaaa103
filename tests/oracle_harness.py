"""Local replica of the driver's correctness gate: run each declared query
on Spark AND its oracle SQL on DuckDB over the same parquet tables, compare
row count, column names, and an order-insensitive value multiset — strictly
(exact equality, no float tolerance). If a query only passes with tolerance,
the query must be redesigned (decimal casting), not the harness loosened.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math

import duckdb

from cdc_audit_spark.queries import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    """Normalize a cell for cross-engine comparison (types only, no value
    fuzzing): Decimal scales are unified, datetimes flattened to isoformat."""
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "nan")
        return ("float", repr(v))
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    return (type(v).__name__, v)


def _multiset(rows, col_order):
    out = {}
    for row in rows:
        key = tuple(_norm(row[i]) for i in col_order)
        out[key] = out.get(key, 0) + 1
    return out


def compare_query(spark, con, fn, sql, sf_dir) -> list[str]:
    """Returns a list of problems (empty = match)."""
    problems = []
    sdf = fn(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = con.sql(sql)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row counts differ: spark={len(spark_rows)} duck={len(duck_rows)}")

    s_order = [spark_cols.index(c) for c in sorted(spark_cols, key=str.lower)]
    d_order = [duck_cols.index(c) for c in sorted(duck_cols, key=str.lower)]
    s_ms = _multiset(spark_rows, s_order)
    d_ms = _multiset(duck_rows, d_order)
    if s_ms != d_ms:
        only_s = [k for k in s_ms if s_ms[k] != d_ms.get(k, 0)][:3]
        only_d = [k for k in d_ms if d_ms[k] != s_ms.get(k, 0)][:3]
        problems.append(
            f"value mismatch; sample spark-only={only_s} duck-only={only_d}"
        )
    return problems
