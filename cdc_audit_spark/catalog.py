"""Catalog discovery — the Spark re-expression of SURVEY §2.1 S1-S4.

The reference discovers source tables with ``SHOW FULL TABLES WHERE
Table_type = 'BASE TABLE'`` (cdc_audit_gen_mysql.php:205-208) and column
metadata from INFORMATION_SCHEMA.COLUMNS (gen:222-227). Spark-managed
tables use ``spark.catalog``; a live MySQL source uses JDBC reads of
information_schema with pushed-down predicates (verified pushdown: the
filter lands in the generated JDBC subquery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from cdc_audit_spark.schema import is_audit_table_name

__all__ = [
    "list_capture_tables",
    "list_audit_tables",
    "columns_metadata",
    "jdbc_base_tables",
    "jdbc_columns",
]


def list_capture_tables(
    spark: SparkSession,
    include: set[str] | None = None,
    db: str | None = None,
) -> list[str]:
    """Candidate source tables: all base tables, minus audit tables
    (gen:215-218), intersected with the user's -t list (gen:210-213)."""
    tables = [t.name for t in spark.catalog.listTables(db)
              if t.tableType in ("MANAGED", "EXTERNAL", "TEMPORARY")]
    out = [t for t in tables if not is_audit_table_name(t)]
    if include is not None:
        out = [t for t in out if t in include]
    return sorted(out)


def list_audit_tables(
    spark: SparkSession,
    include: set[str] | None = None,
    db: str | None = None,
) -> list[str]:
    """Audit tables eligible for sync: name must contain '_audit'
    (cdc_audit_sync_mysql.php:182-185), optional -t filter (sync:187-190)."""
    tables = [t.name for t in spark.catalog.listTables(db)]
    out = [t for t in tables if is_audit_table_name(t)]
    if include is not None:
        out = [t for t in out if t in include]
    return sorted(out)


_COLMETA_SCHEMA = StructType([
    StructField("Field", StringType(), False),
    StructField("Type", StringType(), False),
    StructField("Null", StringType(), False),
    StructField("ordinal_position", IntegerType(), False),
])


def columns_metadata(spark: SparkSession, df_or_table) -> DataFrame:
    """Column metadata of a table/DataFrame, shaped like the reference's
    aliased INFORMATION_SCHEMA.COLUMNS projection (gen:222-227).

    Ordinal position is made explicit — MySQL returns catalog order
    implicitly; Spark guarantees no ordering without a sort (SURVEY §2.5 W3).
    """
    df = spark.table(df_or_table) if isinstance(df_or_table, str) else df_or_table
    rows = [
        (f.name, f.dataType.simpleString(), "YES" if f.nullable else "NO", i + 1)
        for i, f in enumerate(df.schema.fields)
    ]
    return spark.createDataFrame(rows, _COLMETA_SCHEMA)


# --- JDBC variants (live MySQL catalog; no MySQL server in the test env, ---
# --- so these are exercised only for plan construction, not execution).  ---

def _jdbc_reader(spark: SparkSession, url: str, options: dict | None):
    reader = spark.read.format("jdbc").option("url", url)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader


def jdbc_base_tables(spark: SparkSession, url: str, db: str,
                     options: dict | None = None) -> DataFrame:
    """S1: base-table listing via information_schema.tables with the
    type/schema predicates pushed into the JDBC scan (gen:205-208)."""
    return (
        _jdbc_reader(spark, url, options)
        .option("dbtable", "information_schema.tables")
        .load()
        .filter(
            (F.col("table_schema") == db) & (F.col("table_type") == "BASE TABLE")
        )
        .select("table_name")
    )


def jdbc_columns(spark: SparkSession, url: str, db: str, table: str,
                 options: dict | None = None) -> DataFrame:
    """S3: the aliased 7-column projection of information_schema.columns
    (gen:222-227), ordered by ordinal for determinism (W3)."""
    return (
        _jdbc_reader(spark, url, options)
        .option("dbtable", "information_schema.columns")
        .load()
        .filter((F.col("table_schema") == db) & (F.col("table_name") == table))
        .select(
            F.col("column_name").alias("Field"),
            F.col("column_type").alias("Type"),
            F.col("is_nullable").alias("Null"),
            F.col("column_key").alias("Key"),
            F.col("column_default").alias("Default"),
            F.col("extra").alias("Extra"),
            F.col("column_comment").alias("Comment"),
            F.col("ordinal_position"),
        )
        .orderBy("ordinal_position")
    )


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column data-quality profile: (column, n_rows, n_nulls, n_distinct).

    The engine-side ANALYZE the reference delegates to MySQL statistics. One
    aggregate pass computes every column's null count; exact distincts ride
    the same aggregate (Catalyst expands distinct aggregates into one
    shuffle). The wide 1-row result is unpivoted driver-lite via stack() —
    no collect, no per-column jobs. At very large scale swap
    countDistinct for approx_count_distinct (HLL, single pass, no expand).
    """
    cols = cols or df.columns
    n = F.count(F.lit(1))
    aggs = [n.alias("__n")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"))
        aggs.append(F.countDistinct(c).alias(f"__dist_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __dist_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (column, n_nulls, n_distinct)"
        ),
        F.col("__n").alias("n_rows"),
    ).select("column", "n_rows", "n_nulls", "n_distinct")
