"""MySQL-parity DDL generation (pure Python — no Spark job involved).

Reproduces the *capability* of cdc_audit_gen_mysql.php: given column
metadata for a source table, emit the audit-table DDL
(cdc_audit_gen_mysql.php:295-383) and the three AFTER triggers
(gen:389-529), including legacy-trigger body splicing (gen:444-475).

The input is either a list of column-metadata dicts (the shape MySQL's
INFORMATION_SCHEMA.COLUMNS yields — Field/Type/Null/Key/Comment,
gen:222-227) or a Spark StructType, which we convert via
``columns_from_struct`` so the same generator serves both a live MySQL
catalog (JDBC) and Spark-managed tables.

Semantics preserved from the reference:
  * audit table = source columns + audit_event enum + audit_timestamp +
    audit_pk auto_increment PK (gen:331-333), with per-column nullability
    and quote-escaped comments (gen:357-360).
  * secondary indexes on the source PK columns and audit_timestamp
    (gen:367-370).
  * triggers: one INSERT, zero SELECTs per fire (README.md:83); NEW image
    for insert/update, OLD for delete (gen:483-491); event literal and
    CURRENT_TIMESTAMP appended (gen:493-499); audit_pk omitted from the
    insert so auto_increment assigns it (gen:480-508).
  * legacy trigger bodies: strip BEGIN/END (case-insensitive), drop lines
    mentioning the audit table (idempotent regeneration), splice the rest
    after our insert (gen:444-475).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructType,
    TimestampType,
)

from cdc_audit_spark.schema import audit_table_name

__all__ = [
    "columns_from_struct",
    "audit_table_ddl",
    "audit_triggers_ddl",
    "drop_trigger_ddl",
    "generate_audit_sql",
]

_SPARK_TO_MYSQL: list[tuple[type, str]] = [
    (BooleanType, "tinyint(1)"),
    (ShortType, "smallint"),
    (IntegerType, "int(11)"),
    (LongType, "bigint"),
    (FloatType, "float"),
    (DoubleType, "double"),
    (StringType, "text"),
    (BinaryType, "blob"),
    (DateType, "date"),
    (TimestampType, "datetime"),
]


def _mysql_type(dt: DataType) -> str:
    from pyspark.sql.types import DecimalType

    if isinstance(dt, DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    for klass, name in _SPARK_TO_MYSQL:
        if isinstance(dt, klass):
            return name
    raise ValueError(f"no MySQL mapping for Spark type {dt.simpleString()}")


def columns_from_struct(schema: StructType, pk_cols: list[str] | None = None) -> list[dict]:
    """StructType → the column-metadata dict shape the generator consumes
    (mirrors INFORMATION_SCHEMA.COLUMNS fields used at gen:222-227)."""
    pk = set(pk_cols or [])
    return [
        {
            "Field": f.name,
            "Type": _mysql_type(f.dataType),
            "Null": "NO" if not f.nullable else "YES",
            "Key": "PRI" if f.name in pk else "",
            "Comment": (f.metadata or {}).get("comment", ""),
        }
        for f in schema.fields
    ]


_AUDIT_META_COLUMNS = [
    {
        "Field": "audit_event",
        "Type": "enum('insert','update','delete')",
        "Null": "NO",
        "Key": "",
        "Comment": "Indicates event that occurred in source table",
    },
    {
        "Field": "audit_timestamp",
        "Type": "timestamp",
        "Null": "NO",
        "Key": "",
        "Comment": "Updated when record is inserted, updated or deleted in source table",
    },
    {
        "Field": "audit_pk",
        "Type": "int(11)",
        "Null": "NO",
        "Key": "",
        "Comment": (
            "Audit table primary key, useful for sorting since mysql time "
            "data types are only granular to second level."
        ),
    },
]


def _escape_comment(comment: str) -> str:
    return (comment or "").replace("'", "''")


def audit_table_ddl(table: str, columns: list[dict], prefix: str = "") -> str:
    """CREATE TABLE IF NOT EXISTS for the audit table (gen:322-374)."""
    audit_table = audit_table_name(table, prefix)
    all_cols = list(columns) + _AUDIT_META_COLUMNS
    lines = []
    pk_index_cols = []
    for col in all_cols:
        name = col["Field"]
        nullability = "null" if str(col.get("Null", "NO")).upper() == "YES" else "not null"
        comment = col.get("Comment", "")
        if col.get("Key") == "PRI":
            comment = f"Primary key in source table {table}"
            pk_index_cols.append(f"`{name}`")
        extras = ""
        if name == "audit_pk":
            extras = " primary key auto_increment"
        lines.append(
            f"  `{name}` {col['Type']} {nullability}{extras} "
            f"comment '{_escape_comment(comment)}'"
        )
    if pk_index_cols:
        lines.append(f"  index ({', '.join(pk_index_cols)})")
    lines.append("  index (`audit_timestamp`)")
    body = ",\n".join(lines)
    return (
        f"-- Audit table for table ({table}).\n"
        f"-- Auto-generated by cdc_audit_spark; do not edit.\n"
        f"create table if not exists `{audit_table}` (\n{body}\n);\n"
    )


def drop_trigger_ddl(trigger_name: str) -> str:
    """DROP TRIGGER IF EXISTS (gen:403-407)."""
    return f"DROP TRIGGER IF EXISTS `{trigger_name}`;\n"


def _splice_legacy_body(statement: str, audit_table: str) -> str:
    """Unwrap BEGIN/END and drop lines referencing the audit table, so
    regeneration is idempotent (gen:454-471)."""
    s = statement.strip()
    if s.lower().startswith("begin"):
        s = s[len("begin"):]
    if s.lower().endswith("end"):
        s = s[: -len("end")]
    kept = [line for line in s.split("\n") if audit_table not in line]
    return "\n".join(kept).strip()


def audit_triggers_ddl(
    table: str,
    columns: list[dict],
    prefix: str = "",
    legacy_triggers: list[dict] | None = None,
) -> str:
    """The three AFTER triggers + DROPs for pre-existing ones (gen:389-529).

    ``legacy_triggers`` entries carry ``trigger_name`` / ``EVENT_MANIPULATION``
    / ``ACTION_STATEMENT`` — the INFORMATION_SCHEMA.TRIGGERS projection
    (gen:230-235).
    """
    audit_table = audit_table_name(table, prefix)
    out = [f"-- Audit triggers for table ({table}).\n"]

    legacy_bodies: dict[str, str] = {}
    for tg in legacy_triggers or []:
        if tg.get("trigger_name"):
            out.append(drop_trigger_ddl(tg["trigger_name"]))
        event = str(tg.get("EVENT_MANIPULATION", "")).lower()
        statement = str(tg.get("ACTION_STATEMENT", "")).strip()
        if event and statement:
            legacy_bodies[event] = _splice_legacy_body(statement, audit_table)

    names = ", ".join(f"`{c['Field']}`" for c in columns)
    col_list = f"{names}, `audit_event`, `audit_timestamp`"
    new_vals = ", ".join(f"NEW.`{c['Field']}`" for c in columns)
    old_vals = ", ".join(f"OLD.`{c['Field']}`" for c in columns)

    for event, vals, row_src in (
        ("insert", new_vals, "NEW"),
        ("update", new_vals, "NEW"),
        ("delete", old_vals, "OLD"),
    ):
        values = f"{vals}, '{event}', CURRENT_TIMESTAMP"
        legacy = legacy_bodies.get(event, "")
        legacy_block = f"\n  {legacy}\n" if legacy else "\n"
        out.append(
            f"\n-- {table} after {event.upper()} trigger.\n"
            f"DELIMITER @@\n"
            f"CREATE TRIGGER `{table}_after_{event}` AFTER {event.upper()} ON `{table}`\n"
            f" FOR EACH ROW BEGIN\n"
            f"  insert into `{audit_table}` ({col_list}) values({values});\n"
            f"{legacy_block}"
            f" END;\n"
            f"@@\n"
        )
    return "".join(out)


def generate_audit_sql(
    table: str,
    schema_or_columns,
    pk_cols: list[str] | None = None,
    prefix: str = "",
    legacy_triggers: list[dict] | None = None,
) -> str:
    """Full .audit.sql content: table DDL followed by trigger DDL — the file
    layout of the reference (table first, triggers appended; gen:283-290)."""
    if isinstance(schema_or_columns, StructType):
        columns = columns_from_struct(schema_or_columns, pk_cols)
    else:
        columns = schema_or_columns
    return (
        audit_table_ddl(table, columns, prefix)
        + "\n"
        + audit_triggers_ddl(table, columns, prefix, legacy_triggers)
    )
