"""Audit-schema derivation and naming conventions.

The reference derives, for every source table, an audit table whose schema is
the source schema plus three audit columns appended at the end
(cdc_audit_gen_mysql.php:331-333):

    audit_event      enum('insert','update','delete')
    audit_timestamp  timestamp
    audit_pk         int(11) not null primary key auto_increment

Spark has no enum or auto-increment; we model them as a constrained
StringType and a LongType sequence (see capture.assign_audit_pk). ``audit_pk``
is always the LAST column — the sync watermark recovery depends on that
(cdc_audit_sync_mysql.php:352 "audit_pk is always last column").

Everything in this module is a pure function of StructType / strings: no
Spark session needed, fully unit-testable.
"""

from __future__ import annotations

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

AUDIT_EVENT = "audit_event"
AUDIT_TIMESTAMP = "audit_timestamp"
AUDIT_PK = "audit_pk"

#: Valid values of audit_event (cdc_audit_gen_mysql.php:331).
AUDIT_EVENTS = ("insert", "update", "delete")

#: The three audit columns, in reference order (gen:331-333).
AUDIT_COLUMNS: tuple[StructField, ...] = (
    StructField(AUDIT_EVENT, StringType(), nullable=False),
    StructField(AUDIT_TIMESTAMP, TimestampType(), nullable=False),
    StructField(AUDIT_PK, LongType(), nullable=False),
)

AUDIT_COLUMN_NAMES = tuple(f.name for f in AUDIT_COLUMNS)


def audit_schema(source: StructType) -> StructType:
    """Source schema + the three audit columns appended, preserving source
    column order, names, nullability and metadata (gen:346-361)."""
    clash = set(f.name for f in source.fields) & set(AUDIT_COLUMN_NAMES)
    if clash:
        raise ValueError(f"source schema already has audit columns: {sorted(clash)}")
    return StructType(list(source.fields) + list(AUDIT_COLUMNS))


def source_columns(audit: StructType) -> list[str]:
    """The non-audit (source-image) columns of an audit schema, in order."""
    return [f.name for f in audit.fields if f.name not in AUDIT_COLUMN_NAMES]


def is_audit_schema(schema: StructType) -> bool:
    """True if the last three fields are the audit columns in order, with
    audit_pk last (sync:352 invariant)."""
    names = [f.name for f in schema.fields]
    return len(names) >= 3 and tuple(names[-3:]) == AUDIT_COLUMN_NAMES


def audit_table_name(table: str, prefix: str = "") -> str:
    """``{namespace_prefix}{table}_audit`` (gen:534-536)."""
    return f"{prefix}{table}_audit"


def is_audit_table_name(table: str) -> bool:
    """Tables containing '_audit' are never captured themselves
    (gen:215-218; sync filter sync:182-185 keeps only these)."""
    return "_audit" in table


def audit_sql_filename(table: str, prefix: str = "") -> str:
    """``{prefix}{table}.audit.sql`` (gen:541-543)."""
    return f"{prefix}{table}.audit.sql"


def csv_sink_name(table: str) -> str:
    """``{table}.csv`` under the output dir (sync:391-393)."""
    return f"{table}.csv"


def check_no_schema_drift(expected: StructType, actual: StructType) -> None:
    """Fail loudly on source-schema drift — the reference's documented unsolved
    known issue (README.md:210-212, TODO :222-224). We detect instead of
    silently corrupting the log."""
    exp = [(f.name, f.dataType.simpleString()) for f in expected.fields]
    act = [(f.name, f.dataType.simpleString()) for f in actual.fields]
    if exp != act:
        raise SchemaDriftError(
            f"schema drift detected:\n  expected: {exp}\n  actual:   {act}"
        )


class SchemaDriftError(RuntimeError):
    pass


#: Lossless type widenings (the Delta type-widening set restricted to
#: conversions Spark 4's parquet reader and pyarrow both promote on read:
#: integer up-casts, integer→double for types whose every value is exactly
#: representable in a float64, and float→double).
_WIDENINGS: dict[str, frozenset[str]] = {
    "tinyint": frozenset({"smallint", "int", "bigint", "double"}),
    "smallint": frozenset({"int", "bigint", "double"}),
    "int": frozenset({"bigint", "double"}),
    "float": frozenset({"double"}),
}


def is_widening(old_type: str, new_type: str) -> bool:
    """True when ``old_type -> new_type`` (simpleString names) is a
    lossless widening — old data re-reads exactly under the new type."""
    return new_type in _WIDENINGS.get(old_type, frozenset())


def classify_schema_drift(
    old: StructType, new: StructType
) -> dict[str, list[str]]:
    """Split a schema change into the cases that matter for a change log:
    ``added`` (new columns — migratable), ``removed`` (columns gone),
    ``widened`` (same name, losslessly wider type — migratable where the
    reader re-reads old files under the wider type), and ``changed`` (any
    other type change). The reference documents drift as an unsolved
    breaking issue (README.md:210-212); classifying it is what lets us
    auto-migrate the safe cases and fail loudly on the rest."""
    old_by = {f.name: f.dataType.simpleString() for f in old.fields}
    new_by = {f.name: f.dataType.simpleString() for f in new.fields}
    diff = [n for n, t in new_by.items() if n in old_by and old_by[n] != t]
    return {
        "added": [n for n in new_by if n not in old_by],
        "removed": [n for n in old_by if n not in new_by],
        "widened": [n for n in diff if is_widening(old_by[n], new_by[n])],
        "changed": [n for n in diff if not is_widening(old_by[n], new_by[n])],
    }


def evolve_schema(
    old: StructType, new: StructType, allow_widening: bool = False
) -> StructType:
    """Schema migration: the old schema plus columns that appeared in the
    new one (forced nullable — historical rows have no value for them),
    and — with ``allow_widening`` — type-widened columns adopting the new,
    wider type (lossless; callers must re-read historical files under an
    EXPLICIT schema, since parquet footer-merging refuses mixed widths —
    the manifest table does, plain parquet sinks don't and keep this off).
    Removed or otherwise type-changed columns are NOT migratable for an
    append-only audit log (history would reinterpret silently) → raise.
    This is the auto-migration left as a TODO in the reference
    (README.md:222-224)."""
    drift = classify_schema_drift(old, new)
    blocked = drift["changed"] + ([] if allow_widening else drift["widened"])
    if drift["removed"] or blocked:
        raise SchemaDriftError(
            "non-additive schema drift cannot be auto-migrated: "
            f"removed={drift['removed']} changed={blocked}"
            + ("" if allow_widening or not drift["widened"] else
               " (type widenings are supported on manifest tables, "
               "which re-read history under an explicit schema)")
        )
    new_by = {f.name: f for f in new.fields}
    merged = StructType([
        StructField(f.name, new_by[f.name].dataType,
                    f.nullable or new_by[f.name].nullable, f.metadata)
        if f.name in drift["widened"] else f
        for f in old.fields
    ])
    for name in drift["added"]:
        f = new_by[name]
        merged = merged.add(f.name, f.dataType, True, f.metadata)
    return merged
