from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

import pytest

from cdc_audit_spark import schema as S


CUSTOMER = StructType([
    StructField("c_custkey", LongType(), False),
    StructField("c_name", StringType(), True),
    StructField("c_nationkey", IntegerType(), True),
    StructField("c_acctbal", DoubleType(), True),
    StructField("c_mktsegment", StringType(), True),
])


def test_audit_schema_appends_three_columns_last():
    out = S.audit_schema(CUSTOMER)
    names = [f.name for f in out.fields]
    assert names[:5] == [f.name for f in CUSTOMER.fields]
    assert names[-3:] == ["audit_event", "audit_timestamp", "audit_pk"]
    # audit_pk is always last (cdc_audit_sync_mysql.php:352)
    assert names[-1] == "audit_pk"
    by_name = {f.name: f for f in out.fields}
    assert isinstance(by_name["audit_event"].dataType, StringType)
    assert isinstance(by_name["audit_timestamp"].dataType, TimestampType)
    assert isinstance(by_name["audit_pk"].dataType, LongType)
    assert not by_name["audit_pk"].nullable


def test_audit_schema_preserves_source_order_and_nullability():
    out = S.audit_schema(CUSTOMER)
    assert [(f.name, f.nullable) for f in out.fields[:5]] == [
        (f.name, f.nullable) for f in CUSTOMER.fields
    ]


def test_audit_schema_rejects_clash():
    clashing = StructType([StructField("audit_pk", LongType(), True)])
    with pytest.raises(ValueError):
        S.audit_schema(clashing)


def test_source_columns_roundtrip():
    assert S.source_columns(S.audit_schema(CUSTOMER)) == [f.name for f in CUSTOMER.fields]


def test_is_audit_schema():
    assert S.is_audit_schema(S.audit_schema(CUSTOMER))
    assert not S.is_audit_schema(CUSTOMER)


def test_naming():
    # gen:534-543
    assert S.audit_table_name("customer") == "customer_audit"
    assert S.audit_table_name("customer", "myapp_") == "myapp_customer_audit"
    assert S.audit_sql_filename("customer", "myapp_") == "myapp_customer.audit.sql"
    assert S.csv_sink_name("customer") == "customer.csv"
    assert S.is_audit_table_name("customer_audit")
    assert not S.is_audit_table_name("customer")


def test_schema_drift_detection():
    drifted = StructType(list(CUSTOMER.fields) + [StructField("extra", StringType(), True)])
    with pytest.raises(S.SchemaDriftError):
        S.check_no_schema_drift(CUSTOMER, drifted)
    S.check_no_schema_drift(CUSTOMER, CUSTOMER)  # no raise


def test_classify_schema_drift():
    from pyspark.sql.types import LongType, StringType, StructType

    from cdc_audit_spark.schema import classify_schema_drift

    old = StructType().add("a", LongType()).add("b", StringType())
    new = StructType().add("a", StringType()).add("c", LongType())
    d = classify_schema_drift(old, new)
    assert d == {"added": ["c"], "removed": ["b"], "widened": [],
                 "changed": ["a"]}


def test_classify_schema_drift_widened_vs_changed():
    from pyspark.sql.types import (
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        StructType,
    )

    from cdc_audit_spark.schema import classify_schema_drift, is_widening

    old = (StructType().add("a", IntegerType()).add("b", FloatType())
           .add("c", LongType()))
    new = (StructType().add("a", LongType()).add("b", DoubleType())
           .add("c", IntegerType()))  # c NARROWS -> changed
    d = classify_schema_drift(old, new)
    assert sorted(d["widened"]) == ["a", "b"]
    assert d["changed"] == ["c"]
    assert is_widening("int", "bigint") and is_widening("float", "double")
    assert is_widening("int", "double")  # every int32 is float64-exact
    assert not is_widening("bigint", "double")  # lossy above 2^53
    assert not is_widening("bigint", "int")
    assert not is_widening("double", "float")


def test_evolve_schema_widening_gated():
    import pytest
    from pyspark.sql.types import IntegerType, LongType, StructType

    from cdc_audit_spark.schema import SchemaDriftError, evolve_schema

    old = StructType().add("a", IntegerType(), False)
    wide = StructType().add("a", LongType(), False)
    # off by default (plain parquet sinks can't re-read mixed widths)
    with pytest.raises(SchemaDriftError, match="manifest tables"):
        evolve_schema(old, wide)
    merged = evolve_schema(old, wide, allow_widening=True)
    assert merged["a"].dataType.simpleString() == "bigint"
    assert not merged["a"].nullable  # both sides non-null: stays non-null


def test_evolve_schema_appends_nullable_and_refuses_breaking():
    import pytest
    from pyspark.sql.types import LongType, StringType, StructType

    from cdc_audit_spark.schema import SchemaDriftError, evolve_schema

    old = StructType().add("a", LongType(), False)
    grown = StructType().add("a", LongType(), False).add("b", StringType(), False)
    merged = evolve_schema(old, grown)
    assert [f.name for f in merged.fields] == ["a", "b"]
    assert merged["b"].nullable  # history has no values for it
    assert not merged["a"].nullable  # existing fields untouched

    with pytest.raises(SchemaDriftError):
        evolve_schema(grown, old)  # removal
    with pytest.raises(SchemaDriftError):
        evolve_schema(old, StructType().add("a", StringType()))  # type change
