from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from cdc_audit_spark.ddlgen import (
    audit_table_ddl,
    audit_triggers_ddl,
    columns_from_struct,
    drop_trigger_ddl,
    generate_audit_sql,
)

SCHEMA = StructType([
    StructField("id", LongType(), False),
    StructField("name", StringType(), True, metadata={"comment": "the o'name"}),
    StructField("qty", IntegerType(), True),
    StructField("price", DoubleType(), True),
])
COLS = columns_from_struct(SCHEMA, pk_cols=["id"])


def test_columns_from_struct():
    assert COLS[0] == {"Field": "id", "Type": "bigint", "Null": "NO", "Key": "PRI", "Comment": ""}
    assert COLS[1]["Null"] == "YES"
    assert COLS[1]["Comment"] == "the o'name"


def test_table_ddl_shape():
    ddl = audit_table_ddl("items", COLS)
    assert "create table if not exists `items_audit` (" in ddl
    # three audit columns, audit_pk last with PK + auto_increment (gen:331-333)
    assert "`audit_event` enum('insert','update','delete') not null" in ddl
    assert "`audit_timestamp` timestamp not null" in ddl
    assert "`audit_pk` int(11) not null primary key auto_increment" in ddl
    assert ddl.index("`audit_event`") < ddl.index("`audit_timestamp`") < ddl.index("`audit_pk`")
    # source PK gets a secondary index + comment rewrite (gen:342-343,367-368)
    assert "index (`id`)" in ddl
    assert "index (`audit_timestamp`)" in ddl
    assert "Primary key in source table items" in ddl


def test_comment_quote_escaping():
    # gen:360 — single quotes doubled
    ddl = audit_table_ddl("items", COLS)
    assert "the o''name" in ddl


def test_triggers_shape():
    ddl = audit_triggers_ddl("items", COLS)
    for ev in ("insert", "update", "delete"):
        assert f"CREATE TRIGGER `items_after_{ev}` AFTER {ev.upper()} ON `items`" in ddl
        assert "FOR EACH ROW BEGIN" in ddl
    # NEW image for insert/update, OLD for delete (gen:483-491)
    assert ddl.count("NEW.`id`") == 2
    assert ddl.count("OLD.`id`") == 1
    # event literal + CURRENT_TIMESTAMP; audit_pk auto-assigned (absent)
    assert "'insert', CURRENT_TIMESTAMP" in ddl
    assert "audit_pk" not in ddl.split("CREATE TRIGGER")[1]


def test_legacy_trigger_splice():
    legacy = [{
        "trigger_name": "items_after_update",
        "EVENT_MANIPULATION": "UPDATE",
        "ACTION_STATEMENT": "BEGIN\n  insert into `items_audit` (x) values (1);\n  call legacy_proc();\nEND",
    }]
    ddl = audit_triggers_ddl("items", COLS, legacy_triggers=legacy)
    # old trigger dropped (gen:403-407,443-449)
    assert "DROP TRIGGER IF EXISTS `items_after_update`;" in ddl
    # legacy body preserved in the update trigger, audit line removed (gen:463-471)
    update_body = ddl.split("after_update` AFTER UPDATE")[1].split("@@")[0]
    assert "call legacy_proc();" in update_body
    assert update_body.count("insert into `items_audit`") == 1  # only ours


def test_splice_idempotent():
    once = audit_triggers_ddl("items", COLS)
    # feed our own generated update trigger body back in as "legacy"
    body = "BEGIN\n  insert into `items_audit` (`id`) values (NEW.`id`);\nEND"
    legacy = [{"trigger_name": "x", "EVENT_MANIPULATION": "UPDATE", "ACTION_STATEMENT": body}]
    again = audit_triggers_ddl("items", COLS, legacy_triggers=legacy)
    assert once.split("DROP TRIGGER")[0].count("insert into") == again.count("insert into")


def test_drop_trigger():
    assert drop_trigger_ddl("t1") == "DROP TRIGGER IF EXISTS `t1`;\n"


def test_generate_full_file_table_then_triggers():
    sql = generate_audit_sql("items", SCHEMA, pk_cols=["id"], prefix="app_")
    assert "`app_items_audit`" in sql
    assert sql.index("create table") < sql.index("CREATE TRIGGER")
