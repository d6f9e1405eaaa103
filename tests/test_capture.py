import datetime as dt

from pyspark.sql import functions as F

from cdc_audit_spark.capture import apply_changes, assign_audit_pk, snapshot_diff

TS = dt.datetime(2026, 1, 1, 0, 0, 0)


def _snapshots(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "pk int, name string, bal double",
    )
    # 1 unchanged, 2 updated, 3 deleted, 5 inserted, 4 unchanged
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 25.0), (4, "d", 40.0), (5, "e", 50.0)],
        "pk int, name string, bal double",
    )
    return old, new


def test_diff_classifies_events(spark):
    old, new = _snapshots(spark)
    out = snapshot_diff(old, new, ["pk"], ts=TS).collect()
    by_pk = {r["pk"]: r for r in out}
    assert len(out) == 3
    assert by_pk[5]["audit_event"] == "insert"
    assert by_pk[2]["audit_event"] == "update"
    assert by_pk[3]["audit_event"] == "delete"


def test_diff_images(spark):
    # insert/update carry NEW image, delete carries OLD (gen:483-491)
    old, new = _snapshots(spark)
    by_pk = {r["pk"]: r for r in snapshot_diff(old, new, ["pk"], ts=TS).collect()}
    assert by_pk[2]["bal"] == 25.0  # NEW image for update
    assert by_pk[3]["bal"] == 30.0  # OLD image for delete
    assert by_pk[5]["bal"] == 50.0  # NEW image for insert


def test_diff_audit_pk_contiguous_deterministic(spark):
    old, new = _snapshots(spark)
    out = snapshot_diff(old, new, ["pk"], ts=TS, base_pk=100)
    pks = sorted(r["audit_pk"] for r in out.collect())
    assert pks == [101, 102, 103]
    again = sorted(r["audit_pk"] for r in snapshot_diff(old, new, ["pk"], ts=TS, base_pk=100).collect())
    assert pks == again


def test_diff_empty_when_identical(spark):
    old, _ = _snapshots(spark)
    assert snapshot_diff(old, old, ["pk"], ts=TS).count() == 0


def test_diff_null_safe_change_detection(spark):
    old = spark.createDataFrame([(1, None), (2, "x"), (3, None)], "pk int, v string")
    new = spark.createDataFrame([(1, None), (2, None), (3, "y")], "pk int, v string")
    out = {r["pk"]: r["audit_event"] for r in snapshot_diff(old, new, ["pk"], ts=TS).collect()}
    # null → null is NOT a change; null ↔ value is
    assert out == {2: "update", 3: "update"}


def test_distributed_pk_matches_window(spark):
    old, new = _snapshots(spark)
    w = snapshot_diff(old, new, ["pk"], ts=TS, pk_strategy="window")
    d = snapshot_diff(old, new, ["pk"], ts=TS, pk_strategy="distributed")
    assert sorted(map(tuple, w.collect())) == sorted(map(tuple, d.collect()))


def test_assign_audit_pk_distributed_contiguous(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    out = assign_audit_pk(df, ["k"], base=10, strategy="distributed")
    rows = out.orderBy("k").collect()
    assert [r["audit_pk"] for r in rows] == list(range(11, 1011))


def test_apply_changes_roundtrip(spark):
    old, new = _snapshots(spark)
    audit = snapshot_diff(old, new, ["pk"], ts=TS)
    replayed = apply_changes(old, audit, ["pk"])
    assert sorted(map(tuple, replayed.collect())) == sorted(map(tuple, new.collect()))


def test_apply_changes_roundtrip_on_fixture(spark, sf_dir):
    v0 = spark.read.parquet(f"{sf_dir}/customer.parquet")
    # scripted mutation: delete custkey%19==3, update bal where %10==0, insert shifted copies
    deleted = v0.filter(F.col("c_custkey") % 19 != 3)
    updated = deleted.withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 10 == 0, F.round(F.col("c_acctbal") + 100.0, 2))
        .otherwise(F.col("c_acctbal")),
    )
    maxk = v0.agg(F.max("c_custkey")).first()[0]
    inserts = (
        v0.filter(F.col("c_custkey") % 23 == 1)
        .withColumn("c_custkey", F.col("c_custkey") + F.lit(maxk))
    )
    v1 = updated.unionByName(inserts)
    audit = snapshot_diff(v0, v1, ["c_custkey"], ts=TS)
    events = {r["audit_event"]: r["cnt"] for r in audit.groupBy("audit_event").agg(F.count("*").alias("cnt")).collect()}
    assert events.get("insert", 0) > 0
    assert events.get("update", 0) > 0
    assert events.get("delete", 0) > 0
    replayed = apply_changes(v0, audit, ["c_custkey"])
    assert sorted(map(tuple, replayed.collect())) == sorted(map(tuple, v1.collect()))


def test_auto_strategy_selects_by_plan_size(spark):
    from cdc_audit_spark.capture import _plan_size_estimate, _WINDOW_MAX_EST_BYTES

    small = spark.range(0, 100).select(F.col("id").alias("k"))
    est = _plan_size_estimate(small)
    assert est is not None and est <= _WINDOW_MAX_EST_BYTES
    # auto on a small set must still produce the same contiguous ids
    out = assign_audit_pk(small, ["k"], base=0, strategy="auto")
    assert [r["audit_pk"] for r in out.orderBy("k").collect()] == list(range(1, 101))

    # a plan estimated above the threshold must take the distributed path
    # (assign_audit_pk runs a per-partition count job, so keep the input a
    # cheap range — 20M rows estimates ~160 MB, well over the threshold)
    big = spark.range(0, 20_000_000).select(F.col("id").alias("k"))
    est_big = _plan_size_estimate(big)
    assert est_big is None or est_big > _WINDOW_MAX_EST_BYTES
    plan = assign_audit_pk(
        big, ["k"], strategy="auto"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # distributed path: no global WindowExec


def test_auto_estimate_join_bounded_by_leaf_sizes(spark, sf_dir):
    """Catalyst multiplies sizes through joins (a snapshot diff of two
    ~300 KB snapshots 'estimates' GBs); the leaf-sum bound must bring a
    small diff back under the window threshold so small capture batches
    keep the cheap single-shuffle path."""
    import datetime as dt

    from cdc_audit_spark.capture import _plan_size_estimate, _WINDOW_MAX_EST_BYTES

    v0 = spark.read.parquet(f"{sf_dir}/customer.parquet")
    v1 = v0.withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 10 == 0, F.col("c_acctbal") + 1.0)
        .otherwise(F.col("c_acctbal")),
    )
    diff = snapshot_diff(v0, v1, ["c_custkey"], ts=dt.datetime(2026, 1, 1),
                         pk_strategy="window")
    est = _plan_size_estimate(diff)
    assert est is not None and est <= _WINDOW_MAX_EST_BYTES
    # and the id-assignment plan under auto is the single-window form
    audit = snapshot_diff(v0, v1, ["c_custkey"], ts=dt.datetime(2026, 1, 1))
    plan = audit._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan and "mapInPandas" not in plan.lower()


def test_snapshot_diff_null_pk_rows(spark):
    """A NULL primary key is matched by the null-safe join and classified
    like any other key — not misread as an insert+delete pair. (MySQL
    forbids NULL PKs; arbitrary DataFrames do not.)"""
    import datetime as dt

    from cdc_audit_spark.capture import snapshot_diff

    sch = "k long, v string"
    v0 = spark.createDataFrame([(None, "a"), (1, "x")], sch)
    # null-keyed row updated; key 1 unchanged
    v1 = spark.createDataFrame([(None, "b"), (1, "x")], sch)
    out = snapshot_diff(v0, v1, ["k"], ts=dt.datetime(2026, 1, 1)).collect()
    assert len(out) == 1
    assert out[0]["audit_event"] == "update"
    assert out[0]["k"] is None and out[0]["v"] == "b"
