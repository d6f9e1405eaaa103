"""Materialized-view maintenance (mview.py): the refreshed view must equal
a direct aggregate over the post-batch snapshot — including the hard cases:
updates that migrate rows between groups, groups emptied by deletes, and
groups born from inserts."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cdc_audit_spark import capture
from cdc_audit_spark.mview import (
    bootstrap_group_sum,
    incremental_group_sum,
    maintain_group_sum,
)


def _direct(df):
    return sorted(
        map(tuple, df.groupBy("g").agg(
            F.sum(F.col("val").cast("decimal(12,2)")).alias("total"),
            F.count("*").alias("n_rows"),
        ).collect())
    )


@pytest.fixture(scope="module")
def snapshots(spark):
    v0 = spark.createDataFrame(
        [
            (1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0),
            (4, "b", 40.0), (5, "c", 50.0),
        ],
        "pk long, g string, val double",
    )
    v1 = spark.createDataFrame(
        [
            (1, "a", 15.0),   # in-place update
            (2, "b", 20.0),   # group migration a → b
            (3, "b", 30.0),   # untouched
            (4, "b", 40.0),   # untouched
            # 5 deleted → group c disappears entirely
            (6, "d", 60.0),   # insert into a brand-new group
        ],
        "pk long, g string, val double",
    )
    return v0, v1


def test_maintained_view_equals_direct_aggregate(spark, snapshots):
    v0, v1 = snapshots
    audit = capture.snapshot_diff(v0, v1, ["pk"], ts=dt.datetime(2026, 1, 1))
    got = incremental_group_sum(
        v0, audit, ["pk"], ["g"], F.col("val").cast("decimal(12,2)")
    )
    assert sorted(map(tuple, got.collect())) == _direct(v1)
    # group c must be ABSENT (not present with 0), group d must be present
    groups = {r["g"] for r in got.collect()}
    assert "c" not in groups and "d" in groups


def test_two_step_maintenance_composes(spark, snapshots):
    """view(v0) + batch1 + batch2 == direct(v2): maintenance composes across
    refresh cycles without drift."""
    v0, v1 = snapshots
    v2 = spark.createDataFrame(
        [(2, "b", 25.0), (3, "a", 30.0), (4, "b", 40.0), (6, "d", 61.0)],
        "pk long, g string, val double",
    )
    val = F.col("val").cast("decimal(12,2)")
    b1 = capture.snapshot_diff(v0, v1, ["pk"], ts=dt.datetime(2026, 1, 1))
    b2 = capture.snapshot_diff(v1, v2, ["pk"], ts=dt.datetime(2026, 1, 2))
    view = bootstrap_group_sum(v0, ["g"], val)
    view = maintain_group_sum(view, v0, b1, ["pk"], ["g"], val)
    view = maintain_group_sum(view, v1, b2, ["pk"], ["g"], val)
    assert sorted(map(tuple, view.collect())) == _direct(v2)


def test_empty_batch_is_identity(spark, snapshots):
    v0, _ = snapshots
    val = F.col("val").cast("decimal(12,2)")
    empty = capture.snapshot_diff(v0, v0, ["pk"], ts=dt.datetime(2026, 1, 1))
    assert empty.count() == 0
    view = bootstrap_group_sum(v0, ["g"], val)
    refreshed = maintain_group_sum(view, v0, empty, ["pk"], ["g"], val)
    assert sorted(map(tuple, refreshed.collect())) == sorted(map(tuple, view.collect()))


def test_stream_mview_sync_manifest_o_delta(spark, tmp_path):
    """The manifest-backed (primary) mview stream: drained micro-batches
    leave a view LSM whose fold equals a direct aggregate over the final
    base replica; every post-bootstrap commit is an append or a
    dir-granular merge (O(delta) at the storage layer — VERDICT r08 #1),
    and a restarted drain applies only new audit files."""
    import datetime as dt

    from pyspark.sql import functions as F

    from cdc_audit_spark.sinks.manifest import ManifestTable
    from cdc_audit_spark.streaming.stream_mview import (
        current_manifest_mview,
        stream_mview_sync_manifest,
    )

    sch = ("k long, seg string, val double, audit_event string, "
           "audit_timestamp timestamp, audit_pk long")
    ts = dt.datetime(2026, 1, 1)
    batches = [
        [(1, "A", 10.0, "insert", ts, 1), (2, "A", 20.0, "insert", ts, 2),
         (3, "B", 30.0, "insert", ts, 3)],
        [(4, "B", 40.0, "insert", ts, 4)],
        [(1, "B", 10.0, "update", ts, 5),   # A → B migration
         (2, "A", 25.0, "update", ts, 6)],
        [(3, "B", 30.0, "delete", ts, 7),
         (2, "A", 25.0, "delete", ts, 8)],  # empties group A
    ]
    src = str(tmp_path / "audit_src")
    for rows in batches:
        spark.createDataFrame(rows, sch).coalesce(1).write.mode(
            "append").parquet(src)

    base_p, view_p = str(tmp_path / "base_t"), str(tmp_path / "view_t")
    ck = str(tmp_path / "ck")
    schema = spark.read.parquet(src).schema
    q = stream_mview_sync_manifest(
        spark, src, schema, base_p, view_p, ck, ["k"], ["seg"],
        F.col("val").cast("decimal(12,2)"), max_files_per_trigger=1)
    q.awaitTermination(240)

    base, view = current_manifest_mview(spark, base_p, view_p, ["seg"])
    direct = base.groupBy("seg").agg(
        F.sum(F.col("val").cast("decimal(12,2)")).alias("total"),
        F.count("*").alias("n_rows"))
    vs = {(r["seg"], float(r["total"]), r["n_rows"]) for r in view.collect()}
    ds = {(r["seg"], float(r["total"]), r["n_rows"]) for r in direct.collect()}
    assert vs == ds == {("B", 50.0, 2)}

    # O(delta) commit shapes
    view_t, base_t = ManifestTable(spark, view_p), ManifestTable(spark, base_p)
    assert all(view_t.manifest(v)["action"] == "append"
               for v in view_t.versions())
    acts = [base_t.manifest(v)["action"] for v in base_t.versions()]
    assert all(a == "merge" for a in acts)

    # restart applies only the new batch (exactly-once across restarts)
    spark.createDataFrame([(4, "B", 40.0, "delete", ts, 9)], sch
                          ).coalesce(1).write.mode("append").parquet(src)
    q2 = stream_mview_sync_manifest(
        spark, src, schema, base_p, view_p, ck, ["k"], ["seg"],
        F.col("val").cast("decimal(12,2)"))
    q2.awaitTermination(120)
    _, view2 = current_manifest_mview(spark, base_p, view_p, ["seg"])
    assert {(r["seg"], float(r["total"]), r["n_rows"])
            for r in view2.collect()} == {("B", 10.0, 1)}


def test_mview_fold_policy_bounds_fanin(spark, tmp_path):
    """maybe_fold_mview: past max_dirs the LSM is rewritten as ONE
    absolute snapshot whose fold is unchanged, and the epoch guard
    survives the fold (epoch/run_id inherit through the overwrite)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from cdc_audit_spark.sinks.manifest import ManifestTable
    from cdc_audit_spark.streaming.stream_mview import (
        apply_mview_manifest_epoch,
        current_manifest_mview,
    )

    sch = ("k long, seg string, val double, audit_event string, "
           "audit_timestamp timestamp, audit_pk long")
    ts = dt.datetime(2026, 1, 1)
    base_t = ManifestTable(spark, str(tmp_path / "base_t"))
    view_t = ManifestTable(spark, str(tmp_path / "view_t"))
    val = F.col("val").cast("decimal(12,2)")
    for e in range(6):
        b = spark.createDataFrame(
            [(e, "S" + str(e % 2), float(e), "insert", ts, e + 1)], sch)
        apply_mview_manifest_epoch(base_t, view_t, b, e, "r1",
                                   ["k"], ["seg"], val, fold_max_dirs=3)
    # the fold fired at least once: fan-in stayed bounded
    assert len(view_t.manifest(view_t.current_version())["dirs"]) <= 4
    assert view_t.epoch_applied(5, "r1")       # guard survived the fold
    _, view = current_manifest_mview(
        spark, base_t.path, view_t.path, ["seg"])
    assert {(r["seg"], float(r["total"]), r["n_rows"])
            for r in view.collect()} == {("S0", 6.0, 3), ("S1", 9.0, 3)}


def _join_fixture(spark):
    import datetime as dt

    from pyspark.sql import functions as F  # noqa: F401

    ts = dt.datetime(2026, 1, 1)
    cust = spark.createDataFrame(
        [(1, "DE"), (2, "DE"), (3, "FR"), (4, "US")],
        "c_id long, nation string")
    orders = spark.createDataFrame(
        [(10, 1, 100.0), (11, 1, 50.0), (12, 2, 30.0),
         (13, 3, 70.0), (14, 4, 10.0)],
        "o_id long, c_id long, price double")
    osch = ("o_id long, c_id long, price double, audit_event string, "
            "audit_timestamp timestamp, audit_pk long")
    csch = ("c_id long, nation string, audit_event string, "
            "audit_timestamp timestamp, audit_pk long")
    # orders: delete 11, reprice 12, insert 15 (for cust 3), insert 16
    # for cust 9 (no such customer -> joins nothing)
    obatch = spark.createDataFrame(
        [(11, 1, 50.0, "delete", ts, 1), (12, 2, 99.0, "update", ts, 2),
         (15, 3, 5.0, "insert", ts, 3), (16, 9, 1.0, "insert", ts, 4)],
        osch)
    # customers: migrate 2 DE->FR (group migration through the join),
    # delete 4 (its orders drop out), insert 5 (no orders yet)
    cbatch = spark.createDataFrame(
        [(2, "FR", "update", ts, 1), (4, "US", "delete", ts, 2),
         (5, "JP", "insert", ts, 3)],
        csch)
    final_cust = spark.createDataFrame(
        [(1, "DE"), (2, "FR"), (3, "FR"), (5, "JP")],
        "c_id long, nation string")
    final_orders = spark.createDataFrame(
        [(10, 1, 100.0), (12, 2, 99.0), (13, 3, 70.0), (15, 3, 5.0),
         (16, 9, 1.0)],
        "o_id long, c_id long, price double")
    return orders, cust, obatch, cbatch, final_orders, final_cust


def _direct_join_view(orders, cust):
    from pyspark.sql import functions as F

    return (orders.join(cust, "c_id").groupBy("nation")
            .agg(F.sum("price").alias("total"),
                 F.count("*").alias("n_rows")))


def test_join_view_maintenance_equals_direct_aggregate(spark):
    """Signed-multiplicity delta-join IVM: batches on BOTH tables —
    deletes, value updates, group-migrating dimension updates, inserts
    with no join partner — maintain γ(orders ⋈ customers) exactly as a
    direct aggregate over the final join (empty groups drop)."""
    from pyspark.sql import functions as F

    from cdc_audit_spark.mview import incremental_join_group_sum

    orders, cust, ob, cb, fo, fc = _join_fixture(spark)
    got = incremental_join_group_sum(
        orders, cust, ob, cb, ["c_id"], ["o_id"], ["c_id"],
        ["nation"], F.col("price"))
    want = _direct_join_view(fo, fc)
    g = {(r["nation"], float(r["total"]), r["n_rows"])
         for r in got.collect()}
    w = {(r["nation"], float(r["total"]), r["n_rows"])
         for r in want.collect()}
    assert g == w
    # US emptied (its only customer deleted); JP never joined
    assert {r[0] for r in g} == {"DE", "FR"}


def test_join_view_one_sided_batches(spark):
    """Either side's batch may be None: the delta reduces to the
    matching single term(s) and still equals the direct aggregate."""
    from pyspark.sql import functions as F

    from cdc_audit_spark.mview import incremental_join_group_sum

    orders, cust, ob, cb, _, _ = _join_fixture(spark)
    from cdc_audit_spark.capture import apply_changes

    for lb, rb in ((ob, None), (None, cb)):
        fo = apply_changes(orders, lb, ["o_id"]) if lb is not None else orders
        fc = apply_changes(cust, rb, ["c_id"]) if rb is not None else cust
        got = incremental_join_group_sum(
            orders, cust, lb, rb, ["c_id"], ["o_id"], ["c_id"],
            ["nation"], F.col("price"))
        want = _direct_join_view(fo, fc)
        assert {(r["nation"], float(r["total"]), r["n_rows"])
                for r in got.collect()} == \
            {(r["nation"], float(r["total"]), r["n_rows"])
             for r in want.collect()}


def test_join_view_two_step_composition(spark):
    """Applying the order batch then the customer batch through
    maintain_join_group_sum (snapshots advanced between steps) composes
    to the same view as one combined step / the direct aggregate."""
    from pyspark.sql import functions as F

    from cdc_audit_spark.capture import apply_changes
    from cdc_audit_spark.mview import (
        bootstrap_join_group_sum,
        maintain_join_group_sum,
    )

    orders, cust, ob, cb, fo, fc = _join_fixture(spark)
    v0 = bootstrap_join_group_sum(orders, cust, ["c_id"], ["nation"],
                                  F.col("price"))
    v1 = maintain_join_group_sum(v0, orders, cust, ob, None, ["c_id"],
                                 ["o_id"], ["c_id"], ["nation"],
                                 F.col("price"))
    orders1 = apply_changes(orders, ob, ["o_id"])
    v2 = maintain_join_group_sum(v1, orders1, cust, None, cb, ["c_id"],
                                 ["o_id"], ["c_id"], ["nation"],
                                 F.col("price"))
    want = _direct_join_view(fo, fc)
    assert {(r["nation"], float(r["total"]), r["n_rows"])
            for r in v2.collect()} == \
        {(r["nation"], float(r["total"]), r["n_rows"])
         for r in want.collect()}


def test_moments_view_equals_direct_aggregate(spark):
    """SUM/SUM(v^2)/COUNT maintenance: variance derived from maintained
    moments equals a direct aggregate over the final state — including a
    group emptied by deletes (drops) and value updates."""
    import datetime as dt

    from pyspark.sql import functions as F

    from cdc_audit_spark.mview import incremental_group_stats

    ts = dt.datetime(2026, 1, 1)
    base = spark.createDataFrame(
        [(1, "A", 10.0), (2, "A", 20.0), (3, "B", 30.0), (4, "B", 50.0)],
        "k long, g string, v double")
    sch = ("k long, g string, v double, audit_event string, "
           "audit_timestamp timestamp, audit_pk long")
    batch = spark.createDataFrame(
        [(1, "A", 40.0, "update", ts, 1),     # changes A's variance
         (3, "B", 30.0, "delete", ts, 2),
         (4, "B", 50.0, "delete", ts, 3),     # empties B
         (5, "C", 7.0, "insert", ts, 4)], sch)
    got = incremental_group_stats(
        base, batch, ["k"], ["g"], F.col("v").cast("decimal(12,2)"))
    final = spark.createDataFrame(
        [(1, "A", 40.0), (2, "A", 20.0), (5, "C", 7.0)],
        "k long, g string, v double")
    want = final.groupBy("g").agg(
        F.sum(F.col("v").cast("decimal(12,2)")).alias("total"),
        F.sum(F.col("v").cast("decimal(12,2)")
              * F.col("v").cast("decimal(12,2)")).alias("total_sq"),
        F.count("*").alias("n_rows"))
    gset = {(r["g"], float(r["total"]), float(r["total_sq"]), r["n_rows"])
            for r in got.collect()}
    wset = {(r["g"], float(r["total"]), float(r["total_sq"]), r["n_rows"])
            for r in want.collect()}
    assert gset == wset
    assert {r[0] for r in gset} == {"A", "C"}  # B emptied and dropped
    # derived variance for A: values 40, 20 -> mean 30, var 100
    a = next(r for r in gset if r[0] == "A")
    t, tsq, n = a[1], a[2], a[3]
    assert abs((tsq - t * t / n) / n - 100.0) < 1e-9


def test_distinct_count_view_equals_direct(spark):
    """Exact distinct-count maintenance at pair grain: a key vanishes
    only when its LAST supporting row goes (two orders sharing a
    customer - deleting one keeps the distinct), reassignments move
    distincts between groups, inserts add them."""
    import datetime as dt

    from pyspark.sql import functions as F

    from cdc_audit_spark.mview import incremental_distinct_count

    ts = dt.datetime(2026, 1, 1)
    base = spark.createDataFrame(
        [(1, 100, "HIGH"), (2, 100, "HIGH"), (3, 200, "HIGH"),
         (4, 300, "LOW")],
        "o long, c long, p string")
    sch = ("o long, c long, p string, audit_event string, "
           "audit_timestamp timestamp, audit_pk long")
    batch = spark.createDataFrame(
        [(1, 100, "HIGH", "delete", ts, 1),   # cust 100 still has order 2
         (3, 300, "HIGH", "update", ts, 2),   # 200 -> 300 in HIGH
         (5, 400, "LOW", "insert", ts, 3)], sch)
    got = {(r["p"], r["n_distinct"]) for r in incremental_distinct_count(
        base, batch, ["o"], ["p"], ["c"]).collect()}
    # final: HIGH orders (2:100, 3:300) -> 2 distinct; LOW (4:300, 5:400)
    assert got == {("HIGH", 2), ("LOW", 2)}


def test_stream_join_mview_multiplexed_o_delta(spark, tmp_path):
    """JOIN-view maintenance from ONE multiplexed CDC stream (both
    tables' events routed by a table tag): drained batches leave a view
    LSM whose fold equals a direct aggregate over the final join; both
    base replicas maintain via dir-granular merges; a half-committed
    epoch (view appended, neither base merged) replays duplicate-free;
    restart applies only new files."""
    import datetime as dt

    from pyspark.sql import functions as F

    from cdc_audit_spark.sinks.manifest import ManifestTable
    from cdc_audit_spark.streaming.stream_mview import (
        apply_join_mview_manifest_epoch,
        current_manifest_mview,
        stream_join_mview_sync_manifest,
    )

    ts = dt.datetime(2026, 1, 1)
    # multiplexed union schema: order cols + customer cols + tag
    sch = ("tbl string, o_id long, c_id long, price double, "
           "nation string, audit_event string, "
           "audit_timestamp timestamp, audit_pk long")

    def orow(o, c, p, ev, pk):
        return ("orders", o, c, p, None, ev, ts, pk)

    def crow(c, n, ev, pk):
        return ("cust", None, c, None, n, ev, ts, pk)

    batches = [
        # bootstrap both tables through the stream itself
        [crow(1, "DE", "insert", 1), crow(2, "FR", "insert", 2)],
        [orow(10, 1, 100.0, "insert", 1), orow(11, 2, 50.0, "insert", 2)],
        # concurrent changes on both: reprice order 10, migrate cust 2
        [orow(10, 1, 70.0, "update", 3), crow(2, "DE", "update", 3)],
        # delete order 11; insert cust 3 (no orders)
        [orow(11, 2, 50.0, "delete", 4), crow(3, "JP", "insert", 4)],
    ]
    src = str(tmp_path / "src")
    for rows in batches:
        spark.createDataFrame(rows, sch).coalesce(1).write.mode(
            "append").parquet(src)

    lp, rp, vp = (str(tmp_path / "orders_t"), str(tmp_path / "cust_t"),
                  str(tmp_path / "view_t"))
    ck = str(tmp_path / "ck")
    schema = spark.read.parquet(src).schema
    args = dict(table_col="tbl", left_name="orders", right_name="cust",
                join_keys=["c_id"], left_pk=["o_id"], right_pk=["c_id"],
                group_cols=["nation"],
                value=F.col("price").cast("decimal(12,2)"),
                left_cols=["o_id", "c_id", "price"],
                right_cols=["c_id", "nation"])
    q = stream_join_mview_sync_manifest(
        spark, src, schema, lp, rp, vp, ck,
        max_files_per_trigger=1, **args)
    q.awaitTermination(240)

    base, view = current_manifest_mview(spark, lp, vp, ["nation"])
    got = {(r["nation"], float(r["total"]), r["n_rows"])
           for r in view.collect()}
    # final: order 10 (cust 1, DE, 70); order 11 deleted; cust 2 now DE
    assert got == {("DE", 70.0, 1)}
    lt, rt, vt = (ManifestTable(spark, p) for p in (lp, rp, vp))
    # base replicas are CURRENT state (latest event per key wins)
    assert {(r["o_id"], r["c_id"], r["price"])
            for r in lt.read().collect()} == {(10, 1, 70.0)}
    assert {(r["c_id"], r["nation"]) for r in rt.read().collect()} == \
        {(1, "DE"), (2, "DE"), (3, "JP")}
    assert all(vt.manifest(v)["action"] == "append" for v in vt.versions())

    # half-committed replay: append ONLY the view half of the next epoch,
    # then replay the whole epoch through the hook — bases catch up, the
    # view skips, nothing double-applies
    from cdc_audit_spark.mview import join_group_sum_delta

    b5 = spark.createDataFrame([orow(12, 3, 5.0, "insert", 5)], sch)
    lb = b5.filter("tbl = 'orders'").select(
        "o_id", "c_id", "price", "audit_event", "audit_timestamp",
        "audit_pk")
    rb = b5.filter("tbl = 'cust'").select(
        "c_id", "nation", "audit_event", "audit_timestamp", "audit_pk")
    half = join_group_sum_delta(
        lt.read(), rt.read(), lb, rb, ["c_id"], ["o_id"], ["c_id"],
        ["nation"], F.col("price").cast("decimal(12,2)"))
    vt.append(half, extra={"epoch": 99, "run_id": "r-manual"})
    apply_join_mview_manifest_epoch(
        lt, rt, vt, b5, 99, "r-manual", **args)
    apply_join_mview_manifest_epoch(   # full replay: durable no-op
        lt, rt, vt, b5, 99, "r-manual", **args)
    _, view2 = current_manifest_mview(spark, lp, vp, ["nation"])
    assert {(r["nation"], float(r["total"]), r["n_rows"])
            for r in view2.collect()} == {("DE", 70.0, 1), ("JP", 5.0, 1)}


def test_median_and_topk_views_track_deletes(spark):
    """Order-statistic roll-ups over maintained pair state: a delete
    shifts the median (sketches can't do this); a key whose last
    supporting row goes drops out of the top-k and the ranks close up."""
    import datetime as dt

    from cdc_audit_spark.mview import (
        incremental_group_median,
        incremental_group_topk,
    )

    ts = dt.datetime(2026, 1, 1)
    base = spark.createDataFrame(
        [(1, "A", 10.0, 100), (2, "A", 20.0, 100), (3, "A", 30.0, 200),
         (4, "A", 40.0, 200), (5, "A", 50.0, 300)],
        "k long, g string, v double, cust long")
    sch = ("k long, g string, v double, cust long, audit_event string, "
           "audit_timestamp timestamp, audit_pk long")
    # delete the two largest values: median of {10,20,30} -> 20; cust
    # 300 loses its only row and cust 200 drops to one
    batch = spark.createDataFrame(
        [(4, "A", 40.0, 200, "delete", ts, 1),
         (5, "A", 50.0, 300, "delete", ts, 2)], sch)
    med = incremental_group_median(base, batch, ["k"], ["g"], "v")
    assert [(r["g"], r["median"]) for r in med.collect()] == [("A", 20.0)]
    # even-N lower-middle: {10,20,30,40} -> 20
    b2 = spark.createDataFrame([(5, "A", 50.0, 300, "delete", ts, 1)], sch)
    med2 = incremental_group_median(base, b2, ["k"], ["g"], "v")
    assert [(r["g"], r["median"]) for r in med2.collect()] == [("A", 20.0)]

    top = incremental_group_topk(base, batch, ["k"], ["g"], ["cust"], 2)
    got = [(r["cust"], r["n_rows"], r["rank"]) for r in
           top.orderBy("rank").collect()]
    assert got == [(100, 2, 1), (200, 1, 2)]  # 300 vanished entirely


def test_join_mview_side_reads_prune_to_touched_dirs(spark, tmp_path):
    """VERDICT r09 #1, join-IVM form: with both replicas range-laid-out
    and every written dir carrying footer column stats, an epoch's side
    reads (the ΔA debit lookup and the A_pre ⋈ ΔB join-key match) LIST
    only the dirs the batch's keys / the other delta's join keys can
    touch — never a full replica — and the maintained view still equals
    the direct aggregate. Join-key pruning on the non-layout column
    works exactly when the key correlates with the layout (here
    c_id = o_id // 25, so each o_id-range dir spans a narrow c_id
    band); uncorrelated layouts degrade to conservative full reads,
    never to wrong results."""
    import datetime as dt

    from pyspark.sql import functions as F

    from cdc_audit_spark.sinks.manifest import ManifestTable
    from cdc_audit_spark.streaming.stream_mview import (
        apply_join_mview_manifest_epoch,
        current_manifest_mview,
    )

    ts = dt.datetime(2026, 1, 1)
    sch = ("tbl string, o_id long, c_id long, price double, "
           "nation string, audit_event string, "
           "audit_timestamp timestamp, audit_pk long")
    args = dict(table_col="tbl", left_name="orders", right_name="cust",
                join_keys=["c_id"], left_pk=["o_id"], right_pk=["c_id"],
                group_cols=["nation"],
                value=F.col("price").cast("decimal(12,2)"),
                left_cols=["o_id", "c_id", "price"],
                right_cols=["c_id", "nation"], range_buckets=8)

    lt = ManifestTable(spark, str(tmp_path / "orders_t"))
    rt = ManifestTable(spark, str(tmp_path / "cust_t"))
    vt = ManifestTable(spark, str(tmp_path / "view_t"))

    orders = [("orders", o, o // 25, float(o), None, "insert", ts, o + 1)
              for o in range(200)]
    custs = [("cust", None, c, None, f"N{c % 5}", "insert", ts, c + 1)
             for c in range(8)]
    b0 = spark.createDataFrame(orders + custs, sch)
    apply_join_mview_manifest_epoch(lt, rt, vt, b0, 0, "r1", **args)
    n_l = len(lt.manifest(lt.current_version())["dirs"])
    n_r = len(rt.manifest(rt.current_version())["dirs"])
    assert n_l >= 6 and n_r >= 4

    reads = {"l": [], "r": []}
    for tag, t in (("l", lt), ("r", rt)):
        orig = t._read_dirs_dv

        def spy(m, dirs, at_version=None, _o=orig, _tag=tag):
            reads[_tag].append(list(dirs))
            return _o(m, dirs, at_version=at_version)

        t._read_dirs_dv = spy

    # one customer changes nation: the left side must consult only the
    # o_id dirs whose c_id band covers 2 (one dir), never all of them
    b1 = spark.createDataFrame(
        [("cust", None, 2, None, "ZZ", "update", ts, 100)], sch)
    apply_join_mview_manifest_epoch(lt, rt, vt, b1, 1, "r1", **args)

    assert reads["l"] and reads["r"]
    assert max(len(d) for d in reads["l"]) <= 2 < n_l
    assert max(len(d) for d in reads["r"]) <= 2 < n_r

    _, view = current_manifest_mview(spark, str(tmp_path / "orders_t"),
                                     str(tmp_path / "view_t"), ["nation"])
    got = {(r["nation"], float(r["total"]), r["n_rows"])
           for r in view.collect()}
    fin_cust = {c: ("ZZ" if c == 2 else f"N{c % 5}") for c in range(8)}
    want: dict = {}
    for o in range(200):
        c = o // 25
        n = fin_cust[c]
        tot, cnt = want.get(n, (0.0, 0))
        want[n] = (tot + float(o), cnt + 1)
    assert got == {(n, tot, cnt) for n, (tot, cnt) in want.items()}
