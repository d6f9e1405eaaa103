"""Deletion vectors: delete rows without rewriting data files.

The Delta DV pattern keyed on a unique column instead of file/row
positions: ``delete_where`` commits a small key file (action
``delete``), reads anti-join it away scoped to the dirs it covered at
delete time, full rewrites (compact/optimize/merge/repair) materialize
it. At 100 TB a targeted purge becomes O(matches) + metadata instead
of an O(table) rewrite — and every consumer either applies the vector,
refuses loudly, or streams the recorded change feed; none silently
resurrects or silently drops rows.
"""

import os

import pytest
from pyspark.sql import functions as F

from cdc_audit_spark.sinks.manifest import ManifestTable
from cdc_audit_spark.sources.manifest_stream import read_manifest_stream


def _t(spark, tmp_path, name="t"):
    t = ManifestTable(spark, str(tmp_path / name))
    t.append(spark.range(0, 1000).selectExpr("id as k", "id % 7 as grp"))
    t.append(spark.range(1000, 2000).selectExpr("id as k", "id % 7 as grp"))
    return t


def test_delete_where_basic_and_time_travel(spark, tmp_path):
    t = _t(spark, tmp_path)
    v = t.delete_where("grp = 3", key_col="k")
    assert t.manifest(v)["action"] == "delete"
    expect = 2000 - spark.range(0, 2000).filter("id % 7 = 3").count()
    assert t.read().count() == expect
    # row_count stays metadata-only and exact under DVs
    assert t.row_count() == expect
    # the data dirs are byte-identical — only a key file landed
    assert t.manifest(v)["dirs"] == t.manifest(2)["dirs"]
    # time travel to the pre-delete version still shows everything
    assert t.read(version=2).count() == 2000
    # stats_minmax goes conservative (a deleted row may have held the
    # extremum) — None means "fall back to a scan", never a wrong answer
    assert t.stats_minmax("k") is None
    # an empty match commits nothing
    assert t.delete_where("k < 0", key_col="k") is None
    assert t.current_version() == v


def test_covers_scoping_resurrected_keys_survive(spark, tmp_path):
    """A vector only covers the dirs that existed at delete time: a
    later append legitimately re-using a deleted key must NOT be
    suppressed — the key-addressed DV's classic failure mode."""
    t = _t(spark, tmp_path)
    t.delete_where("grp = 3", key_col="k")          # kills k=3 among others
    t.append(spark.createDataFrame([(3, 99)], "k long, grp long"))
    live3 = t.read().filter("k = 3").collect()
    assert [(r["k"], r["grp"]) for r in live3] == [(3, 99)]
    # and the resurrected row is deletable again (one live row with k=3)
    t.delete_where("k = 3", key_col="k")
    assert t.read().filter("k = 3").count() == 0
    assert t.row_count() == t.read().count()


def test_delete_refuses_ambiguous_keys(spark, tmp_path):
    t = ManifestTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "k long, s string"))
    # duplicate key inside the matched set
    with pytest.raises(ValueError, match="not unique"):
        t.delete_where("s in ('a','b')", key_col="k")
    # live non-matching row sharing the key
    with pytest.raises(ValueError, match="share"):
        t.delete_where("s = 'a'", key_col="k")
    # a second delete must reuse the first vector's key column
    t2 = _t(spark, tmp_path, "t2")
    t2.delete_where("k = 1", key_col="k")
    with pytest.raises(ValueError, match="keyed on"):
        t2.delete_where("k = 2", key_col="grp")


def test_full_rewrites_materialize_vectors(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.delete_where("grp = 3", key_col="k")
    expect = t.read().count()
    cv = t.compact()
    m = t.manifest(cv)
    assert not m.get("dv_dirs") and t.read().count() == expect
    # optimize clears them too, and row_count stays metadata-exact
    t2 = _t(spark, tmp_path, "t2")
    t2.delete_where("grp = 5", key_col="k")
    expect2 = t2.row_count()
    t2.optimize(["k"], n_dirs=4)
    assert not t2.manifest(t2.current_version()).get("dv_dirs")
    assert t2.read().count() == expect2 == t2.row_count()


def test_appends_and_analyze_carry_vectors(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.delete_where("grp = 3", key_col="k")
    expect = t.row_count()
    t.append(spark.createDataFrame([(5000, 0)], "k long, grp long"))
    assert t.read().count() == expect + 1 == t.row_count()
    # analyze is metadata-only: it must carry the vectors, not drop them
    # (numeric ranges already ride the footer pass, so ask for equality
    # stats — the piece that still needs a backfill job)
    t.analyze(["k"], set_stats_cols=["grp"])
    m = t.manifest(t.current_version())
    assert m["action"] == "analyze" and m.get("dv_dirs")
    assert t.read().count() == expect + 1 == t.row_count()


def test_pruned_reads_apply_vectors(spark, tmp_path):
    t = ManifestTable(spark, str(tmp_path / "t"))
    t.append(spark.range(0, 500).selectExpr("id as k", "id as x"),
             pk_range_col="k")
    t.append(spark.range(500, 1000).selectExpr("id as k", "id as x"),
             pk_range_col="k")
    t.delete_where("k % 2 = 0", key_col="k")
    assert t.read_pruned({"k": (100, 200)}).count() == 50
    assert (t.read_since(900, audit_pk="k").count()
            == t.read().filter("k > 900").count())


def test_pruned_merge_refuses_live_vectors(spark, tmp_path):
    t = ManifestTable(spark, str(tmp_path / "t"))
    boot = spark.range(0, 100).select(F.col("id").alias("k"),
                                      F.col("id").alias("v"))
    empty = spark.createDataFrame(
        [], "k long, v long, audit_event string, audit_pk long")
    t.merge_audit(empty, ["k"], bootstrap=boot, pruned=True,
                  range_buckets=4)
    t.delete_where("k = 7", key_col="k")
    log = spark.createDataFrame([(5, 500, "update", 1)],
                                "k long, v long, audit_event string, "
                                "audit_pk long")
    with pytest.raises(ValueError, match="deletion vectors"):
        t.merge_audit(log, ["k"], pruned=True)
    # materialize -> merge works again and the delete held
    t.compact()
    t.merge_audit(log, ["k"], pruned=True)
    state = {r["k"]: r["v"] for r in t.read().collect()}
    assert 7 not in state and state[5] == 500


def test_format_reader_refuses_live_vectors(spark, tmp_path):
    from cdc_audit_spark.sources.manifest_table import (
        register_manifest_table,
    )

    register_manifest_table(spark)
    t = _t(spark, tmp_path)
    t.delete_where("grp = 1", key_col="k")
    with pytest.raises(Exception, match="deletion vectors"):
        (spark.read.format("manifest_table")
         .option("path", t.path).load().count())
    # after materialization the format reader works again
    t.compact()
    assert (spark.read.format("manifest_table")
            .option("path", t.path).load().count() == t.row_count())


def test_stream_refuses_unfed_delete_then_feed_streams_it(spark,
                                                          tmp_path):
    t = _t(spark, tmp_path)
    t.delete_where("k = 10", key_col="k")           # no change feed
    q = (read_manifest_stream(spark, t.path)
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "sink"))
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    with pytest.raises(Exception, match="deletion-vector commit"):
        q.processAllAvailable()
        q.stop()
        raise RuntimeError("stream should have failed")
    # skipMerges: appends-only consumers may opt out explicitly
    q2 = (spark.readStream.format("manifest_stream")
          .option("path", t.path).option("skipMerges", "true").load()
          .writeStream.format("parquet")
          .option("path", str(tmp_path / "sink2"))
          .option("checkpointLocation", str(tmp_path / "ck2")).start())
    q2.processAllAvailable()
    q2.stop()
    assert spark.read.parquet(str(tmp_path / "sink2")).count() == 2000


def test_delete_change_feed_streams_delete_rows(spark, tmp_path):
    t = _t(spark, tmp_path)
    v = t.delete_where("k in (1, 2)", key_col="k", change_feed=True)
    assert "cdc_dirs" in t.manifest(v)
    q = (read_manifest_stream(spark, t.path, change_feed=True)
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "feed"))
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.processAllAvailable()
    q.stop()
    feed = spark.read.parquet(str(tmp_path / "feed"))
    dels = {(r["k"], r["audit_event"])
            for r in feed.filter("audit_event = 'delete'").collect()}
    assert dels == {(1, "delete"), (2, "delete")}
    # the appends read as tagged inserts alongside
    assert feed.filter("audit_event = 'insert'").count() == 2000


def test_vacuum_protects_live_vectors_reclaims_dead_ones(spark,
                                                         tmp_path):
    t = _t(spark, tmp_path)
    v = t.delete_where("grp = 2", key_col="k")
    dv_rel = t.manifest(v)["dv_dirs"][0]
    t.vacuum(keep_versions=1, retain_seconds=0)
    # the live vector survived the sweep and still applies
    assert os.path.isdir(os.path.join(t.path, dv_rel))
    assert t.row_count() == t.read().count()
    # materialize, then vacuum: the vector is unreferenced and swept
    t.compact()
    t.vacuum(keep_versions=1, retain_seconds=0, force=True)
    assert not os.path.isdir(os.path.join(t.path, dv_rel))
    assert t.read().count() == t.row_count()


def test_delete_matching_dataframe_purge(spark, tmp_path):
    """The join-valued delete: a DataFrame of match keys deletes by
    left-semi join — no driver-side key list, no O(ids) isin expression
    — with the same uniqueness contract, row_count arithmetic, and
    empty-match no-op as delete_where."""
    t = _t(spark, tmp_path)
    purge = spark.range(0, 2000).filter("id % 7 = 3").selectExpr("id as k")
    v = t.delete_matching(purge, "k")
    assert t.manifest(v)["action"] == "delete"
    expect = 2000 - purge.count()
    assert t.read().count() == expect
    assert t.row_count() == expect
    assert t.read().filter("grp = 3").count() == 0
    # empty match set commits nothing
    assert t.delete_matching(purge.filter("k < 0"), "k") is None
    assert t.current_version() == v
    # key_col defaulting needs a single join column
    with pytest.raises(ValueError, match="key_col is required"):
        t.delete_matching(purge, ["k", "k"])


def test_delete_matching_separate_key_col(spark, tmp_path):
    """Matching on a non-unique column with a separate unique DV key —
    the components-index shape (match on id, address rows by rk)."""
    t = ManifestTable(spark, str(tmp_path / "kv"))
    rows = [(i, f"fp{j}", f"fp{j}:{i}") for i in range(10) for j in range(3)]
    t.append(spark.createDataFrame(rows, "id long, fp string, rk string"))
    purge = spark.createDataFrame([(2,), (5,)], "id long")
    assert t.delete_matching(purge, "id", key_col="rk")
    assert t.read().count() == 24
    assert t.read().filter("id in (2, 5)").count() == 0
