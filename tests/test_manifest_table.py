"""The ``manifest_table`` batch FORMAT (Python DataSource API):
spark.read/write.format("manifest_table") over the commit protocol, with
Catalyst-pushed filters driving manifest-level dir pruning on reads and
atomic manifest commits on writes.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan

from cdc_audit_spark.sinks.manifest import CommitConflict, ManifestTable
from cdc_audit_spark.sources.manifest_table import (
    ManifestTableReader,
    register_manifest_table,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v"))


def _attempt_files(base, rel, strip=False):
    """File relpaths of a hand-built attempt dir, as a task would report
    them. ``strip`` drops Spark's _SUCCESS marker so the dir matches the
    real single-file attempt layout (and empties after coalescing)."""
    d = os.path.join(base, rel)
    if strip:
        for f in os.listdir(d):
            if not f.endswith(".parquet"):
                os.remove(os.path.join(d, f))
    return [os.path.join(rel, f) for f in os.listdir(d)
            if f.endswith(".parquet")]


def test_format_write_read_roundtrip(spark, tmp_path):
    register_manifest_table(spark)
    p = str(tmp_path / "t")
    _df(spark, 0, 100).write.format("manifest_table").option(
        "path", p).mode("append").save()
    _df(spark, 100, 200).write.format("manifest_table").option(
        "path", p).mode("append").save()

    t = ManifestTable(spark, p)
    assert t.versions() == [1, 2]
    assert [h["action"] for h in t.history()] == ["append", "append"]
    got = spark.read.format("manifest_table").option("path", p).load()
    want = t.read()
    assert got.count() == 200
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # time travel option
    assert (spark.read.format("manifest_table").option("path", p)
            .option("version", 1).load().count()) == 100

    # overwrite mode commits a single-dir version, history intact
    _df(spark, 0, 5).write.format("manifest_table").option(
        "path", p).mode("overwrite").save()
    assert t.read().count() == 5
    assert t.read(version=2).count() == 200


def test_format_read_interops_with_native_writes(spark, tmp_path):
    """Tables written by sync_audit/append are readable through the
    format, and format-written tables are readable by ManifestTable —
    one on-disk contract, two access paths."""
    import datetime as dt

    register_manifest_table(spark)
    p = str(tmp_path / "t")
    t = ManifestTable(spark, p)
    audit = spark.range(1, 11).select(
        F.col("id").alias("k"),
        F.lit(dt.datetime(2026, 1, 1)).alias("audit_timestamp"),
        F.lit("insert").alias("audit_event"),
        F.col("id").alias("audit_pk"))
    t.sync_audit(audit)
    got = spark.read.format("manifest_table").option("path", p).load()
    assert got.count() == 10
    assert got.exceptAll(t.read()).count() == 0
    assert t.watermark() == 10  # state untouched by the format read


def test_pushed_filters_prune_dirs(spark, tmp_path):
    """pushFilters → per-dir stats pruning: a narrow predicate over a
    stats'd layout must plan FEWER input partitions, while results equal
    the unpruned filtered read exactly."""
    register_manifest_table(spark)
    p = str(tmp_path / "t")
    t = ManifestTable(spark, p)
    for i in range(4):   # four dirs with disjoint v ranges, stats recorded
        t.append(_df(spark, i * 100, (i + 1) * 100).coalesce(1),
                 stats_cols=["v"])

    rd = ManifestTableReader({"path": p}, t.schema())
    all_parts = rd.partitions()
    rd2 = ManifestTableReader({"path": p}, t.schema())
    kept = rd2.pushFilters([GreaterThanOrEqual(("v",), 1000),
                            LessThan(("v",), 1500)])
    assert list(kept) == [GreaterThanOrEqual(("v",), 1000),
                          LessThan(("v",), 1500)]  # Spark re-applies all
    pruned_parts = rd2.partitions()
    assert len(pruned_parts) < len(all_parts)
    assert len(pruned_parts) == 1    # only dir 2 (v 1000-1990) survives

    rd3 = ManifestTableReader({"path": p}, t.schema())
    rd3.pushFilters([EqualTo(("v",), 50)])
    assert len(rd3.partitions()) == 1

    # e2e: the pushed-down plan returns exactly the right rows
    got = (spark.read.format("manifest_table").option("path", p).load()
           .filter("v >= 1000 and v < 1500"))
    assert sorted(r["k"] for r in got.collect()) == list(range(100, 150))


def test_format_write_schema_governance(spark, tmp_path):
    register_manifest_table(spark)
    p = str(tmp_path / "t")
    _df(spark, 0, 10).write.format("manifest_table").option(
        "path", p).mode("append").save()

    widened = _df(spark, 10, 20).withColumn("extra", F.lit("x"))
    with pytest.raises(Exception, match="drift"):
        widened.write.format("manifest_table").option(
            "path", p).mode("append").save()
    # additive drift admitted explicitly; old rows read NULL for the
    # new column under the mergeSchema read
    widened.write.format("manifest_table").option("path", p).option(
        "onDrift", "evolve").mode("append").save()
    t = ManifestTable(spark, p)
    assert t.read().count() == 20
    assert t.read().filter("extra IS NULL").count() == 10


def test_format_write_empty_and_concurrent_overwrite(spark, tmp_path):
    register_manifest_table(spark)
    p = str(tmp_path / "t")
    _df(spark, 0, 10).write.format("manifest_table").option(
        "path", p).mode("append").save()
    # an all-empty append still commits a well-formed version
    _df(spark, 0, 10).filter("k < 0").write.format("manifest_table").option(
        "path", p).mode("append").save()
    t = ManifestTable(spark, p)
    assert t.current_version() == 2
    assert t.read().count() == 10

    # overwrite pinned at job start: an interleaved commit conflicts
    from cdc_audit_spark.sources.manifest_table import ManifestTableWriter

    w = ManifestTableWriter({"path": p}, t.schema(), overwrite=True)
    t.append(_df(spark, 50, 55))          # racer lands mid-job
    with pytest.raises(CommitConflict):
        w.commit([])
    assert 50 in {r["k"] for r in t.read().collect()}

    # abort removes the attempt dirs its tasks reported
    from cdc_audit_spark.sources.manifest_table import _WroteFiles

    w2 = ManifestTableWriter({"path": p}, t.schema(), overwrite=False)
    rel = os.path.join("data", "c-aborted")
    os.makedirs(os.path.join(p, rel), exist_ok=True)
    w2.abort([_WroteFiles(files=[os.path.join(rel, "f.parquet")], rows=0)])
    assert not os.path.isdir(os.path.join(p, rel))


def test_format_write_records_stats_for_pruning(spark, tmp_path):
    """.option('statsCols', ...): each task folds its batches' min/max
    inline and commits them as its own dir's stats, and a later
    pushed-down read prunes format-written dirs too."""
    register_manifest_table(spark)
    p = str(tmp_path / "t")
    for i in range(3):
        (_df(spark, i * 100, (i + 1) * 100).coalesce(1)
         .write.format("manifest_table").option("path", p)
         .option("statsCols", "v").mode("append").save())

    t = ManifestTable(spark, p)
    m = t.manifest(t.current_version())
    assert len(m["dirs"]) == 3
    stats = [m["dir_meta"][d]["stats"]["v"] for d in m["dirs"]]
    assert sorted(stats) == [[0, 990], [1000, 1990], [2000, 2990]]

    rd = ManifestTableReader({"path": p}, t.schema())
    rd.pushFilters([GreaterThanOrEqual(("v",), 1000),
                    LessThan(("v",), 1500)])
    assert len({pt.files[0].rsplit("/", 2)[1] for pt in rd.partitions()}) == 1
    got = (spark.read.format("manifest_table").option("path", p).load()
           .filter("v >= 1000 and v < 1500"))
    assert got.count() == 50

    # unknown stats column refuses loudly
    with pytest.raises(Exception, match="statsCols"):
        _df(spark, 0, 1).write.format("manifest_table").option(
            "path", p).option("statsCols", "nope").mode("append").save()


def test_format_writes_feed_streaming_source(spark, tmp_path):
    """Format-written append commits stream through manifest_stream —
    the three access paths share one on-disk contract."""
    from cdc_audit_spark.sources.manifest_stream import read_manifest_stream

    register_manifest_table(spark)
    p = str(tmp_path / "t")
    _df(spark, 0, 50).write.format("manifest_table").option(
        "path", p).mode("append").save()
    _df(spark, 50, 100).write.format("manifest_table").option(
        "path", p).mode("append").save()
    q = (read_manifest_stream(spark, p)
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "sink"))
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(str(tmp_path / "sink"))
    assert sorted(r["k"] for r in got.collect()) == list(range(100))


def test_format_reads_evolved_schema_tables(spark, tmp_path):
    """Files written before an additive schema evolution lack the new
    column; both the batch format and the streaming source must surface
    NULLs for it (like the native mergeSchema read), not crash."""
    from cdc_audit_spark.sources.manifest_stream import read_manifest_stream

    register_manifest_table(spark)
    p = str(tmp_path / "t")
    t = ManifestTable(spark, p)
    t.append(_df(spark, 0, 10))
    t.append(_df(spark, 10, 20).withColumn("extra", F.lit("x")),
             on_drift="evolve")

    got = spark.read.format("manifest_table").option("path", p).load()
    assert got.count() == 20
    assert got.filter("extra IS NULL").count() == 10
    assert got.filter("extra = 'x'").count() == 10

    q = (read_manifest_stream(spark, p)
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "sink"))
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.processAllAvailable()
    q.stop()
    sunk = spark.read.parquet(str(tmp_path / "sink"))
    assert sunk.count() == 20
    assert sunk.filter("extra IS NULL").count() == 10


def test_stream_legacy_manifest_without_added(spark, tmp_path):
    """Manifests written before the 'added' record: the parent diff
    reconstructs each commit's delta (no duplicate emission); a vacuumed
    parent fails loudly instead of re-emitting inherited dirs."""
    import json

    from cdc_audit_spark.sources.manifest_stream import (
        ManifestStreamReader,
        read_manifest_stream,
    )

    p = str(tmp_path / "t")
    t = ManifestTable(spark, p)
    t.append(_df(spark, 0, 10))
    t.append(_df(spark, 10, 20))
    # strip the modern 'added' records (legacy table)
    mdir = os.path.join(p, "_manifests")
    for name in os.listdir(mdir):
        full = os.path.join(mdir, name)
        with open(full) as f:
            m = json.load(f)
        m.pop("added", None)
        with open(full, "w") as f:
            json.dump(m, f)

    q = (read_manifest_stream(spark, p)
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "sink"))
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(str(tmp_path / "sink"))
    assert sorted(r["k"] for r in got.collect()) == list(range(20))  # once

    # parent vacuumed: the delta of v2 is unrecoverable — loud failure
    # from the PARENT-DIFF path specifically (range starts at v2, so
    # v1's own missing manifest is not what raises)
    os.unlink(os.path.join(mdir, "m-000000000001.json"))
    rd = ManifestStreamReader({"path": p}, t.schema())
    with pytest.raises(FileNotFoundError, match="parent manifest 1"):
        rd.partitions({"version": 1}, {"version": 2})


def test_stream_writer_exactly_once(spark, tmp_path):
    """df.writeStream.format('manifest_table'): each micro-batch is one
    atomic epoch-tagged append commit; restarts append only unseen
    batches; a replayed epoch commit is skipped and its redundant task
    dirs are reclaimed; a fresh checkpoint against the surviving table
    fails loudly (streamId identity)."""
    from cdc_audit_spark.sources.manifest_table import (
        ManifestTableStreamWriter,
        _WroteFiles,
    )

    register_manifest_table(spark)
    src = str(tmp_path / "src")
    tbl = str(tmp_path / "tbl")
    ck = str(tmp_path / "ck")
    _df(spark, 0, 50).coalesce(4).write.parquet(src)

    def drain(stream_id, ckpt):
        q = (spark.readStream.schema("k long, v long")
             .option("maxFilesPerTrigger", 2).parquet(src)
             .writeStream.format("manifest_table").option("path", tbl)
             .option("streamId", stream_id)
             .option("checkpointLocation", ckpt).start())
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(60)

    drain("s1", ck)
    t = ManifestTable(spark, tbl)
    assert t.read().count() == 50
    assert sorted(r["k"] for r in t.read().collect()) == list(range(50))
    assert t.last_epoch("s1") is not None
    assert all(h["action"] == "append" for h in t.history())

    # restart: only new source files land
    _df(spark, 50, 60).coalesce(1).write.mode("append").parquet(src)
    drain("s1", ck)
    assert t.read().count() == 60
    assert t.read().groupBy("k").count().filter("count > 1").count() == 0

    # replayed epoch: the commit is skipped and the replay's task dirs
    # are reclaimed immediately
    w = ManifestTableStreamWriter(
        {"path": tbl, "streamid": "s1"}, t.schema())
    orphan = os.path.join("data", "c-replayed")
    os.makedirs(os.path.join(tbl, orphan))
    v = t.current_version()
    w.commit([_WroteFiles(files=[orphan])], t.last_epoch("s1"))
    assert t.current_version() == v
    assert not os.path.isdir(os.path.join(tbl, orphan))

    # abort reclaims the epoch's task dirs
    os.makedirs(os.path.join(tbl, orphan))
    w.abort([_WroteFiles(files=[orphan])], 999)
    assert not os.path.isdir(os.path.join(tbl, orphan))

    # fresh checkpoint + surviving table: loud identity mismatch
    import shutil

    shutil.rmtree(ck)
    q = (spark.readStream.schema("k long, v long").parquet(src)
         .writeStream.format("manifest_table").option("path", tbl)
         .option("streamId", "s2")
         .option("checkpointLocation", ck).start())
    with pytest.raises(Exception, match="GenerationRunMismatch|checkpoint-scoped"):
        q.processAllAvailable()
        q.awaitTermination(60)
    q.stop()

    # streamId is mandatory (writer constructed when the stream runs)
    q = (spark.readStream.schema("k long, v long").parquet(src)
         .writeStream.format("manifest_table").option("path", tbl)
         .option("checkpointLocation", str(tmp_path / "ck2")).start())
    with pytest.raises(Exception, match="streamId"):
        q.processAllAvailable()
        q.awaitTermination(60)
    q.stop()


def test_stream_writer_stats_and_stale_schema(spark, tmp_path):
    """Stream-written dirs record pruning stats (statsCols), and an epoch
    commit never regresses a schema a concurrent writer evolved after the
    stream started."""
    register_manifest_table(spark)
    src = str(tmp_path / "src")
    tbl = str(tmp_path / "tbl")
    _df(spark, 0, 40).coalesce(2).write.parquet(src)
    q = (spark.readStream.schema("k long, v long").parquet(src)
         .writeStream.format("manifest_table").option("path", tbl)
         .option("streamId", "s1").option("statsCols", "v")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.processAllAvailable()
    q.stop()
    t = ManifestTable(spark, tbl)
    m = t.manifest(t.current_version())
    assert any("stats" in dm and "v" in dm["stats"]
               for dm in m.get("dir_meta", {}).values())
    rd = ManifestTableReader({"path": tbl}, t.schema())
    rd.pushFilters([GreaterThanOrEqual(("v",), 10**9)])
    assert rd.partitions() == [] or len(rd.partitions()[0].files) == 0

    # concurrent additive evolution while the stream is down: the stale
    # (k, v) stream must be REFUSED loudly (its commit would regress the
    # evolved schema), and a stream carrying the evolved schema proceeds
    t.append(_df(spark, 100, 105).withColumn("extra", F.lit("x")),
             on_drift="evolve")
    assert "extra" in t.schema().fieldNames()
    _df(spark, 40, 50).coalesce(1).write.mode("append").parquet(src)
    q = (spark.readStream.schema("k long, v long").parquet(src)
         .writeStream.format("manifest_table").option("path", tbl)
         .option("streamId", "s1").option("statsCols", "v")
         .option("onDrift", "evolve")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    with pytest.raises(Exception, match="drift"):
        q.processAllAvailable()
        q.awaitTermination(60)
    q.stop()
    assert "extra" in t.schema().fieldNames()   # NOT regressed

    q = (spark.readStream.schema("k long, v long, extra string").parquet(src)
         .writeStream.format("manifest_table").option("path", tbl)
         .option("streamId", "s1").option("statsCols", "v")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.processAllAvailable()
    q.stop()
    assert "extra" in t.schema().fieldNames()
    assert t.read().count() == 55
    assert t.read().filter("extra = 'x'").count() == 5


def test_stream_writer_zombie_epoch_guard(spark, tmp_path, monkeypatch):
    """Two drivers sharing a streamId (failover zombie): the rival lands
    its copy of the epoch BETWEEN the zombie's entry check and its claim
    — the in-claim-loop re-validation must catch it (a duplicate
    rebase-append is permanent row duplication)."""
    from cdc_audit_spark.sources.manifest_table import (
        ManifestTableStreamWriter,
        _WroteFiles,
    )

    tbl = str(tmp_path / "tbl")
    t = ManifestTable(spark, tbl)
    t.append(_df(spark, 0, 10), extra={"epoch": 0, "run_id": "s1"})

    w = ManifestTableStreamWriter(
        {"path": tbl, "streamid": "s1"}, t.schema())
    # zombie prepared epoch 1's attempt dir...
    zombie_rel = os.path.join("data", "c-zombie")
    _df(spark, 10, 20).coalesce(1).write.parquet(
        os.path.join(tbl, zombie_rel))
    zfiles = _attempt_files(tbl, zombie_rel, strip=True)

    real = ManifestTable.epoch_applied
    calls = {"n": 0}

    def racy(self, epoch_id, run_id=None):
        calls["n"] += 1
        if calls["n"] == 1:
            # the entry check sees the epoch unapplied; the rival driver
            # then commits it before this writer reaches its claim
            assert not real(self, epoch_id, run_id)
            monkeypatch.undo()
            t.append(_df(spark, 10, 20),
                     extra={"epoch": 1, "run_id": "s1"})
            monkeypatch.setattr(ManifestTable, "epoch_applied", racy)
            return False
        return real(self, epoch_id, run_id)

    monkeypatch.setattr(ManifestTable, "epoch_applied", racy)
    w.commit([_WroteFiles(files=zfiles, rows=10)], 1)
    assert calls["n"] >= 2                     # claim-loop guard ran
    assert t.current_version() == 2            # no duplicate commit
    assert t.read().count() == 20              # rows not duplicated
    assert not os.path.isdir(os.path.join(tbl, zombie_rel))  # reclaimed
    # the coalesced-but-unclaimed commit dir was reclaimed too: only the
    # two committed versions' dirs remain on disk
    referenced = {d for v in t.versions()
                  for d in t.manifest(v)["dirs"]}
    on_disk = {os.path.join("data", n)
               for n in os.listdir(os.path.join(tbl, "data"))}
    assert on_disk == referenced


def test_format_append_rebase_refuses_stale_schema(spark, tmp_path,
                                                   monkeypatch):
    """A concurrent EVOLVE landing between an append's governance check
    and its claim: the rebase re-governs against the new parent and
    REFUSES the now-stale subset schema loudly — before this fix the
    retry re-claimed with the pre-race stamp, silently dropping the
    evolved column from the committed schema (and every later read)."""
    from cdc_audit_spark.schema import SchemaDriftError
    from cdc_audit_spark.sinks import manifest as msink
    from cdc_audit_spark.sources.manifest_table import (
        ManifestTableWriter,
        _WroteFiles,
    )

    tbl = str(tmp_path / "tbl")
    t = ManifestTable(spark, tbl)
    t.append(_df(spark, 0, 10))
    w = ManifestTableWriter({"path": tbl}, t.schema(), overwrite=False)
    rel = os.path.join("data", "c-task1")
    _df(spark, 10, 20).coalesce(1).write.parquet(os.path.join(tbl, rel))
    files = _attempt_files(tbl, rel, strip=True)

    real = msink.HardLinkClaimBackend.publish
    state = {"raced": False}

    def racy(self, table_path, version, payload):
        if not state["raced"]:
            state["raced"] = True
            # rival evolve steals this version first
            t.append(_df(spark, 20, 25).withColumn("extra", F.lit("x")),
                     on_drift="evolve")
        return real(self, table_path, version, payload)

    monkeypatch.setattr(msink.HardLinkClaimBackend, "publish", racy)
    with pytest.raises(SchemaDriftError):
        w.commit([_WroteFiles(files=files, rows=10)])
    monkeypatch.undo()
    assert "extra" in t.schema().fieldNames()   # NOT regressed
    assert t.read().count() == 15               # stale append never landed
    # the refused commit's coalesced dir was cleaned up, not orphaned
    referenced = {d for v in t.versions() for d in t.manifest(v)["dirs"]}
    on_disk = {os.path.join("data", n)
               for n in os.listdir(os.path.join(tbl, "data"))}
    assert on_disk == referenced


def test_format_append_rebase_succeeds_same_schema(spark, tmp_path,
                                                   monkeypatch):
    """The benign race: a same-schema rival steals the version; the
    append rebases and lands cleanly with both writers' rows."""
    from cdc_audit_spark.sinks import manifest as msink
    from cdc_audit_spark.sources.manifest_table import (
        ManifestTableWriter,
        _WroteFiles,
    )

    tbl = str(tmp_path / "tbl")
    t = ManifestTable(spark, tbl)
    t.append(_df(spark, 0, 10))
    w = ManifestTableWriter({"path": tbl}, t.schema(), overwrite=False)
    rel = os.path.join("data", "c-task1")
    _df(spark, 10, 20).coalesce(1).write.parquet(os.path.join(tbl, rel))
    files = _attempt_files(tbl, rel, strip=True)

    real = msink.HardLinkClaimBackend.publish
    state = {"raced": False}

    def racy(self, table_path, version, payload):
        if not state["raced"]:
            state["raced"] = True
            t.append(_df(spark, 20, 30))
        return real(self, table_path, version, payload)

    monkeypatch.setattr(msink.HardLinkClaimBackend, "publish", racy)
    w.commit([_WroteFiles(files=files, rows=10)])
    monkeypatch.undo()
    assert t.read().count() == 30               # rival + this append
    assert t.current_version() == 3
    assert not os.path.isdir(os.path.join(tbl, rel))  # attempt dir folded


def test_format_failed_task_attempt_invisible(spark, tmp_path):
    """A failed/speculative task attempt strands its (possibly partial)
    file in a dir no commit references: every read path skips it, and
    vacuum reclaims it as an orphan."""
    register_manifest_table(spark)
    p = str(tmp_path / "t")
    _df(spark, 0, 10).write.format("manifest_table").option(
        "path", p).mode("append").save()
    # simulate a retried task's leftover attempt dir (valid footer — the
    # worst case: dir-listing reads would serve it as duplicate rows)
    stray = os.path.join("data", "c-failed-attempt")
    _df(spark, 0, 10).coalesce(1).write.parquet(os.path.join(p, stray))

    t = ManifestTable(spark, p)
    assert t.read().count() == 10                              # native
    assert (spark.read.format("manifest_table").option("path", p)
            .load().count()) == 10                             # format
    swept = t.vacuum(force=True)
    assert swept["data_dirs"] == 1
    assert not os.path.isdir(os.path.join(p, stray))
    assert t.read().count() == 10


def test_format_append_commits_one_dir_regardless_of_tasks(spark, tmp_path):
    """The manifest's dirs list must grow by ONE per commit, not by the
    job's task count — at cron cadence a per-task-dir layout would make
    manifest size O(commits x partitions). Task files are coalesced into
    the commit dir by driver-side renames; their inline stats merge into
    that dir's stats."""
    register_manifest_table(spark)
    p = str(tmp_path / "t")
    (_df(spark, 0, 1000).repartition(8)
     .write.format("manifest_table").option("path", p)
     .option("statsCols", "v").mode("append").save())
    t = ManifestTable(spark, p)
    m = t.manifest(t.current_version())
    assert len(m["dirs"]) == 1
    d = m["dirs"][0]
    assert len(os.listdir(os.path.join(p, d))) == 8   # one file per task
    assert m["dir_meta"][d]["stats"]["v"] == [0, 9990]
    assert t.read().count() == 1000
    # a clean commit leaves no stranded attempt dirs behind
    assert {os.path.join("data", n)
            for n in os.listdir(os.path.join(p, "data"))} == {d}


def test_file_lists_recorded_and_reads_listing_free(spark, tmp_path,
                                                    monkeypatch):
    """VERDICT r06 item 4: commits record their dir's parquet file names
    in dir_meta["files"] (known at write/coalesce time), so BOTH Python
    readers discover files from the manifest alone — zero os.listdir on
    the data path for new tables (object-store: no LIST)."""
    import json

    register_manifest_table(spark)
    p = str(tmp_path / "t")
    t = ManifestTable(spark, p)
    # every write path records files: format writer, native append,
    # sync_audit, overwrite (via compact)
    _df(spark, 0, 50).write.format("manifest_table").option(
        "path", p).mode("append").save()
    t.append(_df(spark, 50, 100), stats_cols=["k"])
    t.compact()
    for v in t.versions():
        m = t.manifest(v)
        for d in m["dirs"]:
            names = m["dir_meta"][d]["files"]
            assert names and all(n.endswith(".parquet") for n in names)
            assert sorted(names) == sorted(
                f for f in os.listdir(os.path.join(p, d))
                if f.endswith(".parquet"))

    # batch reader: partitions() must not list any data dir
    data_listings = []
    real = os.listdir

    def counting(path="."):
        if f"{os.sep}data" in str(path):
            data_listings.append(str(path))
        return real(path)

    monkeypatch.setattr(os, "listdir", counting)
    rd = ManifestTableReader({"path": p}, t.schema())
    parts = rd.partitions()
    monkeypatch.undo()
    assert parts and not data_listings
    got = spark.read.format("manifest_table").option("path", p).load()
    assert got.count() == 100

    # legacy interop: a manifest WITHOUT the files record still reads
    # (one listdir fallback per dir), same rows
    mpath = os.path.join(p, "_manifests",
                         f"m-{t.current_version():012d}.json")
    with open(mpath) as f:
        payload = json.load(f)
    for dm in payload.get("dir_meta", {}).values():
        dm.pop("files", None)
    os.remove(mpath)
    with open(mpath, "w") as f:
        json.dump(payload, f)
    got2 = spark.read.format("manifest_table").option("path", p).load()
    assert got2.count() == 100
    assert got2.exceptAll(got).count() == 0


def test_stream_source_reads_files_from_manifest(spark, tmp_path,
                                                 monkeypatch):
    """The streaming source's per-batch file discovery is also
    manifest-described: partitions() for new commits performs no data-dir
    listing."""
    from cdc_audit_spark.sources.manifest_stream import (
        ManifestStreamReader,
    )

    p = str(tmp_path / "t")
    t = ManifestTable(spark, p)
    t.append(_df(spark, 0, 30))
    t.append(_df(spark, 30, 60))

    data_listings = []
    real = os.listdir

    def counting(path="."):
        if f"{os.sep}data" in str(path):
            data_listings.append(str(path))
        return real(path)

    monkeypatch.setattr(os, "listdir", counting)
    rd = ManifestStreamReader({"path": p}, t.schema())
    parts = rd.partitions({"version": 0}, {"version": 2})
    monkeypatch.undo()
    assert parts and not data_listings
    # and the drained rows are exactly the table
    from cdc_audit_spark.sources.manifest_stream import read_manifest_stream

    q = (read_manifest_stream(spark, p)
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "sink"))
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(str(tmp_path / "sink")).count() == 60


def test_maybe_compact_shrinks_reader_partitions(spark, tmp_path):
    """VERDICT r06 item 7: the format reader's partition count tracks
    live dirs x files — maybe_compact wired into an append loop's
    cadence folds it back. Partitions must shrink after the threshold
    trips, and the rows stay identical."""
    register_manifest_table(spark)
    p = str(tmp_path / "t")
    t = ManifestTable(spark, p)
    for i in range(6):  # drain loop: one dir per commit
        t.append(_df(spark, i * 10, (i + 1) * 10).coalesce(1))
        assert t.maybe_compact(max_dirs=8) is None  # under bound: no-op

    before = len(ManifestTableReader({"path": p}, t.schema()).partitions())
    assert before >= 6
    for i in range(6, 10):
        t.append(_df(spark, i * 10, (i + 1) * 10).coalesce(1))
    # over bound: rewrite, range layout for tight post-compact fan-in
    v = t.maybe_compact(max_dirs=8, range_by=["k"], n_files=2)
    assert v is not None
    after = len(ManifestTableReader({"path": p}, t.schema()).partitions())
    assert after < before
    assert after <= 2
    got = spark.read.format("manifest_table").option("path", p).load()
    assert got.count() == 100
    assert sorted(r["k"] for r in got.collect()) == list(range(100))


def test_in_filter_prunes_dirs_via_equality_stats(spark, tmp_path):
    """An IN-list pushed into the format reader prunes whole commit
    dirs through the recorded distinct-set/Bloom stats — the skip
    min/max ranges cannot express (every dir spans the same id range)."""
    from pyspark.sql.datasource import In

    from cdc_audit_spark.sinks.manifest import ManifestTable

    t = ManifestTable(spark, str(tmp_path / "t"))
    for tag in ("alpha", "beta", "gamma"):
        t.append(spark.range(0, 200).select(
            F.col("id").alias("k"), F.lit(tag).alias("src")),
            set_stats_cols=["src"])

    rd_all = ManifestTableReader({"path": t.path}, t.schema())
    rd_in = ManifestTableReader({"path": t.path}, t.schema())
    rd_in.pushFilters([In(("src",), ("beta",))])
    n_all, n_in = len(rd_all.partitions()), len(rd_in.partitions())
    assert n_in < n_all  # 1 of 3 dirs survives
    rd_two = ManifestTableReader({"path": t.path}, t.schema())
    rd_two.pushFilters([In(("src",), ("beta", "gamma"))])
    assert n_in < len(rd_two.partitions()) < n_all
    # a NULL element makes the skip unsound -> no pruning, still correct
    rd_null = ManifestTableReader({"path": t.path}, t.schema())
    rd_null.pushFilters([In(("src",), ("beta", None))])
    assert len(rd_null.partitions()) == n_all
    # end-to-end through SQL: result identity with pruning active
    register_manifest_table(spark)
    prev = spark.conf.get("spark.sql.python.filterPushdown.enabled", None)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        df = (spark.read.format("manifest_table")
              .option("path", t.path).load())
        assert df.filter(F.col("src").isin("beta")).count() == 200
        assert df.filter(F.col("src").isin("nope")).count() == 0
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.python.filterPushdown.enabled")
        else:
            spark.conf.set(
                "spark.sql.python.filterPushdown.enabled", prev)


def test_null_and_prefix_pushdown_prune_dirs(spark, tmp_path):
    """IsNull/IsNotNull prune through the recorded per-dir null counts;
    StringStartsWith prunes as a lexicographic range over string
    min/max stats."""
    from pyspark.sql.datasource import (
        IsNotNull,
        IsNull,
        StringStartsWith,
    )

    from cdc_audit_spark.sinks.manifest import ManifestTable

    t = ManifestTable(spark, str(tmp_path / "t"))
    # dir 1: no NULLs, names a*; dir 2: ALL NULL v, names b*
    t.append(spark.range(0, 100).selectExpr(
        "id as v", "concat('alpha', cast(id as string)) as name"),
        stats_cols=["v", "name"])
    t.append(spark.range(0, 100).selectExpr(
        "cast(null as long) as v",
        "concat('beta', cast(id as string)) as name"),
        stats_cols=["v", "name"])

    # metadata null count
    assert t.null_count("v") == 100
    assert t.null_count("name") == 0

    def parts(*filters):
        rd = ManifestTableReader({"path": t.path}, t.schema())
        rd.pushFilters(list(filters))
        return len(rd.partitions())

    n_all = parts()
    assert parts(IsNull(("v",))) < n_all        # no-NULL dir dropped
    assert parts(IsNotNull(("v",))) < n_all     # all-NULL dir dropped
    assert parts(StringStartsWith(("name",), "alpha")) < n_all
    # everything pruned -> the single empty sentinel partition
    assert parts(StringStartsWith(("name",), "zz")) == 1

    # result identity through SQL with pushdown forced on
    register_manifest_table(spark)
    prev = spark.conf.get("spark.sql.python.filterPushdown.enabled", None)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        df = (spark.read.format("manifest_table")
              .option("path", t.path).load())
        assert df.filter("v is null").count() == 100
        assert df.filter("v is not null").count() == 100
        assert df.filter(F.col("name").startswith("beta")).count() == 100
        assert df.filter(F.col("name").startswith("zz")).count() == 0
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.python.filterPushdown.enabled")
        else:
            spark.conf.set(
                "spark.sql.python.filterPushdown.enabled", prev)


def test_format_writer_records_rows_bytes_and_nulls(spark, tmp_path):
    """Format-written commits carry the same metadata layer as
    ManifestTable.append: footer rows/bytes (metadata-only row_count)
    and per-statsCol null counts folded inline during the write."""
    from cdc_audit_spark.sinks.manifest import ManifestTable

    register_manifest_table(spark)
    p = str(tmp_path / "t")
    df = spark.range(0, 1000).selectExpr(
        "id as k", "CASE WHEN id % 4 = 0 THEN NULL ELSE id END as v")
    (df.write.format("manifest_table").option("path", p)
     .option("statsCols", "k,v").mode("append").save())
    t = ManifestTable(spark, p)
    assert t.row_count() == 1000         # zero-scan answer
    assert t.null_count("v") == 250 and t.null_count("k") == 0
    m = t.manifest(1)
    dm = m["dir_meta"][m["dirs"][0]]
    assert dm["rows"] == 1000 and dm["bytes"] > 0


def test_format_type_widening(spark, tmp_path):
    """The registered format under type widening: reads resolve the
    recorded (wide) schema so mixed-width dirs promote; a widening write
    needs onDrift=evolve; a late NARROW format write is not drift (the
    stamp stays wide and its narrow files promote on read)."""
    register_manifest_table(spark)
    p = str(tmp_path / "t")

    def df(lo, hi, ktype):
        return spark.range(lo, hi).select(
            F.col("id").cast(ktype).alias("k"),
            (F.col("id") * 10).cast(ktype).alias("v"))

    (df(0, 10, "int").write.format("manifest_table")
     .option("path", p).mode("append").save())
    with pytest.raises(Exception, match="widened"):
        (df(10, 20, "bigint").write.format("manifest_table")
         .option("path", p).mode("append").save())
    (df(10, 20, "bigint").write.format("manifest_table")
     .option("path", p).option("onDrift", "evolve").mode("append").save())

    got = spark.read.format("manifest_table").option("path", p).load()
    assert {f.dataType.simpleString() for f in got.schema.fields} == {"bigint"}
    assert got.count() == 20 and got.filter("k >= 10").count() == 10

    # late narrow writer: no drift, stamp stays wide
    (df(20, 30, "int").write.format("manifest_table")
     .option("path", p).mode("append").save())
    t = ManifestTable(spark, p)
    assert {f.dataType.simpleString()
            for f in t.schema().fields} == {"bigint"}
    assert t.read().count() == 30
    # native read agrees with the format read
    native = sorted(r["k"] for r in t.read().collect())
    fmt = sorted(r["k"] for r in spark.read.format("manifest_table")
                 .option("path", p).load().collect())
    assert native == fmt == list(range(30))


def test_prefix_pruning_sound_at_max_codepoint(spark, tmp_path):
    """ADVICE r08: the StartsWith upper bound must be next_prefix(p)
    (last codepoint incremented), NOT p + U+10FFFF — a stored value
    p + U+10FFFF + suffix sorts ABOVE that cap, so a dir holding only
    such rows was unsoundly pruned (missing rows, not a wasted read)."""
    from pyspark.sql.datasource import StringStartsWith

    from cdc_audit_spark.sinks.manifest import ManifestTable
    from cdc_audit_spark.sources.manifest_table import (
        _prefix_upper_bound,
    )

    assert _prefix_upper_bound("ab") == "ac"
    assert _prefix_upper_bound("a\U0010ffff") == "b"
    assert _prefix_upper_bound("\U0010ffff" * 3) is None
    assert _prefix_upper_bound("") is None

    t = ManifestTable(spark, str(tmp_path / "t"))
    hot = "pre\U0010ffffsuffix"  # starts with "pre", sorts above the cap
    t.append(spark.createDataFrame([(hot,)], "name string"),
             stats_cols=["name"])
    t.append(spark.createDataFrame([("zzz",)], "name string"),
             stats_cols=["name"])

    rd = ManifestTableReader({"path": t.path}, t.schema())
    rd.pushFilters([StringStartsWith(("name",), "pre")])
    assert len(rd.partitions()) >= 1  # the U+10FFFF dir must survive

    register_manifest_table(spark)
    prev = spark.conf.get("spark.sql.python.filterPushdown.enabled", None)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        df = (spark.read.format("manifest_table")
              .option("path", t.path).load())
        assert df.filter(F.col("name").startswith("pre")).count() == 1
        # the genuinely-unmatched dir is still pruned
        rd2 = ManifestTableReader({"path": t.path}, t.schema())
        rd2.pushFilters([StringStartsWith(("name",), "aaa")])
        assert len(rd2.partitions()) == 1  # empty sentinel only
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.python.filterPushdown.enabled")
        else:
            spark.conf.set(
                "spark.sql.python.filterPushdown.enabled", prev)
