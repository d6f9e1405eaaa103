"""ManifestTable as a Structured-Streaming SOURCE: commit versions are
offsets, each micro-batch reads exactly the dirs its commits introduced.

The audit-table-as-stream semantic (SURVEY §1.1.3 — the reference's
consumers tail the audit table) at the file level: the transactional
sink's output is directly consumable by downstream Spark streams with
exactly-once offsets and no re-reads of seen data.
"""

import datetime as dt
import os

import pytest

from pyspark.sql import functions as F

from cdc_audit_spark.sinks.manifest import ManifestTable
from cdc_audit_spark.sources.manifest_stream import read_manifest_stream


def _rows(spark, lo, hi, event="insert"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.lit(dt.datetime(2026, 1, 1)).alias("audit_timestamp"),
        F.lit(event).alias("audit_event"),
        F.col("id").alias("audit_pk"),
    )


def _drain(spark, table_path, sink, ck):
    q = (read_manifest_stream(spark, table_path)
         .writeStream.format("parquet")
         .option("path", sink).option("checkpointLocation", ck).start())
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)
    return spark.read.parquet(sink)


def test_stream_equals_batch_read_since(spark, tmp_path):
    """Identity: draining the stream from version 0 yields exactly
    read_since(0) — same rows, no duplicates, no drops — even with a
    compaction rewrite interleaved between syncs (rewrites are NOT new
    rows and must not be re-emitted)."""
    t = ManifestTable(spark, str(tmp_path / "t"))
    t.sync_audit(_rows(spark, 1, 11))
    t.sync_audit(_rows(spark, 1, 21))
    t.compact()                      # rewrite: invisible to the stream
    t.sync_audit(_rows(spark, 1, 26))

    got = _drain(spark, t.path, str(tmp_path / "sink"), str(tmp_path / "ck"))
    want = t.read_since(0)
    assert got.count() == want.count() == 25
    assert sorted(r["audit_pk"] for r in got.collect()) == sorted(
        r["audit_pk"] for r in want.collect())
    # full row fidelity through the arrow path, timestamps included
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    """Checkpointed offsets: a restarted consumer reads ONLY commits it
    has not seen; an idle restart emits nothing."""
    t = ManifestTable(spark, str(tmp_path / "t"))
    sink, ck = str(tmp_path / "sink"), str(tmp_path / "ck")
    t.sync_audit(_rows(spark, 1, 11))
    assert _drain(spark, t.path, sink, ck).count() == 10

    t.sync_audit(_rows(spark, 1, 16))        # 5 new rows
    got = _drain(spark, t.path, sink, ck)
    assert got.count() == 15
    assert got.groupBy("audit_pk").count().filter("count > 1").count() == 0

    # idle restart: no new commits, nothing re-emitted
    assert _drain(spark, t.path, sink, ck).count() == 15


def test_stream_starting_version_skips_history(spark, tmp_path):
    t = ManifestTable(spark, str(tmp_path / "t"))
    t.sync_audit(_rows(spark, 1, 11))        # version 1
    t.sync_audit(_rows(spark, 1, 16))        # version 2
    q = (read_manifest_stream(spark, t.path, starting_version=1)
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "sink"))
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(str(tmp_path / "sink"))
    assert sorted(r["audit_pk"] for r in got.collect()) == [11, 12, 13, 14, 15]


def test_stream_feeds_downstream_merge(spark, tmp_path):
    """Sink AND source composed: audit commits stream into a foreachBatch
    that maintains a keyed replica via merge_audit — the full CDC loop
    (capture table -> manifest log -> streamed -> replica) on one stack."""
    log = ManifestTable(spark, str(tmp_path / "log"))
    replica = ManifestTable(spark, str(tmp_path / "replica"))
    log.sync_audit(_rows(spark, 1, 11))
    log.sync_audit(_rows(spark, 1, 16, "update"))

    boot = _rows(spark, 0, 0).drop("audit_event", "audit_pk")

    def apply(batch_df, epoch_id):
        replica.merge_audit(
            batch_df, ["k"],
            bootstrap=boot if replica.current_version() is None else None)

    q = (read_manifest_stream(spark, log.path)
         .writeStream.foreachBatch(apply)
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.processAllAvailable()
    q.stop()
    got = {r["k"]: r for r in replica.read().collect()}
    # first sync inserts keys 1-10; the second commit's delta (audit_pk
    # 11-15) carries update images for unseen keys 11-15 → upserted
    assert set(got) == set(range(1, 16))
    assert replica.watermark() == 15


def test_stream_available_now_trigger(spark, tmp_path):
    """trigger(availableNow=True): drain everything committed so far and
    stop — the batch-drain deployment mode of the reference's cron loop."""
    t = ManifestTable(spark, str(tmp_path / "t"))
    t.sync_audit(_rows(spark, 1, 11))
    t.sync_audit(_rows(spark, 1, 21))
    q = (read_manifest_stream(spark, t.path)
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "sink"))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "sink")).count() == 20


def test_stream_behind_retention_fails_loudly(spark, tmp_path):
    """A consumer whose checkpointed offset predates manifest retention
    (vacuum dropped the commits it still needed) must fail with a clear
    error, never silently skip the vacuumed commits' rows."""
    import pytest

    t = ManifestTable(spark, str(tmp_path / "t"))
    sink, ck = str(tmp_path / "sink"), str(tmp_path / "ck")
    t.sync_audit(_rows(spark, 1, 6))
    assert _drain(spark, t.path, sink, ck).count() == 5   # offset now v1

    t.sync_audit(_rows(spark, 1, 11))    # v2 — never consumed
    t.sync_audit(_rows(spark, 1, 16))    # v3
    t.vacuum(keep_versions=1)            # drops m-1, m-2
    assert t.versions() == [3]

    q = (read_manifest_stream(spark, t.path)
         .writeStream.format("parquet")
         .option("path", sink).option("checkpointLocation", ck).start())
    with pytest.raises(Exception, match="vacuumed|not found"):
        q.processAllAvailable()
        q.awaitTermination(60)
    q.stop()


def test_stream_refuses_merge_commits_by_default(spark, tmp_path):
    """ADVICE r06: a merge commit's dirs mix NEW delta rows with carried
    old rows — a change feed can neither emit (duplicates) nor silently
    skip (lost changes) them. The source must fail loudly, and only an
    explicit skipMerges opt-in restores append-only skipping."""
    import pytest

    t = ManifestTable(spark, str(tmp_path / "t"))
    boot = spark.range(1, 11).select(
        F.col("id").alias("k"), F.col("id").alias("v"))
    empty = spark.createDataFrame(
        [], "k long, v long, audit_event string, audit_pk long")
    t.merge_audit(empty, ["k"], bootstrap=boot, pruned=True,
                  range_buckets=2)                    # v1: overwrite
    t.append(spark.createDataFrame([(100, 100)], "k long, v long"))  # v2
    log = spark.createDataFrame(
        [(5, 50, "update", 1)],
        "k long, v long, audit_event string, audit_pk long")
    t.merge_audit(log, ["k"], pruned=True)            # v3: merge action
    assert t.manifest(t.current_version())["action"] == "merge"

    q = (read_manifest_stream(spark, t.path)
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "sink"))
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    with pytest.raises(Exception, match="merge commit"):
        q.processAllAvailable()
        q.awaitTermination(60)
    q.stop()

    # explicit opt-in: merges skipped, only the plain append streams
    q2 = (read_manifest_stream(spark, t.path)
          .writeStream.format("parquet")
          .option("path", str(tmp_path / "sink2"))
          .option("checkpointLocation", str(tmp_path / "ck2")).start())
    # rebuild the reader with the option (read_manifest_stream has no
    # kwarg for it: exercise the raw option surface)
    q2.stop()
    from cdc_audit_spark.sources.manifest_stream import (
        register_manifest_stream,
    )

    register_manifest_stream(spark)
    q3 = (spark.readStream.format("manifest_stream")
          .option("path", t.path).option("skipMerges", "true").load()
          .writeStream.format("parquet")
          .option("path", str(tmp_path / "sink3"))
          .option("checkpointLocation", str(tmp_path / "ck3")).start())
    q3.processAllAvailable()
    q3.stop()
    got = spark.read.parquet(str(tmp_path / "sink3"))
    assert [r["k"] for r in got.collect()] == [100]


def test_change_feed_streams_merge_deltas(spark, tmp_path):
    """merge_audit(change_feed=True) records each merge's APPLIED delta
    in the same commit; .option('changeFeed','true') streams exactly
    those rows — events included, bootstrap excluded — and a plain
    append interleaved in the history reads as tagged inserts."""
    t = ManifestTable(spark, str(tmp_path / "t"))
    boot = spark.range(0, 50).select(
        F.col("id").alias("k"), F.col("id").alias("v"))
    empty = spark.createDataFrame(
        [], "k long, v long, audit_event string, audit_pk long")
    t.merge_audit(empty, ["k"], bootstrap=boot, pruned=True,
                  range_buckets=4, change_feed=True)      # v1: bootstrap

    log1 = spark.createDataFrame(
        [(5, 500, "update", 1), (7, 0, "delete", 2), (100, 100, "insert", 3)],
        "k long, v long, audit_event string, audit_pk long")
    t.merge_audit(log1, ["k"], pruned=True, change_feed=True)   # v2
    # plain append lands between merges (bare dir: next merge rewrites)
    t.append(spark.createDataFrame([(200, 200)], "k long, v long"))  # v3
    log2 = log1.unionByName(spark.createDataFrame(
        [(5, 501, "update", 4), (200, 201, "update", 5)],
        "k long, v long, audit_event string, audit_pk long"))
    t.merge_audit(log2, ["k"], pruned=True, change_feed=True)   # v4

    q = (read_manifest_stream(spark, t.path, change_feed=True)
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "feed"))
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.processAllAvailable()
    q.stop()
    feed = spark.read.parquet(str(tmp_path / "feed"))
    got = {(r["k"], r["v"], r["audit_event"], r["audit_pk"])
           for r in feed.collect()}
    want = {(5, 500, "update", 1), (7, 0, "delete", 2),
            (100, 100, "insert", 3),                 # v2 delta
            (200, 200, "insert", None),              # v3 append, tagged
            (5, 501, "update", 4), (200, 201, "update", 5)}  # v4 delta
    assert got == want                               # bootstrap NOT in feed
    # the feed replayed onto the bootstrap reconstructs the table
    from cdc_audit_spark.capture import apply_changes

    replayed = apply_changes(
        boot,
        feed.filter("audit_pk is not null"), ["k"])
    # tagged appends (no audit identity) applied as plain upserts
    appends = feed.filter("audit_pk is null").select("k", "v")
    merged = {r["k"]: r["v"] for r in replayed.collect()}
    for r in appends.collect():
        merged.setdefault(r["k"], r["v"])
    # append row was later updated (k=200 -> 201) — state wins
    state = {r["k"]: r["v"] for r in t.read().collect()}
    assert {k: v for k, v in merged.items() if k != 200} == \
        {k: v for k, v in state.items() if k != 200}

    # vacuum keeps the retained version's feed streamable
    t.vacuum(keep_versions=1, retain_seconds=0)
    m = t.manifest(t.current_version())
    assert "cdc_dirs" in m
    for d in m["cdc_dirs"]:
        assert os.path.isdir(os.path.join(t.path, d))


def test_change_feed_requires_recorded_feed(spark, tmp_path):
    """changeFeed mode still fails loudly on a merge commit that never
    recorded its delta — a feed with silent holes is not a feed."""
    import pytest

    t = ManifestTable(spark, str(tmp_path / "t"))
    boot = spark.range(0, 10).select(
        F.col("id").alias("k"), F.col("id").alias("v"))
    empty = spark.createDataFrame(
        [], "k long, v long, audit_event string, audit_pk long")
    t.merge_audit(empty, ["k"], bootstrap=boot, pruned=True,
                  range_buckets=2)
    log = spark.createDataFrame(
        [(1, 11, "update", 1)],
        "k long, v long, audit_event string, audit_pk long")
    t.merge_audit(log, ["k"], pruned=True)   # no change_feed recorded

    q = (read_manifest_stream(spark, t.path, change_feed=True)
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "feed"))
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    with pytest.raises(Exception, match="no recorded change feed"):
        q.processAllAvailable()
        q.awaitTermination(60)
    q.stop()


def test_change_feed_survives_failed_commit(spark, tmp_path):
    """Crash window: the feed dir is written BEFORE the merge commit. If
    the commit loses its base-version pin (interleaved writer), the feed
    dir must stay unreferenced (never streamed), and the re-run must
    produce one clean feed entry — no duplicate events."""
    import pytest

    from cdc_audit_spark.sinks.manifest import CommitConflict

    t = ManifestTable(spark, str(tmp_path / "t"))
    boot = spark.range(0, 20).select(
        F.col("id").alias("k"), F.col("id").alias("v"))
    empty = spark.createDataFrame(
        [], "k long, v long, audit_event string, audit_pk long")
    t.merge_audit(empty, ["k"], bootstrap=boot, pruned=True,
                  range_buckets=2, change_feed=True)

    log = spark.createDataFrame(
        [(3, 33, "update", 1)],
        "k long, v long, audit_event string, audit_pk long")

    # interleave a racer between the merge's read and its claim, via the
    # feed-write hook (it runs inside the merge, before the commit)
    orig = ManifestTable._write_change_feed
    racer = ManifestTable(spark, t.path)

    def racing(self, delta, audit_pk="audit_pk"):
        extra, reread = orig(self, delta, audit_pk)
        racer.append(spark.createDataFrame([(500, 500)], "k long, v long"))
        return extra, reread

    ManifestTable._write_change_feed = racing
    try:
        with pytest.raises(CommitConflict):
            t.merge_audit(log, ["k"], pruned=True, change_feed=True)
    finally:
        ManifestTable._write_change_feed = orig

    # re-run converges (the racer's append forces a full rewrite)
    t.merge_audit(log, ["k"], pruned=True, change_feed=True)
    assert {r["k"]: r["v"] for r in t.read().collect()}[3] == 33

    q = (read_manifest_stream(spark, t.path, change_feed=True)
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "feed"))
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.processAllAvailable()
    q.stop()
    feed = spark.read.parquet(str(tmp_path / "feed"))
    # exactly ONE update event for k=3 (the failed attempt's feed dir is
    # orphaned, invisible) plus the racer's tagged insert
    assert feed.filter("k = 3").count() == 1
    assert feed.filter("k = 500 and audit_event = 'insert'").count() == 1
    # and vacuum reclaims the orphaned feed dir without touching live ones
    import os as _os

    n_before = len(_os.listdir(_os.path.join(t.path, "data")))
    t.vacuum(keep_versions=10, retain_seconds=0, force=True)
    m = t.manifest(t.current_version())
    for d in m.get("cdc_dirs", []):
        assert _os.path.isdir(_os.path.join(t.path, d))
    assert len(_os.listdir(_os.path.join(t.path, "data"))) <= n_before


def test_change_feed_drives_downstream_replica(spark, tmp_path):
    """Full composition: audit log -> replica A (merge_audit with
    change_feed) -> A's feed streamed -> replica B maintained by
    merge_audit from the FEED. B must equal A — the feed is a complete
    CDC source, not just an observability tap."""
    a = ManifestTable(spark, str(tmp_path / "a"))
    b = ManifestTable(spark, str(tmp_path / "b"))
    boot = spark.range(0, 40).select(
        F.col("id").alias("k"), F.col("id").alias("v"))
    empty = spark.createDataFrame(
        [], "k long, v long, audit_event string, audit_pk long")
    a.merge_audit(empty, ["k"], bootstrap=boot, pruned=True,
                  range_buckets=4, change_feed=True)
    log1 = spark.createDataFrame(
        [(2, 22, "update", 1), (5, 0, "delete", 2)],
        "k long, v long, audit_event string, audit_pk long")
    a.merge_audit(log1, ["k"], pruned=True, change_feed=True)
    log2 = log1.unionByName(spark.createDataFrame(
        [(100, 100, "insert", 3), (2, 23, "update", 4)],
        "k long, v long, audit_event string, audit_pk long"))
    a.merge_audit(log2, ["k"], pruned=True, change_feed=True)

    def apply(batch_df, epoch_id):
        b.merge_audit(
            batch_df.select("k", "v", "audit_event", "audit_pk"), ["k"],
            bootstrap=boot if b.current_version() is None else None,
            pruned=True, range_buckets=4)

    q = (read_manifest_stream(spark, a.path, change_feed=True)
         .writeStream.foreachBatch(apply)
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.processAllAvailable()
    q.stop()

    got_a = {r["k"]: r["v"] for r in a.read().collect()}
    got_b = {r["k"]: r["v"] for r in b.read().collect()}
    assert got_a == got_b
    assert got_b[2] == 23 and 5 not in got_b and got_b[100] == 100


def test_non_pruned_merge_commits_as_merge_action(spark, tmp_path):
    """Review fix: non-pruned merge_audit used to commit action
    'overwrite', indistinguishable from a compaction — so a change-feed
    consumer silently skipped its genuinely new rows. Both merge modes
    now commit action 'merge' whenever the commit hides a nonempty
    delta; a bootstrap-only first commit stays 'overwrite' (feeds
    exclude the snapshot by contract)."""
    import pytest

    t = ManifestTable(spark, str(tmp_path / "t"))
    boot = spark.range(0, 10).select(
        F.col("id").alias("k"), F.col("id").alias("v"))
    empty = spark.createDataFrame(
        [], "k long, v long, audit_event string, audit_pk long")
    t.merge_audit(empty, ["k"], bootstrap=boot)            # non-pruned
    assert t.manifest(t.current_version())["action"] == "overwrite"

    log = spark.createDataFrame(
        [(1, 11, "update", 1)],
        "k long, v long, audit_event string, audit_pk long")
    t.merge_audit(log, ["k"])                              # hides new rows
    assert t.manifest(t.current_version())["action"] == "merge"

    # a changeFeed consumer now fails loudly instead of losing the update
    q = (read_manifest_stream(spark, t.path, change_feed=True)
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "feed"))
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    with pytest.raises(Exception, match="no recorded change feed"):
        q.processAllAvailable()
        q.awaitTermination(60)
    q.stop()

    # non-pruned WITH change_feed: the feed streams the delta
    t2 = ManifestTable(spark, str(tmp_path / "t2"))
    t2.merge_audit(empty, ["k"], bootstrap=boot, change_feed=True)
    t2.merge_audit(log, ["k"], change_feed=True)
    q2 = (read_manifest_stream(spark, t2.path, change_feed=True)
          .writeStream.format("parquet")
          .option("path", str(tmp_path / "feed2"))
          .option("checkpointLocation", str(tmp_path / "ck2")).start())
    q2.processAllAvailable()
    q2.stop()
    feed = spark.read.parquet(str(tmp_path / "feed2"))
    assert [(r["k"], r["v"], r["audit_event"], r["audit_pk"])
            for r in feed.collect()] == [(1, 11, "update", 1)]

    # bootstrap+delta in ONE first commit is also a 'merge' (its rows
    # are hidden inside the snapshot rewrite)
    t3 = ManifestTable(spark, str(tmp_path / "t3"))
    t3.merge_audit(log, ["k"], bootstrap=boot)
    assert t3.manifest(t3.current_version())["action"] == "merge"


def test_feed_present_but_option_missing_diagnoses_correctly(spark,
                                                            tmp_path):
    """Review fix: a merge commit WITH a recorded feed, streamed without
    the changeFeed option, must point the user at the option — not claim
    the writer never recorded a feed."""
    import pytest

    t = ManifestTable(spark, str(tmp_path / "t"))
    boot = spark.range(0, 10).select(
        F.col("id").alias("k"), F.col("id").alias("v"))
    empty = spark.createDataFrame(
        [], "k long, v long, audit_event string, audit_pk long")
    t.merge_audit(empty, ["k"], bootstrap=boot, pruned=True,
                  range_buckets=2, change_feed=True)
    log = spark.createDataFrame(
        [(1, 11, "update", 1)],
        "k long, v long, audit_event string, audit_pk long")
    t.merge_audit(log, ["k"], pruned=True, change_feed=True)

    q = (read_manifest_stream(spark, t.path)          # no changeFeed
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "sink"))
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    with pytest.raises(Exception, match="WITH a recorded change feed"):
        q.processAllAvailable()
        q.awaitTermination(60)
    q.stop()


def test_legacy_overwrite_feed_merge_still_loud(spark, tmp_path):
    """Review fix 2: tables written by the pre-fix code hold non-pruned
    feed merges as action 'overwrite' WITH cdc_dirs. Feed handling keys
    on cdc_dirs, not the action string — so without changeFeed such a
    commit is refused (not silently skipped like a compaction), and with
    changeFeed its feed streams."""
    import json
    import pytest

    t = ManifestTable(spark, str(tmp_path / "t"))
    boot = spark.range(0, 10).select(
        F.col("id").alias("k"), F.col("id").alias("v"))
    empty = spark.createDataFrame(
        [], "k long, v long, audit_event string, audit_pk long")
    t.merge_audit(empty, ["k"], bootstrap=boot, change_feed=True)
    log = spark.createDataFrame(
        [(1, 11, "update", 1)],
        "k long, v long, audit_event string, audit_pk long")
    t.merge_audit(log, ["k"], change_feed=True)
    v = t.current_version()
    # rewrite the manifest as the PRE-FIX code committed it
    mp = os.path.join(t.path, "_manifests", f"m-{v:012d}.json")
    with open(mp) as f:
        payload = json.load(f)
    assert payload["action"] == "merge" and "cdc_dirs" in payload
    payload["action"] = "overwrite"
    os.remove(mp)
    with open(mp, "w") as f:
        json.dump(payload, f)

    q = (read_manifest_stream(spark, t.path)           # no changeFeed
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "sink"))
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    with pytest.raises(Exception, match="WITH a recorded change feed"):
        q.processAllAvailable()
        q.awaitTermination(60)
    q.stop()

    q2 = (read_manifest_stream(spark, t.path, change_feed=True)
          .writeStream.format("parquet")
          .option("path", str(tmp_path / "feed"))
          .option("checkpointLocation", str(tmp_path / "ck2")).start())
    q2.processAllAvailable()
    q2.stop()
    feed = spark.read.parquet(str(tmp_path / "feed"))
    assert [(r["k"], r["v"], r["audit_event"], r["audit_pk"])
            for r in feed.collect()] == [(1, 11, "update", 1)]


def test_feed_records_audit_col_names(spark, tmp_path):
    """merge_audit records the audit column NAMES alongside cdc_schema
    (cdc_audit_cols, an inherited state key), and the reader resolves
    the fill/widened columns from the record instead of hardcoding the
    default templating (ADVICE r07)."""
    from cdc_audit_spark.sources.manifest_stream import (
        _audit_col_names,
        _change_feed_schema,
    )

    t = ManifestTable(spark, str(tmp_path / "t"))
    boot = spark.range(0, 10).select(
        F.col("id").alias("k"), F.col("id").alias("v"))
    empty = spark.createDataFrame(
        [], "k long, v long, audit_event string, audit_pk long")
    t.merge_audit(empty, ["k"], bootstrap=boot, change_feed=True)
    log = spark.createDataFrame(
        [(1, 11, "update", 1)],
        "k long, v long, audit_event string, audit_pk long")
    t.merge_audit(log, ["k"], change_feed=True)

    assert _audit_col_names(t.path) == {
        "event": "audit_event", "pk": "audit_pk", "ts": "audit_timestamp"}
    m = t.manifest(t.current_version())
    assert m["cdc_audit_cols"] == {"event": "audit_event",
                                   "pk": "audit_pk"}
    # inherited through later commits like cdc_schema
    t.append(spark.createDataFrame([(50, 50)], "k long, v long"))
    assert "cdc_audit_cols" in t.manifest(t.current_version())


def test_change_feed_fallback_widens_all_audit_cols(spark, tmp_path):
    """A plain-append-only table read in changeFeed mode (no merge ever
    recorded cdc_schema) widens the declared schema with ALL THREE audit
    columns in reference order — event, timestamp, pk — not just
    event/pk (VERDICT r07 item 7)."""
    t = ManifestTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, 10)], "k long, v long"))

    df = read_manifest_stream(spark, t.path, change_feed=True)
    assert [f.name for f in df.schema.fields] == [
        "k", "v", "audit_event", "audit_timestamp", "audit_pk"]
    q = (df.writeStream.format("parquet")
         .option("path", str(tmp_path / "feed"))
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.processAllAvailable()
    q.stop()
    feed = spark.read.parquet(str(tmp_path / "feed"))
    rows = [(r["k"], r["v"], r["audit_event"], r["audit_timestamp"],
             r["audit_pk"]) for r in feed.collect()]
    assert rows == [(1, 10, "insert", None, None)]


def test_batch_change_feed_equals_streamed_feed(spark, tmp_path):
    """read_change_feed (the table_changes analog) must return exactly
    the rows the streaming changeFeed source emits for the same version
    window — merges' recorded deltas, deletes' recorded rows, appends
    tagged as inserts — each stamped with its commit version."""
    t = ManifestTable(spark, str(tmp_path / "t"))
    boot = spark.range(0, 50).select(
        F.col("id").alias("k"), F.col("id").alias("v"))
    empty = spark.createDataFrame(
        [], "k long, v long, audit_event string, audit_pk long")
    t.merge_audit(empty, ["k"], bootstrap=boot, pruned=True,
                  range_buckets=4, change_feed=True)            # v1
    log1 = spark.createDataFrame(
        [(5, 500, "update", 1), (7, 0, "delete", 2)],
        "k long, v long, audit_event string, audit_pk long")
    t.merge_audit(log1, ["k"], pruned=True, change_feed=True)   # v2
    t.append(spark.createDataFrame([(200, 200)], "k long, v long"))  # v3
    t.delete_where("k = 11", key_col="k", change_feed=True)     # v4

    batch = t.read_change_feed()
    rows = {(r["k"], r["v"], r["audit_event"], r["_commit_version"])
            for r in batch.collect()}
    assert rows == {
        (5, 500, "update", 2), (7, 0, "delete", 2),   # merge delta
        (200, 200, "insert", 3),                      # append, tagged
        (11, 11, "delete", 4),                        # DV feed row
    }
    # bootstrap excluded (public CDF contract); window narrowing works
    assert t.read_change_feed(from_version=3).count() == 2
    assert t.read_change_feed(to_version=2).count() == 2

    # an unfed delete poisons only windows that include it
    t.delete_where("k = 12", key_col="k")                       # v5
    with pytest.raises(ValueError, match="delete"):
        t.read_change_feed()
    assert t.read_change_feed(to_version=4).count() == 4


def test_max_versions_per_trigger_bounds_batches(spark, tmp_path):
    """maxVersionsPerTrigger (the maxFilesPerTrigger analog): a RUNNING
    consumer facing a 6-commit backlog drains it in bounded micro-batches
    of <= 2 versions each — exactly once overall — instead of one giant
    batch. The cap binds from the second trigger of a run onward: the
    first trigger drains uncapped BY DESIGN, because latestOffset() runs
    before the reader can see the batch start (initialOffset on a fresh
    start, the checkpointed offset on a restart) and capping against
    start_version there regresses offsets below a restart's checkpoint
    (ADVICE r08, high — see test_max_versions_cap_restart_no_duplicates)."""
    from cdc_audit_spark.sources.manifest_stream import (
        register_manifest_stream,
    )

    register_manifest_stream(spark)
    t = ManifestTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([(-1,)], "k long"))

    batch_sizes = []

    def sink(df, epoch_id):
        batch_sizes.append(df.count())

    q = (spark.readStream.format("manifest_stream")
         .option("path", t.path)
         .option("maxVersionsPerTrigger", "2").load()
         .writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.processAllAvailable()  # trigger 1 (uncapped) plants the floor
    assert sum(batch_sizes) == 1
    # the backlog lands while the query keeps running — the real
    # catch-up shape; every subsequent trigger is bounded by the cap
    for i in range(6):
        t.append(spark.createDataFrame([(i,)], "k long"))
    q.processAllAvailable()
    q.stop()
    nonempty = [b for b in batch_sizes[1:] if b]
    assert sum(nonempty) == 6            # exactly once, nothing lost
    assert len(nonempty) >= 3            # the backlog was split up
    assert all(b <= 2 for b in nonempty)  # never more than the cap

    # option validation (reader construction is lazy — test it directly)
    from cdc_audit_spark.sources.manifest_stream import (
        ManifestStreamReader,
    )

    with pytest.raises(ValueError, match="maxVersionsPerTrigger"):
        ManifestStreamReader(
            {"path": t.path, "maxversionspertrigger": "0"}, t.schema())


def test_max_versions_cap_restart_no_duplicates(spark, tmp_path):
    """Restart safety for the rate cap (ADVICE r08, high): after a
    capped consumer drains versions past start_version + cap and stops,
    a RESTART from its checkpoint must not let latestOffset() cap the
    offset BELOW the checkpointed one (initialOffset is never called on
    restart, so the floor must not default to start_version) — the old
    behavior made Spark plan a backward batch, commit the regressed
    offset, and replay already-emitted versions as duplicates."""
    from cdc_audit_spark.sources.manifest_stream import (
        register_manifest_stream,
    )

    register_manifest_stream(spark)
    t = ManifestTable(spark, str(tmp_path / "t"))
    for i in range(6):
        t.append(spark.createDataFrame([(i,)], "k long"))

    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def run_drain():
        q = (spark.readStream.format("manifest_stream")
             .option("path", t.path)
             .option("maxVersionsPerTrigger", "2").load()
             .writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ck).start())
        q.processAllAvailable()
        q.stop()

    run_drain()  # checkpointed offset is now 6 (>> start_version + 2)
    got = sorted(r["k"] for r in spark.read.parquet(out).collect())
    assert got == list(range(6))

    # backlog lands while the consumer is down; the restart's first
    # latestOffset() runs before any partitions() call
    t.append(spark.createDataFrame([(6,)], "k long"))
    t.append(spark.createDataFrame([(7,)], "k long"))
    run_drain()
    got = sorted(r["k"] for r in spark.read.parquet(out).collect())
    assert got == list(range(8))  # exactly once: no replay, no loss

    # and the cap still binds on subsequent triggers of the same run
    for i in range(8, 14):
        t.append(spark.createDataFrame([(i,)], "k long"))
    sizes = []
    q = (spark.readStream.format("manifest_stream")
         .option("path", t.path)
         .option("maxVersionsPerTrigger", "2").load()
         .writeStream.foreachBatch(lambda df, eid: sizes.append(df.count()))
         .option("checkpointLocation", ck).start())
    q.processAllAvailable()
    q.stop()
    nonempty = [b for b in sizes if b]
    assert sum(nonempty) == 6
    # first post-restart trigger drains uncapped by design; every
    # later one is bounded by the cap
    assert all(b <= 2 for b in nonempty[1:])
