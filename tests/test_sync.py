import datetime as dt

from pyspark.sql import functions as F

from cdc_audit_spark.schema import audit_schema
from cdc_audit_spark.sync import get_watermark, read_sink, sync_table

TS = dt.datetime(2026, 1, 1)


def _audit_df(spark, n, base=0):
    return (
        spark.range(base + 1, base + n + 1)
        .select(
            F.col("id").alias("k"),
            (F.col("id") * 2).cast("double").alias("v"),
            F.lit("insert").alias("audit_event"),
            F.lit(TS).alias("audit_timestamp"),
            F.col("id").alias("audit_pk"),
        )
    )


def test_first_sync_writes_all_with_header(spark, tmp_path):
    sink = str(tmp_path / "t.csv")
    res = sync_table(_audit_df(spark, 10), sink, fmt="csv")
    assert res.rows_synced == 10
    assert res.watermark == 10
    back = read_sink(spark, sink, fmt="csv")
    assert back.count() == 10
    assert back.columns[-1] == "audit_pk"  # sync:352 invariant


def test_incremental_sync_appends_only_delta(spark, tmp_path):
    sink = str(tmp_path / "t.csv")
    sync_table(_audit_df(spark, 10), sink, fmt="csv")
    # second run over a log that grew to 25 rows
    res = sync_table(_audit_df(spark, 25), sink, fmt="csv")
    assert res.rows_synced == 15
    assert res.watermark == 25
    back = read_sink(spark, sink, fmt="csv")
    assert back.count() == 25
    assert back.select("audit_pk").distinct().count() == 25  # no duplicates


def test_empty_delta_appends_nothing(spark, tmp_path):
    sink = str(tmp_path / "t.csv")
    sync_table(_audit_df(spark, 10), sink, fmt="csv")
    res = sync_table(_audit_df(spark, 10), sink, fmt="csv")
    assert res.rows_synced == 0
    assert res.watermark == 10
    assert read_sink(spark, sink, fmt="csv").count() == 10


def test_watermark_recovery_from_sink_scan(spark, tmp_path):
    # delete the state file; watermark must be recovered from the data
    # (parity with the reference's tail read, sync:341-358)
    import os

    sink = str(tmp_path / "t.csv")
    sync_table(_audit_df(spark, 10), sink, fmt="csv")
    os.remove(os.path.join(sink, "_cdc_watermark.json"))
    assert get_watermark(spark, sink, fmt="csv") == 10
    res = sync_table(_audit_df(spark, 12), sink, fmt="csv")
    assert res.rows_synced == 2


def test_watermark_empty_sink_is_zero(spark, tmp_path):
    assert get_watermark(spark, str(tmp_path / "nope.csv")) == 0


def test_parquet_sink(spark, tmp_path):
    sink = str(tmp_path / "t.parquet")
    res = sync_table(_audit_df(spark, 100), sink, fmt="parquet")
    assert res.rows_synced == 100
    assert read_sink(spark, sink, fmt="parquet").count() == 100


def test_incremental_filter_is_pushed_down(spark, tmp_path):
    """The audit_pk > watermark predicate must reach the parquet scan (O2)."""
    sink = str(tmp_path / "log.parquet")
    _audit_df(spark, 50).write.parquet(sink)
    log = spark.read.parquet(sink)
    plan = log.filter(F.col("audit_pk") > F.lit(25))._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(audit_pk), GreaterThan(audit_pk,25)" in plan


def test_sync_partitioned_sink_prunes(spark, tmp_path):
    audit = _audit_df(spark, 40)
    sink = str(tmp_path / "psink")
    res = sync_table(audit, sink, fmt="parquet", watermark=0,
                     partition_by=["audit_event"],
                     sort_within_partitions=["audit_pk"])
    assert res.rows_synced == 40
    back = read_sink(spark, sink, fmt="parquet")
    assert back.count() == 40
    # directory partitioning: filtering on the partition key reads only its
    # directory (PartitionFilters in the scan, no data filter needed)
    plan = (
        back.filter(F.col("audit_event") == "insert")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [isnotnull(audit_event" in plan
    # watermark recovery still works over the partitioned layout
    assert get_watermark(spark, sink, fmt="parquet", recover_from_sink=True) == 40 \
        or get_watermark(spark, sink, fmt="parquet") == 40


def _audit_df_v2(spark, n, base=0):
    """The v1 audit shape plus a new source column (additive drift)."""
    return _audit_df(spark, n, base).withColumn(
        "region", F.concat(F.lit("r"), (F.col("k") % 3).cast("string"))
    ).select("k", "v", "region", "audit_event", "audit_timestamp", "audit_pk")


def test_drift_fails_by_default(spark, tmp_path):
    import pytest

    from cdc_audit_spark.schema import SchemaDriftError

    sink = str(tmp_path / "t.parquet")
    sync_table(_audit_df(spark, 10), sink, fmt="parquet")
    with pytest.raises(SchemaDriftError, match="on_drift='evolve'"):
        sync_table(_audit_df_v2(spark, 25), sink, fmt="parquet")


def test_additive_drift_evolves(spark, tmp_path):
    """New source column appears mid-stream: old rows read as NULL, new rows
    carry values, watermark advances over both generations — the reference's
    README:222-224 TODO, closed."""
    sink = str(tmp_path / "t.parquet")
    sync_table(_audit_df(spark, 10), sink, fmt="parquet")
    res = sync_table(_audit_df_v2(spark, 25), sink, fmt="parquet", on_drift="evolve")
    assert res.rows_synced == 15 and res.watermark == 25

    back = read_sink(spark, sink, fmt="parquet", merge_schema=True)
    assert "region" in back.columns and back.count() == 25
    assert back.filter(F.col("region").isNull()).count() == 10
    assert back.filter((F.col("audit_pk") > 10) & F.col("region").isNull()).count() == 0


def test_non_additive_drift_refused_even_evolving(spark, tmp_path):
    import pytest

    from cdc_audit_spark.schema import SchemaDriftError

    sink = str(tmp_path / "t.parquet")
    sync_table(_audit_df_v2(spark, 10), sink, fmt="parquet")
    # v1 shape lacks 'region' → a removed column: history would silently lose it
    with pytest.raises(SchemaDriftError, match="removed"):
        sync_table(_audit_df(spark, 25), sink, fmt="parquet", on_drift="evolve")


def test_csv_sink_cannot_evolve(spark, tmp_path):
    import pytest

    from cdc_audit_spark.schema import SchemaDriftError

    sink = str(tmp_path / "t.csv")
    sync_table(_audit_df(spark, 10), sink, fmt="csv")
    with pytest.raises(SchemaDriftError, match="parquet"):
        sync_table(_audit_df_v2(spark, 25), sink, fmt="csv", on_drift="evolve")


def test_json_sink_full_cycle(spark, tmp_path):
    """JSON sink (ndjson, the common CDC bus format): incremental append,
    name-only drift comparison (JSON re-reads timestamps as strings and
    ints as bigints — type-level comparison would false-positive), scan
    recovery, and typed read-back with an explicit schema."""
    import os

    sink = str(tmp_path / "t.json")
    df = _audit_df(spark, 10)
    res = sync_table(df, sink, fmt="json")
    assert res.rows_synced == 10 and res.watermark == 10
    # second run: same rows, empty delta — the inferred-schema drift check
    # must NOT fire on type differences
    res2 = sync_table(df, sink, fmt="json")
    assert res2.rows_synced == 0 and res2.watermark == 10
    # incremental append
    res3 = sync_table(_audit_df(spark, 15), sink, fmt="json")
    assert res3.rows_synced == 5 and res3.watermark == 15
    # recovery by scan after state loss
    for f in os.listdir(sink):
        if "state" in f:
            os.remove(os.path.join(sink, f))
    assert get_watermark(spark, sink, fmt="json") == 15
    # typed read-back restores timestamp/long types
    back = read_sink(spark, sink, fmt="json", schema=df.schema)
    assert dict(back.dtypes)["audit_timestamp"] == "timestamp"
    assert back.count() == 15


def test_orc_sink(spark, tmp_path):
    """ORC is a typed format like parquet: full-fidelity round trip through
    the same generic sink path, including the typed drift comparison."""
    sink = str(tmp_path / "t.orc")
    res = sync_table(_audit_df(spark, 10), sink, fmt="orc")
    assert res.rows_synced == 10
    assert sync_table(_audit_df(spark, 10), sink, fmt="orc").rows_synced == 0
    back = read_sink(spark, sink, fmt="orc")
    assert back.count() == 10
    assert dict(back.dtypes)["audit_timestamp"] == "timestamp"


def test_verify_sink_detects_corruption(spark, tmp_path):
    """table_checksum/verify_sink: a faithful sink matches the source; a
    corrupted sink (row lost or value flipped) does not — the integrity
    check the reference's corruptible CSV sink lacks."""
    import glob
    import os

    from cdc_audit_spark.sync import verify_sink

    df = _audit_df(spark, 50)
    sink = str(tmp_path / "t.csv")
    sync_table(df, sink, fmt="csv")
    assert verify_sink(df, sink, fmt="csv")

    # corrupt one data line (drop it) — checksum must diverge. Remove the
    # Hadoop .crc sidecar first: local FS would catch the edit itself, but
    # object stores have no sidecars — this checksum is the layer above.
    part = sorted(glob.glob(os.path.join(sink, "part-*.csv")))[0]
    crc = os.path.join(os.path.dirname(part), "." + os.path.basename(part) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)
    lines = open(part).read().splitlines()
    open(part, "w").write("\n".join(lines[:-1]) + "\n")
    spark.catalog.refreshByPath(sink)  # drop cached file sizes
    assert not verify_sink(df, sink, fmt="csv")


def test_verify_sink_order_independent(spark, tmp_path):
    """Checksum equality is order- and layout-independent: a repartitioned
    rewrite of the same rows still verifies."""
    from cdc_audit_spark.sync import table_checksum, verify_sink

    df = _audit_df(spark, 100)
    sink = str(tmp_path / "t.parquet")
    sync_table(df, sink, fmt="parquet")
    assert verify_sink(df, sink, fmt="parquet")
    shuffled = str(tmp_path / "shuffled.parquet")
    read_sink(spark, sink, fmt="parquet").repartition(7).write.parquet(shuffled)
    a = table_checksum(df).first()
    b = table_checksum(spark.read.parquet(shuffled).select(*df.columns)).first()
    assert (a["checksum"], a["n_rows"]) == (b["checksum"], b["n_rows"])


def test_sync_many_concurrent(spark, tmp_path):
    """Concurrent multi-table sync: distinct sinks, correct per-table
    results, idempotent second pass, and distinct-sink enforcement."""
    import pytest

    from cdc_audit_spark.sync import sync_many

    jobs = {
        f"t{i}": (_audit_df(spark, 10 * (i + 1)), str(tmp_path / f"t{i}"))
        for i in range(4)
    }
    res = sync_many(jobs, fmt="parquet", max_concurrency=4)
    assert {n: r.rows_synced for n, r in res.items()} == {
        "t0": 10, "t1": 20, "t2": 30, "t3": 40}
    res2 = sync_many(jobs, fmt="parquet", max_concurrency=4)
    assert all(r.rows_synced == 0 for r in res2.values())
    for i in range(4):
        assert read_sink(spark, str(tmp_path / f"t{i}"), fmt="parquet").count() == 10 * (i + 1)

    with pytest.raises(ValueError, match="distinct"):
        sync_many({"a": (_audit_df(spark, 1), str(tmp_path / "same")),
                   "b": (_audit_df(spark, 1), str(tmp_path / "same"))})


def test_verify_sink_microsecond_timestamps(spark, tmp_path):
    """A faithful CSV sink must verify even when audit timestamps carry
    sub-millisecond precision — Spark's default text timestampFormat keeps
    only milliseconds, which used to make the checksum diverge."""
    from cdc_audit_spark.sync import verify_sink

    df = (
        spark.range(1, 6)
        .select(
            F.col("id").alias("k"),
            F.lit(dt.datetime(2026, 1, 1, 12, 0, 0, 123456))
            .alias("audit_timestamp"),
            F.lit("insert").alias("audit_event"),
            F.col("id").alias("audit_pk"),
        )
    )
    for fmt in ("csv", "json"):
        sink = str(tmp_path / f"t_us.{fmt}")
        sync_table(df, sink, fmt=fmt)
        back = read_sink(spark, sink, fmt=fmt, schema=df.schema)
        assert back.first()["audit_timestamp"].microsecond == 123456
        assert verify_sink(df, sink, fmt=fmt)


def test_expected_sink_content_after_wipe(spark, tmp_path):
    """verify_sink against expected_sink_content stays green across the
    full lifecycle: sync → wipe → delta sync → re-verify — a wipe is a
    recorded rewrite, not corruption (and tampering is still caught)."""
    from cdc_audit_spark.compact import compact_log
    from cdc_audit_spark.sync import expected_sink_content, verify_sink

    sink = str(tmp_path / "t.csv")
    full = _audit_df(spark, 12)
    first = _audit_df(spark, 8)
    sync_table(first, sink, fmt="csv")
    assert verify_sink(expected_sink_content(first, sink), sink, fmt="csv")

    compact_log(read_sink(spark, sink, fmt="csv",
                          schema=first.schema), sink, fmt="csv")
    # post-wipe: sink holds only row pk=8; reconstruction must agree
    assert verify_sink(expected_sink_content(first, sink), sink, fmt="csv")

    res = sync_table(full, sink, fmt="csv")  # delta rows 9..12 append
    assert res.rows_synced == 4
    assert verify_sink(expected_sink_content(full, sink), sink, fmt="csv")
    # a genuinely missing row still fails verification
    tampered = full.filter(F.col("audit_pk") != 10)
    assert not verify_sink(expected_sink_content(tampered, sink), sink,
                           fmt="csv")


def test_expected_sink_content_per_key_wipe(spark, tmp_path):
    """Per-key compaction (pk_cols recorded with the wipe) reconstructs:
    keep-last-per-key of rows up to the boundary, later rows verbatim —
    including keys whose only surviving row predates the wipe."""
    from cdc_audit_spark.compact import compact_log
    from cdc_audit_spark.sync import expected_sink_content, verify_sink

    sink = str(tmp_path / "t.parquet")
    sch = "k long, v double, audit_event string, audit_pk long"
    pre = [(1, 1.0, "insert", 1), (2, 2.0, "insert", 2),
           (1, 1.5, "update", 3), (3, 3.0, "insert", 4)]
    post = [(2, 2.5, "update", 5), (4, 4.0, "insert", 6)]
    first = spark.createDataFrame(pre, sch)
    full = spark.createDataFrame(pre + post, sch)

    sync_table(first, sink, fmt="parquet")
    compact_log(read_sink(spark, sink, fmt="parquet"), sink,
                fmt="parquet", pk_cols=["k"])
    # survivors: k1@pk3, k2@pk2, k3@pk4 — k1's pk1 row is gone
    assert verify_sink(expected_sink_content(first, sink), sink,
                       fmt="parquet")

    res = sync_table(full, sink, fmt="parquet")
    assert res.rows_synced == 2
    assert verify_sink(expected_sink_content(full, sink), sink,
                       fmt="parquet")
    # reconstruction is content-exact, not just checksum-lucky
    exp = {tuple(r) for r in expected_sink_content(full, sink).collect()}
    assert exp == {(1, 1.5, "update", 3), (2, 2.0, "insert", 2),
                   (3, 3.0, "insert", 4), (2, 2.5, "update", 5),
                   (4, 4.0, "insert", 6)}


def test_repair_sink_rebuilds_diverged_sink(spark, tmp_path):
    """repair_sink rewrites a diverged sink to its expected content —
    including keeping a recorded wipe compacted — and restores the state
    file so subsequent incremental syncs resume correctly."""
    from cdc_audit_spark.compact import compact_log
    from cdc_audit_spark.sync import (
        expected_sink_content,
        get_sync_state,
        repair_sink,
        verify_sink,
    )

    sink = str(tmp_path / "t.parquet")
    full = _audit_df(spark, 10)
    sync_table(full, sink, fmt="parquet")
    compact_log(read_sink(spark, sink, fmt="parquet"), sink, fmt="parquet")

    # corrupt: duplicate rows appended to the sink (state file intact —
    # an overwrite-style corruption would also destroy the wipe record,
    # after which repair correctly rebuilds the full uncompacted source)
    _audit_df(spark, 3).write.mode("append").parquet(sink)
    assert not verify_sink(expected_sink_content(full, sink), sink,
                           fmt="parquet")

    n = repair_sink(full, sink, fmt="parquet")
    assert n == 1  # wipe record preserved → repaired sink stays compacted
    assert verify_sink(expected_sink_content(full, sink), sink,
                       fmt="parquet")
    st = get_sync_state(sink)
    assert st["watermark"] == 10 and st["compacted"]["through"] == 10
    # incremental resume: nothing re-syncs, new rows append normally
    assert sync_table(full, sink, fmt="parquet").rows_synced == 0
    assert sync_table(_audit_df(spark, 12), sink,
                      fmt="parquet").rows_synced == 2


def test_csv_empty_string_round_trip_and_repair_converges(spark, tmp_path):
    """CSV sinks must distinguish '' from NULL (ADVICE r04): by default
    Spark writes both identically and reads both as NULL, so a source row
    with an empty string always checksum-diverged and --verify --repair
    could never converge. With the \\N/quoted-empty sentinels, both values
    round-trip and a repaired sink verifies."""
    from cdc_audit_spark.sync import repair_sink, verify_sink

    sch = "k long, note string, audit_event string, audit_pk long"
    df = spark.createDataFrame(
        [(1, "", "insert", 1), (2, None, "insert", 2), (3, "x", "insert", 3)],
        sch,
    )
    sink = str(tmp_path / "t.csv")
    sync_table(df, sink, fmt="csv")

    back = read_sink(spark, sink, fmt="csv", schema=df.schema)
    got = {r["k"]: r["note"] for r in back.collect()}
    assert got == {1: "", 2: None, 3: "x"}
    assert verify_sink(df, sink, fmt="csv")

    # repair converges in one pass even with ''-bearing rows
    n = repair_sink(df, sink, fmt="csv")
    assert n == 3
    assert verify_sink(df, sink, fmt="csv")


def test_table_checksum_injective(spark):
    """The canonical row form is injective (ADVICE r04): separator
    injection ('a|b' vs 'a','b') and the NULL sentinel ('\\x00' vs NULL)
    must produce DIFFERENT checksums — a bare join let distinct rows
    collide, so a corrupted sink could checksum-match its source."""
    from cdc_audit_spark.sync import table_checksum

    sch = "a string, b string"

    def ck(rows):
        return table_checksum(spark.createDataFrame(rows, sch)).first()["checksum"]

    assert ck([("a|b", "c")]) != ck([("a", "b|c")])
    assert ck([("a|", "b")]) != ck([("a", "|b")])
    assert ck([("\x00", "x")]) != ck([(None, "x")])
    assert ck([("", "x")]) != ck([(None, "x")])
    # and identical content still matches regardless of row order
    assert ck([("a", "b"), ("c", "d")]) == ck([("c", "d"), ("a", "b")])


def test_sync_many_aggregates_failures(spark, tmp_path):
    """A failing table must not take the batch down silently or solo
    (VERDICT r04 item 6): every other table completes (keeping its
    watermark), and the raised SyncManyError names EVERY failed table with
    its exception plus the completed results."""
    import pytest

    from cdc_audit_spark.schema import SchemaDriftError
    from cdc_audit_spark.sync import SyncManyError, sync_many

    good = _audit_df(spark, 10)
    # drifted table: sink pre-seeded with an extra column so its second
    # sync raises SchemaDriftError deterministically
    drift_sink = str(tmp_path / "drift")
    sync_table(good.withColumn("extra", F.lit(1)), drift_sink, fmt="parquet")

    jobs = {
        "ok1": (good, str(tmp_path / "ok1")),
        "bad": (good, drift_sink),
        "ok2": (_audit_df(spark, 20), str(tmp_path / "ok2")),
    }
    with pytest.raises(SyncManyError) as ei:
        sync_many(jobs, fmt="parquet")
    err = ei.value
    assert set(err.errors) == {"bad"}
    assert isinstance(err.errors["bad"], SchemaDriftError)
    assert "bad" in str(err) and "SchemaDriftError" in str(err)
    # the healthy tables completed and kept their watermarks
    assert err.results["ok1"].rows_synced == 10
    assert err.results["ok2"].rows_synced == 20
    assert read_sink(spark, str(tmp_path / "ok2"), fmt="parquet").count() == 20


def test_sync_many_table_timeout_cancels_stuck_table(spark, tmp_path):
    """table_timeout bounds one stuck table's blast radius: its job group
    is cancelled and reported as a TimeoutError while the healthy tables
    complete."""
    import time

    import pytest

    from pyspark.sql import functions as F

    from cdc_audit_spark.sync import SyncManyError, sync_many

    @F.udf("long")
    def slow(x):
        time.sleep(30)
        return x

    stuck = _audit_df(spark, 5).withColumn("audit_pk", slow(F.col("audit_pk")))
    jobs = {
        "stuck": (stuck, str(tmp_path / "stuck")),
        "fast": (_audit_df(spark, 10), str(tmp_path / "fast")),
    }
    t0 = time.monotonic()
    with pytest.raises(SyncManyError) as ei:
        sync_many(jobs, fmt="parquet", table_timeout=5)
    assert time.monotonic() - t0 < 25  # did not wait out the 30s sleep
    err = ei.value
    assert isinstance(err.errors["stuck"], TimeoutError)
    assert err.results["fast"].rows_synced == 10


def test_sync_many_table_timeout_requires_pinned_threads(
        spark, tmp_path, monkeypatch):
    """table_timeout relies on thread-local job groups; legacy non-pinned
    mode makes setJobGroup process-global, so a timeout cancellation could
    kill sibling tables' jobs — refuse loudly instead."""
    import pytest

    from cdc_audit_spark.sync import sync_many

    monkeypatch.setenv("PYSPARK_PIN_THREAD", "false")
    df = spark.range(3).selectExpr("id + 1 as audit_pk")
    with pytest.raises(RuntimeError, match="pinned-thread"):
        sync_many({"t": (df, str(tmp_path / "t.csv"))}, table_timeout=5)
    # without a timeout the watchdog is off: no job groups, no hazard
    out = sync_many({"t": (df, str(tmp_path / "t.csv"))})
    assert out["t"].rows_synced == 3
