import datetime as dt

from pyspark.sql import functions as F

from cdc_audit_spark.compact import compact_log, keep_last, keep_last_per_key
from cdc_audit_spark.sync import read_sink

TS = dt.datetime(2026, 1, 1)


def _log(spark):
    rows = [
        (1, 10.0, "insert", TS, 1),
        (2, 20.0, "insert", TS, 2),
        (1, 11.0, "update", TS, 3),
        (2, 20.0, "delete", TS, 4),
        (1, 12.0, "update", TS, 5),
    ]
    return spark.createDataFrame(
        rows, "k int, v double, audit_event string, audit_timestamp timestamp, audit_pk long"
    )


def test_keep_last_global(spark):
    # wipe keeps exactly the row with max audit_pk (sync:304)
    out = keep_last(_log(spark)).collect()
    assert len(out) == 1
    assert out[0]["audit_pk"] == 5


def test_keep_last_per_key(spark):
    out = {r["k"]: r for r in keep_last_per_key(_log(spark), ["k"]).collect()}
    assert out[1]["audit_pk"] == 5 and out[1]["v"] == 12.0
    assert out[2]["audit_pk"] == 4 and out[2]["audit_event"] == "delete"


def test_compact_log_rewrites_sink(spark, tmp_path):
    sink = str(tmp_path / "log.parquet")
    _log(spark).write.parquet(sink)
    kept = compact_log(spark.read.parquet(sink), sink, fmt="parquet")
    assert kept == 1
    back = read_sink(spark, sink, fmt="parquet")
    assert back.count() == 1
    assert back.first()["audit_pk"] == 5


def test_sync_after_compaction_emits_nothing_old(spark, tmp_path):
    from cdc_audit_spark.sync import sync_table

    sink = str(tmp_path / "s.parquet")
    log = _log(spark)
    sync_table(log, sink, fmt="parquet")
    compact_log(read_sink(spark, sink, fmt="parquet"), sink, fmt="parquet")
    # watermark state survives compaction → resync of same log adds nothing
    res = sync_table(log, sink, fmt="parquet")
    assert res.rows_synced == 0


def test_retention_compact_preserves_replay(spark, sf_dir):
    """Replaying the retention-compacted log must reconstruct the SAME final
    state as the full log, for any horizon — the correctness contract of
    log retention with per-key checkpoints."""
    from cdc_audit_spark.capture import apply_changes
    from cdc_audit_spark.compact import retention_compact
    from cdc_audit_spark.queries import customer_audit_log, customer_snapshots

    v0, v1 = customer_snapshots(spark, sf_dir)
    log = customer_audit_log(spark, sf_dir).cache()
    max_pk = log.agg(F.max("audit_pk")).first()[0]

    for horizon in (0, max_pk // 3, max_pk // 2, max_pk):
        compacted = retention_compact(log, horizon, ["c_custkey"])
        got = apply_changes(v0, compacted, ["c_custkey"])
        assert got.exceptAll(v1).count() == 0
        assert v1.exceptAll(got).count() == 0

    # rows at-or-before the horizon collapse to one per touched key
    h = max_pk // 2
    compacted = retention_compact(log, h, ["c_custkey"])
    pre = compacted.filter(F.col("audit_pk") <= h)
    assert pre.count() == pre.select("c_custkey").distinct().count()
    # post-horizon history is untouched
    assert (compacted.filter(F.col("audit_pk") > h).count()
            == log.filter(F.col("audit_pk") > h).count())
    log.unpersist()


def test_throttled_wipe_sqlite_batches_and_retains_max():
    # the reference's live-master wipe loop (sync:284-319): batched ranged
    # deletes + pause, exactly one (max audit_pk) row left standing
    import sqlite3

    from cdc_audit_spark.compact import throttled_wipe

    conn = sqlite3.connect(":memory:")
    conn.execute("CREATE TABLE audit_t (audit_pk INTEGER PRIMARY KEY, v TEXT)")
    conn.executemany(
        "INSERT INTO audit_t VALUES (?, ?)", [(i, f"r{i}") for i in range(1, 1006)]
    )
    conn.commit()

    pauses = []
    deleted = throttled_wipe(
        conn, "audit_t", batch_size=100, pause_s=0.5, sleep_fn=pauses.append
    )
    assert deleted == 1004
    rows = conn.execute("SELECT audit_pk FROM audit_t").fetchall()
    assert rows == [(1005,)]                       # only the max-pk row survives
    assert len(pauses) >= 10 and set(pauses) == {0.5}  # throttled between batches

    # idempotent on the wiped table
    assert throttled_wipe(conn, "audit_t", sleep_fn=pauses.append) == 0
