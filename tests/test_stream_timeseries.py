"""Streaming subsequence search: the accumulated matches must equal the
batch kernel over the full series, each window emitted exactly once, with
loud refusal of out-of-order arrivals."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cdc_audit_spark.operators.timeseries import znorm_distances
from cdc_audit_spark.sinks.manifest import ManifestTable
from cdc_audit_spark.streaming.stream_timeseries import (
    apply_ts_epoch,
    maybe_fold_tails,
    stream_subsequence_sync,
)

QUERY = [math.sin(i / 2.0) for i in range(8)]
SCH = "user_id long, ts timestamp, event_id long, value double"


def _events(spark, sf_dir):
    return (spark.read.parquet(f"{sf_dir}/events.parquet")
            .select("user_id", "ts", "event_id", "value"))


def _batch_truth(spark, df):
    return {
        (r["user_id"], r["ts"], r["event_id"]): r["dist2_micro"]
        for r in znorm_distances(
            df, "user_id", "ts", "event_id", "value", QUERY).collect()
    }


def _tables(spark, tmp_path):
    return (ManifestTable(spark, str(tmp_path / "tails")),
            ManifestTable(spark, str(tmp_path / "matches")))


def _split_by_time(df, n):
    """n contiguous per-key time slices via ntile over the event order."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sliced = df.withColumn("__slice", F.ntile(n).over(w))
    return [sliced.filter(F.col("__slice") == i + 1).drop("__slice")
            for i in range(n)]


def test_ts_epochs_match_batch_kernel(spark, sf_dir, tmp_path):
    """Three ordered epochs over the fixture series: the matches table
    accumulates exactly the batch kernel's windows, no dupes, none lost
    at batch boundaries (the tail hand-off)."""
    ev = _events(spark, sf_dir).filter(F.col("user_id") < 30)
    tails, matches = _tables(spark, tmp_path)
    for epoch, b in enumerate(_split_by_time(ev, 3)):
        apply_ts_epoch(tails, matches, b, epoch, "run0",
                       "user_id", "ts", "event_id", "value", QUERY)
    got = {
        (r["user_id"], r["ts"], r["event_id"]): r["dist2_micro"]
        for r in matches.read().collect()
    }
    want = _batch_truth(spark, ev)
    assert got == want
    assert len(got) == len(matches.read().collect())  # no duplicate rows


def test_ts_epoch_replay_and_crash_window(spark, sf_dir, tmp_path):
    """Replays converge: full-commit replay is a no-op; a crash between
    the matches commit and the tails commit replays to the same state."""
    ev = _events(spark, sf_dir).filter(F.col("user_id") < 12)
    b0, b1 = _split_by_time(ev, 2)
    tails, matches = _tables(spark, tmp_path)
    apply_ts_epoch(tails, matches, b0, 0, "run0",
                   "user_id", "ts", "event_id", "value", QUERY)
    vers = (tails.current_version(), matches.current_version())
    apply_ts_epoch(tails, matches, b0, 0, "run0",
                   "user_id", "ts", "event_id", "value", QUERY)
    assert (tails.current_version(), matches.current_version()) == vers

    orig = tails.commit_prepared
    tails.commit_prepared = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("simulated crash"))
    with pytest.raises(RuntimeError, match="simulated crash"):
        apply_ts_epoch(tails, matches, b1, 1, "run0",
                       "user_id", "ts", "event_id", "value", QUERY)
    assert matches.epoch_applied(1, "run0")
    assert not tails.epoch_applied(1, "run0")
    tails.commit_prepared = orig
    apply_ts_epoch(tails, matches, b1, 1, "run0",
                   "user_id", "ts", "event_id", "value", QUERY)
    got = {
        (r["user_id"], r["ts"], r["event_id"]): r["dist2_micro"]
        for r in matches.read().collect()
    }
    assert got == _batch_truth(spark, ev)


def test_ts_out_of_order_refused(spark, sf_dir, tmp_path):
    """A batch delivering points at or before a key's scored tail must
    fail loudly, and the guard names the remedy."""
    ev = _events(spark, sf_dir).filter(F.col("user_id") < 12)
    b0, b1 = _split_by_time(ev, 2)
    tails, matches = _tables(spark, tmp_path)
    apply_ts_epoch(tails, matches, b1, 0, "run0",
                   "user_id", "ts", "event_id", "value", QUERY)
    with pytest.raises(ValueError, match="nondecreasing across batches"):
        apply_ts_epoch(tails, matches, b0, 1, "run0",
                       "user_id", "ts", "event_id", "value", QUERY)
    # the refusal runs in the epoch's parallel wave (_epoch_wave), so the
    # commit data-writes may already exist as files — but the abort must
    # claim NOTHING and abandon every prepared dir (no orphans)
    import os

    assert not matches.epoch_applied(1, "run0")
    assert not tails.epoch_applied(1, "run0")
    for t in (tails, matches):
        claimed = set(t.manifest(t.current_version())["dirs"])
        on_disk = {os.path.join("data", d)
                   for d in os.listdir(os.path.join(t.path, "data"))}
        assert on_disk == claimed


def test_ts_fold_keeps_pruned_reads_correct(spark, sf_dir, tmp_path):
    """After the keep-newest fold, epochs keep producing the batch truth
    and the tails read prunes to the touched keys' dirs."""
    ev = _events(spark, sf_dir).filter(F.col("user_id") < 40)
    slices = _split_by_time(ev, 4)
    tails, matches = _tables(spark, tmp_path)
    for epoch, b in enumerate(slices[:3]):
        apply_ts_epoch(tails, matches, b, epoch, "run0",
                       "user_id", "ts", "event_id", "value", QUERY)
    assert maybe_fold_tails(tails, "user_id", max_dirs=1, n_dirs=4)
    n_dirs = len(tails.manifest(tails.current_version())["dirs"])
    assert n_dirs >= 4
    one_key = slices[3].filter(F.col("user_id") == 3)
    if one_key.count():
        pruned = tails.dirs_pruned({"user_id": (3, 3)})
        assert 0 < len(pruned) < n_dirs
    apply_ts_epoch(tails, matches, slices[3], 3, "run0",
                   "user_id", "ts", "event_id", "value", QUERY)
    got = {
        (r["user_id"], r["ts"], r["event_id"]): r["dist2_micro"]
        for r in matches.read().collect()
    }
    assert got == _batch_truth(spark, ev)


def test_stream_subsequence_sync_end_to_end(spark, sf_dir, tmp_path):
    """foreachBatch drain over time-sliced parquet files equals the batch
    kernel, with the epsilon threshold applied."""
    ev = _events(spark, sf_dir).filter(F.col("user_id") < 25)
    src = str(tmp_path / "src")
    for b in _split_by_time(ev, 3):
        b.coalesce(1).write.mode("append").parquet(src)
    # NOTE: file order != time order is exactly what the order guard
    # refuses; write slices as one file each and feed them in sequence
    # is not guaranteed by the source, so use a threshold-free run over
    # per-slice dirs read in one availableNow pass (single batch) plus a
    # second incremental file to exercise the hand-off.
    import shutil

    shutil.rmtree(src)
    b01 = _split_by_time(ev, 3)
    b01[0].unionByName(b01[1]).coalesce(1).write.mode("append").parquet(src)
    q = stream_subsequence_sync(
        spark, src, SCH,
        str(tmp_path / "matches"), str(tmp_path / "tails"),
        str(tmp_path / "ckpt"),
        "user_id", "ts", "event_id", "value", QUERY,
        max_dist2_micro=8_000_000)
    q.awaitTermination(120)
    b01[2].coalesce(1).write.mode("append").parquet(src)
    q2 = stream_subsequence_sync(
        spark, src, SCH,
        str(tmp_path / "matches"), str(tmp_path / "tails"),
        str(tmp_path / "ckpt"),
        "user_id", "ts", "event_id", "value", QUERY,
        max_dist2_micro=8_000_000)
    q2.awaitTermination(120)
    matches = ManifestTable(spark, str(tmp_path / "matches"))
    got = {
        (r["user_id"], r["ts"], r["event_id"]): r["dist2_micro"]
        for r in matches.read().collect()
    }
    want = {k: v for k, v in _batch_truth(spark, ev).items()
            if v <= 8_000_000}
    assert got == want


SCH_LONG = "user_id long, ts long, event_id long, value double"


def _late_fixture(spark):
    """Two 60-point series delivered out of order WITHIN a known delay
    bound: late points {13,17} slip from delivery 0 to 1, {33} from 1 to
    2, and a far-future sentinel (its single point completes no window)
    advances the watermark so every real window releases."""
    import math as _m

    rows = [(k, t, t, _m.sin(t / 3.0) + k) for k in (1, 2)
            for t in range(60)]
    full = spark.createDataFrame(rows, SCH_LONG)
    late0, late1 = {13, 17}, {33}
    d0 = full.filter((F.col("ts") < 20) & ~F.col("ts").isin(*late0))
    d1 = full.filter(
        ((F.col("ts") >= 20) & (F.col("ts") < 40) & ~F.col("ts").isin(*late1))
        | F.col("ts").isin(*late0))
    d2 = full.filter((F.col("ts") >= 40) | F.col("ts").isin(*late1))
    flush = spark.createDataFrame([(99, 200, 200, 0.0)], SCH_LONG)
    return full, [d0, d1, d2, flush]


def test_ts_reorder_buffer_tolerates_late_data(spark, tmp_path):
    """The watermarked reorder stage: the very delivery order the plain
    matcher refuses streams to exactly the sorted-replay (batch-kernel)
    matches; a point later than the delay still refuses loudly; replays
    are no-ops."""
    from cdc_audit_spark.streaming.stream_timeseries import (
        apply_ts_epoch_reordered,
    )

    full, deliveries = _late_fixture(spark)
    args = ("user_id", "ts", "event_id", "value", QUERY)

    # the plain matcher refuses this delivery order
    tails_p, matches_p = _tables(spark, tmp_path)
    apply_ts_epoch(tails_p, matches_p, deliveries[0], 0, "plain", *args)
    with pytest.raises(ValueError, match="nondecreasing across batches"):
        apply_ts_epoch(tails_p, matches_p, deliveries[1], 1, "plain", *args)

    tails = ManifestTable(spark, str(tmp_path / "r_tails"))
    matches = ManifestTable(spark, str(tmp_path / "r_matches"))
    buffer = ManifestTable(spark, str(tmp_path / "r_buffer"))
    for epoch, d in enumerate(deliveries):
        apply_ts_epoch_reordered(
            tails, matches, buffer, d, epoch, "run0", *args, delay=10)
    got = {(r["user_id"], r["ts"], r["event_id"]): r["dist2_micro"]
           for r in matches.read().collect()}
    assert got == _batch_truth(spark, full)  # sentinel completes nothing

    # replay of the last epoch is a no-op across all three tables
    vers = (tails.current_version(), matches.current_version(),
            buffer.current_version())
    apply_ts_epoch_reordered(
        tails, matches, buffer, deliveries[3], 3, "run0", *args, delay=10)
    assert (tails.current_version(), matches.current_version(),
            buffer.current_version()) == vers

    # beyond-the-delay point: refused loudly, never spliced or dropped
    too_late = spark.createDataFrame([(1, 60, 60, 0.5)], SCH_LONG)
    with pytest.raises(ValueError, match="reorder delay"):
        apply_ts_epoch_reordered(
            tails, matches, buffer, too_late, 4, "run0", *args, delay=10)


def test_ts_reorder_stream_end_to_end(spark, tmp_path):
    """The foreachBatch drain with reorder_delay set: a perturbed
    parquet file sequence (one file per trigger) streams to the batch
    truth."""
    from cdc_audit_spark.streaming.stream_timeseries import (
        stream_subsequence_sync,
    )

    full, deliveries = _late_fixture(spark)
    src = str(tmp_path / "src")
    for d in deliveries:
        d.coalesce(1).write.mode("append").parquet(src)
    q = stream_subsequence_sync(
        spark, src, SCH_LONG,
        str(tmp_path / "matches"), str(tmp_path / "tails"),
        str(tmp_path / "ckpt"),
        "user_id", "ts", "event_id", "value", QUERY,
        reorder_delay=10, buffer_path=str(tmp_path / "buffer"),
        max_files_per_trigger=1)
    q.awaitTermination(180)
    matches = ManifestTable(spark, str(tmp_path / "matches"))
    got = {(r["user_id"], r["ts"], r["event_id"]): r["dist2_micro"]
           for r in matches.read().collect()}
    assert got == _batch_truth(spark, full)


def test_ts_reorder_buffer_fold_preserves_watermark(spark, tmp_path):
    """The buffer fold physically drops released rows, carries the
    watermark forward, and later epochs keep producing the truth."""
    from cdc_audit_spark.streaming.stream_timeseries import (
        apply_ts_epoch_reordered,
        maybe_fold_buffer,
    )
    import math as _m

    rows = [(1, t, t, _m.sin(t / 3.0)) for t in range(40)]
    full = spark.createDataFrame(rows, SCH_LONG)
    tails = ManifestTable(spark, str(tmp_path / "tails"))
    matches = ManifestTable(spark, str(tmp_path / "matches"))
    buffer = ManifestTable(spark, str(tmp_path / "buffer"))
    args = ("user_id", "ts", "event_id", "value", QUERY)
    for epoch in range(4):
        d = full.filter((F.col("ts") >= epoch * 10)
                        & (F.col("ts") < (epoch + 1) * 10))
        apply_ts_epoch_reordered(
            tails, matches, buffer, d, epoch, "run0", *args, delay=5)
    assert maybe_fold_buffer(buffer, "ts", max_dirs=1, n_dirs=4)
    # released rows are physically gone; the watermark survived the fold
    assert buffer.read().filter("ts <= 34").count() == 0
    from cdc_audit_spark.streaming.stream_timeseries import _wm_at

    assert _wm_at(buffer, buffer.current_version()) == 34
    flush = spark.createDataFrame([(99, 200, 200, 0.0)], SCH_LONG)
    apply_ts_epoch_reordered(
        tails, matches, buffer, flush, 4, "run0", *args, delay=5)
    got = {(r["user_id"], r["ts"], r["event_id"]): r["dist2_micro"]
           for r in matches.read().collect()}
    assert got == _batch_truth(spark, full)


def test_ts_reorder_crash_window_buffer_half(spark, tmp_path):
    """A crash after the inner matcher commits but before the buffer
    append must replay exactly-once: the released band recomputes
    identically from the pinned pre-epoch buffer, the inner halves skip
    on their epoch guards, and the buffer commit lands on the retry."""
    from cdc_audit_spark.streaming.stream_timeseries import (
        apply_ts_epoch_reordered,
    )

    full, deliveries = _late_fixture(spark)
    args = ("user_id", "ts", "event_id", "value", QUERY)
    tails = ManifestTable(spark, str(tmp_path / "tails"))
    matches = ManifestTable(spark, str(tmp_path / "matches"))
    buffer = ManifestTable(spark, str(tmp_path / "buffer"))
    apply_ts_epoch_reordered(
        tails, matches, buffer, deliveries[0], 0, "run0", *args, delay=10)

    orig = buffer.commit_prepared
    buffer.commit_prepared = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("simulated crash"))
    with pytest.raises(RuntimeError, match="simulated crash"):
        apply_ts_epoch_reordered(
            tails, matches, buffer, deliveries[1], 1, "run0", *args,
            delay=10)
    assert matches.epoch_applied(1, "run0")
    assert not buffer.epoch_applied(1, "run0")
    buffer.commit_prepared = orig
    m_ver = matches.current_version()
    apply_ts_epoch_reordered(
        tails, matches, buffer, deliveries[1], 1, "run0", *args, delay=10)
    assert matches.current_version() == m_ver  # inner halves replayed as no-ops
    assert buffer.epoch_applied(1, "run0")

    for epoch, d in enumerate(deliveries[2:], start=2):
        apply_ts_epoch_reordered(
            tails, matches, buffer, d, epoch, "run0", *args, delay=10)
    got = {(r["user_id"], r["ts"], r["event_id"]): r["dist2_micro"]
           for r in matches.read().collect()}
    assert got == _batch_truth(spark, full)


def test_ts_reorder_random_deliveries_match_truth(spark, tmp_path):
    """Property, seeded-random shuffles: any delivery order in which
    every point lands within the delay of the running event-time maximum
    must stream to exactly the batch-kernel truth."""
    import math as _m
    import random

    from cdc_audit_spark.streaming.stream_timeseries import (
        apply_ts_epoch_reordered,
    )

    rng = random.Random(31)
    rows = [(k, t, t, _m.sin(t / 3.0) + 0.3 * k) for k in (1, 2)
            for t in range(48)]
    full = spark.createDataFrame(rows, SCH_LONG)
    args = ("user_id", "ts", "event_id", "value", QUERY)
    want = _batch_truth(spark, full)
    for trial in range(2):
        # deliver in ts-sorted order, each point jittered back by < delay
        delay = 8
        jittered = sorted(rows, key=lambda r: r[1] + rng.uniform(0, delay - 1))
        n_b = rng.randint(3, 5)
        cuts = sorted(rng.sample(range(1, len(jittered)), n_b - 1))
        batches = [jittered[a:b] for a, b in
                   zip([0] + cuts, cuts + [len(jittered)])]
        tails = ManifestTable(spark, str(tmp_path / f"t{trial}_tails"))
        matches = ManifestTable(spark, str(tmp_path / f"t{trial}_matches"))
        buffer = ManifestTable(spark, str(tmp_path / f"t{trial}_buffer"))
        for epoch, b in enumerate(batches):
            apply_ts_epoch_reordered(
                tails, matches, buffer,
                spark.createDataFrame(b, SCH_LONG), epoch, "rnd",
                *args, delay=delay)
        flush = spark.createDataFrame([(99, 500, 500, 0.0)], SCH_LONG)
        apply_ts_epoch_reordered(
            tails, matches, buffer, flush, len(batches), "rnd",
            *args, delay=delay)
        got = {(r["user_id"], r["ts"], r["event_id"]): r["dist2_micro"]
               for r in matches.read().collect()}
        assert got == want, trial


def _skewed_fixture(spark, delay=8):
    """Two in-order series whose clocks are skewed FAR beyond the delay
    (key 2 runs 5000 ticks ahead), interleaved per delivery, each key
    independently jittered within the delay. The global watermark refuses
    this (key 1 lags the stream's high-water mark by 5000); the per-key
    rule must stream it to the batch truth. The flush batch advances each
    key's OWN clock (a far-future point per key, part of the truth)."""
    import math as _m
    import random

    rng = random.Random(7)
    rows = [(1, t, t, _m.sin(t / 3.0)) for t in range(48)]
    rows += [(2, 5000 + t, t, _m.cos(t / 3.0)) for t in range(48)]
    # the flush points release every real window but stay pending
    # themselves (each is within its own key's delay of the frontier) —
    # the documented per-key semantics — so the truth excludes them and
    # the windows they would someday complete
    flush_rows = [(1, 9000, 900, 0.0), (2, 14000, 901, 0.0)]
    full = spark.createDataFrame(rows, SCH_LONG)

    def jittered_slices(key_rows):
        order = sorted(key_rows,
                       key=lambda r: r[1] + rng.uniform(0, delay - 1))
        n = len(order) // 3
        return order[:n], order[n:2 * n], order[2 * n:]

    s1, s2 = jittered_slices(rows[:48]), jittered_slices(rows[48:])
    deliveries = [spark.createDataFrame(list(a + b), SCH_LONG)
                  for a, b in zip(s1, s2)]
    deliveries.append(spark.createDataFrame(flush_rows, SCH_LONG))
    return full, deliveries


def test_ts_reorder_per_key_skewed_series(spark, tmp_path):
    """VERDICT r11: two series skewed beyond the delay, each in-order
    (modulo within-delay jitter), must stream green under the per-key
    watermark to exactly their sorted replays — while the global rule
    refuses the same delivery. Replays stay no-ops."""
    from cdc_audit_spark.streaming.stream_timeseries import (
        apply_ts_epoch_reordered,
    )

    full, deliveries = _skewed_fixture(spark)
    args = ("user_id", "ts", "event_id", "value", QUERY)

    # the global rule refuses the skew (key 1 trails key 2's clock)
    g_tails = ManifestTable(spark, str(tmp_path / "g_tails"))
    g_matches = ManifestTable(spark, str(tmp_path / "g_matches"))
    g_buffer = ManifestTable(spark, str(tmp_path / "g_buffer"))
    apply_ts_epoch_reordered(
        g_tails, g_matches, g_buffer, deliveries[0], 0, "g", *args,
        delay=8)
    with pytest.raises(ValueError, match="reorder delay"):
        apply_ts_epoch_reordered(
            g_tails, g_matches, g_buffer, deliveries[1], 1, "g", *args,
            delay=8)

    tails = ManifestTable(spark, str(tmp_path / "k_tails"))
    matches = ManifestTable(spark, str(tmp_path / "k_matches"))
    buffer = ManifestTable(spark, str(tmp_path / "k_buffer"))
    for epoch, d in enumerate(deliveries):
        apply_ts_epoch_reordered(
            tails, matches, buffer, d, epoch, "run0", *args, delay=8,
            per_key=True)
    got = {(r["user_id"], r["ts"], r["event_id"]): r["dist2_micro"]
           for r in matches.read().collect()}
    assert got == _batch_truth(spark, full)

    vers = (tails.current_version(), matches.current_version(),
            buffer.current_version())
    apply_ts_epoch_reordered(
        tails, matches, buffer, deliveries[-1], len(deliveries) - 1,
        "run0", *args, delay=8, per_key=True)
    assert (tails.current_version(), matches.current_version(),
            buffer.current_version()) == vers


def test_ts_reorder_per_key_within_key_lateness_refused(spark, tmp_path):
    """Beyond-delay lateness WITHIN a key still refuses loudly under the
    per-key rule — the option relaxes cross-key skew, not the per-series
    reorder bound."""
    import math as _m

    from cdc_audit_spark.streaming.stream_timeseries import (
        apply_ts_epoch_reordered,
    )

    tails = ManifestTable(spark, str(tmp_path / "tails"))
    matches = ManifestTable(spark, str(tmp_path / "matches"))
    buffer = ManifestTable(spark, str(tmp_path / "buffer"))
    args = ("user_id", "ts", "event_id", "value", QUERY)
    d0 = spark.createDataFrame(
        [(1, t, t, _m.sin(t / 3.0)) for t in range(40)], SCH_LONG)
    apply_ts_epoch_reordered(
        tails, matches, buffer, d0, 0, "run0", *args, delay=8,
        per_key=True)
    late = spark.createDataFrame([(1, 20, 99, 0.5)], SCH_LONG)
    with pytest.raises(ValueError, match="within that series"):
        apply_ts_epoch_reordered(
            tails, matches, buffer, late, 1, "run0", *args, delay=8,
            per_key=True)


def test_ts_reorder_watermark_mode_mixing_refused(spark, tmp_path):
    """A buffer built in one watermark mode refuses the other — silent
    mode switches would re-release or mis-scope frontiers."""
    import math as _m

    from cdc_audit_spark.streaming.stream_timeseries import (
        apply_ts_epoch_reordered,
    )

    args = ("user_id", "ts", "event_id", "value", QUERY)
    d = spark.createDataFrame(
        [(1, t, t, _m.sin(t / 3.0)) for t in range(12)], SCH_LONG)
    g = (ManifestTable(spark, str(tmp_path / "gt")),
         ManifestTable(spark, str(tmp_path / "gm")),
         ManifestTable(spark, str(tmp_path / "gb")))
    apply_ts_epoch_reordered(*g, d, 0, "run0", *args, delay=8)
    with pytest.raises(ValueError, match="GLOBAL watermark"):
        apply_ts_epoch_reordered(*g, d, 1, "run0", *args, delay=8,
                                 per_key=True)
    k = (ManifestTable(spark, str(tmp_path / "kt")),
         ManifestTable(spark, str(tmp_path / "km")),
         ManifestTable(spark, str(tmp_path / "kb")))
    apply_ts_epoch_reordered(*k, d, 0, "run0", *args, delay=8,
                             per_key=True)
    with pytest.raises(ValueError, match="PER-KEY watermarks"):
        apply_ts_epoch_reordered(*k, d, 1, "run0", *args, delay=8)


def test_ts_reorder_per_key_fold_and_crash_replay(spark, tmp_path):
    """The keyed buffer fold physically drops each key's released rows
    without touching live ones, and a crash before the buffer commit
    replays exactly-once — both on the skewed fixture."""
    from cdc_audit_spark.streaming.stream_timeseries import (
        apply_ts_epoch_reordered,
        maybe_fold_buffer_keyed,
    )

    full, deliveries = _skewed_fixture(spark)
    args = ("user_id", "ts", "event_id", "value", QUERY)
    tails = ManifestTable(spark, str(tmp_path / "tails"))
    matches = ManifestTable(spark, str(tmp_path / "matches"))
    buffer = ManifestTable(spark, str(tmp_path / "buffer"))
    apply_ts_epoch_reordered(
        tails, matches, buffer, deliveries[0], 0, "run0", *args, delay=8,
        per_key=True)

    orig = buffer.commit_prepared
    buffer.commit_prepared = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("simulated crash"))
    with pytest.raises(RuntimeError, match="simulated crash"):
        apply_ts_epoch_reordered(
            tails, matches, buffer, deliveries[1], 1, "run0", *args,
            delay=8, per_key=True)
    assert matches.epoch_applied(1, "run0")
    assert not buffer.epoch_applied(1, "run0")
    buffer.commit_prepared = orig
    m_ver = matches.current_version()
    apply_ts_epoch_reordered(
        tails, matches, buffer, deliveries[1], 1, "run0", *args, delay=8,
        per_key=True)
    assert matches.current_version() == m_ver

    folded = maybe_fold_buffer_keyed(buffer, tails, "user_id", "ts", 8,
                                     max_dirs=1, n_dirs=4)
    assert folded is not None
    # every surviving buffered row is live for ITS key (> that key's
    # frontier); both keys' live rows survived
    surv = buffer.read()
    assert surv.count() > 0
    for epoch, d in enumerate(deliveries[2:], start=2):
        apply_ts_epoch_reordered(
            tails, matches, buffer, d, epoch, "run0", *args, delay=8,
            per_key=True)
    got = {(r["user_id"], r["ts"], r["event_id"]): r["dist2_micro"]
           for r in matches.read().collect()}
    assert got == _batch_truth(spark, full)


def test_ts_reorder_per_key_random_deliveries_match_truth(spark, tmp_path):
    """Property, seeded-random: any delivery in which every point lands
    within the delay of ITS KEY's running event-time maximum — keys
    skewed arbitrarily far apart — must stream to exactly the batch
    truth under the per-key rule."""
    import math as _m
    import random

    from cdc_audit_spark.streaming.stream_timeseries import (
        apply_ts_epoch_reordered,
    )

    rng = random.Random(59)
    skew = {1: 0, 2: 10_000, 3: 40_000}  # far beyond any delay
    rows = [(k, skew[k] + t, t, _m.sin(t / 3.0) + 0.3 * k)
            for k in skew for t in range(36)]
    full = spark.createDataFrame(rows, SCH_LONG)
    args = ("user_id", "ts", "event_id", "value", QUERY)
    want = _batch_truth(spark, full)
    delay = 8
    for trial in range(2):
        # per-key jitter: sort each key's points by ts + U(0, delay-1),
        # then interleave the keys' sequences at random batch cuts
        per_key = {k: sorted((r for r in rows if r[0] == k),
                             key=lambda r: r[1] + rng.uniform(0, delay - 1))
                   for k in skew}
        merged = []
        idxs = {k: 0 for k in skew}
        while any(idxs[k] < len(per_key[k]) for k in skew):
            k = rng.choice([k for k in skew if idxs[k] < len(per_key[k])])
            merged.append(per_key[k][idxs[k]])
            idxs[k] += 1
        n_b = rng.randint(3, 5)
        cuts = sorted(rng.sample(range(1, len(merged)), n_b - 1))
        batches = [merged[a:b] for a, b in
                   zip([0] + cuts, cuts + [len(merged)])]
        tails = ManifestTable(spark, str(tmp_path / f"t{trial}_tails"))
        matches = ManifestTable(spark, str(tmp_path / f"t{trial}_matches"))
        buffer = ManifestTable(spark, str(tmp_path / f"t{trial}_buffer"))
        for epoch, b in enumerate(batches):
            apply_ts_epoch_reordered(
                tails, matches, buffer,
                spark.createDataFrame(b, SCH_LONG), epoch, "rnd",
                *args, delay=delay, per_key=True)
        flush = spark.createDataFrame(
            [(k, skew[k] + 5000, 900 + k, 0.0) for k in skew], SCH_LONG)
        apply_ts_epoch_reordered(
            tails, matches, buffer, flush, len(batches), "rnd",
            *args, delay=delay, per_key=True)
        got = {(r["user_id"], r["ts"], r["event_id"]): r["dist2_micro"]
               for r in matches.read().collect()}
        assert got == want, trial


def test_ts_reorder_flush_drains_both_modes(spark, tmp_path):
    """flush_ts_reorder scores every still-buffered point without a
    sentinel, in both watermark modes: matches equal the batch truth of
    exactly what was delivered, a replayed flush is a no-op, the buffer
    is empty, and a post-flush late point still refuses loudly."""
    import math as _m

    from cdc_audit_spark.streaming.stream_timeseries import (
        apply_ts_epoch_reordered,
        flush_ts_reorder,
    )

    args = ("user_id", "ts", "event_id", "value", QUERY)

    # -- global mode: one series, last band still inside the delay
    rows = [(1, t, t, _m.sin(t / 3.0)) for t in range(40)]
    full = spark.createDataFrame(rows, SCH_LONG)
    g = (ManifestTable(spark, str(tmp_path / "gt")),
         ManifestTable(spark, str(tmp_path / "gm")),
         ManifestTable(spark, str(tmp_path / "gb")))
    tails, matches, buffer = g
    for e in range(2):
        d = full.filter((F.col("ts") >= e * 20) & (F.col("ts") < (e + 1) * 20))
        apply_ts_epoch_reordered(tails, matches, buffer, d, e, "run0",
                                 *args, delay=8)
    before = matches.read().count()
    flush_ts_reorder(tails, matches, buffer, 2, "run0", *args)
    got = {(r["user_id"], r["ts"], r["event_id"]): r["dist2_micro"]
           for r in matches.read().collect()}
    assert got == _batch_truth(spark, full)
    assert matches.read().count() > before  # the flush released windows
    assert buffer.read().count() == 0
    vers = (tails.current_version(), matches.current_version(),
            buffer.current_version())
    flush_ts_reorder(tails, matches, buffer, 2, "run0", *args)  # replay
    assert (tails.current_version(), matches.current_version(),
            buffer.current_version()) == vers
    late = spark.createDataFrame([(1, 30, 99, 0.5)], SCH_LONG)
    with pytest.raises(ValueError, match="reorder delay"):
        apply_ts_epoch_reordered(tails, matches, buffer, late, 3, "run0",
                                 *args, delay=8)

    # -- per-key mode: the skewed fixture, minus its sentinel batch
    full_k, deliveries = _skewed_fixture(spark)
    k = (ManifestTable(spark, str(tmp_path / "kt")),
         ManifestTable(spark, str(tmp_path / "km")),
         ManifestTable(spark, str(tmp_path / "kb")))
    tails, matches, buffer = k
    for e, d in enumerate(deliveries[:-1]):  # no sentinels
        apply_ts_epoch_reordered(tails, matches, buffer, d, e, "run0",
                                 *args, delay=8, per_key=True)
    flush_ts_reorder(tails, matches, buffer, len(deliveries) - 1, "run0",
                     *args, per_key=True)
    got = {(r["user_id"], r["ts"], r["event_id"]): r["dist2_micro"]
           for r in matches.read().collect()}
    assert got == _batch_truth(spark, full_k)
    assert buffer.read().count() == 0
    # flushed points are scored history now: re-delivery refuses AT
    # ENTRY (the scored-tail bound — it must not sit buffered until the
    # key's clock advances and the inner order guard kills the drain)
    redeliver = spark.createDataFrame([(1, 47, 47, 0.0)], SCH_LONG)
    with pytest.raises(ValueError, match="watermark or scored tail"):
        apply_ts_epoch_reordered(tails, matches, buffer, redeliver, 99,
                                 "run0", *args, delay=8, per_key=True)


def test_ts_reorder_per_key_stream_end_to_end(spark, tmp_path):
    """The foreachBatch drain with per_key_watermark=True: two series
    skewed far beyond the delay, delivered a file behind each other,
    stream to the batch truth once a per-key flush file lands."""
    import math as _m

    from cdc_audit_spark.streaming.stream_timeseries import (
        stream_subsequence_sync,
    )

    rows = [(1, t, t, _m.sin(t / 3.0)) for t in range(40)]
    rows += [(2, 7000 + t, t, _m.cos(t / 3.0)) for t in range(40)]
    full = spark.createDataFrame(rows, SCH_LONG)
    src = str(tmp_path / "src")
    batches = [
        full.filter("user_id = 1 and ts < 20"),
        full.filter("(user_id = 1 and ts >= 20) or "
                    "(user_id = 2 and ts < 7020)"),
        full.filter("user_id = 2 and ts >= 7020"),
        spark.createDataFrame([(1, 9000, 900, 0.0), (2, 16000, 901, 0.0)],
                              SCH_LONG),
    ]
    for b in batches:
        b.coalesce(1).write.mode("append").parquet(src)
    q = stream_subsequence_sync(
        spark, src, SCH_LONG,
        str(tmp_path / "matches"), str(tmp_path / "tails"),
        str(tmp_path / "ckpt"),
        "user_id", "ts", "event_id", "value", QUERY,
        reorder_delay=8, buffer_path=str(tmp_path / "buffer"),
        per_key_watermark=True, max_files_per_trigger=1)
    q.awaitTermination(180)
    matches = ManifestTable(spark, str(tmp_path / "matches"))
    got = {(r["user_id"], r["ts"], r["event_id"]): r["dist2_micro"]
           for r in matches.read().collect()}
    assert got == _batch_truth(spark, full)


def test_ts_reorder_wm_survives_generic_maintenance(spark, tmp_path):
    """The watermark/mode stamps are inherited manifest state: a generic
    out-of-band commit on the buffer (compact_small, add_constraint)
    between epochs can no longer bury them — mode mixing still refuses,
    the watermark still reads back (a beyond-delay point still refuses),
    and the newest manifest physically carries the stamp."""
    import math as _m

    from cdc_audit_spark.streaming.stream_timeseries import (
        apply_ts_epoch_reordered,
    )

    args = ("user_id", "ts", "event_id", "value", QUERY)
    full = spark.createDataFrame(
        [(1, t, t, _m.sin(t / 3.0)) for t in range(40)], SCH_LONG)

    # -- global mode
    tails = ManifestTable(spark, str(tmp_path / "gt"))
    matches = ManifestTable(spark, str(tmp_path / "gm"))
    buffer = ManifestTable(spark, str(tmp_path / "gb"))
    for e in range(2):
        d = full.filter((F.col("ts") >= e * 20) & (F.col("ts") < (e + 1) * 20))
        apply_ts_epoch_reordered(tails, matches, buffer, d, e, "run0",
                                 *args, delay=8)
    assert buffer.compact_small(min_group=1) is not None  # generic commit
    buffer.add_constraint("ts_nonnull", "ts IS NOT NULL")  # another one
    newest = buffer.manifest(buffer.current_version())
    assert "wm" in newest  # physically inherited, not buried
    with pytest.raises(ValueError, match="GLOBAL watermark"):
        apply_ts_epoch_reordered(tails, matches, buffer, full.limit(1), 2,
                                 "run0", *args, delay=8, per_key=True)
    late = spark.createDataFrame([(1, 5, 99, 0.5)], SCH_LONG)
    with pytest.raises(ValueError, match="reorder delay"):
        apply_ts_epoch_reordered(tails, matches, buffer, late, 2, "run0",
                                 *args, delay=8)

    # -- per-key mode
    kt = ManifestTable(spark, str(tmp_path / "kt"))
    km = ManifestTable(spark, str(tmp_path / "km"))
    kb = ManifestTable(spark, str(tmp_path / "kb"))
    apply_ts_epoch_reordered(kt, km, kb, full.filter("ts < 20"), 0,
                             "run0", *args, delay=8, per_key=True)
    assert kb.compact_small(min_group=1) is not None
    assert kb.manifest(kb.current_version()).get("wm_keyed") is True
    with pytest.raises(ValueError, match="PER-KEY watermarks"):
        apply_ts_epoch_reordered(kt, km, kb, full.limit(1), 1, "run0",
                                 *args, delay=8)


def test_ts_fold_interleaved_in_crash_window_replays_to_truth(spark,
                                                              tmp_path):
    """The half-landed-epoch story, both halves: the single-table tails
    fold is read-equivalent and an interleaved run of it inside the
    crash window (matches+tails landed, buffer didn't) still replays to
    the batch truth; the cross-table keyed buffer fold REFUSES in that
    window (it derives frontiers from post-epoch tails) and works again
    once the epoch completes."""
    from cdc_audit_spark.streaming.stream_timeseries import (
        apply_ts_epoch_reordered,
        maybe_fold_buffer_keyed,
        maybe_fold_tails,
    )

    full, deliveries = _skewed_fixture(spark)
    args = ("user_id", "ts", "event_id", "value", QUERY)
    tails = ManifestTable(spark, str(tmp_path / "tails"))
    matches = ManifestTable(spark, str(tmp_path / "matches"))
    buffer = ManifestTable(spark, str(tmp_path / "buffer"))
    apply_ts_epoch_reordered(
        tails, matches, buffer, deliveries[0], 0, "run0", *args, delay=8,
        per_key=True)

    orig = buffer.commit_prepared
    buffer.commit_prepared = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("simulated crash"))
    with pytest.raises(RuntimeError, match="simulated crash"):
        apply_ts_epoch_reordered(
            tails, matches, buffer, deliveries[1], 1, "run0", *args,
            delay=8, per_key=True)
    assert tails.epoch_applied(1, "run0")
    assert not buffer.epoch_applied(1, "run0")
    # cross-table maintenance refuses inside the window...
    with pytest.raises(RuntimeError, match="half-landed"):
        maybe_fold_buffer_keyed(buffer, tails, "user_id", "ts", 8,
                                max_dirs=0)
    # ...the single-table keep-newest fold is read-equivalent and may run
    assert maybe_fold_tails(tails, "user_id", max_dirs=1, n_dirs=4) \
        is not None
    buffer.commit_prepared = orig
    for epoch, d in enumerate(deliveries[1:], start=1):
        apply_ts_epoch_reordered(
            tails, matches, buffer, d, epoch, "run0", *args, delay=8,
            per_key=True)
    got = {(r["user_id"], r["ts"], r["event_id"]): r["dist2_micro"]
           for r in matches.read().collect()}
    assert got == _batch_truth(spark, full)
    # epoch complete -> the keyed fold is allowed again
    assert maybe_fold_buffer_keyed(buffer, tails, "user_id", "ts", 8,
                                   max_dirs=0) is not None


def test_ts_flush_refuses_half_landed_prior_epoch_but_replays_own(
        spark, tmp_path):
    """flush_ts_reorder refuses to drain on top of a PRIOR half-landed
    epoch (the buffer is missing that epoch's rows), yet its OWN
    half-landed replay completes — the applying-epoch exemption."""
    import math as _m

    from cdc_audit_spark.streaming.stream_timeseries import (
        apply_ts_epoch_reordered,
        flush_ts_reorder,
    )

    args = ("user_id", "ts", "event_id", "value", QUERY)
    rows = [(1, t, t, _m.sin(t / 3.0)) for t in range(40)]
    full = spark.createDataFrame(rows, SCH_LONG)
    tails = ManifestTable(spark, str(tmp_path / "t"))
    matches = ManifestTable(spark, str(tmp_path / "m"))
    buffer = ManifestTable(spark, str(tmp_path / "b"))
    apply_ts_epoch_reordered(tails, matches, buffer, full.filter("ts < 20"),
                             0, "run0", *args, delay=8, per_key=True)

    orig_append = buffer.commit_prepared
    buffer.commit_prepared = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("simulated crash"))
    with pytest.raises(RuntimeError, match="simulated crash"):
        apply_ts_epoch_reordered(
            tails, matches, buffer, full.filter("ts >= 20"), 1, "run0",
            *args, delay=8, per_key=True)
    buffer.commit_prepared = orig_append
    with pytest.raises(RuntimeError, match="half-landed"):
        flush_ts_reorder(tails, matches, buffer, 2, "run0", *args,
                         per_key=True)
    # redeliver epoch 1, then the flush proceeds
    apply_ts_epoch_reordered(tails, matches, buffer,
                             full.filter("ts >= 20"), 1, "run0", *args,
                             delay=8, per_key=True)

    # crash the flush's OWN buffer overwrite: matches/tails land with the
    # flush epoch's tag, buffer stays behind — its replay must complete
    orig_over = buffer.overwrite
    buffer.overwrite = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("simulated crash"))
    with pytest.raises(RuntimeError, match="simulated crash"):
        flush_ts_reorder(tails, matches, buffer, 2, "run0", *args,
                         per_key=True)
    assert matches.epoch_applied(2, "run0")
    assert not buffer.epoch_applied(2, "run0")
    buffer.overwrite = orig_over
    flush_ts_reorder(tails, matches, buffer, 2, "run0", *args,
                     per_key=True)
    got = {(r["user_id"], r["ts"], r["event_id"]): r["dist2_micro"]
           for r in matches.read().collect()}
    assert got == _batch_truth(spark, full)
    assert buffer.read().count() == 0


def test_ts_global_fold_interleaved_in_crash_window(spark, tmp_path):
    """Global-mode twin of the keyed interleaved-fold test: the
    single-table buffer fold (drops rows <= wm, carries wm forward) and
    the tails keep-newest fold are read-equivalent, so running BOTH
    inside the crash window (matches+tails landed, buffer didn't) must
    not change what the redelivered epoch computes — the stream still
    drains to the batch truth."""
    from cdc_audit_spark.streaming.stream_timeseries import (
        apply_ts_epoch_reordered,
        flush_ts_reorder,
        maybe_fold_buffer,
        maybe_fold_tails,
    )

    full, deliveries = _late_fixture(spark)
    args = ("user_id", "ts", "event_id", "value", QUERY)
    tails = ManifestTable(spark, str(tmp_path / "tails"))
    matches = ManifestTable(spark, str(tmp_path / "matches"))
    buffer = ManifestTable(spark, str(tmp_path / "buffer"))
    apply_ts_epoch_reordered(
        tails, matches, buffer, deliveries[0], 0, "run0", *args, delay=10)

    orig = buffer.commit_prepared
    buffer.commit_prepared = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("simulated crash"))
    with pytest.raises(RuntimeError, match="simulated crash"):
        apply_ts_epoch_reordered(
            tails, matches, buffer, deliveries[1], 1, "run0", *args,
            delay=10)
    assert tails.epoch_applied(1, "run0")
    assert not buffer.epoch_applied(1, "run0")
    # both single-table folds run inside the window (forced triggers)
    assert maybe_fold_buffer(buffer, "ts", max_dirs=0, n_dirs=2) is not None
    assert maybe_fold_tails(tails, "user_id", max_dirs=0, n_dirs=2) \
        is not None
    buffer.commit_prepared = orig
    for epoch, d in enumerate(deliveries[1:], start=1):
        apply_ts_epoch_reordered(
            tails, matches, buffer, d, epoch, "run0", *args, delay=10)
    flush_ts_reorder(tails, matches, buffer, len(deliveries), "run0",
                     *args)
    got = {(r["user_id"], r["ts"], r["event_id"]): r["dist2_micro"]
           for r in matches.read().collect()}
    assert got == _batch_truth(spark, full)
