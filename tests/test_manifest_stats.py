"""Manifest-level statistics: metadata-only aggregates, equality
skipping (distinct-set / Bloom), stats backfill (analyze), and the
clustered OPTIMIZE rewrite.

The 100 TB rationale: at scale, ``COUNT(*)`` / min / max answered from
a handful of JSON manifests beats any scan by orders of magnitude, and
a probe that opens 4 of 16 dirs instead of all 16 is the difference
between a dashboard query and a cluster job. These are the public
Delta/Iceberg metadata patterns (numRecords per file, column stats,
OPTIMIZE ZORDER) re-expressed at manifest-dir granularity.
"""

import os

import pytest
from pyspark.sql import functions as F

from cdc_audit_spark.sinks.manifest import (
    ManifestTable,
    _bloom_positions,
    _set_may_contain,
)


def _chunk(spark, lo, hi, step=1):
    return spark.range(lo, hi, step).select(
        F.col("id").alias("k"),
        (F.col("id") * 37 % 1000).alias("v"),
        F.concat(F.lit("src"), (F.col("id") % 5).cast("string"))
        .alias("src"),
    )


# ------------------------------------------------ metadata-only reads


def test_row_count_is_metadata_only(spark, tmp_path):
    t = ManifestTable(spark, str(tmp_path / "t"))
    t.append(_chunk(spark, 0, 100))
    t.append(_chunk(spark, 100, 250))
    assert t.row_count() == 250
    assert t.row_count(version=1) == 100

    # the proof it never touches data: hide the data dir entirely —
    # a metadata-only answer still works, a scan would explode
    data = str(tmp_path / "t" / "data")
    os.rename(data, data + ".hidden")
    try:
        assert t.row_count() == 250
    finally:
        os.rename(data + ".hidden", data)


def test_stats_minmax_metadata_only_and_conservative(spark, tmp_path):
    t = ManifestTable(spark, str(tmp_path / "t"))
    t.append(_chunk(spark, 0, 100), pk_range_col="k", stats_cols=["v"])
    t.append(_chunk(spark, 100, 250), pk_range_col="k", stats_cols=["v"])
    # pk ranges answer the key column; stats answer v; src unrecorded
    assert t.stats_minmax("k") == (0, 249)
    lo, hi = t.stats_minmax("v")
    assert lo == 0 and hi <= 999
    assert t.stats_minmax("src") is None  # not derivable -> caller scans

    # a plain append still answers: numeric min/max now ride the footer
    # pass unconditionally (write-time, no Spark job)
    t.append(_chunk(spark, 250, 300))
    assert t.stats_minmax("k") == (0, 299)
    # a string column records no footer range (strings are excluded from
    # footer stats); one dir without it poisons the whole answer
    assert t.stats_minmax("src") is None
    # row counts are still recorded unconditionally (footer read)
    assert t.row_count() == 300


def test_describe_detail(spark, tmp_path):
    t = ManifestTable(spark, str(tmp_path / "t"))
    assert t.describe_detail()["rows"] == 0
    t.append(_chunk(spark, 0, 100))
    d = t.describe_detail()
    assert d["rows"] == 100 and d["n_dirs"] == 1 and d["bytes"] > 0
    assert d["action"] == "append" and d["n_dvs"] == 0


# --------------------------------------------------- equality skipping


def test_set_stats_exact_set_skips_dirs(spark, tmp_path):
    t = ManifestTable(spark, str(tmp_path / "t"))
    # each append carries a DIFFERENT low-cardinality source tag: range
    # stats on the id can never separate them, the distinct set can
    for tag in ("alpha", "beta", "gamma"):
        df = spark.range(0, 200).select(
            F.col("id").alias("k"), F.lit(tag).alias("src"))
        t.append(df, set_stats_cols=["src"])
    assert len(t.dirs_pruned_any("src", ["beta"])) == 1
    assert len(t.dirs_pruned_any("src", ["beta", "gamma"])) == 2
    assert t.dirs_pruned_any("src", ["nope"]) == []
    # point filter through dirs_pruned consults the same stat
    assert len(t.dirs_pruned({"src": ("beta", "beta")})) == 1
    # and the read agrees with a full scan
    assert t.read_pruned_eq("src", ["beta"]).count() == 200
    assert t.read_pruned_eq("src", ["nope"]).count() == 0
    got = t.read_pruned_eq("src", ["alpha", "gamma"]).count()
    assert got == t.read().filter(F.col("src").isin("alpha", "gamma")
                                  ).count() == 400


def test_set_stats_bloom_high_cardinality(spark, tmp_path):
    t = ManifestTable(spark, str(tmp_path / "t"))
    t.append(spark.range(0, 1000).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("key")),
        set_stats_cols=["key"])
    t.append(spark.range(1000, 2000).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("key")),
        set_stats_cols=["key"])
    m = t.manifest(t.current_version())
    for d in m["dirs"]:
        assert "bloom" in m["dir_meta"][d]["sets"]["key"]
    # a present key keeps exactly its dir (Bloom false-positive rate at
    # 1000 values / 4096 bits is ~10% per absent probe; a single probe
    # landing in both dirs would be a broken hash, not bad luck)
    assert len(t.dirs_pruned_any("key", ["k1500"])) >= 1
    assert t.read_pruned_eq("key", ["k1500"]).count() == 1
    assert t.read_pruned_eq("key", ["absent-zzz"]).count() == 0
    # integer columns hash identically on both sides
    t2 = ManifestTable(spark, str(tmp_path / "t2"))
    t2.append(spark.range(0, 500).select(F.col("id").alias("n")),
              set_stats_cols=["n"])
    assert len(t2.dirs_pruned_any("n", [250])) == 1
    assert t2.read_pruned_eq("n", [250]).count() == 1


def test_bloom_python_spark_hash_parity(spark, tmp_path):
    """The write side hashes with Spark md5(cast(c as string)); the
    prune side with hashlib. A recorded value must ALWAYS pass its own
    dir's bloom — one-sided error only."""
    t = ManifestTable(spark, str(tmp_path / "t"))
    vals = [f"v{i}" for i in range(200)]
    t.append(spark.createDataFrame([(v,) for v in vals], "key string"),
             set_stats_cols=["key"])
    m = t.manifest(1)
    stat = m["dir_meta"][m["dirs"][0]]["sets"]["key"]
    assert "bloom" in stat
    assert all(_set_may_contain(stat, v) for v in vals)
    # positions are stable and within the bitmap
    assert all(0 <= p < stat["bloom"]["m"] for p in _bloom_positions("x"))


# --------------------------------------------------------------- analyze


def test_analyze_backfills_stats_metadata_only_commit(spark, tmp_path):
    t = ManifestTable(spark, str(tmp_path / "t"))
    t.append(_chunk(spark, 0, 100))
    t.append(_chunk(spark, 100, 250))
    # numeric ranges ride the write-time footer pass: analyzing them
    # alone has nothing to backfill (and commits nothing)
    assert t.stats_minmax("v") is not None
    assert t.analyze(["k", "v"]) is None
    base_dirs = t.manifest(t.current_version())["dirs"]

    # string equality stats still need the backfill job
    v = t.analyze(["k", "v"], set_stats_cols=["src"])
    m = t.manifest(v)
    assert m["action"] == "analyze"
    # dirs byte-identical: nothing was rewritten, only metadata landed
    assert m["dirs"] == base_dirs
    assert t.stats_minmax("k") == (0, 249)
    assert t.dirs_pruned_any("src", ["nope"]) == []
    # second analyze is a no-op (no empty commits)
    assert t.analyze(["k", "v"], set_stats_cols=["src"]) is None
    # a later append makes analyze incremental: only the new dir is
    # scanned and patched (its set stat is the missing piece)
    t.append(_chunk(spark, 250, 300))
    v2 = t.analyze(["k"], set_stats_cols=["src"])
    assert v2 is not None and t.stats_minmax("k") == (0, 299)


def _strip_recorded_stats(t):
    """Simulate a LEGACY table (written before footer stats landed) by
    deleting the recorded per-dir column stats from the current
    manifest."""
    import json

    from cdc_audit_spark.sinks.manifest import _manifest_path

    p = _manifest_path(t.path, t.current_version())
    with open(p) as fh:
        m = json.load(fh)
    for dm in m.get("dir_meta", {}).values():
        dm.pop("stats", None)
    with open(p, "w") as fh:
        json.dump(m, fh)


def test_analyze_enables_pruned_merge_free_reads(spark, tmp_path):
    """Fresh appends prune immediately (footer stats); a LEGACY
    stats-less table stays conservative until one analyze backfills."""
    t = ManifestTable(spark, str(tmp_path / "t"))
    t.append(_chunk(spark, 0, 100))       # k in [0, 100)
    t.append(_chunk(spark, 1000, 1100))   # k in [1000, 1100)
    # write-time footer stats: skippable with no analyze
    assert len(t.dirs_pruned({"k": (0, 50)})) == 1
    _strip_recorded_stats(t)              # legacy table simulation
    assert len(t.dirs_pruned({"k": (0, 50)})) == 2  # conservative
    t.analyze(["k"])
    assert len(t.dirs_pruned({"k": (0, 50)})) == 1
    assert (t.read_pruned({"k": (0, 50)}).count()
            == t.read().filter("k between 0 and 50").count() == 51)


# -------------------------------------------------------------- optimize


def test_optimize_zorder_dirs_prune_on_any_dimension(spark, tmp_path):
    t = ManifestTable(spark, str(tmp_path / "t"))
    # 4 appends, each scattered across the full range of BOTH columns:
    # zero skipping possible before the rewrite
    for k in range(4):
        t.append(spark.range(k, 10000, 4).select(
            F.col("id").alias("a"),
            (F.col("id") * 37 % 1000).alias("b")))
    assert len(t.dirs_pruned({"b": (0, 50)})) == 4

    v = t.optimize(["a", "b"], n_dirs=16)
    m = t.manifest(v)
    assert m["action"] == "optimize" and len(m["dirs"]) == 16
    # Z-order: a filter on EITHER column alone prunes ~sqrt(16) dirs
    assert len(t.dirs_pruned({"a": (0, 500)})) <= 6
    assert len(t.dirs_pruned({"b": (0, 50)})) <= 6
    # values unchanged, counts exact, metadata still answers
    assert t.row_count() == 10000
    assert (t.read_pruned({"b": (0, 50)}).count()
            == t.read().filter("b between 0 and 50").count())
    assert t.stats_minmax("a") == (0, 9999)
    # pre-optimize version still time-travelable
    assert t.read(version=4).count() == 10000


def test_optimize_single_int_key_keeps_pruned_merge_layout(spark,
                                                           tmp_path):
    t = ManifestTable(spark, str(tmp_path / "t"))
    for k in range(3):
        t.append(spark.range(k, 3000, 3).select(F.col("id").alias("k"),
                                                F.col("id").alias("x")))
    v = t.optimize(["k"], n_dirs=8)
    m = t.manifest(v)
    metas = [m["dir_meta"][d] for d in m["dirs"]]
    # pk ranges recorded -> compatible with merge_audit(pruned=True),
    # and DISJOINT (range clustering)
    assert all(dm.get("pk_col") == "k" for dm in metas)
    spans = sorted((dm["pk_min"], dm["pk_max"]) for dm in metas)
    assert all(a[1] < b[0] for a, b in zip(spans, spans[1:]))
    assert len(t.dirs_pruned({"k": (0, 100)})) == 1


def test_optimize_refuses_non_numeric_cluster_col(spark, tmp_path):
    t = ManifestTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([("a", 1)], "s string, n long"))
    with pytest.raises(ValueError, match="numeric"):
        t.optimize(["s"])


# ----------------------------------------------- timestamp time travel


def test_timestamp_as_of(spark, tmp_path):
    import datetime as dt
    import time

    t = ManifestTable(spark, str(tmp_path / "t"))
    t.append(_chunk(spark, 0, 100))
    t1 = time.time()
    time.sleep(0.05)
    t.append(_chunk(spark, 100, 200))
    assert t.version_at(t1) == 1
    assert t.version_at(time.time()) == 2
    assert t.version_at(0) is None  # before the first commit
    assert t.read(timestamp=t1).count() == 100
    assert t.read(timestamp=dt.datetime.now()).count() == 200
    with pytest.raises(FileNotFoundError):
        t.read(timestamp=0)
    with pytest.raises(ValueError, match="not both"):
        t.read(version=1, timestamp=t1)
    # every history row carries its claim time, ascending
    ts = [h["ts"] for h in t.history()]
    assert all(a <= b for a, b in zip(ts, ts[1:]))


def test_version_at_monotone_under_clock_jitter(spark, tmp_path):
    """A lagging writer clock must not create an ambiguous window:
    version_at clamps each commit's time by its predecessor's."""
    import json
    import os as _os

    t = ManifestTable(spark, str(tmp_path / "t"))
    t.append(_chunk(spark, 0, 10))
    t.append(_chunk(spark, 10, 20))
    t.append(_chunk(spark, 20, 30))
    # simulate a writer whose clock ran 1h behind on version 2
    p = _os.path.join(t.path, "_manifests", "m-000000000002.json")
    m = json.load(open(p))
    real_t2 = m["ts"]
    m["ts"] = m["ts"] - 3600
    json.dump(m, open(p, "w"))
    # v2's effective time is clamped to v1's -> asking for a moment
    # just after the REAL v1 claim resolves to v2, never back to v1
    t1 = t.manifest(1)["ts"]
    assert t.version_at(t1 + 1e-6) == 2
    assert t.version_at(real_t2 + 10) == 3


# -------------------------------------------------- mergeable NDV stats


def test_approx_ndv_from_sketches(spark, tmp_path):
    t = ManifestTable(spark, str(tmp_path / "t"))
    # overlapping value ranges across dirs: summing per-dir exact
    # counts would double-count, the HLL union must not
    t.append(spark.range(0, 5000).selectExpr("id % 1000 as g"),
             ndv_stats_cols=["g"])
    t.append(spark.range(0, 5000).selectExpr("(id % 500) + 750 as g"),
             ndv_stats_cols=["g"])
    est = t.approx_ndv("g")     # true: union of [0,1000) and [750,1250)
    assert est is not None and abs(est - 1250) / 1250 < 0.05
    # any dir without a sketch -> None (caller falls back to a scan)
    t.append(spark.range(0, 10).selectExpr("id as g"))
    assert t.approx_ndv("g") is None
    # analyze backfills just the sketchless dir
    t.analyze([], ndv_stats_cols=["g"])
    assert t.approx_ndv("g") is not None
    assert t.approx_ndv("nope") is None


# ------------------------------------------------- small-dir bin-packing


def test_compact_small_packs_only_small_dirs(spark, tmp_path):
    t = ManifestTable(spark, str(tmp_path / "t"))
    for i in range(6):  # six tiny micro-batch dirs
        t.append(_chunk(spark, i * 100, (i + 1) * 100),
                 stats_cols=["k"], set_stats_cols=["src"])
    t.append(_chunk(spark, 10000, 50000),
             stats_cols=["k"], set_stats_cols=["src"])  # one big dir
    m = t.manifest(t.current_version())
    big = max(m["dir_meta"][d]["bytes"] for d in m["dirs"])
    big_dir = next(d for d in m["dirs"]
                   if m["dir_meta"][d]["bytes"] == big)

    v = t.compact_small(target_bytes=big)
    m2 = t.manifest(v)
    assert m2["action"] == "binpack"
    # the big dir is carried VERBATIM; the six smalls packed into one
    assert big_dir in m2["dirs"] and len(m2["dirs"]) == 2
    assert t.read().count() == 600 + 40000 == t.row_count()
    # folded stats keep skipping alive without any recompute
    packed = next(d for d in m2["dirs"] if d != big_dir)
    dm = m2["dir_meta"][packed]
    assert dm["stats"]["k"] == [0, 599]
    assert "sets" in dm and "rows" in dm
    assert t.read_pruned({"k": (0, 50)}).count() == 51
    assert (t.read_pruned_eq("src", ["src1"]).count()
            == t.read().filter("src = 'src1'").count())
    # nothing left to pack at the same threshold
    assert t.compact_small(target_bytes=big) is None
    # pre-pack version still time travels
    assert t.read(version=7).count() == 40600


def test_compact_small_packs_through_live_dvs(spark, tmp_path):
    """r12: bin-packing under LIVE deletion vectors preserves the
    tombstone accounting exactly — dirs pack within their applicable-DV
    class, each DV's covers list rewrites to the packed dir, the
    deleted fraction a rebuild policy keys on never resets, and a key
    re-inserted AFTER the delete stays visible (the covers semantics
    the class grouping exists for)."""
    from cdc_audit_spark.sources.manifest_stream import (
        read_manifest_stream,
    )
    from cdc_audit_spark.streaming.stream_components import (
        deleted_fraction,
    )

    t = ManifestTable(spark, str(tmp_path / "t"))
    for i in range(3):
        t.append(_chunk(spark, i * 100, (i + 1) * 100))
    t.delete_where("k = 5", key_col="k")
    # k=5 re-inserted after the delete: its dir is NOT covered by the DV
    t.append(_chunk(spark, 5, 6))
    t.append(_chunk(spark, 400, 410))
    frac = deleted_fraction(t)
    assert frac > 0
    want = {r["k"] for r in t.read().select("k").collect()}
    assert 5 in want  # the re-insert is live

    v = t.compact_small(target_bytes=1 << 30)
    m = t.manifest(v)
    assert m["action"] == "binpack"
    # two classes (covered-by-DV, uncovered) -> two packed dirs
    assert len(m["dirs"]) == 2
    dv = m["dv_dirs"]
    assert len(dv) == 1
    covered = set(m["dv_meta"][dv[0]]["covers"])
    assert covered < set(m["dirs"]) and len(covered) == 1
    # content, metadata count, and the rebuild trigger are all unchanged
    assert {r["k"] for r in t.read().select("k").collect()} == want
    assert t.row_count() == len(want)
    assert deleted_fraction(t) == frac
    # a later delete keeps exact arithmetic on the packed layout
    t.delete_where("k = 7", key_col="k")
    assert {r["k"] for r in t.read().select("k").collect()} == want - {7}
    # pre-pack version still time travels
    assert {r["k"] for r in t.read(version=v - 1).select("k").collect()} \
        == want

    # a binpack commit re-emits nothing to a stream consumer
    t2 = ManifestTable(spark, str(tmp_path / "t2"))
    for i in range(3):
        t2.append(_chunk(spark, i * 10, (i + 1) * 10))
    t2.compact_small(target_bytes=1 << 30)
    q = (read_manifest_stream(spark, t2.path)
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "sink"))
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(str(tmp_path / "sink")).count() == 30


def test_optimize_rebases_over_concurrent_appends(spark, tmp_path):
    """A content-preserving rewrite must not lose the race to plain
    appends: the optimized dirs plus the appended deltas are still the
    exact current content. Anything else interleaved conflicts."""
    from cdc_audit_spark.sinks.manifest import CommitConflict

    t = ManifestTable(spark, str(tmp_path / "t"))
    t.append(spark.range(0, 1000).selectExpr("id as k"))
    base = t.current_version()
    t2 = ManifestTable(spark, str(tmp_path / "t"))

    def race_with(fn):
        # make optimize's FIRST current_version() call (its base
        # capture) see the pre-racer version; every later call —
        # _commit's claim loop — sees the truth. fn() is the racer
        # committing "between" capture and claim.
        real = ManifestTable.current_version
        state = {"first": True}

        def fake(self):
            if state["first"]:
                state["first"] = False
                out = real(self)
                fn()
                return out
            return real(self)

        return real, fake

    real, fake = race_with(
        lambda: t2.append(spark.range(1000, 1100).selectExpr("id as k")))
    try:
        ManifestTable.current_version = fake  # type: ignore[assignment]
        v = t.optimize(["k"], n_dirs=4)
    finally:
        ManifestTable.current_version = real  # type: ignore[assignment]
    m = t.manifest(v)
    assert m["action"] == "optimize"
    # all 1100 rows present: 1000 clustered + 100 rebased-in
    assert t.read().count() == 1100 == t.row_count()
    racer_added = t.manifest(base + 1)["added"]
    assert all(d in m["dirs"] for d in racer_added)

    # a DELETE interleaved instead -> refuse (content changed)
    real, fake = race_with(
        lambda: t2.delete_where("k = 5", key_col="k"))
    try:
        ManifestTable.current_version = fake  # type: ignore[assignment]
        with pytest.raises(CommitConflict, match="non-append"):
            t.optimize(["k"], n_dirs=4)
    finally:
        ManifestTable.current_version = real  # type: ignore[assignment]


def test_random_walk_with_dv_binpack_optimize_restore(spark, tmp_path):
    """Model-based fuzz of the round's new surface: a seeded walk of
    append / delete_where / compact_small / optimize / analyze /
    restore / vacuum must keep (a) visible content equal to a trivial
    key-set model, (b) the METADATA row_count equal to the model size
    at every step (the DV arithmetic's real invariant), and (c) every
    surviving historical version byte-stable."""
    import random

    from cdc_audit_spark.sinks.manifest import ManifestTable

    rng = random.Random(1234)
    t = ManifestTable(spark, str(tmp_path / "t"))
    model: set[int] = set()
    snapshots: dict[int, set[int]] = {}
    next_k = 0

    def df_of(lo, hi):
        return spark.range(lo, hi).selectExpr("id as k", "id % 5 as g")

    def keys_of(df):
        return {r["k"] for r in df.select("k").collect()}

    for step in range(16):
        op = rng.choice(["append", "append", "delete", "binpack",
                         "optimize", "analyze", "restore", "vacuum"])
        if op == "append":
            n = rng.randint(1, 30)
            t.append(df_of(next_k, next_k + n), stats_cols=["k"])
            model |= set(range(next_k, next_k + n))
            next_k += n
        elif op == "delete":
            if not model:
                continue
            r = rng.randint(0, 6)
            v = t.delete_where(f"k % 7 = {r}", key_col="k")
            doomed = {k for k in model if k % 7 == r}
            assert (v is None) == (not doomed), f"step {step}"
            model -= doomed
        elif op == "binpack":
            # r12: packs THROUGH live DVs (covers rewrite with the
            # dirs) — the model invariants below are the proof
            t.compact_small(target_bytes=1 << 30)
        elif op == "optimize":
            if t.current_version() is None or not model:
                continue
            t.optimize(["k"], n_dirs=rng.randint(2, 4))
        elif op == "analyze":
            if t.current_version() is None:
                continue
            t.analyze(["k"])
        elif op == "restore":
            cands = [v for v in t.versions() if v in snapshots]
            if not cands:
                continue
            target = rng.choice(cands)
            t.restore(target)
            model = set(snapshots[target])
        else:  # vacuum (young-dir retain guard keeps all data live)
            if not t.versions():
                continue
            t.vacuum(keep_versions=rng.randint(2, 4))
            snapshots = {v: s for v, s in snapshots.items()
                         if v in t.versions()}
        cur = t.current_version()
        if cur is not None:
            snapshots[cur] = set(model)
            assert keys_of(t.read()) == model, f"step {step} ({op})"
            assert t.row_count() == len(model), f"step {step} ({op})"

    for ver, expected in snapshots.items():
        if ver in t.versions():
            assert keys_of(t.read(version=ver)) == expected, ver


def test_bloom_probe_uses_recorded_params(spark, tmp_path):
    """ADVICE r08: probes must evaluate a bitmap with the m/k RECORDED
    in the stat, not the module constants — a stat written under other
    parameters probed with today's constants can prune unsoundly (wrong
    results). Unprobeable parameters must keep the dir conservatively."""
    import hashlib

    from cdc_audit_spark.sinks.manifest import (
        _BLOOM_K,
        _BLOOM_M,
        _fold_dir_meta,
    )

    # a bitmap written under m=64, k=2 (different from the constants):
    # set exactly the positions of "hit" under THOSE parameters
    m, k = 64, 2
    bits = bytearray(m // 8)
    h = hashlib.md5(b"hit").hexdigest()
    for i in range(k):
        p = int(h[8 * i:8 * i + 8], 16) % m
        bits[p // 8] |= 1 << (p % 8)
    stat = {"bloom": {"m": m, "k": k, "hex": bits.hex()}}
    assert (m, k) != (_BLOOM_M, _BLOOM_K)
    assert _set_may_contain(stat, "hit")  # must pass under recorded m/k

    # unprobeable parameters (k beyond the md5 word budget, undersized
    # bitmap) keep conservatively rather than pruning
    assert _set_may_contain(
        {"bloom": {"m": 4096, "k": 9, "hex": "00" * 512}}, "x")
    assert _set_may_contain(
        {"bloom": {"m": 4096, "k": 4, "hex": "00" * 16}}, "x")

    # folding drops stats whose members disagree on k as well as m —
    # OR-ing bitmaps probed under different parameters is meaningless
    good = {"bloom": {"m": _BLOOM_M, "k": _BLOOM_K,
                      "hex": "00" * (_BLOOM_M // 8)}}
    k_drift = {"bloom": {"m": _BLOOM_M, "k": 2,
                         "hex": "00" * (_BLOOM_M // 8)}}
    folded = _fold_dir_meta([{"sets": {"c": good}},
                             {"sets": {"c": k_drift}}])
    assert "c" not in folded.get("sets", {})
    folded_ok = _fold_dir_meta([{"sets": {"c": good}},
                                {"sets": {"c": good}}])
    assert "c" in folded_ok["sets"]


# --------------------------------------- batch-key pruned reads (debit)


def test_read_pruned_for_keys_point_mode(spark, tmp_path):
    """The maintenance-epoch debit primitive: a keys frame touching two
    of eight range dirs lists only those dirs and returns exactly the
    touched keys' rows."""
    t = ManifestTable(spark, str(tmp_path / "t"))
    t.write_range_layout(_chunk(spark, 0, 800), "k", n_buckets=8)
    all_dirs = t.manifest(t.current_version())["dirs"]
    assert len(all_dirs) == 8

    keys = spark.createDataFrame([(3,), (5,), (701,)], "k long")
    reads = []
    orig = t._read_dirs_dv

    def spy(m, dirs, at_version=None):
        reads.append(list(dirs))
        return orig(m, dirs, at_version=at_version)

    t._read_dirs_dv = spy
    got = t.read_pruned_for_keys(keys, "k")
    rows = {r["k"] for r in got.collect()}
    assert rows == {3, 5, 701}
    assert all(len(d) <= 2 for d in reads) and reads  # 2/8 dirs listed


def test_read_pruned_for_keys_range_fallback(spark, tmp_path):
    """Past max_points the read degrades to the [min, max] hull with a
    range residual — a superset, still dir-pruned when keys cluster."""
    t = ManifestTable(spark, str(tmp_path / "t"))
    t.write_range_layout(_chunk(spark, 0, 800), "k", n_buckets=8)
    keys = spark.range(10, 60).select(F.col("id").alias("k"))
    reads = []
    orig = t._read_dirs_dv

    def spy(m, dirs, at_version=None):
        reads.append(list(dirs))
        return orig(m, dirs, at_version=at_version)

    t._read_dirs_dv = spy
    got = t.read_pruned_for_keys(keys, "k", max_points=8)
    assert got.count() == 50  # [10, 59] residual over the pruned dirs
    assert all(len(d) <= 1 for d in reads) and reads  # one range dir


def test_read_pruned_for_keys_empty_and_version(spark, tmp_path):
    t = ManifestTable(spark, str(tmp_path / "t"))
    t.write_range_layout(_chunk(spark, 0, 100), "k", n_buckets=4)
    v1 = t.current_version()
    t.append(_chunk(spark, 100, 200))
    empty = spark.createDataFrame([], "k long")
    assert t.read_pruned_for_keys(empty, "k").count() == 0
    # pinned pre-version read never sees the later append
    keys = spark.createDataFrame([(150,)], "k long")
    assert t.read_pruned_for_keys(keys, "k", version=v1).count() == 0
    assert t.read_pruned_for_keys(keys, "k").count() == 1


def test_read_pruned_any_of_unions_filters(spark, tmp_path):
    """The multi-purpose superset read (join-IVM side reads): dirs kept
    if ANY col-in-points filter may match; no residual filter applied;
    a None points list keeps everything (unbounded filter)."""
    t = ManifestTable(spark, str(tmp_path / "t"))
    t.write_range_layout(_chunk(spark, 0, 800), "k", n_buckets=8)
    df = t.read_pruned_any_of({"k": [3, 701]})
    ks = {r["k"] for r in df.collect()}
    assert {3, 701} <= ks
    assert len(ks) <= 200  # two of eight 100-key dirs
    assert t.read_pruned_any_of({"k": None}).count() == 800
    assert t.read_pruned_any_of({"k": []}).count() == 0
