"""Invariants of the deterministic sampling / splitting / sharding operators
(operators/sampling.py): exhaustive + stable splits, append-stability,
exact-N strata, pack budget bounds, shard balance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_audit_spark.operators.sampling import (
    HASH_SPACE,
    deterministic_split,
    hash_bucket,
    hash_sample,
    pack_chunks,
    shard_assign,
    stratified_sample,
    weighted_source_mix,
)

SPLITS = {"train": 0.9, "valid": 0.05, "test": 0.05}


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


def test_split_is_exhaustive_and_deterministic(docs):
    out = deterministic_split(docs, "doc_id", SPLITS)
    total = docs.count()
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == total  # every row assigned exactly once
    # ratios within a loose tolerance of the weights (hash is uniform-ish)
    assert counts["train"] / total == pytest.approx(0.9, abs=0.05)
    # re-running yields the identical assignment (no RNG)
    again = deterministic_split(docs, "doc_id", SPLITS)
    assert (
        out.select("doc_id", "split")
        .exceptAll(again.select("doc_id", "split"))
        .count()
        == 0
    )


def test_split_stable_under_append(docs):
    """A row's split never changes when the dataset grows — the property
    rand(seed) lacks (its value depends on partition layout)."""
    half = docs.filter(F.col("doc_id") % 2 == 0)
    full_assign = deterministic_split(docs, "doc_id", SPLITS).select("doc_id", "split")
    half_assign = deterministic_split(half, "doc_id", SPLITS).select("doc_id", "split")
    assert half_assign.exceptAll(full_assign).count() == 0


def test_split_rejects_nonpositive_weights(docs):
    with pytest.raises(ValueError):
        deterministic_split(docs, "doc_id", {"a": 0.0})


def test_hash_sample_fraction_and_subset(docs):
    total = docs.count()
    s = hash_sample(docs, "doc_id", 0.2)
    n = s.count()
    assert n / total == pytest.approx(0.2, abs=0.08)
    # nested property: a 10% sample is a strict subset of the 20% sample
    # (thresholds nest) — lets pipelines downsample without reshuffling data
    s10 = hash_sample(docs, "doc_id", 0.1)
    assert s10.select("doc_id").exceptAll(s.select("doc_id")).count() == 0


def test_weighted_mix_respects_per_source_fractions(docs):
    # fixture sources are src0..src19 — keep all of src0, none of src1,
    # unlisted sources fall to default_fraction=0.0
    n_src0_all = docs.filter(F.col("source") == "src0").count()
    assert n_src0_all > 0, "fixture must contain src0"
    kept = weighted_source_mix(docs, "source", "doc_id", {"src0": 1.0, "src1": 0.0})
    srcs = {r["source"] for r in kept.select("source").distinct().collect()}
    assert srcs == {"src0"}
    assert kept.count() == n_src0_all  # fraction 1.0 keeps everything
    # a mid fraction keeps a strict, deterministic subset
    half = weighted_source_mix(docs, "source", "doc_id", {"src0": 0.5})
    n_half = half.count()
    assert 0 < n_half < n_src0_all
    assert half.select("doc_id").exceptAll(kept.select("doc_id")).count() == 0


def test_stratified_sample_exact_n(docs):
    out = stratified_sample(docs, "lang", "doc_id", 5)
    per = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    avail = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n_avail in avail.items():
        assert per.get(lang, 0) == min(5, n_avail)
    # deterministic: same rows both runs
    again = stratified_sample(docs, "lang", "doc_id", 5)
    assert out.select("doc_id").exceptAll(again.select("doc_id")).count() == 0


def test_shard_assign_range_and_balance(docs):
    out = shard_assign(docs, "doc_id", 16)
    stats = out.agg(F.min("shard_id"), F.max("shard_id"), F.count("*")).first()
    assert stats[0] >= 0 and stats[1] < 16
    counts = [r["n"] for r in out.groupBy("shard_id").agg(F.count("*").alias("n")).collect()]
    mean = stats[2] / 16
    # hash balance: no shard more than 2.5x the mean on this small fixture
    assert max(counts) < 2.5 * mean


def test_pack_chunks_budget_overflow_bound(docs):
    budget = 500
    sized = docs.select(
        "doc_id", "lang",
        F.size(F.split("text", r"\s+")).cast("long").alias("n_tokens"),
    )
    packed = pack_chunks(sized, "lang", "doc_id", F.col("n_tokens"), budget)
    per_pack = packed.groupBy("lang", "pack_id").agg(
        F.sum("n_tokens").alias("tot"), F.max("n_tokens").alias("biggest")
    )
    # offset packing invariant: a pack exceeds the budget by at most the size
    # of its largest (overflowing) document
    bad = per_pack.filter(F.col("tot") - F.col("biggest") >= budget).count()
    assert bad == 0
    # pack ids start at 0 per group and are dense
    firsts = packed.groupBy("lang").agg(F.min("pack_id").alias("m")).collect()
    assert all(r["m"] == 0 for r in firsts)


def test_hash_bucket_matches_duckdb(spark, docs):
    """Cross-engine parity of the primitive itself (the queries exercise it
    end-to-end; this pins the exact md5-prefix convention)."""
    import duckdb

    ids = [r["doc_id"] for r in docs.select("doc_id").limit(20).collect()]
    sdf = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["b"]
        for r in sdf.select("doc_id", hash_bucket(F.col("doc_id")).alias("b")).collect()
    }
    con = duckdb.connect()
    for i in ids:
        want = con.sql(
            f"SELECT ('0x' || substr(md5(CAST({i} AS VARCHAR)), 1, 6))::INT"
        ).fetchone()[0]
        assert got[i] == want, i
    assert max(got.values()) < HASH_SPACE


# ----------------------------------------------------- DSIR resampling


def _py_grams(text: str) -> list[str]:
    toks = [t for t in text.strip().lower().split() if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_bucket(gram: str, n: int) -> int:
    import hashlib

    return int(hashlib.md5(gram.encode()).hexdigest()[:6], 16) % n


def test_dsir_weights_match_pure_python_reference(spark, docs):
    """The operator's whole pipeline (tokenize → hash-bucket → fit two
    smoothed distributions → per-doc mean log ratio) must equal an
    independent pure-Python reimplementation to float precision."""
    import math

    from cdc_audit_spark.operators.sampling import dsir_weights

    B, S = 512, 1.0
    corpus = docs.limit(60).cache()
    rows = corpus.select("doc_id", "text", "lang").collect()
    target_rows = [r for r in rows if r["lang"] == "de"]

    def counts(rws):
        c: dict[int, int] = {}
        for r in rws:
            for g in _py_grams(r["text"]):
                b = _py_bucket(g, B)
                c[b] = c.get(b, 0) + 1
        return c

    cc, tc = counts(rows), counts(target_rows)
    big_c = sum(cc.values()) + S * B
    big_t = sum(tc.values()) + S * B
    want = {}
    for r in rows:
        grams = _py_grams(r["text"])
        if not grams:
            continue
        s = sum(math.log((tc.get(_py_bucket(g, B), 0) + S) / big_t)
                - math.log((cc.get(_py_bucket(g, B), 0) + S) / big_c)
                for g in grams)
        want[r["doc_id"]] = s / len(grams)

    got = {r["doc_id"]: r["dsir_weight"]
           for r in dsir_weights(
               corpus, corpus.filter(F.col("lang") == "de"),
               "text", "doc_id", n_buckets=B, smoothing=S).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_dsir_sample_prefers_target_distribution(spark, docs):
    """Selecting with a German target must enrich German docs far above
    their base rate — the operator's reason to exist."""
    from cdc_audit_spark.operators.sampling import dsir_sample

    target = docs.filter(F.col("lang") == "de")
    n = 50
    sel = dsir_sample(docs, target, "text", "doc_id", n).cache()
    assert sel.count() == n
    de = sel.filter(F.col("lang") == "de").count()
    base = docs.filter(F.col("lang") == "de").count() / docs.count()
    assert de / n > min(2.5 * base, 0.5)
    # deterministic: a second run selects the identical set
    again = dsir_sample(docs, target, "text", "doc_id", n)
    assert sel.select("doc_id").exceptAll(
        again.select("doc_id")).count() == 0


def test_dsir_gumbel_variant_deterministic_and_distinct(spark, docs):
    from cdc_audit_spark.operators.sampling import dsir_sample

    target = docs.filter(F.col("lang") == "de")
    a = dsir_sample(docs, target, "text", "doc_id", 30, gumbel_seed=7)
    b = dsir_sample(docs, target, "text", "doc_id", 30, gumbel_seed=7)
    c = dsir_sample(docs, target, "text", "doc_id", 30, gumbel_seed=8)
    ids = lambda df: {r["doc_id"] for r in df.select("doc_id").collect()}
    assert ids(a) == ids(b)          # same seed -> same resample
    assert ids(a) != ids(c)          # different seed -> different draw


def test_pack_chunks_bfd_matches_python_reference_and_never_overflows(spark):
    import hashlib

    from cdc_audit_spark.operators.sampling import pack_chunks_bfd

    rows = [(f"g{i % 2}", f"doc{i:03d}", 10 + (i * 37) % 900)
            for i in range(60)]
    df = spark.createDataFrame(rows, "grp string, key string, sz long")
    out = pack_chunks_bfd(df, "grp", "key", "sz", budget=1000)
    got = {(r["grp"], r["key"]): r["pack_id"] for r in out.collect()}

    def md5p(s):
        return int(hashlib.md5(str(s).encode()).hexdigest()[:6], 16)

    for grp in ("g0", "g1"):
        members = sorted(
            [(k, s) for g, k, s in rows if g == grp],
            key=lambda t: (-t[1], md5p(t[0]), t[0]))
        remaining, expect = [], {}
        for k, s in members:
            best, best_room = -1, None
            for i, room in enumerate(remaining):
                if s <= room and (best_room is None or room < best_room):
                    best, best_room = i, room
            if best < 0:
                remaining.append(max(1000 - s, 0))
                expect[k] = len(remaining) - 1
            else:
                remaining[best] -= s
                expect[k] = best
        for k, s in members:
            assert got[(grp, k)] == expect[k]

    # packs never exceed the budget (the offset packer's overflow is gone)
    sums = out.groupBy("grp", "pack_id").agg(F.sum("sz").alias("s")).collect()
    assert all(r["s"] <= 1000 for r in sums)


def test_pack_chunks_bfd_properties(spark):
    from cdc_audit_spark.operators.sampling import pack_chunks, pack_chunks_bfd

    rows = [("g", f"d{i:02d}", s) for i, s in enumerate(
        [600, 500, 400, 400, 300, 300, 200, 150, 100, 50])]
    df = spark.createDataFrame(rows, "grp string, key string, sz long")
    bfd = pack_chunks_bfd(df, "grp", "key", "sz", budget=1000)
    n_bfd = bfd.select("pack_id").distinct().count()
    # total 3000 over budget 1000: BFD achieves the 3-pack optimum here
    assert n_bfd == 3

    # fewer-or-equal packs than the offset packer on the same input
    off = pack_chunks(df, "grp", "key", F.col("sz"), budget=1000)
    n_off = off.select("pack_id").distinct().count()
    assert n_bfd <= n_off

    # oversize doc: its own pack, nothing else joins it
    rows2 = rows + [("g", "huge", 5000)]
    df2 = spark.createDataFrame(rows2, "grp string, key string, sz long")
    out2 = pack_chunks_bfd(df2, "grp", "key", "sz", budget=1000)
    huge_pack = {r["pack_id"] for r in out2.filter("key = 'huge'").collect()}
    mates = out2.filter(F.col("pack_id").isin(list(huge_pack))).count()
    assert mates == 1

    # partitioning invariance
    a = sorted(map(tuple, pack_chunks_bfd(
        df.repartition(7), "grp", "key", "sz", 1000).collect()))
    b = sorted(map(tuple, pack_chunks_bfd(
        df.repartition(2), "grp", "key", "sz", 1000).collect()))
    assert a == b


def test_dsir_micro_weights_track_float_weights(spark, docs):
    """micro=True (the driver-hashable integer scoring path) quantizes
    each bucket's log ratio to micro-nats: per-doc weights must track the
    float path within the quantization error bound (1e-6 per gram,
    averaged), and the selection must be engine-exact by construction
    (integer sums + one correctly-rounded division)."""
    from cdc_audit_spark.operators.sampling import dsir_weights

    target = docs.filter("lang = 'de'")
    f = {r["doc_id"]: r["dsir_weight"]
         for r in dsir_weights(docs, target, "text", "doc_id").collect()}
    m = {r["doc_id"]: r["dsir_weight"]
         for r in dsir_weights(docs, target, "text", "doc_id",
                               micro=True).collect()}
    assert set(f) == set(m)
    assert all(abs(f[k] - m[k]) <= 5e-7 + 1e-12 for k in f)


def test_temperature_resample_flattens_head(spark, docs):
    """alpha=1 keeps everything; smaller alpha sheds head-language mass
    toward p^alpha (the smallest group keeps ~everything), and the
    selection is deterministic and append-stable (a rerun picks the
    same rows)."""
    from cdc_audit_spark.operators.sampling import temperature_resample

    base = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    all_kept = temperature_resample(docs, "lang", "doc_id", alpha=1.0)
    assert all_kept.count() == docs.count()

    kept = temperature_resample(docs, "lang", "doc_id", alpha=0.5)
    k = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    n_min = min(base.values())
    smallest = min(base, key=base.get)
    biggest = max(base, key=base.get)
    # the smallest group keeps ~everything; the biggest sheds toward
    # sqrt(n_min * n_big) (keep fraction (n/n_min)^-0.5), hash jitter
    # bounded
    assert k[smallest] >= 0.9 * base[smallest]
    import math

    want_big = base[biggest] * (base[biggest] / n_min) ** -0.5
    assert abs(k[biggest] - want_big) <= max(10, 0.25 * want_big)
    assert want_big < base[biggest]
    # deterministic: rerun keeps the identical id set
    a = {r["doc_id"] for r in kept.select("doc_id").collect()}
    b = {r["doc_id"] for r in temperature_resample(
        docs, "lang", "doc_id", alpha=0.5).select("doc_id").collect()}
    assert a == b

    with pytest.raises(ValueError):
        temperature_resample(docs, "lang", "doc_id", alpha=1.5)


def test_unimax_allocation_vs_sequential_mirror(spark):
    """Closed-form water-filling must equal the paper's sequential
    procedure: walk groups ascending by capacity, give each
    min(capacity, remaining / remaining_groups)."""
    from cdc_audit_spark.operators.sampling import unimax_allocation

    rows = [("a", 10), ("b", 100), ("c", 40), ("d", 7), ("e", 100)]
    df = spark.createDataFrame(
        [(g, i) for g, n in rows for i in range(n)], "grp string, tok int")

    def mirror(counts, budget, epochs):
        caps = sorted((epochs * n, g) for g, n in counts)
        out, rem = {}, float(budget)
        for j, (cap, g) in enumerate(caps):
            share = rem / (len(caps) - j)
            out[g] = min(float(cap), share)
            rem -= out[g]
        return out

    for budget, epochs in [(150, 1), (150, 2), (10_000, 3), (5, 1)]:
        got = {r["grp"]: r["alloc_tokens"] for r in unimax_allocation(
            df, "grp", F.lit(1), budget=budget, max_epochs=epochs).collect()}
        want = mirror(rows, budget, epochs)
        assert got.keys() == want.keys()
        for g in want:
            assert got[g] == pytest.approx(want[g], abs=1e-9), (
                budget, epochs, g, got[g], want[g])
        total_cap = sum(epochs * n for _, n in rows)
        if budget <= total_cap:
            assert sum(got.values()) == pytest.approx(budget)
        else:
            assert got == {g: float(epochs * n) for g, n in rows}

    with pytest.raises(ValueError):
        unimax_allocation(df, "grp", F.lit(1), budget=0)
    with pytest.raises(ValueError):
        unimax_allocation(df, "grp", F.lit(1), budget=10, max_epochs=0)
