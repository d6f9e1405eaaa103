from pyspark.sql import functions as F

from cdc_audit_spark.operators.dedup import (
    exact_dedup,
    exact_dedup_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),          # exact dup of 1
        (3, "the quick brown fox jumps over the sleepy dog"),        # near dup of 1
        (4, "completely different content about spark engines"),
        (5, "another unrelated document mentioning data pipelines"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_min_id(spark):
    out = exact_dedup(_docs(spark), ["text"], order_col="doc_id")
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 3, 4, 5]  # 2 dropped, 1 survives as min id


def test_exact_dedup_groups_counts(spark):
    out = {r["keep_id"]: r["n_copies"] for r in exact_dedup_groups(_docs(spark), "text", "doc_id").collect()}
    assert out[1] == 2
    assert out[3] == 1


def test_minhash_identical_texts_identical_sigs(spark):
    sigs = {r["id"]: r["sig"] for r in minhash_signatures(_docs(spark), "text", "doc_id", 16, 2).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]


def test_lsh_finds_exact_and_near_dups(spark):
    pairs = {(r["id_a"], r["id_b"]) for r in
             minhash_lsh_pairs(_docs(spark), "text", "doc_id",
                               num_hashes=16, bands=8, shingle_size=2).collect()}
    assert (1, 2) in pairs               # exact dup always collides
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup: 8 bands of 2 is permissive
    assert (4, 5) not in pairs


def test_lsh_verify_with_exact_jaccard(spark):
    docs = _docs(spark)
    cand = minhash_lsh_pairs(docs, "text", "doc_id", num_hashes=16, bands=8, shingle_size=2)
    verified = ngram_jaccard_pairs(docs, "text", "doc_id", cand, shingle_size=2)
    j = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.collect()}
    assert j[(1, 2)] == 1.0
    if (1, 3) in j:
        assert 0.5 < j[(1, 3)] < 1.0


def test_simhash_properties(spark):
    out = {r["id"]: r["simhash64"] for r in simhash(_docs(spark), "text", "doc_id").collect()}
    assert out[1] == out[2]  # identical text → identical fingerprint
    # near-dup differs in few bits; unrelated differs in many
    def hamming(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert hamming(out[1], out[3]) < hamming(out[1], out[4])


def test_simhash_arrow_matches_catalyst_form(spark):
    """The r13 Arrow simhash kernel must reproduce the r10-r12 Catalyst
    explode → 64-vote-sum form BIT FOR BIT, including the tokenizer's
    Java-split edge cases (leading/trailing whitespace keeps empty
    tokens under limit -1; \\x1c-\\x1f are NOT separators in Java's \\s;
    NULL text emits no row; empty text hashes the one empty token)."""
    from functools import reduce

    from pyspark.sql import functions as F

    rows = [
        (1, "plain words here"),
        (2, "  leading and trailing  "),
        (3, ""),
        (4, None),
        (5, "tab\tnewline\nvtab\x0bff\x0ccr\rmix"),
        (6, "fs\x1cgs\x1drs\x1eus\x1fnel\x85kept"),  # java \s: no split
        (7, "repeat repeat repeat unique"),
        (8, "unicode café naïve"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # the pre-r13 Catalyst form, inlined as the ground truth
    ex = df.select(
        F.col("doc_id").alias("id"),
        F.explode(F.split(F.col("text"), r"\s+")).alias("__t"))
    w1 = F.conv(F.substring(F.md5("__t"), 1, 8), 16, 10).cast("long")
    w2 = F.conv(F.substring(F.md5("__t"), 9, 8), 16, 10).cast("long")
    words = ex.select("id", w1.alias("__w1"), w2.alias("__w2"))

    def vote(j):
        w = F.col("__w1") if j < 32 else F.col("__w2")
        return F.when(
            F.shiftright(w, j % 32).bitwiseAND(F.lit(1)) == 1, F.lit(1)
        ).otherwise(F.lit(-1))

    sums = words.groupBy("id").agg(
        *[F.sum(vote(j)).alias(f"__s{j}") for j in range(64)])
    fingerprint = reduce(
        lambda a, b: a.bitwiseOR(b),
        [F.when(F.col(f"__s{j}") > 0,
                F.shiftleft(F.lit(1).cast("long"), j))
         .otherwise(F.lit(0).cast("long")) for j in range(64)])
    want = {r["id"]: r["fp"] for r in
            sums.select("id", fingerprint.alias("fp")).collect()}

    got = {r["id"]: r["simhash64"] for r in
           simhash(df, "text", "doc_id").collect()}
    assert got == want
    assert 4 not in got  # NULL text emits no row


def test_lsh_pairs_deterministic(spark):
    docs = _docs(spark)
    p1 = sorted(map(tuple, minhash_lsh_pairs(docs, "text", "doc_id", 16, 8, 2).collect()))
    p2 = sorted(map(tuple, minhash_lsh_pairs(docs, "text", "doc_id", 16, 8, 2).collect()))
    assert p1 == p2


def test_connected_components_vs_union_find(spark):
    """Spark min-label propagation must produce exactly the partition a
    driver-side union-find computes on the same edges."""
    from cdc_audit_spark.operators.dedup import connected_components

    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (3, 4)]
    edf = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in connected_components(edf).collect()}

    parent: dict[int, int] = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        union(a, b)
    want = {x: find(x) for x in parent}
    assert got == want
    # component label is the minimum member id
    assert got[4] == 1 and got[23] == 20 and got[11] == 10


def test_dedup_cluster_survivors_end_to_end(spark, sf_dir):
    """Full pipeline on the fixture corpus with planted duplicates: every
    planted copy must share a cluster with its original, and exactly one
    survivor exists per cluster."""
    from cdc_audit_spark.operators.dedup import dedup_cluster_survivors
    from cdc_audit_spark.queries import _duped_docs

    docs = _duped_docs(spark, sf_dir)
    out = dedup_cluster_survivors(docs, "text", "doc_id",
                                  num_hashes=32, bands=8, jaccard_threshold=0.6)
    rows = out.collect()
    assert len(rows) == docs.count()  # total assignment
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for cluster, members in by_cluster.items():
        survivors = [m for m in members if m["is_survivor"]]
        assert len(survivors) == 1
        assert survivors[0]["id"] == min(m["id"] for m in members) == cluster
    # planted copies (doc_id % 5 == 0 shifted by max+1) must be clustered
    # with their originals: those clusters have >= 2 members
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    multi = [c for c, ms in by_cluster.items() if len(ms) >= 2]
    assert len(multi) >= n_docs // 5 - 1


def test_incremental_lsh_dedup_synthetic(spark):
    from cdc_audit_spark.operators.dedup import incremental_lsh_dedup

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest before nightfall comes down")
    uniq = ("completely different content about spark shuffle partitions and "
            "parquet footer statistics with no shared shingles whatsoever here")
    b1 = spark.createDataFrame([(1, base), (2, base + " extra")], ["doc_id", "text"])
    b2 = spark.createDataFrame([(3, base), (4, uniq)], ["doc_id", "text"])

    a1, e1 = incremental_lsh_dedup(b1, None, "text", "doc_id")
    assert sorted(r["id"] for r in a1.collect()) == [1]   # 2 is a near-dup of 1
    a2, e2 = incremental_lsh_dedup(b2, e1, "text", "doc_id")
    assert sorted(r["id"] for r in a2.collect()) == [4]   # 3 collides with history
    # the index delta only carries ACCEPTED docs' entries
    assert sorted(r["id"] for r in e2.select("id").distinct().collect()) == [4]


def test_incremental_lsh_dedup_matches_one_shot(spark, sf_dir):
    """Feeding the corpus in id-ordered batches must accept exactly the same
    documents as one full-corpus pass (fixture duplicate families are
    bucket-cliques, where the greedy min-id contract is order-independent)."""
    from pyspark.sql import functions as F

    from cdc_audit_spark.operators.dedup import incremental_lsh_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    med = docs.approxQuantile("doc_id", [0.5], 0)[0]
    a1, e1 = incremental_lsh_dedup(docs.filter(F.col("doc_id") <= med), None,
                                   "text", "doc_id")
    a2, _ = incremental_lsh_dedup(docs.filter(F.col("doc_id") > med), e1,
                                  "text", "doc_id")
    inc = {r["id"] for r in a1.collect()} | {r["id"] for r in a2.collect()}
    full = {r["id"] for r in
            incremental_lsh_dedup(docs, None, "text", "doc_id")[0].collect()}
    assert inc == full


def test_stream_dedup_sync_matches_batch(spark, sf_dir, tmp_path):
    """Micro-batched streaming dedup (foreachBatch + persisted bucket index)
    must accept exactly the one-shot batch result. maxFilesPerTrigger=1
    forces multiple micro-batches so the index round-trip is exercised."""
    from pyspark.sql import functions as F

    from cdc_audit_spark.operators.dedup import incremental_lsh_dedup
    from cdc_audit_spark.streaming.stream_dedup import stream_dedup_sync

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = str(tmp_path / "incoming")
    med = docs.approxQuantile("doc_id", [0.5], 0)[0]
    # two source files, ids ordered across them → deterministic batch order
    docs.filter(F.col("doc_id") <= med).coalesce(1).write.parquet(src)
    docs.filter(F.col("doc_id") > med).coalesce(1).write.mode("append").parquet(src)

    q = stream_dedup_sync(
        spark, src, docs.schema,
        accepted_path=str(tmp_path / "accepted"),
        index_path=str(tmp_path / "index"),
        checkpoint_path=str(tmp_path / "ckpt"),
        text_col="text", id_col="doc_id",
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)

    got = {r["doc_id"] for r in
           spark.read.parquet(str(tmp_path / "accepted")).select("doc_id").collect()}
    want = {r["id"] for r in
            incremental_lsh_dedup(docs, None, "text", "doc_id")[0].collect()}
    assert got == want


def test_lsh_bucket_cap_bounds_degenerate_corpus(spark):
    # 300 identical docs share every band bucket: uncapped expansion would
    # be C(300,2)=44850 pairs from a single task. The cap drops the
    # mega-bucket (exact dedup owns identical docs) and reports the drop.
    from cdc_audit_spark.operators.dedup import minhash_lsh_pairs

    rows = [(i, "the same boilerplate text repeated everywhere") for i in range(300)]
    rows += [(1000, "a genuinely distinct document about spark partitioning"),
             (1001, "a genuinely distinct document about spark partitioning")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = minhash_lsh_pairs(df, "text", "doc_id", num_hashes=32, bands=8,
                               max_bucket_size=100)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (1000, 1001) in got                      # real near-dup survives
    assert all(a >= 1000 for a, _ in got)           # mega-bucket dropped
    metrics = capped.lsh_cap_observation.get
    assert metrics["dropped_buckets"] >= 8          # one per band at least
    assert metrics["dropped_entries"] >= 8 * 300

    # on a corpus with no degenerate buckets the cap is a no-op
    uncapped = minhash_lsh_pairs(df.filter("doc_id >= 1000"), "text", "doc_id",
                                 num_hashes=32, bands=8, max_bucket_size=None)
    assert uncapped.lsh_cap_observation is None
    assert {(r.id_a, r.id_b) for r in uncapped.collect()} == {(1000, 1001)}


def test_cdc_exact_index_sync_matches_recompute(spark):
    """Applying audit batches incrementally must equal rebuilding the index
    from the final corpus — insert, duplicate-creating update, survivor
    deletion, and re-insert across three batches."""
    import datetime as dt

    from cdc_audit_spark.operators.dedup import cdc_exact_index_sync, exact_dedup_groups

    def batch(rows):
        return spark.createDataFrame(
            rows, "doc_id long, text string, audit_event string, audit_pk long")

    def as_corpus(pairs):
        return spark.createDataFrame(pairs, "doc_id long, text string")

    # batch 1: initial inserts (two docs share text 'aa')
    b1 = batch([(1, "aa", "insert", 1), (2, "bb", "insert", 2),
                (3, "aa", "insert", 3)])
    idx, _ = cdc_exact_index_sync(None, b1, "text", "doc_id")
    # batch 2: update 2 onto 'aa' (joins the dup family), delete survivor 1
    b2 = batch([(2, "aa", "update", 4), (1, "aa", "delete", 5)])
    idx, _ = cdc_exact_index_sync(idx, b2, "text", "doc_id")
    # batch 3: re-insert id 1 with fresh text, update 3 away from 'aa'
    b3 = batch([(1, "cc", "insert", 6), (3, "dd", "update", 7)])
    idx, _ = cdc_exact_index_sync(idx, b3, "text", "doc_id")

    final_corpus = as_corpus([(1, "cc"), (2, "aa"), (3, "dd")])
    got = {(r["text_hash"], r["keep_id"], r["n_copies"])
           for r in exact_dedup_groups(
               idx.selectExpr("id as doc_id", "digest as text"), "text", "doc_id"
           ).collect()}
    want = {(r["text_hash"], r["keep_id"], r["n_copies"])
            for r in exact_dedup_groups(
                final_corpus.select("doc_id", F.md5("text").alias("text")),
                "text", "doc_id").collect()}
    assert got == want
    assert idx.count() == 3  # one membership row per live doc


def test_cdc_exact_index_sync_intra_batch_last_wins(spark):
    """A doc updated then deleted in ONE batch must vanish; updated twice
    keeps only the last digest."""
    from cdc_audit_spark.operators.dedup import cdc_exact_index_sync

    base = spark.createDataFrame(
        [(10, "x", "insert", 1), (11, "y", "insert", 2)],
        "doc_id long, text string, audit_event string, audit_pk long")
    idx, _ = cdc_exact_index_sync(None, base, "text", "doc_id")
    b = spark.createDataFrame(
        [(10, "x2", "update", 3), (10, "x3", "delete", 4),
         (11, "y2", "update", 5), (11, "y3", "update", 6)],
        "doc_id long, text string, audit_event string, audit_pk long")
    idx, adds = cdc_exact_index_sync(idx, b, "text", "doc_id")
    rows = {(r["id"], r["digest"]) for r in idx.collect()}
    assert {r[0] for r in rows} == {11}
    import hashlib
    assert rows == {(11, hashlib.md5(b"y3").hexdigest())}
    assert adds.count() == 1


def test_stream_exact_index_sync(spark, tmp_path):
    """Streaming the audit batches must leave the same index a single batch
    application would — state carried via index snapshots + pointer file."""
    import json
    import os

    from cdc_audit_spark.operators.dedup import cdc_exact_index_sync
    from cdc_audit_spark.streaming.stream_dedup import stream_exact_index_sync

    rows = [(1, "aa", "insert", 1), (2, "bb", "insert", 2),
            (3, "aa", "insert", 3), (2, "aa", "update", 4),
            (1, "aa", "delete", 5), (4, "cc", "insert", 6)]
    sch = "doc_id long, text string, audit_event string, audit_pk long"
    src = str(tmp_path / "audit_src")
    # one file per row → forced micro-batches under maxFilesPerTrigger=1
    for i, r in enumerate(rows):
        spark.createDataFrame([r], sch).coalesce(1).write.mode(
            "append").parquet(src)
    idx_dir = str(tmp_path / "index")
    q = stream_exact_index_sync(
        spark, src, spark.read.parquet(src).schema, idx_dir,
        str(tmp_path / "ck"), "text", "doc_id", max_files_per_trigger=1)
    q.awaitTermination(180)

    with open(os.path.join(idx_dir, "_current.json")) as f:
        streamed = spark.read.parquet(json.load(f)["path"])
    batch_index, _ = cdc_exact_index_sync(
        None, spark.createDataFrame(rows, sch), "text", "doc_id")
    assert ({tuple(r) for r in streamed.collect()}
            == {tuple(r) for r in batch_index.collect()})
    assert {r["id"] for r in streamed.collect()} == {2, 3, 4}


def test_cdc_exact_index_sync_random_sequences(spark):
    """Seeded random insert/update/delete sequences across several batches:
    the incrementally-maintained index must equal one built from the final
    corpus state, for every prefix of batches."""
    import random

    from cdc_audit_spark.operators.dedup import cdc_exact_index_sync

    rng = random.Random(42)
    sch = "doc_id long, text string, audit_event string, audit_pk long"
    texts = [f"t{i}" for i in range(6)]  # small text pool → many collisions
    live: dict[int, str] = {}
    idx = None
    pk = 0
    next_id = 0
    for _ in range(4):  # 4 batches
        rows = []
        for _ in range(rng.randint(3, 8)):
            pk += 1
            op = rng.choice(["insert", "update", "delete"])
            if op == "insert" or not live:
                next_id += 1
                txt = rng.choice(texts)
                rows.append((next_id, txt, "insert", pk))
                live[next_id] = txt
            elif op == "update":
                did = rng.choice(sorted(live))
                txt = rng.choice(texts)
                rows.append((did, txt, "update", pk))
                live[did] = txt
            else:
                did = rng.choice(sorted(live))
                rows.append((did, live[did], "delete", pk))
                del live[did]
        idx, _ = cdc_exact_index_sync(
            idx, spark.createDataFrame(rows, sch), "text", "doc_id")
        import hashlib
        want = {(hashlib.md5(t.encode()).hexdigest(), i)
                for i, t in live.items()}
        got = {(r["digest"], r["id"]) for r in idx.collect()}
        assert got == want


def test_stream_exact_index_sync_resumes_from_checkpoint(spark, tmp_path):
    """A second availableNow drain with the same checkpoint must apply only
    NEW audit files — offsets prevent re-applying the first batch."""
    import json
    import os

    from cdc_audit_spark.streaming.stream_dedup import stream_exact_index_sync

    sch = "doc_id long, text string, audit_event string, audit_pk long"
    src = str(tmp_path / "audit_src")
    idx_dir = str(tmp_path / "index")
    ck = str(tmp_path / "ck")
    spark.createDataFrame(
        [(1, "aa", "insert", 1), (2, "bb", "insert", 2)], sch
    ).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    q = stream_exact_index_sync(spark, src, schema, idx_dir, ck,
                                "text", "doc_id")
    q.awaitTermination(120)

    # second wave: delete 1, insert 3 — drained by a NEW query, same ckpt
    spark.createDataFrame(
        [(1, "aa", "delete", 3), (3, "cc", "insert", 4)], sch
    ).coalesce(1).write.mode("append").parquet(src)
    q2 = stream_exact_index_sync(spark, src, schema, idx_dir, ck,
                                 "text", "doc_id")
    q2.awaitTermination(120)

    with open(os.path.join(idx_dir, "_current.json")) as f:
        idx = spark.read.parquet(json.load(f)["path"])
    assert {r["id"] for r in idx.collect()} == {2, 3}


def test_prune_generations_keeps_current_and_newest(spark, tmp_path):
    """GC deletes old snapshots but never the pointer's target, and a
    pruned index state stays fully readable."""
    import json
    import os

    from cdc_audit_spark.streaming.genstate import (
        current_generation,
        prune_generations,
    )
    from cdc_audit_spark.streaming.stream_dedup import stream_exact_index_sync

    sch = "doc_id long, text string, audit_event string, audit_pk long"
    src = str(tmp_path / "src")
    idx_dir = str(tmp_path / "index")
    rows = [(i, f"t{i}", "insert", i) for i in range(1, 6)]
    for r in rows:
        spark.createDataFrame([r], sch).coalesce(1).write.mode(
            "append").parquet(src)
    q = stream_exact_index_sync(
        spark, src, spark.read.parquet(src).schema, idx_dir,
        str(tmp_path / "ck"), "text", "doc_id", max_files_per_trigger=1)
    q.awaitTermination(180)

    gens = sorted(int(d.split("=")[1]) for d in os.listdir(idx_dir)
                  if d.startswith("gen="))
    assert len(gens) == 5
    cur = current_generation(idx_dir)
    assert cur == gens[-1]

    deleted = prune_generations(idx_dir, keep=2)
    assert deleted == gens[:-2]
    left = sorted(int(d.split("=")[1]) for d in os.listdir(idx_dir)
                  if d.startswith("gen="))
    assert left == gens[-2:]
    with open(os.path.join(idx_dir, "_current.json")) as f:
        idx = spark.read.parquet(json.load(f)["path"])
    assert idx.count() == 5  # state fully readable after GC


def test_exact_index_epoch_replay_both_crash_windows(spark, tmp_path):
    """foreachBatch replays an epoch whenever the crash preceded the
    checkpoint commit. Both replay positions must converge: AFTER the
    pointer flip the effects are durable → no-op (without the guard the
    hook overwrites gen=N while reading it via the pointer and wedges the
    stream); BEFORE the flip the epoch re-derives deterministically."""
    from cdc_audit_spark.streaming import genstate
    from cdc_audit_spark.streaming.stream_dedup import (
        apply_exact_index_epoch,
        current_exact_index,
    )

    sch = "doc_id long, text string, audit_event string, audit_pk long"
    b0 = spark.createDataFrame(
        [(1, "aa", "insert", 1), (2, "bb", "insert", 2)], sch)
    b1 = spark.createDataFrame(
        [(2, "aa", "update", 3), (3, "cc", "insert", 4)], sch)
    idx = str(tmp_path / "index")

    apply_exact_index_epoch(spark, idx, b0, 0, "text", "doc_id")
    want0 = {tuple(r) for r in current_exact_index(spark, idx).collect()}

    # replay AFTER the flip: pointer already at epoch 0
    apply_exact_index_epoch(spark, idx, b0, 0, "text", "doc_id")
    assert genstate.current_generation(idx) == 0
    assert {tuple(r)
            for r in current_exact_index(spark, idx).collect()} == want0

    apply_exact_index_epoch(spark, idx, b1, 1, "text", "doc_id")
    want1 = {tuple(r) for r in current_exact_index(spark, idx).collect()}

    # replay BEFORE the flip: gen=1 fully written but pointer rewound to 0
    genstate.flip_pointer(idx, 0, {"path": genstate.generation_dir(idx, 0)})
    apply_exact_index_epoch(spark, idx, b1, 1, "text", "doc_id")
    assert genstate.current_generation(idx) == 1
    assert {tuple(r)
            for r in current_exact_index(spark, idx).collect()} == want1


def test_epoch_applied_run_identity(tmp_path):
    """Epoch ids are checkpoint-scoped: a pointer written by a different
    streaming run must not be compared against this run's epochs (ADVICE
    r04 — a fresh checkpoint against existing state would silently skip
    batches 0..N of the new run). Legacy pointers without a run_id keep
    the old epoch-only comparison."""
    import os

    import pytest

    from cdc_audit_spark.streaming import genstate

    state = str(tmp_path / "state")
    os.makedirs(state)
    genstate.flip_pointer(state, 5, {"path": "p"}, run_id="run-A")

    # same run: monotone-epoch comparison as before
    assert genstate.epoch_applied(state, 5, run_id="run-A")
    assert genstate.epoch_applied(state, 3, run_id="run-A")
    assert not genstate.epoch_applied(state, 6, run_id="run-A")
    # identity unknown on either side: legacy comparison (no silent skip
    # risk — the caller explicitly opted out of identity)
    assert genstate.epoch_applied(state, 5, run_id=None)
    # different run: loud failure, never a guess
    with pytest.raises(genstate.GenerationRunMismatch):
        genstate.epoch_applied(state, 0, run_id="run-B")

    # flip WITHOUT a run_id (transient checkpoint-metadata read failure):
    # the previously recorded identity is carried forward, not erased —
    # one bad epoch must not silently disable the mismatch guard
    genstate.flip_pointer(state, 7, {"path": "p"})
    assert genstate.read_pointer(state)["run_id"] == "run-A"
    assert genstate.epoch_applied(state, 7, run_id="run-A")
    with pytest.raises(genstate.GenerationRunMismatch):
        genstate.epoch_applied(state, 7, run_id="run-B")

    # genuinely legacy pointer (no identity EVER recorded): current run
    # can't validate → legacy epoch-only comparison
    state2 = str(tmp_path / "state2")
    os.makedirs(state2)
    genstate.flip_pointer(state2, 7, {"path": "p"})
    assert genstate.epoch_applied(state2, 7, run_id="run-B")


def test_stream_exact_index_fresh_checkpoint_fails_loudly(spark, tmp_path):
    """Restarting with a DELETED/recreated checkpoint against surviving
    index state must not silently skip the new run's replayed batches —
    the stream dies with GenerationRunMismatch instead of losing the new
    files those batches carry."""
    import shutil

    import pytest

    from cdc_audit_spark.streaming import genstate
    from cdc_audit_spark.streaming.stream_dedup import stream_exact_index_sync

    sch = "doc_id long, text string, audit_event string, audit_pk long"
    src = str(tmp_path / "src")
    idx_dir = str(tmp_path / "index")
    ck = str(tmp_path / "ck")
    spark.createDataFrame([(1, "aa", "insert", 1)], sch).coalesce(1).write.mode(
        "append").parquet(src)
    q = stream_exact_index_sync(
        spark, src, spark.read.parquet(src).schema, idx_dir, ck,
        "text", "doc_id")
    q.awaitTermination(180)
    assert genstate.checkpoint_run_id(ck) is not None
    assert genstate.read_pointer(idx_dir)["run_id"] == \
        genstate.checkpoint_run_id(ck)

    # checkpoint wiped, index kept: the new run replays everything from
    # batch 0 — comparing its epochs with the old pointer would skip them
    shutil.rmtree(ck)
    spark.createDataFrame([(2, "bb", "insert", 2)], sch).coalesce(1).write.mode(
        "append").parquet(src)
    q2 = stream_exact_index_sync(
        spark, src, spark.read.parquet(src).schema, idx_dir, ck,
        "text", "doc_id")
    with pytest.raises(Exception, match="GenerationRunMismatch|different"):
        q2.awaitTermination(180)
        if q2.exception() is not None:
            raise Exception(str(q2.exception()))


def test_semdedup_min_id_survivor_vs_numpy(spark):
    """SemDeDup against a numpy ground truth on planted geometry: two
    tight semantic clusters plus an isolated vector. Within each cell the
    min-id member survives; near-identical larger-id members are pruned;
    cross-cell near-dups are NOT compared (the paper's locality
    trade-off, asserted explicitly)."""
    import numpy as np

    from cdc_audit_spark.operators.dedup import semdedup

    base_a = [1.0, 0.0, 0.0, 0.0]
    base_b = [0.0, 1.0, 0.0, 0.0]
    rows = [
        (0, base_a),                          # centroid 0 seed
        (1, base_b),                          # centroid 1 seed
        (2, [0.99, 0.01, 0.0, 0.0]),          # near-dup of 0 -> pruned
        (3, [0.98, -0.02, 0.01, 0.0]),        # near-dup of 0 -> pruned
        (4, [0.01, 0.97, 0.0, 0.02]),         # near-dup of 1 -> pruned
        (5, [0.0, 0.0, 1.0, 0.0]),            # isolated: kept
        (6, [0.0, 0.0, 0.99, 0.1]),           # near-dup of 5 (same cell as 5's
                                              # nearest centroid) -> pruned iff
                                              # co-assigned with 5
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [base_a, base_b]
    out = {r["vec_id"]: r for r in semdedup(df, cents, threshold=0.90).collect()}

    # numpy ground truth with the same frozen centroids
    v = np.array([r[1] for r in rows])
    c = np.array(cents)
    sims = (v @ c.T) / (np.linalg.norm(v, axis=1)[:, None]
                        * np.linalg.norm(c, axis=1)[None, :])
    cell = sims.argmax(axis=1)  # argmax = lowest index on ties, same contract
    vn = v / np.linalg.norm(v, axis=1)[:, None]
    pair = vn @ vn.T
    for i in range(len(rows)):
        expect_pruned = any(
            pair[i, j] > 0.90 and cell[i] == cell[j] for j in range(i))
        assert out[i]["kept"] == (not expect_pruned), (i, out[i])
        assert out[i]["cell"] == cell[i]

    # the planted facts themselves, so the test can't silently go vacuous
    kept = {i for i in out if out[i]["kept"]}
    assert kept == {0, 1, 5}
    # 5 and 6 share cell 0 with the base_a family, but 6 is pruned by its
    # similarity to 5, not to 0 (cos(6, 0) ~ 0): locality respected
    assert float(pair[6, 0]) < 0.1 and float(pair[6, 5]) > 0.9


def test_duplicate_spans_and_excision_planted(spark):
    """Planted geometry for the Lee-et-al span dedup: a 12-token run
    shared by two docs (cross-doc), an internal repeat inside one doc,
    and a shorter-than-L shared run that must NOT match. Span bounds are
    checked exactly; excision must cut exactly those tokens."""
    from cdc_audit_spark.operators.dedup import duplicate_spans, excise_spans

    shared = " ".join(f"s{i}" for i in range(12))       # 12-token dup run
    short = "x1 x2 x3"                                   # < L: never a span
    d1 = f"a0 a1 a2 {shared} a3 a4 {short} a5"
    d2 = f"b0 {shared} b1 b2 b3 b4 b5 b6 {short}"
    rep = " ".join(f"r{i}" for i in range(6))
    d3 = f"{rep} mid1 mid2 mid3 mid4 mid5 mid6 {rep} tail1 tail2"
    d4 = "lone doc with no duplicated content at all here"
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3), (4, d4)], "doc_id long, text string")

    L = 6
    spans = {
        (r["doc_id"]): (r["span_start"], r["span_end"], r["n_grams"])
        for r in duplicate_spans(df, "text", "doc_id", min_tokens=L)
        .collect()
    }
    # d1: tokens 3..14 are the shared run -> grams at pos 3..9 (7 grams)
    assert spans[1] == (3, 15, 7)
    # d2: shared run at tokens 1..12 -> grams at pos 1..7
    assert spans[2] == (1, 13, 7)
    # d3: rep(6) at 0..5 and again at 12..17 -> exactly-one gram each,
    # two DISJOINT islands would be (0,6) and (12,18) — but both are the
    # same gram, one island each; the groupBy folds per (doc, island)
    rows3 = [
        (r["span_start"], r["span_end"], r["n_grams"])
        for r in duplicate_spans(df, "text", "doc_id", min_tokens=L)
        .filter("doc_id = 3").collect()
    ]
    assert sorted(rows3) == [(0, 6, 1), (12, 18, 1)]
    assert 4 not in spans  # no dup content, no spans

    clean = {
        r["doc_id"]: (r["clean_text"], r["n_dropped_tokens"])
        for r in excise_spans(
            df, duplicate_spans(df, "text", "doc_id", min_tokens=L),
            "text", "doc_id").collect()
    }
    assert clean[1] == (f"a0 a1 a2 a3 a4 {short} a5", 12)
    assert clean[2] == (f"b0 b1 b2 b3 b4 b5 b6 {short}", 12)
    assert clean[3] == ("mid1 mid2 mid3 mid4 mid5 mid6 tail1 tail2", 12)
    assert clean[4] == (d4, 0)  # untouched, token-normalized identity


def test_dedup_components_labels_query(spark, sf_dir):
    """End-to-end query shape: fingerprint-edge connected components over
    the fixture must (a) cover every doc exactly once, (b) agree with a
    driver-side union-find over the same (collected, bounded) edge set,
    (c) label singletons with themselves."""
    from cdc_audit_spark.operators.text import winnow_overlap_pairs
    from cdc_audit_spark.queries import dedup_components_labels, load_tables

    got = {r["doc_id"]: r["component"]
           for r in dedup_components_labels(spark, sf_dir).collect()}
    docs = load_tables(spark, sf_dir)["documents"].filter("doc_id < 4096")
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert set(got) == all_ids  # exactly one label per doc

    edges = [(r["id_a"], r["id_b"]) for r in winnow_overlap_pairs(
        docs, "text", "doc_id", k=5, w=4, min_shared=1
    ).select("id_a", "id_b").collect()]
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = set(parent)
    for i in all_ids:
        want = find(i) if i in touched else i
        assert got[i] == want, (i, got[i], want)


def test_fingerprint_star_edges_linear_in_group_size(spark):
    """The planted hot-fingerprint test: 200 docs sharing every
    fingerprint must produce a LINEAR edge set (199 star rows onto the
    group minimum), not the 19,900-row all-pairs blow-up — and the
    incremental labeling over those edges still equals the one-shot
    closure (everyone labeled with the minimum id)."""
    from cdc_audit_spark.operators.dedup import (
        fingerprint_star_edges,
        incremental_components,
        resolve_component_labels,
    )
    from cdc_audit_spark.operators.text import winnow_fingerprints

    text = ("the exact same boilerplate license header repeated "
            "verbatim in every single document of the corpus")
    docs = spark.createDataFrame(
        [(i, text) for i in range(1, 201)], "doc_id long, text string")
    fps = winnow_fingerprints(docs, "text", "doc_id")
    assert fps.select("fp").distinct().count() >= 1
    edges = fingerprint_star_edges(fps)
    assert edges.count() == 199
    assert edges.filter("id_a = 1").count() == 199

    m, _i, u = incremental_components(docs, "text", "doc_id")
    got = {r["id"]: r["component"]
           for r in resolve_component_labels(m, u).collect()}
    assert got == {i: 1 for i in range(1, 201)}


def test_fingerprint_star_edges_max_fp_df(spark):
    """The hot-fingerprint cap drops over-frequent fingerprints before
    edge generation: groups above the cap witness no edges, groups under
    it are untouched."""
    from cdc_audit_spark.operators.dedup import (
        drop_hot_fingerprints,
        fingerprint_star_edges,
    )

    rows = ([("hot", i) for i in range(10)]
            + [("cold", 100), ("cold", 101)])
    fps = spark.createDataFrame(rows, "fp string, id long")
    capped = fingerprint_star_edges(fps, max_fp_df=5)
    assert [(r["id_a"], r["id_b"]) for r in capped.collect()] == [(100, 101)]
    assert fingerprint_star_edges(fps).count() == 9 + 1
    kept = drop_hot_fingerprints(fps, 5)
    assert {r["fp"] for r in kept.select("fp").distinct().collect()} == {
        "cold"}


def test_connected_components_gate_sides_agree(spark):
    """Both sides of the kernel's size gate (driver union-find vs
    distributed min-label propagation) produce identical labels — for
    long AND string ids — and the driver side is what fixture-scale
    graphs take by default."""
    import random

    from cdc_audit_spark.operators.dedup import connected_components

    rng = random.Random(11)
    edges = {(min(a, b), max(a, b))
             for a, b in ((rng.randrange(500), rng.randrange(500))
                          for _ in range(300)) if a != b}
    df = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
    via_driver = {(r["id"], r["component"])
                  for r in connected_components(df).collect()}
    via_dist = {(r["id"], r["component"])
                for r in connected_components(df, driver_gate=0).collect()}
    assert via_driver == via_dist and via_driver

    sdf = df.selectExpr("concat('k', id_a) as id_a",
                        "concat('k', id_b) as id_b")
    s_driver = {(r["id"], r["component"])
                for r in connected_components(sdf).collect()}
    s_dist = {(r["id"], r["component"])
              for r in connected_components(sdf, driver_gate=0).collect()}
    assert s_driver == s_dist and s_driver


def test_resolve_union_closure_gate_sides_agree(spark):
    """Both sides of the ledger-resolution gate (driver-flattened single
    broadcast join vs the iterative fixpoint loop) resolve chains to the
    same roots, including untouched labels."""
    from cdc_audit_spark.operators.dedup import resolve_union_closure

    unions = spark.createDataFrame(
        [(5, 3), (3, 1), (8, 2), (9, 8)], "child long, parent long")
    labels = spark.createDataFrame(
        [(5,), (3,), (1,), (8,), (9,), (7,)], "label long")
    via_driver = {(r["label"], r["root"]) for r in
                  resolve_union_closure(labels, unions).collect()}
    via_loop = {(r["label"], r["root"]) for r in
                resolve_union_closure(labels, unions,
                                      driver_gate=0).collect()}
    want = {(5, 1), (3, 1), (1, 1), (8, 2), (9, 2), (7, 7)}
    assert via_driver == via_loop == want


def test_connected_components_long_chain_distributed(spark):
    """A 200-node path graph through the DISTRIBUTED kernel (gate forced
    off): pointer halving converges far inside max_iter where plain
    propagation needs 199 rounds — and previously returned unconverged
    labels SILENTLY on any graph deeper than max_iter."""
    from cdc_audit_spark.operators.dedup import connected_components

    df = spark.createDataFrame([(i, i + 1) for i in range(199)],
                               "id_a long, id_b long")
    got = {r["id"]: r["component"]
           for r in connected_components(df, driver_gate=0).collect()}
    assert got == {i: 0 for i in range(200)}


def test_star_edges_closure_equals_pair_closure_random(spark):
    """Property, seeded-random corpora: the star-edge seed must produce
    EXACTLY the same connected components as the all-pairs fingerprint
    join it replaced — the equivalence the r11 quadratic fix rests on."""
    import random

    from cdc_audit_spark.operators.dedup import connected_components
    from cdc_audit_spark.operators.text import (
        winnow_overlap_pairs,
        winnow_star_edges,
    )

    rng = random.Random(23)
    runs = [" ".join(f"r{r}t{j}" for j in range(8)) for r in range(6)]
    for trial in range(3):
        docs = []
        for i in range(30):
            picks = rng.sample(runs, rng.randint(0, 2))
            docs.append((i, " ".join(picks + [f"pad{i}a pad{i}b pad{i}c"])))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        via_pairs = connected_components(
            winnow_overlap_pairs(df, "text", "doc_id", k=5, w=4,
                                 min_shared=1).select("id_a", "id_b"))
        via_star = connected_components(
            winnow_star_edges(df, "text", "doc_id", k=5, w=4))
        a = {(r["id"], r["component"]) for r in via_pairs.collect()}
        b = {(r["id"], r["component"]) for r in via_star.collect()}
        assert a == b, trial


def test_resolve_union_closure_cyclic_ledger_raises(spark):
    """ADVICE r11: a corrupt (cyclic) unions ledger must raise from the
    driver flatten — mirroring the iterative path's max_iter stop —
    instead of hanging the driver forever. Self-loops count as cycles."""
    import pytest

    from cdc_audit_spark.operators.dedup import resolve_union_closure

    labels = spark.createDataFrame([(1,), (2,), (3,)], "label long")
    cyc = spark.createDataFrame([(1, 2), (2, 3), (3, 1)],
                                "child long, parent long")
    with pytest.raises(RuntimeError, match="cycle"):
        resolve_union_closure(labels, cyc)
    loop = spark.createDataFrame([(4, 4)], "child long, parent long")
    with pytest.raises(RuntimeError, match="cycle"):
        resolve_union_closure(labels, loop)


def _semdedup_tables(spark, tmp_path):
    from cdc_audit_spark.sinks.manifest import ManifestTable

    return ManifestTable(spark, str(tmp_path / "semdedup_registry"))


def test_semdedup_epochs_match_batch(spark, sf_dir, tmp_path):
    """CDC-maintained SemDeDup: three ascending-id epochs over the
    fixture embeddings must leave a registry exactly equal to the
    one-shot batch semdedup (kept + cell, value for value), and a
    replayed epoch is a no-op."""
    from cdc_audit_spark.operators.dedup import semdedup
    from cdc_audit_spark.streaming.stream_dedup import apply_semdedup_epoch

    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", "embedding"))
    cents = [[float(x) for x in r[0]]
             for r in emb.filter(F.col("vec_id") < 8)
             .orderBy("vec_id").select("embedding").collect()]
    mx = emb.agg(F.max("vec_id")).first()[0]
    t1, t2 = mx // 3, 2 * mx // 3
    registry = _semdedup_tables(spark, tmp_path)
    for epoch, b in enumerate([
            emb.filter(F.col("vec_id") <= t1),
            emb.filter((F.col("vec_id") > t1) & (F.col("vec_id") <= t2)),
            emb.filter(F.col("vec_id") > t2)]):
        apply_semdedup_epoch(registry, b, epoch, "run0", cents,
                             threshold=0.60)
    got = {r["id"]: (r["cell"], r["kept"])
           for r in registry.read().collect()}
    want = {r["vec_id"]: (r["cell"], r["kept"])
            for r in semdedup(emb, cents, threshold=0.60).collect()}
    assert got == want

    ver = registry.current_version()
    apply_semdedup_epoch(registry, emb.filter(F.col("vec_id") > t2), 2,
                         "run0", cents, threshold=0.60)
    assert registry.current_version() == ver  # replay no-op

    # planted near-dup: a copy of a registered vector (fresh id) arriving
    # in a later epoch must be pruned against the maintained registry
    copy_of = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    dup = spark.createDataFrame([(int(mx) + 1, copy_of)],
                                "vec_id long, embedding array<double>")
    apply_semdedup_epoch(registry, dup, 3, "run0", cents, threshold=0.60)
    got2 = {r["id"]: r["kept"] for r in registry.read().collect()}
    assert got2[int(mx) + 1] is False and got2[0] is True


def test_semdedup_arrival_priority_and_unique_ids(spark, tmp_path):
    """Arrival order is the survivor priority: a later-arriving SMALLER
    id similar to a registered doc is pruned (unlike batch min-id
    semantics — the documented streaming contract), pruned docs still
    prune later arrivals, and duplicate ids refuse loudly both within a
    batch and against the registry."""
    import pytest as _pt

    from cdc_audit_spark.streaming.stream_dedup import apply_semdedup_epoch

    base = [1.0, 0.0, 0.0, 0.0]
    near = [0.99, 0.01, 0.0, 0.0]
    near2 = [0.98, -0.01, 0.01, 0.0]
    cents = [base, [0.0, 1.0, 0.0, 0.0]]
    SCH = "vec_id long, embedding array<double>"
    registry = _semdedup_tables(spark, tmp_path)
    apply_semdedup_epoch(registry, spark.createDataFrame([(10, base)], SCH),
                         0, "run0", cents, threshold=0.90)
    # smaller id arrives later -> IT is pruned, the registered doc stays
    apply_semdedup_epoch(registry, spark.createDataFrame([(3, near)], SCH),
                         1, "run0", cents, threshold=0.90)
    got = {r["id"]: r["kept"] for r in registry.read().collect()}
    assert got == {10: True, 3: False}
    # the pruned doc (3) still prunes a later arrival similar to it
    apply_semdedup_epoch(registry, spark.createDataFrame([(7, near2)], SCH),
                         2, "run0", cents, threshold=0.90)
    assert {r["id"]: r["kept"] for r in registry.read().collect()}[7] is False
    # refusals: in-batch dup id, then a re-registered id
    with _pt.raises(ValueError, match="duplicate document id"):
        apply_semdedup_epoch(
            registry,
            spark.createDataFrame([(99, base), (99, near)], SCH),
            3, "run0", cents, threshold=0.90)
    with _pt.raises(ValueError, match="already registered"):
        apply_semdedup_epoch(registry,
                             spark.createDataFrame([(10, base)], SCH),
                             3, "run0", cents, threshold=0.90)


def test_semdedup_registry_fold_preserves_answers(spark, tmp_path):
    """The cell-clustering fold bounds the registry's dir fan-in without
    changing any kept/cell answer, and later epochs keep pruning against
    the folded state."""
    from cdc_audit_spark.streaming.stream_dedup import (
        apply_semdedup_epoch,
        maybe_cluster_semdedup_registry,
    )

    cents = [[1.0, 0.0], [0.0, 1.0]]
    SCH = "vec_id long, embedding array<double>"
    registry = _semdedup_tables(spark, tmp_path)
    for e in range(6):
        rows = [(10 * e + j, [1.0 - 0.001 * e, 0.001 * j]) for j in range(2)]
        apply_semdedup_epoch(registry, spark.createDataFrame(rows, SCH),
                             e, "run0", cents, threshold=0.95)
    before = {r["id"]: (r["cell"], r["kept"])
              for r in registry.read().collect()}
    assert maybe_cluster_semdedup_registry(registry, max_dirs=1,
                                           n_dirs=2) is not None
    assert len(registry.manifest(registry.current_version())["dirs"]) <= 2
    after = {r["id"]: (r["cell"], r["kept"])
             for r in registry.read().collect()}
    assert after == before
    apply_semdedup_epoch(
        registry, spark.createDataFrame([(900, [0.999, 0.0])], SCH),
        6, "run0", cents, threshold=0.95)
    assert {r["id"]: r["kept"]
            for r in registry.read().collect()}[900] is False


def test_stream_semdedup_sync_end_to_end(spark, tmp_path):
    """The foreachBatch drain: three ascending-id files stream through
    the semdedup registry to exactly the one-shot batch semdedup, and an
    idempotent restart is a no-op."""
    from cdc_audit_spark.operators.dedup import semdedup
    from cdc_audit_spark.sinks.manifest import ManifestTable
    from cdc_audit_spark.streaming.stream_dedup import stream_semdedup_sync

    SCH = "vec_id long, embedding array<double>"
    base = [1.0, 0.0, 0.0, 0.0]
    rows = ([(i, [1.0 - 0.002 * i, 0.002 * i, 0.0, 0.0])
             for i in range(9)]
            + [(9, base), (10, [0.0, 0.0, 1.0, 0.05]),
               (11, [0.0, 0.0, 1.0, 0.04])])
    cents = [base, [0.0, 0.0, 1.0, 0.0]]
    full = spark.createDataFrame(rows, SCH)
    src = str(tmp_path / "src")
    for lo, hi in ((0, 4), (4, 8), (8, 12)):
        (full.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
         .coalesce(1).write.mode("append").parquet(src))
    reg_p = str(tmp_path / "registry")
    q = stream_semdedup_sync(spark, src, SCH, reg_p,
                             str(tmp_path / "ckpt"), cents,
                             threshold=0.90, max_files_per_trigger=1)
    q.awaitTermination(180)
    registry = ManifestTable(spark, reg_p)
    got = {r["id"]: (r["cell"], r["kept"])
           for r in registry.read().collect()}
    want = {r["vec_id"]: (r["cell"], r["kept"])
            for r in semdedup(full, cents, threshold=0.90).collect()}
    assert got == want
    assert not got[11][1]  # the near-dup of 10 was pruned cross-file
    ver = registry.current_version()
    q2 = stream_semdedup_sync(spark, src, SCH, reg_p,
                              str(tmp_path / "ckpt"), cents,
                              threshold=0.90, max_files_per_trigger=1)
    q2.awaitTermination(180)
    assert registry.current_version() == ver  # restart: nothing new


def test_span_index_epochs_later_only_semantics(spark, tmp_path):
    """CDC-maintained span dedup: a batch-internal duplicated span marks
    BOTH copies; a cross-epoch duplicate marks only the LATER copy (the
    documented later-occurrence-only semantics — the copy excision
    cuts); unrelated text marks nothing; a replayed epoch is a no-op;
    and a crash between the spans and gidx commits converges on
    redelivery."""
    import pytest as _pt

    from cdc_audit_spark.sinks.manifest import ManifestTable
    from cdc_audit_spark.streaming.stream_dedup import apply_span_index_epoch

    run = " ".join(f"tok{i}" for i in range(25))          # 25-token run
    other = " ".join(f"alt{i}" for i in range(25))
    uniq = " ".join(f"uniq{i}" for i in range(30))
    SCH = "doc_id long, text string"
    gidx = ManifestTable(spark, str(tmp_path / "gidx"))
    spans = ManifestTable(spark, str(tmp_path / "spans"))

    # epoch 0: docs 1 and 2 share `run` IN THE SAME BATCH -> both marked
    apply_span_index_epoch(
        gidx, spans,
        spark.createDataFrame(
            [(1, f"{run} {uniq}"), (2, f"{other} tail0 {run}")], SCH),
        0, "run0", "text", "doc_id", min_tokens=20)
    got0 = {r["doc_id"]: (r["span_start"], r["span_end"])
            for r in spans.read().collect()}
    assert set(got0) == {1, 2}
    assert got0[1] == (0, 25)           # the shared 25-token prefix
    assert got0[2] == (26, 51)          # after other(25) + tail0(1)

    # epoch 1: doc 3 repeats `other` (cross-epoch) and brings fresh text
    # -> only doc 3 gains a span; doc 2's rows are immutable history
    apply_span_index_epoch(
        gidx, spans,
        spark.createDataFrame([(3, f"{uniq.replace('uniq', 'u2')} {other}")],
                              SCH),
        1, "run0", "text", "doc_id", min_tokens=20)
    got1 = {r["doc_id"]: (r["span_start"], r["span_end"])
            for r in spans.read().filter("doc_id = 3").collect()}
    assert got1 == {3: (30, 55)}
    assert spans.read().filter("doc_id = 2").count() == 1  # unchanged

    # replay: no-op on both tables
    vers = (spans.current_version(), gidx.current_version())
    apply_span_index_epoch(
        gidx, spans,
        spark.createDataFrame([(3, f"{uniq.replace('uniq', 'u2')} {other}")],
                              SCH),
        1, "run0", "text", "doc_id", min_tokens=20)
    assert (spans.current_version(), gidx.current_version()) == vers

    # crash between the spans commit and the gidx commit -> redelivery
    # completes the missing half and the marked spans stay identical
    orig = gidx.append
    gidx.append = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("simulated crash"))
    batch2 = spark.createDataFrame([(4, f"{run} closing4")], SCH)
    with _pt.raises(RuntimeError, match="simulated crash"):
        apply_span_index_epoch(gidx, spans, batch2, 2, "run0",
                               "text", "doc_id", min_tokens=20)
    assert spans.epoch_applied(2, "run0")
    assert not gidx.epoch_applied(2, "run0")
    gidx.append = orig
    sp_ver = spans.current_version()
    apply_span_index_epoch(gidx, spans, batch2, 2, "run0",
                           "text", "doc_id", min_tokens=20)
    assert spans.current_version() == sp_ver  # spans half skipped
    assert gidx.epoch_applied(2, "run0")
    got2 = {r["doc_id"]: (r["span_start"], r["span_end"])
            for r in spans.read().filter("doc_id = 4").collect()}
    assert got2 == {4: (0, 25)}  # `run` is corpus history -> marked


def test_span_index_fold_keeps_pruned_reads_correct(spark, tmp_path):
    """The digest-clustering fold bounds the gram index's dir fan-in,
    and epochs after it still resolve corpus history through the pruned
    read."""
    from cdc_audit_spark.sinks.manifest import ManifestTable
    from cdc_audit_spark.streaming.stream_dedup import (
        apply_span_index_epoch,
        maybe_cluster_gram_index,
    )

    SCH = "doc_id long, text string"
    gidx = ManifestTable(spark, str(tmp_path / "gidx"))
    spans = ManifestTable(spark, str(tmp_path / "spans"))
    runs = [" ".join(f"e{e}w{i}" for i in range(22)) for e in range(5)]
    for e in range(5):
        apply_span_index_epoch(
            gidx, spans,
            spark.createDataFrame([(10 * e, runs[e])], SCH),
            e, "run0", "text", "doc_id", min_tokens=20)
    assert spans.read().count() == 0  # all unique so far
    assert maybe_cluster_gram_index(gidx, max_dirs=1, n_dirs=2) is not None
    assert len(gidx.manifest(gidx.current_version())["dirs"]) <= 2
    # a repeat of epoch-1 text arriving after the fold is still caught
    apply_span_index_epoch(
        gidx, spans,
        spark.createDataFrame([(99, runs[1] + " coda99")], SCH),
        5, "run0", "text", "doc_id", min_tokens=20)
    got = {r["doc_id"]: (r["span_start"], r["span_end"])
           for r in spans.read().collect()}
    assert got == {99: (0, 22)}
