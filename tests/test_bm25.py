"""BM25 retrieval tier: postings build vs brute force, scan ≡ index
scoring, signed-delta maintenance algebra, the exactly-once O(delta)
manifest stream, RRF fusion, and the A-ES weighted WOR sampler."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

from pyspark.sql import functions as F

from cdc_audit_spark.operators.bm25 import (
    bm25_posting_delta,
    bm25_postings,
    bm25_score_scan,
    bm25_topk,
    bm25_topk_postings,
    fold_bm25_postings,
    incremental_bm25_postings,
    rrf_fuse,
    with_rank,
)

SCH = ("doc_id long, text string, audit_event string, "
       "audit_timestamp timestamp, audit_pk long")
TS = dt.datetime(2026, 1, 1)

CORPUS = [
    (1, "the cat sat on the mat the cat"),
    (2, "the dog ate the fish and the dog ran"),
    (3, "a dog sat on a log near the cat"),
    (4, "fish fish fish and one cat"),
]


def _brute_postings(rows):
    out = {}
    for i, text in rows:
        for w in [t for t in __import__("re").split(r"[^a-z0-9]+",
                                                    text.lower()) if t]:
            out[(w, i)] = out.get((w, i), 0) + 1
    return out


def _brute_bm25(rows, terms, k1=1.2, b=0.75):
    post = _brute_postings(rows)
    docs = sorted({i for _, i in post})
    dl = {i: sum(c for (_, d), c in post.items() if d == i) for i in docs}
    n = len(docs)
    avgdl = sum(dl.values()) / n
    scores = {}
    for i in docs:
        m = 0
        for t in terms:
            tf = post.get((t, i), 0)
            if tf == 0:
                continue
            df = sum(1 for (w, _), _c in post.items() if w == t)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            raw = idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b) + k1 * b * dl[i] / avgdl)
            m += math.floor(raw * 1e6 + 0.5)
        if m > 0:
            scores[i] = m
    return scores


def test_postings_match_brute_force(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {(r["term"], r["doc_id"]): r["tf"]
           for r in bm25_postings(df, "text", "doc_id").collect()}
    assert got == _brute_postings(CORPUS)


def test_scan_scores_match_brute_force(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {r["doc_id"]: r["score_micro"]
           for r in bm25_score_scan(df, "text", "doc_id",
                                    ["cat", "fish"]).collect()}
    assert got == _brute_bm25(CORPUS, ["cat", "fish"])


def test_scan_and_index_topk_agree(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    terms = ["dog", "fish", "mat"]
    scan = [(r["doc_id"], r["score_micro"], r["n_hit_terms"])
            for r in bm25_topk(df, "text", "doc_id", terms, 3).collect()]
    post = bm25_postings(df, "text", "doc_id")
    idx = [(r["doc_id"], r["score_micro"], r["n_hit_terms"])
           for r in bm25_topk_postings(post, "doc_id", terms, 3).collect()]
    assert scan == idx
    assert len(scan) == 3


def test_scan_scoring_plan_has_no_exchange(spark):
    """The scoring pass is a pure map-side projection — zero corpus
    shuffles (the bounded stats aggregate is a separate tiny job)."""
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    plan = bm25_score_scan(df, "text", "doc_id", ["cat"])._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_posting_delta_algebra_matches_rebuild(spark):
    base = spark.createDataFrame(CORPUS, "doc_id long, text string")
    batch = spark.createDataFrame(
        [(2, CORPUS[1][1], "delete", TS, 10),
         (3, "the cat and the cat again", "update", TS, 11),
         (5, "brand new dog text", "insert", TS, 12)], SCH)
    final = [CORPUS[0], (3, "the cat and the cat again"),
             CORPUS[3], (5, "brand new dog text")]
    got = {(r["term"], r["doc_id"]): r["tf"]
           for r in incremental_bm25_postings(base, batch, "text",
                                              ["doc_id"]).collect()}
    assert got == _brute_postings(final)


def test_noop_update_yields_empty_delta(spark):
    """An update that re-states the same text nets to zero — no churn
    commits to the LSM."""
    base = spark.createDataFrame(CORPUS, "doc_id long, text string")
    batch = spark.createDataFrame([(1, CORPUS[0][1], "update", TS, 10)], SCH)
    assert bm25_posting_delta(base, batch, "text", ["doc_id"]).count() == 0


def test_fold_collapses_delta_stack(spark):
    base = spark.createDataFrame(CORPUS[:2], "doc_id long, text string")
    boot = bm25_postings(base, "text", "doc_id")
    b1 = spark.createDataFrame([(1, "only fish now", "update", TS, 10)], SCH)
    d1 = bm25_posting_delta(base, b1, "text", ["doc_id"])
    folded = fold_bm25_postings(boot.unionByName(d1), "doc_id")
    expect = _brute_postings([(1, "only fish now"), CORPUS[1]])
    got = {(r["term"], r["doc_id"]): r["tf"] for r in folded.collect()}
    assert got == expect


def test_stream_bm25_manifest_matches_rebuild_and_is_o_delta(spark, tmp_path):
    """availableNow drain over three audit files: the folded postings
    equal indexing the final corpus; every post-bootstrap postings commit
    is an append (LSM), the base commits are dir-granular merges; a
    restarted drain applies only new files."""
    from cdc_audit_spark.sinks.manifest import ManifestTable
    from cdc_audit_spark.streaming.stream_bm25 import (
        current_manifest_bm25,
        stream_bm25_sync_manifest,
    )

    src = str(tmp_path / "audit_src")
    batches = [
        [(i, t, "insert", TS, i) for i, t in CORPUS[:3]],
        [(4, CORPUS[3][1], "insert", TS, 10)],
        [(2, "the dog only", "update", TS, 11),
         (3, CORPUS[2][1], "delete", TS, 12)],
    ]
    for rows in batches:
        spark.createDataFrame(rows, SCH).coalesce(1).write.mode(
            "append").parquet(src)

    base_p, post_p = str(tmp_path / "base_t"), str(tmp_path / "post_t")
    ck = str(tmp_path / "ck")
    schema = spark.read.parquet(src).schema
    q = stream_bm25_sync_manifest(spark, src, schema, base_p, post_p, ck,
                                  "text", ["doc_id"],
                                  max_files_per_trigger=1)
    q.awaitTermination(240)

    final = [CORPUS[0], (2, "the dog only"), CORPUS[3]]
    base, postings = current_manifest_bm25(spark, base_p, post_p, "doc_id")
    got = {(r["term"], r["doc_id"]): r["tf"] for r in postings.collect()}
    assert got == _brute_postings(final)
    assert {(r["doc_id"], r["text"])
            for r in base.select("doc_id", "text").collect()} == set(final)

    post_t = ManifestTable(spark, post_p)
    base_t = ManifestTable(spark, base_p)
    assert all(post_t.manifest(v)["action"] == "append"
               for v in post_t.versions())
    acts = [base_t.manifest(v)["action"] for v in base_t.versions()]
    assert "overwrite" not in acts[1:]

    spark.createDataFrame([(1, CORPUS[0][1], "delete", TS, 13)], SCH
                          ).coalesce(1).write.mode("append").parquet(src)
    q2 = stream_bm25_sync_manifest(spark, src, schema, base_p, post_p, ck,
                                   "text", ["doc_id"])
    q2.awaitTermination(120)
    _, postings2 = current_manifest_bm25(spark, base_p, post_p, "doc_id")
    got2 = {(r["term"], r["doc_id"]): r["tf"] for r in postings2.collect()}
    assert got2 == _brute_postings(final[1:])


def test_bm25_half_committed_replay_window(spark, tmp_path):
    """Crash between the postings append and the base merge: the replay
    skips the committed half (epoch guard) and catches the base up
    (watermark guard); replaying the whole epoch again is a no-op."""
    from cdc_audit_spark.sinks.manifest import ManifestTable
    from cdc_audit_spark.streaming.stream_bm25 import (
        apply_bm25_manifest_epoch,
        current_manifest_bm25,
    )

    base_t = ManifestTable(spark, str(tmp_path / "base_t"))
    post_t = ManifestTable(spark, str(tmp_path / "post_t"))
    b0 = spark.createDataFrame(
        [(i, t, "insert", TS, i) for i, t in CORPUS], SCH)
    apply_bm25_manifest_epoch(base_t, post_t, b0, 0, "r1", "text", ["doc_id"])

    b1 = spark.createDataFrame(
        [(2, "the dog only", "update", TS, 10)], SCH)
    half = bm25_posting_delta(base_t.read(), b1, "text", ["doc_id"])
    post_t.append(half, extra={"epoch": 1, "run_id": "r1"})

    apply_bm25_manifest_epoch(base_t, post_t, b1, 1, "r1", "text", ["doc_id"])
    final = [CORPUS[0], (2, "the dog only"), CORPUS[2], CORPUS[3]]
    _, got = current_manifest_bm25(spark, base_t.path, post_t.path, "doc_id")
    expect = _brute_postings(final)
    assert {(r["term"], r["doc_id"]): r["tf"]
            for r in got.collect()} == expect

    apply_bm25_manifest_epoch(base_t, post_t, b1, 1, "r1", "text", ["doc_id"])
    _, again = current_manifest_bm25(spark, base_t.path, post_t.path,
                                     "doc_id")
    assert {(r["term"], r["doc_id"]): r["tf"]
            for r in again.collect()} == expect


def test_serving_states_maintained_o_delta_and_exact(spark, tmp_path):
    """The serving side states (norms LSM + scalar stats ledger) stay
    exact under insert/update/delete epochs: folded norms ≡ brute-force
    doc lengths, folded stats ≡ (N, total tokens), and the served top-k
    ≡ the scan-form top-k on the final corpus. All side-state commits
    are appends; replaying the last epoch is a durable no-op."""
    from cdc_audit_spark.sinks.manifest import ManifestTable
    from cdc_audit_spark.streaming.stream_bm25 import (
        apply_bm25_manifest_epoch,
        current_serving_bm25,
        fold_bm25_stats,
    )
    from cdc_audit_spark.operators.bm25 import bm25_topk_served

    base_t = ManifestTable(spark, str(tmp_path / "base_t"))
    post_t = ManifestTable(spark, str(tmp_path / "post_t"))
    norms_t = ManifestTable(spark, str(tmp_path / "norms_t"))
    stats_t = ManifestTable(spark, str(tmp_path / "stats_t"))

    epochs = [
        [(i, t, "insert", TS, i) for i, t in CORPUS[:3]],
        [(4, CORPUS[3][1], "insert", TS, 10)],
        [(2, "the dog only", "update", TS, 11),
         (3, CORPUS[2][1], "delete", TS, 12)],
    ]
    for e, rows in enumerate(epochs):
        apply_bm25_manifest_epoch(
            base_t, post_t, spark.createDataFrame(rows, SCH), e, "r1",
            "text", ["doc_id"], norms_t=norms_t, stats_t=stats_t)

    final = [CORPUS[0], (2, "the dog only"), CORPUS[3]]
    brute = _brute_postings(final)
    exp_norms = {}
    for (_t, d), c in brute.items():
        exp_norms[d] = exp_norms.get(d, 0) + c

    postings, norms, n_docs, total = current_serving_bm25(
        spark, post_t.path, norms_t.path, stats_t.path, "doc_id")
    assert {r["doc_id"]: r["dl"] for r in norms.collect()} == exp_norms
    assert n_docs == len(exp_norms)
    assert total == sum(exp_norms.values())

    terms = ["dog", "fish", "cat"]
    served = [(r["doc_id"], r["score_micro"]) for r in bm25_topk_served(
        postings, norms, n_docs, total, "doc_id", terms, 3).collect()]
    scan = [(r["doc_id"], r["score_micro"]) for r in bm25_topk(
        spark.createDataFrame(final, "doc_id long, text string"),
        "text", "doc_id", terms, 3).collect()]
    assert served == scan

    for t in (post_t, norms_t, stats_t):
        assert all(t.manifest(v)["action"] == "append"
                   for v in t.versions())

    # durable no-op on full-epoch replay (all guards skip)
    apply_bm25_manifest_epoch(
        base_t, post_t, spark.createDataFrame(epochs[-1], SCH), 2, "r1",
        "text", ["doc_id"], norms_t=norms_t, stats_t=stats_t)
    _, norms2, n2, t2 = current_serving_bm25(
        spark, post_t.path, norms_t.path, stats_t.path, "doc_id")
    assert {r["doc_id"]: r["dl"] for r in norms2.collect()} == exp_norms
    assert (n2, t2) == (n_docs, total)
    assert fold_bm25_stats(stats_t.read()) == (n_docs, total)


def test_serving_half_committed_stats_replay(spark, tmp_path):
    """Crash after the postings + norms appends but before the stats
    append: the replay recomputes the identical delta from the still-
    pre-merge base, reads the PINNED pre-epoch norms, and lands only the
    missing stats row — the ledger never double-counts."""
    from cdc_audit_spark.operators.bm25 import bm25_norms_delta
    from cdc_audit_spark.sinks.manifest import ManifestTable
    from cdc_audit_spark.streaming.stream_bm25 import (
        apply_bm25_manifest_epoch,
        current_serving_bm25,
    )

    base_t = ManifestTable(spark, str(tmp_path / "base_t"))
    post_t = ManifestTable(spark, str(tmp_path / "post_t"))
    norms_t = ManifestTable(spark, str(tmp_path / "norms_t"))
    stats_t = ManifestTable(spark, str(tmp_path / "stats_t"))
    b0 = spark.createDataFrame(
        [(i, t, "insert", TS, i) for i, t in CORPUS], SCH)
    apply_bm25_manifest_epoch(base_t, post_t, b0, 0, "r1", "text",
                              ["doc_id"], norms_t=norms_t, stats_t=stats_t)

    # simulate the crash: epoch 1's postings + norms halves commit, the
    # stats append and the base merge never run
    b1 = spark.createDataFrame(
        [(2, "the dog only", "update", TS, 20),
         (4, CORPUS[3][1], "delete", TS, 21)], SCH)
    half = bm25_posting_delta(base_t.read(), b1, "text", ["doc_id"])
    post_t.append(half, extra={"epoch": 1, "run_id": "r1"})
    norms_t.append(bm25_norms_delta(half, "doc_id"),
                   extra={"epoch": 1, "run_id": "r1"})

    apply_bm25_manifest_epoch(base_t, post_t, b1, 1, "r1", "text",
                              ["doc_id"], norms_t=norms_t, stats_t=stats_t)
    final = [CORPUS[0], (2, "the dog only"), CORPUS[2]]
    exp_norms = {}
    for (_t, d), c in _brute_postings(final).items():
        exp_norms[d] = exp_norms.get(d, 0) + c
    _, norms, n_docs, total = current_serving_bm25(
        spark, post_t.path, norms_t.path, stats_t.path, "doc_id")
    assert {r["doc_id"]: r["dl"] for r in norms.collect()} == exp_norms
    assert (n_docs, total) == (len(exp_norms), sum(exp_norms.values()))


def test_rrf_fuse_matches_hand_computation(spark):
    a = spark.createDataFrame([(10, 1), (20, 2), (30, 3)],
                              "doc_id long, rank long")
    b = spark.createDataFrame([(20, 1), (40, 2)], "doc_id long, rank long")
    got = {r["doc_id"]: (r["rrf_score"], r["rank_a"], r["rank_b"])
           for r in rrf_fuse(a, b, "doc_id", 10).collect()}
    assert got == {
        10: (1 / 61, 1, None),
        20: (1 / 62 + 1 / 61, 2, 1),
        30: (1 / 63, 3, None),
        40: (1 / 62, None, 2),
    }
    # ordering: fused doc 20 first, then the better single-list docs
    order = [r["doc_id"] for r in rrf_fuse(a, b, "doc_id", 10).collect()]
    assert order == [20, 10, 40, 30]


def test_with_rank_is_one_based_and_tie_broken(spark):
    df = spark.createDataFrame([(5, 100), (7, 100), (2, 300)],
                               "doc_id long, score_micro long")
    got = [(r["doc_id"], r["rank"]) for r in with_rank(
        df, [F.desc("score_micro")], "doc_id").orderBy("rank").collect()]
    assert got == [(2, 1), (5, 2), (7, 3)]


def test_weighted_sample_wor_matches_python_mirror(spark):
    """Exact mirror of the A-ES key math (md5-prefix uniform, ln(u)/w,
    micro-quantized) — the same arithmetic the DuckDB oracle runs."""
    from cdc_audit_spark.operators.sampling import weighted_sample_wor

    rows = [(i, (i % 7) + 1) for i in range(1, 201)]
    df = spark.createDataFrame(rows, "doc_id long, w long")

    def key(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16)
        u = (h + 1) / 16777217.0
        return math.floor(math.log(u) / w * 1e12 + 0.5)

    expect = sorted(rows, key=lambda r: (-key(*r), r[0]))[:25]
    got = [(r["doc_id"], r["w"]) for r in
           weighted_sample_wor(df, "doc_id", "w", 25).collect()]
    assert got == expect
    micro = {r["doc_id"]: r["es_key_micro"] for r in
             weighted_sample_wor(df, "doc_id", "w", 25).collect()}
    assert micro == {i: key(i, w) for i, w in expect}


def test_postings_term_filter_pushes_to_parquet_scan(spark, tmp_path):
    """The serving tier's candidate selection (term IN query) reaches the
    parquet scan as a pushed filter — at scale, a term-sorted postings
    layout then prunes row groups, so only candidate bytes are read."""
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    path = str(tmp_path / "postings")
    bm25_postings(df, "text", "doc_id").write.parquet(path)
    stored = spark.read.parquet(path)
    cand = stored.filter(F.col("term").isin(["dog", "fish"]))
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(term, [dog,fish])" in plan


def test_hybrid_retrieval_served_from_maintained_state_only(spark, tmp_path):
    """The capstone composition: a corpus with text AND embeddings is
    mutated through audit epochs; the BM25 serving states and the ANN
    serving projection are each maintained O(delta); hybrid RRF served
    from MAINTAINED STATE ONLY equals recomputing both retrievers from
    scratch on the final corpus — no corpus rescan anywhere on the
    serving path."""
    from cdc_audit_spark.operators.bm25 import bm25_topk_served
    from cdc_audit_spark.operators.similarity import (
        cosine_topk,
        sample_centroids,
    )
    from cdc_audit_spark.sinks.manifest import ManifestTable
    from cdc_audit_spark.streaming.stream_ann import (
        ann_serving_topk,
        cdc_ann_serving_sync,
    )
    from cdc_audit_spark.streaming.stream_bm25 import (
        apply_bm25_manifest_epoch,
        current_serving_bm25,
    )

    words = ["cat", "dog", "fish", "owl", "ant", "bee"]

    def text_of(i):
        return " ".join(words[(i + j) % len(words)]
                        for j in range((i % 4) + 2))

    def emb_of(i):
        return [float(((i * (j + 3)) % 17) - 8.0) for j in range(4)]

    n0 = 40
    docs = [(i, text_of(i)) for i in range(n0)]
    vecs = [(i, emb_of(i)) for i in range(n0)]

    base_t = ManifestTable(spark, str(tmp_path / "base_t"))
    post_t = ManifestTable(spark, str(tmp_path / "post_t"))
    norms_t = ManifestTable(spark, str(tmp_path / "norms_t"))
    stats_t = ManifestTable(spark, str(tmp_path / "stats_t"))
    srv = ManifestTable(spark, str(tmp_path / "srv"))
    emb_df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    cents = sample_centroids(emb_df, 3)

    def tbatch(rows, pk0):
        return spark.createDataFrame(
            [(i, t, e, TS, pk0 + n) for n, (i, t, e) in enumerate(rows)], SCH)

    def vbatch(rows, pk0):
        return spark.createDataFrame(
            [(i, v, e, pk0 + n) for n, (i, v, e) in enumerate(rows)],
            "vec_id long, embedding array<float>, audit_event string, "
            "audit_pk long")

    # epoch 0: bootstrap inserts on both modalities
    apply_bm25_manifest_epoch(
        base_t, post_t, tbatch([(i, t, "insert") for i, t in docs], 1), 0,
        "r1", "text", ["doc_id"], norms_t=norms_t, stats_t=stats_t)
    cdc_ann_serving_sync(
        srv, vbatch([(i, v, "insert") for i, v in vecs], 1), cents)

    # epoch 1: coordinated update/delete/insert mix
    t1 = [(3, "owl owl owl cat", "update"), (7, docs[7][1], "delete"),
          (100, "bee ant bee ant fish", "insert")]
    v1 = [(3, [9.0, -1.0, 0.5, 2.0], "update"), (7, vecs[7][1], "delete"),
          (100, [1.0, 8.0, -3.0, 0.25], "insert")]
    apply_bm25_manifest_epoch(
        base_t, post_t, tbatch(t1, 100), 1, "r1", "text", ["doc_id"],
        norms_t=norms_t, stats_t=stats_t)
    cdc_ann_serving_sync(srv, vbatch(v1, 100), cents)

    final_docs = [(i, t) for i, t in docs if i not in (3, 7)] + \
        [(3, "owl owl owl cat"), (100, "bee ant bee ant fish")]
    final_vecs = [(i, v) for i, v in vecs if i not in (3, 7)] + \
        [(3, [9.0, -1.0, 0.5, 2.0]), (100, [1.0, 8.0, -3.0, 0.25])]

    # --- serve from maintained state only
    postings, norms, n_docs, total = current_serving_bm25(
        spark, post_t.path, norms_t.path, stats_t.path, "doc_id")
    terms, qv = ["owl", "cat"], [4.0, 2.0, -1.0, 0.5]
    bm_served = with_rank(
        bm25_topk_served(postings, norms, n_docs, total, "doc_id",
                         terms, 10),
        [F.desc("score_micro")], "doc_id")
    cos_served = with_rank(
        ann_serving_topk(srv, cents, qv, k=10, nprobe=len(cents)),
        [F.desc("cos_sim")], "vec_id").withColumnRenamed("vec_id", "doc_id")
    got = [(r["doc_id"], r["rrf_score"]) for r in
           rrf_fuse(bm_served, cos_served, "doc_id", 8).collect()]

    # --- recompute both retrievers from scratch on the final corpus
    fdocs = spark.createDataFrame(final_docs, "doc_id long, text string")
    fvecs = spark.createDataFrame(final_vecs,
                                  "vec_id long, embedding array<float>")
    bm_fresh = with_rank(bm25_topk(fdocs, "text", "doc_id", terms, 10),
                         [F.desc("score_micro")], "doc_id")
    cos_fresh = with_rank(cosine_topk(fvecs, qv, 10),
                          [F.desc("cos_sim")], "vec_id"
                          ).withColumnRenamed("vec_id", "doc_id")
    want = [(r["doc_id"], r["rrf_score"]) for r in
            rrf_fuse(bm_fresh, cos_fresh, "doc_id", 8).collect()]
    assert got == want


def test_multiquery_topk_matches_per_query_scan(spark):
    """bm25_topk_join over a query set ≡ running the single-query scan
    scorer per query — same micro scores, same per-query cut."""
    from cdc_audit_spark.operators.bm25 import (
        bm25_norms,
        bm25_topk_join,
        postings_corpus_stats,
    )

    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    queries = {7: ["cat", "mat"], 8: ["dog", "fish"], 9: ["log"]}
    postings = bm25_postings(df, "text", "doc_id")
    norms = bm25_norms(postings, "doc_id")
    n, total = postings_corpus_stats(postings, "doc_id")
    got = {}
    for r in bm25_topk_join(postings, norms, n, total, "doc_id",
                            queries, 2).collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score_micro"]))
    for qid, terms in queries.items():
        want = [(r["doc_id"], r["score_micro"]) for r in
                bm25_topk(df, "text", "doc_id", terms, 2).collect()]
        assert sorted(got[qid], key=lambda x: (-x[1], x[0])) == want, qid


def test_empty_docs_dont_skew_stats_across_paths(spark):
    """N/avgdl convention: token-less docs (empty or punctuation-only)
    never create a posting, so the index paths can't count them. The
    scan path must use the SAME convention — before the fix it counted
    them in count(*), making idf/avgdl (hence scores) diverge between
    the scan and index/served paths on any corpus with an empty doc."""
    rows = CORPUS + [(9, ""), (10, "!!! ???"), (11, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["cat", "fish", "dog"]
    scan = [(r["doc_id"], r["score_micro"])
            for r in bm25_topk(df, "text", "doc_id", terms, 4).collect()]
    idx = [(r["doc_id"], r["score_micro"]) for r in bm25_topk_postings(
        bm25_postings(df, "text", "doc_id"), "doc_id", terms, 4).collect()]
    assert scan == idx
    # and both equal the brute force over the token-bearing docs only
    brute = _brute_bm25(CORPUS, terms)
    assert dict(scan) == dict(
        sorted(brute.items(), key=lambda x: (-x[1], x[0]))[:4])


def test_duplicate_query_terms_deduped_on_every_path(spark):
    """A duplicated query term must score once everywhere: the scan path
    used to count it per occurrence, the served path once, and the batch
    join twice — three behaviors. All entry points now dedupe."""
    from cdc_audit_spark.operators.bm25 import (
        bm25_norms,
        bm25_topk_join,
        bm25_topk_served,
        postings_corpus_stats,
    )

    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    dup, uniq = ["cat", "fish", "cat", "cat"], ["cat", "fish"]
    want = [(r["doc_id"], r["score_micro"], r["n_hit_terms"])
            for r in bm25_topk(df, "text", "doc_id", uniq, 4).collect()]
    scan = [(r["doc_id"], r["score_micro"], r["n_hit_terms"])
            for r in bm25_topk(df, "text", "doc_id", dup, 4).collect()]
    assert scan == want

    postings = bm25_postings(df, "text", "doc_id")
    norms = bm25_norms(postings, "doc_id")
    n, total = postings_corpus_stats(postings, "doc_id")
    served = [(r["doc_id"], r["score_micro"], r["n_hit_terms"])
              for r in bm25_topk_served(postings, norms, n, total, "doc_id",
                                        dup, 4).collect()]
    assert served == want

    joined = sorted(
        ((r["doc_id"], r["score_micro"], r["n_hit_terms"])
         for r in bm25_topk_join(postings, norms, n, total, "doc_id",
                                 {1: dup}, 4).collect()),
        key=lambda x: (-x[1], x[0]))
    assert joined == want


def test_weighted_sample_wor_excludes_nonpositive_weights(spark):
    """Zero weight = zero inclusion probability by definition; a negative
    weight would flip the key sign and always win — both are excluded up
    front rather than silently mis-sampled."""
    from cdc_audit_spark.operators.sampling import weighted_sample_wor

    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -4), (4, 2), (5, 1)], "doc_id long, w long")
    got = {r["doc_id"] for r in
           weighted_sample_wor(df, "doc_id", "w", 10).collect()}
    assert got == {1, 4, 5}


def test_weighted_sample_wor_refuses_overflowing_weights(spark):
    """A weight small enough that ln(u)/w * micro exceeds int64 would
    silently CLAMP under the non-ANSI double->long cast, collapsing keys
    to Long.MIN and destroying weight-proportionality — such rows raise
    instead."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    from cdc_audit_spark.operators.sampling import weighted_sample_wor

    df = spark.createDataFrame(
        [(1, 2.0), (2, 1e-9), (3, 3.0)], "doc_id long, w double")
    with pytest.raises((Py4JJavaError, PySparkException),
                       match="below safe minimum"):
        weighted_sample_wor(df, "doc_id", "w", 3).collect()

    # weights above the documented minimum are untouched by the guard
    ok = spark.createDataFrame(
        [(1, 2.0), (2, 0.001), (3, 3.0)], "doc_id long, w double")
    assert weighted_sample_wor(ok, "doc_id", "w", 3).count() == 3


def test_bm25_serving_layout_skips_dirs(spark, tmp_path):
    """VERDICT r09 #3 'done' criterion: the fold cadence lands the
    postings TERM-CLUSTERED and the norms ID-CLUSTERED, so a 2-term
    query's candidate read LISTS a fraction of the postings dirs (the
    ANN serving-probe pattern at the manifest level) and the norms dirs
    carry id ranges the maintenance epochs' pinned reads prune on; the
    candidate-bounded served top-k still equals the scan scorer on the
    final corpus."""
    from cdc_audit_spark.sinks.manifest import ManifestTable
    from cdc_audit_spark.streaming.stream_bm25 import (
        apply_bm25_manifest_epoch,
        current_serving_bm25,
    )
    from cdc_audit_spark.operators.bm25 import bm25_topk_served

    def text_of(i):
        return " ".join(f"w{(i * 7 + j) % 50:03d}" for j in range(6))

    base_t = ManifestTable(spark, str(tmp_path / "base_t"))
    post_t = ManifestTable(spark, str(tmp_path / "post_t"))
    norms_t = ManifestTable(spark, str(tmp_path / "norms_t"))
    stats_t = ManifestTable(spark, str(tmp_path / "stats_t"))

    docs = {i: text_of(i) for i in range(200)}
    epochs = [[(i, t, "insert", TS, i + 1) for i, t in docs.items()]]
    pk = 1000
    for e in range(1, 5):  # four tiny update epochs force the fold
        i = e * 13
        docs[i] = f"updated text number w{e:03d}"
        epochs.append([(i, docs[i], "update", TS, pk + e)])
    for e, rows in enumerate(epochs):
        apply_bm25_manifest_epoch(
            base_t, post_t, spark.createDataFrame(rows, SCH), e, "r1",
            "text", ["doc_id"], norms_t=norms_t, stats_t=stats_t,
            fold_max_dirs=3)

    # postings: the fold left a term-clustered layout; a 2-term query
    # lists a fraction of it
    pm = post_t.manifest(post_t.current_version())
    assert len(pm["dirs"]) >= 6
    q = ["w001", "w048"]
    cand = post_t.dirs_pruned_any("term", q)
    assert len(cand) <= 2 < len(pm["dirs"])

    # norms: id-clustered fold — dirs carry merge-key ranges, so
    # read_pruned_for_keys skips them
    nm = norms_t.manifest(norms_t.current_version())
    assert len(nm["dirs"]) >= 6
    assert all("pk_min" in nm["dir_meta"][d] for d in nm["dirs"])
    touched = spark.createDataFrame([(13,)], "doc_id long")
    reads = []
    orig = norms_t._read_dirs_dv

    def spy(m, dirs, at_version=None):
        reads.append(list(dirs))
        return orig(m, dirs, at_version=at_version)

    norms_t._read_dirs_dv = spy
    assert norms_t.read_pruned_for_keys(touched, "doc_id").count() == 1
    norms_t._read_dirs_dv = orig
    assert reads and max(len(d) for d in reads) <= 2 < len(nm["dirs"])

    # serving from the candidate-bounded read equals the scan scorer
    postings, norms, n_docs, total = current_serving_bm25(
        spark, post_t.path, norms_t.path, stats_t.path, "doc_id",
        terms=q)
    served = [(r["doc_id"], r["score_micro"]) for r in bm25_topk_served(
        postings, norms, n_docs, total, "doc_id", q, 10).collect()]
    final = spark.createDataFrame(sorted(docs.items()),
                                  "doc_id long, text string")
    scan = [(r["doc_id"], r["score_micro"]) for r in bm25_topk(
        final, "text", "doc_id", q, 10).collect()]
    assert served == scan


def test_df_ledger_maintained_and_served_exact(spark, tmp_path):
    """VERDICT r09 #4: the (term, df) ledger folds to brute-force
    document frequencies under insert/update/delete epochs, and
    bm25_topk_served fed the MAINTAINED ledger equals the scan scorer
    INCLUDING a high-df term ('the' — the per-query candidate aggregate
    it replaces would be corpus-sized for such terms). Ledger commits
    are appends; a full-epoch replay is a durable no-op."""
    from cdc_audit_spark.operators.bm25 import bm25_topk_served
    from cdc_audit_spark.sinks.manifest import ManifestTable
    from cdc_audit_spark.streaming.stream_bm25 import (
        apply_bm25_manifest_epoch,
        current_bm25_dfs,
        current_serving_bm25,
    )

    ts_ = {n: ManifestTable(spark, str(tmp_path / n))
           for n in ("base", "post", "norms", "stats", "dfs")}
    epochs = [
        [(i, t, "insert", TS, i) for i, t in CORPUS[:3]],
        [(4, CORPUS[3][1], "insert", TS, 10)],
        [(2, "the dog only", "update", TS, 11),
         (3, CORPUS[2][1], "delete", TS, 12)],
    ]
    for e, rows in enumerate(epochs):
        apply_bm25_manifest_epoch(
            ts_["base"], ts_["post"], spark.createDataFrame(rows, SCH),
            e, "r1", "text", ["doc_id"], norms_t=ts_["norms"],
            stats_t=ts_["stats"], dfs_t=ts_["dfs"])

    final = [CORPUS[0], (2, "the dog only"), CORPUS[3]]
    brute = _brute_postings(final)
    exp_df: dict = {}
    for (t, _d), _c in brute.items():
        exp_df[t] = exp_df.get(t, 0) + 1
    got_df = {r["term"]: r["df"]
              for r in current_bm25_dfs(spark, ts_["dfs"].path).collect()}
    assert got_df == exp_df

    terms = ["the", "dog", "fish"]  # 'the' is in every surviving doc but 4
    postings, norms, n_docs, total = current_serving_bm25(
        spark, ts_["post"].path, ts_["norms"].path, ts_["stats"].path,
        "doc_id", terms=terms)
    dfs = current_bm25_dfs(spark, ts_["dfs"].path, terms=terms)
    served = [(r["doc_id"], r["score_micro"]) for r in bm25_topk_served(
        postings, norms, n_docs, total, "doc_id", terms, 3,
        term_dfs=dfs).collect()]
    scan = [(r["doc_id"], r["score_micro"]) for r in bm25_topk(
        spark.createDataFrame(final, "doc_id long, text string"),
        "text", "doc_id", terms, 3).collect()]
    assert served == scan

    assert all(ts_["dfs"].manifest(v)["action"] == "append"
               for v in ts_["dfs"].versions())
    # full-epoch replay: every guard skips, the ledger is unchanged
    apply_bm25_manifest_epoch(
        ts_["base"], ts_["post"], spark.createDataFrame(epochs[-1], SCH),
        2, "r1", "text", ["doc_id"], norms_t=ts_["norms"],
        stats_t=ts_["stats"], dfs_t=ts_["dfs"])
    again = {r["term"]: r["df"]
             for r in current_bm25_dfs(spark, ts_["dfs"].path).collect()}
    assert again == exp_df


def test_multiquery_topk_with_maintained_dfs_matches(spark):
    """bm25_topk_join fed the maintained (term, df) ledger equals the
    candidate-aggregated form — the batch analog of the served path's
    bounded idf lookups."""
    from cdc_audit_spark.operators.bm25 import (
        bm25_norms,
        bm25_topk_join,
        postings_corpus_stats,
    )

    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    queries = {7: ["the", "cat"], 8: ["dog", "fish"]}
    postings = bm25_postings(df, "text", "doc_id")
    norms = bm25_norms(postings, "doc_id")
    n, total = postings_corpus_stats(postings, "doc_id")
    dfs = postings.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("df"))

    def run(**kw):
        return sorted(
            (r["query_id"], r["doc_id"], r["score_micro"])
            for r in bm25_topk_join(postings, norms, n, total, "doc_id",
                                    queries, 3, **kw).collect())

    assert run(term_dfs=dfs) == run()
