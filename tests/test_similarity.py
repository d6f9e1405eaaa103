import math

from pyspark.sql import functions as F

from cdc_audit_spark.operators.similarity import (
    ann_bucket_pairs,
    cosine_topk,
    hyperplane_lsh_buckets,
)


def _vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),    # close to 0
        (2, [0.0, 1.0, 0.0, 0.0]),    # orthogonal to 0
        (3, [-1.0, 0.0, 0.0, 0.0]),   # opposite of 0
        (4, [0.8, 0.2, 0.0, 0.0]),    # close to 0
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_ordering(spark):
    df = _vecs(spark)
    out = cosine_topk(df.filter("vec_id <> 0"), [1.0, 0.0, 0.0, 0.0], k=3)
    rows = out.collect()
    assert [r["vec_id"] for r in rows] == [1, 4, 2]
    assert float(rows[0]["cos_sim"]) > 0.99
    expected = 0.9 / math.sqrt(0.9 ** 2 + 0.1 ** 2)
    assert abs(float(rows[0]["cos_sim"]) - expected) < 1e-6


def test_cosine_topk_against_fixture(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter("vec_id = 0").first()["embedding"]
    out = cosine_topk(emb.filter("vec_id <> 0"), q, k=5).collect()
    assert len(out) == 5
    sims = [float(r["cos_sim"]) for r in out]
    assert sims == sorted(sims, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in sims)


def test_lsh_buckets_similar_vectors_collide(spark):
    df = _vecs(spark)
    buckets = {r["id"]: r["bucket"] for r in
               hyperplane_lsh_buckets(df, num_bits=8, dim=4).collect()}
    # identical-direction vectors always share every sign bit
    assert buckets[1] == buckets[4] or bin(buckets[1] ^ buckets[4]).count("1") <= 2
    # opposite vectors flip every non-zero-margin bit
    assert buckets[0] != buckets[3]


def test_ann_bucket_pairs_shape(spark):
    df = _vecs(spark)
    pairs = {(r["id_a"], r["id_b"]) for r in
             ann_bucket_pairs(df, num_bits=4, dim=4).collect()}
    for a, b in pairs:
        assert a < b


def test_ann_on_fixture_finds_neighbors(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = ann_bucket_pairs(emb, num_bits=6, dim=64)
    assert pairs.count() >= 0  # plumbing: runs distributed, deterministic


def test_cosine_pairs_exact(spark):
    from cdc_audit_spark.operators.similarity import cosine_pairs

    df = _vecs(spark)
    pairs = {(r["id_a"], r["id_b"]): float(r["cos_sim"])
             for r in cosine_pairs(df, threshold=0.9).collect()}
    # near-identical directions survive the 0.9 threshold…
    assert (0, 1) in pairs and (0, 4) in pairs and (1, 4) in pairs
    # …orthogonal and opposite pairs do not
    assert (0, 2) not in pairs and (0, 3) not in pairs
    for (a, b), sim in pairs.items():
        assert a < b and 0.9 < sim <= 1.0


def test_cosine_pairs_symmetric_free(spark):
    from cdc_audit_spark.operators.similarity import cosine_pairs

    # no (b, a) duplicates, no self-pairs, at any threshold (below -1 so
    # even the exactly-opposite pair survives the strict > filter)
    out = cosine_pairs(_vecs(spark), threshold=-1.5).collect()
    keys = [(r["id_a"], r["id_b"]) for r in out]
    assert len(keys) == len(set(keys)) == 10  # C(5,2)


def test_ivf_assign_deterministic_cells(spark):
    from cdc_audit_spark.operators.similarity import ivf_assign

    df = _vecs(spark)
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    cells = {r["vec_id"]: r["cell"] for r in ivf_assign(df, cents).collect()}
    assert cells[0] == 0 and cells[1] == 0 and cells[4] == 0  # x-ish vectors
    assert cells[2] == 1                                       # y vector
    assert cells[3] == 1  # opposite of x: sim -1 vs 0 → y-cell wins


def test_ivf_topk_recall_vs_bruteforce(spark, sf_dir):
    from cdc_audit_spark.operators.similarity import (
        cosine_topk, ivf_topk, sample_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    corpus = emb.filter("vec_id <> 0")
    cents = sample_centroids(corpus, k=8)
    exact = [r["vec_id"] for r in cosine_topk(corpus, q, k=10).collect()]
    # full probe degenerates to brute force → recall 1.0
    full = [r["vec_id"] for r in
            ivf_topk(corpus, cents, q, k=10, nprobe=8).collect()]
    assert full == exact
    # half the cells must already recover most of the true top-10
    approx = [r["vec_id"] for r in
              ivf_topk(corpus, cents, q, k=10, nprobe=4).collect()]
    assert len(set(approx) & set(exact)) >= 5


def test_l2_normalize_unit_norm_and_zero_vec(spark):
    from cdc_audit_spark.operators.similarity import l2_normalize
    import math

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [-1.0, 1.0])],
        "id long, embedding array<float>",
    )
    rows = {r["id"]: r["unit_vec"] for r in l2_normalize(df, "embedding").collect()}
    assert rows[2] is None  # zero vector → NULL, not NaN
    assert math.isclose(sum(x * x for x in rows[1]), 1.0, rel_tol=1e-12)
    assert math.isclose(rows[1][0], 0.6) and math.isclose(rows[1][1], 0.8)
    assert math.isclose(sum(x * x for x in rows[3]), 1.0, rel_tol=1e-12)


def test_quantize_int8_bounds_and_reconstruction(spark, sf_dir):
    from cdc_audit_spark.operators.similarity import quantize_int8
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = quantize_int8(emb, "embedding")
    checked = q.select(
        "vec_id", "scale",
        F.array_max("codes").alias("cmax"),
        F.array_min("codes").alias("cmin"),
        # max |x - code*scale| over the vector
        F.array_max(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.col("codes"),
                lambda x, c: F.abs(x - c.cast("double") * F.col("scale")),
            )
        ).alias("max_err"),
    ).collect()
    assert len(checked) == emb.count()
    for r in checked:
        assert -127 <= r["cmin"] <= r["cmax"] <= 127
        if r["scale"] > 0:
            # symmetric round-to-nearest: error ≤ scale/2 (+ fp slack)
            assert r["max_err"] <= r["scale"] / 2 + 1e-12, r["vec_id"]
        else:
            assert r["max_err"] == 0.0


def _pq_setup(spark, sf_dir):
    from cdc_audit_spark.operators.similarity import l2_normalize, train_pq_codebooks

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    norm = (
        l2_normalize(emb, "embedding", "unit")
        .filter(F.col("unit").isNotNull())
        .select("vec_id", F.col("unit").alias("embedding"))
    )
    q = [float(x) for x in norm.filter("vec_id = 0").first()["embedding"]]
    corpus = norm.filter("vec_id <> 0")
    books = train_pq_codebooks(corpus, m=16, k=32)
    return corpus, q, books


def test_pq_codes_shape_and_determinism(spark, sf_dir):
    from cdc_audit_spark.operators.similarity import pq_encode, train_pq_codebooks

    corpus, _, books = _pq_setup(spark, sf_dir)
    enc = pq_encode(corpus, books).collect()
    assert all(len(r["codes"]) == 16 for r in enc)
    assert all(0 <= c < 32 for r in enc for c in r["codes"])
    # seed-free training must reproduce identical codebooks
    again = train_pq_codebooks(corpus, m=16, k=32)
    assert books == again


def test_pq_raw_recall_vs_bruteforce(spark, sf_dir):
    from cdc_audit_spark.operators.similarity import cosine_topk, pq_encode, pq_topk

    corpus, q, books = _pq_setup(spark, sf_dir)
    exact = [r["vec_id"] for r in cosine_topk(corpus, q, k=10).collect()]
    enc = pq_encode(corpus, books)
    approx = [r["id"] for r in pq_topk(enc, books, q, 10).collect()]
    # raw-PQ stage recall: 0.6 observed at sf0.01; at sf0.001 the corpus is
    # ~50 vectors so the 32-centroid codebooks overfit — bound loosely here,
    # the rerank test below carries the real guarantee
    assert len(set(approx) & set(exact)) >= 3


def test_pq_rerank_recovers_exact_topk(spark, sf_dir):
    from cdc_audit_spark.operators.similarity import (
        cosine_topk, pq_encode, pq_rerank_topk,
    )

    corpus, q, books = _pq_setup(spark, sf_dir)
    exact = [r["vec_id"] for r in cosine_topk(corpus, q, k=10).collect()]
    enc = pq_encode(corpus, books)
    rr = [r["vec_id"] for r in
          pq_rerank_topk(corpus, enc, books, q, 10, expand=5).collect()]
    # candidate expansion + exact rerank: observed recall 1.0; bound at 0.8
    assert len(set(rr) & set(exact)) >= 8


def test_ivf_pq_topk_recall(spark, sf_dir):
    from cdc_audit_spark.operators.similarity import (
        cosine_topk, ivf_pq_topk, sample_centroids,
    )

    corpus, q, books = _pq_setup(spark, sf_dir)
    exact = [r["vec_id"] for r in cosine_topk(corpus, q, k=10).collect()]
    cents = sample_centroids(corpus, k=8)
    # full probe: only the PQ+rerank stages can lose recall (bounded by the
    # rerank test); half probe must still recover most of the neighborhood
    full = [r["vec_id"] for r in
            ivf_pq_topk(corpus, cents, books, q, k=10, nprobe=8).collect()]
    assert len(set(full) & set(exact)) >= 8
    half = [r["vec_id"] for r in
            ivf_pq_topk(corpus, cents, books, q, k=10, nprobe=4).collect()]
    assert len(set(half) & set(exact)) >= 5


def test_ivf_refined_centroids_recall(spark, sf_dir):
    # The bounded k-means pass must improve the clustering objective (mean
    # cosine of each vector to its assigned centroid) on the corpus — the
    # quantity Lloyd iterations optimize, and the driver of recall at fixed
    # nprobe (measured at sf0.01: 0.5->0.6 @nprobe2, 0.6->0.7 @nprobe4).
    # Per-query recall on a tiny random fixture is too noisy to assert.
    from cdc_audit_spark.operators.similarity import (
        _self_dot, ivf_assign, refine_centroids, sample_centroids,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") != 0)

    cents0 = sample_centroids(corpus, k=8)
    cents1 = refine_centroids(corpus, cents0, iters=2)
    assert cents1 == refine_centroids(corpus, cents0, iters=2)  # deterministic
    assert len(cents1) == 8 and len(cents1[0]) == len(cents0[0])

    def objective(cents):
        # ivf_assign keeps the best cell; recompute that cosine and average
        from cdc_audit_spark.operators.similarity import _dot_lit, _l2

        norm = F.sqrt(_self_dot(F.col("embedding")))
        best = F.greatest(*[
            _dot_lit(F.col("embedding"), c) / (norm * F.lit(_l2(c)))
            for c in cents
        ])
        return corpus.agg(F.avg(best)).first()[0]

    assert objective(cents1) > objective(cents0)


def test_cosine_pairs_quadratic_gate(spark, monkeypatch):
    from cdc_audit_spark.operators import similarity
    from cdc_audit_spark.operators.similarity import cosine_pairs

    import pytest

    # shrink the ceiling so the 5-row fixture trips it
    monkeypatch.setattr(similarity, "COSINE_PAIRS_MAX_ROWS", 3)
    with pytest.raises(ValueError, match="O\\(N²\\)|allow_quadratic"):
        cosine_pairs(_vecs(spark))
    # explicit opt-in bypasses the count entirely
    assert len(cosine_pairs(_vecs(spark), threshold=-1.5,
                            allow_quadratic=True).collect()) == 10


def test_ivf_knn_join_exact_and_approx(spark, sf_dir):
    """Batch k-NN join: nprobe=all equals per-query brute force exactly;
    small nprobe keeps majority recall per query; and the plan has the
    scale shape — corpus scanned once into a BroadcastHashJoin (queries
    broadcast), ONE candidate-pair exchange for the per-query top-k."""
    from cdc_audit_spark.operators.similarity import (
        cosine_topk,
        ivf_assign,
        ivf_knn_join,
        sample_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.filter("vec_id >= 5")
    queries = emb.filter("vec_id < 5").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    cents = sample_centroids(corpus, 8)
    assigned = ivf_assign(corpus, cents)

    out = ivf_knn_join(queries, assigned, cents, k=10, nprobe=len(cents))
    got = {}
    for r in out.collect():
        got.setdefault(r["q_id"], []).append((r["vec_id"], r["cos_sim"]))
    assert set(got) == {0, 1, 2, 3, 4}
    for q_id in got:
        qv = [float(x) for x in
              emb.filter(f"vec_id = {q_id}").first()["embedding"]]
        exact = [(r["vec_id"], r["cos_sim"])
                 for r in cosine_topk(corpus, qv, k=10).collect()]
        assert sorted(got[q_id], key=lambda t: (-t[1], t[0])) == exact

    # approximate: half the cells recover most of each query's top-10
    approx = {}
    for r in ivf_knn_join(queries, assigned, cents, k=10,
                          nprobe=4).collect():
        approx.setdefault(r["q_id"], set()).add(r["vec_id"])
    for q_id, ids in approx.items():
        exact_ids = {t[0] for t in got[q_id]}
        assert len(ids & exact_ids) >= 5

    # AQE's toString prints Final + Initial sections; audit the final one
    plan = (out._jdf.queryExecution().executedPlan().toString()
            .split("Initial Plan")[0])
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_ivf_knn_join_broadcast_gate(spark, sf_dir):
    """The query-side broadcast is size-gated: above
    KNN_JOIN_BROADCAST_MAX_ROWS (queries x nprobe) the join falls back
    to the salted shuffle — NO forced broadcast in the plan — and the
    results are identical to the broadcast shape."""
    from cdc_audit_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.filter("vec_id >= 5")
    queries = emb.filter("vec_id < 5").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    cents = S.sample_centroids(corpus, 8)
    assigned = S.ivf_assign(corpus, cents)

    def rows(df):
        return sorted((r["q_id"], r["vec_id"], round(r["cos_sim"], 9))
                      for r in df.collect())

    bcast = S.ivf_knn_join(queries, assigned, cents, k=10, nprobe=4,
                           broadcast_queries=True)

    # the test query side is tiny, so the PLANNER would broadcast it on
    # its own — disable auto-broadcast to distinguish "forced by hint"
    # (what the gate must prevent) from "chosen by the optimizer"
    confs = ("spark.sql.autoBroadcastJoinThreshold",
             "spark.sql.adaptive.autoBroadcastJoinThreshold")
    saved = {c: spark.conf.get(c, None) for c in confs}
    for c in confs:
        spark.conf.set(c, "-1")
    try:
        shuffled = S.ivf_knn_join(queries, assigned, cents, k=10, nprobe=4,
                                  broadcast_queries=False)
        assert rows(bcast) == rows(shuffled)
        shuf_plan = (shuffled._jdf.queryExecution().executedPlan()
                     .toString().split("Initial Plan")[0])
        assert "BroadcastHashJoin" not in shuf_plan

        # auto mode honors the gate: a tiny ceiling routes to the shuffle
        orig = S.KNN_JOIN_BROADCAST_MAX_ROWS
        S.KNN_JOIN_BROADCAST_MAX_ROWS = 1
        try:
            auto = S.ivf_knn_join(queries, assigned, cents, k=10, nprobe=4)
            auto_plan = (auto._jdf.queryExecution().executedPlan()
                         .toString().split("Initial Plan")[0])
            assert "BroadcastHashJoin" not in auto_plan
            assert rows(auto) == rows(bcast)
        finally:
            S.KNN_JOIN_BROADCAST_MAX_ROWS = orig
    finally:
        for c, v in saved.items():
            if v is None:
                spark.conf.unset(c)
            else:
                spark.conf.set(c, v)
