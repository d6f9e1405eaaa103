"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — dot products via zip_with/aggregate
(JVM-side, no Python), top-k via orderBy+limit which Spark executes as
per-partition TakeOrdered + driver merge (no global sort, no single-partition
shuffle).

Scale path: random-hyperplane LSH — b sign bits per vector from dot products
against broadcast hyperplanes → bucket key. ANN = equi-join on bucket key,
turning the O(N²) all-pairs problem into a per-bucket join; and an IVF-style
coarse quantizer (assign to nearest of k sampled centroids, probe the
nearest cells) for recall-tunable search.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cosine_topk",
    "cosine_pairs",
    "hyperplane_lsh_buckets",
    "ann_bucket_pairs",
    "ivf_assign",
    "ivf_topk",
]


def _dot_lit(vec_col: Column, qv: list[float]) -> Column:
    """Sequential left-to-right fold — same evaluation order DuckDB's
    list_dot_product uses, for bit-identical oracle results."""
    q = F.array(*[F.lit(float(x)).cast("double") for x in qv])
    return F.aggregate(
        F.zip_with(vec_col.cast("array<double>"), q, lambda a, b: a * b),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _self_dot(vec_col: Column) -> Column:
    d = vec_col.cast("array<double>")
    return F.aggregate(
        F.zip_with(d, d, lambda a, b: a * b),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k rows by cosine similarity to ``query_vec``.

    Deterministic: ties broken by id. Output sim is a raw double — the
    left-fold dot product accumulates in the same order as DuckDB's
    list_dot_product, so the oracle matches bit-for-bit.
    """
    qnorm_sq = sum(float(x) * float(x) for x in query_vec)
    sim = _dot_lit(F.col(vec_col), query_vec) / (
        F.sqrt(_self_dot(F.col(vec_col))) * F.lit(qnorm_sq) ** 0.5
    )
    return (
        df.select(F.col(id_col), sim.cast("double").alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


#: Row-count ceiling for cosine_pairs' quadratic self-join. 65536 rows →
#: ~2.1e9 candidate pairs, the most a single exact verify should ever see;
#: LSH buckets (the intended feeder) are orders of magnitude smaller.
COSINE_PAIRS_MAX_ROWS = 65536


def cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.60,
    allow_quadratic: bool = False,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine similarity above ``threshold``.

    Exact and quadratic — the verify stage of the near-dup pipeline. At
    scale, feed it only LSH-bucketed candidates (ann_bucket_pairs) or a
    bounded id range; never the full corpus. To keep a user from pointing
    it at 100 TB by accident, the input is COUNTED and rejected above
    ``COSINE_PAIRS_MAX_ROWS`` unless ``allow_quadratic=True`` (the count is
    one cheap job against an already-filtered input; the O(N²) join it
    prevents is unboundedly worse). The pairwise dot product runs as a JVM
    zip_with/aggregate fold (same accumulation order as DuckDB's
    list_dot_product, so the oracle matches bit-for-bit).
    """
    if not allow_quadratic:
        n = df.count()
        if n > COSINE_PAIRS_MAX_ROWS:
            raise ValueError(
                f"cosine_pairs: input has {n} rows; the exact all-pairs join "
                f"is O(N²) and is refused above {COSINE_PAIRS_MAX_ROWS} rows. "
                f"Use the LSH/ANN path (ann_bucket_pairs) to generate "
                f"candidates, or pass allow_quadratic=True if you really "
                f"mean it.")
    norm = F.sqrt(_self_dot(F.col(vec_col)))
    side = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        norm.alias("nrm"),
    )
    a, b = side.alias("a"), side.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    sim = (dot / (F.col("a.nrm") * F.col("b.nrm"))).cast("double")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            sim.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") > F.lit(threshold))
    )


def hyperplane_lsh_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_bits: int = 16,
    dim: int = 64,
    seed: int = 42,
    impl: str = "arrow",
) -> DataFrame:
    """(id, bucket) — bucket = sign-bit signature against ``num_bits`` random
    hyperplanes (seeded, reproducible). Cosine-similar vectors collide with
    probability 1 - θ/π per bit.

    The sign is taken on an EXACT integer dot product: each per-term
    product quantizes to a BIGINT nano-grain (``floor(v*p*1e9 + 0.5)``,
    the PCA covariance idiom) before the sum, so the signature is
    bit-identical under any partitioning / summation order AND across
    engines — the two impls here agree exactly, and an ANSI engine
    evaluating the same expression (the driver's DuckDB oracle does)
    lands the same buckets. A float-sum signature could flip near-zero
    margin bits between impls; an LSH index whose buckets depend on who
    computed them cannot be maintained incrementally.

    ``impl='arrow'`` (default): mapInPandas + one vectorized numpy pass
    per Arrow batch. ``impl='sql'`` keeps the pure-expression variant
    (no Arrow dependency).
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_bits, dim))

    if impl == "arrow":
        weights = np.ascontiguousarray(planes.T)  # dim × num_bits
        powers = (1 << np.arange(num_bits, dtype=np.uint64)).astype(np.uint64)

        def gen(batches):
            import pandas as pd

            for pdf in batches:
                vecs = np.array(pdf[vec_col].to_list(), dtype=np.float64)
                # left-assoc (v*p)*1e9 — the exact expression the sql
                # impl and the ANSI oracle evaluate, term by term
                terms = np.floor(
                    vecs[:, :, None] * weights[None, :, :] * 1e9 + 0.5
                ).astype(np.int64)
                bits = terms.sum(axis=1) > 0  # n × num_bits sign matrix
                buckets = (bits.astype(np.uint64) * powers).sum(axis=1)
                yield pd.DataFrame(
                    {"id": pdf[id_col], "bucket": buckets.view(np.int64)}
                )

        narrow = df.select(F.col(id_col).alias(id_col), F.col(vec_col))
        par = df.sparkSession.sparkContext.defaultParallelism
        if narrow.rdd.getNumPartitions() < par:
            narrow = narrow.repartition(par)
        return narrow.mapInPandas(gen, schema="id long, bucket long")

    def qdot(plane):
        coeffs = F.array(*[F.lit(float(c)) for c in plane])
        return F.aggregate(
            F.zip_with(F.col(vec_col), coeffs,
                       lambda x, y: F.floor(x * y * F.lit(1e9)
                                            + F.lit(0.5)).cast("long")),
            F.lit(0).cast("long"), lambda acc, t: acc + t)

    bucket = F.lit(0).cast("long")
    for b in range(num_bits):
        bit = F.when(qdot(planes[b].tolist()) > 0,
                     F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(F.shiftleft(bit, b))
    return df.select(F.col(id_col).alias("id"), bucket.alias("bucket"))


def ann_bucket_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_bits: int = 12,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Candidate neighbor pairs: ids sharing an LSH bucket (id_a < id_b).

    Bucketing replaces the quadratic cross join; shuffle volume is
    O(rows), per-bucket fan-out bounded by bucket occupancy (tune
    num_bits so buckets stay small).

    Pairs come from grouping per bucket, NOT a self-join (the
    minhash_lsh_pairs shape): the old bucket self-join evaluated the
    signature pass once per scan branch and paid a join exchange plus a
    distinct exchange — but each vector holds exactly ONE bucket, so a
    pair can only ever be witnessed once and the distinct was pure
    overhead. Now: one signature pass, one (bucket, id) shuffle into a
    hash-aggregate, in-bucket pair expansion. Plan: 2 scans + 3
    Exchanges → 1 scan + 1 Exchange, identical row set."""
    buckets = hyperplane_lsh_buckets(df, id_col, vec_col, num_bits, dim, seed)
    ids_sorted = F.sort_array(F.collect_list("id"))
    pairs_in_bucket = F.filter(
        F.flatten(
            F.transform(
                F.col("ids"),
                lambda x: F.transform(
                    F.col("ids"),
                    lambda y: F.struct(x.alias("id_a"), y.alias("id_b"))),
            )
        ),
        lambda p: p["id_a"] < p["id_b"],
    )
    return (
        buckets.groupBy("bucket").agg(ids_sorted.alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode(pairs_in_bucket).alias("p"))
        .select("p.id_a", "p.id_b")
    )


# --- IVF (inverted-file) coarse quantization: the recall-tunable scale ---
# --- path. Centroids are sampled deterministically from the data; each  ---
# --- vector is assigned to its nearest centroid (one narrow map against ---
# --- a broadcast centroid array); a query probes only the nprobe        ---
# --- nearest cells, cutting the scan to ~nprobe/k of the corpus.        ---


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, embedding) — each vector assigned to the centroid with
    the highest cosine similarity (deterministic: lowest index on ties).

    Centroids broadcast as literals into one whole-stage-codegen'd
    expression; no shuffle. On a real deployment, write the result
    partitioned by cell so probes read only their cells' files.
    """
    return df.select(
        F.col(id_col),
        nearest_cell(F.col(vec_col), centroids).alias("cell"),
        F.col(vec_col),
    )


def _scored_cells(vec_col: Column, centroids: list[list[float]]) -> Column:
    """All centroids scored against ``vec_col``, sorted best-first:
    an ``array<struct{sim, inv, cell}>`` literal expression (broadcast
    centroids, whole-stage codegen, no shuffle) with the tie-break
    contract — highest cosine wins, lowest index on ties (``inv``
    inverts the index so the descending sort realizes it). The ONE place
    that contract lives; ``nearest_cell`` takes element 0, the k-NN join
    slices the top nprobe."""
    norm = F.sqrt(_self_dot(vec_col))
    scored = [
        F.struct(
            (_dot_lit(vec_col, c) / (norm * F.lit(_l2(c)))).alias("sim"),
            F.lit(len(centroids) - 1 - i).alias("inv"),
            F.lit(i).alias("cell"),
        )
        for i, c in enumerate(centroids)
    ]
    return F.sort_array(F.array(*scored), asc=False)


def nearest_cell(vec_col: Column, centroids: list[list[float]]) -> Column:
    """The ``ivf_assign`` cell expression as a reusable Column: highest
    cosine similarity, lowest index on ties — broadcast-literal codegen,
    no shuffle. Shared with the CDC index maintenance
    (``streaming.stream_ann``), which assigns audit-delta images in
    place without re-projecting the batch."""
    return _scored_cells(vec_col, centroids)[0]["cell"]


def _ranked_cells(query_vec: list[float],
                  centroids: list[list[float]]) -> list[int]:
    """Driver-side probe ranking for a single query vector: cell indices
    by descending cosine similarity, lowest index on ties — the Python
    twin of :func:`_scored_cells`, shared by ``ivf_topk`` and
    ``ivf_topk_indexed``."""
    qn = _l2(query_vec)
    return sorted(
        range(len(centroids)),
        key=lambda i: (
            -sum(a * b for a, b in zip(centroids[i], query_vec))
            / (_l2(centroids[i]) * qn),
            i,
        ),
    )


def _l2(v: list[float]) -> float:
    return sum(float(x) * float(x) for x in v) ** 0.5


def sample_centroids(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic centroid sample: the k vectors whose xxhash64(id) is
    smallest — a uniform, reproducible draw without a random seed. Feed the
    result to ``refine_centroids`` for better cell balance (raw samples
    leave cells imbalanced, which costs recall at fixed nprobe).
    """
    rows = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .withColumn("h", F.xxhash64(F.col("id")))
        .orderBy("h", "id")
        .limit(k)
        .collect()
    )
    return [list(map(float, r["v"])) for r in rows]


def refine_centroids(
    df: DataFrame,
    centroids: list[list[float]],
    iters: int = 2,
    sample_size: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Bounded Lloyd (spherical k-means) refinement of IVF centroids.

    Each iteration assigns a deterministic hash-sample of the corpus to its
    nearest centroid (the same broadcast-literal codegen expression as
    ``ivf_assign`` — no shuffle for the assignment) and recomputes each
    cell's centroid as the mean of its members' unit vectors via
    posexplode + groupBy(cell, dim) avg: one shuffle of (cell, dim, value)
    triples, k×dim aggregated rows collected (bounded, independent of
    corpus size). Empty cells keep their previous centroid. Deterministic:
    fixed sample, fixed iteration count, tie-break on lowest cell index.

    The whole pass is O(iters × sample × dim) distributed work with an
    O(k × dim) driver collect — at 100 TB the sample cap, not the corpus,
    bounds the cost.
    """
    sample = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .withColumn("h", F.xxhash64(F.col("id")))
        .orderBy("h", "id")
        .limit(sample_size)
        .select("id", "v")
    )
    sample = sample.persist()
    try:
        cents = [list(map(float, c)) for c in centroids]
        for _ in range(iters):
            assigned = ivf_assign(sample, cents, id_col="id", vec_col="v")
            unit = l2_normalize(assigned, "v").filter(F.col("unit_vec").isNotNull())
            means = (
                unit.select("cell", F.posexplode("unit_vec").alias("dim", "x"))
                .groupBy("cell", "dim")
                .agg(F.avg("x").alias("m"))
                .collect()
            )
            by_cell: dict[int, dict[int, float]] = {}
            for r in means:
                by_cell.setdefault(r["cell"], {})[r["dim"]] = r["m"]
            cents = [
                [by_cell[i][d] for d in range(len(c))] if i in by_cell else c
                for i, c in enumerate(cents)
            ]
        return cents
    finally:
        sample.unpersist()


def ivf_topk(
    df: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors in the ``nprobe`` cells whose
    centroids are most cosine-similar to the query.

    The cell filter prunes ~(1 - nprobe/len(centroids)) of the corpus
    before any per-vector scoring; recall rises monotonically with
    ``nprobe`` (== len(centroids) degenerates to exact brute force).
    """
    return ivf_topk_indexed(
        ivf_assign(df, centroids, id_col, vec_col), centroids, query_vec,
        k, nprobe=nprobe, id_col=id_col, vec_col=vec_col,
    )


def ivf_topk_indexed(
    assignments: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """``ivf_topk`` over PRE-COMPUTED assignments — the query path of a
    maintained IVF index (``streaming.stream_ann``): the per-query assign
    pass over the whole corpus disappears, only the probed cells' rows
    are scored. ``nprobe == len(centroids)`` degenerates to exact
    brute-force cosine top-k (the oracle-checkable setting); smaller
    nprobe trades recall for a ~nprobe/len(centroids) scan fraction.
    With the index table range-laid-out on the id, cell filtering is a
    map-side codegen'd predicate; at scale, write the assignments
    partitioned by cell so probes read only their cells' files."""
    probe = _ranked_cells(query_vec, centroids)[:nprobe]
    return cosine_topk(
        assignments.filter(F.col(cell_col).isin(*probe)),
        query_vec, k, id_col, vec_col,
    )


#: Exploded-row ceiling for ivf_knn_join's query-side broadcast:
#: 2^18 rows × ~0.5 KiB/row (a 64-dim double vector + id + norm + probe)
#: ≈ 128 MiB on the driver and per executor — comfortably inside default
#: memory, far under Spark's 8 GB broadcast hard limit. Above it the
#: join falls back to a salted shuffle (see ivf_knn_join).
KNN_JOIN_BROADCAST_MAX_ROWS = 1 << 18


def ivf_knn_join(
    queries: DataFrame,
    assignments: DataFrame,
    centroids: list[list[float]],
    k: int,
    nprobe: int = 2,
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
    broadcast_queries: bool | None = None,
    fallback_salts: int = 16,
) -> DataFrame:
    """Batch k-NN JOIN: every query row gets its top-k corpus neighbours
    in ONE pass — the many-queries form of ``ivf_topk_indexed`` (which
    burns a job per query vector).

    Shape: each query is assigned its ``nprobe`` nearest cells with the
    same broadcast-literal codegen expression as ``ivf_assign`` (one
    sorted struct-array literal, sliced — no shuffle), exploded to
    (cell, query) rows, then joined to the pre-computed assignments on
    the cell id. With queries ≪ corpus the join broadcasts the exploded
    query side, so the corpus is scanned ONCE with a map-side cell
    filter and never shuffled; only the surviving candidate pairs
    (~nprobe/len(centroids) of the corpus × queries) shuffle for the
    per-query top-k window. ``nprobe == len(centroids)`` degenerates to
    the exact brute-force k-NN join (the oracle-checkable setting).

    The query-side broadcast is SIZE-GATED (``broadcast_queries=None``):
    one cheap count of the queries side decides, and a batch whose
    exploded size (queries × nprobe) exceeds
    ``KNN_JOIN_BROADCAST_MAX_ROWS`` falls back to a salted shuffle join
    on the cell id instead of force-broadcasting past executor memory.
    The salt matters because the join key alone has only
    ``len(centroids)`` distinct values — an unsalted shuffle would cap
    parallelism at the cell count and collapse hot cells onto single
    tasks; salting the corpus side and replicating the (already large,
    so proportionally cheap) query side ``fallback_salts``× restores
    cells × salts reduce keys. Pass ``broadcast_queries=True/False`` to
    skip the count and force a side.

    The pair score is the same left-fold double dot product as
    ``cosine_pairs`` — bit-identical to DuckDB's list_dot_product."""
    from pyspark.sql import Window

    probes = F.transform(
        F.slice(_scored_cells(F.col(q_vec_col), centroids), 1, nprobe),
        lambda s: s["cell"],
    )
    # norm computed BEFORE the probe explode: once per query, not once
    # per (query, probe) row
    q = (queries.select(
            F.col(q_id_col), F.col(q_vec_col),
            F.sqrt(_self_dot(F.col(q_vec_col))).alias("__qnorm"))
         .withColumn("__probe", F.explode(probes)))

    if broadcast_queries is None:
        broadcast_queries = (
            queries.count() * nprobe <= KNN_JOIN_BROADCAST_MAX_ROWS)
    if broadcast_queries:
        cand = assignments.join(
            F.broadcast(q), assignments[cell_col] == q["__probe"])
    else:
        from cdc_audit_spark.operators.skew import salted_join

        cand = salted_join(
            assignments, q.withColumnRenamed("__probe", cell_col),
            cell_col, salts=fallback_salts)
    a, b = F.col(vec_col).cast("array<double>"), F.col(q_vec_col).cast(
        "array<double>")
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    sim = (dot / (F.sqrt(_self_dot(F.col(vec_col))) * F.col("__qnorm"))
           ).cast("double")
    w = Window.partitionBy(q_id_col).orderBy(
        F.desc("cos_sim"), F.col(id_col))
    return (
        cand.select(F.col(q_id_col), F.col(id_col), sim.alias("cos_sim"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def ann_recall_estimate(
    assignments: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    sample_n: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> float:
    """Sampled ground-truth recall@k of an IVF index at ``nprobe`` — the
    operational drift monitor for a CDC-maintained index whose centroids
    are frozen at bootstrap (streaming.stream_ann): as the corpus
    distribution moves away from the training distribution, cell
    assignment degrades and this number falls; retrain + rebuild
    (``bootstrap_ann_index``) when it crosses the serving SLO.

    Cost is bounded and batch-shaped: a deterministic hash-ordered
    ``sample_n``-row query draw (the sample_centroids draw), then TWO
    ``ivf_knn_join`` passes — the probed setting vs nprobe=all (exact)
    — so the corpus is scanned twice regardless of sample size, never
    per-query. Self-queries are included in both sides, so they cancel
    out of the ratio. Deterministic end to end."""
    qs = (
        assignments.select(F.col(id_col).alias("q_id"),
                           F.col(vec_col).alias("q_vec"))
        .withColumn("__h", F.xxhash64(F.col("q_id")))
        .orderBy("__h", "q_id")
        .limit(sample_n)
        .drop("__h")
        .localCheckpoint(eager=True)   # two consumers, tiny frame
    )
    approx = ivf_knn_join(qs, assignments, centroids, k, nprobe=nprobe,
                          id_col=id_col, vec_col=vec_col,
                          cell_col=cell_col)
    exact = ivf_knn_join(qs, assignments, centroids, k,
                         nprobe=len(centroids), id_col=id_col,
                         vec_col=vec_col, cell_col=cell_col)
    hits = approx.select("q_id", id_col).join(
        exact.select("q_id", id_col), ["q_id", id_col]).count()
    total = exact.count()
    return hits / total if total else 1.0


def l2_normalize(df: DataFrame, vec_col: str, out_col: str = "unit_vec") -> DataFrame:
    """Unit-normalize an embedding column (prerequisite for cosine via plain
    dot products and for quantization). Pure map-side array math, JVM-side,
    double precision with a left-to-right fold so the oracle can reproduce
    it bit-for-bit. Zero vectors map to NULL (not NaN) so downstream joins
    drop them explicitly."""
    from cdc_audit_spark.operators.exprs import bind

    v = F.col(vec_col).cast("array<double>")

    def normed(norm):
        # norm is let-bound: captured inline it would re-run the O(d)
        # fold on every element of the output transform (O(d^2)/vector)
        return (F.when(norm > 0, F.transform(v, lambda x: x / norm))
                .otherwise(F.lit(None)))

    return df.withColumn(
        out_col,
        bind(F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)),
             normed),
    )


def quantize_int8(
    df: DataFrame,
    vec_col: str,
    codes_col: str = "codes",
) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization: scale = max|x| / 127,
    code_i = round(x_i / scale) ∈ [-127, 127]. Adds `codes`
    (array<tinyint>) + `scale` (double); dequantize ≈ code * scale with
    max abs error scale/2.

    The 4× (float32) / 8× (double) size cut is what makes a 100 TB embedding
    corpus scannable: codes stay JVM-side, distance kernels run on int8 with
    one final rescale. Map-side only — no shuffle, no Python."""
    v = F.col(vec_col).cast("array<double>")
    max_abs = F.aggregate(v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))
    scale = (max_abs / F.lit(127.0)).alias("scale")
    return (
        df.withColumn("scale", scale)
        .withColumn(
            codes_col,
            F.when(
                F.col("scale") > 0,
                F.transform(v, lambda x: F.round(x / F.col("scale")).cast("tinyint")),
            ).otherwise(F.transform(v, lambda x: F.lit(0).cast("tinyint"))),
        )
    )


def train_pq_codebooks(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 1024,
    n_iter: int = 8,
) -> list:
    """Product-quantization codebooks: ``m`` subspace codebooks of ``k``
    centroids each (codebooks[s][c] is a D/m-dim list).

    Training is driver-side numpy Lloyd iterations over a deterministic
    hash-ordered sample (same reproducible draw as sample_centroids) —
    the standard PQ recipe: codebooks are tiny (m·k·D/m floats) and
    training cost is O(sample · k) per subspace, so the sample, not the
    corpus, bounds it. Initialization = first k sample vectors per
    subspace; empty clusters keep their previous centroid (deterministic,
    seed-free end to end).
    """
    import numpy as np

    rows = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .withColumn("h", F.xxhash64(F.col("id")))
        .orderBy("h", "id")
        .limit(sample_n)
        .collect()
    )
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books = []
    for s in range(m):
        xs = x[:, s * sub:(s + 1) * sub]
        cents = xs[:k].copy()
        for _ in range(n_iter):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                members = xs[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append([list(map(float, c)) for c in cents])
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes): each vector encoded as m uint8 centroid indices —
    D floats → m bytes (32× at D=64, m=8 vs float32).

    Arrow-batched numpy argmin per subspace (the ||x-c||² expansion:
    x·c - ||c||²/2, one matmul per subspace per batch). Map-side only; at
    corpus scale this is the pass that makes the vector table scannable.
    """
    import numpy as np

    books = [np.array(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    sub = books[0].shape[1]

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf[vec_col].to_list(), dtype=np.float64)
            codes = np.empty((len(x), m), dtype=np.int32)
            for s in range(m):
                xs = x[:, s * sub:(s + 1) * sub]
                cb = books[s]
                scores = xs @ cb.T - 0.5 * (cb * cb).sum(axis=1)
                codes[:, s] = scores.argmax(axis=1)
            yield pd.DataFrame({"id": pdf[id_col], "codes": list(codes)})

    narrow = df.select(F.col(id_col), F.col(vec_col))
    par = df.sparkSession.sparkContext.defaultParallelism
    if narrow.rdd.getNumPartitions() < par:
        narrow = narrow.repartition(par)
    return narrow.mapInPandas(gen, schema="id long, codes array<int>")


def with_pq_codes(
    df: DataFrame,
    codebooks: list,
    vec_col: str = "embedding",
    codes_col: str = "codes",
) -> DataFrame:
    """``pq_encode`` as a column-appending pass: every OTHER column
    passes through untouched, so CDC delta rows keep their audit
    identity (event/pk) while their images gain codes — the encode
    stage of the maintained compressed index (streaming.stream_ann).
    NULL vectors (delete events) get NULL codes. Same argmin kernel as
    ``pq_encode`` — bit-identical codes, Arrow-batched, map-side."""
    import numpy as np

    books = [np.array(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    sub = books[0].shape[1]
    in_schema = df.schema

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            codes_out = [None] * len(pdf)
            mask = pdf[vec_col].notna()
            if mask.any():
                x = np.array(pdf.loc[mask, vec_col].to_list(),
                             dtype=np.float64)
                codes = np.empty((len(x), m), dtype=np.int32)
                for s in range(m):
                    xs = x[:, s * sub:(s + 1) * sub]
                    cb = books[s]
                    scores = xs @ cb.T - 0.5 * (cb * cb).sum(axis=1)
                    codes[:, s] = scores.argmax(axis=1)
                for pos, i in enumerate(np.flatnonzero(mask.to_numpy())):
                    codes_out[i] = codes[pos].tolist()
            pdf = pdf.copy()
            pdf[codes_col] = codes_out
            yield pdf

    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StructField,
        StructType,
    )

    # a FRESH StructType: StructType.add mutates in place, and df.schema
    # is cached on the input DataFrame — mutating it corrupts df itself
    out_schema = StructType(
        list(in_schema.fields)
        + [StructField(codes_col, ArrayType(IntegerType()), True)])
    return df.mapInPandas(gen, schema=out_schema)


def ivf_pq_topk_indexed(
    assignments: DataFrame,
    centroids: list[list[float]],
    codebooks: list,
    query_vec: list[float],
    k: int,
    nprobe: int = 2,
    expand: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
    codes_col: str = "codes",
) -> DataFrame:
    """IVFADC over a MAINTAINED index (cells AND codes pre-computed by
    the CDC sync — ``streaming.stream_ann`` with codebooks): per query,
    only the probed cells' rows are touched, their codes score in the
    compressed domain (m table lookups per row), and the exact kernel
    reranks the expand·k survivors from the float column in the same
    rows. Neither the per-call assign pass nor the per-call encode pass
    of ``ivf_pq_topk`` survives — the two full-corpus passes become
    reads of pre-computed columns. ``nprobe == len(centroids)`` with
    ``expand·k >= |corpus|`` degenerates to exact brute force (the
    oracle-checkable setting)."""
    probe = _ranked_cells(query_vec, centroids)[:nprobe]
    cells = assignments.filter(F.col(cell_col).isin(*probe))
    encoded = cells.select(F.col(id_col).alias("id"),
                           F.col(codes_col).alias("codes"))
    return pq_rerank_topk(cells, encoded, codebooks, query_vec, k,
                          expand, id_col, vec_col)


def pq_topk(
    encoded: DataFrame,
    codebooks: list,
    query_vec: list[float],
    k: int,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query stays exact; each
    subspace contributes lut[s][code] = query_sub · centroid, so a vector's
    approximate dot product is m table lookups + a sum — never touching the
    original floats. (id, approx_dot), descending top-k via TakeOrdered.
    """
    import numpy as np

    books = [np.array(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    sub = books[0].shape[1]
    q = np.array(query_vec, dtype=np.float64)
    lut = np.stack([books[s] @ q[s * sub:(s + 1) * sub] for s in range(m)])

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.array(pdf["codes"].to_list(), dtype=np.int64)
            scores = lut[np.arange(m), codes].sum(axis=1)
            yield pd.DataFrame({"id": pdf["id"], "approx_dot": scores})

    scored = encoded.mapInPandas(gen, schema="id long, approx_dot double")
    return scored.orderBy(F.desc("approx_dot"), "id").limit(k)


def pq_rerank_topk(
    corpus: DataFrame,
    encoded: DataFrame,
    codebooks: list,
    query_vec: list[float],
    k: int,
    expand: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage ANN: PQ asymmetric scan retrieves ``expand·k`` candidates
    from the compressed codes (the only full-corpus pass — m bytes/vector),
    then the exact kernel re-scores just those candidates from the float
    column. Retrieval cost scales with the compressed size, recall with
    ``expand`` — the production PQ pattern (IVFADC-style without the
    coarse stage; compose with ivf_assign to add it).
    """
    cand = pq_topk(encoded, codebooks, query_vec, expand * k).select(
        F.col("id").alias(id_col)
    )
    pruned = corpus.join(F.broadcast(cand), id_col)
    return cosine_topk(pruned, query_vec, k, id_col, vec_col)


def ivf_pq_topk(
    df: DataFrame,
    centroids: list[list[float]],
    codebooks: list,
    query_vec: list[float],
    k: int,
    nprobe: int = 2,
    expand: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFADC: the full production ANN stack — coarse cells prune the
    corpus (IVF), PQ codes score the survivors in the compressed domain
    (asymmetric distance), the exact kernel reranks the short candidate
    list. Per query: nprobe/len(centroids) of the corpus is touched, m
    bytes per touched vector are scanned, expand·k floats are reranked.
    Recall composes multiplicatively (cell recall × code recall), so both
    stages are tunable independently (nprobe, expand).
    """
    qn = _l2(query_vec)
    ranked = sorted(
        range(len(centroids)),
        key=lambda i: (
            -sum(a * b for a, b in zip(centroids[i], query_vec))
            / (_l2(centroids[i]) * qn),
            i,
        ),
    )
    probe = ranked[:nprobe]
    cells = ivf_assign(df, centroids, id_col, vec_col).filter(
        F.col("cell").isin(*probe)
    )
    encoded = pq_encode(cells, codebooks, id_col, vec_col)
    return pq_rerank_topk(
        cells, encoded, codebooks, query_vec, k, expand, id_col, vec_col
    )
