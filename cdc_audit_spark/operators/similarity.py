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

    Deterministic: ties broken by id. Output sim is DECIMAL(38,6) via the
    double-division pattern (oracle parity).
    """
    qnorm_sq = sum(float(x) * float(x) for x in query_vec)
    sim = _dot_lit(F.col(vec_col), query_vec) / (
        F.sqrt(_self_dot(F.col(vec_col))) * F.lit(qnorm_sq) ** 0.5
    )
    return (
        df.select(F.col(id_col), sim.cast("decimal(38,6)").alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.60,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine similarity above ``threshold``.

    Exact and quadratic — the verify stage of the near-dup pipeline. At
    scale, feed it only LSH-bucketed candidates (ann_bucket_pairs) or a
    bounded id range; never the full corpus. The pairwise dot product runs
    as a JVM zip_with/aggregate fold (same accumulation order as DuckDB's
    list_dot_product, so the oracle matches bit-for-bit).
    """
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
    sim = (dot / (F.col("a.nrm") * F.col("b.nrm"))).cast("decimal(38,6)")
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
) -> DataFrame:
    """(id, bucket) — bucket = sign-bit signature against ``num_bits`` random
    hyperplanes (seeded, reproducible). Cosine-similar vectors collide with
    probability 1 - θ/π per bit."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_bits, dim))
    bucket = F.lit(0).cast("long")
    for b in range(num_bits):
        bit = F.when(_dot_lit(F.col(vec_col), planes[b].tolist()) > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
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

    The equi-join on bucket replaces the quadratic cross join; shuffle volume
    is O(rows), per-bucket fan-out bounded by bucket occupancy (tune
    num_bits so buckets stay small; AQE splits skewed buckets)."""
    buckets = hyperplane_lsh_buckets(df, id_col, vec_col, num_bits, dim, seed)
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
