"""Linear quality classifier over text — the CCNet / GPT-3-style corpus
quality filter, trained IN Spark.

A logistic regression on hashing-trick bag-of-words features (the
fastText linear recipe without the embedding layer). Everything is
expressed on the DataFrame so the heavy work stays JVM-side:

- **Features** never materialize a dense vector: a document's tokens map
  to ``n_buckets`` via the repo's portable md5 bucket
  (`sampling.hash_bucket` idiom), and the per-doc margin is a map-side
  Catalyst array fold over the token list against the weight vector as
  a BROADCAST ARRAY LITERAL — no join, no shuffle, no Python.
- **Training** is batch gradient descent with ONE shuffle per iteration:
  margins/residuals are computed map-side per row, then the gradient is
  an explode → groupBy(bucket) partial-aggregated sum over at most
  ``n_buckets`` keys (bounded, skew-free — bucket counts concentrate but
  partial agg absorbs it). The driver holds only the weight vector
  (n_buckets doubles) between iterations.
- **Scoring** (`score_quality`) is pure map-side whole-stage-codegen:
  zero shuffles at ANY corpus size.

At 100 TB: the per-iteration cost is one pass over the tokenized corpus
plus an n_buckets-key aggregate; cache/persist the tokenized projection
across iterations (the trainer does) and the loop is bandwidth-bound.
Determinism: float aggregation order varies with partitioning, so
trained weights are reproducible to ~1e-12 relative, not bitwise —
parity vs a single-node numpy reference is asserted at 1e-6 in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["train_quality_logreg", "score_quality", "margin_expr"]


def _bucket(tok: Column, n_buckets: int) -> Column:
    """Portable md5 token bucket (same idiom as sampling.hash_bucket —
    inlined on a lambda variable, which hash_bucket's signature allows)."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 6), 16, 10).cast("int") % n_buckets
    )


def _tokens(text_col: str) -> Column:
    return F.split(F.lower(F.col(text_col)), r"\s+")


def margin_expr(text_col: str, weights: list[float], bias: float,
                n_buckets: int) -> Column:
    """Map-side per-doc margin: mean over tokens of the token-bucket
    weight, plus bias — ``w · x + b`` with x the length-normalized
    hashed bag of words. One whole-stage-codegen'd expression."""
    warr = F.array(*[F.lit(float(w)) for w in weights])
    toks = _tokens(text_col)
    total = F.aggregate(
        F.transform(toks, lambda t: F.element_at(warr, _bucket(t, n_buckets) + 1)),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    return total / F.size(toks) + F.lit(float(bias))


def train_quality_logreg(
    df: DataFrame,
    text_col: str,
    label_col: str,
    n_buckets: int = 1024,
    iters: int = 10,
    lr: float = 2.0,
    l2: float = 1e-6,
) -> dict:
    """Train the filter on (text, 0/1 label) rows; returns
    ``{"weights": [...], "bias": float, "n_buckets": int}`` for
    :func:`score_quality`.

    Labels are whatever weak supervision the pipeline has: membership in
    a trusted reference corpus vs random crawl (the CCNet setup), a
    language flag, an upvote signal. Batch GD, not SGD — each iteration
    is one deterministic-up-to-float-order pass, so behavior is
    reproducible and testable against a numpy reference.
    """
    n_buckets, iters = int(n_buckets), int(iters)
    base = df.select(
        _tokens(text_col).alias("__t"),
        F.col(label_col).cast("double").alias("__y"),
    ).filter(F.size("__t") > 0)
    base = base.persist()
    n_docs = base.count()  # also materializes the cache
    if n_docs == 0:
        raise ValueError("train_quality_logreg: no non-empty documents")

    weights = [0.0] * n_buckets
    bias = 0.0
    try:
        for _ in range(iters):
            # margin_expr's body, rebound onto the tokenized column
            warr = F.array(*[F.lit(float(w)) for w in weights])
            total = F.aggregate(
                F.transform(
                    F.col("__t"),
                    lambda t: F.element_at(warr, _bucket(t, n_buckets) + 1),
                ),
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x,
            )
            margin = total / F.size("__t") + F.lit(float(bias))
            resid = (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))) - F.col("__y")
            scored = base.select(
                "__t",
                resid.alias("__r"),
                F.size("__t").cast("double").alias("__len"),
            )
            # gradient: d/dw_b = sum_docs r * (cnt_b / len). Explode to
            # (bucket, r/len) pairs; ONE bounded-key shuffle.
            grad_rows = (
                scored.select(
                    F.explode("__t").alias("__tok"), "__r", "__len")
                .select(
                    _bucket(F.col("__tok"), n_buckets).alias("__b"),
                    (F.col("__r") / F.col("__len")).alias("__g"),
                )
                .groupBy("__b").agg(F.sum("__g").alias("__g"))
                .collect()
            )
            gb = {int(r["__b"]): float(r["__g"]) for r in grad_rows}
            rsum = float(
                scored.agg(F.sum("__r").alias("s")).first()["s"] or 0.0)
            weights = [
                w - lr * (gb.get(b, 0.0) / n_docs + l2 * w)
                for b, w in enumerate(weights)
            ]
            bias -= lr * rsum / n_docs
    finally:
        base.unpersist()
    return {"weights": weights, "bias": bias, "n_buckets": n_buckets}


def score_quality(
    df: DataFrame,
    text_col: str,
    id_col: str,
    model: dict,
    prob_col: str = "quality_prob",
) -> DataFrame:
    """(id, quality_prob): sigmoid of the map-side margin — zero
    shuffles, the weight vector rides as an array literal into
    whole-stage codegen. Empty docs score sigmoid(bias)."""
    m = margin_expr(text_col, model["weights"], model["bias"],
                    model["n_buckets"])
    safe = F.when(F.size(_tokens(text_col)) > 0, m).otherwise(
        F.lit(float(model["bias"])))
    return df.select(
        F.col(id_col),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-safe))).alias(prob_col),
    )
