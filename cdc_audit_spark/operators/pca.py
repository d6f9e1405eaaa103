"""Distributed PCA over embedding columns — the dimensionality-reduction
step of a 100 TB embedding pipeline (whitening/compaction before ANN
indexing, SemDeDup, clustering).

The split of labor follows the repo's clustering playbook
(``operators.clustering``): the CORPUS-SCALE statistics are exact,
order-independent quantized-BIGINT aggregates; the tiny dense solve runs
on the driver where every published implementation runs it.

* **Means** (:func:`column_means`): per-dimension BIGINT sums of
  ``floor(x · 1e6)`` (the clustering module's quantum) — one bounded
  (dim)-keyed aggregate, bit-identical under any partitioning.
* **Covariance** (:func:`covariance_q`): per-ROW centered products
  quantized to BIGINT micro-units of ``1e-9`` and summed exactly — the
  float work (center, multiply, quantize) is per-row and therefore
  partitioning-independent; the cross-row reduction is integer addition,
  which commutes. The Arrow stage emits ONE upper-triangle partial
  (d(d+1)/2 BIGINTs) per batch; a (cell)-keyed aggregate folds the
  partials. At d = 64 the driver holds 2080 integers. Overflow headroom:
  |x| < 1 → per-row |q| < 1e9, so 2^63 accommodates ~9e9 rows per cell —
  and the quantum is a parameter when a corpus needs more.
* **Solve** (:func:`pca_train`): ``numpy.linalg.eigh`` on the d×d
  matrix, components sign-fixed so each one's largest-|coefficient|
  entry is positive (deterministic orientation).
* **Projection** (:func:`pca_project`): pure Catalyst —
  p = x·w − m·w with the component and the scalar m·w baked in as
  literals (``similarity._dot_lit``'s sequential fold), zero shuffle,
  whole-stage codegen; no Python in the row path.

The quantized covariance is hash-checked against a DuckDB oracle running
the identical integer arithmetic (query ``pca_covariance_q``); the
eigendecomposition layer is validated against an exact pure-Python
mirror and by partitioning-invariance in ``tests/test_pca.py``.

No reference parity: the reference (dan-da/cdc_audit, PHP trigger
generator) has no embedding operators; this extends SURVEY §2.11.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_audit_spark.operators.clustering import QUANT as MEAN_QUANT

__all__ = [
    "PCAModel",
    "column_means",
    "covariance_q",
    "fold_moment_state",
    "fold_moments",
    "incremental_moments",
    "moment_state_delta",
    "moments_delta",
    "pca_model_from_state",
    "pca_project",
    "pca_train",
]

#: Covariance quantum: centered products of unit-scale embeddings carry
#: ~9 significant digits at 1e9; BIGINT sums stay exact to ~9e9 rows.
COV_QUANT = 1_000_000_000


def _dim(df: DataFrame, vec_col: str) -> int:
    d = df.select(F.size(vec_col).alias("d")).first()
    if d is None:
        raise ValueError("empty input")
    return int(d["d"])


def column_means(df: DataFrame, vec_col: str) -> list[float]:
    """Exact per-dimension means: BIGINT sums of ``floor(x · 1e6)``
    divided back out — order-independent, so bit-identical under any
    partitioning (the clustering module's Lloyd-update idiom). One
    (dim)-keyed aggregate whose shuffle carries d rows after map-side
    combine; the driver holds d integers."""
    rows = (
        df.select(F.posexplode(F.col(vec_col).cast("array<double>"))
                  .alias("i", "x"))
        .groupBy("i")
        .agg(F.sum(F.floor(F.col("x") * F.lit(float(MEAN_QUANT)))
                   .cast("long")).alias("s"),
             F.count("*").alias("n"))
        .collect()
    )
    if not rows:
        raise ValueError("empty input")
    out = [0.0] * len(rows)
    for r in rows:
        out[int(r["i"])] = (int(r["s"]) / MEAN_QUANT) / int(r["n"])
    return out


def covariance_q(df: DataFrame, vec_col: str,
                 mean: list[float]) -> DataFrame:
    """The quantized upper-triangle covariance sums: one (i, j, cov_q)
    row per dimension pair i ≤ j (0-based), where
    ``cov_q = Σ_rows floor((x_i − m_i)(x_j − m_j) · 1e9 + 0.5)`` —
    BIGINT-exact, order-independent, and therefore oracle-checkable
    (the ``pca_covariance_q`` query runs the identical arithmetic in
    DuckDB). The Arrow stage streams row chunks (float work is per-row)
    and emits one partial vector per batch; the only shuffle carries
    d(d+1)/2-keyed partials."""
    import numpy as np
    import pandas as pd

    d = len(mean)
    mu = np.asarray(mean, dtype=np.float64)
    iu0, iu1 = np.triu_indices(d)
    ntri = len(iu0)

    def gen(batches):
        for pdf in batches:
            acc = np.zeros(ntri, dtype=np.int64)
            vecs = pdf["__v"].to_numpy()
            for lo in range(0, len(vecs), 512):
                chunk = np.array(
                    [np.asarray(v, dtype=np.float64)
                     for v in vecs[lo:lo + 512]])
                xc = chunk - mu
                prods = xc[:, iu0] * xc[:, iu1]
                acc += np.floor(prods * COV_QUANT + 0.5).astype(
                    np.int64).sum(axis=0)
            yield pd.DataFrame({"q": [acc.tolist()]})

    partials = (
        df.select(F.col(vec_col).alias("__v"))
        .mapInPandas(gen, schema="q array<long>")
    )
    return (
        partials.select(F.posexplode("q").alias("t", "q"))
        .groupBy("t")
        .agg(F.sum("q").alias("cov_q"))
        .select(
            F.lit(iu0.tolist())[F.col("t")].cast("long").alias("i"),
            F.lit(iu1.tolist())[F.col("t")].cast("long").alias("j"),
            F.col("cov_q"),
        )
    )


@dataclass
class PCAModel:
    """mean (d floats), components (k rows × d, orthonormal, variance-
    descending, sign-fixed), explained variance per component."""

    mean: list[float]
    components: list[list[float]]
    explained_variance: list[float]


def pca_train(df: DataFrame, vec_col: str, k: int) -> PCAModel:
    """Fit a k-component PCA: two corpus passes (means, quantized
    covariance partials), one driver-side d×d ``eigh``. Deterministic
    end to end: the distributed statistics are exact integers and the
    solve sees the identical matrix on every run/partitioning."""
    import numpy as np

    mean = column_means(df, vec_col)
    d = len(mean)
    if not 0 < k <= d:
        raise ValueError(f"k={k} out of range for dim {d}")
    n = df.count()
    if n < 2:
        raise ValueError("need at least 2 rows")
    tri = covariance_q(df, vec_col, mean).collect()
    cov = np.zeros((d, d), dtype=np.float64)
    for r in tri:
        v = (int(r["cov_q"]) / COV_QUANT) / (n - 1)
        cov[int(r["i"]), int(r["j"])] = v
        cov[int(r["j"]), int(r["i"])] = v
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for idx in order:
        w = vecs[:, idx]
        pivot = int(np.argmax(np.abs(w)))
        if w[pivot] < 0:
            w = -w
        comps.append([float(x) for x in w])
    return PCAModel(mean=mean, components=comps,
                    explained_variance=[float(vals[i]) for i in order])


# --------------------------------------------------------------------------
# CDC maintenance: raw second-moment sums are signed-mergeable
# --------------------------------------------------------------------------
#
# The centered covariance depends on the GLOBAL mean, so it cannot be
# maintained per-row — but the RAW moments can: each row's contribution
# to S2_ij = Σ floor(x_i · x_j · 1e9 + 0.5) is a per-row integer that
# does not reference any global state, so an audit batch's effect is
# debit(old images) + credit(final images) — the LM/BM25 index algebra
# applied to the PCA statistics. cov_ij then derives at read time as
# (S2_ij/Q − n·µ_i·µ_j)/(n−1) from the maintained sums. The maintained
# S2 is EXACT (integer equality with recomputing on the post-batch
# corpus — the oracle of cdc_pca_moments_sync); the covariance DERIVED
# from it differs from covariance_q's centered-product path by at most
# ~|µ|·1e-6 per cell (the mean quantum's floor bias dominates; measured
# ~1e-8 on the fixture against covariance magnitudes of ~1e-2) — far
# below anything an eigendecomposition can feel, and shrinkable by
# raising the mean quantum if a corpus ever needs it.


def moments_delta(
    base: DataFrame,
    audit_batch: DataFrame,
    vec_col: str,
    pk_cols: list[str],
) -> DataFrame:
    """The SIGNED (i, j, s2_q) delta one audit batch applies to the raw
    second-moment sums — O(batch rows · d²/2) compute, O(d²/2) output:
    the LSM write unit for keeping PCA statistics fresh without ever
    rescanning the corpus. Only the touched old images (broadcast
    semi-join) and the batch's final images are read."""
    from cdc_audit_spark.compact import keep_last_per_key
    from cdc_audit_spark.schema import AUDIT_EVENT

    row = (base.select(F.size(vec_col).alias("d")).first()
           or audit_batch.select(F.size(vec_col).alias("d")).first())
    if row is None:
        raise ValueError("both base and batch are empty")
    zero = [0.0] * int(row["d"])
    final = keep_last_per_key(audit_batch, pk_cols)
    touched = final.select(*pk_cols)
    old = base.join(F.broadcast(touched), pk_cols, "left_semi")
    debit = covariance_q(old, vec_col, zero).withColumn(
        "cov_q", -F.col("cov_q"))
    credit = covariance_q(
        final.filter(F.col(AUDIT_EVENT) != "delete"), vec_col, zero)
    return fold_moments(debit.unionByName(credit))


def fold_moments(df: DataFrame) -> DataFrame:
    """Collapse stacked signed moment deltas (plus an optional absolute
    snapshot) into the current (i, j, s2_q) state — one d²/2-keyed
    aggregate; zero entries are kept (a legitimate sum, unlike the
    count-index folds where zero means 'gone')."""
    return (
        df.select("i", "j", "s2_q" if "s2_q" in df.columns else "cov_q")
        .withColumnRenamed("cov_q", "s2_q")
        .groupBy("i", "j")
        .agg(F.sum("s2_q").alias("s2_q"))
    )


def incremental_moments(
    base: DataFrame,
    audit_batch: DataFrame,
    vec_col: str,
    pk_cols: list[str],
) -> DataFrame:
    """Bootstrap + one maintenance step — the self-contained form the
    oracle-checked query uses (integer equality with recomputing the raw
    moments on the post-batch corpus proves the algebra)."""
    d = _dim(base, vec_col)
    boot = covariance_q(base, vec_col, [0.0] * d).withColumnRenamed(
        "cov_q", "s2_q")
    delta = moments_delta(base, audit_batch, vec_col, pk_cols)
    return fold_moments(boot.unionByName(delta))


# --------------------------------------------------------------------------
# The full maintained moment STATE: count + first + second moments in one
# signed LSM table — everything pca_train needs, all integer-mergeable
# --------------------------------------------------------------------------
#
# Row encoding (kind, i, j, q):
#   kind 0: (−1, −1, Δrow-count)
#   kind 1: (i, −1, Δ Σ floor(x_i · 1e6))      — the column_means sums
#   kind 2: (i, j, Δ Σ floor(x_i·x_j · 1e9 + 0.5)), i ≤ j
# Every entry is a per-row integer contribution, so an audit batch's
# effect is debit(old images) + credit(final images) and the fold is a
# plain keyed sum (zeros kept — they are legitimate values here).
# ``pca_model_from_state`` rebuilds the model: the means are EXACTLY
# ``column_means`` of the current corpus (identical integer sums); the
# covariance derives as (S2/Q − n·µµᵀ)/(n−1) — within the documented
# mean-quantum bound of the centered-product path.


def _moment_state_rows(df: DataFrame, vec_col: str, d: int,
                       sign: int) -> DataFrame:
    """The (kind, i, j, q) contribution of one row set, signed."""
    cnt = df.select(
        F.lit(0).alias("kind"), F.lit(-1).cast("long").alias("i"),
        F.lit(-1).cast("long").alias("j"),
        F.lit(sign).cast("long").alias("q"),
    ).groupBy("kind", "i", "j").agg(F.sum("q").alias("q"))
    s1 = (
        df.select(F.posexplode(F.col(vec_col).cast("array<double>"))
                  .alias("i", "x"))
        .groupBy("i")
        .agg((F.lit(sign) * F.sum(
            F.floor(F.col("x") * F.lit(float(MEAN_QUANT))).cast("long")))
            .alias("q"))
        .select(F.lit(1).alias("kind"), F.col("i").cast("long").alias("i"),
                F.lit(-1).cast("long").alias("j"), "q")
    )
    s2 = covariance_q(df, vec_col, [0.0] * d).select(
        F.lit(2).alias("kind"), "i", "j",
        (F.lit(sign) * F.col("cov_q")).alias("q"))
    return cnt.unionByName(s1).unionByName(s2)


def moment_state_delta(
    base: DataFrame,
    audit_batch: DataFrame,
    vec_col: str,
    pk_cols: list[str],
) -> DataFrame:
    """The SIGNED full-state delta one audit batch applies — the LSM
    write unit for the always-on PCA maintenance stream
    (``streaming.stream_pca``): O(batch) compute and O(d²) output,
    the corpus never rescanned."""
    from cdc_audit_spark.compact import keep_last_per_key
    from cdc_audit_spark.schema import AUDIT_EVENT

    row = (base.select(F.size(vec_col).alias("d")).first()
           or audit_batch.select(F.size(vec_col).alias("d")).first())
    if row is None:
        raise ValueError("both base and batch are empty")
    d = int(row["d"])
    final = keep_last_per_key(audit_batch, pk_cols)
    touched = final.select(*pk_cols)
    old = base.join(F.broadcast(touched), pk_cols, "left_semi")
    debit = _moment_state_rows(old, vec_col, d, -1)
    credit = _moment_state_rows(
        final.filter(F.col(AUDIT_EVENT) != "delete"), vec_col, d, 1)
    return fold_moment_state(debit.unionByName(credit))


def fold_moment_state(df: DataFrame) -> DataFrame:
    """Collapse stacked signed state deltas into the current
    (kind, i, j, q) state — one bounded keyed aggregate (1 + d + d²/2
    keys); zeros kept."""
    return (
        df.select("kind", "i", "j", "q")
        .groupBy("kind", "i", "j")
        .agg(F.sum("q").alias("q"))
    )


def pca_model_from_state(state: DataFrame, k: int) -> PCAModel:
    """Rehydrate a PCAModel from the maintained moment state — three
    bounded reads (1 + d + d²/2 rows), one driver-side eigh; never
    touches the corpus. Means are EXACTLY ``column_means`` of the
    current corpus; covariance within the documented mean-quantum bound
    of ``pca_train``'s centered path."""
    import numpy as np

    rows = state.collect()
    n = 0
    s1: dict[int, int] = {}
    s2: dict[tuple[int, int], int] = {}
    for r in rows:
        if r["kind"] == 0:
            n = int(r["q"])
        elif r["kind"] == 1:
            s1[int(r["i"])] = int(r["q"])
        else:
            s2[(int(r["i"]), int(r["j"]))] = int(r["q"])
    if n < 2:
        raise ValueError("need at least 2 maintained rows")
    d = len(s1)
    if not 0 < k <= d:
        raise ValueError(f"k={k} out of range for dim {d}")
    mean = [(s1[i] / MEAN_QUANT) / n for i in range(d)]
    mu = np.asarray(mean)
    cov = np.zeros((d, d), dtype=np.float64)
    for (i, j), q in s2.items():
        v = (q / COV_QUANT - n * mu[i] * mu[j]) / (n - 1)
        cov[i, j] = v
        cov[j, i] = v
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for idx in order:
        w = vecs[:, idx]
        pivot = int(np.argmax(np.abs(w)))
        if w[pivot] < 0:
            w = -w
        comps.append([float(x) for x in w])
    return PCAModel(mean=mean, components=comps,
                    explained_variance=[float(vals[i]) for i in order])


def pca_project(df: DataFrame, vec_col: str, id_col: str,
                model: PCAModel) -> DataFrame:
    """Map-side projection: p_c = x·w_c − (m·w_c), the component and the
    scalar offset baked in as literals — sequential-fold dot products
    (``similarity._dot_lit``), zero shuffle, whole-stage codegen."""
    from cdc_audit_spark.operators.similarity import _dot_lit

    cols = [F.col(id_col)]
    for c, w in enumerate(model.components):
        off = 0.0
        for m, wi in zip(model.mean, w):
            off += m * wi
        cols.append((_dot_lit(F.col(vec_col), w) - F.lit(off))
                    .alias(f"p{c}"))
    return df.select(*cols)
