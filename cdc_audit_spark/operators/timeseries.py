"""Time-series subsequence similarity search — UCR-suite-style
z-normalized sliding-window matching (Rakthanmanon et al., KDD 2012)
expressed entirely in window functions.

The classic formulation slides a length-m query over every series and
ranks windows by z-normalized Euclidean distance. The textbook identity
removes the per-window re-normalization: with the query pre-z-normalized
(Σq = 0, Σq² = m),

    dist²(t) = 2m − 2 · (Σ_j x[t+j]·q_j − µ_t·Σq) / σ_t

so each window needs only three running quantities — Σx and Σx² over the
frame (two ordinary windowed sums) and the position-weighted dot product,
which for fixed m is just m ``lead()`` taps with literal coefficients.
Everything is whole-stage-codegen window evaluation over ONE
(key)-partitioned sort: no self-join, no array explode, no Python — the
shape that survives a 100× scale-up because the only exchange is the
series repartition every per-key window op already pays.

Degenerate (constant) windows have σ = 0 and no defined z-distance; they
are excluded, as are ragged tail windows (frame count < m).

Distances are micro-quantized (floor(d²·1e6 + 0.5) BIGINT — the repo's
engine-exact idiom) so the top-k CUT is an exact integer comparison and
the whole operator hash-checks against a DuckDB oracle running the
identical expression tree.

No reference parity: the reference (dan-da/cdc_audit, PHP trigger
generator) has no time-series operators; this extends SURVEY §2.11.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "subsequence_topk",
    "subsequence_topk_long",
    "znorm_distances",
    "znorm_distances_long",
    "znormalize",
]

_MICRO = 1_000_000.0

# The m lead() taps compile an O(m)-wide projection per row; past a few
# hundred points the generated code (and Catalyst tree) degrades, so
# refuse loudly rather than blow up the compiler silently.
_MAX_QUERY_LEN = 512

# Degenerate-window guard: require var > (sxx/m) * eps. Cancellation
# noise on a constant window is O(msq * 2^-52); real variation clears
# msq * 1e-10 at any value magnitude.
_VAR_REL_EPS = 1e-10


def znormalize(query: list[float]) -> tuple[list[float], float]:
    """(z-normalized query, Σ of the z-values). The Σ is analytically 0
    but carried EXPLICITLY as the float it actually is (~1e-16), so the
    engine expression can use the identical literal the oracle uses —
    no silent 'treat as zero' divergence."""
    m = len(query)
    if m < 2:
        raise ValueError("query needs at least 2 points")
    mu = sum(query) / m
    var = sum((x - mu) ** 2 for x in query) / m
    if var == 0:
        raise ValueError("constant query has no z-normalized form")
    sd = math.sqrt(var)
    qz = [(x - mu) / sd for x in query]
    return qz, sum(qz)


def znorm_distances(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tie_col: str,
    val_col: str,
    query: list[float],
) -> DataFrame:
    """Per (series key, window start): the micro-quantized squared
    z-normalized distance of the length-m window starting there to the
    query. One per-key sort; m lead taps + two frame sums; codegen
    throughout. Output: (key, ts, tie, dist2_micro, dist2)."""
    m = len(query)
    if m > _MAX_QUERY_LEN:
        raise ValueError(
            f"query length {m} exceeds {_MAX_QUERY_LEN}: the dot product "
            "compiles to m lead() taps (an O(m)-wide expression tree), "
            "which is fine for short patterns but would blow up codegen "
            "for long ones. At scale, long queries should use a chunked "
            "dot-product (explode into fixed-size segments and sum) or a "
            "matrix-profile tier instead."
        )
    from cdc_audit_spark.operators.exprs import memo_column

    # The tree is identical for identical (columns, query) — ~m·5 + 40
    # Column ops of pure py4j latency per build otherwise, re-paid every
    # micro-batch of the streaming matcher (memo_column docstring).
    sel1, f1, sel2, f2, sel3 = memo_column(
        ("znorm", key_col, ts_col, tie_col, val_col, tuple(query)),
        lambda: _znorm_cols(key_col, ts_col, tie_col, val_col, query))
    return df.select(*sel1).filter(f1).select(*sel2).filter(f2).select(*sel3)


def _znorm_cols(key_col, ts_col, tie_col, val_col, query):
    """The three select stages + two filters of :func:`znorm_distances`
    as reusable unresolved Columns."""
    m = len(query)
    qz, sqz = znormalize(query)
    order = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    frame = order.rowsBetween(0, m - 1)

    val = F.col(val_col)
    sx = F.sum(val).over(frame)
    sxx = F.sum(val * val).over(frame)
    cnt = F.count(val).over(frame)
    dot = F.lit(qz[0]) * val
    for j in range(1, m):
        dot = dot + F.lit(qz[j]) * F.lead(val, j).over(order)

    sel1 = (F.col(key_col), F.col(ts_col), F.col(tie_col),
            sx.alias("__sx"), sxx.alias("__sxx"), cnt.alias("__c"),
            dot.alias("__dot"))
    f1 = F.col("__c") == m
    mu = F.col("__sx") / F.lit(float(m))
    # Guard on the VARIANCE relative to the mean square, not on sigma:
    # constant windows compute sxx/m - mu*mu as float NOISE either side
    # of zero. A tiny NEGATIVE makes sigma = sqrt(neg) = NaN, which Spark
    # orders above every number (NaN > 0 is true) while the non-ANSI
    # NaN->long cast yields 0 — degenerate windows would rank FIRST as
    # perfect matches. A tiny POSITIVE gives sigma ~ 1e-9 and a 0/0-ish
    # garbage distance. The relative threshold var > msq·1e-10 kills
    # both: cancellation noise is O(msq·2⁻⁵²), genuine variation is far
    # above msq·1e-10 at any magnitude, and the identical expression
    # evaluates bit-identically in DuckDB for oracle parity.
    msq = F.col("__sxx") / F.lit(float(m))
    var = msq - mu * mu
    sigma = F.sqrt(var)
    dist2 = (F.lit(2.0 * m)
             - F.lit(2.0) * (F.col("__dot") - mu * F.lit(sqz)) / sigma)
    sel2 = (F.col(key_col), F.col(ts_col), F.col(tie_col),
            var.alias("__var"),
            msq.alias("__msq"),
            F.floor(dist2 * F.lit(_MICRO) + F.lit(0.5)).cast("long")
            .alias("dist2_micro"))
    f2 = F.col("__var") > F.col("__msq") * F.lit(_VAR_REL_EPS)
    sel3 = (F.col(key_col), F.col(ts_col), F.col(tie_col),
            F.col("dist2_micro"),
            (F.col("dist2_micro").cast("double") / F.lit(_MICRO))
            .alias("dist2"))
    return sel1, f1, sel2, f2, sel3


def subsequence_topk(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tie_col: str,
    val_col: str,
    query: list[float],
    k: int,
) -> DataFrame:
    """The k nearest windows corpus-wide: TakeOrdered on the exact
    integer key (ties on series key, then window start) — never a global
    sort."""
    return (
        znorm_distances(df, key_col, ts_col, tie_col, val_col, query)
        .orderBy(F.col("dist2_micro"), F.col(key_col), F.col(tie_col))
        .limit(k)
    )


#: Quantum for the long form's order-free dot product: each per-position
#: term floor(x·q_j·1e9 + 0.5) is an exact BIGINT, so the sum is
#: bit-identical under any partitioning (the PCA covariance idiom).
_DOT_NANO = 1_000_000_000.0


def znorm_distances_long(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tie_col: str,
    val_col: str,
    query: list[float],
) -> DataFrame:
    """The LONG-QUERY form of :func:`znorm_distances` — the at-scale
    alternative the short form's m <= 512 guard points at. The m lead()
    taps (an O(m)-wide compiled projection) are replaced by a
    CONSTANT-WIDTH plan: each point fans out to its m (window-start,
    coefficient) contributions via a broadcast (j, q_j) join, and one
    (key, start)-keyed aggregate folds the dot products — O(n·m) rows
    move through a hash aggregate, but the expression tree no longer
    grows with m, so a 4096-point query compiles exactly like an 8-point
    one.

    Order-free exactness: an aggregated float dot would differ in the
    last ulp per shuffle order (the window form avoids this only because
    its expression tree fixes the evaluation order), so each term is
    micro-quantized to an exact BIGINT nano-grain FIRST and the sum is
    integer — bit-identical under any partitioning and in DuckDB. The
    quantized dot differs from the float form's by at most m·5e-10 per
    window; the two forms agree on every non-borderline window and the
    long form is self-consistent and oracle-checkable.

    Output schema matches :func:`znorm_distances`; the same relative
    variance guard excludes degenerate windows."""
    m = len(query)
    qz, sqz = znormalize(query)
    spark = df.sparkSession
    qdf = spark.createDataFrame(
        [(j, float(qz[j])) for j in range(m)], "j long, qj double")

    order = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    frame = order.rowsBetween(0, m - 1)
    val = F.col(val_col)
    base = df.select(
        F.col(key_col), F.col(ts_col), F.col(tie_col), val.alias("__v"),
        F.row_number().over(order).alias("__pos"),
        F.sum(val).over(frame).alias("__sx"),
        F.sum(val * val).over(frame).alias("__sxx"),
        F.count(val).over(frame).alias("__c"),
    )
    dots = (
        base.select(F.col(key_col), "__pos", "__v")
        # the m-way fan-out: a broadcast nested-loop against the m-row
        # coefficient table — bounded by construction (m is the query)
        .crossJoin(F.broadcast(qdf))
        .select(
            F.col(key_col),
            (F.col("__pos") - F.col("j")).alias("__start"),
            F.floor(F.col("__v") * F.col("qj") * F.lit(_DOT_NANO)
                    + F.lit(0.5)).cast("long").alias("__dq"),
        )
        .filter(F.col("__start") >= 1)
        .groupBy(key_col, "__start")
        .agg(F.sum("__dq").alias("__dotq"))
    )
    per = (
        base.filter(F.col("__c") == m).alias("L")
        .join(dots.alias("D"),
              (F.col("L.__pos") == F.col("D.__start"))
              & (F.col(f"L.{key_col}") == F.col(f"D.{key_col}")))
        .select("L.*", "D.__dotq")
    )
    mu = F.col("__sx") / F.lit(float(m))
    msq = F.col("__sxx") / F.lit(float(m))
    var = msq - mu * mu
    sigma = F.sqrt(var)
    dot = F.col("__dotq").cast("double") / F.lit(_DOT_NANO)
    dist2 = (F.lit(2.0 * m)
             - F.lit(2.0) * (dot - mu * F.lit(sqz)) / sigma)
    out = per.select(
        key_col, ts_col, tie_col,
        var.alias("__var"), msq.alias("__msq"),
        F.floor(dist2 * F.lit(_MICRO) + F.lit(0.5)).cast("long")
        .alias("dist2_micro"),
    ).filter(F.col("__var") > F.col("__msq") * F.lit(_VAR_REL_EPS))
    return out.select(
        key_col, ts_col, tie_col, "dist2_micro",
        (F.col("dist2_micro").cast("double") / F.lit(_MICRO))
        .alias("dist2"),
    )


def subsequence_topk_long(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tie_col: str,
    val_col: str,
    query: list[float],
    k: int,
) -> DataFrame:
    """:func:`subsequence_topk` through the long-query plan."""
    return (
        znorm_distances_long(df, key_col, ts_col, tie_col, val_col, query)
        .orderBy(F.col("dist2_micro"), F.col(key_col), F.col(tie_col))
        .limit(k)
    )
