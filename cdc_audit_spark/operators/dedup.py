"""Deduplication operators for large-scale corpus cleaning.

Exact dedup is a content-hash groupBy (one shuffle on the digest — never on
the raw text, so shuffle volume is O(rows × 32 bytes) regardless of document
size). Near-dup uses MinHash+LSH: shingle → per-row signature (all JVM-side
xxhash64, no Python) → band keys → self-join on band buckets → candidate
pairs. At 100 TB the LSH band join is the only shuffle, and it shuffles
(id, band_hash) pairs, not documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "exact_dedup",
    "exact_dedup_groups",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "ngram_jaccard_pairs",
]


def exact_dedup(df: DataFrame, cols: list[str], order_col: str) -> DataFrame:
    """Keep one deterministic representative (min ``order_col``) per distinct
    value of ``cols``.

    Window-over-digest rather than dropDuplicates: dropDuplicates keeps an
    *arbitrary* row, which breaks rerun determinism; ranking by an explicit
    tiebreak keeps results stable across cluster sizes.
    """
    key = F.md5(F.concat_ws("\x1f", *cols)) if len(cols) > 1 else F.md5(F.col(cols[0]))
    w = Window.partitionBy(key).orderBy(F.col(order_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Duplicate-group summary: content hash, surviving id, copy count."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def _shingles(text_col: str, shingle_size: int):
    """Word n-gram shingles as an array column, built entirely from JVM
    expressions: split → sliding concat via transform over an index sequence."""
    tokens = F.split(F.col(text_col), r"\s+")
    n = F.greatest(F.size(tokens) - F.lit(shingle_size - 1), F.lit(1))
    idx = F.sequence(F.lit(0), n - F.lit(1))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, shingle_size)))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    shingle_size: int = 3,
) -> DataFrame:
    """(id, sig: array<long>) — element i is min over shingles of
    xxhash64(i, shingle). One narrow map stage, no shuffle, no Python."""
    sh = _shingles(text_col, shingle_size)

    def hasher(i: int):
        # NB: must be a one-parameter lambda — a second (defaulted) parameter
        # would make PySpark treat it as an (element, index) lambda and feed
        # the array index into the seed slot.
        return lambda s: F.xxhash64(F.lit(i), s)

    sig = F.array(*[
        F.array_min(F.transform(sh, hasher(i))) for i in range(num_hashes)
    ])
    return df.select(F.col(id_col).alias("id"), sig.alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
) -> DataFrame:
    """Near-duplicate candidate pairs (id_a < id_b) via banded LSH.

    Rows agreeing on all ``num_hashes/bands`` minhashes of any band land in
    the same bucket. Join input is (band, band_hash, id) — tiny rows — so the
    self-join shuffle is independent of document size. distinct() collapses
    pairs found in multiple bands.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must divide evenly into bands")
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_size)
    band_entries = sigs.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(*[
                        F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)
                    ]).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select("id", "bk.band", "bk.bucket")
    a = band_entries.alias("a")
    b = band_entries.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash fingerprint per document, JVM-side.

    Per token: xxhash64 → 64 sign votes; aggregate votes with a zip_with
    fold over the token array; sign → bits → one long. Near-dup detection is
    then hamming-distance banding on the fingerprint. No Python, no shuffle.
    """
    from functools import reduce

    tokens = F.split(F.col(text_col), r"\s+")

    def bit_votes(t):
        # one ±1 vote per bit of the token hash; bit positions are Python
        # ints (shiftright requires a literal shift amount)
        return F.array(*[
            F.when(
                F.shiftright(F.xxhash64(t), j).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1))
            for j in range(64)
        ])

    votes = F.aggregate(
        tokens,
        F.array(*[F.lit(0)] * 64),
        lambda acc, t: F.zip_with(acc, bit_votes(t), lambda x, y: x + y),
    )
    fingerprint = reduce(
        lambda a, b: a.bitwiseOR(b),
        [
            F.when(votes[j] > 0, F.shiftleft(F.lit(1).cast("long"), j))
            .otherwise(F.lit(0).cast("long"))
            for j in range(64)
        ],
    )
    return df.select(F.col(id_col).alias("id"), fingerprint.alias("simhash64"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    candidates: DataFrame,
    shingle_size: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs (id_a, id_b).

    The exact-verify stage after LSH: joins shingle sets back onto the
    (small) candidate set — broadcast when it fits — and computes
    |∩| / |∪| with array intersections, JVM-side.
    """
    sh = df.select(
        F.col(id_col).alias("id"), _shingles(text_col, shingle_size).alias("sh")
    )
    out = (
        candidates
        .join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .select("id_a", "id_b", "jaccard")
    )
    return out.filter(F.col("jaccard") >= threshold) if threshold > 0 else out
