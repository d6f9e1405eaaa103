"""Benchmark decontamination: flag corpus documents sharing n-grams with an
evaluation set (beyond-reference training-pipeline operator, north star
`BASELINE.json`).

The standard contamination check for LLM training data: a document is
contaminated if any length-n token window also occurs in a benchmark/eval
document (n = 8 by convention — long enough that shared windows imply
copying, not chance). The Spark shape:

  tokenize → sliding n-grams (JVM-side transform/slice, no UDF)
  → distinct per doc → equi-join corpus grams against benchmark grams.

Scale notes: the gram table multiplies the corpus by ~tokens-per-doc, so
the join key is the 64-bit xxhash of the gram (8 bytes shuffled, not the
~50-byte string; false-positive odds |corpus grams|·|bench grams|/2^64 ≈ 0).
Benchmark sets are MBs against a TB-scale corpus, so the benchmark side is
broadcast — the corpus-side gram explosion then never shuffles at all: the
whole check is map-side behind one scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def _token_array(text_col: str) -> Column:
    toks = F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)
    return F.filter(toks, lambda t: F.length(t) > 0)


def ngram_exposure(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *keep, gram): the distinct space-joined token n-grams per doc.

    The sliding window is a transform over sequence(0, size-n) with an
    array slice — pure Catalyst expressions. The token array is
    let-bound (exprs.bind), NOT captured as an inline subtree: a
    captured array expression inside a higher-order lambda re-evaluates
    on every iteration (O(tokens^2) splitting per doc — the
    winnow_fingerprints bug class); a bound variable is a slot read,
    evaluated once per row. Documents shorter than n tokens contribute
    no grams.
    """
    from cdc_audit_spark.operators.exprs import bind, memo_column

    def build_gram_col():
        def grams_of(w):
            return F.when(
                F.size(w) >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size(w) - n),
                    lambda i: F.array_join(F.slice(w, i + 1, n), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))

        return F.explode(F.array_distinct(
            bind(_token_array(text_col), grams_of))).alias("gram")

    # identical tree per (text_col, n): memoized so repeated query
    # construction pays dict lookups, not py4j round-trips per node
    gram_col = memo_column(("ngram_exposure", text_col, n), build_gram_col)
    narrow = df.select(F.col(id_col).alias("id"), *keep, F.col(text_col))
    # CPU-bound per-doc stage: make sure input splits use every core (a
    # single-file source otherwise runs the whole gram build on one task).
    # Streaming micro-batches keep their source partitioning.
    if not df.isStreaming:
        par = df.sparkSession.sparkContext.defaultParallelism
        if narrow.rdd.getNumPartitions() < par:
            narrow = narrow.repartition(par)
    return narrow.select("id", *keep, gram_col)


def benchmark_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    keep: tuple[str, ...] = (),
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(id, *keep, gram) rows of the corpus whose gram also occurs in the
    benchmark — one row per (contaminated doc, shared gram).

    Aggregate downstream for the report (distinct ids = contaminated docs;
    distinct grams = leaked windows). The join runs on xxhash64(gram);
    the gram string rides along for reporting only.
    """
    cg = ngram_exposure(corpus, text_col, id_col, n, keep).withColumn(
        "__h", F.xxhash64("gram")
    )
    bg = (
        ngram_exposure(benchmark, text_col, id_col, n)
        .select(F.xxhash64("gram").alias("__h"))
        .distinct()
    )
    if broadcast_benchmark:
        bg = F.broadcast(bg)
    return cg.join(bg, "__h").drop("__h")
