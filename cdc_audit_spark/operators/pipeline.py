"""End-to-end corpus curation: the hygiene operators composed the way a
training-data pipeline actually runs them.

Stage chain (each stage an existing operator, each flag map-side or one
bounded join — no stage rescans the corpus):

  quality gate (text.with_quality, map-side flag)
    → exact dedup among passers (digest groupBy, min-id survivor)
    → benchmark decontamination (decontam.benchmark_overlap — corpus side
      joins a broadcast benchmark-gram set, never shuffles for the join)
    → deterministic split assignment (sampling.deterministic_split,
      map-side hash CASE)

Everything is computed in ONE lineage with stage flags carried per row, so
the stage-count report is a single aggregation over one pass — not one
recount per stage. At 100 TB: the only corpus shuffles are the dedup
digest groupBy and the survivor semi-join; quality, decontam membership,
and split assignment are map-side against broadcast state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_audit_spark.operators.decontam import benchmark_overlap
from cdc_audit_spark.operators.sampling import deterministic_split
from cdc_audit_spark.operators.text import DEFAULT_STOPWORDS, with_quality

__all__ = ["curate"]


def curate(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    benchmark: DataFrame,
    splits: dict[str, float],
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
    min_tokens: int = 20,
    max_tokens: int = 1000,
    max_stopword_ratio: float = 0.5,
    ngram: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Run the curation chain; return ``(labeled, report)``.

    ``labeled`` is the train-ready corpus — survivors of every gate, with a
    ``split`` column. ``report`` is one row per stage
    ``(stage, n_docs)``: input, quality_pass, exact_dedup, decontaminated,
    then one ``split:<name>`` row per split — computed from the same pass.
    """
    q = with_quality(docs, text_col, stopwords=stopwords,
                     min_tokens=min_tokens, max_tokens=max_tokens,
                     max_stopword_ratio=max_stopword_ratio)
    digest = F.md5(F.col(text_col))
    mins = (
        q.filter(F.col("passes"))
        .groupBy(digest.alias("__digest"))
        .agg(F.min(id_col).alias("__keep"))
    )
    w = (
        q.withColumn("__digest", digest)
        .join(mins, "__digest", "left")
        .withColumn("__surv",
                    F.col("passes") & (F.col(id_col) == F.col("__keep")))
    )
    contaminated = (
        benchmark_overlap(
            w.filter(F.col("__surv")).select(id_col, text_col),
            benchmark, text_col, id_col, n=ngram,
        )
        .select(F.col("id").alias(id_col)).distinct()
        .withColumn("__cont", F.lit(True))
    )
    w = (
        w.join(F.broadcast(contaminated), id_col, "left")
        .withColumn("__cont", F.coalesce(F.col("__cont"), F.lit(False)))
        .withColumn("__clean", F.col("__surv") & ~F.col("__cont"))
    )
    w = deterministic_split(w, id_col, splits)

    labeled = (
        w.filter(F.col("__clean"))
        .drop("__digest", "__keep", "__surv", "__cont", "__clean")
    )
    stage_aggs = [
        F.count("*").alias("input"),
        F.sum(F.col("passes").cast("long")).alias("quality_pass"),
        F.sum(F.col("__surv").cast("long")).alias("exact_dedup"),
        F.sum(F.col("__clean").cast("long")).alias("decontaminated"),
    ] + [
        F.sum((F.col("__clean") & (F.col("split") == s)).cast("long"))
        .alias(f"split:{s}")
        for s in splits
    ]
    one = w.agg(*stage_aggs)
    names = [f.name for f in one.schema.fields]
    pairs = ", ".join(f"'{n}', `{n}`" for n in names)
    report = one.selectExpr(
        f"stack({len(names)}, {pairs}) as (stage, n_docs)")
    return labeled, report
