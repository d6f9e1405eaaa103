"""Always-on training-data curation: the firehose drain.

The operators this engine grew for the LLM pipeline — near-dup rejection
against a maintained LSH index, benchmark decontamination against a
static eval-set gram blocklist, the CCNet-style quality gate under a
corpus-trained Stupid-Backoff LM — composed into ONE exactly-once ingest
stream, the shape a real 100 TB curation deployment runs:

    raw docs ─► near-dup filter ─► decontam ─► LM quality gate ─► curated
                 (vs maintained     (vs static    (vs maintained   corpus
                  band/bucket        broadcast     gram counts)   (manifest
                  index)             8-gram set)                   table)

The decontamination stage is STATELESS (the benchmark gram set is a
static broadcast table — the caller must keep it immutable across
restarts, the same contract as the batch/streaming `operators.decontam`
forms), so it adds no commit, no guard and no replay window: it is a
deterministic function of the batch, evaluated map-side behind the scan.

Per micro-batch, THREE manifest commits, each O(delta), each
independently epoch-guarded with its state read PINNED at the newest
version committed before the epoch (`stream_dedup._version_before_epoch`)
— so a replay after any prefix of the commits recomputes the identical
accept set from identical pre-state and each table skips the part it
already holds:

1. the dedup index appends the batch's accepted ``(band, bucket, id)``
   entries (entries land for every DEDUP-accepted doc, gate outcome
   regardless: a future copy of a quality-rejected doc is still a
   duplicate — its content was already adjudicated);
2. the curated table appends the docs that passed BOTH filters;
3. the LM count table appends the gate-accepted docs' gram credits —
   the model is trained by the curated corpus itself, so the gate's
   notion of "fluent" tracks what the pipeline has accepted so far
   (ingest is insert-only: no debits, no base replica needed — the
   curated table IS the corpus).

Bootstrap: before the model has mass the gate passes docs through
(no evidence is not evidence of junk) — the first batches seed both the
index and the model.

Scale shape per batch: one signature pass + tiny entry shuffle + an
index semi-join (dedup), one broadcast model join + per-doc aggregate
(gate), three delta appends; `maybe_fold_lm_counts` and `maybe_compact`
bound the LSMs' fan-in. Nothing ever rewrites or rescans the corpus.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cdc_audit_spark.streaming import genstate

__all__ = [
    "apply_curation_epoch",
    "stream_curation_sync",
]


def apply_curation_epoch(
    idx_t,
    acc_t,
    counts_t,
    batch_df,
    epoch_id: int,
    run_id: str | None,
    text_col: str,
    id_col: str,
    max_avg_neg_log10: float,
    n: int = 2,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    fold_max_dirs: int = 16,
    benchmark_df=None,
    decontam_n: int = 8,
) -> None:
    """One micro-batch of the composed curation drain (module docstring
    for the protocol). ``batch_df`` is PLAIN document rows (an ingest
    firehose, not an audit log). ``benchmark_df`` (optional) switches on
    the decontamination stage: docs sharing a ``decontam_n``-gram with
    it never reach the gate, the curated table or the model — but their
    LSH entries still land in the dedup index (a future copy of a
    contaminated doc is still a duplicate; its content was already
    adjudicated, same rule as quality-rejected docs)."""
    from cdc_audit_spark.operators.decontam import benchmark_overlap
    from cdc_audit_spark.operators.dedup import incremental_lsh_dedup
    from cdc_audit_spark.operators.ngram_lm import (
        _doc_grams,
        fold_ngram_count_deltas,
        lm_from_counts,
        score_perplexity,
    )
    from cdc_audit_spark.streaming.stream_dedup import (
        _version_before_epoch,
        maybe_cluster_lsh_index,
    )
    from cdc_audit_spark.streaming.stream_lm import maybe_fold_lm_counts

    idx_done = idx_t.epoch_applied(epoch_id, run_id)
    acc_done = acc_t.epoch_applied(epoch_id, run_id)
    counts_done = counts_t.epoch_applied(epoch_id, run_id)
    if idx_done and acc_done and counts_done:
        return
    extra = {"epoch": int(epoch_id), "run_id": run_id}

    # ---- near-dup filter against the PINNED pre-epoch index, read
    # pruned to the dirs the batch's bucket keys can touch (the
    # bucket-clustered compaction below keeps the layout skippable)
    from pyspark.storagelevel import StorageLevel

    from cdc_audit_spark.operators.dedup import lsh_band_entries

    pre_i = _version_before_epoch(idx_t, epoch_id)
    batch_entries = lsh_band_entries(
        batch_df, text_col, id_col, num_hashes, bands, shingle_size
    ).persist(StorageLevel.MEMORY_AND_DISK)
    index = (idx_t.read_pruned_for_keys(batch_entries.select("bucket"),
                                        "bucket", version=pre_i)
             if pre_i is not None else None)
    accepted_ids, entries = incremental_lsh_dedup(
        batch_df, index, text_col, id_col,
        num_hashes=num_hashes, bands=bands, shingle_size=shingle_size,
        entries=batch_entries)
    survivors = batch_df.join(
        accepted_ids.withColumnRenamed("id", id_col), id_col, "left_semi")

    # ---- stateless decontamination against the static benchmark set
    if benchmark_df is not None:
        dirty = (benchmark_overlap(survivors, benchmark_df, text_col,
                                   id_col, n=decontam_n)
                 .select(F.col("id").alias(id_col)).distinct())
        survivors = survivors.join(dirty, id_col, "left_anti")

    # ---- quality gate under the PINNED pre-epoch model
    pre_c = _version_before_epoch(counts_t, epoch_id)
    model = (lm_from_counts(fold_ngram_count_deltas(counts_t.read(pre_c)),
                            n=n)
             if pre_c is not None else None)
    if model is not None and model.total > 0:
        scored = score_perplexity(survivors, text_col, id_col, model,
                                  micro=True)
        keep = scored.filter(
            -F.col("avg_log10_score") <= F.lit(max_avg_neg_log10))
        accepted = survivors.join(keep.select(id_col), id_col, "left_semi")
    else:
        accepted = survivors  # no model mass yet: pass through

    try:
        if not idx_done:
            idx_t.append(entries, extra=extra)
        if not acc_done:
            acc_t.append(accepted, extra=extra)
        if not counts_done:
            credit = (_doc_grams(accepted, text_col, n)
                      .groupBy("order", "gram")
                      .agg(F.count("*").alias("cnt")))
            counts_t.append(credit, extra=extra)
    finally:
        batch_entries.unpersist()
    maybe_fold_lm_counts(counts_t, max_dirs=fold_max_dirs)
    # bucket-clustered compaction keeps the per-epoch pruned index read
    # (above) skipping dirs; the replay guard survives the optimize
    maybe_cluster_lsh_index(idx_t, max_dirs=4 * fold_max_dirs)
    acc_t.maybe_compact(max_dirs=4 * fold_max_dirs)


def stream_curation_sync(
    spark: SparkSession,
    source_path: str,
    schema,
    index_path: str,
    accepted_path: str,
    counts_path: str,
    checkpoint_path: str,
    text_col: str,
    id_col: str,
    max_avg_neg_log10: float,
    n: int = 2,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    fold_max_dirs: int = 16,
    benchmark_df=None,
    decontam_n: int = 8,
):
    """Drain a raw-document parquet firehose through near-dup rejection,
    optional benchmark decontamination (pass ``benchmark_df``),
    and the self-training LM quality gate into a curated manifest table.
    Returns the StreamingQuery; the curated corpus is
    ``ManifestTable(spark, accepted_path).read()`` and the live model
    ``lm_from_counts(fold_ngram_count_deltas(ManifestTable(spark,
    counts_path).read()))``."""
    from cdc_audit_spark.sinks.manifest import ManifestTable

    idx_t = ManifestTable(spark, index_path)
    acc_t = ManifestTable(spark, accepted_path)
    counts_t = ManifestTable(spark, counts_path)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path)

    def handle(batch_df, epoch_id: int) -> None:
        apply_curation_epoch(
            idx_t, acc_t, counts_t, batch_df, epoch_id,
            genstate.checkpoint_run_id(checkpoint_path),
            text_col, id_col, max_avg_neg_log10, n=n,
            num_hashes=num_hashes, bands=bands,
            shingle_size=shingle_size, fold_max_dirs=fold_max_dirs,
            benchmark_df=benchmark_df, decontam_n=decontam_n,
        )

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
