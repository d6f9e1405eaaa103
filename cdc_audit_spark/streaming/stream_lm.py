"""Always-on CDC maintenance of the corpus n-gram LM.

The batch operator (``operators.ngram_lm.maintain_ngram_counts``) debits
touched docs' old gram multisets and credits surviving final images — it
needs the audit batch AND the pre-batch base snapshot, exactly like the
materialized-view maintainer. The streaming form therefore mirrors
``stream_mview``: (base, counts) travel across micro-batches as generation
directories behind an atomically-flipped pointer (genstate's recovery
contract: a crash before the flip replays deterministically against the
previous generation; after the flip, the epoch guard makes replay a no-op).

Per micro-batch the corpus-scale work is O(batch): one broadcast semi-join
for the debits, the batch's own grams for the credits, and the bounded
count-table merge. The base-snapshot rewrite is the sandbox stand-in for a
storage-level MERGE into a transactional table (``sinks.manifest``); the
operator is storage-agnostic.

Why this matters at 100 TB: the LM quality gate (CCNet perplexity buckets)
is only as good as its model's freshness — retraining is a full corpus
scan, while this keeps the model current for the cost of each delta.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cdc_audit_spark.capture import apply_changes
from cdc_audit_spark.operators.ngram_lm import (
    _doc_grams,
    lm_from_counts,
    maintain_ngram_counts,
)
from cdc_audit_spark.streaming import genstate

__all__ = [
    "apply_lm_epoch",
    "apply_lm_manifest_epoch",
    "current_lm",
    "stream_lm_sync",
    "stream_lm_sync_manifest",
]


def current_lm(spark: SparkSession, state_path: str, n: int = 2):
    """(base, model) named by ``<state_path>/_current.json`` — the model
    rehydrated via ``lm_from_counts`` — or (None, None) before the first
    committed epoch."""
    p = genstate.read_pointer(state_path)
    if p is None:
        return None, None
    counts = spark.read.parquet(p["counts"])
    return spark.read.parquet(p["base"]), lm_from_counts(counts, n=n)


def apply_lm_epoch(
    spark: SparkSession,
    state_path: str,
    batch_df,
    epoch_id: int,
    base_bootstrap,
    text_col: str,
    pk_cols: list[str],
    n: int = 2,
    keep_generations: int | None = None,
    run_id: str | None = None,
) -> None:
    """Apply one audit micro-batch to the generation-snapshot
    (base, counts) LM state. Same idempotence/replay contract as
    ``stream_mview.apply_mview_epoch`` — a foreign run's pointer raises
    ``genstate.GenerationRunMismatch`` (double-counting a replayed delta
    would silently skew every downstream perplexity score)."""
    if genstate.epoch_applied(state_path, epoch_id, run_id=run_id):
        return
    p = genstate.read_pointer(state_path)
    if p is None:
        base = base_bootstrap
        counts = _doc_grams(base, text_col, n).groupBy("order", "gram").agg(
            F.count("*").alias("cnt"))
    else:
        base = spark.read.parquet(p["base"])
        counts = spark.read.parquet(p["counts"])
    new_counts = maintain_ngram_counts(counts, base, batch_df, text_col,
                                       pk_cols, n=n)
    new_base = apply_changes(base, batch_df, pk_cols)
    gen_base = genstate.generation_dir(state_path, epoch_id, "base")
    gen_counts = genstate.generation_dir(state_path, epoch_id, "counts")
    new_base.write.mode("overwrite").parquet(gen_base)
    new_counts.write.mode("overwrite").parquet(gen_counts)
    genstate.flip_pointer(state_path, epoch_id,
                          {"base": gen_base, "counts": gen_counts},
                          run_id=run_id)
    if keep_generations is not None:
        genstate.prune_generations(state_path, keep=keep_generations)


def apply_lm_manifest_epoch(
    base_t,
    counts_t,
    batch_df,
    epoch_id: int,
    run_id: str | None,
    text_col: str,
    pk_cols: list[str],
    n: int = 2,
) -> None:
    """One micro-batch of the exactly-once manifest-backed LM drain,
    per-table epoch-guarded (the ``stream_dedup.apply_dedup_epoch``
    contract): the new (base, counts) pair is a deterministic function of
    (batch, state at the previous epoch), and BOTH state reads are PINNED
    at the newest version committed BEFORE this epoch — if only one half
    of a previous attempt landed, an unpinned read would double-apply the
    batch into the other half. Each table independently skips the half it
    already holds; both converge with no cross-table transaction.

    First epoch bootstraps: the batch's surviving final images become the
    base and their grams the counts (an empty pre-state)."""
    from cdc_audit_spark.streaming.stream_dedup import _version_before_epoch

    base_done = base_t.epoch_applied(epoch_id, run_id)
    counts_done = counts_t.epoch_applied(epoch_id, run_id)
    if base_done and counts_done:
        return
    pre_b = _version_before_epoch(base_t, epoch_id)
    pre_c = _version_before_epoch(counts_t, epoch_id)
    extra = {"epoch": int(epoch_id), "run_id": run_id}
    if pre_b is None:
        base = batch_df.sparkSession.createDataFrame(
            [], batch_df.drop("audit_event", "audit_timestamp",
                              "audit_pk").schema)
    else:
        base = base_t.read(pre_b)
    if pre_c is None:
        counts = _doc_grams(base, text_col, n).groupBy("order", "gram").agg(
            F.count("*").alias("cnt"))
    else:
        counts = counts_t.read(pre_c)
    new_counts = maintain_ngram_counts(counts, base, batch_df, text_col,
                                       pk_cols, n=n)
    new_base = apply_changes(base, batch_df, pk_cols)
    if not counts_done:
        counts_t.overwrite(new_counts, extra=extra)
    if not base_done:
        base_t.overwrite(new_base, extra=extra)


def stream_lm_sync_manifest(
    spark: SparkSession,
    source_path: str,
    schema,
    base_path: str,
    counts_path: str,
    checkpoint_path: str,
    text_col: str,
    pk_cols: list[str],
    n: int = 2,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Exactly-once form of ``stream_lm_sync``: the base replica and the
    LM's (order, gram, cnt) state live in MANIFEST tables, each
    micro-batch landing as one atomic epoch-tagged commit per table —
    versioned, time-travelable, vacuumable, and safe under the
    half-committed crash window (see ``apply_lm_manifest_epoch``). The
    live model is ``lm_from_counts(ManifestTable(counts_path).read())``."""
    from cdc_audit_spark.sinks.manifest import ManifestTable

    base_t = ManifestTable(spark, base_path)
    counts_t = ManifestTable(spark, counts_path)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path)

    def handle(batch_df, epoch_id: int) -> None:
        apply_lm_manifest_epoch(
            base_t, counts_t, batch_df, epoch_id,
            genstate.checkpoint_run_id(checkpoint_path),
            text_col, pk_cols, n=n,
        )

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_lm_sync(
    spark: SparkSession,
    source_path: str,
    schema,
    state_path: str,
    checkpoint_path: str,
    base_bootstrap,
    text_col: str,
    pk_cols: list[str],
    n: int = 2,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    keep_generations: int | None = None,
):
    """Stream audit batches and keep the corpus LM current. Returns the
    StreamingQuery; the live model is ``current_lm(spark, state_path)``."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path)

    def handle(batch_df, epoch_id: int) -> None:
        apply_lm_epoch(
            spark, state_path, batch_df, epoch_id, base_bootstrap,
            text_col, pk_cols, n=n, keep_generations=keep_generations,
            run_id=genstate.checkpoint_run_id(checkpoint_path),
        )

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
