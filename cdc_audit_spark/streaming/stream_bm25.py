"""Always-on CDC maintenance of the BM25 inverted index.

The WHOLE index state is one signed (term, id, tf) manifest table plus
the base text replica: document frequencies, per-doc lengths, N and avgdl
all derive from the fold by bounded aggregates (see ``operators.bm25``),
so keeping search fresh costs exactly one O(batch) posting-delta append
per micro-batch — the LSM contract the LM counts stream proved
(``stream_lm.apply_lm_manifest_epoch``), applied to retrieval.

Exactly-once with no cross-table transaction, same guard ordering as the
LM stream: the postings append is epoch-guarded, the base merge is
watermark-guarded (``merge_audit(pruned=True)`` — dir-granular, O(touched
dirs)), and the delta is always computed against the PRE-merge base
because the append commits strictly before the merge in every attempt.

Why this matters at 100 TB: "find documents like X" / decontamination /
targeted curation all need a current index; rebuilding one is a full
corpus scan, while this keeps it current for the cost of each delta.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from cdc_audit_spark.operators.bm25 import bm25_posting_delta, fold_bm25_postings
from cdc_audit_spark.streaming import genstate

__all__ = [
    "apply_bm25_manifest_epoch",
    "current_manifest_bm25",
    "maybe_fold_bm25_postings",
    "stream_bm25_sync_manifest",
]


def apply_bm25_manifest_epoch(
    base_t,
    postings_t,
    batch_df,
    epoch_id: int,
    run_id: str | None,
    text_col: str,
    pk_cols: list[str],
    range_buckets: int = 32,
    fold_max_dirs: int = 16,
) -> None:
    """One micro-batch of the exactly-once manifest-backed index drain —
    O(delta) at the storage layer: committed bytes scale with the batch,
    never the corpus or the index. Mirrors
    ``stream_lm.apply_lm_manifest_epoch`` (same crash-window proof);
    requires a single integer merge key and monotone batch ``audit_pk``."""
    from cdc_audit_spark.streaming.stream_lm import _empty_state

    if len(pk_cols) != 1:
        raise ValueError(
            "the manifest-backed BM25 stream maintains its base replica "
            "with merge_audit(pruned=True), which needs a single integer "
            f"merge key; got pk_cols={pk_cols!r}")
    if not postings_t.epoch_applied(epoch_id, run_id):
        base = (base_t.read() if base_t.current_version() is not None
                else _empty_state(batch_df))
        delta = bm25_posting_delta(base, batch_df, text_col, pk_cols)
        postings_t.append(delta, extra={"epoch": int(epoch_id),
                                        "run_id": run_id})
    base_t.merge_audit(batch_df, pk_cols,
                       bootstrap=_empty_state(batch_df),
                       pruned=True, range_buckets=range_buckets)
    maybe_fold_bm25_postings(postings_t, pk_cols[0], max_dirs=fold_max_dirs)


def maybe_fold_bm25_postings(postings_t, id_col: str,
                             max_dirs: int = 16) -> int | None:
    """Materialize the LSM fold when the postings table's dir fan-in
    exceeds ``max_dirs`` — ``maybe_fold_lm_counts``'s policy applied to
    the index: the rewrite is the AGGREGATED fold (signed deltas summed,
    zero rows dropped), amortized O(index); epoch/run_id inherit through
    the overwrite so the replay guard survives folding. A serving
    deployment would also materialize the norms/df side tables here (one
    bounded aggregate each). Returns the new version or None."""
    cur = postings_t.current_version()
    if cur is None:
        return None
    if len(postings_t.manifest(cur)["dirs"]) <= max_dirs:
        return None
    folded = fold_bm25_postings(postings_t.read(cur), id_col)
    return postings_t.overwrite(folded, base_version=cur)


def current_manifest_bm25(spark: SparkSession, base_path: str,
                          postings_path: str, id_col: str):
    """(base replica DataFrame, current folded postings) of a maintained
    index — (None, None) before the first committed epoch. Feed the
    postings to ``bm25.bm25_topk_postings`` to serve queries."""
    from cdc_audit_spark.sinks.manifest import ManifestTable

    base_t = ManifestTable(spark, base_path)
    postings_t = ManifestTable(spark, postings_path)
    if postings_t.current_version() is None:
        return None, None
    postings = fold_bm25_postings(postings_t.read(), id_col)
    base = (base_t.read() if base_t.current_version() is not None
            else None)
    return base, postings


def stream_bm25_sync_manifest(
    spark: SparkSession,
    source_path: str,
    schema,
    base_path: str,
    postings_path: str,
    checkpoint_path: str,
    text_col: str,
    pk_cols: list[str],
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    range_buckets: int = 32,
    fold_max_dirs: int = 16,
):
    """The BM25 maintenance stream: base replica and signed postings live
    in MANIFEST tables — exactly-once and O(delta) committed bytes per
    micro-batch. Versioned, time-travelable, vacuumable. The live index
    is ``current_manifest_bm25(spark, base_path, postings_path, pk)``."""
    from cdc_audit_spark.sinks.manifest import ManifestTable

    base_t = ManifestTable(spark, base_path)
    postings_t = ManifestTable(spark, postings_path)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path)

    def handle(batch_df, epoch_id: int) -> None:
        apply_bm25_manifest_epoch(
            base_t, postings_t, batch_df, epoch_id,
            genstate.checkpoint_run_id(checkpoint_path),
            text_col, pk_cols, range_buckets=range_buckets,
            fold_max_dirs=fold_max_dirs,
        )

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
