"""Always-on CDC maintenance of the PCA moment state.

The whole statistic the solve needs — row count, per-dimension first-
moment sums, upper-triangle raw second-moment sums — lives in ONE signed
(kind, i, j, q) manifest table (``operators.pca``'s state encoding):
every entry is a per-row integer contribution, so a micro-batch commits
exactly its O(d²) state delta (debit old images, credit finals) and the
current model rehydrates from 1 + d + d²/2 rows with one driver-side
eigh — the corpus is never rescanned to keep PCA fresh.

Exactly-once, same guard ordering as the LM/BM25 streams: the state
append is epoch-guarded and runs strictly before the base merge
(watermark-guarded ``merge_audit(pruned=True)``), so any crash prefix
recomputes the identical delta from the still-pre-merge base.

Why this matters at 100 TB: the projection basis feeding ANN indexing /
SemDeDup / clustering drifts as the corpus mutates; retraining is two
full corpus passes, while this keeps the exact statistics current for
the cost of each delta.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from cdc_audit_spark.operators.pca import (
    fold_moment_state,
    moment_state_delta,
    pca_model_from_state,
)
from cdc_audit_spark.streaming import genstate

__all__ = [
    "apply_pca_manifest_epoch",
    "current_manifest_pca",
    "maybe_fold_pca_state",
    "stream_pca_sync_manifest",
]


def apply_pca_manifest_epoch(
    base_t,
    state_t,
    batch_df,
    epoch_id: int,
    run_id: str | None,
    vec_col: str,
    pk_cols: list[str],
    range_buckets: int = 32,
    fold_max_dirs: int = 16,
) -> None:
    """One micro-batch of the exactly-once PCA maintenance drain —
    O(delta) commits (the state append is O(d²), the base merge
    dir-granular). Mirrors ``stream_bm25.apply_bm25_manifest_epoch``;
    requires a single integer merge key and monotone ``audit_pk``."""
    from cdc_audit_spark.streaming.stream_lm import _empty_state

    if len(pk_cols) != 1:
        raise ValueError(
            "the manifest-backed PCA stream maintains its base replica "
            "with merge_audit(pruned=True), which needs a single integer "
            f"merge key; got pk_cols={pk_cols!r}")
    if not state_t.epoch_applied(epoch_id, run_id):
        # debit reads only the dirs the batch's keys intersect — the
        # compute-side twin of the O(delta) storage contract (the
        # replica is a disjoint key-range layout; a full scan per
        # micro-batch would be O(corpus) I/O)
        base = (base_t.read_pruned_for_keys(
                    batch_df.select(pk_cols[0]), pk_cols[0])
                if base_t.current_version() is not None
                else _empty_state(batch_df))
        delta = moment_state_delta(base, batch_df, vec_col, pk_cols)
        state_t.append(delta, extra={"epoch": int(epoch_id),
                                     "run_id": run_id})
    base_t.merge_audit(batch_df, pk_cols,
                       bootstrap=_empty_state(batch_df),
                       pruned=True, range_buckets=range_buckets)
    maybe_fold_pca_state(state_t, max_dirs=fold_max_dirs)


def maybe_fold_pca_state(state_t, max_dirs: int = 16) -> int | None:
    """Collapse the state LSM to one absolute snapshot when its dir
    fan-in passes ``max_dirs`` — amortized O(d²), a metadata peek
    otherwise; epoch/run_id inherit through the overwrite."""
    cur = state_t.current_version()
    if cur is None:
        return None
    if len(state_t.manifest(cur)["dirs"]) <= max_dirs:
        return None
    return state_t.overwrite(fold_moment_state(state_t.read(cur)),
                             base_version=cur)


def current_manifest_pca(spark: SparkSession, base_path: str,
                         state_path: str, k: int):
    """(base replica, live PCAModel) of a maintained PCA stream —
    (None, None) before the first committed epoch."""
    from cdc_audit_spark.sinks.manifest import ManifestTable

    base_t = ManifestTable(spark, base_path)
    state_t = ManifestTable(spark, state_path)
    if state_t.current_version() is None:
        return None, None
    model = pca_model_from_state(fold_moment_state(state_t.read()), k)
    base = (base_t.read() if base_t.current_version() is not None
            else None)
    return base, model


def stream_pca_sync_manifest(
    spark: SparkSession,
    source_path: str,
    schema,
    base_path: str,
    state_path: str,
    checkpoint_path: str,
    vec_col: str,
    pk_cols: list[str],
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    range_buckets: int = 32,
    fold_max_dirs: int = 16,
):
    """The PCA maintenance stream: base replica and moment state live in
    MANIFEST tables — exactly-once and O(delta) committed bytes per
    micro-batch. The live model is
    ``current_manifest_pca(spark, base_path, state_path, k)``."""
    from cdc_audit_spark.sinks.manifest import ManifestTable

    base_t = ManifestTable(spark, base_path)
    state_t = ManifestTable(spark, state_path)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path)

    def handle(batch_df, epoch_id: int) -> None:
        apply_pca_manifest_epoch(
            base_t, state_t, batch_df, epoch_id,
            genstate.checkpoint_run_id(checkpoint_path),
            vec_col, pk_cols, range_buckets=range_buckets,
            fold_max_dirs=fold_max_dirs,
        )

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
