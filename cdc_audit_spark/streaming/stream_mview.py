"""Always-on incremental materialized-view maintenance.

The batch operator (mview.maintain_group_sum) debits touched keys' old
contributions and credits their final images — it needs the audit batch AND
the pre-batch base snapshot. The streaming form carries both across
micro-batches as generation directories with an atomically-flipped pointer
(same recovery contract as stream_dedup.stream_exact_index_sync: a crash
before the flip replays deterministically against the previous generation).

Per micro-batch: one maintenance join over touched keys for the view and
one apply_changes pass for the base. Rewriting the base snapshot per batch
is the sandbox stand-in for a MERGE into a transactional table — the
operators are storage-agnostic; only this hook's persistence changes.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession

from cdc_audit_spark.capture import apply_changes
from cdc_audit_spark.mview import bootstrap_group_sum, maintain_group_sum
from cdc_audit_spark.streaming import genstate

__all__ = ["apply_mview_epoch", "current_mview", "stream_mview_sync"]


def current_mview(spark: SparkSession, state_path: str):
    """(base, view) snapshots named by ``<state_path>/_current.json``, or
    (None, None) before the first committed epoch."""
    p = genstate.read_pointer(state_path)
    if p is None:
        return None, None
    return spark.read.parquet(p["base"]), spark.read.parquet(p["view"])


def apply_mview_epoch(
    spark: SparkSession,
    state_path: str,
    batch_df,
    epoch_id: int,
    base_bootstrap,
    pk_cols: list[str],
    group_cols: list[str],
    value: Column,
    keep_generations: int | None = None,
    run_id: str | None = None,
) -> None:
    """Apply one audit micro-batch to the generation-snapshot (base, view)
    state.

    Idempotent under epoch replay: a pointer already naming this epoch
    means the crash landed AFTER the flip (effects durable) — skip, since
    recomputing would lazily read ``gen=<epoch>``'s base/view while
    overwriting those same paths. A crash BEFORE the flip replays against
    the previous generation deterministically (genstate docstring).

    ``run_id`` is the owning checkpoint's streaming-query id; a pointer
    written by a DIFFERENT run raises genstate.GenerationRunMismatch —
    for a mview, misreading a foreign pointer would double-count deltas.
    """
    if genstate.epoch_applied(state_path, epoch_id, run_id=run_id):
        return
    base, view = current_mview(spark, state_path)
    if base is None:
        base = base_bootstrap
        view = bootstrap_group_sum(base, group_cols, value)
    new_view = maintain_group_sum(view, base, batch_df, pk_cols, group_cols, value)
    new_base = apply_changes(base, batch_df, pk_cols)
    gen_base = genstate.generation_dir(state_path, epoch_id, "base")
    gen_view = genstate.generation_dir(state_path, epoch_id, "view")
    new_base.write.mode("overwrite").parquet(gen_base)
    new_view.write.mode("overwrite").parquet(gen_view)
    genstate.flip_pointer(state_path, epoch_id,
                          {"base": gen_base, "view": gen_view}, run_id=run_id)
    if keep_generations is not None:
        genstate.prune_generations(state_path, keep=keep_generations)


def stream_mview_sync(
    spark: SparkSession,
    source_path: str,
    schema,
    state_path: str,
    checkpoint_path: str,
    base_bootstrap,
    pk_cols: list[str],
    group_cols: list[str],
    value: Column,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    keep_generations: int | None = None,
):
    """Stream audit batches and keep a (group, total, n_rows) view current.

    ``base_bootstrap`` is the snapshot the stream starts from (the view is
    bootstrapped from it on the first batch). Returns the StreamingQuery;
    the current view is the ``view`` dataset of the generation named by
    ``<state_path>/_current.json``.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path)

    def handle(batch_df, epoch_id: int) -> None:
        apply_mview_epoch(
            spark, state_path, batch_df, epoch_id, base_bootstrap,
            pk_cols, group_cols, value, keep_generations=keep_generations,
            run_id=genstate.checkpoint_run_id(checkpoint_path),
        )

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
