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

import json
import os

from pyspark.sql import Column, SparkSession

from cdc_audit_spark.capture import apply_changes
from cdc_audit_spark.mview import bootstrap_group_sum, maintain_group_sum

__all__ = ["stream_mview_sync"]


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

    ptr = os.path.join(state_path, "_current.json")

    def _current():
        if not os.path.exists(ptr):
            return None, None
        with open(ptr) as f:
            gen = json.load(f)
        return (spark.read.parquet(gen["base"]), spark.read.parquet(gen["view"]))

    def handle(batch_df, epoch_id: int) -> None:
        base, view = _current()
        if base is None:
            base = base_bootstrap
            view = bootstrap_group_sum(base, group_cols, value)
        new_view = maintain_group_sum(
            view, base, batch_df, pk_cols, group_cols, value)
        new_base = apply_changes(base, batch_df, pk_cols)
        gen_base = os.path.join(state_path, f"gen={epoch_id}", "base")
        gen_view = os.path.join(state_path, f"gen={epoch_id}", "view")
        new_base.write.mode("overwrite").parquet(gen_base)
        new_view.write.mode("overwrite").parquet(gen_view)
        tmp = ptr + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"base": gen_base, "view": gen_view, "epoch": epoch_id}, f)
        os.replace(tmp, ptr)
        if keep_generations is not None:
            from cdc_audit_spark.streaming.genstate import prune_generations

            prune_generations(state_path, keep=keep_generations)

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
