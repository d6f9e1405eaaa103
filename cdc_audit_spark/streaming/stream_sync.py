"""Structured-Streaming audit sync — the always-on form of the reference's
cron-polled micro-batch loop (README:194-195).

The reference approximates a stream by re-running
``SELECT * WHERE audit_pk > watermark`` from cron and appending to CSV
(cdc_audit_sync_mysql.php:238-265). Structured Streaming gives the same
drain-and-append semantics natively:

  * source offsets replace the audit_pk watermark (checkpointed, exactly-once
    to file sinks — strictly stronger than the reference's at-least-once,
    README:213-215);
  * ``trigger(availableNow=True)`` is the cron-parity mode: drain everything
    available, then stop — one reference "sync run";
  * ``foreachBatch`` hooks replace legacy-trigger body splicing (M4): user
    code runs per micro-batch after capture, idempotence by construction.

The audit log itself is file-backed here (parquet dir an upstream capture
job appends to); a JDBC audit table can't be a native streaming source, so
its cron-parity path is the batch ``sync.sync_table`` — same dataflow, the
reference's own cadence model.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cdc_audit_spark.schema import check_no_schema_drift
from cdc_audit_spark.sync import text_read_options, text_write_options

__all__ = ["stream_audit_sync", "stream_audit_sync_manifest"]


def stream_audit_sync(
    spark: SparkSession,
    source_path: str,
    schema,
    sink_path: str,
    checkpoint_path: str,
    fmt: str = "csv",
    available_now: bool = True,
    foreach_batch: Callable[[DataFrame, int], None] | None = None,
    source_fmt: str = "parquet",
):
    """Stream an audit log directory into a sink with checkpointed offsets.

    Returns the started StreamingQuery; with ``available_now`` the caller
    awaits termination for one cron-parity drain. Schema drift fails loudly
    before the query starts (the reference's documented unsolved issue,
    README:210-212). ``source_fmt`` is any streaming file source (parquet /
    json / csv / orc) — an upstream capture job picks the bus format, the
    drain is format-agnostic.
    """
    # Same text conventions as the batch writers (µs timestampFormat,
    # NULL/empty sentinels): a bus produced by sync_table/compact_log CSV
    # or JSON writers mis-parses timestamps under Spark's default
    # millisecond pattern otherwise.
    reader = text_read_options(spark.readStream.schema(schema), source_fmt)
    stream = reader.format(source_fmt).load(source_path)
    check_no_schema_drift(schema, stream.schema)

    if foreach_batch is not None:
        def handle(batch_df: DataFrame, epoch_id: int) -> None:
            writer = text_write_options(
                batch_df.write.mode("append").format(fmt), fmt)
            writer.save(sink_path)
            foreach_batch(batch_df, epoch_id)

        writer = stream.writeStream.foreachBatch(handle)
    else:
        writer = text_write_options(
            stream.writeStream.format(fmt).outputMode("append"), fmt)
        writer = writer.option("path", sink_path)

    writer = writer.option("checkpointLocation", checkpoint_path)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_audit_sync_manifest(
    spark: SparkSession,
    source_path: str,
    schema,
    table_path: str,
    checkpoint_path: str,
    available_now: bool = True,
    source_fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
):
    """Stream an audit log into a manifest-committed table, exactly-once.

    ``stream_audit_sync`` on a plain file sink inherits foreachBatch's
    at-least-once window (append lands, checkpoint commit doesn't → the
    replayed epoch appends again). Here each micro-batch is ONE atomic
    manifest commit carrying its epoch id, so the replayed hook sees the
    epoch already committed and skips — duplicate-free across crashes on
    either side of the checkpoint commit, with no separate state file.

    Epoch ids are checkpoint-scoped, so the commit also records the
    checkpoint's streaming-query id; a table last written by a DIFFERENT
    run raises ``genstate.GenerationRunMismatch`` (checkpoint and table
    must be created/deleted together — same contract as the generation-
    snapshot hooks). Returns the started StreamingQuery.
    """
    from cdc_audit_spark.sinks.manifest import ManifestTable
    from cdc_audit_spark.streaming import genstate

    table = ManifestTable(spark, table_path)

    reader = text_read_options(spark.readStream.schema(schema), source_fmt)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.format(source_fmt).load(source_path)
    check_no_schema_drift(schema, stream.schema)

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        rid = genstate.checkpoint_run_id(checkpoint_path)
        if table.epoch_applied(epoch_id, rid):
            return  # crash landed after the commit — effects are durable
        # pk_range_col: one tiny agg per micro-batch buys manifest-level
        # pruning for downstream read_since() consumers
        table.append(
            batch_df, extra={"epoch": int(epoch_id), "run_id": rid},
            pk_range_col="audit_pk" if "audit_pk" in batch_df.columns else None,
        )

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
