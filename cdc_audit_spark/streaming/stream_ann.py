"""CDC-maintained ANN index: IVF assignments kept current from the audit
log.

``operators.similarity.ivf_topk`` re-assigns the WHOLE corpus to
centroids on every call — fine as a one-shot operator, wrong as a serving
path for a corpus that changes by a trickle of CDC events (the reference's
consumers tail the audit table; SURVEY §1.1.3). This module materializes
the ``(id, cell, embedding)`` assignment table as a manifest-committed
replica maintained by ``merge_audit``:

* per batch, ONLY the delta past the table's watermark is touched —
  insert/update images get their cell assigned map-side (the same
  broadcast-literal whole-stage-codegen expression as ``ivf_assign``, no
  shuffle), deletes remove their key;
* exactly-once for free: the watermark rides in the merge commit
  (``merge_audit``'s contract), so crash replays and re-polls are no-ops
  — no epoch bookkeeping needed, unlike the two-table dedup drain;
* ``pruned=True`` (integer ids) makes each maintenance pass O(touched
  key-range dirs), not O(index) — the storage-level MERGE;
* queries go through ``operators.similarity.ivf_topk_indexed`` and skip
  the assign pass entirely; every historical index state stays
  time-travelable.

Centroids are FROZEN at bootstrap (train with ``sample_centroids`` /
``refine_centroids``): incremental maintenance keeps assignments exact
for the current corpus under fixed centroids, which is the standard
IVF serving trade-off — re-train + rebuild (one ``bootstrap_ann_index``
call) when drift degrades recall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_audit_spark.operators.similarity import ivf_assign, nearest_cell

__all__ = [
    "ann_index_delta",
    "bootstrap_ann_index",
    "cdc_ann_index_sync",
    "stream_ann_index_sync",
]


def ann_index_delta(
    audit_df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Audit rows reshaped into index-state images: non-delete images get
    their nearest-centroid cell (map-side, no shuffle); delete events
    pass through with a NULL cell (``apply_changes`` drops their key, the
    value never lands). Output columns: (id, cell, vec, audit_event,
    audit_pk) — the state schema plus the audit columns ``merge_audit``
    consumes."""
    return audit_df.select(
        F.col(id_col),
        F.when(F.col("audit_event") == "delete", F.lit(None))
         .otherwise(nearest_cell(F.col(vec_col), centroids))
         .cast("int").alias("cell"),
        F.col(vec_col),
        F.col("audit_event"),
        F.col("audit_pk"),
    )


def bootstrap_ann_index(
    index,
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pruned: bool = True,
    range_buckets: int = 32,
):
    """First commit: assign the whole corpus once and lay the replica out
    as disjoint id-range dirs (``pruned``), so every later maintenance
    pass rewrites only the dirs the delta's ids touch."""
    spark = index.spark
    empty = spark.createDataFrame(
        [],
        ivf_assign(corpus, centroids, id_col, vec_col).schema.add(
            "audit_event", "string").add("audit_pk", "long"),
    )
    state = ivf_assign(corpus, centroids, id_col, vec_col)
    return index.merge_audit(
        empty, [id_col], bootstrap=state,
        pruned=pruned, range_buckets=range_buckets,
    )


def cdc_ann_index_sync(
    index,
    audit_df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pruned: bool = True,
    range_buckets: int = 32,
):
    """One incremental maintenance pass: the unseen audit delta (past the
    index's committed watermark) is assigned and merged. Idempotent —
    re-running with the same log is a no-op (unmoved watermark, empty
    delta, no commit); an interleaved writer surfaces as CommitConflict
    via merge_audit's base-version pin. A virgin index bootstraps from
    an EMPTY state (the pure insert-from-stream flow); use
    :func:`bootstrap_ann_index` instead when a corpus snapshot exists."""
    from pyspark.sql.types import StructType

    delta = ann_index_delta(audit_df, centroids, id_col, vec_col)
    bootstrap = None
    if index.current_version() is None:
        state_fields = [f for f in delta.schema.fields
                        if f.name not in ("audit_event", "audit_pk")]
        bootstrap = index.spark.createDataFrame(
            [], StructType(state_fields))
    return index.merge_audit(delta, [id_col], bootstrap=bootstrap,
                             pruned=pruned, range_buckets=range_buckets)


def stream_ann_index_sync(
    spark: SparkSession,
    source_path: str,
    schema,
    index_path: str,
    checkpoint_path: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    pruned: bool = True,
):
    """Always-on form: stream CDC audit batches from a parquet directory
    and keep the IVF assignment index current. Returns the started
    StreamingQuery. Exactly-once WITHOUT epoch guards: merge_audit's
    watermark (committed atomically with each merge) already makes a
    replayed micro-batch an empty delta, so the crash-replay window the
    dedup drain needs per-table epochs for does not exist here — there
    is only one table and its state commit IS the data commit."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path)

    from cdc_audit_spark.sinks.manifest import ManifestTable

    index = ManifestTable(spark, index_path)

    def handle(batch_df, epoch_id: int) -> None:
        cdc_ann_index_sync(index, batch_df, centroids,
                           id_col=id_col, vec_col=vec_col, pruned=pruned)

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
