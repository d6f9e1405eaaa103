"""Streaming near-dup dedup: incremental_lsh_dedup inside foreachBatch.

The growing-corpus dedup operator (operators.dedup.incremental_lsh_dedup)
needs exactly one piece of cross-batch state — the (band, bucket, id)
entries of previously ACCEPTED documents. Structured Streaming's
foreachBatch supplies the batch boundary and checkpointed source offsets;
the index itself lives in a parquet directory the hook reads at the start
of each micro-batch and appends to at the end. Accepted documents append
to the output directory, duplicates are dropped — an always-on ingest
filter with the same contract as the batch operator (batched ≡ one-shot,
tested in test_dedup.py).

Crash semantics: offsets are checkpointed AFTER the hook, so a crash
mid-batch replays that batch. Replay re-reads the index as of the previous
batch and re-derives the same accept set (the operator is deterministic),
so ``stream_dedup_sync``'s only hazard is double-appended output/index
rows from a crash between the two writes (the reference's own sink has
the same at-least-once window, README:213-215).
``stream_dedup_sync_manifest`` closes even that: both tables are
manifest-committed with per-table epoch guards, so the replayed batch
skips whichever half already landed — exactly-once with no cross-table
transaction (apply_dedup_epoch has the argument).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from cdc_audit_spark.operators.dedup import (
    cdc_exact_index_sync,
    incremental_lsh_dedup,
)
from cdc_audit_spark.streaming import genstate

__all__ = [
    "apply_dedup_epoch",
    "apply_exact_index_epoch",
    "apply_semdedup_epoch",
    "apply_span_index_epoch",
    "maybe_cluster_gram_index",
    "maybe_cluster_semdedup_registry",
    "current_exact_index",
    "maybe_cluster_lsh_index",
    "stream_dedup_sync",
    "stream_dedup_sync_manifest",
    "stream_exact_index_sync",
    "stream_semdedup_sync",
]


def stream_dedup_sync(
    spark: SparkSession,
    source_path: str,
    schema,
    accepted_path: str,
    index_path: str,
    checkpoint_path: str,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Stream documents from a parquet directory, keep only near-dup
    survivors. Returns the started StreamingQuery.

    ``max_files_per_trigger`` bounds micro-batch size (and therefore the
    per-batch signature-pass memory); the index join cost grows only with
    accepted documents.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path)

    def handle(batch_df, epoch_id: int) -> None:
        try:
            index = spark.read.parquet(index_path)
        except Exception:
            index = None
        accepted_ids, accepted_entries = incremental_lsh_dedup(
            batch_df, index, text_col, id_col,
            num_hashes=num_hashes, bands=bands, shingle_size=shingle_size,
        )
        accepted_ids = accepted_ids.withColumnRenamed("id", id_col)
        survivors = batch_df.join(accepted_ids, id_col, "left_semi")
        survivors.write.mode("append").parquet(accepted_path)
        accepted_entries.write.mode("append").parquet(index_path)

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def current_exact_index(spark: SparkSession, index_path: str):
    """The index snapshot named by ``<index_path>/_current.json``, or None
    before the first committed epoch."""
    p = genstate.read_pointer(index_path)
    return None if p is None else spark.read.parquet(p["path"])


def apply_exact_index_epoch(
    spark: SparkSession,
    index_path: str,
    batch_df,
    epoch_id: int,
    text_col: str,
    id_col: str,
    keep_generations: int | None = None,
    run_id: str | None = None,
) -> None:
    """Apply one micro-batch to the generation-snapshot exact-dedup index.

    Idempotent under epoch replay: if the pointer already names this
    epoch (crash landed AFTER the flip but before the checkpoint commit),
    the effects are durable and the call is a no-op — recomputing would
    read ``gen=<epoch>`` via the pointer while overwriting the same
    directory. A crash BEFORE the flip replays against the previous
    generation and deterministically re-derives the same snapshot
    (genstate module docstring has the full contract).

    ``run_id`` is the owning checkpoint's streaming-query id; a pointer
    written by a DIFFERENT run raises genstate.GenerationRunMismatch
    instead of mis-comparing checkpoint-scoped epoch ids (checkpoint and
    index directories must live and die together).
    """
    if genstate.epoch_applied(index_path, epoch_id, run_id=run_id):
        return
    new_index, _adds = cdc_exact_index_sync(
        current_exact_index(spark, index_path), batch_df, text_col, id_col
    )
    gen_dir = genstate.generation_dir(index_path, epoch_id)
    new_index.write.mode("overwrite").parquet(gen_dir)
    genstate.flip_pointer(index_path, epoch_id, {"path": gen_dir},
                          run_id=run_id)
    if keep_generations is not None:
        genstate.prune_generations(index_path, keep=keep_generations)


def stream_exact_index_sync(
    spark: SparkSession,
    source_path: str,
    schema,
    index_path: str,
    checkpoint_path: str,
    text_col: str,
    id_col: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    keep_generations: int | None = None,
):
    """Stream CDC audit batches and keep the exact-dedup membership index
    current — the always-on form of cdc_exact_index_sync. Returns the
    started StreamingQuery. ``keep_generations`` enables in-hook GC of old
    snapshots (genstate.prune_generations) after each pointer flip.

    Each micro-batch reads the index (the previous batch's output), applies
    the batch's final images, and REWRITES the index to a new snapshot
    directory under ``index_path`` (``gen=<epoch>``), then repoints a
    pointer file atomically — deletes cannot be expressed as parquet
    appends, and a partial rewrite must never destroy the readable index.
    Crash recovery on both sides of the flip is handled by
    apply_exact_index_epoch / genstate. Snapshot GC is the caller's policy.

    At 100 TB the rewrite cost is the motivation for a transactional table
    format; the operator itself is storage-agnostic — only this hook's
    persistence strategy changes.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path)

    def handle(batch_df, epoch_id: int) -> None:
        apply_exact_index_epoch(
            spark, index_path, batch_df, epoch_id, text_col, id_col,
            keep_generations=keep_generations,
            run_id=genstate.checkpoint_run_id(checkpoint_path),
        )

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup_sync_manifest(
    spark: SparkSession,
    source_path: str,
    schema,
    accepted_path: str,
    index_path: str,
    checkpoint_path: str,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Exactly-once form of ``stream_dedup_sync``: both the accepted-docs
    output and the (band, bucket, id) index live in manifest tables, each
    micro-batch landing as one atomic epoch-tagged commit per table.

    ``stream_dedup_sync`` documents its at-least-once window (a crash
    between the output append and the index append double-appends on
    replay). Per-table epoch guards close it: the accept set is a
    deterministic function of (batch, index-at-previous-epoch), so a
    replay recomputes identical survivors/entries and each table
    independently skips the half it already committed — both converge
    with zero duplicates, no cross-table transaction needed. A fresh
    checkpoint against surviving tables raises GenerationRunMismatch
    (checkpoint and both tables live and die together).
    """
    from cdc_audit_spark.sinks.manifest import ManifestTable

    acc = ManifestTable(spark, accepted_path)
    idx = ManifestTable(spark, index_path)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path)

    def handle(batch_df, epoch_id: int) -> None:
        apply_dedup_epoch(
            acc, idx, batch_df, epoch_id,
            genstate.checkpoint_run_id(checkpoint_path),
            text_col, id_col,
            num_hashes=num_hashes, bands=bands, shingle_size=shingle_size,
        )

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def apply_dedup_epoch(
    acc,
    idx,
    batch_df,
    epoch_id: int,
    run_id: str | None,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
) -> None:
    """One micro-batch of the exactly-once dedup drain, per-table guarded.

    The accept set is a deterministic function of (batch, index at the
    previous epoch), so a replay after a crash BETWEEN the two commits
    recomputes identical survivors/entries; each table independently skips
    the half it already holds and both converge duplicate-free — no
    cross-table transaction needed. Factored out of the streaming hook so
    the half-committed replay window is directly testable.

    The index is read PINNED at the newest version committed BEFORE this
    epoch, not at HEAD: if only the index half of a previous attempt
    landed (idx committed, accepted missing), an unpinned read would see
    the batch's own index entries and reject every batch doc — the
    exactly-once guarantee must not depend on the statement order of the
    two commits below.
    """
    from pyspark.storagelevel import StorageLevel

    from cdc_audit_spark.operators.dedup import lsh_band_entries

    acc_done = acc.epoch_applied(epoch_id, run_id)
    idx_done = idx.epoch_applied(epoch_id, run_id)
    if acc_done and idx_done:
        return
    pre = _version_before_epoch(idx, epoch_id)
    # the batch's bucket keys are computed ONCE (persisted — the operator
    # references the entries several times) and bound the pinned index
    # read to the dirs those buckets can touch: with the bucket-clustered
    # compaction below, a batch reads a fraction of the index, never all
    # of it — the same compute-side O(delta) contract as the LM/BM25
    # maintenance debits
    entries = lsh_band_entries(
        batch_df, text_col, id_col, num_hashes, bands, shingle_size
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        index_df = (idx.read_pruned_for_keys(entries.select("bucket"),
                                             "bucket", version=pre)
                    if pre is not None else None)
        accepted_ids, accepted_entries = incremental_lsh_dedup(
            batch_df, index_df, text_col, id_col,
            num_hashes=num_hashes, bands=bands, shingle_size=shingle_size,
            entries=entries,
        )
        extra = {"epoch": int(epoch_id), "run_id": run_id}
        if not acc_done:
            # (commit order: accepted first — but correctness no longer
            # depends on it, see the pinned read above)
            survivors = batch_df.join(
                accepted_ids.withColumnRenamed("id", id_col), id_col,
                "left_semi")
            acc.append(survivors, extra=extra)
        if not idx_done:
            idx.append(accepted_entries, extra=extra)
    finally:
        entries.unpersist()
    maybe_cluster_lsh_index(idx)


def maybe_cluster_lsh_index(idx, max_dirs: int = 64,
                            n_dirs: int = 8) -> int | None:
    """Bucket-cluster the LSH index when its dir fan-in passes
    ``max_dirs`` — the amortized compaction that makes the per-epoch
    pruned index read (and any point lookup) skip dirs: the rewrite
    lands as disjoint bucket-range dirs with recorded ranges, and the
    un-compacted append tail stays skippable via its footer stats.
    Epoch/run_id inherit through the optimize commit, so the replay
    guard survives."""
    cur = idx.current_version()
    if cur is None:
        return None
    if len(idx.manifest(cur)["dirs"]) <= max_dirs:
        return None
    return idx.optimize(cluster_by=["bucket"], n_dirs=n_dirs)


def _version_before_epoch(idx, epoch_id: int) -> int | None:
    """Newest index version committed BEFORE ``epoch_id`` (untagged, or
    tagged with a smaller epoch). Epochs are monotone within a run, so any
    version tagged >= epoch_id can only be this batch's own half-landed
    replay — it must not feed the accept-set recompute."""
    for v in reversed(idx.versions()):
        e = idx.manifest(v).get("epoch")
        if e is None or int(e) < epoch_id:
            return v
    return None


def apply_semdedup_epoch(
    registry,
    batch_df,
    epoch_id: int,
    run_id: str | None,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.60,
) -> None:
    """One micro-batch of CDC-MAINTAINED SemDeDup (arXiv 2303.09540) —
    the semantic tier of the maintained-dedup family (exact digest index,
    LSH band index, and now the per-cell embedding registry): each
    arriving document is assigned to its IVF cell (broadcast-literal
    codegen, no shuffle — the batch ``operators.dedup.semdedup``
    expression) and REJECTED iff some already-registered same-cell
    document, or a smaller-id same-cell batch peer, exceeds ``threshold``
    cosine similarity. Survivor priority is ARRIVAL order (the
    ``incremental_lsh_dedup`` contract): whoever registered first wins,
    ties within a batch break to the smaller id — so with ascending-id
    delivery the final registry equals the one-shot batch ``semdedup``
    exactly (the oracle-checkable setting, ★ ``cdc_semdedup_sync``).

    The registry keeps EVERY seen document (kept and pruned) because the
    batch semantics it must reproduce compare against every smaller id,
    pruned or not — cosine is not transitive, so a pruned document still
    prunes later arrivals. Insert-only with unique ids, like the
    components ledgers; the cheap enforcement below is exact for
    redelivered identical vectors (same vector → same cell → the pruned
    read witnesses it) and best-effort for id reuse with a CHANGED
    vector, which is the caller's contract to prevent.

    Scale shape per epoch: one codegen assign pass (no shuffle), one
    cell-pruned pinned registry read (only the batch's cells' dirs after
    ``maybe_cluster_semdedup_registry`` lands the state cell-clustered),
    one within-cell equi-join sized by the touched cells' populations —
    pairwise work never crosses cell boundaries, the paper's contract;
    grow the cell count with the corpus so per-cell sets stay bounded.
    One O(delta) commit; replay recomputes the identical kept set from
    the pinned read (exactly-once via the epoch guard)."""
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from cdc_audit_spark.operators.similarity import _self_dot, ivf_assign

    if registry.epoch_applied(epoch_id, run_id):
        return
    assign = (
        ivf_assign(batch_df, centroids, id_col, vec_col)
        .select(
            F.col(id_col).alias("id"),
            F.col("cell").cast("long").alias("cell"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .withColumn("nrm", F.sqrt(_self_dot(F.col("v"))))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        dup = (assign.groupBy("id").agg(F.count("*").alias("n"))
               .filter("n > 1").limit(5).collect())
        if dup:
            raise ValueError(
                f"duplicate document id(s) within the batch: "
                f"{sorted(r['id'] for r in dup)} — the semdedup registry "
                "is insert-only with globally unique ids")
        pre = _version_before_epoch(registry, epoch_id)
        prior = (registry.read_pruned_for_keys(assign.select("cell"),
                                               "cell", version=pre)
                 .select("id", "cell", "v", "nrm")
                 if pre is not None else None)
        if prior is not None:
            clash = (prior.select("id")
                     .join(assign.select("id"), "id", "left_semi")
                     .limit(5).collect())
            if clash:
                raise ValueError(
                    f"document id(s) already registered: "
                    f"{sorted(r['id'] for r in clash)} — the semdedup "
                    "registry is insert-only with globally unique ids")
        bside = assign.select("id", "cell", "v", "nrm").withColumn(
            "__prior", F.lit(False))
        if prior is not None:
            bside = prior.withColumn("__prior", F.lit(True)).unionByName(
                bside)
        a, b = assign.alias("a"), bside.alias("b")
        dot = F.aggregate(
            F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
        sim = (dot / (F.col("a.nrm") * F.col("b.nrm"))).cast("double")
        pruned = (
            a.join(b, (F.col("a.cell") == F.col("b.cell"))
                   & (F.col("b.__prior") | (F.col("b.id") < F.col("a.id"))))
            .filter(sim > F.lit(float(threshold)))
            .select(F.col("a.id").alias("id"))
            .distinct()
        )
        out = (
            assign.join(pruned.withColumn("__pruned", F.lit(True)),
                        "id", "left")
            .select("cell", "id", "v", "nrm",
                    F.coalesce(F.col("__pruned"), F.lit(False)).alias(
                        "__p"))
            .select("cell", "id", "v", "nrm", (~F.col("__p")).alias("kept"))
        )
        registry.append(out, extra={"epoch": int(epoch_id),
                                    "run_id": run_id},
                        stats_cols=["cell"])
    finally:
        assign.unpersist()
    maybe_cluster_semdedup_registry(registry)


def maybe_cluster_semdedup_registry(registry, max_dirs: int = 64,
                                    n_dirs: int = 8) -> int | None:
    """Cell-cluster the semdedup registry when its dir fan-in passes
    ``max_dirs`` — the ``maybe_cluster_lsh_index`` pattern: the rewrite
    lands as disjoint cell-range dirs with recorded ranges so the
    per-epoch pruned read skips the cells the batch doesn't touch.
    Epoch/run_id inherit through the optimize commit."""
    cur = registry.current_version()
    if cur is None:
        return None
    if len(registry.manifest(cur)["dirs"]) <= max_dirs:
        return None
    return registry.optimize(cluster_by=["cell"], n_dirs=n_dirs)


def stream_semdedup_sync(
    spark: SparkSession,
    source_path: str,
    schema,
    registry_path: str,
    checkpoint_path: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.60,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Always-on form of ``apply_semdedup_epoch``: embeddings stream in,
    the per-cell registry adjudicates each micro-batch exactly-once (one
    state table, one epoch-guarded commit — a crash mid-batch replays to
    the identical kept set from the pinned read). Survivors are the
    registry rows with ``kept``; a fresh checkpoint against a surviving
    registry raises GenerationRunMismatch (they live and die together)."""
    from cdc_audit_spark.sinks.manifest import ManifestTable

    registry = ManifestTable(spark, registry_path)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path)

    def handle(batch_df, epoch_id: int) -> None:
        apply_semdedup_epoch(
            registry, batch_df, epoch_id,
            genstate.checkpoint_run_id(checkpoint_path),
            centroids, id_col=id_col, vec_col=vec_col,
            threshold=threshold,
        )

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def apply_span_index_epoch(
    gidx,
    spans,
    batch_df,
    epoch_id: int,
    run_id: str | None,
    text_col: str,
    id_col: str,
    min_tokens: int = 20,
) -> None:
    """One micro-batch of CDC-MAINTAINED substring-span dedup (the
    incremental form of ``operators.dedup.duplicate_spans``, Lee et al.
    arXiv 2107.06499): the gram index ``gidx`` persists every ingested
    document's md5-digested sliding ``min_tokens``-grams — the
    distributed stand-in for the paper's suffix array — and each batch
    marks exactly the spans whose every gram ALREADY occurs in the
    corpus so far or at least twice within the batch.

    Semantics are LATER-OCCURRENCE-ONLY, stated rather than pretended
    away: the batch operator marks both copies of a duplicated span,
    but an earlier document's spans are already committed when its
    duplicate arrives, so the incremental form marks the later copy —
    which is the copy excision should cut anyway (keep the first
    occurrence, the common curation policy). An occurrence is a hit iff
    its gram's occurrence count over epochs up to AND INCLUDING its own
    reaches 2 — decomposed as (gram present in the pinned index) OR
    (gram occurs >= 2 times within the batch) — so with any epoch
    partitioning the final spans table equals a one-shot SQL recompute
    of that rule (★ ``cdc_span_index_sync``).

    Scale shape per epoch: one Catalyst gram pass (no Python), one
    digest-pruned pinned index read (only the dirs the batch's digests
    can touch once ``maybe_cluster_gram_index`` lands the state
    g-clustered), one digest groupBy + semi-join, the per-doc
    gaps-and-islands window, and two O(delta) commits. The index is
    O(corpus grams) — the honest cost of exact substring dedup, laid
    out for digest-range pruning, never re-scanned whole per batch.
    Replay recomputes the identical spans from the pinned read;
    both tables skip whichever half already landed."""
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from cdc_audit_spark.operators.dedup import doc_grams, spans_from_hits

    s_done = spans.epoch_applied(epoch_id, run_id)
    g_done = gidx.epoch_applied(epoch_id, run_id)
    if s_done and g_done:
        return
    L = int(min_tokens)
    # gk: the digest's leading 60 bits as a BIGINT — the numeric twin
    # the range machinery needs (dir min/max pruning, range clustering);
    # the full md5 string stays the join key, so collisions on the
    # prefix cost only a false-positive dir read, never a wrong span
    grams = (doc_grams(batch_df, text_col, id_col, L)
             .withColumn("gk", F.conv(F.substring("g", 1, 15), 16, 10)
                         .cast("long"))
             .persist(StorageLevel.MEMORY_AND_DISK))
    try:
        pre = _version_before_epoch(gidx, epoch_id)
        batch_multi = (grams.groupBy("g").agg(F.count("*").alias("__c"))
                       .filter("__c >= 2").select("g"))
        if pre is not None:
            seen = (gidx.read_pruned_for_keys(grams.select("gk"), "gk",
                                              version=pre)
                    .select("g")
                    .join(grams.select("g").distinct(), "g", "left_semi")
                    .distinct())
            dup_g = batch_multi.unionByName(seen).distinct()
        else:
            dup_g = batch_multi
        hits = grams.join(dup_g, "g", "left_semi").select("id", "pos")
        sp = spans_from_hits(hits, L, id_col)
        extra = {"epoch": int(epoch_id), "run_id": run_id}
        if not s_done:
            spans.append(sp, extra=extra)
        if not g_done:
            gidx.append(grams.select("g", "gk", "id", "pos"), extra=extra,
                        stats_cols=["gk"])
    finally:
        grams.unpersist()
    maybe_cluster_gram_index(gidx)


def maybe_cluster_gram_index(gidx, max_dirs: int = 64,
                             n_dirs: int = 8) -> int | None:
    """Digest-cluster the gram index when its dir fan-in passes
    ``max_dirs`` — the ``maybe_cluster_lsh_index`` pattern: the rewrite
    lands as disjoint gk-range dirs (the digest's numeric prefix) with
    recorded ranges so the per-epoch pruned read skips the digests the
    batch doesn't carry. Epoch/run_id inherit through the optimize
    commit."""
    cur = gidx.current_version()
    if cur is None:
        return None
    if len(gidx.manifest(cur)["dirs"]) <= max_dirs:
        return None
    return gidx.optimize(cluster_by=["gk"], n_dirs=n_dirs)
