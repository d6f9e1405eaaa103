"""Always-on incremental connected components: duplicate-cluster labels
maintained under a document insert stream, exactly-once.

The batch algebra lives in ``operators.dedup.incremental_components``
(insert batch + fingerprint index + union-find overlay -> membership /
index / union deltas, with the label-propagation kernel running on the
DELTA subgraph only). This module owns the manifest plumbing:

* three ManifestTables — ``members`` (id, label), ``idx`` (fp, id,
  label), ``unions`` (child, parent) — each micro-batch landing as one
  epoch-tagged commit per table (the per-table replay-guard pattern of
  ``stream_dedup.apply_dedup_epoch``: deltas are a deterministic function
  of (batch, state pinned before the epoch), so a crash between commits
  replays to the identical deltas and each table skips the half it holds);
* O(delta) reads — the index is read pruned to the batch's fingerprint
  dirs (``read_pruned_for_keys`` over the fp-clustered layout,
  ``maybe_cluster_components_index`` being the amortized compaction that
  keeps the layout prunable); the unions ledger is merge-count-sized and
  read whole; the membership is NEVER read by the hot path;
* ``resolve_components_state`` — the flattening maintenance: rewrite
  members and idx with labels resolved through the closure, then empty
  the unions ledger, so query-time resolution depth resets to zero.

Deletes are out of scope by design (removing a member never splits the
equivalence classes it witnessed — labels are names, not members);
decremental connectivity is a rebuild, the ANN recall→rebuild policy's
analog. Reference parity: the reference engine has no clustering surface
at all (940 LoC of DDL generation); this is the beyond-reference
training-pipeline tier mandated by SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from cdc_audit_spark.operators.dedup import (
    incremental_components,
    resolve_component_labels,
    resolve_union_closure,
)
from cdc_audit_spark.streaming import genstate
from cdc_audit_spark.streaming.stream_dedup import _version_before_epoch

__all__ = [
    "apply_components_epoch",
    "current_components",
    "deleted_fraction",
    "maybe_cluster_components_index",
    "maybe_rebuild_components",
    "remove_components_members",
    "resolve_components_state",
    "stream_components_sync",
]


_CFG_KEY = "components_cfg"


def _check_cfg(members, k: int, w: int) -> dict:
    """Refuse fingerprint-config drift: an epoch applied with a different
    (k, w) than the ledgers were built with would emit fingerprints the
    existing index can never match — batches would silently stop finding
    their duplicates. Every apply-epoch commit stamps its config; the
    newest stamped manifest is the contract (the backward walk is the
    ``_version_before_epoch`` pattern — maintenance overwrites between
    apply commits don't carry the stamp and are skipped)."""
    cfg = {"k": int(k), "w": int(w)}
    for v in reversed(members.versions()):
        prev = members.manifest(v).get(_CFG_KEY)
        if prev is not None:
            if prev != cfg:
                raise ValueError(
                    f"components ledgers at {members.path} were built "
                    f"with fingerprint config {prev}; this epoch was "
                    f"called with {cfg} — mixed configs silently break "
                    "duplicate detection. Use the original config, or "
                    "rebuild the state from scratch")
            break
    return cfg


def apply_components_epoch(
    members,
    idx,
    unions,
    batch_df,
    epoch_id: int,
    run_id: str | None,
    text_col: str,
    id_col: str,
    k: int = 5,
    w: int = 4,
) -> None:
    """One insert micro-batch of the exactly-once components drain.

    All three state reads are pinned at the newest version committed
    BEFORE this epoch (never HEAD — a half-landed replay must not see its
    own first attempt), and the index read is pruned to the dirs the
    batch's fingerprints can touch. The deltas are then a deterministic
    function of (batch, pinned state), so per-table epoch guards give
    exactly-once without a cross-table transaction."""
    m_done = members.epoch_applied(epoch_id, run_id)
    i_done = idx.epoch_applied(epoch_id, run_id)
    u_done = unions.epoch_applied(epoch_id, run_id)
    if m_done and i_done and u_done:
        return
    cfg = _check_cfg(members, k, w)
    from cdc_audit_spark.operators.text import winnow_fingerprints

    fps = winnow_fingerprints(batch_df, text_col, id_col, k, w).persist(
        StorageLevel.MEMORY_AND_DISK)
    try:
        pre_i = _version_before_epoch(idx, epoch_id)
        pre_u = _version_before_epoch(unions, epoch_id)
        idx_df = (idx.read_pruned_for_keys(fps.select("fp"), "fp",
                                           version=pre_i)
                  if pre_i is not None else None)
        unions_df = unions.read(version=pre_u) if pre_u is not None else None
        m_d, i_d, u_d = incremental_components(
            batch_df, text_col, id_col,
            idx=idx_df, unions=unions_df, k=k, w=w, fps=fps)
        extra = {"epoch": int(epoch_id), "run_id": run_id, _CFG_KEY: cfg}
        if not m_done:
            members.append(m_d, extra=extra)
        if not i_done:
            # rk = the per-row unique key deletion vectors address
            # (delete_where needs one live row per key; (fp, id) is the
            # index grain)
            idx.append(
                i_d.withColumn("rk", F.concat_ws(":", "fp", "id")),
                extra=extra, stats_cols=["fp"])
        if not u_done:
            # committed even when empty: the epoch guard must record the
            # epoch or every restart would re-run the (cheap, deterministic)
            # recompute forever
            unions.append(u_d, extra=extra)
    finally:
        fps.unpersist()
    maybe_cluster_components_index(idx)


def maybe_cluster_components_index(idx, max_dirs: int = 64,
                                   n_dirs: int = 8) -> int | None:
    """Fp-cluster the fingerprint index when its dir fan-in passes
    ``max_dirs`` — the amortized compaction that keeps the per-epoch
    pruned read skipping dirs (``maybe_cluster_lsh_index``'s twin, same
    epoch/run_id inheritance through the optimize commit)."""
    cur = idx.current_version()
    if cur is None:
        return None
    if len(idx.manifest(cur)["dirs"]) <= max_dirs:
        return None
    return idx.optimize(cluster_by=["fp"], n_dirs=n_dirs)


def current_components(members, unions):
    """The current (id, component) view: membership labels resolved
    through the unions closure (one broadcast join; the membership never
    re-shuffles)."""
    m = members.read()
    cur_u = unions.current_version()
    u = unions.read() if cur_u is not None else None
    return resolve_component_labels(m, u)


def resolve_components_state(members, idx, unions) -> None:
    """Flatten the union-find overlay into the base ledgers: rewrite
    ``members`` and ``idx`` with fully-resolved labels, then overwrite
    ``unions`` empty. Amortized O(state) — run on the compaction cadence,
    not per epoch; afterwards query-time resolution is depth-zero until
    the next merge. Epoch/run state inherits through the overwrite
    commits, so the replay guards survive the maintenance."""
    cur_u = unions.current_version()
    u = unions.read() if cur_u is not None else None
    m = members.read()
    roots_m = resolve_union_closure(m.select("label").distinct(), u)
    members.overwrite(
        m.join(F.broadcast(roots_m), "label")
        .select("id", F.col("root").alias("label")))
    i_df = idx.read()
    roots_i = resolve_union_closure(i_df.select("label").distinct(), u)
    idx.overwrite(
        i_df.join(F.broadcast(roots_i), "label")
        .select("fp", "id", F.col("root").alias("label"), "rk"))
    if cur_u is not None:
        unions.overwrite(u.filter(F.lit(False)))


def remove_components_members(members, idx, unions, ids: list) -> dict:
    """Remove documents from the maintained state: membership and index
    rows for ``ids`` are deletion-vector deleted — O(matches) plus
    metadata, no data-file rewrite (the manifest ``delete_where``
    pattern). Removal semantics, documented rather than pretended away:
    labels of SURVIVING members are unchanged and remain a valid
    partition (removal never splits the classes the removed doc
    witnessed — at worst the partition is coarser than a fresh
    clustering, when the removed doc was the only bridge), and a removed
    id may live on as a component NAME. What removal does guarantee:
    the doc disappears from ``current_components``, and its fingerprints
    stop witnessing NEW merges (the index rows are gone, so future
    batches cannot connect through removed content). When the deleted
    fraction passes the policy bar, ``maybe_rebuild_components``
    re-derives the exact fresh clustering from the live index.

    ``ids`` is a driver-side list — bounded per call (the same contract
    as every point-delete API); loop for larger purges."""
    if not ids:
        return {"members_deleted": 0, "index_deleted": 0}
    cond = F.col("id").isin(*[int(i) for i in ids])
    n_m = members.row_count()
    v_m = members.delete_where(cond, "id")
    n_i = idx.row_count()
    v_i = idx.delete_where(cond, "rk")
    return {
        "members_deleted": (n_m - members.row_count()) if v_m else 0,
        "index_deleted": (n_i - idx.row_count()) if v_i else 0,
        "deleted_fraction": deleted_fraction(members),
    }


def deleted_fraction(table) -> float:
    """Fraction of the table's all-time rows currently tombstoned by
    deletion vectors — a pure manifest read (dv row counts from the
    recorded footer stats, live count from ``row_count``), zero Spark
    jobs. The rebuild policy's trigger metric."""
    cur = table.current_version()
    if cur is None:
        return 0.0
    m = table.manifest(cur)
    dvm = m.get("dv_meta", {})
    dead = sum(int(dvm[v].get("rows") or 0) for v in m.get("dv_dirs", []))
    live = table.row_count(cur)
    total = dead + live
    return (dead / total) if total else 0.0


def maybe_rebuild_components(members, idx, unions,
                             max_deleted_frac: float = 0.25) -> int | None:
    """Decremental-connectivity policy (the ANN recall→rebuild analog):
    when removals have tombstoned more than ``max_deleted_frac`` of the
    membership, re-derive the clustering FROM THE LIVE INDEX — edges are
    the fp self-join over surviving rows, closed by the one-shot kernel —
    and overwrite all three ledgers. This is the one operation that can
    SPLIT components (bridges removed since insert) and it renames every
    canonical to the current min live member. Amortized O(live state);
    the trigger check itself is a metadata-only read, safe to call every
    epoch. Returns the new members version, or None when under the bar."""
    from cdc_audit_spark.operators.dedup import connected_components

    if deleted_fraction(members) <= max_deleted_frac:
        return None
    live = idx.read().select("fp", "id")
    a, b = live.alias("a"), live.alias("b")
    edges = (
        a.join(b, (F.col("a.fp") == F.col("b.fp"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    comp = connected_components(edges)
    fresh = (
        members.read().select("id")
        .join(comp, "id", "left")
        .select("id", F.coalesce("component", "id").alias("label"))
        .localCheckpoint(eager=True)
    )
    ver = members.overwrite(fresh)
    idx.overwrite(
        idx.read().select("fp", "id", "rk")
        .join(fresh, "id")
        .select("fp", "id", "label", "rk"))
    cur_u = unions.current_version()
    if cur_u is not None:
        unions.overwrite(unions.read().filter(F.lit(False)))
    return ver


def stream_components_sync(
    spark: SparkSession,
    source_path: str,
    schema,
    members_path: str,
    index_path: str,
    unions_path: str,
    checkpoint_path: str,
    text_col: str,
    id_col: str,
    k: int = 5,
    w: int = 4,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Always-on duplicate-cluster labeling: a parquet-dir document stream
    drains into the three components ledgers, one epoch-tagged commit per
    table per micro-batch, exactly-once under crash replay (see
    ``apply_components_epoch``). Query the result any time with
    ``current_components``."""
    from cdc_audit_spark.sinks.manifest import ManifestTable

    members = ManifestTable(spark, members_path)
    idx = ManifestTable(spark, index_path)
    unions = ManifestTable(spark, unions_path)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path)

    def handle(batch_df, epoch_id: int) -> None:
        apply_components_epoch(
            members, idx, unions, batch_df, epoch_id,
            genstate.checkpoint_run_id(checkpoint_path),
            text_col, id_col, k=k, w=w,
        )

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
