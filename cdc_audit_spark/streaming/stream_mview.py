"""Always-on incremental materialized-view maintenance.

The batch operator (mview.maintain_group_sum) debits touched keys' old
contributions and credits their final images — it needs the audit batch AND
the pre-batch base snapshot.

The stream is manifest-backed (``stream_mview_sync_manifest`` /
``apply_mview_manifest_epoch``) — exactly-once AND O(delta) at the
storage layer: each micro-batch appends only its signed (group, total,
n_rows) delta to the view LSM and dir-granularly merges only the touched
key ranges of the base replica (``merge_audit(pruned=True)``); committed
bytes per batch scale with the batch, never the corpus. (A
generation-snapshot form predated it and rewrote full (base, view)
parquet snapshots per batch; it was removed once the manifest form had
been primary for a round — one maintained code path per tier.)
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from cdc_audit_spark.streaming import genstate

__all__ = [
    "apply_mview_manifest_epoch",
    "apply_join_mview_manifest_epoch",
    "current_manifest_mview",
    "maybe_fold_mview",
    "stream_mview_sync_manifest",
    "stream_join_mview_sync_manifest",
]


def apply_mview_manifest_epoch(
    base_t,
    view_t,
    batch_df,
    epoch_id: int,
    run_id: str | None,
    pk_cols: list[str],
    group_cols: list[str],
    value: Column,
    range_buckets: int = 32,
    fold_max_dirs: int = 16,
) -> None:
    """One micro-batch of the exactly-once manifest-backed mview drain —
    O(delta) at the storage layer, the exact shape of
    ``stream_lm.apply_lm_manifest_epoch`` with the LM's gram algebra
    swapped for ``mview.group_sum_delta``:

    * the view table is an LSM of signed (group, total, n_rows) deltas —
      each epoch APPENDS one (epoch-guarded), readers fold via
      :func:`current_manifest_mview`, :func:`maybe_fold_mview`
      materializes the fold past ``fold_max_dirs``;
    * the base replica lands via ``merge_audit(pruned=True)`` (watermark-
      guarded, dir-granular — untouched dirs carry verbatim).

    The view delta always reads the PRE-merge base because the append
    commits strictly before the merge in every attempt. Requires a
    single integer merge key and batch ``audit_pk`` monotone across
    batches."""
    from cdc_audit_spark.mview import group_sum_delta
    from cdc_audit_spark.streaming.stream_lm import _empty_state

    if len(pk_cols) != 1:
        raise ValueError(
            "the manifest-backed mview stream maintains its base replica "
            "with merge_audit(pruned=True), which needs a single integer "
            f"merge key; got pk_cols={pk_cols!r}")
    if not view_t.epoch_applied(epoch_id, run_id):
        # debit reads only the dirs the batch's keys intersect — the
        # compute-side twin of the O(delta) storage contract (the
        # replica is a disjoint key-range layout; a full scan per
        # micro-batch would be O(corpus) I/O)
        base = (base_t.read_pruned_for_keys(
                    batch_df.select(pk_cols[0]), pk_cols[0])
                if base_t.current_version() is not None
                else _empty_state(batch_df))
        delta = group_sum_delta(base, batch_df, pk_cols, group_cols, value)
        view_t.append(delta, extra={"epoch": int(epoch_id),
                                    "run_id": run_id})
    base_t.merge_audit(batch_df, pk_cols,
                       bootstrap=_empty_state(batch_df),
                       pruned=True, range_buckets=range_buckets)
    maybe_fold_mview(view_t, group_cols, max_dirs=fold_max_dirs)


def maybe_fold_mview(view_t, group_cols: list[str],
                     max_dirs: int = 16) -> int | None:
    """Materialize the view LSM's fold when dir fan-in exceeds
    ``max_dirs`` — ``maybe_fold_lm_counts``'s policy for the mview tier.
    O(view) when it fires, a manifest peek otherwise; epoch/run_id
    inherit through the overwrite."""
    from pyspark.sql import functions as F

    from cdc_audit_spark.mview import fold_group_sum_deltas

    cur = view_t.current_version()
    if cur is None:
        return None
    if len(view_t.manifest(cur)["dirs"]) <= max_dirs:
        return None
    folded = fold_group_sum_deltas(view_t.read(cur), group_cols)
    # re-aggregating DECIMAL totals widens their precision (sum(dec(p,s))
    # -> dec(p+10,s)); cast back to the table's recorded schema so the
    # fold never drifts it and later delta appends still match
    types = {f.name: f.dataType for f in view_t.schema().fields}
    folded = folded.select(
        *group_cols,
        F.col("total").cast(types["total"]).alias("total"),
        F.col("n_rows").cast(types["n_rows"]).alias("n_rows"))
    return view_t.overwrite(folded, base_version=cur)


def current_manifest_mview(spark: SparkSession, base_path: str,
                           view_path: str, group_cols: list[str]):
    """(base replica, current view) of a manifest-backed mview stream —
    the view LSM folded to the absolute (group, total, n_rows) state.
    Returns (None, None) before the first committed epoch."""
    from cdc_audit_spark.mview import fold_group_sum_deltas
    from cdc_audit_spark.sinks.manifest import ManifestTable

    base_t = ManifestTable(spark, base_path)
    view_t = ManifestTable(spark, view_path)
    if view_t.current_version() is None:
        return None, None
    view = fold_group_sum_deltas(view_t.read(), group_cols)
    base = (base_t.read() if base_t.current_version() is not None
            else None)
    return base, view


def stream_mview_sync_manifest(
    spark: SparkSession,
    source_path: str,
    schema,
    base_path: str,
    view_path: str,
    checkpoint_path: str,
    pk_cols: list[str],
    group_cols: list[str],
    value: Column,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    range_buckets: int = 32,
    fold_max_dirs: int = 16,
):
    """The primary mview maintenance stream: base replica and view live
    in MANIFEST tables — exactly-once and O(delta) at the storage layer
    (see ``apply_mview_manifest_epoch``). The current view is
    ``current_manifest_mview(spark, base_path, view_path, group_cols)``."""
    from cdc_audit_spark.sinks.manifest import ManifestTable

    base_t = ManifestTable(spark, base_path)
    view_t = ManifestTable(spark, view_path)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path)

    def handle(batch_df, epoch_id: int) -> None:
        apply_mview_manifest_epoch(
            base_t, view_t, batch_df, epoch_id,
            genstate.checkpoint_run_id(checkpoint_path),
            pk_cols, group_cols, value, range_buckets=range_buckets,
            fold_max_dirs=fold_max_dirs,
        )

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def apply_join_mview_manifest_epoch(
    left_t,
    right_t,
    view_t,
    batch_df,
    epoch_id: int,
    run_id: str | None,
    table_col: str,
    left_name: str,
    right_name: str,
    join_keys: list[str],
    left_pk: list[str],
    right_pk: list[str],
    group_cols: list[str],
    value: Column,
    left_cols: list[str],
    right_cols: list[str],
    range_buckets: int = 32,
    fold_max_dirs: int = 16,
) -> None:
    """One micro-batch of the exactly-once manifest-backed JOIN-view
    drain over a MULTIPLEXED audit source (one stream carrying both
    tables' change events, routed by ``table_col`` — the one-topic CDC
    routing pattern): the batch splits into per-table audit frames, the
    view LSM appends the signed ``mview.join_group_sum_delta``
    (epoch-guarded), and EACH base replica lands via its own
    ``merge_audit(pruned=True)`` (watermark-guarded, per-table cursor).

    Crash windows compose exactly like the single-table form: the view
    append commits strictly first, so a missing epoch tag implies
    neither base merged this batch; replays after any prefix of the
    three commits skip the committed ones (epoch / watermark / watermark
    respectively) and converge. Per-table ``audit_pk`` must be monotone
    across batches (each table's own log cursor). ``left_cols`` /
    ``right_cols`` name each table's state columns inside the
    multiplexed union schema."""
    from cdc_audit_spark.mview import join_group_sum_delta
    from cdc_audit_spark.schema import AUDIT_EVENT, AUDIT_PK
    from cdc_audit_spark.streaming.stream_lm import _empty_state

    if len(left_pk) != 1 or len(right_pk) != 1:
        raise ValueError(
            "the manifest-backed join-mview stream maintains base "
            "replicas with merge_audit(pruned=True), which needs single "
            f"integer merge keys; got {left_pk!r} / {right_pk!r}")
    audit_cols = [AUDIT_EVENT, "audit_timestamp", AUDIT_PK]
    have = set(batch_df.columns)
    acols = [c for c in audit_cols if c in have]
    lbatch = (batch_df.filter(F.col(table_col) == left_name)
              .select(*left_cols, *acols))
    rbatch = (batch_df.filter(F.col(table_col) == right_name)
              .select(*right_cols, *acols))
    if not view_t.epoch_applied(epoch_id, run_id):
        # each replica read serves two batch-bounded lookups — its OWN
        # delta's pk debit and the OTHER side's delta-join-key match
        # (the A_pre ⋈ ΔB / ΔA ⋈ B_pre terms) — so read the union of
        # the dirs either filter may touch, never the whole replica
        # (the compute-side twin of the O(delta) storage contract);
        # join_group_sum_delta's broadcast semi-joins narrow exactly.
        jk_b = _delta_join_key_points(right_t, rbatch, right_pk, join_keys)
        jk_a = _delta_join_key_points(left_t, lbatch, left_pk, join_keys)
        left = _pruned_join_side(left_t, lbatch, left_pk[0],
                                 join_keys[0], jk_b)
        right = _pruned_join_side(right_t, rbatch, right_pk[0],
                                  join_keys[0], jk_a)
        delta = join_group_sum_delta(left, right, lbatch, rbatch,
                                     join_keys, left_pk, right_pk,
                                     group_cols, value)
        view_t.append(delta, extra={"epoch": int(epoch_id),
                                    "run_id": run_id})
    left_t.merge_audit(lbatch, left_pk, bootstrap=_empty_state(lbatch),
                       pruned=True, range_buckets=range_buckets)
    right_t.merge_audit(rbatch, right_pk, bootstrap=_empty_state(rbatch),
                        pruned=True, range_buckets=range_buckets)
    maybe_fold_mview(view_t, group_cols, max_dirs=fold_max_dirs)


#: cap on per-filter point collection for the join-IVM's pruned side
#: reads — past it the filter degrades to keep-all-dirs (conservative,
#: same cost as the pre-pruning full read), keeping driver memory bounded
_JOIN_PRUNE_MAX_POINTS = 4096


def _bounded_points(df, col: str) -> list | None:
    """Distinct values of ``col``, or None when there are more than the
    cap (the caller keeps all dirs for that filter — conservative)."""
    rows = (df.select(col).distinct()
            .limit(_JOIN_PRUNE_MAX_POINTS + 1).collect())
    if len(rows) > _JOIN_PRUNE_MAX_POINTS:
        return None
    return [r[0] for r in rows]


def _delta_join_key_points(other_t, other_batch, other_pk,
                           join_keys: list[str]) -> list | None:
    """The distinct values the OTHER side's signed delta can carry on
    the FIRST join key — its touched old images (a pk-pruned replica
    read, batch-bounded) plus its surviving final images. Used to prune
    this side's replica read for the A_pre ⋈ ΔB / ΔA ⋈ B_pre terms; a
    single join column bounds the dir set (a matching row must match
    every join column, so one column's candidate dirs are a correct
    superset). None = unbounded (keep all dirs)."""
    from cdc_audit_spark.compact import keep_last_per_key
    from cdc_audit_spark.schema import AUDIT_EVENT

    final = keep_last_per_key(other_batch, other_pk)
    news = final.filter(F.col(AUDIT_EVENT) != "delete")
    jk = join_keys[0]
    if other_t.current_version() is not None:
        olds = other_t.read_pruned_for_keys(
            other_batch.select(other_pk[0]), other_pk[0])
        src = olds.select(jk).unionByName(news.select(jk))
    else:
        src = news.select(jk)
    return _bounded_points(src, jk)


def _pruned_join_side(side_t, own_batch, own_pk: str, jk: str,
                      other_jk_points: list | None):
    """One side's replica, read as the union of the dirs its own batch's
    pk points touch and the dirs the other delta's join-key points may
    match — a conservative superset of every row the delta terms
    consult. Falls back to the full read only when the table predates
    any commit (bootstrap) or a point set overflowed the cap."""
    from cdc_audit_spark.streaming.stream_lm import _empty_state

    if side_t.current_version() is None:
        return _empty_state(own_batch)
    own_points = _bounded_points(own_batch, own_pk)
    if own_pk == jk:
        # same physical column: the union of both point sets is one
        # filter (None from either side means unbounded)
        pts = (None if own_points is None or other_jk_points is None
               else sorted(set(own_points) | set(other_jk_points)))
        return side_t.read_pruned_any_of({own_pk: pts})
    return side_t.read_pruned_any_of({own_pk: own_points,
                                      jk: other_jk_points})


def stream_join_mview_sync_manifest(
    spark: SparkSession,
    source_path: str,
    schema,
    left_path: str,
    right_path: str,
    view_path: str,
    checkpoint_path: str,
    table_col: str,
    left_name: str,
    right_name: str,
    join_keys: list[str],
    left_pk: list[str],
    right_pk: list[str],
    group_cols: list[str],
    value: Column,
    left_cols: list[str],
    right_cols: list[str],
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    range_buckets: int = 32,
    fold_max_dirs: int = 16,
):
    """Always-on JOIN-view maintenance from one multiplexed CDC stream:
    both base replicas and the view live in manifest tables, exactly
    once and O(delta) at the storage layer (see
    ``apply_join_mview_manifest_epoch``). The current view is
    ``current_manifest_mview(spark, <either base>, view_path,
    group_cols)[1]``."""
    from cdc_audit_spark.sinks.manifest import ManifestTable

    left_t = ManifestTable(spark, left_path)
    right_t = ManifestTable(spark, right_path)
    view_t = ManifestTable(spark, view_path)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path)

    def handle(batch_df, epoch_id: int) -> None:
        apply_join_mview_manifest_epoch(
            left_t, right_t, view_t, batch_df, epoch_id,
            genstate.checkpoint_run_id(checkpoint_path),
            table_col, left_name, right_name, join_keys, left_pk,
            right_pk, group_cols, value, left_cols, right_cols,
            range_buckets=range_buckets, fold_max_dirs=fold_max_dirs,
        )

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

