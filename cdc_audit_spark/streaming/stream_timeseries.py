"""Streaming time-series subsequence search: the UCR-style z-normalized
matcher (operators.timeseries) run continuously over an append-only
point stream, exactly-once.

Design source: the streaming similarity-search literature (e.g.
"Time Series Similarity Search for Streaming Data in Distributed
Systems", EDBT 2019) — the standard decomposition keeps, per series, a
TAIL of the last m-1 points (the only positions whose windows are still
incomplete) and, on every new batch, scores exactly the windows the
batch completes. This module expresses that on the manifest machinery:

* ``tails`` — an LSM state table of (key, ts, tie, val, __epoch): each
  epoch APPENDS the touched keys' new tails (O(touched keys x m) rows);
  reads take the newest epoch per key, pruned to the batch's keys;
  ``maybe_fold_tails`` is the amortized keep-newest compaction that
  lands the state key-clustered so the pruned read skips dirs.
* ``matches`` — the append-only result stream: every window the batch
  completed, scored by the batch kernel (``znorm_distances`` — same
  expression tree as the oracle-checked batch queries), optionally
  filtered to an epsilon-match threshold.

Emission is exactly-once WITHOUT dedup bookkeeping: a window is emitted
in precisely the epoch that delivers its last point (the stored tail is
m-1 points, so no window is ever complete within the tail alone), and
both commits are epoch-guarded deterministic functions of (batch, state
pinned before the epoch) — the ``stream_components`` replay argument.

Contract: points arrive in nondecreasing (ts, tie) order PER KEY across
batches (the usual ingest-time ordering). Out-of-order late points
cannot be spliced into already-scored windows — the epoch REFUSES them
loudly rather than silently mis-scoring (windows inside one batch need
no order).

``apply_ts_epoch_reordered`` is the watermarked reorder stage that
turns the refusal contract into late-data tolerance: each batch lands
in a small ``buffer`` LSM, a monotone event-time watermark (max ts seen
minus ``delay``) advances per epoch, and only the rows the watermark
releases — a strictly later (wm_prev, wm] band every epoch, hence
in-order by construction — feed the matcher. A point later than
``delay`` behind the stream's high-water mark still refuses loudly
(Spark's own watermark would silently drop it; a scoring engine must
not). The buffer is append-only with the watermark DEFINING liveness
(live = ts > wm), so releases are metadata-free; ``maybe_fold_buffer``
physically drops released rows on the usual dir-fan-in cadence.
``per_key=True`` scopes the watermark to each key's own clock — derived
from committed state (the tails LSM records every key's released
frontier), so skewed-but-ordered series never refuse each other while
beyond-delay lateness WITHIN a key still does.

Half-landed-epoch story (the stream_components treatment, scoped to
what each maintenance op actually reads): an epoch commits matches →
tails → buffer, so a crash can leave the trio's newest (epoch, run_id)
tags disagreeing until redelivery. Cross-table maintenance injected
into that window is refused via the shared ``check_epoch_sync``:
``flush_ts_reorder`` checks all three (exempting its own partial
commits so its redelivery completes), and ``maybe_fold_buffer_keyed``
checks (buffer, tails) — it derives frontiers from the CURRENT tails,
and with tails one epoch ahead of the buffer the fold could drop
buffered rows whose loss shifts the replayed ``_keyed_wm_frame``,
wedging the stream into the order-guard refusal. The SINGLE-table folds
need no guard — each is read-equivalent under this module's pinned
replay reads: ``maybe_fold_tails`` is keep-newest (the ``__epoch=-1``
sentinel never outranks a real epoch, and ``_newest_tail`` normalizes
either way), and ``maybe_fold_buffer`` drops exactly the rows
``ts <= wm`` that every subsequent read filters out anyway, carrying
``wm`` forward; both inherit the parent's epoch/run_id stamps
(``_STATE_KEYS``), so ``_version_before_epoch`` pins replays at or
before them correctly whether the fold ran before or after a crash.

Reference parity: none — the reference has no time-series surface; this
extends the SURVEY §2.11 streaming tier.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from cdc_audit_spark.sinks.manifest import check_epoch_sync
from cdc_audit_spark.streaming import genstate
from cdc_audit_spark.streaming.stream_dedup import _version_before_epoch

__all__ = [
    "apply_ts_epoch",
    "apply_ts_epoch_reordered",
    "flush_ts_reorder",
    "maybe_fold_buffer",
    "maybe_fold_buffer_keyed",
    "maybe_fold_tails",
    "stream_subsequence_sync",
]


def _newest_tail(tail_df, key_col: str):
    """The newest epoch's rows per key from the (append-only) tails LSM."""
    w = Window.partitionBy(key_col)
    return (tail_df.withColumn("__mx", F.max("__epoch").over(w))
            .filter(F.col("__epoch") == F.col("__mx"))
            .drop("__mx", "__epoch"))


def _epoch_wave(guards, preps) -> None:
    """Run one epoch's INDEPENDENT Spark actions as a single parallel
    wave (guide §2.6 — jobs are sequential only because driver code calls
    them sequentially): ``guards`` are callables whose failure must abort
    the epoch before any commit becomes visible (the refusal counts);
    ``preps`` are ``(table, df, prepare_kwargs, commit_extra)`` appends
    whose contents all derive from state pinned before the epoch, so
    their write jobs are mutually independent. ``df`` may be a zero-arg
    CALLABLE returning the DataFrame: plan construction is itself
    100s of py4j round-trips per member, so building each member's plan
    inside its own wave thread overlaps that driver latency with the
    other members' running jobs. Everything Spark-side
    (guard jobs + data-dir writes) overlaps across driver threads; the
    manifest CLAIMS then land sequentially in list order — the exact
    crash-consistency ordering of the sequential code, because a prepared
    dir is invisible until its claim. Any failure abandons every prepared
    dir and re-raises the first error, guards first (a refusal must
    surface as itself, not as collateral)."""
    from concurrent.futures import ThreadPoolExecutor

    if not guards and not preps:
        return
    prepped: list = [None] * len(preps)
    errs: list[BaseException] = []

    def _prep(t, df, kw):
        return t.prepare_append(df() if callable(df) else df, **kw)

    with ThreadPoolExecutor(max_workers=len(guards) + len(preps)) as ex:
        gfs = [ex.submit(g) for g in guards]
        pfs = [ex.submit(_prep, t, df, kw)
               for (t, df, kw, _x) in preps]
        for f in gfs:
            try:
                f.result()
            except BaseException as e:  # noqa: BLE001 — collected, re-raised
                errs.append(e)
        for i, f in enumerate(pfs):
            try:
                prepped[i] = f.result()
            except BaseException as e:  # noqa: BLE001 — collected, re-raised
                errs.append(e)
    if errs:
        for (t, _df, _kw, _x), p in zip(preps, prepped):
            if p is not None:
                t.abandon_prepared(p)
        raise errs[0]
    for (t, _df, _kw, extra), p in zip(preps, prepped):
        t.commit_prepared(p, extra=extra)


def apply_ts_epoch(
    tails,
    matches,
    batch_df,
    epoch_id: int,
    run_id: str | None,
    key_col: str,
    ts_col: str,
    tie_col: str,
    val_col: str,
    query: list[float],
    max_dist2_micro: int | None = None,
    order_guarded: bool = False,
    tail_df=None,
    guard=None,
    extra_preps=None,
    tail_resolved: bool = False,
) -> None:
    """One micro-batch: score every window the batch completes, refresh
    the touched keys' tails. All state reads are pinned before the epoch
    and pruned to the batch's keys; both commits are epoch-guarded.

    ``guard`` (internal — the reorder callers) is an extra refusal
    callable folded into the epoch's parallel wave: it runs CONCURRENTLY
    with the commit data-writes but must succeed before any claim lands
    (see ``_epoch_wave``). ``extra_preps`` (internal) appends additional
    ``(table, df, kwargs, extra)`` commits to the same wave, claimed
    AFTER matches and tails — the reorder buffer append, which is
    independent of both until its claim.

    ``tail_df`` (internal — the reorder/flush callers) supplies an
    already-pinned tails read covering AT LEAST the batch's keys as of
    this epoch's pre-version; it is narrowed to the batch's keys here.
    Those callers hold exactly such a read already, so re-running the
    pruned read (its bounded key-collect job included) per epoch is
    pure duplicate work. ``tail_resolved=True`` additionally promises
    the frame is already keep-newest-resolved WITH ``__epoch`` dropped
    (the keyed caller persists the resolved frame so the window runs
    once at cache fill instead of once inside each of the two commit
    write jobs that scan it).

    ``order_guarded=True`` (internal — the reorder/flush callers) skips
    the per-epoch order-check job because the caller PROVED the batch is
    in order: a watermark-released band is strictly later than every
    stored tail point by construction — global mode releases only rows
    with ``ts > wm_prev`` while tails hold rows released at or before
    ``wm_prev``; keyed mode explicitly refuses any point at or under its
    key's scored-tail max before releasing; the flush releases exactly
    the rows above each key's tail max (or above the global watermark).
    The guard is a full count() action per epoch — a material share of a
    drain's fixed cost — so re-verifying a structurally-impossible
    condition is pure waste; direct (non-reordered) callers keep it."""
    from cdc_audit_spark.operators.timeseries import znorm_distances

    m_done = matches.epoch_applied(epoch_id, run_id)
    t_done = tails.epoch_applied(epoch_id, run_id)
    if m_done and t_done and not (guard or extra_preps):
        # nothing left to commit and no caller guard to honor; a
        # redelivery with a pending extra commit (the reorder buffer)
        # must still run the wave below so that commit lands
        return
    m = len(query)
    batch = batch_df.select(
        F.col(key_col), F.col(ts_col), F.col(tie_col), F.col(val_col)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        if tail_df is not None and tail_resolved:
            # caller promises: pruned to the batch's keys AND keep-newest
            # resolved already (the persisted per-epoch state read) — a
            # second semi-join + window here would re-enter every
            # consuming job's plan as one more broadcast + exchange
            tail = tail_df
        elif tail_df is not None:
            tail = _newest_tail(
                tail_df.join(batch.select(key_col).distinct(), key_col,
                             "left_semi"), key_col)
        else:
            pre = _version_before_epoch(tails, epoch_id)
            if pre is not None:
                tail = _newest_tail(
                    tails.read_pruned_for_keys(
                        batch.select(key_col), key_col, version=pre),
                    key_col)
            else:
                # lazily-empty frame: Catalyst folds the always-false
                # filter to an empty relation — an eager checkpoint here
                # was one full (empty) job per first epoch
                tail = batch.filter(F.lit(False))

        # order guard: the earliest batch point per key must come after
        # the stored tail's latest point — late data cannot be spliced
        # into windows that were already scored. Skipped when the caller
        # proved order (see the docstring); otherwise it joins the
        # epoch's parallel wave — concurrent with the commit writes, but
        # no claim lands until it passes.
        def _order_guard():
            pos = F.struct(F.col(ts_col), F.col(tie_col))
            t_max = tail.groupBy(key_col).agg(F.max(pos).alias("__tmax"))
            b_min = batch.groupBy(key_col).agg(F.min(pos).alias("__bmin"))
            n_late = b_min.join(t_max, key_col).filter(
                F.col("__bmin") <= F.col("__tmax")).count()
            if n_late:
                raise ValueError(
                    f"apply_ts_epoch: {n_late} series key(s) delivered "
                    "points at or before their already-scored tail — "
                    "per-key arrival must be (ts, tie)-nondecreasing "
                    "across batches; reorder late data upstream "
                    "(watermarked buffer) instead of splicing it into "
                    "completed windows")

        combined = tail.unionByName(batch)

        # commit plans are built INSIDE the wave (each thunk runs in its
        # own thread): construction is 100s of py4j round-trips per
        # member, overlapped with the other members' running jobs
        def _dists():
            d = znorm_distances(
                combined, key_col, ts_col, tie_col, val_col, query)
            if max_dist2_micro is not None:
                d = d.filter(F.col("dist2_micro") <= int(max_dist2_micro))
            return d

        def _new_tail():
            order = Window.partitionBy(key_col).orderBy(
                F.col(ts_col).desc(), F.col(tie_col).desc())
            return (
                combined.withColumn("__rn", F.row_number().over(order))
                .filter(F.col("__rn") < m)
                .drop("__rn")
                .withColumn("__epoch", F.lit(int(epoch_id)))
            )

        extra = {"epoch": int(epoch_id), "run_id": run_id}
        guards = []
        if not order_guarded:
            guards.append(_order_guard)
        if guard is not None:
            guards.append(guard)
        preps = []
        if not m_done:
            preps.append((matches, _dists, {}, extra))
        if not t_done:
            preps.append((tails, _new_tail, {"stats_cols": [key_col]},
                          extra))
        preps.extend(extra_preps or [])
        _epoch_wave(guards, preps)
    finally:
        batch.unpersist()
    maybe_fold_tails(tails, key_col)


def _check_wm_mode(buffer, keyed: bool) -> None:
    """Refuse watermark-mode mixing on an existing buffer: a per-key
    buffer read by the global release rule would re-release rows (loud
    downstream, but confusing), and a global buffer read per-key would
    derive frontiers the stamps never promised. Newest-manifest check —
    exact even across out-of-band generic maintenance, because the mode
    stamps are inherited state (``_STATE_KEYS``): every commit on the
    buffer, whether this module's or a foreign compact/constraint,
    physically carries the mode forward."""
    cur = buffer.current_version()
    if cur is None:
        return
    m = buffer.manifest(cur)
    if keyed and "wm" in m:
        raise ValueError(
            "this reorder buffer was built with the GLOBAL watermark "
            "(wm stamps present) — per_key=True cannot resume it; use a "
            "fresh buffer table")
    if not keyed and m.get("wm_keyed"):
        raise ValueError(
            "this reorder buffer was built with PER-KEY watermarks — "
            "the global release rule cannot resume it; pass per_key=True "
            "or use a fresh buffer table")


def _keyed_wm_frame(buf_rows, tail_rows, key_col: str, ts_col: str, delay):
    """(key, __wm_prev): each key's maximum event time EVER seen, minus
    ``delay`` — derived entirely from committed state, no fourth state
    table. The derivation is exact because the tails LSM always holds a
    key's newest RELEASED point (its per-key max IS the released
    frontier), every still-live buffered row is strictly later than
    every released row of its key (releases are watermark bands), and a
    stale (released-but-unfolded) buffered row can never exceed the
    tail's max — so max(tails ∪ buffer) per key = max ever seen."""
    seen = buf_rows.select(key_col, ts_col)
    if tail_rows is not None:
        seen = seen.unionByName(tail_rows.select(key_col, ts_col))
    return seen.groupBy(key_col).agg(
        (F.max(ts_col) - F.lit(delay)).alias("__wm_prev"))


def _wm_extra(wm) -> dict:
    """Serialize the watermark into commit-extra JSON. Timestamp
    watermarks ride as ISO strings (the session pins UTC, so naive
    datetimes round-trip exactly); numeric ones ride as-is."""
    import datetime as dt

    if isinstance(wm, dt.datetime):
        return {"wm": wm.isoformat(), "wm_is_ts": True}
    return {"wm": wm, "wm_is_ts": False}


def _wm_at(buffer, version) -> object | None:
    """The watermark recorded at or before ``version``. O(1): ``wm`` /
    ``wm_is_ts`` are inherited state (``_STATE_KEYS``), so the manifest
    AT ``version`` physically carries the newest stamp — foreign/generic
    commits included. The backward walk survives only as the fallback
    for buffers whose newest commits predate the inheritance."""
    import datetime as dt

    if version is None:
        return None
    m = buffer.manifest(version)
    if "wm" in m:
        return (dt.datetime.fromisoformat(m["wm"])
                if m.get("wm_is_ts") else m["wm"])
    for v in reversed(buffer.versions()):
        if v >= version:
            continue
        m = buffer.manifest(v)
        if "wm" in m:
            return (dt.datetime.fromisoformat(m["wm"])
                    if m.get("wm_is_ts") else m["wm"])
    return None


def apply_ts_epoch_reordered(
    tails,
    matches,
    buffer,
    batch_df,
    epoch_id: int,
    run_id: str | None,
    key_col: str,
    ts_col: str,
    tie_col: str,
    val_col: str,
    query: list[float],
    delay,
    max_dist2_micro: int | None = None,
    per_key: bool = False,
) -> None:
    """One micro-batch of the LATE-DATA-TOLERANT matcher: buffer, then
    release in watermark order, then score (see the module doc).

    ``delay`` is the out-of-orderness bound in the ts column's own
    units — a ``datetime.timedelta`` for timestamp columns, a number
    for numeric columns. Points may arrive in any order as long as each
    lands within ``delay`` of the maximum ts seen so far; a point later
    than that refuses loudly (it can no longer be spliced into windows
    the watermark already released).

    By default the watermark is GLOBAL across keys — Spark's own
    event-time semantics — so ``delay`` must also cover cross-key
    event-time skew: a series lagging more than ``delay`` behind the
    fastest series' clock refuses just like late data would.
    ``per_key=True`` releases each key's band at its OWN ``max(ts_k) -
    delay`` instead: a lagging-but-ordered series (per-device telemetry
    with skewed clocks) never refuses because a fast series advanced,
    while beyond-``delay`` lateness WITHIN a key still refuses. The
    per-key frontier is derived from committed state alone (see
    ``_keyed_wm_frame`` — the tails LSM already records each key's
    released frontier), so no extra state table exists; the inherent
    tradeoff is that a key that stops sending keeps its final
    sub-``delay`` band buffered until that key's own clock advances —
    ``flush_ts_reorder`` drains it explicitly at end of stream. Modes
    are stamped and cannot be mixed on one buffer.

    Replay story: the released band is a deterministic function of
    (batch, buffer state pinned before the epoch) — wm_prev comes from
    the pinned buffer manifest, live buffered rows from the pinned
    read — so the inner ``apply_ts_epoch`` guards and the buffer's own
    epoch guard give exactly-once across all three tables without a
    cross-table transaction. Per-epoch cost: one pinned buffer read
    (delay-bounded rows, dir-pruned on the recorded ts stats after
    folds) plus the inner epoch's O(touched keys) work."""
    b_done = buffer.epoch_applied(epoch_id, run_id)
    if (b_done and matches.epoch_applied(epoch_id, run_id)
            and tails.epoch_applied(epoch_id, run_id)):
        return
    _check_wm_mode(buffer, keyed=per_key)
    batch = batch_df.select(
        F.col(key_col), F.col(ts_col), F.col(tie_col), F.col(val_col)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    if per_key:
        try:
            _apply_reordered_keyed(
                tails, matches, buffer, batch, epoch_id, run_id,
                key_col, ts_col, tie_col, val_col, query, delay,
                max_dist2_micro, b_done)
        finally:
            batch.unpersist()
        maybe_fold_buffer_keyed(buffer, tails, key_col, ts_col, delay)
        return
    try:
        pre = _version_before_epoch(buffer, epoch_id)
        wm_prev = _wm_at(buffer, pre)
        live_buf = (buffer.read(version=pre)
                    .select(key_col, ts_col, tie_col, val_col)
                    if pre is not None
                    else batch.filter(F.lit(False)))
        # one aggregate job covers both the refusal count and the
        # watermark advance (the max is needed on the driver to BUILD the
        # released/still frames, so this job cannot join the commit wave
        # — but it need not be two jobs)
        late_cnt = (F.count(F.when(F.col(ts_col) <= F.lit(wm_prev), 1))
                    if wm_prev is not None else F.lit(0))
        agg = batch.agg(F.max(ts_col).alias("__mx"),
                        late_cnt.alias("__late")).first()
        if wm_prev is not None:
            live_buf = live_buf.filter(F.col(ts_col) > F.lit(wm_prev))
            if agg["__late"]:
                raise ValueError(
                    f"apply_ts_epoch_reordered: {agg['__late']} point(s) "
                    f"arrived at or before the watermark ({wm_prev}) — "
                    "later than the configured reorder delay allows. "
                    "Raise `delay` to cover the source's real "
                    "out-of-orderness; silently dropping or mis-splicing "
                    "them is not an option for a scoring engine")
        max_ts = agg["__mx"]
        if max_ts is None:
            new_wm = wm_prev
        else:
            cand = max_ts - delay
            new_wm = cand if wm_prev is None else max(wm_prev, cand)
        pending = live_buf.unionByName(batch)
        if new_wm is None:
            released = pending.filter(F.lit(False))
        else:
            released = pending.filter(F.col(ts_col) <= F.lit(new_wm))
        extra_preps = []
        if not b_done:
            still = (batch if new_wm is None
                     else batch.filter(F.col(ts_col) > F.lit(new_wm)))
            extra_preps.append((
                buffer, still, {"stats_cols": [ts_col]},
                {"epoch": int(epoch_id), "run_id": run_id,
                 **_wm_extra(new_wm)}))
        # the buffer write joins the matches/tails commit wave; its claim
        # still lands last (see _epoch_wave)
        apply_ts_epoch(
            tails, matches, released, epoch_id, run_id,
            key_col, ts_col, tie_col, val_col, query,
            max_dist2_micro=max_dist2_micro, order_guarded=True,
            extra_preps=extra_preps)
    finally:
        batch.unpersist()
    maybe_fold_buffer(buffer, ts_col)


def _apply_reordered_keyed(
    tails, matches, buffer, batch, epoch_id, run_id,
    key_col, ts_col, tie_col, val_col, query, delay,
    max_dist2_micro, b_done,
) -> None:
    """The per-key release rule of ``apply_ts_epoch_reordered``. Only the
    batch's own keys participate: a key's frontier advances only when
    that key delivers (so its buffered rows and released band are read
    pruned to the touched keys — tighter than the global rule's full
    buffer scan), and an untouched key's buffer simply rides. All reads
    pinned before the epoch; same replay determinism as the global
    path."""
    pre_b = _version_before_epoch(buffer, epoch_id)
    pre_t = _version_before_epoch(tails, epoch_id)
    bkeys = batch.select(key_col).distinct()
    # collect the batch's key points ONCE (bounded job) and hand them to
    # both pruned state reads — otherwise each read re-runs its own
    # distinct+collect over the same batch (one extra job per table per
    # epoch). 4097 rows distinguishes a wider-than-point-mode batch; the
    # complete-list contract then makes each read fall back itself.
    pts_arg = None
    if pre_b is not None or pre_t is not None:
        pts = [r[0] for r in bkeys.limit(4097).collect()]
        pts_arg = pts if len(pts) <= 4096 else None
    # both pinned state reads feed several consumers each (the wm frame,
    # the refusal guard, liveness cuts, the inner epoch's tails): persist
    # them so every later job scans the cached O(batch-keys) rows instead
    # of re-running the manifest read + semi-join lineage per action.
    # (A lazy localCheckpoint here — plan truncation on top of the same
    # caching — was A/B-measured at parity and rejected: the per-epoch
    # plans are shallow enough post-pruning that analysis is not the
    # bottleneck, and persist keeps recompute-on-eviction semantics.)
    buf_rows = (buffer.read_pruned_for_keys(bkeys, key_col, version=pre_b,
                                            points=pts_arg)
                .select(key_col, ts_col, tie_col, val_col)
                .join(bkeys, key_col, "left_semi")
                .persist(StorageLevel.MEMORY_AND_DISK)
                if pre_b is not None
                else batch.filter(F.lit(False)))
    # keep-newest resolved at persist time: the window + semi-join run
    # once at cache fill instead of re-entering every consuming job's
    # plan (wm frame, refusal tmax, and both commit writes scan this) —
    # newest-only rows carry each key's max released ts, so the wm
    # frame, tmax and the inner epoch's tail are value-identical
    tail_rows = (_newest_tail(
        tails.read_pruned_for_keys(bkeys, key_col, version=pre_t,
                                   points=pts_arg)
        .join(bkeys, key_col, "left_semi"), key_col)
        .persist(StorageLevel.MEMORY_AND_DISK)
        if pre_t is not None else None)
    wmf = _keyed_wm_frame(buf_rows, tail_rows, key_col, ts_col,
                          delay).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        def _refusal_guard():
            # joins the epoch's parallel wave (_epoch_wave): runs
            # concurrently with the commit data-writes (its plan is
            # built in-thread too), but no claim lands until it passes —
            # the abort-BEFORE-any-commit contract, minus one serialized
            # job per epoch.
            # refusal: later than the key's OWN reorder bound (null
            # frontier = never-seen key: nothing released yet, nothing
            # can be late). The key's scored-tail max is a second bound:
            # normally it sits at or under the frontier (released rows
            # are ≤ wm), but after a flush_ts_reorder the tail reaches
            # INTO the delay window — a redelivery there must refuse
            # NOW, not sit buffered until the key's clock advances and
            # the inner order guard kills the drain
            ref = batch.join(wmf, key_col, "left")
            late_cond = F.col(ts_col) <= F.col("__wm_prev")
            if tail_rows is not None:
                tmax = (tail_rows.groupBy(key_col)
                        .agg(F.max(ts_col).alias("__tmax")))
                ref = ref.join(tmax, key_col, "left")
                late_cond = late_cond | (F.col(ts_col) <= F.col("__tmax"))
            n_too_late = ref.filter(late_cond).count()
            if n_too_late:
                raise ValueError(
                    f"apply_ts_epoch_reordered(per_key=True): "
                    f"{n_too_late} point(s) arrived at or before their "
                    "key's watermark or scored tail — later than the "
                    "configured reorder delay allows within that series. "
                    "Raise `delay` to cover the source's real per-key "
                    "out-of-orderness; silently dropping or mis-splicing "
                    "them is not an option for a scoring engine")

        new_wm = (batch.groupBy(key_col)
                  .agg((F.max(ts_col) - F.lit(delay)).alias("__cand"))
                  .join(wmf, key_col, "left")
                  .select(key_col,
                          F.greatest("__cand", "__wm_prev").alias("__wm"),
                          "__wm_prev"))
        live_buf = (buf_rows.join(new_wm.select(key_col, "__wm_prev"),
                                  key_col, "left")
                    .filter(F.col("__wm_prev").isNull()
                            | (F.col(ts_col) > F.col("__wm_prev")))
                    .drop("__wm_prev"))
        pending = live_buf.unionByName(batch)
        wm_only = new_wm.select(key_col, "__wm")
        released = (pending.join(wm_only, key_col, "left")
                    .filter(F.col(ts_col) <= F.col("__wm")).drop("__wm"))
        extra_preps = []
        if not b_done:
            def _still():
                return (batch.join(wm_only, key_col, "left")
                        .filter(F.col("__wm").isNull()
                                | (F.col(ts_col) > F.col("__wm")))
                        .drop("__wm"))
            extra_preps.append((
                buffer, _still, {"stats_cols": [ts_col, key_col]},
                {"epoch": int(epoch_id), "run_id": run_id,
                 "wm_keyed": True}))
        # ONE parallel wave for the whole epoch: refusal guard + the
        # three commit writes (matches, tails, buffer) all derive from
        # the pinned pre-epoch state, so only the claims are ordered
        apply_ts_epoch(
            tails, matches, released, epoch_id, run_id,
            key_col, ts_col, tie_col, val_col, query,
            max_dist2_micro=max_dist2_micro, order_guarded=True,
            tail_df=tail_rows, guard=_refusal_guard,
            extra_preps=extra_preps, tail_resolved=True)
    finally:
        wmf.unpersist()
        if pre_b is not None:
            buf_rows.unpersist()
        if tail_rows is not None:
            tail_rows.unpersist()


def flush_ts_reorder(
    tails,
    matches,
    buffer,
    epoch_id: int,
    run_id: str | None,
    key_col: str,
    ts_col: str,
    tie_col: str,
    val_col: str,
    query: list[float],
    max_dist2_micro: int | None = None,
    per_key: bool = False,
) -> None:
    """End-of-stream drain: score EVERY still-buffered point now, without
    waiting for the delay to elapse — the reorder stage's equivalent of
    closing a file. Without this, the final sub-``delay`` band of each
    series sits pending until its clock advances (per-key mode would need
    a sentinel per key, and the caller would have to know the keys).

    An epoch like any other: the released set is all live buffered rows
    (in-order vs the tails by the liveness invariant), derived from state
    pinned before the epoch, committed behind the same per-table epoch
    guards — so a crash mid-flush replays exactly-once. The buffer is
    overwritten empty in the same epoch: in per-key mode liveness is
    DERIVED (ts within delay of the key's max), so flushed rows must
    physically leave or the next epoch would re-release them; the empty
    overwrite carries the watermark/mode stamp forward. After a flush,
    delivering at or before a flushed point refuses loudly (the window it
    would extend is already scored)."""
    b_done = buffer.epoch_applied(epoch_id, run_id)
    if (b_done and matches.epoch_applied(epoch_id, run_id)
            and tails.epoch_applied(epoch_id, run_id)):
        return
    _check_wm_mode(buffer, keyed=per_key)
    # refuse to drain on top of a half-landed PRIOR epoch: the buffer
    # would be missing that epoch's still-buffered rows (its append
    # never landed), so the flush would silently drain an incomplete
    # stream. The flush's OWN partial commits are exempt — its
    # redelivery must complete. (module doc: half-landed-epoch story)
    check_epoch_sync(
        {"tails": tails, "matches": matches, "buffer": buffer},
        applying=(epoch_id, run_id),
        consequence=("flushing now would drain a buffer missing the "
                     "half-landed epoch's rows"))
    pre = _version_before_epoch(buffer, epoch_id)
    if pre is None:
        return  # nothing was ever buffered — deterministic no-op
    buf = buffer.read(version=pre).select(key_col, ts_col, tie_col, val_col)
    # the pinned tails read is handed down to the inner epoch (tail_df)
    # so it does not re-run its own pruned read + key collect
    pre_t = _version_before_epoch(tails, epoch_id)
    tail_df = tails.read(version=pre_t) if pre_t is not None else None
    if per_key:
        # live rows are STRICTLY later than every released row of their
        # key (releases are bands), and the tails hold each key's newest
        # released point — so ts > tail-max is the exact liveness cut,
        # no delay needed
        if tail_df is not None:
            tmax = (tail_df
                    .groupBy(key_col).agg(F.max(ts_col).alias("__tmax")))
            released = (buf.join(tmax, key_col, "left")
                        .filter(F.col("__tmax").isNull()
                                | (F.col(ts_col) > F.col("__tmax")))
                        .drop("__tmax"))
        else:
            released = buf
        extra = {"epoch": int(epoch_id), "run_id": run_id,
                 "wm_keyed": True}
    else:
        wm_prev = _wm_at(buffer, pre)
        released = (buf.filter(F.col(ts_col) > F.lit(wm_prev))
                    if wm_prev is not None else buf)
        mx = released.agg(F.max(ts_col)).first()[0]
        new_wm = mx if mx is not None else wm_prev
        if new_wm is not None and wm_prev is not None:
            new_wm = max(new_wm, wm_prev)
        # stamp even a None watermark (it round-trips: _wm_at treats a
        # null wm as absent) — every buffer commit must carry a mode
        # marker, or this flush-of-an-empty-never-stamped buffer would
        # become a stampless newest manifest and let per_key=True
        # silently resume a global buffer
        extra = {"epoch": int(epoch_id), "run_id": run_id,
                 **_wm_extra(new_wm)}
    # no eager checkpoint here: the inner epoch persists its batch
    # projection, so every consumer after the first scans the cache —
    # the checkpoint was one extra full materialization job per flush
    apply_ts_epoch(
        tails, matches, released, epoch_id, run_id,
        key_col, ts_col, tie_col, val_col, query,
        max_dist2_micro=max_dist2_micro, order_guarded=True,
        tail_df=tail_df)
    if not b_done:
        buffer.overwrite(buf.filter(F.lit(False)), extra=extra)


def maybe_fold_buffer_keyed(buffer, tails, key_col: str, ts_col: str,
                            delay, max_dirs: int = 64,
                            n_dirs: int = 8) -> int | None:
    """Per-key twin of ``maybe_fold_buffer``: physically drop each key's
    released rows (ts at or below the key's derived frontier) when the
    buffer's dir fan-in passes ``max_dirs``. Survivors land key-clustered
    — the per-epoch read is pruned BY KEY in this mode, so key-range dirs
    are what it skips on.

    Reads the CURRENT tails to derive frontiers, so it must not run
    while an epoch is half-landed with tails ahead of the buffer: the
    derived frontier would drop buffered rows whose loss shifts the
    replayed ``_keyed_wm_frame`` (module doc: half-landed-epoch story).
    In-flow calls run after the epoch's last commit, where the tags
    agree; the guard only bites out-of-band maintenance."""
    cur = buffer.current_version()
    if cur is None:
        return None
    check_epoch_sync(
        {"buffer": buffer, "tails": tails},
        consequence=("folding against post-epoch tails would drop "
                     "buffered rows the epoch's replay still reads"))
    if len(buffer.manifest(cur)["dirs"]) <= max_dirs:
        return None
    buf = buffer.read()
    wmf = _keyed_wm_frame(buf, tails.read(), key_col, ts_col, delay)
    live = (buf.join(wmf, key_col, "left")
            .filter(F.col("__wm_prev").isNull()
                    | (F.col(ts_col) > F.col("__wm_prev")))
            .drop("__wm_prev"))
    return buffer.overwrite_clustered(live, key_col, n_dirs=n_dirs,
                                      extra={"wm_keyed": True})


def maybe_fold_buffer(buffer, ts_col: str, max_dirs: int = 64,
                      n_dirs: int = 8) -> int | None:
    """Physically drop watermark-released rows from the reorder buffer
    when its dir fan-in passes ``max_dirs``: surviving (still-buffered)
    rows land as disjoint ts-range dirs, so the per-epoch live read
    prunes released history at the manifest level. The fold carries the
    current watermark forward — every buffer commit must, or the wm walk
    would skip it."""
    cur = buffer.current_version()
    if cur is None:
        return None
    if len(buffer.manifest(cur)["dirs"]) <= max_dirs:
        return None
    wm = _wm_at(buffer, cur)
    live = buffer.read()
    if wm is not None:
        live = live.filter(F.col(ts_col) > F.lit(wm))
    # stamp even a None watermark: the mode check reads the newest
    # manifest, and a stampless fold would let per_key=True silently
    # resume a global buffer
    return buffer.overwrite_clustered(
        live, ts_col, n_dirs=n_dirs, extra=_wm_extra(wm))


def maybe_fold_tails(tails, key_col: str, max_dirs: int = 64,
                     n_dirs: int = 8) -> int | None:
    """Keep-newest fold of the tails LSM when its dir fan-in passes
    ``max_dirs``: the surviving (newest-epoch) rows land as disjoint
    key-range dirs, so the per-epoch pruned read skips dirs — the
    ``maybe_cluster_lsh_index`` pattern for keep-last state."""
    cur = tails.current_version()
    if cur is None:
        return None
    if len(tails.manifest(cur)["dirs"]) <= max_dirs:
        return None
    # sentinel epoch -1: keep-newest already collapsed duplicates, and
    # every post-fold append stamps a real (>= 0) epoch that outranks it
    kept = _newest_tail(tails.read(), key_col).withColumn(
        "__epoch", F.lit(-1))
    return tails.overwrite_clustered(kept, key_col, n_dirs=n_dirs)


def stream_subsequence_sync(
    spark: SparkSession,
    source_path: str,
    schema,
    matches_path: str,
    tails_path: str,
    checkpoint_path: str,
    key_col: str,
    ts_col: str,
    tie_col: str,
    val_col: str,
    query: list[float],
    max_dist2_micro: int | None = None,
    reorder_delay=None,
    buffer_path: str | None = None,
    per_key_watermark: bool = False,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Always-on subsequence matcher over a parquet point stream: one
    epoch-tagged commit per table per micro-batch (see
    ``apply_ts_epoch``); the accumulated ``matches`` table equals the
    batch kernel run over the full series.

    Pass ``reorder_delay`` (+ ``buffer_path`` for the buffer LSM) to run
    the watermarked reorder stage in front of the matcher
    (``apply_ts_epoch_reordered``): points may then arrive out of order
    within ``reorder_delay`` of the stream's event-time high-water mark;
    matches trail ingestion by the watermark delay.
    ``per_key_watermark=True`` scopes that high-water mark to each key's
    own clock (skewed per-device series never refuse each other; see
    ``apply_ts_epoch_reordered``). Without a reorder stage, per-key
    arrival must be (ts, tie)-nondecreasing across batches."""
    from cdc_audit_spark.sinks.manifest import ManifestTable

    if (reorder_delay is None) != (buffer_path is None):
        raise ValueError(
            "reorder_delay and buffer_path come together: the reorder "
            "stage needs its buffer table, and a buffer without a delay "
            "has no watermark to release on")
    matches = ManifestTable(spark, matches_path)
    tails = ManifestTable(spark, tails_path)
    buffer = (ManifestTable(spark, buffer_path)
              if buffer_path is not None else None)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path)

    def handle(batch_df, epoch_id: int) -> None:
        run_id = genstate.checkpoint_run_id(checkpoint_path)
        if buffer is not None:
            apply_ts_epoch_reordered(
                tails, matches, buffer, batch_df, epoch_id, run_id,
                key_col, ts_col, tie_col, val_col, query,
                delay=reorder_delay, max_dist2_micro=max_dist2_micro,
                per_key=per_key_watermark)
        else:
            apply_ts_epoch(
                matches=matches, tails=tails, batch_df=batch_df,
                epoch_id=epoch_id, run_id=run_id,
                key_col=key_col, ts_col=ts_col, tie_col=tie_col,
                val_col=val_col, query=query,
                max_dist2_micro=max_dist2_micro,
            )

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
