"""Manifest-committed parquet tables: atomic multi-version sinks.

Several operators in this engine rewrite their whole sink to express
deletes as plain parquet (``compact.compact_log``, ``sync.repair_sink``,
the streaming index/view hooks) and document the same caveat: at 100 TB
that overwrite belongs in a transactional table format. This module is
that format's essential core, built from public first principles (the
commit protocol at the heart of Delta/Iceberg-style table layouts),
storage-agnostic and tiny:

Layout::

    <table>/data/c-<uuid>/part-*.parquet   -- one immutable dir per commit
    <table>/_manifests/m-<version>.json    -- {version, action, dirs, ...}

A version's content is the union of the parquet directories its manifest
lists. Commits never touch existing data:

* ``append``     -> new dir; manifest lists parent dirs + the new dir
* ``overwrite``  -> new dir; manifest lists only the new dir
* ``compact``    -> semantic no-op rewrite (overwrite with the same rows)
  that shrinks the dir list back to one — the transactional form of
  ``compact.compact_log``'s rewrite-in-place

The COMMIT is the atomic creation of ``m-<version>.json``: content is
written to a temp file and ``os.link``-ed to its final name, which fails
with EEXIST if another writer claimed the version first (optimistic
concurrency — appends rebase and retry, overwrites surface
:class:`CommitConflict`). Readers list manifests and take the highest
version, so a crash at ANY point leaves either the old version (data dir
and/or temp manifest orphaned, invisible) or the new version (manifest
fully linked) — never a torn table. Orphans are reclaimed by ``vacuum``.

Scale notes: the protocol is one small-file write per commit regardless of
data size; time travel is "read an older manifest"; concurrent readers
never block writers. On object stores without hard links, the same
claim-then-publish is done with a conditional PUT (if-none-match) — the
swap point is :class:`ClaimBackend` (inject one; the default is the
POSIX hard-link implementation).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = ["ClaimBackend", "CommitConflict", "HardLinkClaimBackend",
           "ManifestTable"]

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"

#: Target bytes per committed data file (pre-compression plan estimate);
#: guide §6's 128 MB-1 GB band. Writer parallelism derives from the
#: batch's own size estimate (see ``ManifestTable._coalesced``), never
#: from the local core count.
_TARGET_FILE_BYTES = 128 * 1024 * 1024

#: Pruned-merge touch detection: up to this many ranged dirs the per-dir
#: ownership flags ride in the one delta aggregate; past it the flags
#: expression would be an O(dirs)-wide codegen blow-up, so touched dirs
#: resolve from a bounded distinct-key collect (binary search against the
#: driver-resident ownership bounds) or, for unbounded deltas, the
#: conservative [min, max] ownership hull.
_MERGE_FLAG_MAX_DIRS = 512
_MERGE_TOUCH_MAX_POINTS = 100_000

# sentinel: "this commit does not pin its parent" (append semantics) /
# "capture the current version at call time" (overwrite's default)
_ANY = object()


def _plain(v):
    """JSON-comparable form of an aggregate bound: numbers/strings pass
    through; datetimes become ISO strings (lexicographic order == time
    order, so pruning comparisons stay valid); anything else is skipped
    (None) — never record a bound we can't compare faithfully."""
    import datetime as _dt

    if v is None or isinstance(v, bool):  # bool before int: not a bound
        return None
    if isinstance(v, (int, float, str)):
        return v
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    return None

# Payload keys that describe the TABLE (not one commit's delta) and are
# inherited by every later commit — see _commit. cdc_schema (the change
# feed's row shape as of the last feed-recording merge) and
# cdc_audit_cols (the audit column NAMES that shape uses — feed readers
# must not hardcode 'audit_event'/'audit_pk' for tables templated with
# custom names) inherit so feed consumers resolve both from the newest
# manifest in O(1); cdc_dirs does NOT (each commit's feed dirs are that
# commit's delta alone).
_STATE_KEYS = ("watermark", "epoch", "run_id", "wipe_through",
               "wipe_pk_cols", "schema", "cdc_schema", "cdc_audit_cols",
               "txns", "constraints",
               # components-ledger state (streaming/stream_components.py):
               # the fingerprint config the ledgers were built with and
               # the generation token of the newest rebuild. Both are
               # TABLE state, not one-commit markers — inheriting them
               # physically makes the newest manifest authoritative, so a
               # generic maintenance commit (compact/binpack/constraint)
               # can never bury a pending-rebuild marker and the cfg
               # check never walks history.
               "components_cfg", "components_rebuild",
               # reorder-buffer watermark state
               # (streaming/stream_timeseries.py): the event-time
               # watermark and its mode (global wm/wm_is_ts vs per-key
               # wm_keyed) are TABLE state — the mode-mixing refusal and
               # the watermark read both resolve from the newest
               # manifest, so a generic out-of-band commit on the buffer
               # (compact_small/checkpoint/constraint) must physically
               # inherit them or it would silently disarm the mode check
               # and force _wm_at back onto an O(versions) walk.
               "wm", "wm_is_ts", "wm_keyed",
               # ANN serving-projection state (streaming/stream_ann.py):
               # the centroids the CURRENT cell assignment was built
               # under. Probes and restarted maintainers read these per
               # batch (frozen-centroid contract), so the newest manifest
               # must be authoritative in O(1) — the pre-r13 backward
               # walk re-scanned every version on every epoch of a
               # never-rebuilt table. ann_recall deliberately does NOT
               # inherit: its absence within the cadence window is the
               # signal that a recall check is due.
               "ann_centroids")

# Deletion-vector payload keys (dv_dirs: live DV key files; dv_meta:
# per-DV {key, rows, files, covers}) survive only through commits that
# PRESERVE the parent's data dirs. A full rewrite (overwrite / compact /
# optimize / merge / repair) derives its content from the DV-APPLIED
# read, so carrying the vectors forward would delete the rows twice —
# or worse, delete fresh rows that reuse a key. Dropping them there IS
# the materialization step.
_DV_KEYS = ("dv_dirs", "dv_meta")
_DV_CARRY_ACTIONS = ("append", "analyze", "delete")


class ConstraintViolation(ValueError):
    """A write's rows fail a table CHECK constraint (add_constraint)."""


class _TxnApplied(Exception):
    """Internal: a claim-loop rebase found the (app_id, version) pair
    already durable — the append skips gracefully (see append(txn_*))."""


class CommitConflict(RuntimeError):
    """Another writer committed the version this commit was based on.
    Appends rebase and retry automatically; overwrites surface this so the
    caller decides whose table state wins."""


def _manifest_path(table_path: str, version: int) -> str:
    return os.path.join(table_path, _MANIFEST_DIR, f"m-{version:012d}.json")


def _checkpoint_path(table_path: str, version: int) -> str:
    return os.path.join(table_path, _MANIFEST_DIR, f"ckpt-{version:012d}.json")


def _claim_manifest(table_path: str, version: int, payload: dict) -> bool:
    """Atomically publish a fully-written manifest for ``version``.

    Returns False when the version is already claimed (concurrent writer
    won). Write-to-temp + hard-link means a reader can never observe a
    torn manifest: the final name exists only once its bytes are complete.
    """
    final = _manifest_path(table_path, version)
    os.makedirs(os.path.dirname(final), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(final), prefix=".m_")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f)
        try:
            os.link(tmp, final)
            return True
        except FileExistsError:
            return False
    finally:
        os.unlink(tmp)


def _list_versions(table_path: str) -> list[int]:
    """Committed versions by directory listing, ascending ([] before the
    first commit). The ONE place the ``m-<version>.json`` name convention
    is parsed — ManifestTable.versions(), the pointer fallback, and the
    streaming source all delegate here."""
    mdir = os.path.join(table_path, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    return sorted(
        int(n[2:-5]) for n in os.listdir(mdir)
        if n.startswith("m-") and n.endswith(".json")
    )


def _dir_file_stats(table_path: str, rel_dir: str) -> dict:
    """``{"files": [...], "rows": n, "bytes": n, "stats": {col: [lo,
    hi]}}`` for a freshly-written commit dir — row counts AND numeric
    column min/max come from the parquet FOOTERS (one tail read per
    file, driver side, at write time when the dir is known-complete),
    so recording them costs no Spark job. Recorded in dir_meta, rows
    make ``COUNT(*)`` / ``describe_detail`` pure manifest reads, and
    the column stats make EVERY written dir skippable by
    ``dirs_pruned`` / ``dirs_pruned_any`` on any numeric column — not
    just the layout key (the Delta/Iceberg per-file-stats pattern at
    dir granularity; this is what lets a join-IVM side read prune on
    the JOIN key while the replica is laid out by its pk). A column is
    recorded only when every row group carries trustworthy min/max
    (NaN-bearing doubles don't; missing stats just mean the dir is
    conservatively kept)."""
    import datetime as _dt

    import pyarrow.parquet as pq

    full = os.path.join(table_path, rel_dir)
    files = sorted(f for f in os.listdir(full) if f.endswith(".parquet"))
    rows = nbytes = 0
    col_stats: dict[str, list] = {}
    col_nulls: dict[str, int] = {}
    dropped: set[str] = set()
    null_dropped: set[str] = set()

    def _bound(v):
        # plain finite numbers pass through (bool is an int subtype —
        # exclude); datetimes/dates become the same naive-UTC ISO form
        # the aggregate path records via _plain (parquet footers hand
        # back tz-aware UTC datetimes; the session pins UTC, so dropping
        # the offset yields the identical instant and the identical
        # lexicographic order). Strings stay excluded: parquet may
        # truncate long string bounds and a truncated max is not a max.
        if (isinstance(v, (int, float)) and not isinstance(v, bool)
                and v == v):
            return v
        if isinstance(v, _dt.datetime):
            if v.tzinfo is not None:
                v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            return v.isoformat()
        if isinstance(v, _dt.date):
            return v.isoformat()
        return None

    for f in files:
        p = os.path.join(full, f)
        md = pq.ParquetFile(p).metadata
        rows += md.num_rows
        nbytes += os.path.getsize(p)
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            for j in range(rg.num_columns):
                col = rg.column(j)
                name = col.path_in_schema
                if "." in name:  # nested: skip
                    continue
                st = col.statistics
                # null counts fold independently of min/max validity
                # (an all-null chunk has no bounds but an exact count)
                if name not in null_dropped:
                    if st is None or not st.has_null_count:
                        null_dropped.add(name)
                        col_nulls.pop(name, None)
                    else:
                        col_nulls[name] = (col_nulls.get(name, 0)
                                           + st.null_count)
                if rg.num_rows == 0 or name in dropped:
                    continue
                if st is not None and st.has_min_max:
                    lo, hi = _bound(st.min), _bound(st.max)
                else:
                    lo = hi = None
                if lo is None or hi is None:
                    # all-null chunks carry no bounds; rows may still
                    # have none in other chunks, so only non-null data
                    # without usable bounds poisons the column
                    if (st is not None and st.has_null_count
                            and st.null_count == rg.num_rows):
                        continue
                    dropped.add(name)
                    col_stats.pop(name, None)
                    continue
                cur = col_stats.get(name)
                if cur is None:
                    col_stats[name] = [lo, hi]
                else:
                    cur[0] = min(cur[0], lo)
                    cur[1] = max(cur[1], hi)
    out: dict = {"files": files, "rows": rows, "bytes": nbytes}
    if col_stats and rows > 0:
        out["stats"] = col_stats
    if rows > 0:
        out["nulls"] = col_nulls
    else:
        out["nulls"] = {}
    return out


#: Equality-skipping stats (``append(set_stats_cols=)`` / ``analyze``):
#: a dir with <= _SET_STAT_MAX distinct values records them exactly;
#: above it a Bloom bitmap of _BLOOM_M bits / _BLOOM_K probes (~0.2%
#: false-keep at 500 distinct values — a false positive only costs a
#: wasted dir read, never wrong results). Hashing is md5 over the
#: value's STRING form on both sides — Spark's ``md5(cast(c as
#: string))`` at write time and hashlib.md5 at prune time agree
#: byte-for-byte for string and integer columns (the supported types).
_SET_STAT_MAX = 64
_BLOOM_M = 4096
_BLOOM_K = 4


def _bloom_positions(value: str, m: int = _BLOOM_M,
                     k: int = _BLOOM_K) -> list[int]:
    """Bit positions for ``value`` — ``k`` independent 32-bit words of
    one md5 digest, mod the bitmap size ``m``. Must mirror the
    Spark-side expression in ``ManifestTable._set_stat`` exactly; the
    md5 digest yields at most 4 words, so k > 4 is unprobeable."""
    import hashlib

    h = hashlib.md5(str(value).encode()).hexdigest()
    return [int(h[8 * i:8 * i + 8], 16) % m for i in range(k)]


def _set_may_contain(stat: dict, value) -> bool:
    """May a dir with equality stat ``stat`` contain ``value``? Exact
    for a recorded distinct set; one-sided (false keeps only) for a
    Bloom bitmap. Probes use the stat's RECORDED m/k — a stat written
    under different module constants must be evaluated with its own
    parameters or the prune is unsound (wrong results, not a wasted
    read); unprobeable parameters keep the dir conservatively."""
    s = str(value)
    if "set" in stat:
        return s in stat["set"]
    bloom = stat["bloom"]
    m, k = int(bloom["m"]), int(bloom["k"])
    b = bytes.fromhex(bloom["hex"])
    if k < 1 or k > 4 or m < 8 or len(b) * 8 < m:
        return True  # parameters this probe can't evaluate: never prune
    return all((b[p // 8] >> (p % 8)) & 1
               for p in _bloom_positions(s, m, k))


def _in_pred(col: str, points: list):
    """One-expression ``col IN (points)`` predicate.

    ``Column.isin(*points)`` costs one py4j round-trip PER literal —
    measured ~1 ms each, so a 4096-key pruned read spends seconds of
    pure driver latency building the filter (the dominant cost of the
    r13 maintained-state drains). For int/float/str points the same
    predicate is built as a single SQL string parsed in ONE round-trip
    (Catalyst converts long IN lists to an InSet anyway); other literal
    types keep the isin fallback."""
    from pyspark.sql import functions as F

    def fmt(p):
        if isinstance(p, bool) or p is None:
            return None
        if isinstance(p, int):
            return str(p)
        if isinstance(p, float):
            return repr(p) if p == p and abs(p) != float("inf") else None
        if isinstance(p, str):
            return ("'"
                    + p.replace("\\", "\\\\").replace("'", "\\'") + "'")
        return None

    lits = [fmt(p) for p in points]
    if any(l is None for l in lits):
        return F.col(col).isin(*points)
    q = "`" + col.replace("`", "``") + "`"
    return F.expr(f"{q} IN ({', '.join(lits)})")


def _fold_dir_meta(metas: list[dict]) -> dict:
    """Fold several dirs' recorded skipping stats into one dir's — used
    when bin-packing merges their files. Conservative by construction:
    a column surfaces in the fold only when EVERY member recorded it
    (min/max: interval hull; equality stats: set union, degrading to a
    Bloom OR past the exact-set bound); anything else is dropped and a
    later ``analyze`` can recompute it. pk ranges fold into plain stats
    (never pk_min/pk_max — the merged interval may overlap other dirs,
    and the pruned MERGE's disjointness contract must see these dirs as
    rangeless). NDV sketches are dropped (an HLL union needs a job, not
    a fold — analyze backfills)."""
    def ranges(dm: dict) -> dict:
        st = dict(dm.get("stats", {}))
        if "pk_min" in dm and dm.get("pk_col"):
            st.setdefault(dm["pk_col"], [dm["pk_min"], dm["pk_max"]])
        return st

    out: dict = {}
    all_ranges = [ranges(dm) for dm in metas]
    stats = {}
    for c in set.intersection(*[set(r) for r in all_ranges]):
        try:
            stats[c] = [min(r[c][0] for r in all_ranges),
                        max(r[c][1] for r in all_ranges)]
        except TypeError:
            continue
    if stats:
        out["stats"] = stats
    all_nulls = [dm.get("nulls", {}) for dm in metas]
    nulls = {c: sum(int(n[c]) for n in all_nulls)
             for c in set.intersection(*[set(n) for n in all_nulls])}
    if nulls:
        out["nulls"] = nulls
    all_sets = [dm.get("sets", {}) for dm in metas]
    sets = {}
    for c in set.intersection(*[set(s) for s in all_sets]):
        members = [s[c] for s in all_sets]
        if any("bloom" in sc and (sc["bloom"]["m"] != _BLOOM_M
                                  or sc["bloom"].get("k") != _BLOOM_K)
               for sc in members):
            # m OR k drift across versions: a bitwise OR of bitmaps
            # probed under different parameters is meaningless — drop
            # the stat and let a later analyze recompute it
            continue
        vals: set[str] = set()
        bits = bytearray(_BLOOM_M // 8)
        exact = True
        for sc in members:
            if "set" in sc:
                vals.update(sc["set"])
            else:
                exact = False
                b = bytes.fromhex(sc["bloom"]["hex"])
                for i, byte in enumerate(b):
                    bits[i] |= byte
        if exact and len(vals) <= _SET_STAT_MAX:
            sets[c] = {"set": sorted(vals)}
            continue
        for v in vals:
            for p in _bloom_positions(v):
                bits[p // 8] |= 1 << (p % 8)
        sets[c] = {"bloom": {"m": _BLOOM_M, "k": _BLOOM_K,
                             "hex": bits.hex()}}
    if sets:
        out["sets"] = sets
    return out


def _last_pointer_path(table_path: str) -> str:
    return os.path.join(table_path, _MANIFEST_DIR, "_last.json")


def _read_last_pointer(table_path: str) -> int | None:
    """Best-effort hint of the newest committed version (the Delta
    ``_last_checkpoint`` analog for the version axis). May LAG the truth
    (a committer can crash between claim and pointer write, and the
    pointer write itself is unsynchronized) — callers must probe forward
    from it; it is never authoritative."""
    try:
        with open(_last_pointer_path(table_path)) as f:
            v = json.load(f).get("version")
        return int(v) if v is not None else None
    except (OSError, ValueError, TypeError, json.JSONDecodeError):
        return None


def _write_last_pointer(table_path: str, version: int) -> None:
    """Best-effort, monotone pointer update after a successful claim.
    Racy by design (two committers can interleave read-check and
    replace); a regression only costs the next reader extra forward
    probes — the claim files remain the source of truth."""
    import contextlib

    prev = _read_last_pointer(table_path)
    if prev is not None and prev >= version:
        return
    with contextlib.suppress(OSError):
        fd, tmp = tempfile.mkstemp(dir=os.path.join(table_path, _MANIFEST_DIR),
                                   prefix="._last_")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump({"version": int(version)}, f)
            os.replace(tmp, _last_pointer_path(table_path))
        except OSError:
            os.unlink(tmp)


def current_committed_version(table_path: str) -> int | None:
    """The newest committed version WITHOUT listing ``_manifests/`` on
    the happy path: read the ``_last.json`` pointer, verify its manifest
    exists, then probe forward one version at a time past any commits
    the pointer missed (versions are claimed densely, so the first gap
    is the frontier). Cost: O(1 + pointer lag) stat calls. Falls back to
    the full directory listing when the pointer is absent or stale
    (pre-pointer tables, manual copies)."""
    v = _read_last_pointer(table_path)
    if v is not None and os.path.exists(_manifest_path(table_path, v)):
        while os.path.exists(_manifest_path(table_path, v + 1)):
            v += 1
        return v
    vs = _list_versions(table_path)
    return vs[-1] if vs else None


def newest_epoch_tag(table) -> tuple:
    """The (epoch, run_id) the table's newest manifest carries — exact
    in one metadata read, because both keys are inherited state
    (``_STATE_KEYS``) physically present on every commit."""
    cur = table.current_version()
    if cur is None:
        return (None, None)
    m = table.manifest(cur)
    return (m.get("epoch"), m.get("run_id"))


def check_epoch_sync(tables: dict, applying: tuple | None = None,
                     consequence: str = "") -> None:
    """Refuse cross-table work while a streaming epoch is half-landed
    across ``tables`` (a dict of name -> ManifestTable): every complete
    epoch of a multi-table hook commits to ALL of them, so newest
    (epoch, run_id) tags that disagree mean a crash struck between the
    per-table commits and the stream's redelivery has not run yet. Work
    injected into that window reads an INCONSISTENT cross-table state;
    the only safe order is: let the stream redeliver (which completes
    the epoch exactly-once behind the per-table ``epoch_applied``
    guards), then do the work. One metadata read per table.

    ``applying=(epoch_id, run_id)`` exempts tables whose newest tag IS
    that epoch — the caller is itself the redelivery of a half-landed
    epoch, and its own partial commits must not refuse its completion.
    """
    tags = {name: newest_epoch_tag(t) for name, t in tables.items()}
    live = {n: tag for n, tag in tags.items()
            if applying is None
            or tag != (int(applying[0]), applying[1])}
    if len(set(live.values())) > 1:
        raise RuntimeError(
            f"a streaming epoch is half-landed across tables ({tags}) — "
            "a crash is pending redelivery. Restart the stream (or "
            "re-apply the epoch) to complete it first"
            + (f": {consequence}" if consequence else ""))


class ClaimBackend:
    """Storage adapter for the ONE primitive the commit protocol needs:
    publish-if-absent of a fully-written manifest for a version. Returns
    True when this writer won the version, False when it was already
    claimed. The commit loop's correctness (rebase-and-retry appends,
    loud overwrite conflicts, exactly-once sync watermarks) rests only on
    this compare-and-publish contract — NOT on POSIX hard-link semantics:
    on an object store the same contract is a conditional PUT
    (if-none-match), on a database a unique-key insert."""

    def publish(self, table_path: str, version: int, payload: dict) -> bool:
        raise NotImplementedError


class HardLinkClaimBackend(ClaimBackend):
    """Default local-filesystem backend: write-to-temp + os.link, which
    fails with EEXIST if the version is already claimed."""

    def publish(self, table_path: str, version: int, payload: dict) -> bool:
        return _claim_manifest(table_path, version, payload)


class ManifestTable:
    """A multi-version parquet table with atomic commits and time travel.

    ``checkpoint_interval``: every Nth commit additionally writes a
    ``ckpt-<version>.json`` roll-up beside the manifests. A manifest
    payload is already a fully RESOLVED snapshot (full dir list, state
    keys inherited on every commit), so the checkpoint is simply that
    payload pinned under a name state readers can jump to: the newest-
    first state walks (watermark/last_epoch/wipe_record/schema) stop at
    the newest checkpoint instead of potentially scanning the whole
    history, bounding every state read to <= interval + 1 file reads no
    matter how many commits the table has accrued (a cron-cadence table
    gains ~1e5 commits/year). Vacuum may then drop pre-checkpoint
    manifests without losing state — the public Delta `_last_checkpoint`
    pattern. 0 disables checkpointing."""

    def __init__(self, spark: SparkSession, table_path: str,
                 checkpoint_interval: int = 16,
                 claim_backend: ClaimBackend | None = None):
        if checkpoint_interval < 0:
            raise ValueError("checkpoint_interval must be >= 0")
        self.spark = spark
        self.path = table_path
        self.checkpoint_interval = checkpoint_interval
        self.claim_backend = claim_backend or HardLinkClaimBackend()

    # ---------------------------------------------------------------- reads

    def versions(self) -> list[int]:
        """Committed versions, ascending ([] before the first commit)."""
        return _list_versions(self.path)

    def current_version(self) -> int | None:
        # pointer + forward probe: O(1 + lag) stats, no directory listing
        # on the happy path — this runs on EVERY claim attempt
        return current_committed_version(self.path)

    def version_at(self, timestamp: float) -> int | None:
        """Newest version committed at or before ``timestamp`` (epoch
        seconds, or a datetime) — the TIMESTAMP AS OF resolver. Commit
        times are read as a MONOTONE sequence (claim order is version
        order; a lagging writer clock is clamped by its predecessor) so
        the answer is unambiguous even if wall clocks jittered across
        writers. None when the first commit is later than ``timestamp``.
        Walks the (vacuum-bounded) manifest list; a legacy manifest
        without a recorded ``ts`` counts as 'at the epoch' — always
        eligible, never hiding a newer eligible version."""
        if hasattr(timestamp, "timestamp"):  # datetime -> epoch seconds
            timestamp = timestamp.timestamp()
        best, floor = None, float("-inf")
        for v in self.versions():
            ts = max(floor, self.manifest(v).get("ts", float("-inf")))
            floor = ts
            if ts <= timestamp:
                best = v
            else:
                break  # monotone: later versions are later still
        return best

    def manifest(self, version: int) -> dict:
        try:
            with open(_manifest_path(self.path, version)) as f:
                return json.load(f)
        except FileNotFoundError:
            # a vacuumed manifest whose version was checkpointed is still
            # reconstructible — time travel to checkpointed versions
            # survives manifest GC
            try:
                with open(_checkpoint_path(self.path, version)) as f:
                    return json.load(f)
            except FileNotFoundError:
                pass
            raise

    def checkpoints(self) -> list[int]:
        """Versions with a ``ckpt-*.json`` roll-up, ascending."""
        mdir = os.path.join(self.path, _MANIFEST_DIR)
        if not os.path.isdir(mdir):
            return []
        return sorted(
            int(n[5:-5]) for n in os.listdir(mdir)
            if n.startswith("ckpt-") and n.endswith(".json")
        )

    def _newest_checkpoint(self, at_version: int | None = None) -> dict | None:
        # fast path: checkpoints land at multiples of checkpoint_interval,
        # so probe downward from floor(at/interval)*interval — no listing.
        # A miss falls back to the listing (another writer may checkpoint
        # at a different cadence); picking an OLDER checkpoint than the
        # true newest is always safe — the state walk just runs longer.
        top = (at_version if at_version is not None
               else current_committed_version(self.path))
        if self.checkpoint_interval and top is not None:
            k = (top // self.checkpoint_interval) * self.checkpoint_interval
            while k > 0:
                try:
                    with open(_checkpoint_path(self.path, k)) as f:
                        return json.load(f)
                except FileNotFoundError:
                    k -= self.checkpoint_interval
        cks = self.checkpoints()
        if at_version is not None:
            cks = [v for v in cks if v <= at_version]
        if not cks:
            return None
        with open(_checkpoint_path(self.path, cks[-1])) as f:
            return json.load(f)

    def _state_manifests(self, at_version: int | None = None):
        """Manifests newest-first, STOPPING at the newest checkpoint (whose
        payload — a fully resolved snapshot — is yielded last). Every state
        read built on this touches <= (commits since checkpoint) + 1 files
        regardless of total history length.

        Versions are claimed densely (parent + 1), so the walk descends
        arithmetically from the current version — no directory listing on
        the happy path. A missing manifest mid-walk (vacuum dropped a
        version between the checkpoint and the frontier under a
        non-default policy) falls back to the listing for the remainder.
        """
        ck = self._newest_checkpoint(at_version)
        ck_v = ck["version"] if ck else None
        top = (at_version if at_version is not None
               else current_committed_version(self.path))
        v = top if top is not None else 0
        while v >= 1 and (ck_v is None or v > ck_v):
            try:
                m = self.manifest(v)
            except FileNotFoundError:
                # vacuumed gap below the frontier: the listing knows
                # exactly which versions survive — walk those instead
                for lv in reversed(self.versions()):
                    if lv < v and (ck_v is None or lv > ck_v):
                        lm = self.manifest(lv)
                        yield lm
                        if lm["action"] == "restore":
                            return
                break
            yield m
            if m["action"] == "restore":
                # a restore commit carries the restored version's FULL
                # state (like a checkpoint): a key absent there was
                # absent in that state — walking past it would resurrect
                # a newer watermark/epoch the rollback discarded
                return
            v -= 1
        if ck is not None:
            yield ck

    def read(self, version: int | None = None,
             timestamp: float | None = None) -> DataFrame:
        """The table at ``version`` (default: latest), or as of
        ``timestamp`` (epoch seconds or datetime — resolved through
        :meth:`version_at`). Time travel is just reading an older
        manifest — no data was ever rewritten. Live deletion vectors
        (``delete_where``) are applied as an anti-join on the recorded
        key, scoped to the dirs each vector covers."""
        if timestamp is not None:
            if version is not None:
                raise ValueError("pass version or timestamp, not both")
            version = self.version_at(timestamp)
            if version is None:
                raise FileNotFoundError(
                    f"no commit at or before the requested timestamp "
                    f"at {self.path}")
        if version is None:
            version = self.current_version()
        if version is None:
            raise FileNotFoundError(f"no commits yet at {self.path}")
        m = self.manifest(version)
        return self._read_dirs_dv(m, m["dirs"], at_version=version)

    def _governed_read(self, paths: list[str],
                       at_version: int | None = None,
                       schema_json: str | None = None) -> DataFrame:
        """Read data paths under the schema RECORDED at ``at_version``
        (default: latest) — the one read shape that survives both
        additive evolution (old files fill the new columns with NULL)
        and type widening (old files' narrower parquet types promote on
        read; footer-merging would refuse the mixed widths). Callers
        holding the version's manifest pass its ``schema`` payload
        directly (an inherited state key — present on every post-stamp
        commit, so the read stays one manifest file); tables predating
        schema stamps fall back to mergeSchema."""
        if schema_json is not None:
            from pyspark.sql.types import StructType

            sch = StructType.fromJson(json.loads(schema_json))
        else:
            sch = self.schema(at_version)
        if sch is not None:
            from pyspark.sql.types import StructField, StructType

            relaxed = StructType([
                StructField(f.name, f.dataType, True, f.metadata)
                for f in sch.fields])
            return self.spark.read.schema(relaxed).parquet(*paths)
        return self.spark.read.option("mergeSchema", True).parquet(*paths)

    def _read_dirs_dv(self, m: dict, dirs: list[str],
                      at_version: int | None = None) -> DataFrame:
        """Read ``dirs`` of manifest ``m`` with its deletion vectors
        applied. Each DV records the dirs it COVERS (the table's dirs at
        delete time), so a key deleted once never suppresses a LATER
        append that legitimately reuses it: dirs are grouped by their
        applicable-DV set (at most n_dvs + 1 groups — compaction
        materializes and resets), each group anti-joined against the
        union of its DVs' key files. The DV side is a handful of small
        parquet files — AQE plans the anti-join as a broadcast."""
        from pyspark.sql import functions as F

        def plain(ds):
            # the recorded schema (as of the version being read): after an
            # on_drift='evolve' append, older dirs lack the new columns
            # (NULL-filled) or hold narrower pre-widening types (promoted).
            # m carries it inline (inherited state key) — no extra walk.
            return self._governed_read(
                [os.path.join(self.path, d) for d in ds], at_version,
                schema_json=m.get("schema"))

        dv = m.get("dv_dirs", [])
        if not dv or not dirs:
            return plain(dirs)
        dvm = m["dv_meta"]
        key = dvm[dv[0]]["key"]  # delete_where enforces one key per table
        covers = {v: set(dvm[v]["covers"]) for v in dv}
        groups: dict[tuple, list[str]] = {}
        for d in dirs:
            appl = tuple(v for v in dv if d in covers[v])
            groups.setdefault(appl, []).append(d)
        parts = []
        for appl, ds in groups.items():
            df = plain(ds)
            if appl:
                keys = (self.spark.read.parquet(
                    *[os.path.join(self.path, v) for v in appl])
                    .select(key).distinct())
                df = df.join(keys, key, "left_anti")
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

    def history(self) -> list[dict]:
        """One {version, action, n_dirs, ts} row per commit, ascending
        (``ts`` is the claim time; None on legacy manifests)."""
        return [
            {"version": v, "action": (m := self.manifest(v))["action"],
             "n_dirs": len(m["dirs"]), "ts": m.get("ts")}
            for v in self.versions()
        ]

    # ------------------------------------------- metadata-only aggregates

    def row_count(self, version: int | None = None) -> int:
        """Exact ``COUNT(*)`` at ``version`` — a pure manifest read (zero
        Spark jobs, zero data-file I/O) when every dir records its footer
        row count and every deletion vector records its key count; falls
        back to a real count otherwise (legacy dirs written before row
        recording). The count stays exact under DVs because delete_where
        enforces one live row per deleted key at delete time."""
        if version is None:
            version = self.current_version()
        if version is None:
            return 0
        m = self.manifest(version)
        meta = m.get("dir_meta", {})
        dvm = m.get("dv_meta", {})
        if (all("rows" in meta.get(d, {}) for d in m["dirs"])
                and all("rows" in dvm.get(d, {})
                        for d in m.get("dv_dirs", []))):
            return (sum(meta[d]["rows"] for d in m["dirs"])
                    - sum(dvm[d]["rows"] for d in m.get("dv_dirs", [])))
        return self.read(version).count()

    def stats_minmax(self, col: str,
                     version: int | None = None) -> tuple | None:
        """(min, max) of ``col`` at ``version`` from recorded per-dir
        stats alone, or None when not derivable from metadata — a dir
        without stats for the column, an empty table, or any deletion
        vector (a deleted row may have held the extremum, so the
        recorded bounds are only conservative). Callers fall back to a
        scan on None; a non-None answer is EXACT (per-dir bounds are
        true min/max of that dir's rows, and their fold covers every
        row)."""
        if version is None:
            version = self.current_version()
        if version is None:
            return None
        m = self.manifest(version)
        if m.get("dv_dirs"):
            return None
        meta = m.get("dir_meta", {})
        lo = hi = None
        for d in m["dirs"]:
            dm = meta.get(d, {})
            st = dict(dm.get("stats", {}))
            if "pk_min" in dm and dm.get("pk_col"):
                st.setdefault(dm["pk_col"], [dm["pk_min"], dm["pk_max"]])
            if col not in st:
                return None
            dlo, dhi = st[col]
            try:
                lo = dlo if lo is None or dlo < lo else lo
                hi = dhi if hi is None or dhi > hi else hi
            except TypeError:
                return None
        return None if lo is None else (lo, hi)

    def null_count(self, col: str, version: int | None = None) -> int | None:
        """Exact NULL count of ``col`` at ``version`` from the recorded
        per-dir null stats alone (zero data I/O), or None when any dir
        lacks them or deletion vectors are live (a deleted row may have
        been one of the NULLs)."""
        if version is None:
            version = self.current_version()
        if version is None:
            return 0
        m = self.manifest(version)
        if m.get("dv_dirs"):
            return None
        meta = m.get("dir_meta", {})
        total = 0
        for d in m["dirs"]:
            n = meta.get(d, {}).get("nulls", {}).get(col)
            if n is None:
                return None
            total += int(n)
        return total

    def approx_ndv(self, col: str, version: int | None = None) -> int | None:
        """Approximate COUNT(DISTINCT col) at ``version`` from recorded
        per-dir HLL sketches alone — no data-file reads. Sketches are
        MERGEABLE (the point of HLL): the per-dir states recorded by
        ``append(ndv_stats_cols=)`` / ``analyze(ndv_stats_cols=)`` union
        into the table-wide estimate in one tiny Spark job over n_dirs
        rows. None when any dir lacks a sketch for the column (caller
        falls back to a scan). With live deletion vectors the estimate
        covers PHYSICAL rows — an upper bound on the live NDV.

        ~2% standard error (Spark's default lgConfigK=12 datasketches
        HLL) — the planning-grade answer; at 100 TB the exact question
        is a full shuffle, this is n_dirs × ~2 KB of manifest bytes."""
        import base64

        from pyspark.sql import functions as F

        if version is None:
            version = self.current_version()
        if version is None:
            return None
        m = self.manifest(version)
        meta = m.get("dir_meta", {})
        sketches = []
        for d in m["dirs"]:
            b64 = meta.get(d, {}).get("ndv", {}).get(col)
            if b64 is None:
                return None
            sketches.append(base64.b64decode(b64))
        if not sketches:
            return 0
        df = self.spark.createDataFrame([(s,) for s in sketches],
                                        "s binary")
        est = df.agg(F.hll_sketch_estimate(
            F.hll_union_agg("s")).alias("e")).first()["e"]
        return int(est)

    def describe_detail(self, version: int | None = None) -> dict:
        """One metadata-only summary row (the Delta ``DESCRIBE DETAIL``
        analog): version, action, dir/file counts, exact row count when
        recorded (None otherwise — this method never scans), total bytes
        when recorded, and live DV count."""
        if version is None:
            version = self.current_version()
        if version is None:
            return {"version": None, "action": None, "n_dirs": 0,
                    "n_files": 0, "rows": 0, "bytes": 0, "n_dvs": 0}
        m = self.manifest(version)
        meta = m.get("dir_meta", {})
        dvm = m.get("dv_meta", {})
        have_rows = (all("rows" in meta.get(d, {}) for d in m["dirs"])
                     and all("rows" in dvm.get(d, {})
                             for d in m.get("dv_dirs", [])))
        return {
            "version": version,
            "action": m["action"],
            "n_dirs": len(m["dirs"]),
            "n_files": sum(len(meta.get(d, {}).get("files", []))
                           for d in m["dirs"]) or None,
            "rows": self.row_count(version) if have_rows else None,
            "bytes": (sum(meta[d]["bytes"] for d in m["dirs"])
                      if all("bytes" in meta.get(d, {}) for d in m["dirs"])
                      else None),
            "n_dvs": len(m.get("dv_dirs", [])),
        }

    def analyze(self, stats_cols: list[str],
                set_stats_cols: list[str] | None = None,
                ndv_stats_cols: list[str] | None = None) -> int | None:
        """Backfill per-dir skipping stats for dirs that lack them — the
        ``ANALYZE TABLE`` analog for tables written before stats were
        recorded (or with columns nobody listed at write time).

        Computes min/max (+ physical row count) for every dir missing
        any requested column in ONE Spark job (a union of per-dir
        aggregates — fan-in is bounded by the compaction policy), plus
        equality stats per (dir, set column) as separate small jobs,
        then commits the merged ``dir_meta`` as a METADATA-ONLY commit:
        action ``analyze``, dirs identical to the parent, pinned to the
        version the stats were computed from. Content is unchanged, so
        streaming consumers skip it like a compaction. Returns the new
        version, or None when every dir already records everything.

        Stats are computed over the dirs' PHYSICAL rows (deletion
        vectors not applied) — exactly what pruning judges and what
        ``row_count`` subtracts DV counts from."""
        import functools

        from pyspark.sql import functions as F

        base = self.current_version()
        if base is None:
            raise FileNotFoundError(f"no commits yet at {self.path}")
        m = self.manifest(base)
        meta = m.get("dir_meta", {})

        def missing(d: str) -> bool:
            dm = meta.get(d, {})
            st = dict(dm.get("stats", {}))
            if "pk_min" in dm and dm.get("pk_col"):
                st.setdefault(dm["pk_col"], [dm["pk_min"], dm["pk_max"]])
            return ("rows" not in dm
                    or any(c not in st for c in stats_cols)
                    or any(c not in dm.get("sets", {})
                           for c in set_stats_cols or [])
                    or any(c not in dm.get("ndv", {})
                           for c in ndv_stats_cols or []))

        need = [d for d in m["dirs"] if missing(d)]
        if not need:
            return None

        def dir_df(d: str):
            return self.spark.read.parquet(os.path.join(self.path, d))

        parts = []
        for d in need:
            aggs = [F.count(F.lit(1)).alias("__rows")]
            for c in stats_cols:
                aggs += [F.min(c).alias(f"__lo_{c}"),
                         F.max(c).alias(f"__hi_{c}"),
                         F.count(F.when(F.col(c).isNull(), 1))
                         .alias(f"__nl_{c}")]
            for c in ndv_stats_cols or []:
                aggs += [F.hll_sketch_agg(c).alias(f"__hll_{c}")]
            parts.append(dir_df(d).agg(*aggs)
                         .select(F.lit(d).alias("__dir"), "*"))
        collected = functools.reduce(
            lambda a, b: a.unionByName(b), parts).collect()
        new_meta: dict = {}
        for r in collected:
            d = r["__dir"]
            dm = dict(meta.get(d, {}))
            st = dict(dm.get("stats", {}))
            for c in stats_cols:
                lo, hi = _plain(r[f"__lo_{c}"]), _plain(r[f"__hi_{c}"])
                if lo is not None:
                    st[c] = [lo, hi]
            if st:
                dm["stats"] = st
            if stats_cols:
                dm["nulls"] = {**dm.get("nulls", {}),
                               **{c: int(r[f"__nl_{c}"])
                                  for c in stats_cols}}
            import base64 as _b64

            ndv = dict(dm.get("ndv", {}))
            for c in ndv_stats_cols or []:
                if r[f"__hll_{c}"] is not None:
                    ndv[c] = _b64.b64encode(r[f"__hll_{c}"]).decode()
            if ndv:
                dm["ndv"] = ndv
            dm["rows"] = int(r["__rows"])
            if "files" not in dm:
                dm["files"] = [
                    f for f in sorted(
                        os.listdir(os.path.join(self.path, d)))
                    if f.endswith(".parquet")]
            if "bytes" not in dm:
                dm["bytes"] = sum(
                    os.path.getsize(os.path.join(self.path, d, f))
                    for f in dm["files"])
            new_meta[d] = dm
        for d in need:
            for c in set_stats_cols or []:
                if c in new_meta[d].get("sets", {}):
                    continue
                s = self._set_stat(dir_df(d), c)
                if s is not None:
                    new_meta[d].setdefault("sets", {})[c] = s
        return self._commit("analyze", lambda parent: list(m["dirs"]),
                            max_retries=1, extra={"dir_meta": new_meta},
                            expected_parent=base)

    # --------------------------------------------------------------- writes

    def _write_data_dir(self, df: DataFrame,
                        sized: bool = True) -> tuple[str, dict]:
        """Write one commit dir; returns (rel_dir, file stats dict:
        files/rows/bytes). The file list is recorded in the commit's
        ``dir_meta`` so readers discover files from the MANIFEST alone —
        no LIST call on the data path at read time
        (object-store-friendly); one driver listdir + footer pass here,
        at write time, when the dir is known-complete."""
        rel = os.path.join(_DATA_DIR, f"c-{uuid.uuid4().hex}")
        out = os.path.join(self.path, rel)
        # ``sized=False`` preserves a partitioning the caller imposed
        # deliberately (range/zorder layouts — their file boundaries ARE
        # the data-skipping contract)
        (self._coalesced(df) if sized else df).write.parquet(out)
        return rel, _dir_file_stats(self.path, rel)

    def _coalesced(self, df: DataFrame) -> DataFrame:
        """Scale-adaptive writer parallelism: coalesce the commit to
        ~`_TARGET_FILE_BYTES` output files using Catalyst's plan-size
        estimate. A micro-batch append otherwise inherits the session's
        shuffle partitioning (e.g. 32) and writes that many KB-sized
        files per commit — task-scheduling plus commit-protocol overhead
        dominates maintained-state drains, and the file fan-in taxes
        every later read (guide §6: aim for 128 MB-1 GB files). The
        estimate derives from input statistics, so a TB-sized epoch keeps
        thousands of write tasks (coalesce never RAISES partition
        counts); a mis-estimate only shifts file sizes, never rows."""
        try:
            # analyzed-plan stats: the analyzed plan is already cached on
            # the DataFrame, while optimizedPlan() would run a whole
            # extra Catalyst pass per write just to read an estimate
            est = int(df._jdf.queryExecution().analyzed()
                      .stats().sizeInBytes())
        except Exception:
            return df
        n = max(1, min((est + _TARGET_FILE_BYTES - 1)
                       // _TARGET_FILE_BYTES, 1 << 20))
        return df.coalesce(int(n))

    def _commit(self, action: str, dirs_fn, max_retries: int = 20,
                extra: dict | None = None, expected_parent=_ANY) -> int:
        """Optimistic-concurrency commit loop.

        ``dirs_fn(parent_manifest | None) -> list[dirs]`` builds the new
        version's dir list from the CURRENT parent; on a lost race the
        parent is re-read and the list rebuilt (append semantics compose
        under rebase; overwrite ignores the parent so its retry simply
        re-claims the next version).

        ``extra`` may be a dict (fixed payload fields) or a CALLABLE
        ``extra_fn(parent_manifest | None) -> dict`` re-evaluated on every
        claim attempt — required when a payload field is derived from
        table state (e.g. the schema stamp the format writers govern):
        a rebase retry must re-derive it against the NEW parent, or a
        concurrent writer's evolution is silently overridden by the
        stale pre-race copy.

        ``expected_parent`` pins the commit to the version its CONTENT was
        derived from: overwrite-action commits (compact/merge/repair) read
        the table, rewrite it, and commit — if another writer lands
        between the read and the claim, blindly claiming parent+1 would
        silently drop the racer's rows while inheriting its state keys
        (watermark/epoch), permanently losing data on the next sync. With
        the pin, a moved parent raises :class:`CommitConflict` instead.
        """
        for _ in range(max_retries):
            parent = self.current_version()
            if expected_parent is not _ANY and parent != expected_parent:
                raise CommitConflict(
                    f"{action} at {self.path}: table advanced from version "
                    f"{expected_parent} to {parent} after this commit's "
                    "content was derived; committing would silently drop "
                    "the interleaved writer's rows — re-derive and retry"
                )
            pm = self.manifest(parent) if parent is not None else None
            # Table-level state (sync watermark, streaming epoch identity,
            # wipe record, schema) is inherited by every commit unless the
            # commit overrides it: content-preserving commits (compact,
            # repair) must not orphan it, or a later vacuum of the older
            # manifests would reset the watermark/epoch and make the next
            # sync/replay DUPLICATE rows.
            if action == "restore":
                # restore's extra IS the restored version's full state —
                # inheriting the parent's would resurrect keys (a newer
                # watermark, live DVs) the target version never carried
                inherited = {}
            else:
                inherited = {k: pm[k] for k in _STATE_KEYS
                             if pm and k in pm}
                if action in _DV_CARRY_ACTIONS and pm:
                    # deletion vectors follow the data dirs they cover
                    # (see _DV_KEYS note); content-rewriting actions
                    # drop them
                    inherited.update(
                        {k: pm[k] for k in _DV_KEYS if k in pm})
            # dirs_fn FIRST: it carries the guards that turn a racer into
            # a graceful outcome (sync_audit's watermark conflict, the
            # stream writer's already-applied-epoch skip) — a callable
            # extra's own failure mode (e.g. schema governance refusing)
            # must not shadow them
            dirs = dirs_fn(pm)
            ex = extra(pm) if callable(extra) else (extra or {})
            payload = {
                **inherited,
                **ex,
                "version": parent + 1 if parent is not None else 1,
                "parent": parent,
                "action": action,
                # claim time (epoch seconds) — the commit's public
                # timestamp, enabling TIMESTAMP AS OF time travel. Claim
                # order == version order, but wall clocks may jitter
                # across writers; version_at() resolves monotonically
                "ts": time.time(),
                "dirs": dirs,
            }
            # record the dirs THIS commit introduced (the commit's delta at
            # file granularity) — the streaming source reads exactly these
            # per consumed version, without needing the parent manifest to
            # still exist (it may be vacuumed)
            prev_dirs = set(pm["dirs"]) if pm else set()
            payload["added"] = [d for d in payload["dirs"]
                                if d not in prev_dirs]
            # carry per-dir metadata forward for dirs that survive this
            # commit (an overwrite's filter naturally drops the parent's)
            merged = {**(pm.get("dir_meta", {}) if pm else {}),
                      **payload.get("dir_meta", {})}
            merged = {d: m for d, m in merged.items() if d in payload["dirs"]}
            if merged:
                payload["dir_meta"] = merged
            if self.claim_backend.publish(self.path, payload["version"],
                                          payload):
                _write_last_pointer(self.path, payload["version"])
                self._maybe_checkpoint(payload["version"], payload)
                return payload["version"]
        raise CommitConflict(
            f"{action} at {self.path} lost {max_retries} consecutive commit "
            "race(s); another writer committed first"
        )

    def _maybe_checkpoint(self, version: int, payload: dict) -> None:
        """Best-effort roll-up write after a claimed commit. Only version
        N*interval's committer writes ckpt-N*interval (its payload is that
        version's manifest verbatim, so a re-write is byte-identical);
        atomic os.replace means readers never see a torn checkpoint, and a
        failed/skipped write only costs a longer state walk."""
        import contextlib

        if not self.checkpoint_interval or version % self.checkpoint_interval:
            return
        final = _checkpoint_path(self.path, version)
        with contextlib.suppress(OSError):
            fd, tmp = tempfile.mkstemp(dir=os.path.dirname(final),
                                       prefix=".ckpt_")
            try:
                with os.fdopen(fd, "w") as f:
                    json.dump(payload, f)
                os.replace(tmp, final)
            except OSError:
                os.unlink(tmp)

    def _set_stat(self, df: DataFrame, col: str) -> dict | None:
        """Equality-skipping stat for one column over one commit dir's
        rows: the exact distinct-value list when small (<= _SET_STAT_MAX
        — one LIMITed distinct job), else a Bloom bitmap whose bit
        positions are computed DISTRIBUTED (md5 of the string form,
        _BLOOM_K 32-bit words mod _BLOOM_M) and collected as at most
        _BLOOM_M distinct positions — the driver never sees values, only
        a bounded bitmap. Supported for string/integer columns (both
        engines' string canon agrees there); None for an all-NULL dir."""
        from pyspark.sql import functions as F

        vals = (df.select(F.col(col).cast("string").alias("v"))
                .where(F.col("v").isNotNull())
                .distinct().limit(_SET_STAT_MAX + 1).collect())
        if not vals:
            return None
        if len(vals) <= _SET_STAT_MAX:
            return {"set": sorted(r["v"] for r in vals)}
        h = F.md5(F.col(col).cast("string"))
        poss = F.array(*[
            F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("long")
            % F.lit(_BLOOM_M)
            for i in range(_BLOOM_K)])
        pos_rows = (df.select(F.explode(poss).alias("p"))
                    .where(F.col("p").isNotNull())
                    .distinct().collect())
        bits = bytearray(_BLOOM_M // 8)
        for r in pos_rows:
            p = int(r["p"])
            bits[p // 8] |= 1 << (p % 8)
        return {"bloom": {"m": _BLOOM_M, "k": _BLOOM_K, "hex": bits.hex()}}

    def constraints(self, at_version: int | None = None) -> dict:
        """The table's live CHECK constraints {name: sql_expr} (state
        key — one walk resolves the full map)."""
        for m in self._state_manifests(at_version):
            if "constraints" in m:
                return dict(m["constraints"])
        return {}

    def add_constraint(self, name: str, expr: str,
                       validate: bool = True) -> int:
        """ALTER TABLE ADD CONSTRAINT (the Delta CHECK pattern): every
        current and future row must satisfy SQL predicate ``expr``
        (NULL passes, per SQL CHECK semantics — spell NOT NULL as
        ``"col IS NOT NULL"``). Existing content is validated first
        (one counting aggregate; ``validate=False`` skips for
        known-clean bulk adoption). The commit is metadata-only
        (action "alter", dirs carried verbatim — streams skip it like
        a compaction) and the map is table state: it inherits through
        every commit and rolls back with RESTORE.

        Enforcement: every Python-API write path (append / overwrite /
        range layouts / merge_into / merge_audit deltas) counts
        violations in one extra aggregate per write and REFUSES with
        :class:`ConstraintViolation` — rows never land. The registered
        Spark-format write path does not enforce (its rows stream
        through executors; validate after with ``verify_constraints``).
        """
        if name in self.constraints():
            raise ValueError(f"constraint {name!r} already exists; "
                             "drop_constraint first")
        if validate and self.current_version() is not None:
            self._enforce_constraints(self.read(), {name: expr})

        def extra_fn(parent):
            return {"constraints": {
                **((parent or {}).get("constraints", {})), name: expr}}

        return self._commit(
            "alter", lambda parent: list(parent["dirs"]) if parent else [],
            extra=extra_fn)

    def drop_constraint(self, name: str) -> int:
        if name not in self.constraints():
            raise ValueError(f"no constraint {name!r} on {self.path}")

        def extra_fn(parent):
            cs = {**((parent or {}).get("constraints", {}))}
            cs.pop(name, None)
            return {"constraints": cs}

        return self._commit(
            "alter", lambda parent: list(parent["dirs"]) if parent else [],
            extra=extra_fn)

    def verify_constraints(self, version: int | None = None) -> dict:
        """Violation count per live constraint over the table content —
        the audit for writes that bypassed enforcement (format path,
        adopted data). All constraints count in ONE aggregate."""
        cs = self.constraints(at_version=version)
        if not cs:
            return {}
        from pyspark.sql import functions as F

        r = self.read(version).agg(*[
            F.sum((~F.coalesce(F.expr(e), F.lit(True))).cast("long"))
            .alias(n) for n, e in cs.items()]).first()
        return {n: int(r[n] or 0) for n in cs}

    def _enforce_constraints(self, df: DataFrame, cs: dict | None = None):
        """Refuse ``df`` if any row violates a live constraint. One
        counting aggregate for ALL constraints; zero cost when the
        table has none (the common case — no job is launched)."""
        from pyspark.sql import functions as F

        if cs is None:
            cs = self.constraints()
        if not cs:
            return
        r = df.agg(*[
            F.sum((~F.coalesce(F.expr(e), F.lit(True))).cast("long"))
            .alias(n) for n, e in cs.items()]).first()
        bad = {n: int(r[n] or 0) for n in cs if int(r[n] or 0) > 0}
        if bad:
            detail = ", ".join(
                f"{n} ({cs[n]!r}): {c} row(s)" for n, c in bad.items())
            raise ConstraintViolation(
                f"write to {self.path} violates CHECK constraint(s) "
                f"{detail} — no rows were committed")

    def txn_version(self, app_id: str) -> int | None:
        """Newest idempotent-transaction version recorded for ``app_id``
        (``append(txn_app_id=, txn_version=)``), or None. The ``txns``
        map is a state key — it inherits through every commit, so one
        state walk resolves it."""
        for m in self._state_manifests():
            if "txns" in m:
                v = m["txns"].get(app_id)
                return int(v) if v is not None else None
        return None

    def append(self, df: DataFrame, extra: dict | None = None,
               pk_range_col: str | None = None,
               stats_cols: list[str] | None = None,
               set_stats_cols: list[str] | None = None,
               ndv_stats_cols: list[str] | None = None,
               on_drift: str = "fail",
               txn_app_id: str | None = None,
               txn_version: int | None = None) -> int | None:
        """Commit ``df``'s rows as a new version on top of the current one.
        Returns the committed version. Safe under concurrent appends: data
        is written once, and only the (cheap) manifest claim retries.
        ``extra`` fields ride in the manifest payload — atomic with the
        data (this is what makes the CDC watermark exactly-once below).
        ``pk_range_col`` records the dir's min/max of that column in the
        manifest (one small aggregate), enabling ``read_since`` pruning.
        ``stats_cols`` additionally records per-dir min/max for those
        columns (one combined aggregate), enabling :meth:`read_pruned`'s
        manifest-level data skipping on ANY recorded column — the
        Delta/Iceberg per-file-stats pattern at dir granularity.
        ``set_stats_cols`` records equality-skipping stats (exact
        distinct set or Bloom bitmap, see :meth:`_set_stat`) for
        string/integer columns whose min/max range is too loose to
        prune on — at the cost of 1-2 extra small jobs per listed
        column. ``ndv_stats_cols`` records a mergeable HLL sketch per
        column (rides in the same aggregate — no extra job), enabling
        :meth:`approx_ndv`'s metadata-only distinct counts.

        ``txn_app_id``/``txn_version`` make the append IDEMPOTENT (the
        Delta txn pattern for foreachBatch / retried batch jobs): a pair
        already recorded at or above ``txn_version`` skips without
        committing (returns None) — checked cheaply up front AND
        re-checked inside the claim loop against the actual rebase
        parent, so two racing writers replaying the same batch commit it
        exactly once (the loser removes its orphan data dir). Versions
        per app must be monotone, exactly like streaming epochs."""
        if (txn_app_id is None) != (txn_version is None):
            raise ValueError(
                "txn_app_id and txn_version come as a pair")
        if txn_app_id is not None:
            txn_version = int(txn_version)
            last = self.txn_version(txn_app_id)
            if last is not None and last >= txn_version:
                return None  # already durable — zero work, no commit
        prep = self.prepare_append(
            df, pk_range_col=pk_range_col, stats_cols=stats_cols,
            set_stats_cols=set_stats_cols, ndv_stats_cols=ndv_stats_cols,
            on_drift=on_drift)
        if txn_app_id is None:
            return self.commit_prepared(prep, extra=extra)
        rel = prep["rel"]
        extra = {**(extra or {}), "schema": prep["schema"],
                 "dir_meta": {rel: prep["meta"]}}

        def dirs_fn(parent):
            pt = (parent or {}).get("txns", {})
            if txn_app_id in pt and int(pt[txn_app_id]) >= txn_version:
                raise _TxnApplied()  # racer replayed the same batch first
            return (parent["dirs"] if parent else []) + [rel]

        def extra_fn(parent):
            return {**extra,
                    "txns": {**((parent or {}).get("txns", {})),
                             txn_app_id: txn_version}}

        try:
            return self._commit("append", dirs_fn, extra=extra_fn)
        except _TxnApplied:
            self.abandon_prepared(prep)
            return None

    def prepare_append(self, df: DataFrame,
                       pk_range_col: str | None = None,
                       stats_cols: list[str] | None = None,
                       set_stats_cols: list[str] | None = None,
                       ndv_stats_cols: list[str] | None = None,
                       on_drift: str = "fail") -> dict:
        """The Spark-job half of :meth:`append` — write the commit's data
        dir and derive its stats WITHOUT claiming a version. Split out so
        a caller with several INDEPENDENT commits (a maintained-state
        epoch appends to two or three tables whose contents all derive
        from state pinned before the epoch) can overlap their write jobs
        from driver threads (guide §2.6) while the manifest claims stay
        strictly ordered via :meth:`commit_prepared`. The written dir is
        invisible until its claim links a manifest, so a failure or crash
        between the halves leaves table semantics untouched (the orphan
        dir is reclaimed by ``vacuum``; on a handled failure call
        :meth:`abandon_prepared`). Thread-safe: per-commit-dir work plus
        read-only manifest lookups only."""
        from pyspark.sql import functions as F

        df = self._check_drift(df, on_drift)
        self._enforce_constraints(df)
        meta: dict = {}
        # Write FIRST, derive stats from the result: the parquet footers
        # already carry exact per-column min/max, null and row counts
        # (_dir_file_stats — one driver-side tail read per file), so the
        # old up-front stats aggregate — a full extra evaluation of the
        # (often join+window-shaped) lineage per commit, plus a persist
        # to amortize it — is pure overhead for footer-covered columns.
        # Whatever the footers cannot cover (string bounds — parquet may
        # truncate those — NaN-poisoned doubles, HLL sketches) rides the
        # write job itself as OBSERVED metrics (CollectMetrics): the
        # aggregates evaluate on exactly the rows being written, during
        # the write, so no second job and no cache to manage. Metrics
        # are requested for every candidate column up front (which ones
        # the footers cover is only known post-write); footer values
        # still win on overlap, and the observation is the fallback.
        # Only _set_stat (bounded distinct/Bloom) still reads back.
        obs = None
        obs_exprs = []
        if pk_range_col is not None:
            obs_exprs += [F.min(pk_range_col).alias("__pk_lo"),
                          F.max(pk_range_col).alias("__pk_hi")]
        for c in stats_cols or []:
            obs_exprs += [F.min(c).alias(f"__lo_{c}"),
                          F.max(c).alias(f"__hi_{c}"),
                          F.count(F.when(F.col(c).isNull(), 1))
                          .alias(f"__nl_{c}")]
        for c in ndv_stats_cols or []:
            obs_exprs += [F.hll_sketch_agg(c).alias(f"__hll_{c}")]
        if obs_exprs:
            from pyspark.sql import Observation

            obs = Observation(f"__append_stats_{uuid.uuid4().hex}")
            df = df.observe(obs, *obs_exprs)
        rel, fstats = self._write_data_dir(df)
        foot = dict(fstats.get("stats", {}))
        foot_nulls = fstats.pop("nulls", {})
        back = None  # lazily-built read-back frame over the written dir

        def read_back() -> DataFrame:
            nonlocal back
            if back is None:
                back = self.spark.read.schema(df.schema).parquet(
                    os.path.join(self.path, rel))
            return back

        pk_from_foot = (pk_range_col is not None and pk_range_col in foot
                        and isinstance(foot[pk_range_col][0], int))
        if pk_from_foot:
            meta.update(pk_min=int(foot[pk_range_col][0]),
                        pk_max=int(foot[pk_range_col][1]),
                        pk_col=pk_range_col)
        res_stats = [c for c in stats_cols or []
                     if c not in foot or c not in foot_nulls]
        stats = {c: foot[c] for c in stats_cols or [] if c in foot}
        nulls = {c: int(foot_nulls[c]) for c in stats_cols or []
                 if c in foot_nulls}
        if ((pk_range_col is not None and not pk_from_foot)
                or res_stats or ndv_stats_cols):
            r = obs.get  # already collected — metrics rode the write job
            if (pk_range_col is not None and not pk_from_foot
                    and r["__pk_lo"] is not None):
                meta.update(pk_min=int(r["__pk_lo"]),
                            pk_max=int(r["__pk_hi"]),
                            pk_col=pk_range_col)
            for c in res_stats:
                if _plain(r[f"__lo_{c}"]) is not None:
                    stats[c] = [_plain(r[f"__lo_{c}"]),
                                _plain(r[f"__hi_{c}"])]
                nulls[c] = int(r[f"__nl_{c}"])
            import base64 as _b64

            ndv = {c: _b64.b64encode(r[f"__hll_{c}"]).decode()
                   for c in ndv_stats_cols or []
                   if r[f"__hll_{c}"] is not None}
            if ndv:
                meta["ndv"] = ndv
        if stats_cols:
            # per-dir null counts (the Delta nullCount stat):
            # IsNull/IsNotNull pruning + metadata null totals
            meta["nulls"] = nulls
        sets = {c: s for c in set_stats_cols or []
                if (s := self._set_stat(read_back(), c)) is not None}
        if sets:
            meta["sets"] = sets
        # footer-derived column stats underlay the stats_cols-requested
        # ones (both exact; explicit stats_cols win on overlap)
        fstats.pop("stats", None)
        if foot or stats:
            meta["stats"] = {**foot, **stats}
        meta.update(fstats)
        return {"rel": rel, "meta": meta, "schema": df.schema.json()}

    def commit_prepared(self, prep: dict, extra: dict | None = None) -> int:
        """Claim a :meth:`prepare_append` result as the next version: the
        driver-I/O half of :meth:`append` (no Spark jobs — the optimistic
        manifest-link loop only)."""
        extra = {**(extra or {}), "schema": prep["schema"],
                 "dir_meta": {prep["rel"]: prep["meta"]}}
        return self._commit(
            "append",
            lambda parent: (parent["dirs"] if parent else [])
            + [prep["rel"]],
            extra=extra,
        )

    def abandon_prepared(self, prep: dict) -> None:
        """Remove a prepared-but-unclaimed commit dir — failure cleanup
        for callers that will never :meth:`commit_prepared` it (a crashed
        process's orphan is equally invisible; ``vacuum`` reclaims it)."""
        shutil.rmtree(os.path.join(self.path, prep["rel"]),
                      ignore_errors=True)

    def _check_drift(self, df: DataFrame, on_drift: str) -> DataFrame:
        """Appended batches must match the table schema; ``on_drift=
        'evolve'`` admits the additive case (historical rows read NULL for
        the new columns) AND lossless type widenings (int→bigint,
        float→double, … — historical dirs re-read exactly under the wider
        type because every manifest read passes the recorded schema
        explicitly); removed/other-type-changed columns always refuse.

        Returns the batch to commit: when the TABLE is already wider than
        the batch (an old writer still sending the narrow type after an
        evolve), the batch is up-cast in place — lossless, and the commit
        then restamps the same wide schema instead of narrowing it."""
        from cdc_audit_spark.schema import (
            SchemaDriftError,
            classify_schema_drift,
            evolve_schema,
            is_widening,
        )

        existing = self.schema()
        if existing is None:
            return df  # first commit sets the schema
        drift = classify_schema_drift(existing, df.schema)
        # batch narrower than table: reverse-widenings up-cast silently
        # (they are not drift — the table schema doesn't move)
        if drift["changed"]:
            old_by = {f.name: f.dataType for f in existing.fields}
            new_by = {f.name: f.dataType.simpleString() for f in df.schema.fields}
            narrow = [n for n in drift["changed"]
                      if is_widening(new_by[n], old_by[n].simpleString())]
            if narrow:
                from pyspark.sql import functions as F

                df = df.withColumns(
                    {n: F.col(n).cast(old_by[n]) for n in narrow})
                drift = classify_schema_drift(existing, df.schema)
        if not (drift["added"] or drift["removed"] or drift["changed"]
                or drift["widened"]):
            return df
        if on_drift == "fail":
            raise SchemaDriftError(
                f"schema drift vs manifest table {self.path}: {drift} "
                "(pass on_drift='evolve' to admit additive/widening drift)"
            )
        if on_drift != "evolve":
            raise ValueError(
                f"on_drift must be 'fail' or 'evolve', got {on_drift!r}")
        evolve_schema(existing, df.schema, allow_widening=True)
        return df

    def schema(self, at_version: int | None = None):
        """The table's committed schema as of ``at_version`` (default:
        latest; from the newest commit at or before it that recorded one),
        or None before the first commit."""
        from pyspark.sql.types import StructType

        for m in self._state_manifests(at_version):
            if "schema" in m:
                return StructType.fromJson(json.loads(m["schema"]))
        return None

    def overwrite(self, df: DataFrame, extra: dict | None = None,
                  base_version: int | None = _ANY,
                  action: str = "overwrite",
                  sized: bool = True) -> int:
        """Commit ``df`` as the table's entire new content. Raises
        :class:`CommitConflict` if any other writer commits concurrently —
        last-writer-wins must be an explicit caller decision, not a silent
        race outcome.

        ``base_version`` is the version ``df``'s content was derived from
        (compact/merge/repair pass the version they read); the commit
        refuses if the table has moved past it, covering the whole
        read→rewrite→claim window, not just the final claim race. By
        default the current version at call entry is captured, which
        still covers the (long) data-write phase.

        ``action`` is what the manifest records; merge_audit passes
        "merge" so streaming consumers can distinguish a replica merge
        (whose rewritten content hides genuinely new rows) from a pure
        rewrite like compaction — actions must reflect SEMANTICS, not
        the write strategy, or the stream source mis-skips.
        """
        if base_version is _ANY:
            base_version = self.current_version()
        self._enforce_constraints(df)
        rel, fstats = self._write_data_dir(df, sized=sized)
        return self._commit(action, lambda parent: [rel], max_retries=1,
                            extra={**(extra or {}),
                                   "schema": df.schema.json(),
                                   "dir_meta": {rel: fstats}},
                            expected_parent=base_version)

    def overwrite_clustered(self, df: DataFrame, key: str,
                            n_dirs: int = 16,
                            extra: dict | None = None,
                            base_version: int | None = _ANY,
                            action: str = "overwrite") -> int:
        """:meth:`overwrite`, but the new content lands as up to
        ``n_dirs`` DISJOINT ``key``-range dirs with recorded per-dir
        min/max — the fold/compaction write for LSM state tables whose
        readers filter on ``key`` (a term-clustered postings index, an
        id-clustered norms table): after the fold, ``read_pruned_eq(key,
        points)`` lists only the dirs whose range covers a point, never
        the whole state. Integer keys use the quantile range layout
        (recorded ``pk_col`` ranges — also what ``read_pruned_for_keys``
        prunes on); any ordered type (strings included) uses a
        range-partitioned write whose bucket stats land as plain column
        stats. Same conflict contract as :meth:`overwrite`."""
        from pyspark.sql import functions as F

        if base_version is _ANY:
            base_version = self.current_version()
        self._enforce_constraints(df)
        if dict(df.dtypes).get(key) in ("int", "bigint", "long",
                                        "short", "byte"):
            dirs, meta = self._write_range_dirs(df, key, n_dirs)
            return self._commit(action, lambda parent: dirs,
                                max_retries=1,
                                extra={**(extra or {}),
                                       "schema": df.schema.json(),
                                       "dir_meta": meta},
                                expected_parent=base_version)
        # range-partition on the (orderable) key; each task holds exactly
        # one range, so its partition id IS the bucket. The per-bucket
        # min/max is read back from the WRITTEN files (one small job) —
        # never recomputed from the input lineage, whose range sampling
        # need not reproduce across evaluations.
        ranged = (df.repartitionByRange(max(1, n_dirs), F.col(key))
                  .withColumn("__bucket", F.spark_partition_id()))
        rel = os.path.join(_DATA_DIR, f"c-{uuid.uuid4().hex}")
        out = os.path.join(self.path, rel)
        (ranged.sortWithinPartitions(key)
         .write.partitionBy("__bucket")
         .parquet(out))
        if not any(nm.startswith("__bucket=") for nm in os.listdir(out)):
            # an emptied state (e.g. the fold of an all-deleted LSM)
            # commits as a zero-dir overwrite, not a schema-less read
            return self._commit(action, lambda parent: [], max_retries=1,
                                extra={**(extra or {}),
                                       "schema": df.schema.json(),
                                       "dir_meta": {}},
                                expected_parent=base_version)
        stats_rows = (self.spark.read.parquet(out)
                      .groupBy("__bucket")
                      .agg(F.min(key).alias("__lo"),
                           F.max(key).alias("__hi"))
                      .collect())
        dirs, meta = [], {}
        for r in sorted(stats_rows, key=lambda r: int(r["__bucket"])):
            d = f"{rel}/__bucket={int(r['__bucket'])}"
            dirs.append(d)
            fs = _dir_file_stats(self.path, d)
            st = fs.pop("stats", {})
            if _plain(r["__lo"]) is not None:
                st[key] = [_plain(r["__lo"]), _plain(r["__hi"])]
            meta[d] = {"stats": st, **fs} if st else fs
        return self._commit(action, lambda parent: dirs, max_retries=1,
                            extra={**(extra or {}),
                                   "schema": df.schema.json(),
                                   "dir_meta": meta},
                            expected_parent=base_version)

    def compact(self, pk_cols: list[str] | None = None,
                keep_last_only: bool = False,
                extra: dict | None = None,
                range_by: list[str] | None = None,
                zorder_by: list[str] | None = None,
                n_files: int | None = None) -> int:
        """Commit a compacted rewrite of the current content.

        Default: a semantic no-op that folds many appended dirs into one
        (shrinks read fan-in). With ``keep_last_only`` the rewrite applies
        the audit-log wipe semantics of ``compact.compact_log`` — keep the
        max-audit_pk row globally, or per key with ``pk_cols`` — as a
        TRANSACTIONAL commit: the pre-wipe version stays readable (and
        time-travelable) instead of being destroyed by an in-place
        overwrite, which is exactly the upgrade compact_log's docstring
        promises a transactional format would buy.

        ``range_by`` additionally lays the rewrite out for data skipping
        (operators.bucketing.write_range_sorted's contract): rows are
        range-partitioned into ``n_files`` disjoint key ranges and sorted
        within each, so every parquet footer carries tight min/max on the
        key and later filtered scans prune whole files — compaction is
        the natural moment to buy that layout, since the rewrite shuffles
        anyway. ``zorder_by`` is the multi-key variant (Morton-key
        interleaving, operators.bucketing.zorder_value): tight footer
        stats on ALL listed columns at once, pruning scans filtered on
        any subset of them.
        """
        if range_by and zorder_by:
            raise ValueError("pass range_by or zorder_by, not both")
        base = self.current_version()
        df = self.read(base)
        if keep_last_only or pk_cols:
            from cdc_audit_spark.compact import keep_last, keep_last_per_key

            df = keep_last_per_key(df, pk_cols) if pk_cols else keep_last(df)
        n = n_files or self.spark.sparkContext.defaultParallelism
        if range_by:
            df = (df.repartitionByRange(n, *range_by)
                  .sortWithinPartitions(*range_by))
        elif zorder_by:
            from pyspark.sql import functions as F

            from cdc_audit_spark.operators.bucketing import zorder_value

            stats = df.agg(
                *[F.min(c).cast("long").alias(f"lo_{c}") for c in zorder_by],
                *[F.max(c).cast("long").alias(f"hi_{c}") for c in zorder_by],
            ).first()
            z = zorder_value(
                [F.col(c) for c in zorder_by],
                [stats[f"lo_{c}"] for c in zorder_by],
                [stats[f"hi_{c}"] for c in zorder_by],
            )
            df = (df.withColumn("__z", z)
                  .repartitionByRange(n, "__z")
                  .sortWithinPartitions("__z")
                  .drop("__z"))
        return self.overwrite(df, extra=extra, base_version=base,
                              sized=not (range_by or zorder_by))

    def optimize(self, cluster_by: list[str], n_dirs: int = 32,
                 bits: int = 8, extra: dict | None = None) -> int:
        """Transactional clustered rewrite WITH manifest-level skipping —
        what ``compact(range_by=/zorder_by=)`` buys at the parquet-footer
        level, lifted to the manifest: the rewrite lands as up to
        ``n_dirs`` separate dirs, clustered on ``cluster_by`` (range
        order for one column, Morton/Z-order for several), each dir
        recording tight min/max stats for EVERY cluster column — so
        :meth:`read_pruned` / :meth:`dirs_pruned` skip whole dirs for a
        filter on ANY subset of the cluster columns without opening a
        single parquet footer. Deletion vectors are materialized by the
        rewrite (the content is the DV-applied read), so the commit also
        clears them.

        A single INTEGER cluster column additionally records the dirs'
        ``pk_col`` ranges, keeping the layout compatible with
        ``merge_audit(pruned=True)``'s dir-granular MERGE — optimize on
        the merge key re-tightens a fragmented replica without costing
        the next merge a full rewrite.

        One quantile pass + one write job + one per-dir stats aggregate.
        Concurrency: a chain of plain APPENDS landing during the rewrite
        is rebased over (their added dirs ride along un-clustered — the
        next optimize folds them in); any other interleaved commit
        raises :class:`CommitConflict`."""
        from pyspark.sql import functions as F
        from pyspark.storagelevel import StorageLevel

        if not cluster_by:
            raise ValueError("cluster_by must name at least one column")
        base = self.current_version()
        if base is None:
            raise FileNotFoundError(f"no commits yet at {self.path}")
        df = self.read(base)
        numeric = ("byte", "short", "int", "bigint", "long", "float",
                   "double", "date", "timestamp", "timestamp_ntz")
        bad = [c for c, t in df.dtypes if c in cluster_by
               and t not in numeric and not t.startswith("decimal")]
        if bad:
            raise ValueError(
                f"optimize cluster_by columns must be numeric or "
                f"date/timestamp (range/Morton clustering), got {bad}")
        if len(cluster_by) == 1:
            ck = F.col(cluster_by[0]).cast("double")
        else:
            from cdc_audit_spark.operators.bucketing import zorder_value

            g = df.agg(*[F.min(c).cast("long").alias(f"lo_{c}")
                         for c in cluster_by],
                       *[F.max(c).cast("long").alias(f"hi_{c}")
                         for c in cluster_by]).first()
            ck = zorder_value([F.col(c) for c in cluster_by],
                              [g[f"lo_{c}"] for c in cluster_by],
                              [g[f"hi_{c}"] for c in cluster_by],
                              bits).cast("double")
        df = df.withColumn("__ck", ck).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            bounds = [] if n_dirs <= 1 else sorted(set(
                df.approxQuantile("__ck",
                                  [i / n_dirs for i in range(1, n_dirs)],
                                  0.001)))
            bucket = F.lit(0)
            for b in bounds:
                bucket = bucket + (F.col("__ck") >= F.lit(b)).cast("int")
            rel = os.path.join(_DATA_DIR, f"c-{uuid.uuid4().hex}")
            (df.withColumn("__bucket", bucket)
               .repartition("__bucket")
               .sortWithinPartitions("__ck")
               .drop("__ck")
               .write.partitionBy("__bucket")
               .parquet(os.path.join(self.path, rel)))
            stats_rows = (df.withColumn("__bucket", bucket)
                          .groupBy("__bucket")
                          .agg(F.count(F.lit(1)).alias("__rows"),
                               *[a for c in cluster_by
                                 for a in (F.min(c).alias(f"__lo_{c}"),
                                           F.max(c).alias(f"__hi_{c}"))])
                          .collect())
        finally:
            df.unpersist()
        dirs, meta = [], {}
        int_key = len(cluster_by) == 1
        for r in sorted(stats_rows, key=lambda r: int(r["__bucket"])):
            d = f"{rel}/__bucket={int(r['__bucket'])}"
            dirs.append(d)
            st = {c: [_plain(r[f"__lo_{c}"]), _plain(r[f"__hi_{c}"])]
                  for c in cluster_by
                  if _plain(r[f"__lo_{c}"]) is not None}
            fs = _dir_file_stats(self.path, d)
            # footer stats underlay the exact cluster-key aggregates
            dm = {"stats": {**fs.pop("stats", {}), **st}, **fs}
            lo, hi = (r[f"__lo_{cluster_by[0]}"],
                      r[f"__hi_{cluster_by[0]}"])
            if int_key and isinstance(lo, int) and not isinstance(lo, bool):
                dm.update(pk_min=int(lo), pk_max=int(hi),
                          pk_col=cluster_by[0])
            meta[d] = dm
        def dirs_fn(parent):
            # Content-preserving rewrites need not lose the race to
            # plain appends: a commit chain of pure appends past ``base``
            # only ADDED dirs, so the optimized dirs plus those deltas
            # is still the exact current content (appends carry no DVs
            # of their own, and any vector live at ``base`` covered only
            # the dirs this rewrite replaced). Anything else interleaved
            # (delete/merge/overwrite/another optimize) changed rows
            # this rewrite doesn't reflect — surface CommitConflict.
            added: list[str] = []
            v = parent["version"] if parent else None
            while v is not None and v != base:
                m_i = self.manifest(v)
                if m_i["action"] not in ("append", "analyze"):
                    raise CommitConflict(
                        f"optimize at {self.path}: a non-append commit "
                        f"(version {v}, {m_i['action']}) landed after "
                        f"the rewrite's base {base}; re-run optimize")
                added = m_i.get("added", []) + added
                v = m_i.get("parent")
            return dirs + added

        return self._commit(
            "optimize", dirs_fn, max_retries=5,
            extra={**(extra or {}), "dir_meta": meta})  # schema inherits

    def compact_small(self, target_bytes: int = 128 << 20,
                      min_group: int = 2) -> int | None:
        """Bin-pack SMALL dirs into ~``target_bytes`` dirs, leaving
        right-sized dirs untouched — the auto-compaction pattern. A
        micro-batch producer lands one small dir per tick; a full
        ``compact()`` pays an O(table) rewrite to fix that, this pays
        O(small dirs) only: each greedy group (manifest order) is read
        once and rewritten as one dir, every other dir is carried into
        the child manifest verbatim. Min/max and equality stats FOLD
        from the group's recorded stats (no recompute; Bloom bitmaps
        OR together), so data skipping survives the pack. Folded dirs
        drop any pk-range identity on purpose: a folded range could
        overlap other dirs' ranges, and ``merge_audit(pruned=True)``'s
        disjointness contract treats rangeless dirs conservatively
        (one-time full rewrite) instead of mis-owning keys.

        Returns the new version (action ``binpack`` — content-identical,
        invisible to streams like a compaction), or None when fewer than
        ``min_group`` small dirs exist.

        Works UNDER live deletion vectors without materializing them:
        dirs are read raw and grouped by their applicable-DV class (the
        exact grouping ``_read_dirs_dv`` applies), packing never crosses
        a class boundary, and each live DV's ``covers`` list rewrites
        the packed dirs to the new dir in the same commit — so live row
        counts, ``deleted_fraction`` (and any rebuild policy keyed on
        it), and later key-reuse semantics are all preserved, where a
        materializing ``compact()`` would silently reset the tombstone
        accounting. Dirs in distinct DV classes can't pack together, so
        a workload that deletes every single commit converges to
        per-class singletons and packs nothing — that cadence of
        removals drives the deleted fraction toward its rebuild bar
        instead."""
        base = self.current_version()
        if base is None:
            return None
        m = self.manifest(base)
        meta = m.get("dir_meta", {})
        dv = m.get("dv_dirs", [])
        dvm = m.get("dv_meta", {})
        covers = {v: set(dvm[v]["covers"]) for v in dv}
        smalls = [(d, meta.get(d, {}).get("bytes", 0)) for d in m["dirs"]
                  if meta.get(d, {}).get("bytes", 0) < target_bytes]
        if len(smalls) < min_group:
            return None
        classes: dict[tuple, list[tuple[str, int]]] = {}
        for d, b in smalls:
            cls = tuple(v for v in dv if d in covers[v])
            classes.setdefault(cls, []).append((d, b))
        groups: list[tuple[tuple, list[str]]] = []
        for cls, items in classes.items():
            cur: list[str] = []
            cur_b = 0
            for d, b in items:
                if cur and cur_b + b > target_bytes:
                    groups.append((cls, cur))
                    cur, cur_b = [], 0
                cur.append(d)
                cur_b += b
            if cur:
                groups.append((cls, cur))
        groups = [(cls, g) for cls, g in groups if len(g) >= min_group]
        if not groups:
            return None
        replaced: dict[str, str | None] = {}
        new_meta: dict = {}
        for cls, g in groups:
            df = self._governed_read(
                [os.path.join(self.path, d) for d in g])
            rel, fstats = self._write_data_dir(df)
            folded = _fold_dir_meta([meta.get(d, {}) for d in g])
            new_meta[rel] = {**folded, **fstats}
            replaced[g[0]] = rel
            for d in g[1:]:
                replaced[d] = None
            for v in cls:
                covers[v] = (covers[v] - set(g)) | {rel}

        def dirs_fn(parent):
            out = []
            for d in m["dirs"]:
                if d in replaced:
                    if replaced[d] is not None:
                        out.append(replaced[d])
                else:
                    out.append(d)
            return out

        extra: dict = {"dir_meta": new_meta}
        if dv:
            # binpack is not a _DV_CARRY_ACTIONS member, so the vectors
            # must ride explicitly — with covers rewritten to the packed
            # dirs, atomically with the dir swap
            extra["dv_dirs"] = list(dv)
            extra["dv_meta"] = {v: {**dvm[v], "covers": sorted(covers[v])}
                                for v in dv}
        return self._commit("binpack", dirs_fn, max_retries=1,
                            extra=extra,
                            expected_parent=base)

    def maybe_compact(self, max_dirs: int = 16,
                      max_dvs: int | None = None,
                      **compact_kw) -> int | None:
        """Compact only when the current version's dir fan-in exceeds
        ``max_dirs`` — the small-files policy for long-lived tables where
        every sync/micro-batch appends a dir. Returns the new version, or
        None when no compaction was needed. Accepts compact()'s layout
        options (range_by/zorder_by/n_files).

        This is also the knob that bounds the ``manifest_table`` FORMAT
        reader's planning cost: its partition count tracks live
        dirs x files-per-dir, so a drain loop that only ever appends
        (``sync_audit`` / the format/stream writers, one dir per
        commit/epoch) grows the read fan-in without bound. Wire this into
        the loop's cadence — the cron-parity pattern::

            t = ManifestTable(spark, path)
            while polling:                     # cron tick / micro-batch
                t.sync_audit(next_batch)       # or a format append
                t.maybe_compact(max_dirs=64)   # no-op until fan-in grows
                t.vacuum()                     # reclaim superseded dirs

        ``maybe_compact`` is a cheap manifest peek when under the bound,
        and one rewrite commit (readable fan-in back to ~n_files) when
        over it; a concurrent writer landing mid-rewrite surfaces as
        CommitConflict, which a cron loop simply retries next tick."""
        cur = self.current_version()
        if cur is None:
            return None
        m = self.manifest(cur)
        over_dvs = (max_dvs is not None
                    and len(m.get("dv_dirs", [])) > max_dvs)
        if len(m["dirs"]) <= max_dirs and not over_dvs:
            return None
        return self.compact(**compact_kw)

    # ------------------------------------------------------------ cdc sync

    def watermark(self, at_version: int | None = None) -> int:
        """High watermark of the newest sync commit (0 before the first).
        Walks history newest-first so interleaved non-sync commits (e.g. a
        compaction) don't hide it. ``at_version`` pins the walk to
        commits <= that version (merge_audit reads state as of its base
        so an interleaved sync can't skew the pinned derivation)."""
        for m in self._state_manifests(at_version):
            if "watermark" in m:
                return int(m["watermark"])
        return 0

    def sync_audit(self, audit_df: DataFrame, audit_pk: str = "audit_pk",
                   on_drift: str = "fail"):
        """Incremental CDC sync with an EXACTLY-ONCE watermark.

        ``sync.sync_table`` on a plain sink is two steps — append files,
        then write the state file — so a crash between them replays the
        delta as duplicates (the documented at-least-once window, same as
        the reference's CSV tail protocol). Here the watermark rides IN
        the data's own manifest commit: either both land (claim succeeds)
        or neither does (orphan data dir, invisible, vacuumed later), so a
        replayed sync recomputes the same delta and the sink is
        duplicate-free by construction.
        """
        from pyspark.sql import functions as F

        from cdc_audit_spark.sync import SyncResult

        audit_df = self._check_drift(audit_df, on_drift)
        wm = self.watermark()
        delta = audit_df.filter(F.col(audit_pk) > F.lit(wm))
        stats = delta.agg(F.count("*").alias("n"),
                          F.max(audit_pk).alias("mx")).first()
        n, mx = int(stats["n"]), stats["mx"]
        if n == 0:
            return SyncResult(0, wm, self.path)
        new_wm = max(wm, int(mx))
        self._enforce_constraints(delta)  # O(delta), only if any exist
        rel, fstats = self._write_data_dir(delta)

        def dirs(parent):
            # the delta was computed against wm; if another sync advanced
            # the watermark meanwhile, blindly rebasing would duplicate
            # the overlap — surface the race instead
            if self.watermark() != wm:
                raise CommitConflict(
                    f"sync_audit at {self.path}: watermark moved "
                    f"{wm} -> {self.watermark()} during the sync; re-run "
                    "(the rewritten delta will exclude the racer's rows)"
                )
            return (parent["dirs"] if parent else []) + [rel]

        # per-dir pk range: lets read_since() prune whole commit dirs at
        # the manifest level (carried forward through later rebases)
        self._commit("append", dirs, extra={
            "watermark": new_wm,
            "schema": audit_df.schema.json(),
            "dir_meta": {rel: {"pk_min": wm + 1, "pk_max": new_wm,
                               "pk_col": audit_pk, **fstats}},
        })
        return SyncResult(n, new_wm, self.path)

    def last_epoch(self, run_id: str | None = None) -> int | None:
        """Newest committed streaming epoch, or None before the first.

        Epoch ids are checkpoint-scoped: when both the pointer's recorded
        run id and ``run_id`` are known and differ, raises
        ``streaming.genstate.GenerationRunMismatch`` instead of comparing
        incomparable epochs (a fresh checkpoint against a surviving table
        must fail loudly, not silently skip replayed batches)."""
        for m in self._state_manifests():
            if "epoch" not in m:
                continue
            prev = m.get("run_id")
            if run_id is not None and prev is not None and prev != run_id:
                from cdc_audit_spark.streaming.genstate import (
                    GenerationRunMismatch,
                )

                raise GenerationRunMismatch(
                    f"manifest table {self.path!r} was last streamed by "
                    f"run {prev} but the current checkpoint is run "
                    f"{run_id}: epoch ids are checkpoint-scoped and cannot "
                    "be compared. Delete the checkpoint and table together "
                    "to rebuild."
                )
            return int(m["epoch"])
        return None

    def epoch_applied(self, epoch_id: int, run_id: str | None = None) -> bool:
        """True iff ``epoch_id``'s commit is already durable in this table
        (same-run epochs are monotone) — the per-table replay guard for
        foreachBatch hooks."""
        last = self.last_epoch(run_id)
        return last is not None and last >= epoch_id

    def dirs_since(self, pk: int, version: int | None = None) -> list[str]:
        """The current version's dirs that may hold rows with
        ``audit_pk > pk`` — manifest-level pruning for incremental
        consumers. A dir with recorded range metadata and ``pk_max <= pk``
        is skipped; a dir without metadata (overwrite/compact output) is
        kept conservatively."""
        if version is None:
            version = self.current_version()
        if version is None:
            return []
        m = self.manifest(version)
        meta = m.get("dir_meta", {})
        return [d for d in m["dirs"]
                if "pk_max" not in meta.get(d, {})
                or int(meta[d]["pk_max"]) > pk]

    def read_since(self, pk: int, audit_pk: str = "audit_pk") -> DataFrame:
        """Rows with ``audit_pk > pk`` — the downstream consumer's poll.

        The file-level twin of the watermark pushdown: whole commit dirs
        whose recorded pk range ends at or below ``pk`` are never listed,
        so a consumer polling a long-lived table reads only the commits it
        hasn't seen (plus parquet min/max pruning inside the survivors).
        """
        from pyspark.sql import functions as F

        version = self.current_version()
        dirs = self.dirs_since(pk, version=version)
        if not dirs:
            return self.read().filter(F.lit(False))  # stable empty schema
        df = self._read_dirs_dv(self.manifest(version), dirs,
                                 at_version=version)
        return df.filter(F.col(audit_pk) > F.lit(pk))

    def dirs_pruned(self, filters: dict[str, tuple],
                    version: int | None = None) -> list[str]:
        """Dirs that may hold rows satisfying EVERY ``col: (lo, hi)``
        range filter, judged by the per-dir stats ``append(stats_cols=)``
        recorded — plus the pk ranges sync_audit / write_range_layout /
        append(pk_range_col=) record (their column rides in ``pk_col``).
        A dir without stats for a filtered column is kept conservatively,
        as is any bound that cannot be compared to the recorded type; a
        bound of None means unbounded on that side. Datetime bounds
        compare as ISO strings (pass datetimes or ISO strings — both
        order correctly)."""
        if version is None:
            version = self.current_version()
        if version is None:
            return []
        m = self.manifest(version)
        meta = m.get("dir_meta", {})

        def excluded(dlo, dhi, lo, hi) -> bool:
            try:
                if lo is not None:
                    plo = _plain(lo)
                    if plo is not None and dhi < plo:
                        return True
                if hi is not None:
                    phi = _plain(hi)
                    if phi is not None and dlo > phi:
                        return True
            except TypeError:  # incomparable bound/stat types: keep
                return False
            return False

        def keep(d: str) -> bool:
            dm = meta.get(d, {})
            st = dict(dm.get("stats", {}))
            if "pk_min" in dm and dm.get("pk_col"):
                st.setdefault(dm["pk_col"], [dm["pk_min"], dm["pk_max"]])
            sets = dm.get("sets", {})
            for c, (lo, hi) in filters.items():
                # a point filter (lo == hi) consults the equality stat
                # too — min/max can't prune a scattered high-cardinality
                # column, the distinct-set/Bloom stat can
                if (c in sets and lo is not None and hi is not None
                        and _plain(lo) == _plain(hi)
                        and not _set_may_contain(sets[c], _plain(lo))):
                    return False
                if c in st and excluded(st[c][0], st[c][1], lo, hi):
                    return False
            return True

        return [d for d in m["dirs"] if keep(d)]

    def dirs_pruned_any(self, col: str, points: list,
                        version: int | None = None) -> list[str]:
        """Dirs that may hold rows where ``col`` equals ANY of
        ``points`` — the multi-point form of :meth:`dirs_pruned`, with
        ONE manifest read for the whole set (per-point dirs_pruned
        calls would re-read the manifest each time; on a serving hot
        path that is nprobe JSON reads per query). Dirs without
        recorded stats for ``col`` are kept conservatively; manifest
        order is preserved."""
        if version is None:
            version = self.current_version()
        if version is None:
            return []
        m = self.manifest(version)
        meta = m.get("dir_meta", {})

        def keep(d: str) -> bool:
            dm = meta.get(d, {})
            sets = dm.get("sets", {})
            if col in sets and not any(
                    _set_may_contain(sets[col], _plain(p)) for p in points):
                return False
            st = dict(dm.get("stats", {}))
            if "pk_min" in dm and dm.get("pk_col"):
                st.setdefault(dm["pk_col"], [dm["pk_min"], dm["pk_max"]])
            if col not in st:
                return True
            lo, hi = st[col]
            try:
                return any(lo <= p <= hi for p in points)
            except TypeError:  # incomparable bound/stat types: keep
                return True

        return [d for d in m["dirs"] if keep(d)]

    def read_pruned(self, filters: dict[str, tuple]) -> DataFrame:
        """Range-filtered read with manifest-level data skipping: whole
        dirs whose recorded stats exclude the filters are never listed,
        and the residual predicate is applied to the survivors (pushed
        into the parquet scan on top) — correct regardless of which dirs
        carry stats."""
        from pyspark.sql import functions as F

        version = self.current_version()
        dirs = self.dirs_pruned(filters, version=version)
        if not dirs:
            df = self.read().filter(F.lit(False))  # stable empty schema
        else:
            df = self._read_dirs_dv(self.manifest(version), dirs,
                                 at_version=version)
        for c, (lo, hi) in filters.items():
            if lo is not None:
                df = df.filter(F.col(c) >= F.lit(lo))
            if hi is not None:
                df = df.filter(F.col(c) <= F.lit(hi))
        return df

    def read_pruned_eq(self, col: str, points: list) -> DataFrame:
        """``col IN (points)`` read with manifest-level data skipping:
        dirs whose recorded equality stats (distinct set / Bloom) or
        min/max range exclude EVERY point are never listed; the residual
        IN-filter applies to the survivors (and pushes into their
        parquet scans). The point-lookup sibling of :meth:`read_pruned`
        for high-cardinality columns where ranges can't prune."""
        from pyspark.sql import functions as F

        version = self.current_version()
        dirs = self.dirs_pruned_any(col, points, version=version)
        if not dirs:
            return self.read().filter(F.lit(False))  # stable empty schema
        df = self._read_dirs_dv(self.manifest(version), dirs,
                                 at_version=version)
        return df.filter(_in_pred(col, points))

    def read_pruned_for_keys(self, keys_df: DataFrame, key: str,
                             max_points: int = 4096,
                             version: int | None = None,
                             points: list | None = None) -> DataFrame:
        """The table narrowed to dirs that may hold any of ``keys_df``'s
        values of ``key`` — the debit-read primitive of the maintenance
        epochs: a micro-batch needs only its touched keys' OLD images,
        and the base replica is committed as a disjoint key-range layout
        (``merge_audit(pruned=True)``), so the read must touch only the
        intersecting dirs, never the corpus — the COMPUTE-side twin of
        the O(delta) storage contract (an epoch that commits O(batch)
        bytes but scans the full replica to compute them is still
        O(corpus) per micro-batch).

        One bounded aggregate over the (batch-sized) keys frame picks
        the strategy: up to ``max_points`` distinct keys are collected
        and pruned per point (equality stats + ranges, exact residual
        IN-filter); a wider batch falls back to the [min, max] hull with
        a range residual. Both return every row whose ``key`` the batch
        touches (point mode: exactly those; range mode: a superset);
        callers needing exactly the touched old images keep their
        broadcast semi-join. Dirs without recorded stats for ``key`` are
        kept conservatively, so the read is correct on ANY layout and
        merely prunes less. ``version`` pins time travel (e.g. a
        pre-epoch state read). ``points`` optionally supplies the
        COMPLETE distinct non-null key list up front (a caller reading
        several tables for one batch collects it once instead of once
        per table); it must not be truncated — pass None to let this
        method bound the collection itself."""
        from pyspark.sql import functions as F

        if version is None:
            version = self.current_version()
        if version is None:
            raise FileNotFoundError(f"no commits yet at {self.path}")
        if points is None:
            # one bounded job: distinct + limit; max_points+1 rows tells
            # wide batches apart without a separate count_distinct pass
            points = [row[0] for row in keys_df.select(key).distinct()
                      .limit(max_points + 1).collect()]
        pts = [p for p in points if p is not None]
        if not pts:  # empty batch: stable empty schema
            return self._empty_frame(version)
        if len(pts) <= max_points:
            dirs = self.dirs_pruned_any(key, pts, version=version)
            if not dirs:
                return self._empty_frame(version)
            df = self._read_dirs_dv(self.manifest(version), dirs,
                                    at_version=version)
            return df.filter(_in_pred(key, pts))
        # wide batch: fall back to the [min, max] hull (one bounded agg —
        # only paid on the rare over-max_points path)
        r = keys_df.agg(
            F.min(key).alias("__lo"), F.max(key).alias("__hi")).first()
        lo, hi = r["__lo"], r["__hi"]
        dirs = self.dirs_pruned({key: (lo, hi)}, version=version)
        if not dirs:
            return self._empty_frame(version)
        df = self._read_dirs_dv(self.manifest(version), dirs,
                                at_version=version)
        return df.filter((F.col(key) >= F.lit(lo))
                         & (F.col(key) <= F.lit(hi)))

    def _empty_frame(self, version: int) -> DataFrame:
        """An empty frame in the schema recorded at ``version`` — no dir
        listing, no scan (tables predating schema stamps fall back to a
        WHERE-false read, which Catalyst folds to an empty relation)."""
        from pyspark.sql import functions as F

        sch = self.schema(version)
        if sch is not None:
            return self.spark.createDataFrame([], sch)
        return self.read(version).filter(F.lit(False))

    def read_pruned_any_of(self, filters: dict[str, list | None],
                           version: int | None = None) -> DataFrame:
        """Read the dirs that may hold rows satisfying ANY of the given
        ``col IN points`` conditions — the multi-purpose narrowed scan
        for reads that serve several downstream filters at once (e.g.
        the join-IVM's left replica, read once for both the ΔA debit's
        pk lookup and the A_pre ⋈ ΔB join-key match). NO residual filter
        is applied (the union of per-column candidate sets has no single
        residual); callers narrow exactly downstream, so the result is a
        conservative superset. A ``None`` points list marks a filter the
        caller could not bound — its dirs are all kept."""
        from pyspark.sql import functions as F

        if version is None:
            version = self.current_version()
        if version is None:
            raise FileNotFoundError(f"no commits yet at {self.path}")
        m = self.manifest(version)
        if any(pts is None for pts in filters.values()):
            keep = set(m["dirs"])
        else:
            keep = set()
            for col, pts in filters.items():
                keep.update(self.dirs_pruned_any(col, pts,
                                                 version=version))
        dirs = [d for d in m["dirs"] if d in keep]  # manifest order
        if not dirs:
            return self._empty_frame(version)
        return self._read_dirs_dv(m, dirs, at_version=version)

    def read_change_feed(self, from_version: int = 1,
                         to_version: int | None = None) -> DataFrame:
        """BATCH read of the change feed between two committed versions
        (inclusive) — the ``table_changes(from, to)`` analog of the
        streaming ``changeFeed`` source, for backfills and ad-hoc audits
        of what changed. Per commit: a recorded feed (``cdc_dirs`` from
        ``merge_audit(change_feed=True)`` / ``delete_where(
        change_feed=True)``) yields its applied delta verbatim; a plain
        append yields its added dirs tagged ``insert`` (the Delta-CDF
        convention); compaction-class rewrites (compact / optimize /
        binpack / analyze / repair) yield nothing; a merge / delete /
        restore WITHOUT a recorded feed raises — same refusal contract
        as the stream, because silently skipping hidden changes would
        corrupt the consumer. Every row carries ``_commit_version``.
        Reads only manifests plus the touched dirs — cost scales with
        the asked-for version window, not table size."""
        from pyspark.sql import functions as F

        if to_version is None:
            to_version = self.current_version()
        if to_version is None:
            raise FileNotFoundError(f"no commits yet at {self.path}")
        # audit column names: the newest recorded templating, else the
        # engine defaults (same resolution as the stream source)
        from cdc_audit_spark.schema import AUDIT_EVENT

        event_col = AUDIT_EVENT
        for m in self._state_manifests(to_version):
            if "cdc_audit_cols" in m:
                event_col = m["cdc_audit_cols"].get("event", AUDIT_EVENT)
                break
        parts = []
        for v in range(from_version, to_version + 1):
            m = self.manifest(v)
            if "cdc_dirs" in m:
                df = (self.spark.read.option("mergeSchema", True)
                      .parquet(*[os.path.join(self.path, d)
                                 for d in m["cdc_dirs"]]))
            elif m["action"] == "append":
                added = m.get("added", m["dirs"]
                              if m.get("parent") is None else None)
                if added is None:
                    parent_dirs = set(
                        self.manifest(m["parent"])["dirs"])
                    added = [d for d in m["dirs"]
                             if d not in parent_dirs]
                if not added:
                    continue
                df = (self.spark.read.option("mergeSchema", True)
                      .parquet(*[os.path.join(self.path, d)
                                 for d in added]))
                if event_col not in df.columns:
                    df = df.withColumn(event_col, F.lit("insert"))
            elif m["action"] in ("merge", "delete", "restore"):
                raise ValueError(
                    f"version {v} at {self.path} is a {m['action']} "
                    "commit with no recorded change feed: its changes "
                    "are not expressible as a delta. Write it with "
                    "change_feed=True (merge_audit/delete_where), or "
                    "narrow the version window past it.")
            else:  # overwrite/compact/optimize/binpack/analyze: no rows
                continue
            parts.append(df.withColumn("_commit_version", F.lit(v)))
        if not parts:
            return (self.read(to_version).limit(0)
                    .withColumn(event_col, F.lit("insert"))
                    .withColumn("_commit_version", F.lit(0))
                    .filter(F.lit(False)))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

    # ------------------------------------------------- deletion vectors

    def delete_where(self, condition, key_col: str,
                     change_feed: bool = False) -> int | None:
        """Delete matching rows WITHOUT rewriting a single data file —
        the Delta deletion-vector pattern, keyed on ``key_col`` instead
        of file/row positions (a key set survives compaction-free at dir
        granularity and stays engine-portable). The matching rows' keys
        land as one small parquet dir; the commit (action ``delete``)
        keeps every data dir byte-identical and records the vector in
        ``dv_dirs``/``dv_meta``. Reads anti-join it away; appends carry
        it forward; any full rewrite (compact / optimize / merge /
        repair) materializes and clears it. At 100 TB this turns a
        GDPR-style purge from an O(table) rewrite into an O(matches)
        job plus metadata.

        Each vector records the dirs it COVERS (the table's dirs at
        delete time), so re-appending a deleted key later is safe — the
        old vector never applies to new dirs. ``key_col`` must identify
        rows uniquely among live rows (and match the key of any earlier
        live vectors); both are ENFORCED here, because the row_count
        arithmetic and the anti-join's blast radius depend on them.

        ``change_feed=True`` records the deleted rows (tagged with a
        ``delete`` event) as this commit's ``cdc_dirs`` entry, so
        streaming feed consumers see the deletes; without it the stream
        source refuses the commit rather than silently dropping it.

        Returns the new version, or None when nothing matched.
        Cost: one filter+aggregate, one uniqueness probe, one small
        write — the table's data files are never opened for writing."""
        from pyspark.sql import functions as F

        cond = F.expr(condition) if isinstance(condition, str) else condition
        return self._delete_matched(lambda live: live.filter(cond),
                                    key_col, change_feed)

    def delete_matching(self, keys_df: DataFrame, on: str | list[str],
                        key_col: str | None = None,
                        change_feed: bool = False) -> int | None:
        """:meth:`delete_where` with a DataFrame-valued match set: delete
        every live row whose ``on`` column(s) appear in ``keys_df`` —
        one left-semi join instead of a driver-side key list, so a
        large purge (the output of another query, a GDPR id feed) never
        round-trips through the driver or blows up into an O(ids)
        ``isin`` expression. ``key_col`` is the per-row unique key the
        deletion vector is addressed by (defaults to ``on`` when that is
        a single column); same uniqueness contract, cost model, and
        change-feed semantics as :meth:`delete_where`."""
        on_cols = [on] if isinstance(on, str) else list(on)
        if key_col is None:
            if len(on_cols) != 1:
                raise ValueError(
                    "key_col is required when matching on multiple columns")
            key_col = on_cols[0]
        keys = keys_df.select(*on_cols).distinct()
        return self._delete_matched(
            lambda live: live.join(keys, on_cols, "left_semi"),
            key_col, change_feed)

    def _delete_matched(self, select_matched, key_col: str,
                        change_feed: bool = False) -> int | None:
        """Shared deletion-vector machinery: ``select_matched`` maps the
        live view to the rows to delete; everything else (uniqueness
        probes, vector write, commit) is identical for predicate- and
        join-valued deletes."""
        from pyspark.sql import functions as F
        from pyspark.storagelevel import StorageLevel

        base = self.current_version()
        if base is None:
            raise FileNotFoundError(f"no commits yet at {self.path}")
        m = self.manifest(base)
        dvm = m.get("dv_meta", {})
        for v in m.get("dv_dirs", []):
            if dvm[v]["key"] != key_col:
                raise ValueError(
                    f"table {self.path} already carries deletion vectors "
                    f"keyed on {dvm[v]['key']!r}; a second key "
                    f"({key_col!r}) would make reads ambiguous — "
                    "materialize first (compact/optimize)")
        live = self.read(base)
        matched = select_matched(live).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            st = matched.agg(
                F.count(F.lit(1)).alias("n"),
                F.count_distinct(F.col(key_col)).alias("nk")).first()
            n, nk = int(st["n"]), int(st["nk"])
            if n == 0:
                return None
            if n != nk:
                raise ValueError(
                    f"delete_where: {key_col!r} is not unique among the "
                    f"{n} matching rows ({nk} distinct keys) — the "
                    "key-addressed vector cannot express this delete")
            keys = matched.select(key_col).distinct()
            n_hit = int(live.join(keys, key_col, "inner").count())
            if n_hit != n:
                raise ValueError(
                    f"delete_where: {n_hit - n} live non-matching row(s) "
                    f"share a {key_col!r} key with the matched set — "
                    "deleting by key would remove them too; pick a "
                    "unique key column")
            rel = os.path.join(_DATA_DIR, f"dv-{uuid.uuid4().hex}")
            keys.write.parquet(os.path.join(self.path, rel))
            fstats = _dir_file_stats(self.path, rel)
            cdc_extra: dict = {}
            if change_feed:
                from cdc_audit_spark.schema import AUDIT_EVENT

                feed = matched.withColumn(AUDIT_EVENT, F.lit("delete"))
                cdc_extra, _ = self._write_change_feed(feed, key_col)
        finally:
            matched.unpersist()
        extra = {
            **cdc_extra,
            "dv_dirs": m.get("dv_dirs", []) + [rel],
            "dv_meta": {**dvm, rel: {"key": key_col,
                                     "covers": list(m["dirs"]),
                                     **fstats}},
        }
        return self._commit("delete", lambda parent: list(m["dirs"]),
                            max_retries=1, extra=extra,
                            expected_parent=base)

    def _write_change_feed(self, delta: DataFrame, audit_pk: str):
        """Materialize the merge's APPLIED delta as a change-feed dir.
        The dir rides in the SAME commit under ``cdc_dirs`` (not table
        content — readers never see it; the streaming source's changeFeed
        mode does), so feed and state version atomically together.
        The audit column NAMES the feed rows use ride along as
        ``cdc_audit_cols`` so readers resolve them from the manifest
        instead of hardcoding the default templating.
        Returns (extra_payload, delta_reread): the caller continues the
        merge FROM THE WRITTEN PARQUET, so the feed is byte-identical to
        the rows actually applied and the delta lineage is evaluated
        once. A failed commit strands the dir unreferenced (vacuum)."""
        from cdc_audit_spark.schema import AUDIT_EVENT, AUDIT_TIMESTAMP

        audit_cols = {"event": AUDIT_EVENT, "pk": audit_pk}
        if AUDIT_TIMESTAMP in delta.columns:
            audit_cols["ts"] = AUDIT_TIMESTAMP
        rel, fstats = self._write_data_dir(delta)
        extra = {"cdc_dirs": [rel],
                 "cdc_schema": delta.schema.json(),
                 "cdc_audit_cols": audit_cols,
                 "cdc_meta": {rel: fstats}}
        return extra, self.spark.read.parquet(os.path.join(self.path, rel))

    def merge_audit(self, audit_df: DataFrame, pk_cols: list[str],
                    audit_pk: str = "audit_pk",
                    bootstrap: DataFrame | None = None,
                    pruned: bool = False, range_buckets: int = 32,
                    change_feed: bool = False):
        """Maintain a CURRENT-STATE replica from the audit log — the
        consumer-side MERGE. The unseen delta (``audit_pk`` past the
        table's watermark) is replayed onto the current state with
        ``capture.apply_changes`` (latest event per key wins; a latest
        delete removes the key) and committed as one atomic commit
        carrying the new watermark: exactly-once materialization with
        every previous state time-travelable. ``bootstrap`` seeds the
        first commit (source-shaped, no audit columns).

        Replays are idempotent (unmoved watermark → empty delta → no
        commit); an interleaved writer surfaces as CommitConflict via the
        base-version pin. Default mode rewrites the whole state per merge
        — O(state) per batch.

        ``pruned=True`` is the storage-level MERGE: the replica is laid
        out as disjoint key-range dirs (``write_range_layout``), each
        merge reads ONLY the dirs whose committed pk range intersects the
        delta's keys, rewrites those, and carries every untouched dir
        into the child manifest verbatim — O(touched state) per batch.
        Requires a single integer merge key (``pk_cols == [key]``). Dirs
        written by a pruned merge cover only touched ranges, so the
        layout stays disjoint; a periodic ``compact(range_by=[key])``
        re-tightens it if many merges fragment the dir list. A plain
        append landing between pruned merges (a "bare" dir without
        merge-key ranges) forces a one-time full rewrite on the next
        merge so the layout is globally disjoint again.

        ``change_feed=True`` additionally records each merge's APPLIED
        delta (the audit rows past the watermark, events included) as a
        ``cdc_dirs`` entry in the SAME commit — the replica's change
        feed, streamable via ``manifest_stream``'s
        ``.option("changeFeed", "true")``; without it merge commits are
        opaque to streaming consumers (their dirs mix new and rewritten
        rows) and the source refuses them. The bootstrap snapshot is
        NOT emitted (the feed is deltas only, the public CDF contract).
        """
        from pyspark.sql import functions as F

        from cdc_audit_spark.capture import apply_changes
        from cdc_audit_spark.sync import SyncResult

        if pruned and len(pk_cols) != 1:
            raise ValueError(
                "pruned merge_audit needs a single integer merge key "
                f"(got pk_cols={pk_cols!r}); use pruned=False")
        base = self.current_version()
        wm = self.watermark(at_version=base)
        delta = audit_df.filter(F.col(audit_pk) > F.lit(wm))
        if pruned and base is not None:
            return self._merge_pruned(delta, pk_cols[0], base, wm, audit_pk,
                                      change_feed=change_feed)
        stats = delta.agg(F.count("*").alias("n"),
                          F.max(audit_pk).alias("mx")).first()
        n, mx = int(stats["n"]), stats["mx"]
        if n == 0 and (base is not None or bootstrap is None):
            return SyncResult(0, wm, self.path)
        if base is None and bootstrap is None:
            raise ValueError(
                "first merge_audit needs a bootstrap state snapshot")
        new_wm = max(wm, int(mx)) if mx is not None else wm
        cdc_extra: dict = {}
        if change_feed and n > 0:
            cdc_extra, delta = self._write_change_feed(delta, audit_pk)

        # action reflects SEMANTICS, not write strategy: a commit whose
        # rewrite HIDES genuinely new rows (n > 0) is a "merge" — the
        # stream source must refuse it rather than skip it like a
        # compaction, unless it carries its change feed. A bootstrap-only
        # first commit (n == 0) stays "overwrite": feeds exclude the
        # snapshot by contract, so skipping it is correct.
        act = "merge" if n > 0 else "overwrite"

        if pruned:  # first commit: lay the replica out for future pruning
            state = apply_changes(bootstrap, delta, pk_cols)
            self.write_range_layout(state, pk_cols[0],
                                    n_buckets=range_buckets,
                                    extra={"watermark": new_wm, **cdc_extra},
                                    base_version=base, action=act)
            return SyncResult(n, new_wm, self.path)

        current = bootstrap if base is None else self.read(base)
        new_state = apply_changes(current, delta, pk_cols)
        # pinned to base: an interleaved commit (another merge, a
        # sync) raises CommitConflict instead of being silently lost
        self.overwrite(new_state, extra={"watermark": new_wm, **cdc_extra},
                       base_version=base, action=act)
        return SyncResult(n, new_wm, self.path)

    def merge_into(self, source: DataFrame, pk_cols: list[str],
                   when_matched: str | None = "update",
                   when_not_matched: str | None = "insert",
                   matched_condition: str | None = None,
                   pruned: bool = False, range_buckets: int = 32,
                   change_feed: bool = False):
        """Generic MERGE INTO (the Delta/Iceberg upsert statement): rows
        of ``source`` whose key exists in the table take the
        ``when_matched`` action (``'update'`` replaces the row,
        ``'delete'`` removes it, ``None`` leaves it untouched); rows with
        no match take ``when_not_matched`` (``'insert'`` or ``None``).
        ``matched_condition`` optionally guards the matched action with a
        SQL predicate over both sides (``s.<col>`` = source, ``t.<col>``
        = target, e.g. ``"s.ts > t.ts"`` for out-of-order CDC feeds);
        unmet matches are no-ops.

        Compiles the statement into an audit delta (source rows tagged
        insert/update/delete at the CURRENT watermark — the watermark is
        the audit-sync protocol's cursor and a generic merge must not
        advance it) and applies it through the SAME machinery as
        :meth:`merge_audit`: full-state rewrite by default,
        ``pruned=True`` for the storage-level dir-granular merge
        (single integer key), ``change_feed=True`` to record the applied
        delta for streaming consumers. Source keys must be unique
        (checked — a key matched by two source rows has no deterministic
        outcome; dedupe upstream, e.g. ``compact.keep_last``).

        Scale shape: classification is one left join of the source
        against the target's KEY COLUMNS only when no condition is given
        (column-pruned scan; with ``matched_condition`` the referenced
        target row must ride along, so the full width joins). The apply
        step then touches only delta keys (pruned mode: only intersecting
        dirs). Merging into an empty table degenerates to the bootstrap
        snapshot (action 'overwrite' — change feeds exclude snapshots by
        contract, exactly like merge_audit's bootstrap).
        """
        from pyspark.sql import functions as F

        from cdc_audit_spark.capture import apply_changes
        from cdc_audit_spark.schema import AUDIT_EVENT, AUDIT_PK
        from cdc_audit_spark.sync import SyncResult

        if when_matched not in ("update", "delete", None):
            raise ValueError(f"when_matched: {when_matched!r}")
        if when_not_matched not in ("insert", None):
            raise ValueError(f"when_not_matched: {when_not_matched!r}")
        if when_matched is None and when_not_matched is None:
            raise ValueError("merge_into with no action is a no-op by "
                             "construction; pass at least one clause")
        bad = {AUDIT_EVENT, AUDIT_PK} & set(source.columns)
        if bad:
            raise ValueError(
                f"source carries reserved audit columns {sorted(bad)}; "
                "merge_into sources are state-shaped (use merge_audit "
                "for audit-log inputs)")
        if pruned and len(pk_cols) != 1:
            raise ValueError(
                "pruned merge_into needs a single integer merge key "
                f"(got pk_cols={pk_cols!r}); use pruned=False")

        nullkey = F.col(pk_cols[0]).isNull()
        for c in pk_cols[1:]:
            nullkey = nullkey | F.col(c).isNull()
        dup = source.agg(
            F.count("*").alias("n"),
            F.count_distinct(*[F.col(c) for c in pk_cols]).alias("nd"),
            F.sum(nullkey.cast("long")).alias("nk"),
        ).first()
        if int(dup["nk"] or 0) > 0:
            raise ValueError(
                f"{int(dup['nk'])} source rows carry NULL merge keys; "
                "matched/unmatched is undefined for NULL keys")
        if int(dup["n"]) != int(dup["nd"]):
            raise ValueError(
                f"source has {int(dup['n']) - int(dup['nd'])} duplicate "
                f"merge keys over {pk_cols}; a key matched by two source "
                "rows has no deterministic outcome — dedupe upstream")

        base = self.current_version()
        data_cols = list(source.columns)
        if base is None:
            if when_not_matched != "insert":
                return SyncResult(0, 0, self.path)
            n = int(dup["n"])
            if pruned:
                self.write_range_layout(source, pk_cols[0],
                                        n_buckets=range_buckets,
                                        base_version=None,
                                        action="overwrite")
            else:
                self.overwrite(source, base_version=None,
                               action="overwrite")
            return SyncResult(n, 0, self.path)

        committed = self.schema()
        if committed is not None and set(committed.names) != set(data_cols):
            raise ValueError(
                f"source columns {sorted(data_cols)} != table columns "
                f"{sorted(committed.names)}; merge_into sources are "
                "full-width (key-only deletes: delete_where)")
        wm = self.watermark(at_version=base)

        s = source.alias("s")
        if matched_condition is None:
            t = self.read(base).select(*pk_cols).alias("t")
            cond_ok = F.lit(True)
        else:
            t = self.read(base).alias("t")
            cond_ok = F.expr(matched_condition)
        joined = s.join(
            t, [s[c].eqNullSafe(t[c]) for c in pk_cols], "left")
        matched = F.col(f"t.{pk_cols[0]}").isNotNull()

        ev = F.lit(None).cast("string")
        if when_not_matched is not None:
            ev = F.when(~matched, F.lit(when_not_matched)).otherwise(ev)
        if when_matched is not None:
            ev = F.when(matched & cond_ok, F.lit(when_matched)).otherwise(ev)
        delta = (
            joined.withColumn(AUDIT_EVENT, ev)
            .filter(F.col(AUDIT_EVENT).isNotNull())
            .select(*[F.col(f"s.{c}").alias(c) for c in data_cols],
                    AUDIT_EVENT,
                    F.lit(wm).cast("long").alias(AUDIT_PK))
        )

        if pruned:
            return self._merge_pruned(delta, pk_cols[0], base, wm,
                                      AUDIT_PK, change_feed=change_feed)
        n = delta.count()
        if n == 0:
            return SyncResult(0, wm, self.path)
        cdc_extra: dict = {}
        if change_feed:
            cdc_extra, delta = self._write_change_feed(delta, AUDIT_PK)
        state = apply_changes(self.read(base), delta, pk_cols)
        self.overwrite(state, extra=cdc_extra, base_version=base,
                       action="merge")
        return SyncResult(n, wm, self.path)

    def upsert(self, source: DataFrame, pk_cols: list[str],
               **kwargs):
        """``merge_into`` with its defaults spelled as the common verb:
        matched rows update, unmatched rows insert."""
        return self.merge_into(source, pk_cols, when_matched="update",
                               when_not_matched="insert", **kwargs)

    def _merge_pruned(self, delta: DataFrame, key: str, base: int,
                      wm: int, audit_pk: str, change_feed: bool = False):
        """Incremental storage-level MERGE: ONE aggregation over the delta
        yields its count, watermark, key bounds AND the per-dir touched
        flags; the rewrite reuses the committed boundaries for bucket
        assignment (no re-quantile — the rewritten rows are scanned
        exactly once, by the write). Two Spark jobs per merge: the delta
        aggregate and the rewrite write.

        Touch detection and bucket assignment both work on OWNERSHIP
        intervals, not the recorded [pk_min, pk_max] content ranges: the
        dirs' sorted lower bounds partition the whole keyline (dir i owns
        [lo_i, lo_{i+1}-1]; the first dir extends to -inf, the last to
        +inf), so a delta key in a GAP between content ranges — normal
        for sparse key spaces — deterministically belongs to exactly one
        dir, touches it, and is bucketed back into its replacement. The
        new dirs record their ownership span (edges widened by the
        delta's key bounds) as pk range — a conservative superset of the
        actual content, so read-side pruning stays correct and future
        ownership computations see the same partition points."""
        from pyspark.sql import functions as F

        from cdc_audit_spark.capture import apply_changes
        from cdc_audit_spark.sync import SyncResult

        cs = self.constraints(at_version=base)
        if cs:
            from cdc_audit_spark.schema import AUDIT_EVENT

            # only the delta's surviving images can introduce violations
            # — O(delta), preserving the pruned merge's O(touched) bound
            self._enforce_constraints(
                delta.filter(F.col(AUDIT_EVENT) != "delete"), cs)
        m = self.manifest(base)
        if m.get("dv_dirs"):
            # the pruned path reads touched dirs RAW (dir-granular
            # rewrite); applying vectors per-dir here would silently
            # resurrect deleted rows in carried dirs — refuse loudly
            raise ValueError(
                f"merge_audit(pruned=True) at {self.path}: the table "
                "carries live deletion vectors; materialize them first "
                "(compact() or optimize()) so the dir-granular merge "
                "sees physical truth")
        meta = m.get("dir_meta", {})

        def range_of(d):
            # a recorded range is a MERGE-KEY ownership interval only if
            # it describes the merge key: ranges over another column
            # (e.g. audit_pk from sync_audit) or of unknown provenance
            # are conservatively bare → quantile-fallback rewrite
            dm = meta.get(d, {})
            if "pk_min" in dm and dm.get("pk_col") == key:
                return dm["pk_min"], dm["pk_max"]
            return None

        ranged = [(d, *range_of(d)) for d in m["dirs"]
                  if range_of(d) is not None]
        bare = [d for d in m["dirs"] if range_of(d) is None]
        ranged.sort(key=lambda t: t[1])
        # Bare dirs (e.g. a plain append interleaved between merges) force
        # a ONE-TIME full rewrite: the quantile fallback lays the rewritten
        # rows out by CONTENT ranges, and if any ranged dir were carried
        # verbatim those content ranges could overlap its ownership
        # interval — the next merge's ownership partition would then route
        # a key to one dir while its stale row lives in the other,
        # silently duplicating it. Rewriting everything makes the new
        # layout globally disjoint again (ADVICE r06 high).
        full_rewrite = bool(bare) and bool(ranged)
        # ownership interval per ranged dir (complete, disjoint keyline
        # cover): [own_lo, own_hi], None = unbounded
        own = []
        for j, (d, lo, hi) in enumerate(ranged):
            own_lo = lo if j > 0 else None
            own_hi = ranged[j + 1][1] - 1 if j + 1 < len(ranged) else None
            own.append((own_lo, own_hi))

        def owned(j):
            cond = F.lit(True)
            if own[j][0] is not None:
                cond = cond & (F.col(key) >= F.lit(own[j][0]))
            if own[j][1] is not None:
                cond = cond & (F.col(key) <= F.lit(own[j][1]))
            return cond

        # Touch detection strategy: up to _MERGE_FLAG_MAX_DIRS the per-dir
        # ownership flags ride in the ONE delta aggregate (an O(dirs)-wide
        # expression — fine for hundreds of dirs, a codegen blow-up for
        # tens of thousands). Past that, the same aggregate carries a
        # distinct-key count instead: a bounded delta collects its keys
        # and the touched dirs resolve driver-side by binary search over
        # the (already driver-resident) sorted ownership bounds; an
        # unbounded delta falls back to the [klo, khi] ownership hull —
        # conservative (gap dirs rewrite verbatim), never wrong.
        wide_ok = not full_rewrite and len(ranged) <= _MERGE_FLAG_MAX_DIRS
        aggs = [F.count("*").alias("__n"), F.max(audit_pk).alias("__mx"),
                F.min(key).alias("__klo"), F.max(key).alias("__khi")]
        if wide_ok:
            aggs += [F.max(owned(j).cast("int")).alias(f"__d{j}")
                     for j in range(len(ranged))]
        elif not full_rewrite:
            aggs += [F.count_distinct(F.col(key)).alias("__nd")]
        r = delta.agg(*aggs).first()
        n = int(r["__n"])
        if n == 0:
            return SyncResult(0, wm, self.path)
        new_wm = max(wm, int(r["__mx"]))
        klo, khi = int(r["__klo"]), int(r["__khi"])

        if full_rewrite:
            touched_idx = list(range(len(ranged)))
        elif wide_ok:
            touched_idx = sorted(j for j in range(len(ranged))
                                 if r[f"__d{j}"])
        elif int(r["__nd"]) <= _MERGE_TOUCH_MAX_POINTS:
            import bisect

            lows = [lo for _d, lo, _hi in ranged]  # sorted ownership lows
            idxs = set()
            for row in delta.select(key).distinct().collect():
                j = bisect.bisect_right(lows, row[0]) - 1
                idxs.add(max(j, 0))  # keys below lows[0]: first dir (-inf)
            touched_idx = sorted(idxs)
        else:
            touched_idx = [
                j for j in range(len(ranged))
                if (own[j][0] is None or own[j][0] <= khi)
                and (own[j][1] is None or own[j][1] >= klo)
            ]
        cdc_extra: dict = {}
        if change_feed:
            # the rewrite below re-reads the delta from the written feed
            # parquet: one evaluation of the input lineage, and the feed
            # is byte-identical to what the merge applied
            cdc_extra, delta = self._write_change_feed(delta, audit_pk)
        touched = bare + [ranged[j][0] for j in touched_idx]
        untouched = [d for d in m["dirs"] if d not in set(touched)]

        if touched:
            cur = self._governed_read(
                [os.path.join(self.path, d) for d in touched])
        else:  # empty table (a version with no dirs): delta is everything
            cur = self.spark.createDataFrame([], self.schema())
        new_rows = apply_changes(cur, delta, [key])

        if bare or not ranged:
            # no reusable boundaries: fall back to the quantile layout —
            # safe ONLY because full_rewrite guarantees untouched == []
            # whenever ranged dirs exist alongside bare ones (content
            # ranges from the quantile pass may not overlap carried dirs)
            new_dirs, new_meta = self._write_range_dirs(
                new_rows, key, max(1, len(touched)))
        else:
            # span of touched dir j = its ownership hull: lo_j ..
            # min(own_hi_j, recorded hi widened) — content (old rows +
            # adopted gap keys) provably falls inside it
            spans = []
            for j in touched_idx:
                lo = ranged[j][1]
                hi = own[j][1] if own[j][1] is not None else ranged[j][2]
                spans.append([lo, hi])
            spans[0][0] = min(spans[0][0], klo)
            spans[-1][1] = max(spans[-1][1], khi)
            new_dirs, new_meta = self._write_assigned_dirs(
                new_rows, key, spans)
        dirs_all = untouched + new_dirs
        self._commit(
            "merge", lambda parent: dirs_all, max_retries=1,
            extra={"watermark": new_wm, "dir_meta": new_meta, **cdc_extra},
            expected_parent=base)
        return SyncResult(n, new_wm, self.path)

    def _write_assigned_dirs(self, df: DataFrame, key: str,
                             spans: list[list[int]]) -> tuple[list[str], dict]:
        """Write ``df`` split into len(spans) dirs by PRE-KNOWN disjoint
        key spans (ascending); every row's key falls inside a span by
        construction (out-of-range keys were folded into the edge spans).
        No statistics pass — the spans themselves become the recorded
        (conservative) per-dir ranges."""
        from pyspark.sql import functions as F

        bucket = F.lit(0)
        for lo, _hi in spans[1:]:
            bucket = bucket + (F.col(key) >= F.lit(lo)).cast("int")
        rel = os.path.join(_DATA_DIR, f"c-{uuid.uuid4().hex}")
        (df.withColumn("__bucket", bucket)
           .repartition("__bucket")
           .sortWithinPartitions(key)
           .write.partitionBy("__bucket")
           .parquet(os.path.join(self.path, rel)))
        out = os.path.join(self.path, rel)
        present = sorted(
            int(nm.split("=", 1)[1]) for nm in os.listdir(out)
            if nm.startswith("__bucket="))
        dirs = [f"{rel}/__bucket={b}" for b in present]
        meta = {d: {"pk_min": int(spans[b][0]), "pk_max": int(spans[b][1]),
                    "pk_col": key, **_dir_file_stats(self.path, d)}
                for d, b in zip(dirs, present)}
        return dirs, meta

    def append_range_dirs(self, df: DataFrame, key: str,
                          n_buckets: int = 32,
                          extra: dict | None = None,
                          base_version: int | None = _ANY,
                          on_drift: str = "fail") -> int:
        """Append ``df`` laid out as up to ``n_buckets`` DISJOINT
        key-range dirs — :meth:`write_range_layout`'s append-action
        sibling, in ONE commit. Each dir records its ``key`` range, so
        :meth:`read_pruned` / :meth:`dirs_pruned` skip the commit's dirs
        individually: the LSM segment-append pattern (a delta lands as
        range-clustered segments; point/range reads touch only the
        segments whose range matches; a periodic range-clustered
        compaction folds the tail). ``key`` must be integer-valued.

        Pinned to ``base_version`` (default: the current version at call
        entry) — callers that derive ``extra`` state (e.g. a watermark)
        from table state need an interleaved writer to surface as
        :class:`CommitConflict`, not to be silently rebased over."""
        if base_version is _ANY:
            base_version = self.current_version()
        df = self._check_drift(df, on_drift)
        self._enforce_constraints(df)
        dirs, meta = self._write_range_dirs(df, key, n_buckets)
        return self._commit(
            "append",
            lambda parent: (parent["dirs"] if parent else []) + dirs,
            max_retries=1,
            extra={**(extra or {}), "schema": df.schema.json(),
                   "dir_meta": meta},
            expected_parent=base_version)

    # ------------------------------------------- partition-pruned MERGE

    def write_range_layout(self, df: DataFrame, key: str,
                           n_buckets: int = 32,
                           extra: dict | None = None,
                           base_version: int | None = _ANY,
                           action: str = "overwrite") -> int:
        """Commit ``df`` as the table's content laid out as up to
        ``n_buckets`` DISJOINT key-range dirs, each a separate manifest
        dir with recorded ``pk_min``/``pk_max`` — the layout
        :meth:`merge_audit`'s pruned mode rewrites at dir granularity.
        ``key`` must be integer-valued (range metadata is integral).

        One Spark write job produces all buckets (``partitionBy`` on a
        computed bucket id); each ``__bucket=K`` subdir is then registered
        as its own manifest dir, so the partition column never appears in
        the data and readers see plain rows."""
        from pyspark.sql import functions as F

        if base_version is _ANY:
            base_version = self.current_version()
        self._enforce_constraints(df)
        dirs, meta = self._write_range_dirs(df, key, n_buckets)
        return self._commit(
            action, lambda parent: dirs, max_retries=1,
            extra={**(extra or {}), "schema": df.schema.json(),
                   "dir_meta": meta},
            expected_parent=base_version)

    def _write_range_dirs(self, df: DataFrame, key: str,
                          n_buckets: int) -> tuple[list[str], dict]:
        """Write ``df`` once, split into up to ``n_buckets`` disjoint
        key-range subdirs; return (dirs, dir_meta) for the commit. The
        bucket id is a map-side comparison chain against the approximate
        quantile boundaries — no extra shuffle beyond the write's own.
        ``df`` is evaluated three times (quantiles, write, range agg), so
        its lineage is persisted for the duration — without this a merge/
        bootstrap input carrying a join+window recomputes per pass."""
        from pyspark.sql import functions as F
        from pyspark.storagelevel import StorageLevel

        lvl = df.storageLevel
        owns_cache = not (lvl.useMemory or lvl.useDisk)
        if owns_cache:  # never clobber a cache the caller owns
            df = df.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            bounds = [] if n_buckets <= 1 else sorted(set(
                df.approxQuantile(key, [i / n_buckets
                                        for i in range(1, n_buckets)],
                                  0.001)))
            bucket = F.lit(0)
            for b in bounds:
                bucket = bucket + (F.col(key) >= F.lit(float(b))).cast("int")
            rel = os.path.join(_DATA_DIR, f"c-{uuid.uuid4().hex}")
            (df.withColumn("__bucket", bucket)
               .repartition("__bucket")
               .sortWithinPartitions(key)
               .write.partitionBy("__bucket")
               .parquet(os.path.join(self.path, rel)))
            ranges = (df.withColumn("__bucket", bucket)
                      .groupBy("__bucket")
                      .agg(F.min(key).alias("lo"), F.max(key).alias("hi"))
                      .collect())
        finally:
            if owns_cache:
                df.unpersist()
        dirs = [f"{rel}/__bucket={int(r['__bucket'])}" for r in ranges]
        meta = {d: {"pk_min": int(r["lo"]), "pk_max": int(r["hi"]),
                    "pk_col": key, **_dir_file_stats(self.path, d)}
                for d, r in zip(dirs, ranges)}
        return dirs, meta

    # ------------------------------------------------------- verify/repair

    def restore(self, version: int) -> int:
        """Roll the table back to ``version`` as a NEW commit — the
        RESTORE pattern: pure metadata (the old dirs are re-referenced,
        nothing is copied or rewritten), the bad history stays readable
        for forensics, and time travel still reaches every version in
        between. The restored commit reinstates the target version's
        whole content state: dirs + their stats, deletion vectors, AND
        the sync watermark / wipe record it carried — restoring data but
        keeping a newer watermark would silently drop the re-synced
        delta, so state and content travel together.

        Requires the target's dirs (and DV files) to still exist —
        vacuum may have reclaimed them; that raises here rather than
        committing a manifest that points at nothing. Stream consumers
        refuse a restore commit like a merge (content changed with no
        emittable delta) unless they opted into skipMerges."""
        cur = self.current_version()
        if cur is None:
            raise FileNotFoundError(f"no commits yet at {self.path}")
        if version == cur:
            return cur
        tm = self.manifest(version)
        missing = [d for d in tm["dirs"] + tm.get("dv_dirs", [])
                   if not os.path.isdir(os.path.join(self.path, d))]
        if missing:
            raise FileNotFoundError(
                f"cannot restore {self.path} to version {version}: "
                f"{len(missing)} referenced dir(s) were vacuumed "
                f"(e.g. {missing[0]}) — that version is gone")
        # content + content-state keys travel verbatim from the target;
        # commit-identity keys (version/parent/action/ts/added) are
        # recomputed by _commit for the NEW commit
        carry = {k: tm[k] for k in (*_STATE_KEYS, *_DV_KEYS) if k in tm}
        if "dir_meta" in tm:
            carry["dir_meta"] = tm["dir_meta"]
        return self._commit(
            "restore", lambda parent: list(tm["dirs"]), max_retries=1,
            extra=carry, expected_parent=cur)

    def clone(self, target_path: str, version: int | None = None,
              shallow: bool = True) -> "ManifestTable":
        """CLONE the table (at ``version``, default latest) into a NEW
        table at ``target_path`` — the Delta CLONE statement.

        ``shallow=True`` is metadata-only and O(dirs): the clone's first
        commit re-references the source's data dirs (and live deletion
        vectors) by ABSOLUTE path — every read path resolves foreign
        dirs transparently, no byte is copied. The clone then evolves
        independently: its own appends/merges/compactions land under its
        own root, and any rewrite (compact/optimize) materializes it
        fully local. The clone's vacuum can never reclaim source data
        (it only sweeps the clone's own data root); the source's vacuum
        CAN — like Delta shallow clones, vacuuming the source while
        shallow clones reference it breaks them, so retain or deep-clone
        first. Full table state (schema, sync watermark, wipe record,
        DVs) travels with the snapshot, so a cloned replica keeps
        merging its audit feed from where the source stood.

        ``shallow=False`` deep-clones: one read (deletion vectors
        applied — the copy is materialized truth) + one overwrite into
        the target, state carried, fully self-contained.

        The clone commit's action is "overwrite" (bootstrap-snapshot
        semantics — streams and change feeds exclude snapshots by
        contract) with a ``cloned_from`` provenance extra.
        """
        if version is None:
            version = self.current_version()
        if version is None:
            raise FileNotFoundError(f"no commits yet at {self.path}")
        tm = self.manifest(version)
        target = ManifestTable(self.spark, target_path,
                               checkpoint_interval=self.checkpoint_interval,
                               claim_backend=self.claim_backend)
        provenance = {"cloned_from": {
            "path": os.path.abspath(self.path), "version": int(version),
            "shallow": bool(shallow)}}
        if not shallow:
            carry = {k: tm[k] for k in _STATE_KEYS if k in tm}
            target.overwrite(self.read(version),
                             extra={**carry, **provenance},
                             base_version=None)
            return target

        missing = [d for d in tm["dirs"] + tm.get("dv_dirs", [])
                   if not os.path.isdir(os.path.join(self.path, d))]
        if missing:
            raise FileNotFoundError(
                f"cannot clone {self.path}@{version}: {len(missing)} "
                f"referenced dir(s) were vacuumed (e.g. {missing[0]})")
        src_root = os.path.abspath(self.path)

        def ab(d: str) -> str:
            # already-absolute entries (a clone of a clone) pass through
            return os.path.normpath(os.path.join(src_root, d))

        carry = {k: tm[k] for k in _STATE_KEYS if k in tm}
        if "dir_meta" in tm:
            carry["dir_meta"] = {ab(d): dm
                                 for d, dm in tm["dir_meta"].items()
                                 if d in tm["dirs"]}
        if tm.get("dv_dirs"):
            carry["dv_dirs"] = [ab(v) for v in tm["dv_dirs"]]
            carry["dv_meta"] = {
                ab(v): {**dm, "covers": [ab(c) for c in dm["covers"]]}
                for v, dm in tm["dv_meta"].items()}
        dirs_abs = [ab(d) for d in tm["dirs"]]
        # expected_parent=None: the target must be EMPTY — cloning over
        # an existing table would silently shadow its history
        target._commit("overwrite", lambda parent: dirs_abs,
                       max_retries=1, extra={**carry, **provenance},
                       expected_parent=None)
        return target

    def wipe_record(self, at_version: int | None = None) -> dict | None:
        """The newest commit's recorded wipe (``wipe_through`` +
        ``wipe_pk_cols`` extras on a keep-last compaction), or None.
        ``at_version`` pins the walk to commits <= that version."""
        for m in self._state_manifests(at_version):
            if "wipe_through" in m:
                return {"through": int(m["wipe_through"]),
                        "pk_cols": m.get("wipe_pk_cols")}
        return None

    def expected_content(self, audit_df: DataFrame,
                         audit_pk: str = "audit_pk",
                         at_version: int | None = None) -> DataFrame:
        """What an uncorrupted table must contain given its commit history
        — the manifest-native form of ``sync.expected_sink_content``:
        everything, unless a wipe is recorded, then the keep-last
        survivors up to the wipe boundary plus later rows verbatim."""
        from pyspark.sql import functions as F

        w = self.wipe_record(at_version=at_version)
        if w is None:
            return audit_df
        from cdc_audit_spark.compact import keep_last, keep_last_per_key

        pre = audit_df.filter(F.col(audit_pk) <= w["through"])
        pre = (keep_last_per_key(pre, w["pk_cols"]) if w["pk_cols"]
               else keep_last(pre))
        return pre.unionByName(audit_df.filter(F.col(audit_pk) > w["through"]))

    def verify(self, audit_df: DataFrame) -> bool:
        """True iff the table's content checksum matches what its history
        says it should hold (one map-side reduction per side)."""
        from cdc_audit_spark.sync import table_checksum

        expected = self.expected_content(audit_df)
        a = table_checksum(expected).first()
        b = table_checksum(self.read().select(*expected.columns)).first()
        return (a["checksum"], a["n_rows"]) == (b["checksum"], b["n_rows"])

    def repair(self, audit_df: DataFrame) -> int:
        """Commit a rebuild of the expected content — a TRANSACTIONAL
        repair (the corrupt version stays readable for forensics). The
        surviving wipe record is carried forward so later verifies still
        reconstruct the compacted expectation. Returns the new version.
        Pinned to the version whose history the rebuild was derived from
        (an interleaved commit raises CommitConflict, not silent loss)."""
        base = self.current_version()
        w = self.wipe_record(at_version=base)
        extra = ({"wipe_through": w["through"], "wipe_pk_cols": w["pk_cols"]}
                 if w else None)
        return self.overwrite(
            self.expected_content(audit_df, at_version=base),
            extra=extra, base_version=base)

    # ----------------------------------------------------------------- gc

    def vacuum(self, keep_versions: int = 1, retain_seconds: float = 3600,
               force: bool = False) -> dict:
        """Drop all but the newest ``keep_versions`` manifests and delete
        data dirs no surviving manifest references (crashed commits'
        orphans included), plus superseded checkpoint roll-ups. Returns
        {"manifests": n, "data_dirs": n, "skipped_young": n,
        "checkpoints": n}.

        Safe concurrently with writers BY POLICY: an in-flight commit's
        data dir is unreferenced until its manifest lands, so sweeping it
        would let the writer commit a manifest pointing at deleted files —
        a corrupted table, not a failed commit. Data dirs younger than
        ``retain_seconds`` (newest-file mtime; default 1h — the standard
        Delta-style RETAIN guard) are therefore never swept unless
        ``force=True``, making only genuinely orphaned dirs eligible.
        """
        if keep_versions < 1:
            raise ValueError("keep_versions must be >= 1")
        import time

        vs = self.versions()
        drop, keep = vs[:-keep_versions], vs[-keep_versions:]
        # change-feed dirs (cdc_dirs) are commit payload too: a retained
        # version's feed must stay streamable until its manifest drops
        referenced = {d for v in keep
                      for m in [self.manifest(v)]
                      for d in (m["dirs"] + m.get("cdc_dirs", [])
                                + m.get("dv_dirs", []))}
        for v in drop:
            os.unlink(_manifest_path(self.path, v))
        # checkpoints older than the newest are fully superseded for state
        # reads; their only residual value is time travel to versions this
        # vacuum is discarding anyway — drop them so checkpoint count stays
        # O(1) rather than O(history/interval)
        cks = self.checkpoints()
        n_ckpt = 0
        for v in cks[:-1]:
            if v not in keep:
                os.unlink(_checkpoint_path(self.path, v))
                n_ckpt += 1
        # the RETAINED checkpoints still offer time travel to their exact
        # versions (manifest() falls back to them), so their data dirs
        # must survive the sweep; the space is reclaimed once a newer
        # checkpoint supersedes them on a later vacuum
        for v in self.checkpoints():
            ckm = self.manifest(v)
            referenced |= (set(ckm["dirs"]) | set(ckm.get("cdc_dirs", []))
                           | set(ckm.get("dv_dirs", [])))
        n_dirs = n_young = 0
        cutoff = time.time() - retain_seconds

        def sweep(full: str, rel: str) -> None:
            nonlocal n_dirs, n_young
            if not force and self._dir_mtime(full) > cutoff:
                n_young += 1  # possibly an in-flight commit: retained
                return
            shutil.rmtree(full)
            n_dirs += 1

        ddir = os.path.join(self.path, _DATA_DIR)
        if os.path.isdir(ddir):
            for name in os.listdir(ddir):
                rel = os.path.join(_DATA_DIR, name)
                full = os.path.join(ddir, name)
                if rel in referenced:
                    continue
                # a range-layout write registers its __bucket SUBDIRS as
                # manifest dirs: the parent is then partially referenced
                # and must not be swept whole; only its unreferenced
                # bucket subdirs are eligible
                kids = {r for r in referenced
                        if r.startswith(rel + os.sep)}
                if not kids:
                    sweep(full, rel)
                    continue
                for sub in os.listdir(full):
                    sfull = os.path.join(full, sub)
                    srel = os.path.join(rel, sub)
                    if os.path.isdir(sfull) and srel not in referenced:
                        sweep(sfull, srel)
        return {"manifests": len(drop), "data_dirs": n_dirs,
                "skipped_young": n_young, "checkpoints": n_ckpt}

    @staticmethod
    def _dir_mtime(path: str) -> float:
        """Newest mtime within a data dir (the dir itself plus direct
        children — a writer still adding part files keeps it young)."""
        times = [os.path.getmtime(path)]
        try:
            with os.scandir(path) as it:
                times += [e.stat().st_mtime for e in it]
        except OSError:
            pass
        return max(times)
