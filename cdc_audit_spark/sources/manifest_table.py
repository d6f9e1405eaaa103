"""Batch Spark FORMAT over ManifestTable: ``spark.read/write.format(
"manifest_table")`` (Python DataSource API).

Reads are metadata-pruned by Catalyst-pushed filters: ``pushFilters``
receives the query's conjunctive predicates, the reader intersects the
range/equality bounds with the per-dir column statistics the manifests
record (``append(stats_cols=)`` / ``write_range_layout`` /
``sync_audit``'s pk ranges), and whole dirs whose stats exclude the
predicate are never listed — the user writes a plain ``df.filter(...)``
and the skipping happens inside the source, exactly like file skipping
in public table formats. All filters are RETURNED to Spark (re-applied
after the scan), so pruning is purely an optimization and strict/closed
bound differences cannot affect correctness. ``.option("version", N)``
time-travels.

Writes run THROUGH the commit protocol: each executor task ATTEMPT
streams its Arrow record batches into one parquet file inside its own
fresh attempt dir (``DataSourceArrowWriter`` — no row-at-a-time Python;
a failed/speculative attempt's partial file is stranded in a dir no
commit references, so retries can never surface duplicate or torn
rows), and the driver's ``commit`` COALESCES the reported files into
one commit dir (same-filesystem renames) before publishing the
manifest atomically — the dirs list grows by ONE per commit regardless
of task count, so manifest size stays O(commits), not
O(commits x partitions). ``mode("append")`` commits parent dirs + the
new dir, ``mode("overwrite")`` commits only the new dir, pinned to the
version observed at job start (a concurrent writer surfaces
``CommitConflict``, never silent loss). A failed job ``abort``s by
removing the attempt dirs (also vacuum-reclaimable).
Appends are schema-governed like ``ManifestTable.append``
(``.option("onDrift", "evolve")`` admits additive drift).
``.option("statsCols", "a,b")`` records the commit dir's per-column
min/max in the manifest for read-side pruning — every task folds its
batches' bounds INLINE while writing (pyarrow min_max, no extra pass)
and the driver merges them into the commit dir's stats.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructField, StructType

from cdc_audit_spark.sources.manifest_stream import (
    ManifestFilesPartition,
    _manifest,
    _versions,
)

__all__ = ["ManifestTableDataSource", "register_manifest_table"]

_DATA_DIR = "data"


def _arrow_batches(files: list[str], spark_schema: StructType,
                   fill: dict | None = None):
    """Read parquet files as record batches cast to the declared schema's
    arrow form (shared with the streaming reader — see its rationale).
    A column the file predates (additive schema evolution via
    ``on_drift='evolve'``) surfaces as NULLs, matching the native
    mergeSchema read. ``fill`` overrides that default for specific
    MISSING columns with a constant (the change-feed reader tags plain
    append commits' rows ``audit_event='insert'``); a column present in
    the file always wins over its fill."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    target = to_arrow_schema(spark_schema)
    for f in files:
        for batch in pq.ParquetFile(f).iter_batches():
            tbl = pa.Table.from_batches([batch])
            cols = []
            for field in target:
                if field.name in tbl.column_names:
                    cols.append(tbl.column(field.name).cast(field.type))
                elif fill and field.name in fill:
                    cols.append(pa.array([fill[field.name]] * len(tbl),
                                         type=field.type))
                else:
                    cols.append(pa.nulls(len(tbl), field.type))
            out = pa.Table.from_arrays(cols, schema=target)
            yield from out.combine_chunks().to_batches()


def _all_nullable(sch: StructType) -> StructType:
    from pyspark.sql.types import StructField

    return StructType([
        StructField(f.name, f.dataType, True, f.metadata)
        for f in sch.fields
    ])


def _committed_schema(path: str) -> StructType | None:
    """The table's committed schema with every field NULLABLE — matching
    parquet/mergeSchema read semantics: rows written before an additive
    evolution surface NULL for the later-added columns, so a column's
    writer-side non-nullability cannot hold table-wide."""
    import json

    from cdc_audit_spark.sinks.manifest import current_committed_version

    # every commit inherits the schema stamp (_STATE_KEYS), so the newest
    # manifest almost always has it — pointer fast path, no listing
    cur = current_committed_version(path)
    if cur is not None:
        m = _manifest(path, cur)
        if "schema" in m:
            return _all_nullable(StructType.fromJson(json.loads(m["schema"])))
    for v in reversed(_versions(path)):
        m = _manifest(path, v)
        if "schema" in m:
            return _all_nullable(StructType.fromJson(json.loads(m["schema"])))
    return None


def _parent_schema(pm: dict | None, path: str) -> StructType | None:
    """Committed schema AS OF the parent manifest a commit is rebasing
    onto: the parent's inherited stamp when present (every commit of this
    format stamps one, and ``_STATE_KEYS`` inherits it), else the full
    history walk. None for a brand-new table."""
    import json

    if pm is None:
        return None
    if "schema" in pm:
        return _all_nullable(StructType.fromJson(json.loads(pm["schema"])))
    return _committed_schema(path)


def _dir_files(table_path: str, rel_dir: str, dir_meta: dict) -> list[str]:
    """Absolute parquet paths of a committed dir. Manifests written since
    the file lists landed record them in ``dir_meta[d]["files"]`` — file
    discovery is then fully manifest-described (no LIST on the data path:
    object-store-friendly, and O(0) driver syscalls per dir). Legacy
    manifests without the record fall back to one listdir."""
    full = os.path.join(table_path, rel_dir)
    names = dir_meta.get(rel_dir, {}).get("files")
    if names is None:
        names = sorted(f for f in os.listdir(full) if f.endswith(".parquet"))
    return [os.path.join(full, f) for f in names]


def _prefix_upper_bound(prefix: str) -> str | None:
    """The smallest string lexicographically above EVERY string that
    starts with ``prefix``: increment the last codepoint, carrying past
    U+10FFFF (drop it and increment the previous one). A prefix made
    entirely of U+10FFFF has no finite upper bound — return None and
    prune on the lower bound only."""
    s = prefix
    while s:
        last = ord(s[-1])
        if last < 0x10FFFF:
            return s[:-1] + chr(last + 1)
        s = s[:-1]
    return None


class ManifestTableReader(DataSourceReader):
    """Batch reader. ``partitions()`` plans one input partition per
    committed parquet FILE, so planning cost and read fan-in track live
    dirs x files-per-dir. Append-only producers grow that without bound
    — the producing loop owns the mitigation: wire
    ``ManifestTable.maybe_compact(max_dirs=...)`` into its cadence (see
    that docstring for the cron-parity pattern); a compaction commit
    folds the fan-in back to ~n_files and this reader's partition count
    drops with it on the next load."""

    def __init__(self, options: dict, schema: StructType):
        path = options.get("path")
        if not path:
            raise ValueError(
                "manifest_table requires .option('path', <table dir>)")
        self.path = path
        self.version = (int(options["version"])
                        if "version" in options else None)
        self.spark_schema = schema
        self._bounds: dict[str, list] = {}
        self._in_sets: dict[str, list] = {}
        self._null_filters: dict[str, bool] = {}

    def pushFilters(self, filters):
        """Collect range/equality bounds per top-level column for dir
        pruning — plus IN-lists (pruned through the per-dir equality
        stats min/max can't express), IsNull/IsNotNull (pruned through
        the recorded per-dir null counts), and string prefixes (a
        lexicographic range). Every filter is returned (Spark re-applies
        them), so the stats-based skip is pure optimization."""
        from pyspark.sql.datasource import (
            In,
            IsNotNull,
            IsNull,
            StringStartsWith,
        )

        for f in filters:
            attr = getattr(f, "attribute", None)
            if not attr or len(attr) != 1:
                continue
            col, v = attr[0], getattr(f, "value", None)
            if isinstance(f, (IsNull, IsNotNull)):
                self._null_filters[col] = isinstance(f, IsNull)
                continue
            if isinstance(f, In):
                pts = [p for p in (v or ())
                       if p is not None and not isinstance(p, bool)
                       and isinstance(p, (int, float, str))]
                if pts and len(pts) == len(v):
                    # an unsupported element would make the skip unsound
                    self._in_sets[col] = pts
                continue
            if v is None or isinstance(v, bool) or not isinstance(
                    v, (int, float, str)):
                continue
            lo, hi = self._bounds.setdefault(col, [None, None])
            if isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                self._bounds[col][0] = v if lo is None else max(lo, v)
            elif isinstance(f, (LessThan, LessThanOrEqual)):
                self._bounds[col][1] = v if hi is None else min(hi, v)
            elif isinstance(f, EqualTo):
                self._bounds[col] = [v, v]
            elif isinstance(f, StringStartsWith) and isinstance(v, str):
                # startswith(p) == p <= col < next_prefix(p), where
                # next_prefix increments p's last codepoint (carrying
                # past U+10FFFF). Appending U+10FFFF instead would be
                # UNSOUND: p+'\U0010ffff'+suffix sorts ABOVE that cap,
                # so a dir holding only such rows would be pruned away
                # (missing rows, not a wasted read). Using the exclusive
                # bound as a closed interval is conservative — at worst
                # one boundary dir is kept unnecessarily.
                self._bounds[col][0] = v if lo is None else max(lo, v)
                cap = _prefix_upper_bound(v)
                if cap is not None:
                    self._bounds[col][1] = cap if hi is None else min(hi, cap)
        return filters

    def partitions(self):
        from cdc_audit_spark.sinks.manifest import ManifestTable

        # metadata-only use: dirs_pruned/manifest never touch the session
        t = ManifestTable(None, self.path)
        filters = {c: (lo, hi) for c, (lo, hi) in self._bounds.items()}
        version = self.version
        if version is None:
            from cdc_audit_spark.sinks.manifest import (
                current_committed_version,
            )

            version = current_committed_version(self.path)
            if version is None:
                raise FileNotFoundError(f"no commits yet at {self.path}")
        m = _manifest(self.path, version)
        if m.get("dv_dirs"):
            # this reader yields raw parquet batches per file — it has no
            # join stage to apply deletion vectors in, and ignoring them
            # would resurrect deleted rows
            raise ValueError(
                f"table {self.path} carries live deletion vectors; the "
                "manifest_table format reader cannot apply them — read "
                "via ManifestTable.read(), or materialize them first "
                "(compact()/optimize())")
        dirs = t.dirs_pruned(filters, version=version) if filters else m["dirs"]
        for col, pts in self._in_sets.items():
            keep = set(t.dirs_pruned_any(col, pts, version=version))
            dirs = [d for d in dirs if d in keep]
        if self._null_filters:
            dm_all = m.get("dir_meta", {})

            def null_keep(d: str) -> bool:
                dm = dm_all.get(d, {})
                for col, want_null in self._null_filters.items():
                    n = dm.get("nulls", {}).get(col)
                    if n is None:
                        continue  # unrecorded: keep conservatively
                    if want_null and int(n) == 0:
                        return False
                    rows = dm.get("rows")
                    if (not want_null and rows is not None
                            and int(n) == int(rows)):
                        return False  # all-NULL dir vs IsNotNull
                return True

            dirs = [d for d in dirs if null_keep(d)]
        dir_meta = m.get("dir_meta", {})
        parts = []
        for d in dirs:
            parts.extend(ManifestFilesPartition([f])
                         for f in _dir_files(self.path, d, dir_meta))
        return parts or [ManifestFilesPartition([])]

    def read(self, partition: ManifestFilesPartition):
        yield from _arrow_batches(partition.files, self.spark_schema)


def _govern_stamp(existing: StructType | None, schema: StructType,
                  on_drift: str, path: str) -> StructType:
    """Append writes carry the same schema governance as
    ``ManifestTable.append``: additive drift only with explicit opt-in,
    breakage always refuses. Returns the schema the commit should STAMP:
    the committed one when compatible (a commit must never override a
    schema a concurrent writer evolved with a stale copy), the evolved
    union under ``on_drift='evolve'``, or the incoming schema for a new
    table. The writers call this per CLAIM ATTEMPT against the exact
    parent being rebased onto (via ``_parent_schema``) — governance must
    see the table as it is when the commit lands, not as it was at job
    start, or a rebase retry re-stamps a concurrent evolution away."""
    from cdc_audit_spark.schema import (
        SchemaDriftError,
        classify_schema_drift,
        evolve_schema,
        is_widening,
    )

    if existing is None:
        return schema
    drift = classify_schema_drift(existing, schema)
    if drift["changed"]:
        # a batch NARROWER than the table (old writer after a type
        # widening) is not drift: the stamp stays wide and the narrow
        # parquet files promote under the governed read — substitute the
        # wide type into the effective schema before evolving
        old_f = {f.name: f for f in existing.fields}
        new_by = {f.name: f.dataType.simpleString() for f in schema.fields}
        narrow = {n for n in drift["changed"]
                  if is_widening(new_by[n], old_f[n].dataType.simpleString())}
        if narrow:
            schema = StructType([
                StructField(f.name, old_f[f.name].dataType, f.nullable,
                            f.metadata) if f.name in narrow else f
                for f in schema.fields])
            drift = classify_schema_drift(existing, schema)
    if not (drift["added"] or drift["removed"] or drift["changed"]
            or drift["widened"]):
        return existing
    if on_drift == "fail":
        raise SchemaDriftError(
            f"schema drift vs manifest table {path}: {drift} "
            "(.option('onDrift', 'evolve') admits additive/widening drift)")
    return evolve_schema(existing, schema, allow_widening=True)


def _check_write_drift(path: str, schema: StructType,
                       on_drift: str) -> StructType:
    """Job-start fail-fast form of :func:`_govern_stamp` (governance
    re-runs per claim attempt at commit time regardless)."""
    return _govern_stamp(_committed_schema(path), schema, on_drift, path)


def _parse_on_drift(options: dict) -> str:
    """Validate at WRITER CONSTRUCTION, consistent with the statsCols and
    streamId probes: a typo'd onDrift must fail at query start, not days
    later at the first commit that actually sees drift."""
    v = options.get("ondrift", "fail")
    if v not in ("fail", "evolve"):
        raise ValueError(f"onDrift must be 'fail' or 'evolve', got {v!r}")
    return v


@dataclass
class _WroteFiles(WriterCommitMessage):
    # parquet FILE relpaths inside per-attempt dirs (both writers): each
    # task attempt writes into its own fresh dir, so a failed/speculative
    # attempt's leftover file is never reported and never referenced —
    # the driver's commit renames only the reported files into the final
    # commit dir, so retries cannot surface duplicate or torn rows
    files: list = field(default_factory=list)
    rows: int = 0
    # per-column [min, max] observed by this task (JSON-plain values)
    stats: dict = field(default_factory=dict)
    # per-column NULL counts observed by this task (statsCols only)
    nulls: dict = field(default_factory=dict)




def _write_task_file(iterator, out_dir: str,
                     stats_cols: list[str]) -> tuple[bool, str, int, dict]:
    """Stream one task's record batches into a single parquet file under
    ``out_dir`` (created lazily — an empty task creates nothing), folding
    per-column min/max INLINE for ``stats_cols``. Returns
    (wrote, file_name, rows, stats). Shared by the batch and streaming
    writers so write-path fixes and the stats fold stay in one place."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from cdc_audit_spark.sinks.manifest import _plain

    name = f"part-{uuid.uuid4().hex}.parquet"
    writer = None
    rows = 0
    stats: dict = {}
    nulls: dict = {}
    try:
        for batch in iterator:
            if writer is None:
                os.makedirs(out_dir, exist_ok=True)
                writer = pq.ParquetWriter(
                    os.path.join(out_dir, name), batch.schema)
            writer.write_batch(batch)
            rows += len(batch)
            for c in stats_cols:
                col = batch.column(c)
                nulls[c] = nulls.get(c, 0) + col.null_count
                mm = pc.min_max(col)
                lo = _plain(mm["min"].as_py())
                hi = _plain(mm["max"].as_py())
                if lo is None:
                    continue
                prev = stats.get(c)
                stats[c] = ([lo, hi] if prev is None
                            else [min(prev[0], lo), max(prev[1], hi)])
    finally:
        if writer is not None:
            writer.close()
    return writer is not None, name, rows, stats, nulls


def _parse_stats_cols(options: dict, schema: StructType) -> list[str]:
    cols = [c.strip() for c in options.get("statscols", "").split(",")
            if c.strip()]
    missing = [c for c in cols if c not in set(schema.fieldNames())]
    if missing:
        raise ValueError(f"statsCols not in schema: {missing}")
    return cols


def _write_attempt(path: str, iterator, stats_cols: list[str]) -> _WroteFiles:
    """Executor side, shared by both writers: stream this task attempt's
    batches into one parquet file inside a fresh attempt dir. Only the
    returned (reported) file can ever reach a commit; a failed attempt's
    partial file stays stranded in its own dir, vacuum-reclaimable."""
    rel = os.path.join(_DATA_DIR, f"c-{uuid.uuid4().hex}")
    wrote, name, rows, stats, nulls = _write_task_file(
        iterator, os.path.join(path, rel), stats_cols)
    return _WroteFiles(files=[os.path.join(rel, name)] if wrote else [],
                       rows=rows, stats=stats, nulls=nulls)


def _reclaim_attempts(path: str, messages) -> None:
    """Remove the attempt dirs the messages report (job abort, replayed
    epoch). Unreported attempts stay as orphans for vacuum."""
    import shutil

    for m in messages or []:
        for f in (m.files if m is not None else []):
            shutil.rmtree(os.path.join(path, os.path.dirname(f)),
                          ignore_errors=True)


def _coalesce_commit_dir(path: str, messages,
                         schema: StructType) -> tuple[str, dict, dict,
                                                      list]:
    """Driver side, shared by both writers: move every REPORTED task file
    into one fresh commit dir (same-filesystem renames — the attempt
    dirs exist only to isolate failed attempts) and merge the tasks'
    inline stats (min/max hulls, null-count sums) into that dir's
    stats, so the manifest's dirs list grows by ONE per commit
    regardless of the job's task count. An all-empty write materializes
    the schema as a single empty parquet file so reads stay well-formed.
    Returns (rel_dir, merged_stats, merged_nulls, file_names) — the
    names are recorded in dir_meta so readers discover files from the
    manifest alone, never LISTing the data path."""
    import contextlib

    rel = os.path.join(_DATA_DIR, f"c-{uuid.uuid4().hex}")
    out_dir = os.path.join(path, rel)
    os.makedirs(out_dir, exist_ok=True)
    merged: dict = {}
    nulls: dict = {}
    names: list = []
    for m in messages or []:
        if m is None:
            continue
        for f in m.files:
            os.rename(os.path.join(path, f),
                      os.path.join(out_dir, os.path.basename(f)))
            names.append(os.path.basename(f))
            with contextlib.suppress(OSError):  # non-empty: leave for gc
                os.rmdir(os.path.join(path, os.path.dirname(f)))
        for c, (lo, hi) in (getattr(m, "stats", None) or {}).items():
            prev = merged.get(c)
            merged[c] = ([lo, hi] if prev is None
                         else [min(prev[0], lo), max(prev[1], hi)])
        for c, n in (getattr(m, "nulls", None) or {}).items():
            nulls[c] = nulls.get(c, 0) + int(n)
    if not names:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        pq.write_table(
            pa.table({f.name: [] for f in schema.fields},
                     schema=to_arrow_schema(schema)),
            os.path.join(out_dir, "part-empty.parquet"))
        names.append("part-empty.parquet")
    return rel, merged, nulls, sorted(names)



class ManifestTableWriter(DataSourceArrowWriter):
    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError(
                "manifest_table requires .option('path', <table dir>)")
        self.path = path
        self.overwrite = overwrite
        self.schema = schema
        self.on_drift = _parse_on_drift(options)
        # columns whose per-dir min/max ride into the manifest for
        # read-side pruning — computed INLINE by each task while it
        # writes (no extra pass), committed per task dir
        self.stats_cols = _parse_stats_cols(options, schema)
        from cdc_audit_spark.sinks.manifest import current_committed_version

        self.base_version = current_committed_version(path)
        if not overwrite:  # fail-fast; governance re-runs at commit time
            _check_write_drift(path, schema, self.on_drift)

    def write(self, iterator):
        return _write_attempt(self.path, iterator, self.stats_cols)

    def commit(self, messages):
        import shutil

        from cdc_audit_spark.sinks.manifest import ManifestTable

        rel, stats, nulls, names = _coalesce_commit_dir(
            self.path, messages, self.schema)
        from cdc_audit_spark.sinks.manifest import _dir_file_stats

        fstats = _dir_file_stats(self.path, rel)
        t = ManifestTable(None, self.path)

        def extra_fn(pm):
            # re-derived per claim attempt: a rebase retry must govern
            # against the parent it actually lands on, or a concurrent
            # evolve is re-stamped away by this job's stale schema copy
            stamp = (self.schema if self.overwrite
                     else _govern_stamp(_parent_schema(pm, self.path),
                                        self.schema, self.on_drift,
                                        self.path))
            dm = dict(fstats)  # files + footer rows/bytes: metadata
            # row_count works for format-written tables too
            if stats:
                dm["stats"] = stats
            if nulls:
                dm["nulls"] = nulls
            return {"schema": stamp.json(), "dir_meta": {rel: dm}}

        try:
            if self.overwrite:
                t._commit("overwrite", lambda parent: [rel],
                          max_retries=1, extra=extra_fn,
                          expected_parent=self.base_version)
            else:
                t._commit(
                    "append",
                    lambda parent: (parent["dirs"] if parent else []) + [rel],
                    extra=extra_fn)
        except BaseException:
            # failed commit (conflict, governance refusal): the coalesced
            # dir is this job's data and nothing references it — remove
            # it now rather than leaving an orphan for vacuum
            shutil.rmtree(os.path.join(self.path, rel), ignore_errors=True)
            raise

    def abort(self, messages):
        _reclaim_attempts(self.path, messages)


class ManifestTableStreamWriter(DataSourceStreamArrowWriter):
    """``df.writeStream.format("manifest_table")`` — each micro-batch is
    one atomic epoch-tagged append commit: every task ATTEMPT writes its
    record batches into its own fresh attempt dir (invisible until
    committed), the driver coalesces the reported files into one commit
    dir per epoch, and a single manifest claim carries the epoch — so a
    replayed epoch is detected via ``epoch_applied`` and skipped:
    exactly-once without a cross-system transaction. ``abort`` removes
    the epoch's attempt dirs (also vacuum-reclaimable as unreferenced
    orphans).

    ``.option("streamId", <stable id>)`` is REQUIRED: epoch ids are
    scoped to the consumer's CHECKPOINT, so a fresh checkpoint restarted
    against a surviving table would replay epoch 0 and be silently
    skipped by a bare epoch comparison — the recorded run identity makes
    that mismatch fail loudly instead (GenerationRunMismatch), the same
    contract as the foreachBatch drains. Use one streamId per
    (checkpoint, table) pairing and change it only when deleting both.
    """

    def __init__(self, options: dict, schema: StructType):
        path = options.get("path")
        if not path:
            raise ValueError(
                "manifest_table requires .option('path', <table dir>)")
        if not options.get("streamid"):
            raise ValueError(
                "streaming writes to manifest_table require "
                ".option('streamId', <stable id>): epoch ids are "
                "checkpoint-scoped, and without a recorded run identity a "
                "fresh checkpoint against a surviving table silently "
                "skips its replayed batches (data loss). Pick any stable "
                "string tied to the checkpoint's lifetime.")
        self.path = path
        self.run_id = options["streamid"]
        self.schema = schema
        self.on_drift = _parse_on_drift(options)
        self.stats_cols = _parse_stats_cols(options, schema)
        _check_write_drift(path, schema, self.on_drift)
        # fail the MISCONFIGURED stream at start, not at its first
        # commit after a full write stage (and even an idle source never
        # reaches a commit): probing last_epoch raises
        # GenerationRunMismatch if the table belongs to another stream
        from cdc_audit_spark.sinks.manifest import ManifestTable

        ManifestTable(None, path).last_epoch(self.run_id)

    def write(self, iterator):
        return _write_attempt(self.path, iterator, self.stats_cols)

    def commit(self, messages, batchId: int) -> None:
        import shutil

        from cdc_audit_spark.sinks.manifest import ManifestTable

        t = ManifestTable(None, self.path)
        if t.epoch_applied(batchId, self.run_id):
            # crash landed after the commit but before the checkpoint:
            # the replayed epoch's rewritten files are redundant orphans
            _reclaim_attempts(self.path, messages)
            return
        if not any(m is not None and m.files for m in messages):
            return  # empty epoch: nothing to make durable
        rel, stats, nulls, names = _coalesce_commit_dir(
            self.path, messages, self.schema)
        from cdc_audit_spark.sinks.manifest import _dir_file_stats

        fstats = _dir_file_stats(self.path, rel)

        class _AlreadyApplied(Exception):
            pass

        def dirs_fn(parent):
            # re-validate INSIDE the claim loop: a zombie driver sharing
            # this streamId (failover) may have committed the epoch
            # between our check above and the claim — sync_audit's
            # pattern; without this both drivers' rebase-appends land and
            # the epoch's rows duplicate
            if t.epoch_applied(batchId, self.run_id):
                raise _AlreadyApplied()
            return (parent["dirs"] if parent else []) + [rel]

        def extra_fn(pm):
            # schema stamp re-governed per claim attempt (see the batch
            # writer): a concurrent evolve landing mid-epoch must not be
            # regressed by this stream's stale schema copy on rebase
            stamp = _govern_stamp(_parent_schema(pm, self.path),
                                  self.schema, self.on_drift, self.path)
            dm = dict(fstats)  # files + footer rows/bytes
            if stats:
                dm["stats"] = stats
            if nulls:
                dm["nulls"] = nulls
            return {"schema": stamp.json(),
                    "epoch": int(batchId), "run_id": self.run_id,
                    "dir_meta": {rel: dm}}

        try:
            t._commit("append", dirs_fn, extra=extra_fn)
        except _AlreadyApplied:
            # the rival's copy of this epoch is durable; ours is redundant
            shutil.rmtree(os.path.join(self.path, rel), ignore_errors=True)
        except BaseException:
            shutil.rmtree(os.path.join(self.path, rel), ignore_errors=True)
            raise

    def abort(self, messages, batchId: int) -> None:
        _reclaim_attempts(self.path, messages)


class ManifestTableDataSource(DataSource):
    """``spark.read.format("manifest_table")`` /
    ``df.write.format("manifest_table")`` after
    :func:`register_manifest_table`."""

    @classmethod
    def name(cls) -> str:
        return "manifest_table"

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError(
                "manifest_table requires .option('path', <table dir>)")
        sch = _committed_schema(path)
        if sch is None:
            raise ValueError(
                f"no committed schema at {path}: the table has no commits "
                "yet (write first, or pass .schema())")
        return sch

    def reader(self, schema: StructType) -> ManifestTableReader:
        return ManifestTableReader(dict(self.options), schema)

    def writer(self, schema: StructType, overwrite: bool):
        return ManifestTableWriter(dict(self.options), schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        if overwrite:
            raise ValueError(
                "manifest_table streaming writes are append-only "
                "(outputMode 'append'); complete/update modes would "
                "rewrite state per epoch — use foreachBatch + "
                "ManifestTable.merge_audit for keyed state")
        return ManifestTableStreamWriter(dict(self.options), schema)


def register_manifest_table(spark) -> None:
    """Idempotently register the ``manifest_table`` format."""
    spark.dataSource.register(ManifestTableDataSource)
