"""Structured-Streaming source over a ManifestTable: commits as offsets.

Closes the sink/source loop for the transactional table
(``sinks.manifest``): a table written by ``sync_audit`` / ``append`` /
the streaming drains is ALSO a streaming source for downstream Spark
consumers — the reference's audit-table-as-stream semantic (tail the
audit log, cdc_audit_sync_mysql.php's consumer loop) lifted to the file
level, with the manifest's own commit versions as the offset axis:

* ``initialOffset``  -> {"version": startingVersion (default 0)}
* ``latestOffset``   -> {"version": current committed version}
* a micro-batch (v0, v1] reads exactly the data dirs those commits
  INTRODUCED (the ``added`` list each manifest records), one input
  partition per dir — so a consumer never re-reads dirs it has seen,
  and the work per batch is proportional to the new commits only.

Append-action commits stream their added dirs. Overwrite-action commits
(compact / repair / full overwrite) are REWRITES of existing content,
not new rows — streaming them would re-emit the whole table — so they
are skipped, exactly like file-compaction is invisible to log consumers
in public table formats' change feeds. Merge-action commits
(``merge_audit`` pruned=True) are DIFFERENT: their rewritten dirs mix
genuinely new delta rows with carried-over old rows, so neither
emitting them (old-row duplicates) nor skipping them (silent change
loss) is change-feed-correct. A replica written with
``merge_audit(change_feed=True)`` records each merge's APPLIED delta in
the same commit (``cdc_dirs``) — ``.option("changeFeed", "true")``
streams exactly those rows (events included; plain appends read as
``audit_event='insert'`` rows, the Delta-CDF ``_change_type`` analog).
Without a recorded feed the source FAILS LOUDLY on a merge commit; a
consumer that knowingly wants append-only semantics can opt into
skipping with ``.option("skipMerges", "true")``, or tail the AUDIT
table feeding the merge instead (it IS the change feed).

Executors read the parquet files with pyarrow and yield Arrow record
batches (the vectorized path of the Python DataSource API) — no
row-at-a-time Python. Offsets live in the consumer's checkpoint;
deterministic (version-range -> dirs) mapping makes replay exact.

Scale note: partitions() lists only the NEW commits' dirs per batch
(O(delta)); at 1000 executors each dir's files fan out as independent
partitions. Works under ``trigger(availableNow=True)`` (drain-and-stop)
as well as continuous micro-batching. A consumer whose checkpointed
offset predates the table's manifest retention (vacuum dropped the
commits it still needed) fails LOUDLY with FileNotFoundError rather
than silently skipping — retention must outlive the slowest consumer,
the same contract public change feeds carry.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

__all__ = [
    "ManifestStreamDataSource",
    "register_manifest_stream",
    "read_manifest_stream",
]

_MANIFEST_DIR = "_manifests"


def _versions(table_path: str) -> list[int]:
    from cdc_audit_spark.sinks.manifest import _list_versions

    return _list_versions(table_path)


def _manifest(table_path: str, version: int) -> dict:
    for prefix in ("m-", "ckpt-"):
        p = os.path.join(table_path, _MANIFEST_DIR,
                         f"{prefix}{version:012d}.json")
        try:
            with open(p) as f:
                return json.load(f)
        except FileNotFoundError:
            continue
    raise FileNotFoundError(
        f"manifest version {version} not found at {table_path} (vacuumed? "
        "the consumer's checkpointed offset predates the table's retention)")


class ManifestFilesPartition(InputPartition):
    """One committed data dir's parquet files (absolute paths).
    ``fill`` optionally maps declared-schema columns MISSING from the
    files to a constant (change-feed tagging of plain appends)."""

    def __init__(self, files: list[str], fill: dict | None = None):
        self.files = files
        self.fill = fill


class ManifestStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, schema: StructType):
        path = options.get("path")
        if not path:
            raise ValueError(
                "manifest_stream requires .option('path', <table dir>)")
        self.path = path
        self.start_version = int(options.get("startingversion", 0))
        sm = options.get("skipmerges", "false").lower()
        if sm not in ("true", "false"):
            raise ValueError(f"skipMerges must be true/false, got {sm!r}")
        self.skip_merges = sm == "true"
        cf = options.get("changefeed", "false").lower()
        if cf not in ("true", "false"):
            raise ValueError(f"changeFeed must be true/false, got {cf!r}")
        self.change_feed = cf == "true"
        mvpt = options.get("maxversionspertrigger")
        self.max_versions = int(mvpt) if mvpt is not None else None
        if self.max_versions is not None and self.max_versions < 1:
            raise ValueError(
                f"maxVersionsPerTrigger must be >= 1, got {mvpt!r}")
        # floor for the rate cap: the newest version this reader has
        # already planned. None until a real floor is known — set by
        # initialOffset() (only called on a fresh start, and AFTER the
        # first latestOffset) or partitions() (every planned batch
        # end). The cap MUST NOT apply while None: the engine calls
        # latestOffset() before the reader can see the batch start
        # (the checkpointed offset on a restart reaches it only via
        # partitions(start=..)), so a cap floored at start_version
        # could return an offset BELOW a restart's checkpoint — Spark
        # would plan a backward batch, commit the regressed offset,
        # and replay already-emitted versions as duplicates. The first
        # trigger of a run therefore drains uncapped BY DESIGN; every
        # subsequent trigger is bounded.
        self._planned_floor: int | None = None
        # audit column names resolved ONCE, consistent with the stream's
        # fixed declared schema (also resolved at start): tables whose
        # merges recorded custom templating via cdc_audit_cols tag their
        # plain-append fill rows with the right event column name
        self.audit_cols = (_audit_col_names(self.path)
                           if self.change_feed else None)
        self.spark_schema = schema

    def initialOffset(self) -> dict:
        # only called on a FRESH start (no checkpointed offset): the
        # rate cap may safely floor at start_version from here on —
        # this covers the empty-first-trigger case where partitions()
        # never runs. A restart skips this call, leaving the floor
        # None until partitions() observes the checkpointed window.
        if self._planned_floor is None:
            self._planned_floor = self.start_version
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        # pointer + forward probe (O(1 + lag) stats): this runs once per
        # micro-batch, and a full _manifests/ listing per tick would grow
        # with table age on never-vacuumed tables
        from cdc_audit_spark.sinks.manifest import current_committed_version

        v = current_committed_version(self.path)
        if v is None:
            return {"version": self.start_version}
        if self.max_versions is not None and self._planned_floor is not None:
            # rate limit (the maxFilesPerTrigger analog): admit at most
            # N commit versions per micro-batch so a consumer catching
            # up on a long backlog processes it in bounded batches
            # instead of one giant one. Capped against the newest
            # version this reader has planned; until partitions() has
            # observed a planned end (fresh start OR restart) the cap
            # is skipped entirely — see __init__: capping against
            # start_version on a restart can regress below the
            # checkpointed offset and replay duplicates.
            v = min(v, self._planned_floor + self.max_versions)
        return {"version": v}

    def partitions(self, start: dict, end: dict):
        from cdc_audit_spark.sources.manifest_table import _dir_files

        self._planned_floor = max(self._planned_floor or 0,
                                  int(end["version"]))
        parts = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            m = _manifest(self.path, v)
            if m["action"] != "append":
                # overwrite rewrites (compact/repair) are not new rows —
                # invisible, like any change feed. A MERGE commit's dirs
                # mix new delta rows with carried old rows: its APPLIED
                # delta is only streamable when the writer recorded it
                # (merge_audit(change_feed=True) -> cdc_dirs); otherwise
                # neither emitting (duplicates) nor silently skipping
                # (lost changes) is correct — refuse unless the consumer
                # opted into append-only semantics explicitly. Both merge
                # modes commit action 'merge' when they hide a nonempty
                # delta, but LEGACY tables may hold non-pruned feed
                # merges as action 'overwrite', so feed handling keys on
                # cdc_dirs (only merges write it), never on the action
                # string
                if self.change_feed and "cdc_dirs" in m:
                    cdc_meta = m.get("cdc_meta", {})
                    for d in m["cdc_dirs"]:
                        parts.extend(
                            ManifestFilesPartition([f])
                            for f in _dir_files(self.path, d, cdc_meta))
                    continue
                if "cdc_dirs" in m and not self.skip_merges:
                    raise ValueError(
                        f"version {v} at {self.path} is a merge "
                        "commit WITH a recorded change feed, but "
                        "this stream was opened without it — pass "
                        ".option('changeFeed', 'true') to consume "
                        "the feed, or .option('skipMerges', 'true') "
                        "to knowingly receive only plain appends.")
                if m["action"] == "merge" and not self.skip_merges:
                    raise ValueError(
                        f"version {v} at {self.path} is a merge commit "
                        "with no recorded change feed: its dirs mix new "
                        "delta rows with rewritten old rows, so a change "
                        "feed can neither emit nor silently skip it. "
                        "Write the replica with merge_audit("
                        "change_feed=True) and read with .option("
                        "'changeFeed', 'true'), stream the AUDIT table "
                        "feeding the merge instead, or pass .option("
                        "'skipMerges', 'true') to knowingly receive only "
                        "plain appends.")
                if m["action"] == "restore" and not self.skip_merges:
                    # a rollback rewrites content to an old version with
                    # no expressible delta — neither emit nor skip is
                    # correct for a feed consumer
                    raise ValueError(
                        f"version {v} at {self.path} is a RESTORE "
                        "commit: the table rolled back and this stream's "
                        "already-emitted rows cannot be retracted. "
                        "Restart the consumer from a startingVersion at "
                        "or after the restore, or pass .option("
                        "'skipMerges', 'true') to knowingly receive "
                        "only plain appends.")
                if m["action"] == "delete" and not self.skip_merges:
                    # a deletion-vector commit changes content without
                    # touching dirs — invisible to an append stream, but
                    # NOT a no-op like compaction; silently skipping it
                    # would hide the deletes from feed consumers
                    raise ValueError(
                        f"version {v} at {self.path} is a deletion-"
                        "vector commit with no recorded change feed. "
                        "Write it with delete_where(change_feed=True) "
                        "and read with .option('changeFeed', 'true'), "
                        "or pass .option('skipMerges', 'true') to "
                        "knowingly receive only plain appends.")
                continue
            dir_meta = m.get("dir_meta", {})
            # plain appends in changeFeed mode read as inserts: files
            # lacking the audit columns get the EVENT column (by its
            # recorded name, not a hardcoded default) filled with
            # 'insert', pk/timestamp NULL (Delta-CDF's _change_type)
            fill = ({self.audit_cols["event"]: "insert"}
                    if self.change_feed else None)
            for d in self._added_dirs(m):
                # one partition per FILE (matching the batch reader): a
                # commit dir holds one file per writing task, so the
                # consumer's read parallelism tracks the producer's.
                # File names come from the manifest when recorded (no
                # LIST on the data path), else one legacy listdir.
                parts.extend(ManifestFilesPartition([f], fill)
                             for f in _dir_files(self.path, d, dir_meta))
        return parts

    def _added_dirs(self, m: dict) -> list[str]:
        """The dirs commit ``m`` introduced. Manifests record this as
        ``added``; for a legacy manifest the parent diff reconstructs it
        — and a vacuumed parent fails LOUDLY rather than falling back to
        the cumulative dir list, which would re-emit every inherited
        dir's rows (silent duplicates)."""
        if "added" in m:
            return m["added"]
        if m.get("parent") is None:
            return m["dirs"]
        try:
            parent_dirs = set(_manifest(self.path, m["parent"])["dirs"])
        except FileNotFoundError as e:
            raise FileNotFoundError(
                f"cannot stream version {m['version']} at {self.path}: the "
                "manifest predates the 'added' record and its parent "
                f"manifest {m['parent']} was vacuumed — the commit's delta "
                "is unrecoverable; restart the consumer from a newer "
                "startingVersion"
            ) from e
        return [d for d in m["dirs"] if d not in parent_dirs]

    def read(self, partition: ManifestFilesPartition):
        # cast to the DECLARED schema's arrow form: parquet-native types
        # (e.g. nanosecond/INT96 timestamps) are not all ingestible by
        # Spark's arrow path, column order must match the plan, and
        # pre-evolution files surface NULLs for later-added columns
        from cdc_audit_spark.sources.manifest_table import _arrow_batches

        yield from _arrow_batches(partition.files, self.spark_schema,
                                  getattr(partition, "fill", None))

    def commit(self, end: dict) -> None:
        pass  # offsets live in the consumer's checkpoint


def _newest_payload(path: str, key: str):
    """The newest manifest's value for ``key``, or None. Inherited state
    keys (cdc_schema / cdc_audit_cols — manifest._STATE_KEYS) resolve
    from the current committed version in O(1); the remaining walk only
    covers legacy tables whose feed predates the inheritance."""
    from cdc_audit_spark.sinks.manifest import current_committed_version

    cur = current_committed_version(path)

    def walk():  # lazy: the fast path must not pay the full listing
        if cur is not None:
            yield cur
        for v in reversed(_versions(path)):
            if v != cur:
                yield v

    for v in walk():
        m = _manifest(path, v)
        if key in m:
            return m[key]
    return None


def _audit_col_names(path: str) -> dict:
    """The audit column names the table's change feed uses — recorded by
    merge_audit as ``cdc_audit_cols``; the reference's default templating
    (schema.AUDIT_COLUMN_NAMES) for tables that never recorded them."""
    from cdc_audit_spark.schema import AUDIT_EVENT, AUDIT_PK, AUDIT_TIMESTAMP

    default = {"event": AUDIT_EVENT, "pk": AUDIT_PK, "ts": AUDIT_TIMESTAMP}
    recorded = _newest_payload(path, "cdc_audit_cols")
    return {**default, **recorded} if recorded else default


def _change_feed_schema(path: str, base: StructType) -> StructType:
    """The changeFeed-mode declared schema: the newest recorded
    ``cdc_schema`` (the applied delta's exact shape — state columns plus
    audit columns) when any merge has written one; otherwise the table
    schema widened with the three audit columns (by their recorded
    names) so plain appends still read as tagged inserts."""
    import json

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        TimestampType,
    )

    from cdc_audit_spark.sources.manifest_table import _all_nullable

    recorded = _newest_payload(path, "cdc_schema")
    if recorded is not None:
        return _all_nullable(StructType.fromJson(json.loads(recorded)))
    cols = _audit_col_names(path)
    fields = list(base.fields)
    names = {f.name for f in fields}
    # reference order: event, timestamp, pk (schema.AUDIT_COLUMNS)
    for name, typ in ((cols["event"], StringType()),
                      (cols["ts"], TimestampType()),
                      (cols["pk"], LongType())):
        if name not in names:
            fields.append(StructField(name, typ, True))
    return StructType(fields)


class ManifestStreamDataSource(DataSource):
    """``spark.readStream.format("manifest_stream").option("path", p)``
    after :func:`register_manifest_stream`."""

    @classmethod
    def name(cls) -> str:
        return "manifest_stream"

    def schema(self) -> StructType:
        from cdc_audit_spark.sources.manifest_table import _committed_schema

        path = self.options.get("path")
        if not path:
            raise ValueError(
                "manifest_stream requires .option('path', <table dir>)")
        sch = _committed_schema(path)  # all-nullable: mergeSchema semantics
        if sch is None:
            raise ValueError(
                f"no committed schema at {path}: the table has no commits "
                "yet (start the stream after the first commit, or pass "
                ".schema())")
        if self.options.get("changefeed", "false").lower() == "true":
            return _change_feed_schema(path, sch)
        return sch

    def streamReader(self, schema: StructType) -> ManifestStreamReader:
        return ManifestStreamReader(dict(self.options), schema)


def register_manifest_stream(spark) -> None:
    """Idempotently register the ``manifest_stream`` format."""
    spark.dataSource.register(ManifestStreamDataSource)


def read_manifest_stream(spark, table_path: str,
                         starting_version: int = 0,
                         change_feed: bool = False):
    """Convenience: a streaming DataFrame over the table's commits.
    ``change_feed=True`` streams the CDC feed instead of raw appends:
    merge commits written with ``merge_audit(change_feed=True)`` emit
    their applied delta (events included), plain appends read as
    ``audit_event='insert'`` rows."""
    register_manifest_stream(spark)
    return (spark.readStream.format("manifest_stream")
            .option("path", table_path)
            .option("startingVersion", starting_version)
            .option("changeFeed", str(change_feed).lower())
            .load())
