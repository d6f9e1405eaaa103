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
loss) is change-feed-correct — the source FAILS LOUDLY when it
encounters one. A consumer that knowingly wants append-only semantics
over a merge-maintained table can opt into skipping with
``.option("skipMerges", "true")``; to stream a replica's changes, tail
the AUDIT table feeding the merge instead (it IS the change feed).

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
    mdir = os.path.join(table_path, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    return sorted(
        int(n[2:-5]) for n in os.listdir(mdir)
        if n.startswith("m-") and n.endswith(".json")
    )


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
    """One committed data dir's parquet files (absolute paths)."""

    def __init__(self, files: list[str]):
        self.files = files


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
        self.spark_schema = schema

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        # pointer + forward probe (O(1 + lag) stats): this runs once per
        # micro-batch, and a full _manifests/ listing per tick would grow
        # with table age on never-vacuumed tables
        from cdc_audit_spark.sinks.manifest import current_committed_version

        v = current_committed_version(self.path)
        return {"version": v if v is not None else self.start_version}

    def partitions(self, start: dict, end: dict):
        parts = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            m = _manifest(self.path, v)
            if m["action"] != "append":
                # overwrite rewrites (compact/repair) are not new rows —
                # invisible, like any change feed. A MERGE commit's dirs
                # mix new delta rows with carried old rows: emitting
                # duplicates, skipping loses changes — refuse unless the
                # consumer opted into append-only semantics explicitly
                if m["action"] == "merge" and not self.skip_merges:
                    raise ValueError(
                        f"version {v} at {self.path} is a merge commit: "
                        "its dirs mix new delta rows with rewritten old "
                        "rows, so a change feed can neither emit nor "
                        "silently skip it. Stream the AUDIT table feeding "
                        "the merge instead (it is the change feed), or "
                        "pass .option('skipMerges', 'true') to knowingly "
                        "receive only plain appends.")
                continue
            from cdc_audit_spark.sources.manifest_table import _dir_files

            dir_meta = m.get("dir_meta", {})
            for d in self._added_dirs(m):
                # one partition per FILE (matching the batch reader): a
                # commit dir holds one file per writing task, so the
                # consumer's read parallelism tracks the producer's.
                # File names come from the manifest when recorded (no
                # LIST on the data path), else one legacy listdir.
                parts.extend(ManifestFilesPartition([f])
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

        yield from _arrow_batches(partition.files, self.spark_schema)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the consumer's checkpoint


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
        return sch

    def streamReader(self, schema: StructType) -> ManifestStreamReader:
        return ManifestStreamReader(dict(self.options), schema)


def register_manifest_stream(spark) -> None:
    """Idempotently register the ``manifest_stream`` format."""
    spark.dataSource.register(ManifestStreamDataSource)


def read_manifest_stream(spark, table_path: str,
                         starting_version: int = 0):
    """Convenience: a streaming DataFrame over the table's commits."""
    register_manifest_stream(spark)
    return (spark.readStream.format("manifest_stream")
            .option("path", table_path)
            .option("startingVersion", starting_version)
            .load())
