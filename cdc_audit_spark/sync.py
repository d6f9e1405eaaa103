"""Incremental audit-table sync — the Spark re-expression of
cdc_audit_sync_mysql.php.

Reference behavior per table (sync:238-265): recover the watermark from the
sink's last CSV line (sync:341-386), scan ``audit_pk > watermark``
(sync:243), append rows to the CSV with a header on first write
(sync:245-258, 324-335).

Spark mapping:
  * watermark recovery — a small JSON state file written atomically beside
    the sink (stronger than the reference's tail-read, which it documents as
    corruptible, README:213-215); parity-mode fallback recovers by scanning
    ``max(audit_pk)`` over the sink (≡ the tail read, A2).
  * incremental scan — ``filter(audit_pk > lit(wm))``: pushdown-eligible, so
    a parquet/JDBC source skips already-synced data (O2). Verified in tests
    via the plan's PushedFilters.
  * append — ``df.write.mode('append')``; Spark writes one file per
    partition, so parity is at the dataset level, not the byte level
    (SURVEY §7.2). CSV part files each carry a header; reading back with
    header=True round-trips.

At 100 TB the sync is embarrassingly parallel: the filter prunes at the
source, no shuffle occurs anywhere in the path (scan → filter → write), and
the only aggregate (new watermark) is a map-side max.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_audit_spark.schema import (
    AUDIT_PK,
    SchemaDriftError,
    classify_schema_drift,
    evolve_schema,
)

__all__ = ["sync_table", "sync_many", "get_watermark", "SyncResult",
           "table_checksum", "verify_sink", "expected_sink_content",
           "record_compaction", "get_sync_state", "repair_sink", "SyncManyError",
           "text_read_options", "text_write_options"]

_STATE_FILE = "_cdc_watermark.json"

# Spark's default text timestampFormat keeps only milliseconds, silently
# truncating the microsecond precision of F.current_timestamp() audit
# timestamps — which would make a faithful CSV/JSON sink checksum-diverge
# from its source. Write AND read text sinks with full microseconds.
_TEXT_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

# Spark CSV writes NULL and '' identically by default and reads both back
# as NULL, so a source row containing an empty string would always
# checksum-diverge from its re-read sink and --verify --repair could never
# converge.
# Write NULL as the MySQL-style \N sentinel and '' as a quoted empty field;
# read maps \N back to NULL and the quoted empty back to ''. Caveat
# (documented, matching the MySQL convention): a literal string value
# '\\N' is indistinguishable from NULL on re-read.
_CSV_NULL = r"\N"


def text_write_options(writer, fmt: str):
    """Apply this package's text-sink write conventions (header, µs
    timestamps, NULL/empty-string sentinels) to a DataFrameWriter. Every
    CSV/JSON producer in the package — batch sync, repair, streaming
    drains — must route through this so read_sink round-trips bytes it
    wrote under any producer."""
    if fmt == "csv":
        writer = (writer.option("header", True)
                        .option("nullValue", _CSV_NULL)
                        .option("emptyValue", '""'))
    if fmt in _TEXT_FORMATS:
        writer = writer.option("timestampFormat", _TEXT_TS_FORMAT)
    return writer


def text_read_options(reader, fmt: str):
    """The read-side mirror of text_write_options (emptyValue stays unset:
    the univocity parser already yields '' for a quoted empty field and
    NULL for \\N under these options)."""
    if fmt == "csv":
        reader = reader.option("header", True).option("nullValue", _CSV_NULL)
    if fmt in _TEXT_FORMATS:
        reader = reader.option("timestampFormat", _TEXT_TS_FORMAT)
    return reader


@dataclass
class SyncResult:
    rows_synced: int
    watermark: int
    sink_path: str


def _state_path(sink_path: str) -> str:
    return os.path.join(sink_path, _STATE_FILE)


def get_sync_state(sink_path: str) -> dict:
    """The sink's full state payload ({} when no state file exists)."""
    sp = _state_path(sink_path)
    if not os.path.exists(sp):
        return {}
    with open(sp) as f:
        return json.load(f)


def _write_state(sink_path: str, watermark: int, extra: dict | None = None) -> None:
    """Atomic write (tmp + rename) — the locking the reference lacks
    (README:213-215). Merges over the existing payload so advancing the
    watermark never drops other recorded facts (e.g. a compaction)."""
    os.makedirs(sink_path, exist_ok=True)
    state = {**get_sync_state(sink_path), "watermark": watermark, **(extra or {})}
    fd, tmp = tempfile.mkstemp(dir=sink_path, prefix=".wm_")
    with os.fdopen(fd, "w") as f:
        json.dump(state, f)
    os.replace(tmp, _state_path(sink_path))


def record_compaction(
    sink_path: str, through: int, pk_cols: list[str] | None = None
) -> None:
    """Record that the sink was keep-last compacted over everything up to
    ``audit_pk <= through`` (compact_log calls this after its rewrite —
    which also restores the watermark the overwrite deleted). The record
    lets a later ``verify_sink`` reconstruct the expected sink content
    instead of reporting the wipe as corruption."""
    _write_state(sink_path, through,
                 extra={"compacted": {"through": through, "pk_cols": pk_cols}})


def expected_sink_content(audit_df: DataFrame, sink_path: str) -> DataFrame:
    """What an uncorrupted sink must contain, given its recorded history:
    everything, unless a compaction is recorded — then the keep-last
    survivors of rows up to the wipe boundary plus all later rows verbatim.
    (This algebra is stable across repeated wipes: re-compacting an
    already-compacted sink keeps the same per-key/global last rows.)"""
    comp = get_sync_state(sink_path).get("compacted")
    if not comp:
        return audit_df
    from cdc_audit_spark.compact import keep_last, keep_last_per_key

    through = int(comp["through"])
    pre = audit_df.filter(F.col(AUDIT_PK) <= through)
    pre = (keep_last_per_key(pre, comp["pk_cols"]) if comp.get("pk_cols")
           else keep_last(pre))
    return pre.unionByName(audit_df.filter(F.col(AUDIT_PK) > through))


def get_watermark(
    spark: SparkSession,
    sink_path: str,
    fmt: str = "csv",
    recover_from_sink: bool = True,
) -> int:
    """Current high watermark of a sink: state file first, else recovered by
    scanning the sink for max(audit_pk) — the reference's last-CSV-line trick
    (sync:341-358) generalized to a distributed dataset. Returns 0 when the
    sink does not exist yet (sync starts from scratch, sync:358)."""
    sp = _state_path(sink_path)
    if os.path.exists(sp):
        with open(sp) as f:
            return int(json.load(f)["watermark"])
    if not recover_from_sink or not os.path.isdir(sink_path):
        return 0
    try:
        reader = text_read_options(spark.read.format(fmt), fmt)
        if fmt == "csv":
            reader = reader.option("inferSchema", True)
        df = reader.load(sink_path)
    except Exception:
        return 0
    if AUDIT_PK not in df.columns:
        return 0
    row = df.agg(F.max(F.col(AUDIT_PK).cast("long")).alias("wm")).first()
    return int(row["wm"]) if row["wm"] is not None else 0


def sync_table(
    audit_df: DataFrame,
    sink_path: str,
    fmt: str = "csv",
    watermark: int | None = None,
    update_state: bool = True,
    partition_by: list[str] | None = None,
    sort_within_partitions: list[str] | None = None,
    on_drift: str = "fail",
) -> SyncResult:
    """One sync run: append all audit rows with ``audit_pk > watermark`` to
    the sink and advance the watermark (sync:238-265).

    ``watermark=None`` recovers it from the sink (get_watermark). Counting
    and max-finding happen in the same job that writes, via a cheap
    post-write aggregate over only the new rows.

    ``partition_by`` / ``sort_within_partitions`` are the Spark analog of
    the reference's secondary indexes on the audit table (gen:367-370,
    SURVEY §4 O7): directory partitioning prunes downstream scans by the
    partition keys (e.g. audit_event or an event date), and sorting within
    files gives parquet min/max row-group pruning on audit_pk.

    ``on_drift`` governs source-schema drift vs the existing sink — the
    reference's documented unsolved breaking issue (README:210-212,222-224):
    ``'fail'`` raises on ANY schema difference (detection, the safe
    default); ``'evolve'`` auto-migrates the additive case — new columns
    append as-is (parquet only; historical rows read as NULL under
    ``read_sink(..., merge_schema=True)``) while removed/type-changed
    columns still raise. One footer read per run pays for the check.
    """
    spark = audit_df.sparkSession
    if watermark is None:
        watermark = get_watermark(spark, sink_path, fmt=fmt)

    _check_drift(spark, audit_df, sink_path, fmt, on_drift)

    delta = audit_df.filter(F.col(AUDIT_PK) > F.lit(watermark))
    # Single pass over the (source-pruned) delta: max + count are map-side.
    stats = delta.agg(
        F.count("*").alias("n"), F.max(AUDIT_PK).alias("mx")
    ).first()
    n, mx = int(stats["n"]), stats["mx"]
    if n == 0:
        # Empty delta appends nothing — not even a header (sync:252 only
        # writes the header when rows flow).
        return SyncResult(0, watermark, sink_path)

    if sort_within_partitions:
        delta = delta.sortWithinPartitions(*sort_within_partitions)
    writer = text_write_options(delta.write.mode("append").format(fmt), fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(sink_path)

    new_wm = max(watermark, int(mx))
    if update_state:
        _write_state(sink_path, new_wm)
    return SyncResult(n, new_wm, sink_path)


def _sink_schema(spark: SparkSession, sink_path: str, fmt: str):
    """Schema of an existing sink, or None when the sink has no data yet.
    For parquet this is a footer read, not a scan."""
    if not os.path.isdir(sink_path):
        return None
    try:
        reader = text_read_options(spark.read.format(fmt), fmt)
        return reader.load(sink_path).schema
    except Exception:
        return None


# Sinks whose on-disk representation is typeless text: their re-read schema
# is inferred, so type-level drift comparison is meaningless for them.
_TEXT_FORMATS = ("csv", "json")


def _check_drift(
    spark: SparkSession,
    audit_df: DataFrame,
    sink_path: str,
    fmt: str,
    on_drift: str,
) -> None:
    if on_drift not in ("fail", "evolve"):
        raise ValueError(f"on_drift must be 'fail' or 'evolve', got {on_drift!r}")
    existing = _sink_schema(spark, sink_path, fmt)
    if existing is None:
        return
    drift = classify_schema_drift(existing, audit_df.schema)
    if fmt in _TEXT_FORMATS:
        # Text formats carry no types (the sink schema above is inferred —
        # JSON reads timestamps back as strings, ints as bigints; the
        # reference's own drift concern is column drift, README:222) —
        # compare names only.
        drift["changed"] = []
        drift["widened"] = []
    if not (drift["added"] or drift["removed"] or drift["changed"]
            or drift["widened"]):
        return
    if on_drift == "fail":
        raise SchemaDriftError(
            f"schema drift vs sink {sink_path}: {drift} "
            "(pass on_drift='evolve' to auto-migrate additive drift)"
        )
    if fmt != "parquet":
        raise SchemaDriftError(
            f"schema evolution requires a parquet sink; {fmt} cannot "
            f"represent per-file schemas (drift: {drift})"
        )
    # raises on removed/changed; additive drift appends as-is
    evolve_schema(existing, audit_df.schema)


class SyncManyError(RuntimeError):
    """One or more tables in a ``sync_many`` batch failed. Carries the full
    per-table outcome: ``results`` (completed tables, which KEEP their
    advanced watermarks) and ``errors`` (table name → exception, including
    timeouts)."""

    def __init__(self, results: dict[str, SyncResult], errors: dict[str, Exception]):
        self.results = results
        self.errors = errors
        detail = "; ".join(
            f"{n}: {type(e).__name__}: {e}" for n, e in sorted(errors.items())
        )
        super().__init__(
            f"sync_many: {len(errors)}/{len(results) + len(errors)} tables "
            f"failed ({detail})"
        )


def sync_many(
    jobs: dict[str, tuple[DataFrame, str]],
    fmt: str = "csv",
    max_concurrency: int = 8,
    on_drift: str = "fail",
    table_timeout: float | None = None,
) -> dict[str, SyncResult]:
    """Sync several audit tables concurrently.

    ``jobs`` maps table name → (audit_df, sink_path). Each sync is an
    independent shuffle-free job, so submitting them from driver threads
    lets the Spark scheduler interleave their tasks — a cluster is idle
    while a small table's single-task write runs if syncs are sequential
    (the reference loops tables one at a time, sync:182-200).
    ``max_concurrency`` bounds in-flight jobs, not correctness: watermark
    state files are per-sink, and sinks must be distinct paths.

    ``table_timeout`` bounds one stuck table's blast radius: each table's
    Spark jobs run under their own job group, and a watchdog cancels the
    group once its cumulative time WITH RUNNING TASKS exceeds
    ``table_timeout`` seconds. The clock counts time-on-cluster, not
    wall-clock since submission: a healthy table starved of task slots by
    a wedged sibling (all slots held by its hung tasks) is accruing zero
    run time and must not be cancelled alongside it — it proceeds once
    the cancellation frees the slots. Other tables keep running to
    completion.

    Every submitted table settles before this returns: on any failure the
    batch raises :class:`SyncManyError` naming EVERY failed table with its
    exception (not just the first) and carrying the completed tables'
    results — those keep their advanced watermarks, exactly the per-table
    crash contract of sequential syncs.
    """
    import threading
    import time
    from concurrent.futures import ThreadPoolExecutor

    sinks = [sink for _df, sink in jobs.values()]
    if len(set(sinks)) != len(sinks):
        raise ValueError("sync_many sinks must be distinct paths")
    if table_timeout is not None and (
        os.environ.get("PYSPARK_PIN_THREAD", "true").lower() == "false"
    ):
        # setJobGroup is only thread-local under pinned-thread mode (the
        # default since Spark 3.2); in legacy non-pinned mode the group is
        # process-global, so cancelling one timed-out table's group would
        # cancel healthy sibling tables' in-flight jobs too.
        raise RuntimeError(
            "sync_many(table_timeout=...) requires PySpark pinned-thread "
            "mode (PYSPARK_PIN_THREAD is set to 'false'): per-table job "
            "groups are not thread-isolated without it, so a timeout "
            "cancellation could kill sibling tables' jobs"
        )

    def _group_running(tracker, group) -> bool:
        """True while any task of the group's jobs is actively running."""
        for jid in tracker.getJobIdsForGroup(group):
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numActiveTasks > 0:
                    return True
        return False

    def run(item):
        name, (df, sink) = item
        sc = df.sparkSession.sparkContext
        stop = threading.Event()
        fired = threading.Event()
        if table_timeout is not None:
            group = f"sync_many:{name}"
            # interruptOnCancel: actually interrupt running tasks, don't
            # just drop queued ones — a wedged write is the target case.
            sc.setJobGroup(group, f"sync_many {name} -> {sink}",
                           interruptOnCancel=True)
            poll = min(1.0, table_timeout / 4)

            def watch():
                tracker = sc.statusTracker()
                busy = 0.0
                last = time.monotonic()
                while not stop.wait(poll):
                    try:
                        running = _group_running(tracker, group)
                    except Exception:  # tracker unavailable → wall-clock
                        running = True
                    now = time.monotonic()
                    if running:
                        busy += now - last
                    last = now
                    if busy >= table_timeout:
                        fired.set()
                        sc.cancelJobGroup(group)
                        return

            threading.Thread(target=watch, daemon=True,
                             name=f"sync_many-watchdog-{name}").start()
        try:
            try:
                return name, sync_table(df, sink, fmt=fmt, on_drift=on_drift)
            except Exception as e:  # noqa: BLE001 — aggregated by caller
                if fired.is_set():
                    raise TimeoutError(
                        f"table {name!r} ran over table_timeout="
                        f"{table_timeout}s on-cluster and its job group was "
                        "cancelled"
                    ) from e
                raise
        finally:
            stop.set()

    results: dict[str, SyncResult] = {}
    errors: dict[str, Exception] = {}
    with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
        futures = {pool.submit(run, item): item[0] for item in jobs.items()}
        for fut, name in futures.items():
            try:
                n, res = fut.result()
                results[n] = res
            except Exception as e:  # noqa: BLE001 — reported per-table
                errors[name] = e
    if errors:
        raise SyncManyError(results, errors)
    return results


def table_checksum(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Order-independent content checksum of a DataFrame: SUM over a 48-bit
    md5 prefix of each canonicalized row, plus the row count.

    The integrity primitive for CDC consumers — the reference documents its
    CSV sink as corruptible with no way to tell (README:213-215); comparing
    ``table_checksum(source_delta)`` with ``table_checksum(read_sink(...))``
    detects divergence without moving either dataset: both sides reduce
    map-side to ONE row. Summing (not xor-folding) keeps duplicate rows
    visible; 48-bit prefixes summed as DECIMAL(38,0) cannot overflow below
    ~10^23 rows. Checksum returned as a digit string (decimal types
    stringify differently across engines).

    The canonical form is INJECTIVE: each value is length-prefixed
    (``V<len>:<value>``, NULL → ``N``), so no two distinct rows share a
    canonicalization — a bare separator-join would let a value containing
    the separator shift bytes across column boundaries, and a literal NUL
    string would collide with NULL, allowing a corrupted sink to
    checksum-match its source.
    """
    cols = cols or df.columns

    def field(c: str):
        s = F.col(c).cast("string")
        return F.when(s.isNull(), F.lit("N")).otherwise(
            F.concat(F.lit("V"), F.length(s).cast("string"), F.lit(":"), s)
        )

    canon = F.concat(*[field(c) for c in cols])
    h = F.conv(F.substring(F.md5(canon), 1, 12), 16, 10).cast("decimal(20,0)")
    return df.agg(
        F.sum(h).cast("decimal(38,0)").cast("string").alias("checksum"),
        F.count("*").alias("n_rows"),
    )


def verify_sink(
    audit_df: DataFrame,
    sink_path: str,
    fmt: str = "csv",
    cols: list[str] | None = None,
) -> bool:
    """True iff the sink's content checksum matches the audit source's.

    Reads the sink with the SOURCE's schema so text formats (CSV/JSON)
    canonicalize identically to the typed source — a string-typed re-read
    would checksum '1.0' vs '1.0' fine but timestamps differently.
    """
    spark = audit_df.sparkSession
    cols = cols or audit_df.columns
    src = table_checksum(audit_df.select(*cols), cols).first()
    snk = table_checksum(
        read_sink(spark, sink_path, fmt=fmt, schema=audit_df.schema).select(*cols),
        cols,
    ).first()
    return (src["checksum"], src["n_rows"]) == (snk["checksum"], snk["n_rows"])


def repair_sink(
    audit_df: DataFrame,
    sink_path: str,
    fmt: str = "csv",
) -> int:
    """Rebuild a diverged sink from the audit source; returns rows written.

    The write target is the sink's EXPECTED content (expected_sink_content
    — so a recorded wipe stays compacted rather than being un-wiped), and
    the state file is rewritten with the source watermark plus any
    surviving compaction record. The recovery half of verify_sink: detect
    with one checksum pass, repair with one rewrite — the remediation the
    reference's corruptible sink has no story for (README:213-215).
    """
    expected = expected_sink_content(audit_df, sink_path).cache()
    n = expected.count()
    comp = get_sync_state(sink_path).get("compacted")
    writer = text_write_options(expected.write.mode("overwrite").format(fmt),
                                fmt)
    writer.save(sink_path)
    expected.unpersist()
    row = audit_df.agg(F.max(AUDIT_PK).alias("mx")).first()
    wm = int(row["mx"]) if row["mx"] is not None else 0
    _write_state(sink_path, wm, extra={"compacted": comp} if comp else None)
    return n


def read_sink(
    spark: SparkSession,
    sink_path: str,
    fmt: str = "csv",
    schema=None,
    merge_schema: bool = False,
) -> DataFrame:
    """Read a sink back as a DataFrame (header-aware for CSV).
    ``merge_schema=True`` unions per-file parquet schemas — required after
    an ``on_drift='evolve'`` migration; pre-drift rows surface NULL for the
    added columns."""
    reader = text_read_options(spark.read.format(fmt), fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt == "csv":
        reader = reader.option("inferSchema", True)
    if merge_schema:
        reader = reader.option("mergeSchema", True)
    return reader.load(sink_path)
