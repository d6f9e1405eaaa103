"""SparkSession construction and tuning.

The engine never assumes it owns the session: ``tune(spark)`` applies the
runtime-settable confs we rely on (UTC timestamps for oracle parity, AQE,
Arrow) to any externally-provided session, e.g. the driver's.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import SparkSession

log = logging.getLogger(__name__)

# Confs that must be set before the session starts.
_BUILD_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # 128 MiB input splits: at 100 TB that is ~800k tasks — fine for a
    # 1000-executor cluster; locally it keeps small files in one task.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.driver.memory": "8g",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # non-ANSI integral arithmetic (wrap-around) — the hash-mixing operators
    # rely on Java long overflow semantics
    "spark.sql.ansi.enabled": "false",
    # Catalyst filter pushdown into Python data sources: the
    # manifest_table format prunes whole data dirs from pushed predicates
    "spark.sql.python.filterPushdown.enabled": "true",
}

# Confs safe to set on a live session.
_RUNTIME_CONF = {
    "spark.sql.python.filterPushdown.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Harmless when the data is timestamp[us] (the current fixtures); lets a
    # TIMESTAMP(NANOS) file be read as long instead of erroring. The actual
    # encoding is OBSERVED per-dataframe by queries.normalize_events_ts —
    # never assume it from this conf.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.ansi.enabled": "false",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(app_name: str = "cdc_audit_spark", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build a local session tuned for this engine.

    ``shuffle_partitions`` defaults to the core count: the local fixtures are
    far below the size where 200 shuffle partitions help, and AQE coalesces
    further at runtime. On a real cluster this would be ~2-3x total cores.
    """
    cpus = cpus or default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        # First limit/take round evaluates one parallel wave instead of
        # 1 -> 4 -> 16 sequential partition rounds (default initial=1,
        # scale-up x4). Every limit in the engine is a GATE that expects
        # to need all rows when it passes (connected_components'
        # driver_gate take, manifest read_pruned_for_keys' max_points
        # probe), so the incremental strategy only adds job-round
        # latency (measured 2.3s -> 1.05s on the sf0.1 winnow edge
        # take). Derived from the session's core count, not a constant.
        .config("spark.sql.limit.initialNumPartitions",
                str(shuffle_partitions or cpus))
    )
    for k, v in _BUILD_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _quiet_known_bounded_warnings(spark)
    return spark


def _quiet_known_bounded_warnings(spark: SparkSession) -> None:
    """Silence WindowExec's single-partition warning.

    The only unpartitioned windows in the engine are the documented small
    side of ``capture.assign_audit_pk``'s size gate (capture.py), which is
    bounded by the gate itself (the at-scale side re-plans to a range
    exchange — both sides pinned in tests/test_capture). The warning is
    correct in general but spams every bench/driver tail here; suppress just
    that logger, not WARN globally.
    """
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception as e:  # log4j2 core absent / locked down — cosmetic only
        log.debug("could not quiet WindowExec logger: %s", e)


_TUNE_WARNED: set[str] = set()


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an externally-created session (idempotent).

    A conf that cannot be set is LOGGED (once per key), not silently
    swallowed — a load-bearing environment assumption dying invisibly is
    exactly how the r03 loader outage happened.
    """
    conf = dict(_RUNTIME_CONF)
    try:  # gate takes/limits: one parallel wave, not sequential rounds
        conf["spark.sql.limit.initialNumPartitions"] = str(
            spark.sparkContext.defaultParallelism)
    except Exception:
        pass
    for k, v in conf.items():
        try:
            spark.conf.set(k, v)
        except Exception as e:  # conf locked down — proceed with its value
            if k not in _TUNE_WARNED:
                _TUNE_WARNED.add(k)
                log.warning("tune: could not set %s=%s (%s); proceeding with "
                            "session value %r", k, v, e,
                            spark.conf.get(k, None))
    return spark
