#!/usr/bin/env python
"""Wall-clock per-phase breakdown of a drain query via monkeypatched
timers (no cProfile distortion). Usage: python tools/phase_time.py <query>
"""
from __future__ import annotations

import collections
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ACC: dict[str, list] = collections.defaultdict(lambda: [0.0, 0])


def timed(label, fn):
    @functools.wraps(fn)
    def w(*a, **kw):
        t0 = time.perf_counter()
        try:
            return fn(*a, **kw)
        finally:
            d = time.perf_counter() - t0
            ACC[label][0] += d
            ACC[label][1] += 1
    return w


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from cdc_audit_spark import queries as Q
    from cdc_audit_spark.operators import dedup, timeseries
    from cdc_audit_spark.session import get_spark
    from cdc_audit_spark.sinks import manifest
    from cdc_audit_spark.streaming import stream_timeseries as st

    spark = get_spark(app_name=f"phase-{name}")
    fn = Q._REGISTRY[name].fn
    fn(spark, "/root/testdata/sf0.001").count()
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    print(f"warm pass: {time.perf_counter() - t0:.2f}s", flush=True)

    st._epoch_wave = timed("epoch_wave", st._epoch_wave)
    manifest.ManifestTable.prepare_append = timed(
        "prepare_append", manifest.ManifestTable.prepare_append)
    manifest.ManifestTable.commit_prepared = timed(
        "commit_prepared", manifest.ManifestTable.commit_prepared)
    manifest.ManifestTable.read_pruned_for_keys = timed(
        "read_pruned_for_keys", manifest.ManifestTable.read_pruned_for_keys)
    manifest._dir_file_stats = timed("dir_file_stats", manifest._dir_file_stats)
    manifest.ManifestTable._check_drift = timed(
        "prep:check_drift", manifest.ManifestTable._check_drift)
    manifest.ManifestTable._enforce_constraints = timed(
        "prep:enforce_constraints", manifest.ManifestTable._enforce_constraints)
    manifest.ManifestTable._coalesced = timed(
        "prep:coalesced(est)", manifest.ManifestTable._coalesced)
    manifest.ManifestTable._write_data_dir = timed(
        "prep:write_data_dir", manifest.ManifestTable._write_data_dir)
    st.apply_ts_epoch = timed("apply_ts_epoch(incl wave)", st.apply_ts_epoch)
    timeseries.znorm_distances = timed(
        "znorm_distances(build)", timeseries.znorm_distances)
    dedup.incremental_components = timed(
        "incremental_components", dedup.incremental_components)
    dedup.resolve_union_closure = timed(
        "resolve_union_closure", dedup.resolve_union_closure)
    dedup.connected_components = timed(
        "connected_components", dedup.connected_components)
    from pyspark.sql.classic import dataframe as cdf
    cdf.DataFrame.collect = timed("df.collect", cdf.DataFrame.collect)
    cdf.DataFrame.take = timed("df.take", cdf.DataFrame.take)
    cdf.DataFrame.localCheckpoint = timed(
        "df.localCheckpoint", cdf.DataFrame.localCheckpoint)

    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    total = time.perf_counter() - t0
    print(f"timed pass: {total:.2f}s")
    for k, (sec, n) in sorted(ACC.items(), key=lambda kv: -kv[1][0]):
        print(f"  {k:<28} {sec:7.2f}s  n={n}")
    spark.stop()


if __name__ == "__main__":
    main()
