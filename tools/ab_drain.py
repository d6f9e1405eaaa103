#!/usr/bin/env python
"""Interleaved A/B of a drain query under a runtime conf toggle.

Usage: python tools/ab_drain.py <query> <conf_key> <valA> <valB> [passes]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name, key, va, vb = sys.argv[1:5]
    passes = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    sf_dir = "/root/testdata/sf0.1"

    from cdc_audit_spark.queries import _REGISTRY
    from cdc_audit_spark.session import get_spark

    spark = get_spark(app_name=f"ab-{name}")
    fn = _REGISTRY[name].fn
    fn(spark, "/root/testdata/sf0.001").count()
    fn(spark, sf_dir).count()  # warm

    res = {va: [], vb: []}
    for _ in range(passes):
        for v in (va, vb):
            spark.conf.set(key, v)
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            res[v].append(round(time.perf_counter() - t0, 3))
    spark.conf.set(key, va)
    for v, ts in res.items():
        print(f"{key}={v}: {ts}  min={min(ts)}")
    spark.stop()


if __name__ == "__main__":
    main()
