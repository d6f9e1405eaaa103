#!/usr/bin/env python
"""cProfile a drain query (guide §1): warm pass first, then profiled pass.

Usage: python tools/profile_drain.py <query> [sf_dir] [ncalls_sort]
"""
from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from cdc_audit_spark.queries import _REGISTRY
    from cdc_audit_spark.session import get_spark

    spark = get_spark(app_name=f"profile-{name}")
    fn = _REGISTRY[name].fn
    # warm at sf0.001 then once at target
    fn(spark, "/root/testdata/sf0.001").count()
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    print(f"warm pass: {time.perf_counter() - t0:.2f}s", flush=True)

    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    fn(spark, sf_dir).count()
    pr.disable()
    print(f"profiled pass: {time.perf_counter() - t0:.2f}s", flush=True)
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(45)
    spark.stop()


if __name__ == "__main__":
    main()
