#!/usr/bin/env python
"""Per-query measurement harness (optimization guide §1).

Usage: python tools/qtime.py [sf_dir] name [name ...]
       python tools/qtime.py --plan plans/r13 --suffix before [sf_dir] name ...

For each query: builds the DataFrame (construction time includes any
driver-side actions the builder runs), then times the computation with the
noop sink (guide §1.4 — forces every column of every row, no collect), two
passes, reporting both. With --plan DIR writes DIR/<name>_<suffix>.txt
containing explain("formatted"). Jobs are labelled via setJobDescription so
the Spark UI attributes stages to queries (guide §1.5).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    plan_dir = None
    suffix = "before"
    if "--plan" in args:
        i = args.index("--plan")
        plan_dir = args[i + 1]
        del args[i:i + 2]
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i:i + 2]
    sf_dir = "/root/testdata/sf0.1"
    if args and "/" in args[0]:
        sf_dir = args.pop(0)
    names = args

    from cdc_audit_spark.queries import _REGISTRY
    from cdc_audit_spark.session import get_spark

    spark = get_spark(app_name="qtime")
    sc = spark.sparkContext

    # Warm the session (codegen, python workers) on the smallest SF once.
    warm = "/root/testdata/sf0.001"
    for name in names:
        try:
            _REGISTRY[name].fn(spark, warm).write.format("noop").mode(
                "overwrite").save()
        except Exception as e:
            print(f"warm {name}: {type(e).__name__}: {e}", file=sys.stderr)

    print(f"{'query':<34} {'build1':>7} {'noop1':>7} {'build2':>7} "
          f"{'noop2':>7}")
    for name in names:
        fn = _REGISTRY[name].fn
        rec = []
        for i in range(2):
            sc.setJobDescription(f"{name} build pass{i}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            sc.setJobDescription(f"{name} exec pass{i}")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            rec += [t1 - t0, t2 - t1]
            sc.setJobDescription(None)
        print(f"{name:<34} {rec[0]:>7.3f} {rec[1]:>7.3f} {rec[2]:>7.3f} "
              f"{rec[3]:>7.3f}")
        if plan_dir:
            os.makedirs(plan_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(plan_dir, f"{name}_{suffix}.txt"),
                      "w") as f:
                f.write(txt)
    spark.stop()


if __name__ == "__main__":
    main()
