"""Run the strict oracle-parity sweep over every registered query at a given
scale factor (default sf0.01 — the driver's correctness scale).

Usage: python tools/parity_sweep.py [sf_dir] [name ...]
Prints one line per query: OK / FAIL <problems> / SKIP (no oracle).
Exit code 1 if any FAIL.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from cdc_audit_spark.queries import _REGISTRY  # noqa: E402
from cdc_audit_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import compare_query, duck_connection  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a] or list(_REGISTRY)

    spark = get_spark("parity_sweep")
    con = duck_connection(sf_dir)
    n_fail = 0
    for name in names:
        qd = _REGISTRY[name]
        if qd.oracle is None:
            print(f"SKIP {name} (no oracle)")
            continue
        try:
            problems = compare_query(spark, con, qd.fn, qd.oracle, sf_dir)
        except Exception as e:  # noqa: BLE001 — report and continue
            problems = [f"error: {type(e).__name__}: {e}"]
        if problems:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(problems)[:500])
        else:
            print(f"OK   {name}")
    print(f"\n{n_fail} failures / {len(names)} queries")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
