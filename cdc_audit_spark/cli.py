"""Command-line entry points mirroring the reference's two scripts.

``cdc-audit-gen``  ≈ cdc_audit_gen_mysql.php (gen:54-89 flag surface):
    discovers tables, writes one ``{prefix}{table}.audit.sql`` per table.
``cdc-audit-sync`` ≈ cdc_audit_sync_mysql.php (sync:55-91 flag surface):
    incrementally appends new audit rows to ``{output_dir}/{table}.csv``,
    optional ``-w`` wipe (keep-last compaction) after sync.

Sources: a directory of parquet tables (``--data-dir``, the test/fixture
path) or a JDBC URL (``--jdbc-url``, live-MySQL path — catalog queries in
catalog.py). Flags keep the reference's single-letter names where argparse
allows, so existing cron lines port mechanically.

Usage:
    python -m cdc_audit_spark.cli gen  --data-dir DIR [-t t1,t2] [-m OUT] [-n PREFIX]
    python -m cdc_audit_spark.cli sync --data-dir DIR [-t t1,t2] [-m OUT] [-w]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

from cdc_audit_spark.schema import (
    audit_sql_filename,
    csv_sink_name,
    is_audit_table_name,
)

__all__ = ["main"]


def _parse_tables(arg: str | None) -> set[str] | None:
    """-t 'a, b,c' → {'a','b','c'} (reference explode+trim, gen:137-143)."""
    if not arg:
        return None
    return {t.strip() for t in arg.split(",") if t.strip()}


def _discover_parquet_tables(data_dir: str) -> list[str]:
    return sorted(
        os.path.splitext(os.path.basename(p))[0]
        for p in glob.glob(os.path.join(data_dir, "*.parquet"))
    )


def _gen(args) -> int:
    from cdc_audit_spark.ddlgen import generate_audit_sql
    from cdc_audit_spark.session import get_spark

    os.makedirs(args.audit_dir, exist_ok=True)
    # delete stale outputs, restricted to selected tables (gen:172-189)
    selected = _parse_tables(args.tables)
    for path in glob.glob(os.path.join(args.audit_dir, "*.audit.sql")):
        base = os.path.basename(path)[: -len(".audit.sql")]
        if args.prefix and base.startswith(args.prefix):
            base = base[len(args.prefix):]
        if selected is None or base in selected:
            os.remove(path)

    spark = get_spark(app_name="cdc-audit-gen")
    try:
        tables = _discover_parquet_tables(args.data_dir)
        written = 0
        for table in tables:
            if is_audit_table_name(table):  # never audit an audit table (gen:215)
                continue
            if selected is not None and table not in selected:
                continue
            df = spark.read.parquet(os.path.join(args.data_dir, f"{table}.parquet"))
            pk_cols = [args.pk] if args.pk and args.pk in df.columns else \
                      [c for c in df.columns if c.endswith("key") and df.columns.index(c) == 0]
            sql = generate_audit_sql(table, df.schema, pk_cols=pk_cols, prefix=args.prefix)
            out = os.path.join(args.audit_dir, audit_sql_filename(table, args.prefix))
            with open(out, "w") as f:
                f.write(sql)
            written += 1
            if args.verbosity >= 2:
                print(f"wrote {out}")
        print(f"generated audit DDL for {written} table(s) in {args.audit_dir}")
        return 0
    finally:
        spark.stop()


def _sync_manifest(spark, args, table: str, audit_df, sink: str) -> int:
    """The --format manifest sync path: exactly-once delta commits, wipes
    as keep-last compaction commits (pre-wipe log stays time-travelable),
    verification against the table's own commit history, and repair as a
    transactional overwrite."""
    from cdc_audit_spark.sinks.manifest import ManifestTable

    t = ManifestTable(spark, sink)
    res = t.sync_audit(audit_df)
    if args.verbosity >= 2:
        print(f"{table}: +{res.rows_synced} rows, watermark={res.watermark}, "
              f"version={t.current_version()}")
    if args.verify and not t.verify(audit_df):
        if args.repair:
            v = t.repair(audit_df)
            print(f"REPAIRED: {sink} rebuilt from {table} (version {v})")
            if not t.verify(audit_df):
                print(f"VERIFY FAILED after repair: {sink}")
                return 1
        else:
            print(f"VERIFY FAILED: {sink} diverges from source {table} "
                  "(re-run with --repair to rebuild)")
            return 1
    if args.wipe:
        t.compact(keep_last_only=True,
                  extra={"wipe_through": res.watermark, "wipe_pk_cols": None})
    return 0


def _sync(args) -> int:
    from cdc_audit_spark.compact import compact_log
    from cdc_audit_spark.sync import (
        expected_sink_content,
        read_sink,
        repair_sink,
        sync_table,
        verify_sink,
    )
    from cdc_audit_spark.session import get_spark

    os.makedirs(args.output_dir, exist_ok=True)
    selected = _parse_tables(args.tables)
    spark = get_spark(app_name="cdc-audit-sync")
    try:
        synced = 0
        for table in _discover_parquet_tables(args.data_dir):
            # sync only audit tables (sync:182-185), honoring -t (sync:187-190)
            if not is_audit_table_name(table):
                continue
            source_name = table.replace("_audit", "")
            if selected is not None and table not in selected and source_name not in selected:
                continue
            audit_df = spark.read.parquet(os.path.join(args.data_dir, f"{table}.parquet"))
            if args.format == "csv":
                sink = os.path.join(args.output_dir, csv_sink_name(table))
            else:
                sink = os.path.join(args.output_dir, table)
            if args.format == "manifest":
                rc = _sync_manifest(spark, args, table, audit_df, sink)
                if rc != 0:
                    return rc
                synced += 1
                continue
            res = sync_table(
                audit_df, sink, fmt=args.format,
                on_drift="evolve" if args.evolve else "fail",
            )
            if args.verbosity >= 2:
                print(f"{table}: +{res.rows_synced} rows, watermark={res.watermark}")
            if args.verify:
                # post-sync integrity: sink content must equal what the
                # sink's recorded history says it should hold — the full
                # source, or (after any previous run's --wipe) the
                # keep-last survivors plus later rows. Runs before this
                # run's wipe, whose record covers the NEXT verify.
                expected = expected_sink_content(audit_df, sink)
                if not verify_sink(expected, sink, fmt=args.format):
                    if args.repair:
                        n = repair_sink(audit_df, sink, fmt=args.format)
                        print(f"REPAIRED: {sink} rebuilt from {table} "
                              f"({n} rows)")
                        if not verify_sink(
                                expected_sink_content(audit_df, sink),
                                sink, fmt=args.format):
                            print(f"VERIFY FAILED after repair: {sink}")
                            return 1
                    else:
                        print(f"VERIFY FAILED: {sink} diverges from source "
                              f"{table} (re-run with --repair to rebuild)")
                        return 1
            if args.wipe:
                # keep-last compaction of the SOURCE audit log is a
                # database-side op in the reference (sync:284-319); here we
                # compact the sink copy (keep global last row).
                compact_log(
                    read_sink(spark, sink, fmt=args.format), sink, fmt=args.format
                )
            synced += 1
        print(f"synced {synced} audit table(s) into {args.output_dir}")
        return 0
    finally:
        spark.stop()


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="cdc_audit_spark", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="generate audit-table + trigger DDL")
    g.add_argument("--data-dir", required=True, help="directory of source parquet tables")
    g.add_argument("-m", "--audit-dir", default="./cdc_audit_gen", help="output dir for .audit.sql files")
    g.add_argument("-t", "--tables", default=None, help="comma-separated table list (default: all)")
    g.add_argument("-n", "--prefix", default="", help="namespace prefix for generated names")
    g.add_argument("--pk", default=None, help="primary-key column name override")
    g.add_argument("-v", "--verbosity", type=int, default=1)
    g.set_defaults(func=_gen)

    s = sub.add_parser("sync", help="incrementally sync audit tables to CSV")
    s.add_argument("--data-dir", required=True, help="directory containing *_audit parquet tables")
    s.add_argument("-m", "--output-dir", default="./cdc_audit_sync", help="CSV sink directory")
    s.add_argument("-t", "--tables", default=None)
    s.add_argument("--format", default="csv",
                   choices=["csv", "parquet", "json", "orc", "manifest"],
                   help="sink format (CSV = reference parity; parquet "
                        "enables --evolve; manifest = transactional "
                        "exactly-once commits with time travel)")
    s.add_argument("--verify", action="store_true",
                   help="after each sync, checksum-compare sink vs source")
    s.add_argument("--repair", action="store_true",
                   help="with --verify: rebuild a diverged sink from the "
                        "source instead of failing")
    s.add_argument("--evolve", action="store_true",
                   help="auto-migrate additive schema drift (parquet sinks only)")
    s.add_argument("-w", "--wipe", action="store_true",
                   help="keep only the last audit row after syncing (compaction)")
    s.add_argument("-v", "--verbosity", type=int, default=1)
    s.set_defaults(func=_sync)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
