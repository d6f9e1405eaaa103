import datetime as dt
import os
import subprocess
import sys

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    return subprocess.run(
        [sys.executable, "-m", "cdc_audit_spark.cli", *args],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO},
    )


def test_gen_writes_ddl_files(tmp_path):
    out = tmp_path / "ddl"
    r = _run(["gen", "--data-dir", "/root/testdata/sf0.001",
              "-m", str(out), "-t", "customer,region", "--pk", "c_custkey"])
    assert r.returncode == 0, r.stderr[-2000:]
    files = sorted(p.name for p in out.glob("*.audit.sql"))
    assert files == ["customer.audit.sql", "region.audit.sql"]
    sql = (out / "customer.audit.sql").read_text()
    assert "create table if not exists `customer_audit`" in sql
    assert "CREATE TRIGGER `customer_after_insert`" in sql


def test_sync_and_wipe(tmp_path, spark):
    # build a tiny audit parquet table, then drive the CLI sync over it
    data = tmp_path / "data"
    rows = (
        spark.range(1, 8)
        .select(
            F.col("id").alias("k"),
            F.lit("insert").alias("audit_event"),
            F.lit(dt.datetime(2026, 1, 1)).alias("audit_timestamp"),
            F.col("id").alias("audit_pk"),
        )
    )
    rows.write.parquet(str(data / "items_audit.parquet"))
    sink_dir = tmp_path / "sink"

    r = _run(["sync", "--data-dir", str(data), "-m", str(sink_dir), "-v", "2"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "+7 rows" in r.stdout

    back = spark.read.option("header", True).csv(str(sink_dir / "items_audit.csv"))
    assert back.count() == 7

    r2 = _run(["sync", "--data-dir", str(data), "-m", str(sink_dir), "-w", "-v", "2"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "+0 rows" in r2.stdout  # empty delta on resync
    compacted = spark.read.option("header", True).csv(str(sink_dir / "items_audit.csv"))
    assert compacted.count() == 1  # wipe keeps global last row
    assert compacted.first()["audit_pk"] == "7"


def test_sync_parquet_evolve(tmp_path, spark):
    """CLI drives the evolving-parquet sink path: second run brings a new
    column, --evolve accepts it, old rows read as NULL under mergeSchema."""
    data = tmp_path / "data"
    v1 = (
        spark.range(1, 6)
        .select(
            F.col("id").alias("k"),
            F.lit("insert").alias("audit_event"),
            F.lit(dt.datetime(2026, 1, 1)).alias("audit_timestamp"),
            F.col("id").alias("audit_pk"),
        )
    )
    v1.write.parquet(str(data / "items_audit.parquet"))
    sink_dir = tmp_path / "sink"
    r = _run(["sync", "--data-dir", str(data), "-m", str(sink_dir),
              "--format", "parquet"])
    assert r.returncode == 0, r.stderr[-2000:]

    v2 = (
        spark.range(1, 11)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit("r"), (F.col("id") % 2).cast("string")).alias("region"),
            F.lit("insert").alias("audit_event"),
            F.lit(dt.datetime(2026, 1, 2)).alias("audit_timestamp"),
            F.col("id").alias("audit_pk"),
        )
    )
    v2.write.mode("overwrite").parquet(str(data / "items_audit.parquet"))
    # without --evolve the drift must fail the run
    r_fail = _run(["sync", "--data-dir", str(data), "-m", str(sink_dir),
                   "--format", "parquet"])
    assert r_fail.returncode != 0
    r2 = _run(["sync", "--data-dir", str(data), "-m", str(sink_dir),
               "--format", "parquet", "--evolve"])
    assert r2.returncode == 0, r2.stderr[-2000:]

    back = (spark.read.option("mergeSchema", True)
            .parquet(str(sink_dir / "items_audit")))
    assert back.count() == 10
    assert back.filter(F.col("region").isNull()).count() == 5


def test_sync_verify_flag(tmp_path, spark):
    """--verify checksums sink vs source after each sync; tampering makes
    the next verified sync exit non-zero."""
    data = tmp_path / "data"
    rows = (
        spark.range(1, 6)
        .select(
            F.col("id").alias("k"),
            F.lit("insert").alias("audit_event"),
            F.lit(dt.datetime(2026, 1, 1)).alias("audit_timestamp"),
            F.col("id").alias("audit_pk"),
        )
    )
    rows.write.parquet(str(data / "items_audit.parquet"))
    sink_dir = tmp_path / "sink"

    r = _run(["sync", "--data-dir", str(data), "-m", str(sink_dir),
              "--verify", "-v", "2"])
    assert r.returncode == 0, r.stderr[-2000:]

    # tamper: drop a data line from the sink (and its integrity sidecar)
    import glob

    part = sorted(glob.glob(str(sink_dir / "items_audit.csv" / "part-*.csv")))[0]
    crc = os.path.join(os.path.dirname(part), "." + os.path.basename(part) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)
    lines = open(part).read().splitlines()
    open(part, "w").write("\n".join(lines[:-1]) + "\n")

    r2 = _run(["sync", "--data-dir", str(data), "-m", str(sink_dir),
               "--verify", "-v", "2"])
    assert r2.returncode == 1
    assert "VERIFY FAILED" in r2.stdout


def test_sync_verify_after_previous_wipe(tmp_path, spark):
    """--verify must pass on a sink compacted by a PREVIOUS run's --wipe:
    the wipe is recorded in the sink state and verification reconstructs
    the expected content instead of reporting corruption. Microsecond
    timestamps pin the full text round trip (sync append AND compaction
    rewrite must use the same microsecond-preserving format)."""
    data = tmp_path / "data"
    rows = (
        spark.range(1, 8)
        .select(
            F.col("id").alias("k"),
            F.lit("insert").alias("audit_event"),
            F.lit(dt.datetime(2026, 1, 1, 3, 4, 5, 654321))
            .alias("audit_timestamp"),
            F.col("id").alias("audit_pk"),
        )
    )
    rows.write.parquet(str(data / "items_audit.parquet"))
    sink_dir = tmp_path / "sink"

    r = _run(["sync", "--data-dir", str(data), "-m", str(sink_dir), "-w"])
    assert r.returncode == 0, r.stderr[-2000:]

    r2 = _run(["sync", "--data-dir", str(data), "-m", str(sink_dir),
               "--verify", "-v", "2"])
    assert r2.returncode == 0, (r2.stdout + r2.stderr)[-2000:]
    assert "VERIFY FAILED" not in r2.stdout


def test_sync_verify_repair_rebuilds(tmp_path, spark):
    """--verify --repair turns a detected divergence into a rebuild that
    re-verifies green, instead of a non-zero exit."""
    data = tmp_path / "data"
    rows = (
        spark.range(1, 6)
        .select(
            F.col("id").alias("k"),
            F.lit("insert").alias("audit_event"),
            F.lit(dt.datetime(2026, 1, 1)).alias("audit_timestamp"),
            F.col("id").alias("audit_pk"),
        )
    )
    rows.write.parquet(str(data / "items_audit.parquet"))
    sink_dir = tmp_path / "sink"

    r = _run(["sync", "--data-dir", str(data), "-m", str(sink_dir)])
    assert r.returncode == 0, r.stderr[-2000:]

    # tamper: drop a data line from the sink (and its integrity sidecar)
    import glob

    part = sorted(glob.glob(str(sink_dir / "items_audit.csv" / "part-*.csv")))[0]
    crc = os.path.join(os.path.dirname(part), "." + os.path.basename(part) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)
    lines = open(part).read().splitlines()
    with open(part, "w") as f:
        f.write("\n".join(lines[:-1]) + "\n")

    r2 = _run(["sync", "--data-dir", str(data), "-m", str(sink_dir),
               "--verify"])
    assert r2.returncode == 1  # without --repair: still a hard failure

    r3 = _run(["sync", "--data-dir", str(data), "-m", str(sink_dir),
               "--verify", "--repair"])
    assert r3.returncode == 0, (r3.stdout + r3.stderr)[-2000:]
    assert "REPAIRED" in r3.stdout

    back = spark.read.option("header", True).csv(str(sink_dir / "items_audit.csv"))
    assert back.count() == 5
    r4 = _run(["sync", "--data-dir", str(data), "-m", str(sink_dir),
               "--verify"])
    assert r4.returncode == 0, (r4.stdout + r4.stderr)[-2000:]
