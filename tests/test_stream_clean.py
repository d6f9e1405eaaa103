"""streaming.stream_clean: the streaming cleaner must equal the batch
cleaners exactly (stateless maps — no watermark slack to hide behind)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from cdc_audit_spark.operators.clean import (
    boilerplate_blocklist,
    remove_boilerplate,
    redact_patterns,
)
from cdc_audit_spark.streaming.stream_clean import apply_blocklist, stream_clean_sync

HEADER = "ACME corp internal wiki"
FOOTER = "copyright 2026 all rights reserved"


def _corpus(spark, n=30):
    rows = [
        (
            i,
            "\n".join(
                [HEADER, f"body {i} mail user{i}@example.com", f"detail {i * 7}", FOOTER]
            ),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_apply_blocklist_equals_remove_boilerplate(spark):
    docs = _corpus(spark)
    blocked = [
        r["seg"]
        for r in boilerplate_blocklist(docs, "doc_id", "text", "\n", 0.5).collect()
    ]
    assert sorted(blocked) == sorted([HEADER, FOOTER])
    cols = ["doc_id", "n_total", "n_kept", "n_dropped", "text_clean"]
    via_join = remove_boilerplate(docs, "doc_id", "text", sep="\n", max_doc_frac=0.5).select(*cols)
    via_map = apply_blocklist(docs, "doc_id", "text", blocked, sep="\n").select(*cols)
    assert sorted(map(tuple, via_join.collect())) == sorted(map(tuple, via_map.collect()))


def test_apply_blocklist_empty_list_is_identity(spark):
    docs = _corpus(spark, 5)
    out = apply_blocklist(docs, "doc_id", "text", [], sep="\n")
    assert out.filter(F.col("n_dropped") != 0).count() == 0
    assert out.filter(F.col("text_clean") != F.col("text")).count() == 0


def test_stream_clean_equals_batch(spark, tmp_path):
    docs = _corpus(spark)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # several source files → several batch candidates under maxFilesPerTrigger
    docs.repartition(4).write.parquet(src)

    blocked = [
        r["seg"]
        for r in boilerplate_blocklist(docs, "doc_id", "text", "\n", 0.5).collect()
    ]
    q = stream_clean_sync(
        spark,
        src,
        docs.schema,
        out,
        ckpt,
        "doc_id",
        "text",
        blocked=blocked,
        sep="\n",
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    # batch reference: redact, then blocklist-strip the redacted text
    ref = apply_blocklist(
        redact_patterns(docs, "doc_id", "text", out_col="__redacted"),
        "doc_id",
        "__redacted",
        blocked,
        sep="\n",
    ).drop("__redacted")
    assert sorted(got.columns) == sorted(ref.columns)
    cols = sorted(got.columns)
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, ref.select(*cols).collect())
    )
    # every email was masked before the blocklist pass
    assert got.filter(F.col("text_clean").contains("@example.com")).count() == 0
    assert got.filter(F.col("n_email") != 1).count() == 0
    shutil.rmtree(ckpt, ignore_errors=True)
