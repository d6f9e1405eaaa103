"""operators.clean: corpus-driven boilerplate removal and PII redaction,
exercised on planted fixtures with real newlines / real PII (the parquet
corpus fixture has neither — the registered queries cover the word-level
and zero-match paths there)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_audit_spark.operators.clean import (
    PII_PATTERNS,
    boilerplate_blocklist,
    redact_patterns,
    remove_boilerplate,
)
from cdc_audit_spark.operators.sampling import source_quota

HEADER = "ACME corp internal wiki"
FOOTER = "copyright 2026 all rights reserved"


def _corpus(spark, n=20):
    rows = [
        (i, "\n".join([HEADER, f"unique body line {i}", f"more detail {i * i}", FOOTER]))
        for i in range(n)
    ]
    rows.append((n, "\n".join([HEADER, FOOTER])))  # all-boilerplate doc
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_remove_boilerplate_lines(spark):
    docs = _corpus(spark)
    out = {r["doc_id"]: r for r in remove_boilerplate(
        docs, "doc_id", "text", sep="\n", max_doc_frac=0.5
    ).collect()}

    assert len(out) == 21  # every doc survives, even the all-boilerplate one
    assert out[20]["text_clean"] == "" and out[20]["n_kept"] == 0
    assert out[20]["n_dropped"] == 2
    for i in range(20):
        r = out[i]
        # order preserved, boilerplate gone, uniques intact
        assert r["text_clean"] == f"unique body line {i}\nmore detail {i * i}"
        assert r["n_total"] == 4 and r["n_kept"] == 2 and r["n_dropped"] == 2


def test_boilerplate_blocklist_threshold(spark):
    docs = _corpus(spark)
    blocked = {r["seg"] for r in boilerplate_blocklist(
        docs, "doc_id", "text", sep="\n", max_doc_frac=0.5
    ).collect()}
    assert blocked == {HEADER, FOOTER}
    # raising the ceiling above their document frequency empties the list
    assert boilerplate_blocklist(
        docs, "doc_id", "text", sep="\n", max_doc_frac=1.0
    ).count() == 0


def test_redact_patterns_planted_pii(spark):
    docs = spark.createDataFrame(
        [
            (1, "contact bob@example.com or alice@test.org today"),
            (2, "server at 10.0.42.7 answered"),
            (3, "call +1 (555) 123-4567 now"),
            (4, "clean text, nothing to mask"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_patterns(docs, "doc_id", "text").collect()}
    assert out[1]["n_email"] == 2 and out[1]["n_redacted"] == 2
    assert out[1]["text_redacted"] == "contact <EMAIL> or <EMAIL> today"
    assert out[2]["n_ipv4"] == 1 and out[2]["text_redacted"] == "server at <IP> answered"
    assert out[3]["n_phone"] == 1 and out[3]["text_redacted"] == "call <PHONE> now"
    assert out[4]["n_redacted"] == 0
    assert out[4]["text_redacted"] == "clean text, nothing to mask"


def test_redact_counts_are_staged_not_double_counted(spark):
    # the digits inside an email must not also count as a phone number
    docs = spark.createDataFrame(
        [(1, "mail 5551234567890@example.com please")], "doc_id long, text string"
    )
    r = redact_patterns(docs, "doc_id", "text").collect()[0]
    assert r["n_email"] == 1 and r["n_phone"] == 0
    assert r["text_redacted"] == "mail <EMAIL> please"


def test_source_quota_deterministic_and_bounded(spark):
    docs = spark.createDataFrame(
        [(i, f"src{i % 5}") for i in range(200)], "doc_id long, source string"
    )
    a = source_quota(docs, "doc_id", "source", 7)
    counts = {r["source"]: r["n"] for r in
              a.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {f"src{i}": 7 for i in range(5)}
    # stable under a different physical row order
    b = source_quota(docs.repartition(13), "doc_id", "source", 7)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
