"""End-to-end corpus curation pipeline (operators/pipeline.curate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_audit_spark.operators.pipeline import curate

SPLITS = {"train": 0.8, "valid": 0.2}


def _corpus(spark):
    long_text = " ".join(f"tok{i % 97}" for i in range(60))
    dup = "the quick brown fox " * 10          # 40 tokens, has stopwords
    contaminated = "alpha beta gamma delta epsilon zeta eta theta " * 5
    rows = [
        (1, long_text), (2, dup), (3, dup),     # 3 dup of 2
        (4, contaminated),                      # shares 8-grams with bench
        (5, "short text"),                      # fails min_tokens
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_stages_and_labeled_consistency(spark):
    docs = _corpus(spark)
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta iota")],
        "doc_id long, text string")
    labeled, report = curate(docs, "text", "doc_id", bench, SPLITS,
                             min_tokens=20)
    rep = {r["stage"]: r["n_docs"] for r in report.collect()}
    assert rep["input"] == 5
    assert rep["quality_pass"] == 4          # doc 5 fails the length gate
    assert rep["exact_dedup"] == 3           # doc 3 loses to doc 2
    assert rep["decontaminated"] == 2        # doc 4 contaminated
    assert rep["split:train"] + rep["split:valid"] == rep["decontaminated"]

    out = labeled.collect()
    assert {r["doc_id"] for r in out} == {1, 2}
    assert set(labeled.columns) >= {"doc_id", "text", "split"}
    assert not any(c.startswith("__") for c in labeled.columns)
    # labeled rows carry splits consistent with the report
    per_split = {s: sum(1 for r in out if r["split"] == s) for s in SPLITS}
    assert per_split == {s: rep[f"split:{s}"] for s in SPLITS}
