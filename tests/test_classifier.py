"""Quality classifier: Spark batch-GD ≡ single-node numpy reference, and
the trained filter actually separates planted quality classes."""

import hashlib

import numpy as np
import pytest

from cdc_audit_spark.operators.classifier import (
    score_quality,
    train_quality_logreg,
)


def _bucket(tok: str, n_buckets: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:6], 16) % n_buckets


def _numpy_train(rows, n_buckets, iters, lr, l2):
    """The exact same batch GD, dense numpy: mean-normalized hashed BoW,
    sigmoid residuals, L2 — the single-node reference."""
    X = np.zeros((len(rows), n_buckets))
    y = np.zeros(len(rows))
    for i, (text, label) in enumerate(rows):
        toks = text.lower().split()
        for t in toks:
            X[i, _bucket(t, n_buckets)] += 1.0 / len(toks)
        y[i] = label
    w = np.zeros(n_buckets)
    b = 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        r = p - y
        w = w - lr * ((X.T @ r) / len(rows) + l2 * w)
        b = b - lr * r.mean()
    return w, b


def _planted_rows():
    """Two vocabularies: 'good' docs draw from g-words, 'bad' from
    b-words, with a shared stopword so the classes overlap lexically."""
    rows = []
    for i in range(40):
        rows.append((f"the g{i % 7} g{(i + 1) % 7} g{(i + 2) % 7} fine", 1))
        rows.append((f"the b{i % 7} b{(i + 1) % 7} b{(i + 2) % 7} junk", 0))
    return rows


def test_train_matches_numpy_reference(spark):
    rows = _planted_rows()
    kw = dict(n_buckets=64, iters=5, lr=2.0, l2=1e-4)
    df = spark.createDataFrame(rows, "text string, label int")
    model = train_quality_logreg(df, "text", "label", **kw)
    w_ref, b_ref = _numpy_train(rows, kw["n_buckets"], kw["iters"],
                                kw["lr"], kw["l2"])
    assert model["bias"] == pytest.approx(b_ref, abs=1e-9)
    assert np.allclose(np.array(model["weights"]), w_ref, atol=1e-9)


def test_scores_separate_planted_classes(spark):
    rows = _planted_rows()
    df = spark.createDataFrame(
        [(i, t, y) for i, (t, y) in enumerate(rows)],
        "doc_id long, text string, label int")
    model = train_quality_logreg(df, "text", "label",
                                 n_buckets=256, iters=20, lr=5.0)
    scored = {r["doc_id"]: r["quality_prob"]
              for r in score_quality(df, "text", "doc_id", model).collect()}
    good = [scored[i] for i, (_, y) in enumerate(rows) if y == 1]
    bad = [scored[i] for i, (_, y) in enumerate(rows) if y == 0]
    assert min(good) > max(bad)  # fully separated on the planted vocab
    assert all(0.0 < p < 1.0 for p in scored.values())


def test_scoring_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    model = {"weights": [0.1] * 16, "bias": 0.0, "n_buckets": 16}
    plan = score_quality(df, "text", "doc_id", model)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan  # map-side codegen only


def test_empty_and_degenerate_inputs(spark):
    df = spark.createDataFrame([("", 1)], "text string, label int")
    with pytest.raises(ValueError, match="no non-empty"):
        # split('') yields [''] — still one "token"; truly empty is the
        # all-whitespace-filtered zero-doc case
        train_quality_logreg(df.filter("text != ''"), "text", "label")
    model = {"weights": [0.5] * 8, "bias": -1.0, "n_buckets": 8}
    out = score_quality(
        spark.createDataFrame([(1, "")], "doc_id long, text string"),
        "text", "doc_id", model).collect()
    assert len(out) == 1 and 0.0 < out[0]["quality_prob"] < 1.0
