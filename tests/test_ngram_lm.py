"""Stupid Backoff n-gram LM: Spark training/scoring vs a pure-Python
reference (same tokens, counts, alpha) — the ground truth for the ◇
perplexity query; tier counts and truncation accounting exact."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from cdc_audit_spark.operators.ngram_lm import (
    DEFAULT_ALPHA,
    NgramLM,
    backoff_tiers,
    score_perplexity,
    train_ngram_lm,
)

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat ate the fish"),
    (3, "a dog sat on a log"),
    (4, "the dog and the cat"),
    (5, "zyxxy unseen tokens only"),
]


def _py_tokens(text):
    return [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]


def _py_model(docs, n):
    counts = Counter()
    total = 0
    for _, text in docs:
        toks = _py_tokens(text)
        total += len(toks)
        for k in range(1, n + 1):
            for i in range(len(toks) - k + 1):
                counts[(k, " ".join(toks[i : i + k]))] += 1
    return counts, total


def _py_score(toks, counts, total, n, alpha):
    """Stupid Backoff log10 score per position (mirrors the operator's
    cascade: tier-k costs (n-k) alphas, the OOV floor costs n)."""
    la = math.log10(alpha)
    out = []
    for i, w in enumerate(toks):
        score = None
        for k in range(n, 0, -1):
            if i < k - 1:
                continue
            gram = " ".join(toks[i - k + 1 : i + 1])
            c = counts.get((k, gram))
            if not c:
                continue
            if k == 1:
                score = math.log10(c) - math.log10(total) + (n - 1) * la
            else:
                ctx = " ".join(toks[i - k + 1 : i])
                cc = counts.get((k - 1, ctx))
                if not cc:
                    continue
                score = math.log10(c) - math.log10(cc) + (n - k) * la
            break
        if score is None:
            score = n * la - math.log10(total)
        out.append(score)
    return out


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_training_counts_match_python(spark):
    model = train_ngram_lm(_df(spark), "text", n=2)
    py_counts, py_total = _py_model(DOCS, 2)
    got = {(r["order"], r["gram"]): r["cnt"] for r in model.counts.collect()}
    assert got == dict(py_counts)
    assert model.total == py_total
    assert model.truncated_mass == {1: 0, 2: 0}


@pytest.mark.parametrize("n", [2, 3])
def test_perplexity_matches_python_reference(spark, n):
    model = train_ngram_lm(_df(spark), "text", n=n)
    py_counts, py_total = _py_model(DOCS, n)
    out = {r["doc_id"]: r for r in
           score_perplexity(_df(spark), "text", "doc_id", model).collect()}
    for doc_id, text in DOCS:
        logs = _py_score(_py_tokens(text), py_counts, py_total, n, DEFAULT_ALPHA)
        avg = sum(logs) / len(logs)
        assert out[doc_id]["n_tokens"] == len(logs)
        assert out[doc_id]["avg_log10_score"] == pytest.approx(avg, abs=1e-9)
        assert out[doc_id]["perplexity"] == pytest.approx(10 ** -avg, rel=1e-9)


def test_fluent_text_scores_below_junk_heldout(spark):
    """The CCNet signal on HELD-OUT docs (training docs score their own
    grams — the in-corpus ranking is a different, weaker statement)."""
    model = train_ngram_lm(_df(spark), "text", n=2)
    held_out = spark.createDataFrame(
        [(10, "the cat sat on the mat"),       # in-distribution
         (11, "qqq www eee rrr ttt uuu")],      # pure OOV junk
        "doc_id long, text string")
    out = {r["doc_id"]: r["perplexity"] for r in
           score_perplexity(held_out, "text", "doc_id", model).collect()}
    assert out[10] < out[11]
    # the junk doc is all floor: ppl == N / alpha^2 exactly
    assert out[11] == pytest.approx(model.total / DEFAULT_ALPHA**2, rel=1e-9)


def test_backoff_tiers_integer_layer(spark):
    model = train_ngram_lm(_df(spark), "text", n=2)
    score_df = _df(spark).unionByName(spark.createDataFrame(
        [(11, "qqq the cat zzz")], "doc_id long, text string"))
    out = {r["doc_id"]: r for r in
           backoff_tiers(score_df, "text", "doc_id", model).collect()}
    # doc 1: position 0 has no context -> unigram tier; rest are seen bigrams
    assert out[1]["n_tokens"] == 6
    assert out[1]["n_tier2"] == 5
    assert out[1]["n_tier1"] == 1
    assert out[1]["n_oov"] == 0
    # held-out mix: qqq/zzz floor, "the" unigram (ctx qqq unseen),
    # "the cat" bigram hit
    assert out[11]["n_oov"] == 2
    assert out[11]["n_tier1"] == 1
    assert out[11]["n_tier2"] == 1
    for doc_id in out:
        r = out[doc_id]
        assert r["n_tokens"] == r["n_tier2"] + r["n_tier1"] + r["n_oov"]


def test_min_count_prunes_and_reports_mass(spark):
    model = train_ngram_lm(_df(spark), "text", n=2, min_count=2)
    got = {(r["order"], r["gram"]) for r in model.counts.collect()}
    py_counts, py_total = _py_model(DOCS, 2)
    assert got == {k for k, c in py_counts.items() if c >= 2}
    assert model.total == py_total  # N unaffected by pruning
    expect_dropped = {
        k: sum(c for (o, _), c in py_counts.items() if o == k and c < 2)
        for k in (1, 2)
    }
    assert model.truncated_mass == expect_dropped
    # pruned model still scores every doc (backoff catches the holes)
    out = score_perplexity(_df(spark), "text", "doc_id", model)
    assert out.count() == len(DOCS)


def test_max_grams_cap_deterministic(spark):
    m1 = train_ngram_lm(_df(spark), "text", n=2, max_grams=5)
    m2 = train_ngram_lm(_df(spark), "text", n=2, max_grams=5)
    rows1 = sorted(map(tuple, m1.counts.collect()))
    rows2 = sorted(map(tuple, m2.counts.collect()))
    assert rows1 == rows2
    per_order = Counter(r[0] for r in rows1)
    assert all(v <= 5 for v in per_order.values())
    assert m1.truncated_mass[1] > 0  # 18 unigrams -> cap dropped mass


def test_scoring_plan_broadcasts_model_single_doc_exchange(spark):
    model = train_ngram_lm(_df(spark), "text", n=2)
    out = score_perplexity(_df(spark), "text", "doc_id", model)
    out.collect()
    plan = (out._jdf.queryExecution().executedPlan().toString()
            .split("Initial Plan")[0])
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the only corpus-keyed exchange is the final per-doc aggregate (the
    # other hash exchanges in the plan are the model's own bounded
    # (order, gram) count aggregates feeding the broadcasts)
    assert plan.count("Exchange hashpartitioning(__id") == 1


def _audit(spark, rows, event, pk0):
    return spark.createDataFrame(
        [(i, t, event, pk0 + j) for j, (i, t) in enumerate(rows)],
        "doc_id long, text string, audit_event string, audit_pk long")


def test_maintained_counts_equal_retrain_across_batches(spark):
    from cdc_audit_spark.operators.ngram_lm import (
        incremental_ngram_counts,
        lm_from_counts,
        maintain_ngram_counts,
    )

    base = _df(spark)
    # batch 1: update doc 2, delete doc 5
    b1 = _audit(spark, [(2, "the dog sat on the log")], "update", 100).unionByName(
        _audit(spark, [(5, "zyxxy unseen tokens only")], "delete", 110))
    # batch 2: insert doc 6, update doc 2 again (migrating grams twice)
    b2 = _audit(spark, [(6, "a cat and a dog")], "insert", 200).unionByName(
        _audit(spark, [(2, "the fish ate the cat")], "update", 210))

    c1 = incremental_ngram_counts(base, b1, "text", ["doc_id"], n=2)
    mid_docs = [(1, DOCS[0][1]), (2, "the dog sat on the log"),
                (3, DOCS[2][1]), (4, DOCS[3][1])]
    mid = spark.createDataFrame(mid_docs, "doc_id long, text string")
    c2 = maintain_ngram_counts(c1, mid, b2, "text", ["doc_id"], n=2)

    final_docs = [(1, DOCS[0][1]), (2, "the fish ate the cat"),
                  (3, DOCS[2][1]), (4, DOCS[3][1]), (6, "a cat and a dog")]
    expect = train_ngram_lm(
        spark.createDataFrame(final_docs, "doc_id long, text string"),
        "text", n=2)
    got = {(r["order"], r["gram"]): r["cnt"] for r in c2.collect()}
    want = {(r["order"], r["gram"]): r["cnt"] for r in expect.counts.collect()}
    assert got == want

    # the rehydrated state scores EXACTLY like a from-scratch model
    model = lm_from_counts(c2, n=2)
    assert model.total == expect.total
    probe = spark.createDataFrame(
        [(1, "the cat and the dog"), (2, "qqq www")],
        "doc_id long, text string")
    a = sorted(map(tuple, score_perplexity(probe, "text", "doc_id", model).collect()))
    b = sorted(map(tuple, score_perplexity(probe, "text", "doc_id", expect).collect()))
    assert a == b


def test_maintained_counts_drop_vanished_grams(spark):
    from cdc_audit_spark.operators.ngram_lm import incremental_ngram_counts

    base = _df(spark)
    batch = _audit(spark, [(5, "zyxxy unseen tokens only")], "delete", 100)
    counts = incremental_ngram_counts(base, batch, "text", ["doc_id"], n=2)
    grams = {r["gram"] for r in counts.collect()}
    assert "zyxxy" not in grams          # unique to the deleted doc
    assert "zyxxy unseen" not in grams
    assert "the" in grams                # everything else intact


def test_lm_oov_rate_detects_drift_and_retrain_restores(spark):
    """The maintained-LM health monitor: in-distribution text holds a low
    OOV rate, a shifted corpus spikes it, and retraining on the shifted
    corpus restores it — the retrain trigger loop."""
    from cdc_audit_spark.operators.ngram_lm import lm_oov_rate

    model = train_ngram_lm(_df(spark), "text", n=2)
    healthy = lm_oov_rate(_df(spark), "text", "doc_id", model)
    assert healthy["oov_rate"] == 0.0  # self-scored: every gram known
    assert healthy["n_tokens"] == sum(
        len(t.split()) for _, t in DOCS)
    assert healthy["top_tier_rate"] > 0.5

    shifted_rows = [(100 + i, f"verschiebung korpus drift w{i} w{i+1} neu")
                    for i in range(6)]
    shifted = spark.createDataFrame(shifted_rows, "doc_id long, text string")
    drifted = lm_oov_rate(shifted, "text", "doc_id", model)
    assert drifted["oov_rate"] > 0.8

    retrained = train_ngram_lm(_df(spark).unionByName(shifted), "text", n=2)
    restored = lm_oov_rate(shifted, "text", "doc_id", retrained)
    assert restored["oov_rate"] == 0.0


@pytest.mark.parametrize("n", [2, 3])
def test_perplexity_micro_tracks_python_reference(spark, n):
    """micro=True (the driver-hashable path) quantizes each position's
    log10 score to integer micro-units: the mean must track the exact
    Python reference within the quantization bound (5e-7 per position,
    averaged), and n_tokens/doc coverage must be identical."""
    model = train_ngram_lm(_df(spark), "text", n=n)
    py_counts, py_total = _py_model(DOCS, n)
    out = {r["doc_id"]: r for r in
           score_perplexity(_df(spark), "text", "doc_id", model,
                            micro=True).collect()}
    assert set(out) == {doc_id for doc_id, _ in DOCS}
    for doc_id, text in DOCS:
        logs = _py_score(_py_tokens(text), py_counts, py_total, n,
                         DEFAULT_ALPHA)
        avg = sum(logs) / len(logs)
        assert out[doc_id]["n_tokens"] == len(logs)
        assert out[doc_id]["avg_log10_score"] == pytest.approx(
            avg, abs=5.1e-7)
