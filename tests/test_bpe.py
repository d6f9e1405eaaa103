"""BPE trainer/encoder: hand-computed merges on a toy corpus, encoding
invariants, determinism, and the heavy-hitters truncation report."""

import pytest

from cdc_audit_spark.operators.bpe import (
    apply_merges,
    bpe_encode,
    train_bpe,
    word_frequencies,
)

_EOW = "▁"


def test_train_matches_hand_computed_merges(spark):
    """Classic Sennrich toy: corpus {low×5, lower×2, newest×6, widest×3}
    (as repeated words). First merges are verifiable by hand: 'es' (9),
    'est' (9), 'est▁' (9) dominate, then 'lo' (7), 'low' (7)."""
    rows = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame([(i, w) for i, w in enumerate(rows)],
                               "doc_id long, text string")
    model = train_bpe(df, "text", num_merges=5)
    assert model["merges"][:3] == [("e", "s"), ("es", "t"), ("est", _EOW)]
    assert ("l", "o") in model["merges"] and ("lo", "w") in model["merges"]
    assert model["tail_mass"] == 0


def test_apply_merges_rank_greedy():
    ranks = {("e", "s"): 0, ("es", "t"): 1, ("est", _EOW): 2,
             ("l", "o"): 3, ("lo", "w"): 4}
    assert apply_merges("newest", ranks) == ["n", "e", "w", "est" + _EOW]
    assert apply_merges("lowest", ranks) == ["low", "est" + _EOW]
    assert apply_merges("low", ranks) == ["low", _EOW]
    assert apply_merges("zzz", ranks) == ["z", "z", "z", _EOW]


def test_encode_distributed_counts(spark):
    corpus = [(1, "low low lower newest"), (2, "widest newest"), (3, "")]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    model = train_bpe(df, "text", num_merges=50)
    out = {r["doc_id"]: r for r in
           bpe_encode(df, "text", "doc_id", model, emit_tokens=True)
           .collect()}
    # with enough merges every word collapses to ONE token
    assert out[1]["n_words"] == 4 and out[1]["n_bpe_tokens"] == 4
    assert out[2]["tokens"] == ["widest" + _EOW, "newest" + _EOW]
    assert out[3]["n_words"] == 0 and out[3]["n_bpe_tokens"] == 0

    # tokens always reassemble the word exactly (lossless segmentation)
    ranks = {tuple(m): i for i, m in enumerate(model["merges"])}
    for w in ("low", "lower", "newest", "widest", "unseen"):
        assert "".join(apply_merges(w, ranks)) == w + _EOW


def test_determinism_and_truncation(spark):
    rows = [(i, f"w{i % 17} common common") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    m1 = train_bpe(df, "text", num_merges=20)
    m2 = train_bpe(df, "text", num_merges=20)
    assert m1["merges"] == m2["merges"]  # tie-breaks are lexicographic

    words, tail = word_frequencies(df, "text", max_words=3)
    assert len(words) == 3 and words[0][0] == "common"
    assert tail == sum(n for _, n in word_frequencies(df, "text")[0]) \
        - sum(n for _, n in words)
    assert tail > 0  # the truncated mass is reported, not hidden
