"""Byte-pair encoding trained ON the corpus, Spark-first.

The textbook BPE trainer (Sennrich et al. 2016, arXiv 1508.07909) never
iterates over the corpus: it iterates over the WORD-FREQUENCY TABLE.
That split maps cleanly onto Spark:

- **Corpus-scale work** (the only part that touches 100 TB) is ONE
  aggregation: ``explode(split(text)) → groupBy(word).count()`` — a
  single shuffle with map-side combine, exactly the word-count shape
  Spark is best at. ``max_words`` keeps the driver table bounded
  (heavy-hitters truncation; the tail's mass is reported, not silently
  dropped).
- **The merge loop** runs driver-side over that bounded table — the same
  place every published BPE trainer runs it. vocab_size iterations over
  at most max_words entries; no Spark job per merge.
- **Encoding** distributes again: an Arrow-batched ``mapInPandas`` that
  applies the learned merge ranks per UNIQUE word (memoized per batch —
  Zipf makes the cache hit rate extreme), emitting per-doc token counts
  or token lists. Python is justified here: merge application is an
  inherently sequential per-word loop no Catalyst expression expresses.

Determinism: ties in pair frequency break lexicographically, so the
merge list is a pure function of the word table.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["word_frequencies", "train_bpe", "bpe_encode", "apply_merges"]

_EOW = "▁"  # end-of-word sentinel glyph (the sentencepiece marker)


def word_frequencies(
    df: DataFrame, text_col: str, max_words: int = 65536
) -> tuple[list[tuple[str, int]], int]:
    """(top word-count pairs, truncated-tail total). One shuffle."""
    counts = (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), r"\s+"))
                  .alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w").agg(F.count("*").alias("n"))
    )
    # deterministic heavy-hitters: count desc, word asc — TakeOrdered,
    # no global sort materialization
    top = counts.orderBy(F.desc("n"), F.asc("w")).limit(max_words).collect()
    kept = [(r["w"], int(r["n"])) for r in top]
    total = counts.agg(F.sum("n")).first()[0] or 0
    tail = int(total) - sum(n for _, n in kept)
    return kept, tail


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int = 1000,
    max_words: int = 65536,
) -> dict:
    """Learn ``num_merges`` BPE merges from the corpus. Returns
    ``{"merges": [(a, b), ...], "tail_mass": int}`` — merges in rank
    order, ready for :func:`bpe_encode`."""
    words, tail = word_frequencies(df, text_col, max_words)
    # symbol sequences: characters + end-of-word sentinel (classic BPE —
    # merges never cross word boundaries)
    seqs: list[tuple[list[str], int]] = [
        (list(w) + [_EOW], n) for w, n in words]
    merges: list[tuple[str, str]] = []
    for _ in range(int(num_merges)):
        pairs: Counter = Counter()
        for sym, n in seqs:
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        # max count, lexicographic tie-break: deterministic merge list
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for sym, _n in seqs:
            i = 0
            while i < len(sym) - 1:
                if sym[i] == a and sym[i + 1] == b:
                    sym[i:i + 2] = [ab]
                else:
                    i += 1
    return {"merges": merges, "tail_mass": tail}


def apply_merges(word: str, ranks: dict) -> list[str]:
    """Encode one word with the learned merge table (rank-greedy, the
    standard BPE inference): repeatedly merge the lowest-rank adjacent
    pair until none applies."""
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        ranked = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(sym, sym[1:]))
            if (a, b) in ranks
        ]
        if not ranked:
            break
        _, i = min(ranked)
        sym[i:i + 2] = [sym[i] + sym[i + 1]]
    return sym


def bpe_encode(
    df: DataFrame,
    text_col: str,
    id_col: str,
    model: dict,
    emit_tokens: bool = False,
) -> DataFrame:
    """Per-doc BPE statistics — (id, n_bpe_tokens, n_words[, tokens]).

    Arrow-batched ``mapInPandas``; the per-word encoding is memoized per
    batch (Zipf: the same words recur), so the Python cost tracks UNIQUE
    words per batch, not corpus size. The merge table broadcasts by
    closure capture — a few hundred KB."""
    ranks = {tuple(m): i for i, m in enumerate(model["merges"])}
    out_tokens = bool(emit_tokens)
    schema = f"{id_col} long, n_bpe_tokens long, n_words long" + (
        ", tokens array<string>" if out_tokens else "")

    def gen(batches) -> Iterator:
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def enc(word: str) -> list[str]:
            got = cache.get(word)
            if got is None:
                got = cache[word] = apply_merges(word, ranks)
            return got

        for pdf in batches:
            ids, ntok, nw, toks = [], [], [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in str(text).lower().split() if w]
                pieces: list[str] = []
                cnt = 0
                for w in words:
                    e = enc(w)
                    cnt += len(e)
                    if out_tokens:
                        pieces.extend(e)
                ids.append(i)
                ntok.append(cnt)
                nw.append(len(words))
                if out_tokens:
                    toks.append(pieces)
            data = {id_col: ids, "n_bpe_tokens": ntok, "n_words": nw}
            if out_tokens:
                data["tokens"] = toks
            yield pd.DataFrame(data)

    return df.select(id_col, text_col).mapInPandas(gen, schema=schema)
