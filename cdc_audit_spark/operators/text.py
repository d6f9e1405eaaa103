"""Text-analysis operators: token stats, quality scoring, language ID,
fingerprinting.

All hot-path expressions are built-in pyspark.sql.functions (split, filter,
aggregate, regexp) — they run inside whole-stage codegen; nothing drops to
Python per row. The operators are shaped for 100 TB corpora: every one is a
narrow map over the documents table, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "token_stats",
    "quality_stats",
    "with_quality",
    "fingerprint",
    "gopher_quality_flags",
    "language_id",
    "chunk_text_windows",
    "DEFAULT_STOPWORDS",
    "GOPHER_REQUIRED_STOPWORDS",
]

DEFAULT_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

#: Tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic (fastText-style signal, heuristic tier).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "la", "los", "que", "es"),
    "zh": ("的", "是", "了", "在", "我"),
}


def _tokens(text_col: str) -> Column:
    return F.split(F.col(text_col), r"\s+")


def _stopword_count(tokens: Column, stopwords: tuple[str, ...]) -> Column:
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(tokens, lambda t: F.array_contains(sw, t)))


def _ratio(num: Column, den: Column, scale: int = 6) -> Column:
    """Identical IEEE double division on both engines, emitted as a raw
    double — decimal outputs are banned (the driver's canonicalization
    stringifies Decimal scale-preserving, float64 shortest-repr; see
    tests/oracle_harness.py)."""
    del scale
    return num.cast("double") / den


def token_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
) -> DataFrame:
    t = _tokens(text_col)
    return df.select(
        F.col(id_col),
        F.size(t).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("long").alias("n_distinct"),
        _stopword_count(t, stopwords).cast("long").alias("n_stopwords"),
        F.length(text_col).cast("long").alias("n_chars"),
    )


def _quality_cols(
    text_col: str,
    stopwords: tuple[str, ...],
    min_tokens: int,
    max_tokens: int,
    max_stopword_ratio: float,
) -> dict[str, Column]:
    """The C4/Gopher-style quality expressions, reusable in select
    (quality_stats) and preserve-all (with_quality) forms."""
    t = _tokens(text_col)
    n_tokens = F.size(t)
    sw_ratio = _ratio(_stopword_count(t, stopwords), n_tokens)
    avg_tok = _ratio(F.length(F.regexp_replace(F.col(text_col), " ", "")), n_tokens)
    passes = (
        n_tokens.between(min_tokens, max_tokens)
        & (
            (_stopword_count(t, stopwords).cast("double") / n_tokens)
            < F.lit(max_stopword_ratio)
        )
    )
    return {
        "stopword_ratio": sw_ratio,
        "avg_token_len": avg_tok,
        "passes": passes,
    }


def quality_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
    min_tokens: int = 20,
    max_tokens: int = 1000,
    max_stopword_ratio: float = 0.5,
) -> DataFrame:
    """C4/Gopher-style quality gates: stopword ratio, mean token length,
    token-count band."""
    cols = _quality_cols(text_col, stopwords, min_tokens, max_tokens, max_stopword_ratio)
    return df.select(F.col(id_col), *[c.alias(n) for n, c in cols.items()])


def with_quality(
    df: DataFrame,
    text_col: str,
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
    min_tokens: int = 20,
    max_tokens: int = 1000,
    max_stopword_ratio: float = 0.5,
) -> DataFrame:
    """Preserve-all form of :func:`quality_stats` — appends the quality
    columns so the gate composes into pipelines without a join-back (the
    map-side flag is the 100 TB shape; a self-join on id is not)."""
    cols = _quality_cols(text_col, stopwords, min_tokens, max_tokens, max_stopword_ratio)
    return df.withColumns(cols)


def fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Content fingerprint over normalized text (lowercase, collapsed
    whitespace) — stable under formatting noise."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return df.select(F.col(id_col), F.md5(norm).alias("fingerprint"))


def language_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic language ID: the language whose marker-stopword hit count is
    highest wins; ties break lexicographically; no hits → 'und'.

    Pure JVM expression tree (one filter+size per language). For a real
    pipeline this is the cheap first tier before a model-based classifier.
    """
    t = _tokens(text_col)
    langs = sorted(LANG_MARKERS.items())
    # struct sort compares fields in order: (score desc, inv desc) where inv
    # inverts the lexicographic index → ties resolve to the smallest lang.
    scores = [
        F.struct(
            _stopword_count(t, markers).alias("score"),
            F.lit(len(langs) - 1 - i).alias("inv"),
            F.lit(lang).alias("lang"),
        )
        for i, (lang, markers) in enumerate(langs)
    ]
    best = F.sort_array(F.array(*scores), asc=False)[0]
    return df.select(
        F.col(id_col),
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        best["score"].cast("long").alias("marker_hits"),
    )


#: The Gopher rule set's required "stop words" (Rae et al. 2021, arXiv
#: 2112.11446 §A1.1): a document must contain at least 2 of these to pass.
GOPHER_REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    min_words: int = 15,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_word_frac: float = 0.80,
    max_dup_word_frac: float = 0.60,
    min_stopword_hits: int = 2,
    required_stopwords: tuple[str, ...] = GOPHER_REQUIRED_STOPWORDS,
) -> DataFrame:
    """The Gopher quality-rule set (Rae et al. 2021, arXiv 2112.11446
    §A1.1) as one map-side expression tree: word-count band, mean word
    length band, fraction of words containing an alphabetic character,
    duplicate-word fraction (the within-doc repetition signal), and the
    required-stopword presence count. Returns the per-doc metrics plus
    the conjunctive ``gopher_pass`` flag.

    100 TB shape: narrow map over the corpus, zero shuffle, whole-stage
    codegen throughout (split / higher-order filter / regexp — no Python).
    Thresholds parameterized; defaults follow the paper (word band relaxed
    — the paper's 50..100k assumes web pages, not snippets)."""
    t = _tokens(text_col)
    n_words = F.size(t)
    mean_word_len = _ratio(
        F.length(F.regexp_replace(F.col(text_col), r"\s+", "")), n_words)
    alpha_word_frac = _ratio(
        F.size(F.filter(t, lambda w: w.rlike("[A-Za-z]"))), n_words)
    dup_word_frac = F.lit(1.0) - _ratio(F.size(F.array_distinct(t)), n_words)
    req = F.array(*[F.lit(s) for s in required_stopwords])
    stopword_hits = F.size(F.filter(req, lambda s: F.array_contains(t, s)))
    gopher_pass = (
        n_words.between(min_words, max_words)
        & (mean_word_len >= F.lit(float(min_mean_word_len)))
        & (mean_word_len <= F.lit(float(max_mean_word_len)))
        & (alpha_word_frac >= F.lit(float(min_alpha_word_frac)))
        & (dup_word_frac <= F.lit(float(max_dup_word_frac)))
        & (stopword_hits >= F.lit(int(min_stopword_hits)))
    )
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        alpha_word_frac.alias("alpha_word_frac"),
        dup_word_frac.alias("dup_word_frac"),
        stopword_hits.cast("long").alias("stopword_hits"),
        gopher_pass.alias("gopher_pass"),
    )


def compression_ratio(
    df: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """(id, n_bytes, zlib_ratio): per-doc deflate ratio — the corpus-quality
    signal used by CCNet/RefinedWeb-style web pipelines. Highly repetitive
    or templated text compresses far below prose; near-random text ≈ 1.0.

    No SQL form exists (deflate is algorithmic), so this is a deliberate
    Arrow-batched Python stage: zlib's C deflate over each UTF-8 payload,
    pandas-vectorized batch handling, map-side only — the same cost model
    as the multimodal codec path. Pair with `quality_stats` /
    `text_repetition_stats` thresholds in the filter tier.
    """
    import zlib

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            raw = pdf[text_col].fillna("").str.encode("utf-8")
            n_bytes = raw.str.len()
            comp = raw.map(lambda b: len(zlib.compress(b, 6)))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "n_bytes": n_bytes.astype("int64"),
                    "zlib_ratio": (comp / n_bytes.clip(lower=1)).astype("float64"),
                }
            )

    narrow = df.select(F.col(id_col), F.col(text_col))
    par = df.sparkSession.sparkContext.defaultParallelism
    if narrow.rdd.getNumPartitions() < par:
        narrow = narrow.repartition(par)
    return narrow.mapInPandas(gen, schema="id long, n_bytes long, zlib_ratio double")


def winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowed document fingerprints (Schleimer et al., SIGMOD 2003 —
    the MOSS local fingerprinting algorithm): hash every token k-gram,
    slide a window of ``w`` consecutive hashes, keep each window's
    minimum. Guarantees: any shared token run of length >= k + w - 1
    yields at least one shared fingerprint (detection), and no run
    shorter than k can (noise floor) — the local-similarity complement
    to MinHash's whole-document estimate.

    Pure Catalyst expressions (transform/slice/array_min — no UDF, no
    shuffle before the per-doc distinct-explode), so at 100 TB the
    fingerprint stream pipelines with the scan exactly like
    decontam's n-gram stage. The hash is the portable md5-prefix
    integer, so DuckDB reproduces fingerprints bit-for-bit.

    Returns (id, fp) — one row per distinct fingerprint per doc. Docs
    with fewer than k tokens yield none; docs with fewer than w hashes
    yield their global minimum (the standard boundary rule).
    """
    # Let-binding discipline (exprs.bind): tokens and gram hashes are
    # bound as lambda variables, NOT inlined expression trees — an
    # inlined array subtree inside a higher-order lambda re-evaluates on
    # EVERY iteration, turning the per-doc cost into O(n^2) md5 calls
    # (measured 10x+ on sf0.1 docs); a bound lambda variable is a slot
    # read, evaluated once per row. Same output, same zero-shuffle plan.
    # The ~100-node tree itself is memoized per (text_col, k, w) — its
    # py4j construction latency is re-paid per epoch otherwise
    # (exprs.memo_column).
    from cdc_audit_spark.operators.exprs import bind, memo_column

    def build_fps():
        toks_expr = F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
            lambda t: F.length(t) > 0)

        def fps_from_tokens(t):
            n_h = F.size(t) - k + 1   # number of k-grams

            def gram_hash(i):
                g = F.array_join(F.slice(t, i + 1, k), " ")
                return F.conv(F.substring(F.md5(g), 1, 6), 16, 10).cast("int")

            hashes = (
                F.when(n_h >= 1,
                       F.transform(F.sequence(F.lit(0), n_h - 1), gram_hash))
                .otherwise(F.array().cast("array<int>")))

            def fps_from_hashes(hs):
                return (
                    F.when(n_h >= w, F.transform(
                        F.sequence(F.lit(0), n_h - w),
                        lambda j: F.array_min(F.slice(hs, j + 1, w))))
                    .when(n_h >= 1, F.array(F.array_min(hs)))
                    .otherwise(F.array().cast("array<int>")))

            return bind(hashes, fps_from_hashes)

        return F.explode(
            F.array_distinct(bind(toks_expr, fps_from_tokens))).alias("fp")

    fp_col = memo_column(("winnow_fps", text_col, k, w), build_fps)
    narrow = df.select(F.col(id_col).alias("id"), F.col(text_col))
    if not df.isStreaming:
        par = df.sparkSession.sparkContext.defaultParallelism
        if narrow.rdd.getNumPartitions() < par:
            narrow = narrow.repartition(par)
    return narrow.select("id", fp_col)


def winnow_overlap_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_fp_df: int | None = None,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowed fingerprints —
    local plagiarism/copy detection. One self-equi-join on the 4-byte
    fingerprint (never all-pairs: candidate generation is bucketed by
    fp, like LSH's band join), then a count filter. Returns
    (id_a, id_b, shared_fps) with id_a < id_b.

    The self-join is within-fingerprint all-pairs BY NECESSITY — the
    operator counts shared fingerprints per pair, which star edges
    cannot express — so a fingerprint shared by g documents emits
    g(g-1)/2 rows on one join key. ``max_fp_df`` (default off, keeping
    the oracle-checked form exact) is the standard mitigation: drop
    fingerprints whose document frequency exceeds the cap before the
    join (the MinHashLSH hot-band discard — boilerplate grams carry no
    copy evidence), bounding any group's contribution to
    max_fp_df(max_fp_df-1)/2. Capped fingerprints also stop counting
    toward ``shared_fps``."""
    fps = winnow_fingerprints(df, text_col, id_col, k, w)
    if max_fp_df is not None:
        from cdc_audit_spark.operators.dedup import drop_hot_fingerprints

        fps = drop_hot_fingerprints(fps, max_fp_df)
    a, b = fps.alias("a"), fps.alias("b")
    return (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                   & (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_a"),
                     F.col("b.id").alias("id_b"))
            .agg(F.count("*").alias("shared_fps"))
            .filter(F.col("shared_fps") >= min_shared))


def winnow_star_edges(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    w: int = 4,
    max_fp_df: int | None = None,
) -> DataFrame:
    """Connectivity edges over winnowed fingerprints for CLOSURE-based
    consumers (any shared fingerprint ⇒ same component, i.e. the
    min_shared=1 semantics): star edges per fingerprint group —
    identical transitive closure to the all-pairs join at O(g) instead
    of O(g²) rows per group (see ``fingerprint_star_edges``). Use
    ``winnow_overlap_pairs`` only when per-pair shared-fingerprint
    COUNTS are needed (min_shared > 1). Output: (id_a, id_b) with
    id_a = the group minimum."""
    from cdc_audit_spark.operators.dedup import fingerprint_star_edges

    return fingerprint_star_edges(
        winnow_fingerprints(df, text_col, id_col, k, w),
        max_fp_df=max_fp_df)


def chunk_text_windows(
    df: DataFrame,
    text_col: str,
    id_col: str,
    size: int,
    overlap: int = 0,
) -> DataFrame:
    """Overlapping token-window chunking — the RAG/context-window prep
    step: each document becomes windows of ``size`` lowercase-alnum
    tokens starting every ``size - overlap`` tokens (chunk 0 at token 0,
    chunk 1 at the stride, ...; the final windows may be short tails).
    Output: (id, chunk_id, start_tok, n_tokens, chunk_text).

    Pure Catalyst array math — tokenize once, ``sequence`` of window
    starts, ``slice`` + ``concat_ws`` per window, one ``explode``: zero
    shuffles, whole-stage codegen, and engine-portable (the DuckDB
    range/list-slice spelling reproduces it token for token). Documents
    with no tokens produce no chunks."""
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    if not 0 <= overlap < size:
        raise ValueError(
            f"overlap must be in [0, size), got {overlap} for size {size}")
    stride = size - overlap
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda t: F.length(t) > 0)
    starts = F.expr(
        f"sequence(0, greatest(size(__w) - 1, 0), {stride})")
    out = (df.select(F.col(id_col), toks.alias("__w"))
           .filter(F.size("__w") > 0)
           .select(id_col, "__w",
                   F.posexplode(starts).alias("chunk_id", "start_tok")))
    chunk = F.slice(F.col("__w"), F.col("start_tok") + 1, size)
    return out.select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )
