"""Corpus-trained n-gram language model with Stupid Backoff — the
web-scale LM quality signal (CCNet, Wenzek et al. 2020, arXiv 1911.00359,
scores documents with a KenLM n-gram model; Stupid Backoff is the
distributed-training variant from Brants et al. 2007, "Large Language
Models in Machine Translation" — designed for exactly this MapReduce/Spark
shape, where held-out smoothing's normalization passes don't scale).

Training (``train_ngram_lm``) is ONE corpus-scale shuffle: every order's
grams are built map-side with Catalyst ``transform``/``sequence`` array
expressions (no Python, no per-order pass), unioned, and counted with
map-side partial aggregation. The model is a bounded (order, gram, cnt)
DataFrame — ``min_count`` pruning is the scale lever (Brants et al. prune
singletons at web scale), ``max_grams`` an optional per-order heavy-hitter
cap with the truncated tail mass reported, not hidden (the same honesty
contract as ``operators.bpe``).

Scoring (``score_perplexity``, ``backoff_tiers``) joins each token
position's gram against the model per order. The model is broadcast when it
fits (size-gated like ``similarity.ivf_knn_join`` — the common case: a
pruned LM is millions of rows, the corpus is billions), so the corpus never
shuffles for the lookups; above the gate the joins fall back to shuffle
hash joins on the gram key. Either way the only corpus-keyed exchange is
the final per-doc aggregate.

Stupid Backoff (bigram default)::

    S(w | prev) = c2(prev w) / c1(prev)            if c2 > 0
                = alpha * c1(w) / N                 elif c1(w) > 0
                = alpha * alpha / N                 otherwise (OOV floor)

Unnormalized by design ("scores", not probabilities — Brants et al. §4):
the per-doc mean log-score ranks documents exactly like CCNet's perplexity
buckets. The first position of a document has no context and backs off to
the unigram tier (no BOS padding; deterministic and documented).

No reference parity: the reference (dan-da/cdc_audit, PHP trigger
generator) has no text operators; this extends the engine's LLM-pipeline
surface (SURVEY §2.11).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "NgramLM",
    "train_ngram_lm",
    "score_perplexity",
    "backoff_tiers",
    "maintain_ngram_counts",
    "ngram_count_delta",
    "fold_ngram_count_deltas",
    "incremental_ngram_counts",
    "lm_from_counts",
    "lm_oov_rate",
]

#: Broadcast ceiling for the model-lookup joins: ~1M grams × ~40 bytes of
#: strings ≈ 40 MB per executor — comfortable; above it the lookup joins
#: fall back to shuffle hash joins (the corpus side then shuffles once per
#: order, still bounded and correct, just not the fast path).
LM_BROADCAST_MAX_GRAMS = 1_000_000

#: Stupid Backoff's fixed backoff penalty (Brants et al. 2007 use 0.4 for
#: every order; tuning it buys ~nothing — that is the paper's point).
DEFAULT_ALPHA = 0.4

_TOKEN_SPLIT = "[^a-z0-9]+"


def _words(text_col: str):
    """lowercase alnum tokens — identical to text_repetition_stats /
    the DuckDB oracle idiom (regexp_split_to_array + len>0 filter)."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT),
        lambda t: F.length(t) > 0,
    )


def _grams(words_col, k: int):
    """All k-grams of a token array as space-joined strings, map-side:
    transform(sequence(0, size-k), i -> w[i] || ' ' || ... || w[i+k-1]).
    Empty array when the doc has fewer than k tokens."""
    if k == 1:
        return words_col
    joined = "concat_ws(' ', " + ", ".join(f"__w[i+{j}]" for j in range(k)) + ")"
    return F.expr(f"transform(sequence(0, size(__w) - {k}), i -> {joined})")


@dataclass
class NgramLM:
    """A trained Stupid Backoff model: ``counts`` is the bounded
    (order, gram, cnt) table (distributed — never collected), ``total``
    the corpus token count N (one scalar), ``n`` the model order,
    ``truncated_mass`` the per-order count mass dropped by pruning
    ({order: dropped_count_sum}, zeros when nothing was pruned)."""

    counts: DataFrame
    total: int
    n: int
    truncated_mass: dict[int, int]

    def order_counts(self, k: int) -> DataFrame:
        return self.counts.filter(F.col("order") == k).select("gram", "cnt")


def train_ngram_lm(
    df: DataFrame,
    text_col: str,
    *,
    n: int = 2,
    min_count: int = 1,
    max_grams: int | None = None,
) -> NgramLM:
    """Train an order-``n`` Stupid Backoff model over the corpus.

    One corpus-scale job: every order's grams are exploded from the same
    map-side token array and counted together (union before the groupBy →
    a single gram-keyed shuffle with map-side combine, not one per order).
    ``min_count`` drops rare grams AFTER the total-mass aggregate, so N and
    the truncation accounting stay exact. ``max_grams`` additionally keeps
    only the top grams per order (count desc, gram asc — deterministic);
    the per-order row_number window is over the already-counted model
    table, never the corpus.
    """
    if n < 1:
        raise ValueError(f"order must be >= 1, got {n}")
    if n > 4:
        raise ValueError("orders above 4 are untested; raise deliberately")

    toks = df.select(_words(text_col).alias("__w"))
    per_order = [
        toks.select(F.lit(k).alias("order"), F.explode(_grams(F.col("__w"), k)).alias("gram"))
        for k in range(1, n + 1)
    ]
    union = per_order[0]
    for p in per_order[1:]:
        union = union.unionByName(p)
    counts = union.groupBy("order", "gram").agg(F.count("*").alias("cnt"))

    # Total token count and pruned-mass accounting in ONE bounded pass over
    # the model table (it is already aggregated; this never re-reads the
    # corpus). sum(cnt) over order=1 is exactly N.
    mass = (
        counts.groupBy("order")
        .agg(
            F.sum("cnt").alias("all_mass"),
            F.sum(F.when(F.col("cnt") < min_count, F.col("cnt")).otherwise(F.lit(0))).alias("dropped"),
        )
        .collect()
    )
    by_order = {int(r["order"]): r for r in mass}
    total = int(by_order[1]["all_mass"]) if 1 in by_order else 0
    truncated = {k: int(r["dropped"]) for k, r in by_order.items()}

    model = counts.filter(F.col("cnt") >= min_count)
    if max_grams is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("order").orderBy(F.col("cnt").desc(), F.col("gram").asc())
        ranked = model.withColumn("__rn", F.row_number().over(w))
        dropped_by_cap = (
            ranked.filter(F.col("__rn") > max_grams)
            .groupBy("order").agg(F.sum("cnt").alias("d")).collect()
        )
        for r in dropped_by_cap:
            truncated[int(r["order"])] = truncated.get(int(r["order"]), 0) + int(r["d"])
        model = ranked.filter(F.col("__rn") <= max_grams).drop("__rn")

    return NgramLM(counts=model, total=total, n=n, truncated_mass=truncated)


def _doc_grams(df: DataFrame, text_col: str, n: int) -> DataFrame:
    """Every order's grams of every row, exploded: (order, gram)."""
    toks = df.select(_words(text_col).alias("__w"))
    parts = [
        toks.select(F.lit(k).alias("order"),
                    F.explode(_grams(F.col("__w"), k)).alias("gram"))
        for k in range(1, n + 1)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def maintain_ngram_counts(
    counts: DataFrame,
    base: DataFrame,
    audit_batch: DataFrame,
    text_col: str,
    pk_cols: list[str],
    *,
    n: int = 2,
) -> DataFrame:
    """Apply one CDC audit batch to the LM's (order, gram, cnt) state —
    the language model stays fresh as the corpus mutates, without ever
    rescanning it (the ANN/dedup-index story applied to the LM tier; the
    algebra is ``mview.maintain_group_sum`` post-explode).

    Debit the touched docs' OLD texts' gram multisets, credit the
    surviving final images' grams; a gram whose count reaches 0
    disappears, exactly as a from-scratch ``train_ngram_lm`` over the
    post-batch corpus would have it (equality is the oracle). ``base`` is
    the pre-batch snapshot; only its touched keys are read (broadcast
    semi-join — the batch is small against the corpus by assumption).
    The merge shuffles the batch's grams plus the count table's keys,
    never the corpus.
    """
    return (
        counts.select("order", "gram", "cnt")
        .unionByName(_gram_debit_credit(base, audit_batch, text_col,
                                        pk_cols, n))
        .groupBy("order", "gram")
        .agg(F.sum("cnt").alias("cnt"))
        .filter(F.col("cnt") > 0)
    )


def _gram_debit_credit(
    base: DataFrame,
    audit_batch: DataFrame,
    text_col: str,
    pk_cols: list[str],
    n: int,
) -> DataFrame:
    """The un-folded debit ∪ credit gram contribution of one audit
    batch — shared by :func:`maintain_ngram_counts` (folded together
    with the count table in ONE aggregation) and
    :func:`ngram_count_delta` (folded alone into the LSM write unit)."""
    from cdc_audit_spark.compact import keep_last_per_key
    from cdc_audit_spark.schema import AUDIT_EVENT

    final = keep_last_per_key(audit_batch, pk_cols)
    touched = final.select(*pk_cols)
    debit = (
        _doc_grams(base.join(F.broadcast(touched), pk_cols, "left_semi"),
                   text_col, n)
        .groupBy("order", "gram").agg((-F.count("*")).alias("cnt"))
    )
    credit = (
        _doc_grams(final.filter(F.col(AUDIT_EVENT) != "delete"), text_col, n)
        .groupBy("order", "gram").agg(F.count("*").alias("cnt"))
    )
    return debit.unionByName(credit)


def ngram_count_delta(
    base: DataFrame,
    audit_batch: DataFrame,
    text_col: str,
    pk_cols: list[str],
    *,
    n: int = 2,
) -> DataFrame:
    """The SIGNED (order, gram, cnt) delta one audit batch applies to the
    LM state — debits of the touched docs' old gram multisets (negative)
    plus credits of the surviving final images (positive), already folded
    per gram with exact cancellations dropped.

    This is the LSM write unit for O(delta) storage maintenance
    (``streaming.stream_lm.apply_lm_manifest_epoch``): a micro-batch
    commits ONLY this delta (size O(batch grams), never O(model) and
    never O(corpus)); readers fold the appended deltas with
    :func:`fold_ngram_count_deltas`, and a compaction cadence
    materializes the fold. ``counts + delta`` folded equals
    :func:`maintain_ngram_counts` by construction."""
    return (
        _gram_debit_credit(base, audit_batch, text_col, pk_cols, n)
        .groupBy("order", "gram")
        .agg(F.sum("cnt").alias("cnt"))
        .filter(F.col("cnt") != 0)
    )


def fold_ngram_count_deltas(df: DataFrame) -> DataFrame:
    """Collapse a stack of appended signed count deltas (plus an optional
    absolute snapshot at the bottom) into the current (order, gram, cnt)
    state: sum per gram, grams whose count reached 0 disappear — exactly
    the state ``maintain_ngram_counts`` would have produced step by step.
    One bounded model-keyed aggregate; never touches the corpus."""
    return (
        df.select("order", "gram", "cnt")
        .groupBy("order", "gram")
        .agg(F.sum("cnt").alias("cnt"))
        .filter(F.col("cnt") > 0)
    )


def incremental_ngram_counts(
    base: DataFrame,
    audit_batch: DataFrame,
    text_col: str,
    pk_cols: list[str],
    *,
    n: int = 2,
) -> DataFrame:
    """Bootstrap + one maintenance step — the self-contained form the
    oracle-checked query uses (equality with training on the post-batch
    corpus directly proves the maintenance algebra)."""
    boot = _doc_grams(base, text_col, n).groupBy("order", "gram").agg(
        F.count("*").alias("cnt"))
    return maintain_ngram_counts(boot, base, audit_batch, text_col, pk_cols, n=n)


def lm_from_counts(counts: DataFrame, n: int = 2) -> NgramLM:
    """Rehydrate a scoreable model from a maintained (order, gram, cnt)
    state table: N is one bounded aggregate over the unigram rows (the
    state IS the model — nothing else persists)."""
    total = counts.filter(F.col("order") == 1).agg(
        F.sum("cnt").alias("s")).collect()[0]["s"]
    return NgramLM(counts=counts, total=int(total or 0), n=n,
                   truncated_mass={})


def _maybe_broadcast(model_df: DataFrame, n_grams: int) -> DataFrame:
    if n_grams <= LM_BROADCAST_MAX_GRAMS:
        return F.broadcast(model_df)
    return model_df


def _positions(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """One row per (doc, token position) carrying the position's gram at
    every order 1..n and its order-k CONTEXT strings (the k-1 tokens
    before it). Built map-side from one token array; positions near the
    doc start simply lack the higher-order grams (NULL -> backoff)."""
    arr = df.select(F.col(id_col).alias("__id"), _words(text_col).alias("__w"))
    out = arr.select("__id", "__w", F.posexplode("__w").alias("__pos", "g1"))
    for k in range(2, n + 1):
        # gram_k at position p exists when p >= k-1: tokens[p-k+1 .. p]
        gram_k = F.when(
            F.col("__pos") >= k - 1,
            F.concat_ws(" ", *[F.get("__w", F.col("__pos") - (k - 1 - j)) for j in range(k)]),
        )
        ctx_k = F.when(
            F.col("__pos") >= k - 1,
            F.concat_ws(" ", *[F.get("__w", F.col("__pos") - (k - 1 - j)) for j in range(k - 1)]),
        )
        out = out.withColumn(f"g{k}", gram_k).withColumn(f"ctx{k}", ctx_k)
    return out.drop("__w")


def _scored(df: DataFrame, text_col: str, id_col: str, model: NgramLM, alpha: float) -> DataFrame:
    """Per-position Stupid Backoff score columns: __tier (highest order
    whose count exists at this position, 0 = OOV floor) and __logs
    (log10 S). The model joins are broadcast under the size gate."""
    n = model.n
    pos = _positions(df, text_col, id_col, n)
    n_model_grams = model.counts.count()

    for k in range(1, n + 1):
        mk = _maybe_broadcast(
            model.order_counts(k).withColumnRenamed("gram", f"__mg{k}").withColumnRenamed("cnt", f"c{k}"),
            n_model_grams,
        )
        pos = pos.join(mk, pos[f"g{k}"] == mk[f"__mg{k}"], "left").drop(f"__mg{k}")
        if k >= 2:
            ck = _maybe_broadcast(
                model.order_counts(k - 1)
                .withColumnRenamed("gram", f"__mc{k}")
                .withColumnRenamed("cnt", f"cc{k}"),
                n_model_grams,
            )
            pos = pos.join(ck, pos[f"ctx{k}"] == ck[f"__mc{k}"], "left").drop(f"__mc{k}")

    # Backoff cascade, highest order first. A tier-k hit needs BOTH the
    # gram count and its context count (min_count/max_grams pruning can
    # in principle drop a context while keeping the gram — guard, don't
    # assume the subset property).
    la = math.log10(alpha)
    logN = math.log10(model.total) if model.total else 0.0
    # Every failed tier costs one alpha, the OOV floor included: tier-k
    # hit scores alpha^(n-k) * c_k/ctx_k; unigram alpha^(n-1) * c1/N;
    # full miss alpha^n / N.
    floor = F.lit(n * la - logN)
    tier_expr = F.lit(0)
    logs_expr = floor
    for k in range(1, n + 1):
        if k == 1:
            hit = F.col("c1").isNotNull()
            score = F.log10(F.col("c1").cast("double")) - F.lit(logN) + F.lit((n - 1) * la)
        else:
            hit = F.col(f"c{k}").isNotNull() & F.col(f"cc{k}").isNotNull()
            score = (
                F.log10(F.col(f"c{k}").cast("double"))
                - F.log10(F.col(f"cc{k}").cast("double"))
                + F.lit((n - k) * la)
            )
        tier_expr = F.when(hit, F.lit(k)).otherwise(tier_expr)
        logs_expr = F.when(hit, score).otherwise(logs_expr)
    return pos.withColumn("__tier", tier_expr).withColumn("__logs", logs_expr)


def backoff_tiers(
    df: DataFrame,
    text_col: str,
    id_col: str,
    model: NgramLM,
) -> DataFrame:
    """Integer layer of the LM score — per doc, how many token positions
    resolved at each backoff tier (order n hit, ..., unigram hit, OOV
    floor). Pure count algebra: SQL-recomputable end-to-end (the ★
    oracle surface for the LM pipeline; the float log layer is ◇)."""
    s = _scored(df, text_col, id_col, model, DEFAULT_ALPHA)
    aggs = [
        F.sum((F.col("__tier") == k).cast("long")).alias(f"n_tier{k}")
        for k in range(model.n, 0, -1)
    ]
    return (
        s.groupBy(F.col("__id").alias(id_col))
        .agg(F.count("*").alias("n_tokens"), *aggs,
             F.sum((F.col("__tier") == 0).cast("long")).alias("n_oov"))
    )


def lm_oov_rate(
    df: DataFrame,
    text_col: str,
    id_col: str,
    model: NgramLM,
) -> dict:
    """Corpus-level backoff health of ``model`` against ``df`` — the
    operational drift signal for a maintained LM (the ANN recall monitor's
    analog): {n_tokens, oov_rate, unigram_backoff_rate, top_tier_rate}.
    A model maintained from the audit log should hold these flat; a rising
    OOV rate on fresh data says the corpus distribution moved and
    perplexity buckets are drifting — retrain/re-prune. One bounded
    aggregate over the tier layer."""
    tiers = backoff_tiers(df, text_col, id_col, model)
    r = tiers.agg(F.sum("n_tokens").alias("nt"),
                  F.sum("n_oov").alias("oov"),
                  F.sum("n_tier1").alias("t1"),
                  F.sum(f"n_tier{model.n}").alias("top")).first()
    nt = int(r["nt"] or 0)
    return {
        "n_tokens": nt,
        "oov_rate": (int(r["oov"] or 0) / nt) if nt else 0.0,
        "unigram_backoff_rate": (int(r["t1"] or 0) / nt) if nt else 0.0,
        "top_tier_rate": (int(r["top"] or 0) / nt) if nt else 0.0,
    }


def score_perplexity(
    df: DataFrame,
    text_col: str,
    id_col: str,
    model: NgramLM,
    alpha: float = DEFAULT_ALPHA,
    micro: bool = False,
) -> DataFrame:
    """Per-doc (n_tokens, avg_log10_score, perplexity): perplexity =
    10^(-mean log10 S) — the CCNet document-quality signal (low = fluent
    under the corpus LM, high = junk). Default mode means over a double
    sum (shuffle-order-dependent in the last ulps — validated against a
    pure-Python reference at 1e-9).

    ``micro=True`` is the engine-exact scoring path (the DSIR
    ``dsir_weights(micro=True)`` idiom): each position's log10 score is
    quantized to integer micro-units — floor(s*1e6 + 0.5) — summed
    EXACTLY, and the mean emitted as the deterministic double
    ``(micro_sum / n_tokens) / 1e6``; ``avg_log10_score`` is then
    bit-identical across engines and shuffle orders (driver-hashable).
    ``perplexity`` remains a pow() of it — deterministic per engine but
    not cross-engine to the last ulp; hash on the avg, not on it."""
    s = _scored(df, text_col, id_col, model, alpha)
    if micro:
        mlogs = F.floor(F.col("__logs") * F.lit(1e6) + F.lit(0.5)) \
            .cast("bigint")
        out = (
            s.withColumn("__m", mlogs)
            .groupBy(F.col("__id").alias(id_col))
            .agg(F.count("*").alias("n_tokens"),
                 F.sum("__m").alias("__msum"))
            .select(id_col, "n_tokens",
                    ((F.col("__msum").cast("double") / F.col("n_tokens"))
                     / F.lit(1e6)).alias("avg_log10_score"))
        )
    else:
        out = (
            s.groupBy(F.col("__id").alias(id_col))
            .agg(
                F.count("*").alias("n_tokens"),
                (F.sum("__logs") / F.count("*")).alias("avg_log10_score"),
            )
        )
    return out.withColumn(
        "perplexity", F.pow(F.lit(10.0), -F.col("avg_log10_score")))
