"""Okapi BM25 full-text retrieval over the document corpus — the lexical
half of a training-data search/curation stack (the other half is the
embedding ANN tier in ``operators.similarity`` / ``streaming.stream_ann``;
``rrf_fuse`` composes the two).

BM25 (Robertson et al., TREC-3 1994) with Lucene's non-negative idf
variant (idf = ln(1 + (N - df + 0.5)/(df + 0.5)), so a term in more than
half the corpus never contributes a negative score)::

    score(q, d) = sum_{t in q}  idf(t) * tf * (k1 + 1)
                               ----------------------------------
                               tf + k1 * (1 - b + b * dl / avgdl)

Spark-first shapes, by deployment mode:

* **Ad-hoc scan scoring** (:func:`bm25_topk`): ZERO corpus shuffles. One
  bounded Catalyst aggregate collects N, sum(dl) and per-query-term
  document frequencies (|q| + 2 scalars — the query term list is bounded
  by construction); the scoring pass is a deliberate Arrow map (one
  tokenize + count per row — the Catalyst forms re-evaluate each
  per-term count tree once per reference and measured ~20× slower; see
  the note in :func:`bm25_score_scan`); the top-k is a TakeOrdered,
  never a global sort.
* **Index-backed scoring** (:func:`bm25_postings` + :func:`bm25_topk_postings`):
  the inverted index is ONE corpus shuffle — explode(words) →
  groupBy(term, doc_id) with map-side combine. Query time filters the
  postings on ``term IN (query)`` — parquet-pushdown-eligible when the
  index is stored term-partitioned/sorted — so only candidate rows move.
* **CDC maintenance** (:func:`bm25_posting_delta` + the manifest stream in
  ``streaming.stream_bm25``): the WHOLE index state is one signed
  (term, doc_id, tf) table. Everything else derives from its fold by
  bounded aggregates: dl(d) = sum_t tf (every occurrence is counted, so
  the per-doc tf sum IS the token count), df(t) = count per term,
  N = distinct docs, avgdl = sum(tf)/N. A micro-batch therefore commits
  ONLY its signed posting delta — O(batch), never O(index) or O(corpus)
  — the same LSM contract as the LM counts stream (VERDICT r08 #1).

Cross-engine exactness: per-(term, doc) score contributions are quantized
to integer micro-units (floor(x * 1e6 + 0.5), the established micro=True
pattern of ``operators.ngram_lm``) and summed as BIGINTs, so per-doc
scores — and crucially the top-k ORDER — are bit-identical across engines
and shuffle orders; ties break on the id.

No reference parity: the reference (dan-da/cdc_audit, PHP trigger
generator) has no text retrieval; this extends the engine's LLM-pipeline
surface (SURVEY §2.11).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdc_audit_spark.operators.ngram_lm import _words

__all__ = [
    "bm25_df_delta",
    "bm25_norms",
    "bm25_norms_delta",
    "bm25_postings",
    "bm25_posting_delta",
    "bm25_score_scan",
    "bm25_stats_delta",
    "fold_bm25_dfs",
    "bm25_topk",
    "bm25_topk_join",
    "bm25_topk_postings",
    "bm25_topk_served",
    "fold_bm25_norms",
    "fold_bm25_postings",
    "incremental_bm25_postings",
    "postings_corpus_stats",
    "rrf_fuse",
]

#: BM25 free parameters (the universal defaults; Robertson & Zaragoza 2009
#: §3.3 report the k1 ∈ [1.2, 2], b = 0.75 plateau).
DEFAULT_K1 = 1.2
DEFAULT_B = 0.75

#: Micro-unit quantum for engine-exact score arithmetic.
_MICRO = 1_000_000.0

#: Reciprocal-rank-fusion dampening constant (Cormack et al., SIGIR 2009
#: use 60; the method is famously insensitive to it).
RRF_K = 60


def _idf(n_docs: int, df: int) -> float:
    """Lucene's non-negative BM25 idf. Plain Python ``math.log`` — the
    same libm ``ln`` the DuckDB oracle calls, and the downstream
    micro-quantization absorbs sub-micro disagreement anyway."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_postings(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """The inverted index: one (term, doc id, tf) row per distinct term
    per document. ONE corpus shuffle — explode is map-side, the
    groupBy's partial aggregation collapses each doc's repeats before
    the exchange, and the shuffle key (term, id) is near-unique so no
    skew salting is needed. At scale, write it term-sorted so query-time
    ``term IN`` filters prune row groups."""
    return (
        df.select(F.col(id_col), F.explode(_words(text_col)).alias("term"))
        .groupBy("term", id_col)
        .agg(F.count("*").cast("long").alias("tf"))
    )


def postings_corpus_stats(postings: DataFrame, id_col: str):
    """(N docs, total token count) from a postings table — one bounded
    aggregate (two scalars). dl(d) = sum_t tf(t, d) because tf counts
    every occurrence, so sum(tf) is the corpus token count exactly."""
    row = postings.agg(
        F.countDistinct(id_col).alias("n"),
        F.sum("tf").alias("s"),
    ).first()
    return int(row["n"] or 0), int(row["s"] or 0)


def bm25_score_scan(
    df: DataFrame,
    text_col: str,
    id_col: str,
    terms: list[str],
    *,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> DataFrame:
    """Score every document against a bounded query term list straight
    off the corpus scan — no index, no shuffle. Two passes over the
    corpus: a bounded stats aggregate (N, sum dl, df per query term —
    |q| + 2 scalars collected), then a map-side scoring projection.
    Returns (id, n_hit_terms, score_micro, score) for docs matching at
    least one term; ``score_micro`` is the exact BIGINT sort key.

    N counts only docs with >= 1 token — the SAME convention the
    postings paths use (a token-less doc never creates a posting, so
    ``countDistinct(id)`` over postings can't see it); without this an
    empty or punctuation-only document would make idf/avgdl diverge
    between the scan and index/served paths. Duplicate query terms are
    deduped order-preserving at entry (every path scores each DISTINCT
    term once; the postings grain is (term, doc), so a duplicate could
    never contribute twice there anyway)."""
    if not terms:
        raise ValueError("empty query term list")
    terms = list(dict.fromkeys(terms))
    # The bounded stats pass is pure Catalyst: a space-bounded normalized
    # token string (identical token semantics to ``_words`` — lowercase
    # alnum runs), presence via instr, dl via one split — each aggregate
    # input expression evaluates exactly once.
    import re as _re

    s_expr = F.concat(
        F.lit(" "),
        F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " "),
        F.lit(" "))
    norm = df.select(F.col(id_col), s_expr.alias("__s"))
    t_ = F.trim("__s")
    # NULL text must count as dl = 0, not size(NULL) = -1 (which would
    # silently shrink sum_dl and skew avgdl vs the postings paths)
    dl_expr = F.when(t_.isNull() | (t_ == ""), F.lit(0)).otherwise(
        F.size(F.split(t_, " "))).cast("long")

    def _has(term: str):
        # a query term that is not a normalized token can never match one
        if not _re.fullmatch(r"[a-z0-9]+", term):
            return F.lit(False)
        return F.instr("__s", f" {term} ") >= 1

    stats = norm.agg(
        F.sum((dl_expr > 0).cast("long")).alias("n_docs"),
        F.sum(dl_expr).alias("sum_dl"),
        *[F.sum(_has(t).cast("long")).alias(f"df{i}")
          for i, t in enumerate(terms)],
    ).first()
    n_docs = int(stats["n_docs"] or 0)
    if n_docs == 0:
        raise ValueError("empty corpus (no document has any token)")
    avgdl = int(stats["sum_dl"] or 0) / n_docs
    idfs = [_idf(n_docs, int(stats[f"df{i}"] or 0)) for i in range(len(terms))]

    # The scoring pass is a DELIBERATE Arrow stage (the repo's measured
    # pattern — see dedup_minhash_lsh): the Catalyst forms all
    # re-evaluate the per-term count trees once per reference
    # (higher-order filters run interpreted with no CSE; CollapseProject
    # inlines regex-split counts into every consumer), measured 1.9-2.2 s
    # for a 5k-doc pass vs ~0.1 s here. One tokenize + Counter per row,
    # integer micro arithmetic identical to the SQL oracle (same IEEE
    # expression order), zero shuffle — a narrow map behind the scan.
    import math as _math

    import pandas as pd

    k1p1, k1_1mb, k1b = k1 + 1.0, k1 * (1.0 - b), k1 * b
    pat = _re.compile(r"[^a-z0-9]+")
    tset = list(terms)

    def gen(batches):
        for pdf in batches:
            ids, hits_l, micro_l = [], [], []
            for rid, txt in zip(pdf["__id"], pdf["__t"]):
                toks = [w for w in pat.split((txt or "").lower()) if w]
                dl = len(toks)
                counts: dict[str, int] = {}
                for w in toks:
                    counts[w] = counts.get(w, 0) + 1
                m = 0
                h = 0
                for idf, t in zip(idfs, tset):
                    tf = counts.get(t, 0)
                    if tf:
                        h += 1
                        raw = (idf * (tf * k1p1)
                               / (tf + k1_1mb + k1b * dl / avgdl))
                        m += _math.floor(raw * _MICRO + 0.5)
                if m > 0:
                    ids.append(rid)
                    hits_l.append(h)
                    micro_l.append(m)
            yield pd.DataFrame({
                "__id": pd.Series(ids, dtype="int64"),
                "n_hit_terms": pd.Series(hits_l, dtype="int64"),
                "score_micro": pd.Series(micro_l, dtype="int64"),
            })

    scored = (
        df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t"))
        .mapInPandas(gen, schema="__id long, n_hit_terms long, "
                                 "score_micro long")
    )
    return scored.select(
        F.col("__id").alias(id_col),
        "n_hit_terms",
        "score_micro",
        (F.col("score_micro").cast("double") / F.lit(_MICRO)).alias("score"),
    )


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    terms: list[str],
    k: int,
    *,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> DataFrame:
    """Top-k BM25 retrieval off the corpus scan: TakeOrdered on the exact
    micro-integer key (ties break on the id — deterministic under any
    partitioning), never a global sort."""
    scored = bm25_score_scan(df, text_col, id_col, terms, k1=k1, b=b)
    return scored.orderBy(F.desc("score_micro"), F.col(id_col)).limit(k)


def bm25_topk_postings(
    postings: DataFrame,
    id_col: str,
    terms: list[str],
    k: int,
    *,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> DataFrame:
    """Top-k retrieval against a (term, id, tf) inverted index (built by
    :func:`bm25_postings` or folded from the maintained LSM): candidates
    are ``term IN (query)`` — pushdown-eligible, only matching rows move
    — joined to the per-doc norms and aggregated per doc. The norms/df/N
    aggregates here recompute from the postings table; a serving
    deployment materializes them at fold/compaction time (they are one
    bounded aggregate each), which turns this into candidate-only work.
    Result ≡ :func:`bm25_topk` on the same corpus by construction."""
    n_docs, total = postings_corpus_stats(postings, id_col)
    norms = bm25_norms(postings, id_col)
    return bm25_topk_served(postings, norms, n_docs, total, id_col, terms, k,
                            k1=k1, b=b)


def bm25_topk_served(
    postings: DataFrame,
    norms: DataFrame,
    n_docs: int,
    total_tokens: int,
    id_col: str,
    terms: list[str],
    k: int,
    *,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    term_dfs: DataFrame | None = None,
) -> DataFrame:
    """The serving-tier scorer: every input is MAINTAINED state
    (``streaming.stream_bm25`` keeps postings, norms and the (N, total)
    scalars each fresh in O(delta) per micro-batch), so query-time work
    is candidate-bounded — no corpus- or index-scale aggregate runs per
    query:

    * candidates = ``term IN (query)`` over the postings (pushdown);
    * per-term document frequencies come from the MAINTAINED (term, df)
      ledger when ``term_dfs`` is given (|q| point lookups — bounded
      regardless of how common a term is), else from the candidate set
      itself (count-distinct over candidate rows — correct, but a
      stopword-ish term makes that aggregate corpus-sized);
    * per-candidate lengths join against the norms table on the id key
      (candidate-driven lookups; store norms id-bucketed so the join
      co-locates);
    * N and avgdl are the two maintained scalars.

    Result ≡ :func:`bm25_topk` on the same corpus by construction
    (duplicate query terms deduped at entry, same as the scan path)."""
    if not terms:
        raise ValueError("empty query term list")
    terms = list(dict.fromkeys(terms))
    if n_docs == 0:
        raise ValueError("empty index")
    avgdl = total_tokens / n_docs
    cand = postings.filter(F.col("term").isin(terms))
    if term_dfs is not None:
        dfs = {
            r["term"]: int(r["df"])
            for r in term_dfs.filter(F.col("term").isin(terms)).collect()
        }
    else:
        dfs = {
            r["term"]: int(r["n"])
            for r in cand.groupBy("term")
            .agg(F.countDistinct(id_col).alias("n")).collect()
        }
    idfs = [_idf(n_docs, dfs.get(t, 0)) for t in terms]
    cand = cand.join(norms.select(F.col(id_col), F.col("dl").alias("__dl")),
                     id_col)
    idf_map = F.create_map(
        *[x for t, v in zip(terms, idfs) for x in (F.lit(t), F.lit(v))])
    k1p1, k1_1mb, k1b = k1 + 1.0, k1 * (1.0 - b), k1 * b
    tf = F.col("tf")
    raw = (
        idf_map[F.col("term")] * (tf * F.lit(k1p1))
        / (tf + F.lit(k1_1mb) + F.lit(k1b) * F.col("__dl") / F.lit(avgdl))
    )
    contrib = F.floor(raw * F.lit(_MICRO) + F.lit(0.5)).cast("long")
    per_doc = (
        cand.select(F.col(id_col), contrib.alias("__m"))
        .groupBy(id_col)
        .agg(F.sum("__m").alias("score_micro"),
             F.count("*").alias("n_hit_terms"))
        .filter(F.col("score_micro") > 0)
    )
    return (
        per_doc.select(
            id_col, "n_hit_terms", "score_micro",
            (F.col("score_micro").cast("double") / F.lit(_MICRO)).alias("score"))
        .orderBy(F.desc("score_micro"), F.col(id_col))
        .limit(k)
    )


def bm25_topk_join(
    postings: DataFrame,
    norms: DataFrame,
    n_docs: int,
    total_tokens: int,
    id_col: str,
    queries: dict[int, list[str]],
    k: int,
    *,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    term_dfs: DataFrame | None = None,
) -> DataFrame:
    """Batch retrieval — the lexical analog of ``similarity.ivf_knn_join``:
    every query in a BOUNDED query set gets its BM25 top-k in ONE pass
    over the index. The union of all query terms filters the postings
    (pushdown — only candidate rows move), a broadcast (query, term, idf)
    table fans each candidate out to the queries containing its term,
    one (query, doc)-keyed aggregate folds the micro contributions, and
    the per-query top-k is a rank window whose per-partition heads prune
    map-side (WindowGroupLimit — the knn-join pattern; no global sort).
    df/N/avgdl come from maintained state or one bounded recompute, as
    in :func:`bm25_topk_served`. Returns (query_id, id, n_hit_terms,
    score_micro, score), ranks exact on the BIGINT micro key."""
    if not queries or any(not ts for ts in queries.values()):
        raise ValueError("every query needs a non-empty term list")
    # dedupe per query, order-preserving — same convention as the scan
    # and served paths (duplicate terms must not double-count)
    queries = {qid: list(dict.fromkeys(ts)) for qid, ts in queries.items()}
    if n_docs == 0:
        raise ValueError("empty index")
    avgdl = total_tokens / n_docs
    all_terms = sorted({t for ts in queries.values() for t in ts})
    cand = postings.filter(F.col("term").isin(all_terms))
    if term_dfs is not None:
        # maintained (term, df) ledger: |union-of-terms| point lookups —
        # bounded regardless of term frequency (same as the served path)
        dfs = {
            r["term"]: int(r["df"])
            for r in term_dfs.filter(F.col("term").isin(all_terms))
            .collect()
        }
    else:
        dfs = {
            r["term"]: int(r["n"])
            for r in cand.groupBy("term")
            .agg(F.countDistinct(id_col).alias("n")).collect()
        }
    spark = postings.sparkSession
    pairs = spark.createDataFrame(
        [(int(qid), t, _idf(n_docs, dfs.get(t, 0)))
         for qid, ts in queries.items() for t in ts],
        "query_id long, term string, __idf double")

    k1p1, k1_1mb, k1b = k1 + 1.0, k1 * (1.0 - b), k1 * b
    tf = F.col("tf")
    raw = (
        F.col("__idf") * (tf * F.lit(k1p1))
        / (tf + F.lit(k1_1mb) + F.lit(k1b) * F.col("__dl") / F.lit(avgdl))
    )
    contrib = F.floor(raw * F.lit(_MICRO) + F.lit(0.5)).cast("long")
    scored = (
        cand.join(norms.select(F.col(id_col), F.col("dl").alias("__dl")),
                  id_col)
        .join(F.broadcast(pairs), "term")
        .select("query_id", F.col(id_col), contrib.alias("__m"))
        .groupBy("query_id", id_col)
        .agg(F.sum("__m").alias("score_micro"),
             F.count("*").alias("n_hit_terms"))
        .filter(F.col("score_micro") > 0)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro"), F.col(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", id_col, "n_hit_terms", "score_micro",
                (F.col("score_micro").cast("double") / F.lit(_MICRO))
                .alias("score"))
    )


def bm25_norms(postings: DataFrame, id_col: str) -> DataFrame:
    """(id, dl) document lengths from a postings table — dl(d) is the
    per-doc tf sum because tf counts every occurrence. One index-keyed
    aggregate; the serving tier never runs this per query (it maintains
    the norms incrementally via :func:`bm25_norms_delta`)."""
    return postings.groupBy(id_col).agg(F.sum("tf").alias("dl"))


def bm25_norms_delta(posting_delta: DataFrame, id_col: str) -> DataFrame:
    """The SIGNED (id, dl) delta implied by a signed posting delta:
    summing a doc's tf deltas is exactly new_dl − old_dl (updates),
    +dl (inserts) or −dl (deletes) — so the norms table folds with the
    same sum-and-drop-zeros algebra as the postings. O(batch docs)."""
    return (
        posting_delta.groupBy(id_col).agg(F.sum("tf").alias("dl"))
        .filter(F.col("dl") != 0)
    )


def fold_bm25_norms(df: DataFrame, id_col: str) -> DataFrame:
    """Collapse a stack of signed norms deltas (plus an optional absolute
    snapshot) into the current (id, dl) state; docs whose length reached
    0 disappear."""
    return (
        df.select(id_col, "dl")
        .groupBy(id_col)
        .agg(F.sum("dl").alias("dl"))
        .filter(F.col("dl") > 0)
    )


def bm25_stats_delta(
    pre_norms: DataFrame | None,
    norms_delta: DataFrame,
    id_col: str,
) -> tuple[int, int]:
    """The (Δn_docs, Δtotal_tokens) scalars one batch applies to the
    corpus stats — the bounded arithmetic that keeps avgdl maintainable
    without ever counting the norms table at query time:

    * Δtotal = sum of the norms delta (one aggregate over O(batch docs));
    * Δn = docs whose length crossed 0 → a doc counts as NEW when it has
      no pre-state row (the pre-norms lookup is a broadcast semi/anti
      join on the batch's bounded touched-id set), and as REMOVED when
      pre_dl + Δdl == 0.

    Returns plain ints (two scalars — the driver carries them into the
    stats LSM append)."""
    rows = norms_delta.select(F.col(id_col).alias("__id"),
                              F.col("dl").alias("__d"))
    if pre_norms is None:
        agg = rows.agg(
            F.sum("__d").alias("dt"),
            F.count("*").alias("nn"),
        ).first()
        return int(agg["nn"] or 0), int(agg["dt"] or 0)
    pre = pre_norms.select(F.col(id_col).alias("__id"),
                           F.col("dl").alias("__pre"))
    # pre-norms narrowed to the batch's bounded touched-id set first
    # (broadcast semi-join → dir/bucket-prunable at scale), then the
    # batch-sized left join decides new-vs-updated per doc.
    touched_pre = pre.join(F.broadcast(rows.select("__id")), "__id",
                           "left_semi")
    joined = rows.join(touched_pre, "__id", "left")
    agg = joined.agg(
        F.sum("__d").alias("dt"),
        F.sum(F.when(F.col("__pre").isNull(), 1).otherwise(0)).alias("nn"),
        F.sum(F.when(F.col("__pre").isNotNull()
                     & (F.col("__pre") + F.col("__d") == 0), 1)
              .otherwise(0)).alias("nr"),
    ).first()
    return int((agg["nn"] or 0) - (agg["nr"] or 0)), int(agg["dt"] or 0)


# --------------------------------------------------------------------------
# CDC maintenance: the signed-postings LSM algebra
# --------------------------------------------------------------------------

def _posting_debit_credit(
    base: DataFrame,
    audit_batch: DataFrame,
    text_col: str,
    pk_cols: list[str],
) -> DataFrame:
    """Un-folded signed posting contribution of one audit batch: debit
    the touched docs' OLD term frequencies (negative), credit the
    surviving final images' (positive). Only the batch's tokens and the
    semi-join-narrowed old images move — the corpus is never rescanned."""
    from cdc_audit_spark.compact import keep_last_per_key
    from cdc_audit_spark.schema import AUDIT_EVENT

    final = keep_last_per_key(audit_batch, pk_cols)
    touched = final.select(*pk_cols)
    old = base.join(F.broadcast(touched), pk_cols, "left_semi")
    debit = bm25_postings(old, text_col, pk_cols[0]).withColumn(
        "tf", -F.col("tf"))
    credit = bm25_postings(
        final.filter(F.col(AUDIT_EVENT) != "delete"), text_col, pk_cols[0])
    return debit.unionByName(credit)


def bm25_posting_delta(
    base: DataFrame,
    audit_batch: DataFrame,
    text_col: str,
    pk_cols: list[str],
) -> DataFrame:
    """The SIGNED (term, id, tf) delta one audit batch applies to the
    inverted index — the LSM write unit (O(batch tokens), never O(index)):
    ``fold(index ∪ delta)`` equals rebuilding on the post-batch corpus.
    Exact cancellations (an update that keeps a term's tf) are dropped,
    so no-op churn commits nothing."""
    return (
        _posting_debit_credit(base, audit_batch, text_col, pk_cols)
        .groupBy("term", pk_cols[0])
        .agg(F.sum("tf").alias("tf"))
        .filter(F.col("tf") != 0)
    )


def bm25_df_delta(
    pre_postings: DataFrame | None,
    posting_delta: DataFrame,
    id_col: str,
) -> DataFrame:
    """The SIGNED (term, df) delta a posting delta implies — the
    document-frequency ledger's write unit (VERDICT r09 #4): a doc
    crosses INTO term t (+1) when its pre tf was 0 and the delta makes
    it positive, OUT (-1) when a positive pre tf reaches 0; pure tf
    changes cancel. Keeping df maintained means the serving scorer
    never aggregates it from candidates per query — a stopword-ish term
    would otherwise make that aggregate corpus-sized.

    ``pre_postings`` is the PRE-epoch index state narrowed to the
    delta's terms (a term-pruned read — candidate-bounded under the
    term-clustered layout); ``None`` means no pre state (bootstrap:
    every positive delta row is a crossing in). The join broadcasts the
    batch-sized delta."""
    if pre_postings is None:
        return (
            posting_delta.filter(F.col("tf") > 0)
            .groupBy("term")
            .agg(F.count("*").cast("long").alias("df"))
        )
    d = posting_delta.select("term", F.col(id_col), F.col("tf").alias("__d"))
    p = pre_postings.select("term", F.col(id_col),
                            F.col("tf").alias("__pre"))
    j = F.broadcast(d).join(p, ["term", id_col], "left")
    pre = F.coalesce(F.col("__pre"), F.lit(0))
    post = pre + F.col("__d")
    sign = (
        F.when((pre == 0) & (post > 0), 1)
        .when((pre > 0) & (post <= 0), -1)
        .otherwise(0)
    )
    return (
        j.select("term", sign.alias("__s"))
        .groupBy("term")
        .agg(F.sum("__s").cast("long").alias("df"))
        .filter(F.col("df") != 0)
    )


def fold_bm25_dfs(df: DataFrame) -> DataFrame:
    """Collapse the signed (term, df) ledger to the current document
    frequencies; terms whose df reached 0 disappear."""
    return (
        df.select("term", "df")
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .filter(F.col("df") > 0)
    )


def fold_bm25_postings(df: DataFrame, id_col: str) -> DataFrame:
    """Collapse a stack of signed posting deltas (plus an optional
    absolute snapshot at the bottom) into the current index: sum per
    (term, id), zero rows disappear. One index-keyed aggregate; never
    touches the corpus."""
    return (
        df.select("term", id_col, "tf")
        .groupBy("term", id_col)
        .agg(F.sum("tf").alias("tf"))
        .filter(F.col("tf") > 0)
    )


def incremental_bm25_postings(
    base: DataFrame,
    audit_batch: DataFrame,
    text_col: str,
    pk_cols: list[str],
) -> DataFrame:
    """Bootstrap + one maintenance step — the self-contained form the
    oracle-checked query uses (equality with indexing the post-batch
    corpus directly proves the maintenance algebra)."""
    boot = bm25_postings(base, text_col, pk_cols[0])
    delta = bm25_posting_delta(base, audit_batch, text_col, pk_cols)
    return fold_bm25_postings(boot.unionByName(delta), pk_cols[0])


# --------------------------------------------------------------------------
# Hybrid retrieval: reciprocal rank fusion
# --------------------------------------------------------------------------

def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str,
    k: int,
    *,
    rrf_k: int = RRF_K,
) -> DataFrame:
    """Reciprocal rank fusion (Cormack et al., SIGIR 2009) of two BOUNDED
    candidate lists — each input is a retriever's top-N (id, rank) with
    rank 1-based — fused as sum(1 / (rrf_k + rank)) over the union, a
    missing list contributing 0. The inputs are bounded by construction
    (each retriever's own top-N), so the outer join, the fusion sum and
    the final sort are all candidate-sized — this is how hybrid
    lexical+vector retrieval stays cheap at corpus scale: fuse the
    heads, never the corpora. Exactly two IEEE divisions and one add per
    row, no reduction-order dependence — engine-exact without
    quantization; ties break on the id."""
    a = ranked_a.select(F.col(id_col), F.col("rank").alias("__ra"))
    b = ranked_b.select(F.col(id_col), F.col("rank").alias("__rb"))
    fused = (
        a.join(b, id_col, "full_outer")
        .select(
            F.col(id_col),
            (F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("__ra")), F.lit(0.0))
             + F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("__rb")),
                          F.lit(0.0))).alias("rrf_score"),
            F.col("__ra").alias("rank_a"),
            F.col("__rb").alias("rank_b"),
        )
    )
    return fused.orderBy(F.desc("rrf_score"), F.col(id_col)).limit(k)


def with_rank(topk: DataFrame, order_cols: list, id_col: str) -> DataFrame:
    """1-based rank over a BOUNDED top-N candidate list (a single-
    partition window — fine here precisely because the input is a
    retriever's own top-N, never the corpus)."""
    w = Window.orderBy(*order_cols, F.col(id_col))
    return topk.withColumn("rank", F.row_number().over(w).cast("long"))
