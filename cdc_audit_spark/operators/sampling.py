"""Deterministic dataset sampling / splitting / sharding for training-data
pipelines (beyond-reference, SURVEY §2.11 north star).

Everything here keys off a *portable content hash* — the integer value of a
prefix of ``md5(key)`` — rather than Spark's ``rand()`` or ``hash()``:

* **Reproducible across engines and runs**: the same row lands in the same
  split/bucket on Spark, DuckDB (the oracle), or any other engine with md5 —
  no seed plumbing, no RNG-order dependence, no partition-count dependence.
* **Map-side only**: split / sample / mix are pure ``filter``/``withColumn``
  over the hash — zero shuffles, fully pushdown-friendly, embarrassingly
  parallel at 100 TB. Only stratified-N and pack_chunks shuffle (one hash
  partition on the stratum key — bounded by the number of strata, not rows).
* **Stable under append**: a row's assignment never changes when the dataset
  grows, so incremental pipeline runs keep historical splits intact (the
  property ``rand(seed)`` famously lacks).

The reference engine has no sampling surface; this module is the
training-pipeline extension mandated by the build brief. Hash-prefix
bucketing follows the standard train/test-split-by-hash recipe (e.g. the
``FARM_FINGERPRINT % 10`` idiom in public BigQuery/TFX docs), re-expressed
with md5 for engine portability.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 6 hex chars = 24 bits: big enough that fraction thresholds resolve to
# ~0.000006% granularity, small enough to stay in exact-int territory in
# every engine (DuckDB INT, Spark int).
HASH_BITS = 24
HASH_SPACE = 1 << HASH_BITS  # 16_777_216


def hash_bucket(key: Column, n_buckets: int | None = None) -> Column:
    """Portable deterministic bucket for a (string-castable) key column.

    ``int(md5(key)[:6], 16)`` ∈ [0, 2^24); optionally reduced mod n_buckets.
    DuckDB spelling: ``('0x' || substr(md5(k), 1, 6))::INT [% n]``.
    """
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 6), 16, 10).cast("int")
    return h if n_buckets is None else h % n_buckets


def hash_bucket_sql(key_sql: str, n_buckets: int | None = None) -> str:
    """The DuckDB-equivalent SQL text for :func:`hash_bucket` (oracle side)."""
    h = f"('0x' || substr(md5(CAST({key_sql} AS VARCHAR)), 1, 6))::INT"
    return h if n_buckets is None else f"({h} % {n_buckets})"


def deterministic_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/valid/test...) by hash range.

    ``splits`` maps name -> weight; weights are normalized and laid out as
    contiguous ranges of the 24-bit hash space in the given dict order, so
    the assignment is a single map-side CASE — no shuffle, no RNG, stable
    under appends. Rounding: range edges are ``round(cum_weight * 2^24)``,
    so edge placement is deterministic and exhaustive (last range absorbs
    the remainder).
    """
    total = sum(splits.values())
    if total <= 0:
        raise ValueError("split weights must sum to a positive value")
    h = hash_bucket(F.col(key_col))
    edges = _split_edges(splits, total)
    expr = None
    for name, lo, hi in edges[:-1]:
        cond = (h >= lo) & (h < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last_name = edges[-1][0]
    expr = F.lit(last_name) if expr is None else expr.otherwise(last_name)
    return df.withColumn(split_col, expr)


def deterministic_split_sql(key_sql: str, splits: dict[str, float]) -> str:
    """DuckDB CASE expression matching :func:`deterministic_split`."""
    total = sum(splits.values())
    h = hash_bucket_sql(key_sql)
    edges = _split_edges(splits, total)
    parts = [
        f"WHEN {h} >= {lo} AND {h} < {hi} THEN '{name}'"
        for name, lo, hi in edges[:-1]
    ]
    return "CASE " + " ".join(parts) + f" ELSE '{edges[-1][0]}' END"


def _split_edges(splits: dict[str, float], total: float) -> list[tuple[str, int, int]]:
    edges, cum = [], 0.0
    lo = 0
    for name, w in splits.items():
        cum += w
        hi = round(cum / total * HASH_SPACE)
        edges.append((name, lo, hi))
        lo = hi
    return edges


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Deterministic ~fraction sample: keep rows whose hash falls below
    ``fraction * 2^24``. Map-side filter — at 100 TB this prunes at the scan
    (the predicate references only the key column) and never shuffles."""
    threshold = round(fraction * HASH_SPACE)
    return df.filter(hash_bucket(F.col(key_col)) < threshold)


def weighted_sample_wor(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    *,
    micro: float = 1e12,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k items (Efraimidis &
    Spirakis 2006, A-ES): each row gets the key ln(u) / w with u the
    portable md5 uniform in (0, 1); the k rows with the LARGEST keys are
    exactly a weight-proportional WOR draw. Deterministic and rerun/
    engine-stable: u comes from the same md5 prefix as every sampler in
    this module (DuckDB spelling: ``ln((('0x' || substr(md5(k), 1, 6))
    ::INT + 1)::DOUBLE / 16777217.0) / w``), and the key is quantized to
    integer ``micro`` units (established micro pattern) so the top-k CUT
    is an exact BIGINT comparison, ties on the key column.

    Scale shape: the key is a map-side expression over (key, weight) only
    — prunable at the scan — and the top-k is a TakeOrdered (per-partition
    heads + driver merge), never a global sort.

    Rows with weight <= 0 are EXCLUDED up front (zero weight means zero
    inclusion probability by definition; a negative weight would flip the
    key's sign and silently always win) — the filter is map-side and
    pushdown-eligible.

    Weight-scale precondition: the most extreme key is
    ``ln(1/(2^24+1)) / w_min * micro`` (≈ -16.64/w_min · micro), which
    must fit in int64 — with the default micro = 1e12 that means
    ``w_min > ~1.9e-6``. The non-ANSI double→long cast would otherwise
    CLAMP silently to Long.MIN, collapsing all tiny-weight keys to one
    value and destroying weight-proportionality — so rows below the safe
    minimum raise (map-side conditional, no extra pass) rather than
    mis-sample. Rescale weights or lower ``micro`` for tiny-weight data."""
    df = df.filter(F.col(weight_col) > 0)
    # |key| <= |ln(u_min)| / w * micro; keep a safety margin under 2^63
    w_min_safe = -math.log(1.0 / (HASH_SPACE + 1)) * micro / 9.0e18
    u = (hash_bucket(F.col(key_col)) + F.lit(1)).cast("double") / F.lit(
        float(HASH_SPACE + 1))
    key_raw = F.log(u) / F.col(weight_col) * F.lit(micro)
    key = F.when(
        F.col(weight_col) < F.lit(w_min_safe),
        F.raise_error(F.concat(
            F.lit(f"weighted_sample_wor: weight below safe minimum "
                  f"{w_min_safe:.3g} for micro={micro:g} (key would "
                  f"overflow int64 and clamp): "),
            F.col(weight_col).cast("string"))),
    ).otherwise(F.floor(key_raw + F.lit(0.5)).cast("long"))
    return (
        df.withColumn("es_key_micro", key)
        .orderBy(F.desc("es_key_micro"), F.col(key_col))
        .limit(k)
    )


def weighted_source_mix(
    df: DataFrame,
    source_col: str,
    key_col: str,
    keep_fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Down-sample each source to its configured keep-fraction (dataset
    mixing: e.g. keep 100% of wiki, 30% of web crawl). One map-side filter;
    the per-source threshold is a tiny CASE, not a join."""
    h = hash_bucket(F.col(key_col))
    expr = None
    for src, frac in keep_fractions.items():
        cond = F.col(source_col) == src
        thr = round(frac * HASH_SPACE)
        expr = F.when(cond, h < thr) if expr is None else expr.when(cond, h < thr)
    default_thr = round(default_fraction * HASH_SPACE)
    expr = (h < default_thr) if expr is None else expr.otherwise(h < default_thr)
    return df.filter(expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    n_per_stratum: int,
) -> DataFrame:
    """Exactly-N-per-stratum sample, deterministic: rank rows inside each
    stratum by their content hash (tie-broken by key) and keep the first N.

    One shuffle, partitioned on the stratum column. Scale note: rows per
    stratum all land on one task; for pathological strata (one language =
    half the corpus) pre-filter with :func:`hash_sample` down to ~10N per
    stratum first, then rank — the composition stays deterministic.
    """
    w = Window.partitionBy(strata_col).orderBy(
        hash_bucket(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def shard_assign(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    shard_col: str = "shard_id",
) -> DataFrame:
    """Deterministic global shuffle for training-data export: every row gets
    a stable pseudo-random shard in [0, n_shards). Writing with
    ``.repartition(n_shards, shard_col).sortWithinPartitions(hash)`` then
    yields a reproducible shuffled dataset WITHOUT a total sort — the 100 TB
    alternative to ``ORDER BY rand()`` (which is a global range sort)."""
    return df.withColumn(shard_col, hash_bucket(F.col(key_col), n_shards))


def source_quota(
    df: DataFrame,
    key_col: str,
    source_col: str,
    n_per_source: int,
) -> DataFrame:
    """Deterministic per-source document cap — the per-domain quota a
    corpus-mixing pipeline applies so no single source dominates training
    data. Keeps the ``n_per_source`` rows with the lowest portable hash
    priority (tiebroken by key) within each source.

    Hash priority, not arrival order: the kept subset is a uniform sample
    of the source, stable across reruns, engines, and row order. The
    window is PARTITIONED by source — each source ranks independently in
    its own tasks (no global window); a pathologically hot source is one
    partition's sort, bounded further upstream by AQE skew splitting on
    the exchange.
    """
    w = Window.partitionBy(source_col).orderBy(
        hash_bucket(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= n_per_source)
        .drop("__rank")
    )


def pack_chunks(
    df: DataFrame,
    group_col: str,
    key_col: str,
    size_col: Column,
    budget: int,
    pack_col: str = "pack_id",
) -> DataFrame:
    """Assign documents to fixed-budget packs (sequence packing for training
    batches): within each group, order docs by content hash, take the running
    size total, and bin at ``floor((cumsum - size) / budget)``.

    This is *offset packing*, not best-fit bin packing: packs can overflow by
    at most one document, but the assignment is a single window cumsum —
    expressible in every engine, one shuffle on the group column, and
    independent of partitioning. (Greedy best-fit is inherently sequential;
    its Spark form would be a per-group applyInPandas — offered by
    operators.multimodal.chunk_payload for the byte-level analog.)
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(hash_bucket(F.col(key_col)), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(size_col).over(w)
    return df.withColumn(
        pack_col, F.floor((cum - size_col) / F.lit(budget)).cast("long")
    )


def pack_chunks_bfd(
    df: DataFrame,
    group_col: str,
    key_col: str,
    size_col: str,
    budget: int,
    pack_col: str = "pack_id",
) -> DataFrame:
    """Best-fit-decreasing sequence packing (the published low-waste
    upgrade over offset packing — Ding et al. 2024, arXiv 2404.10830,
    "Fewer Truncations Improve Language Modeling", pack documents with
    best-fit bin packing instead of concat-and-split): within each group,
    docs sorted by (size desc, portable hash, key) are placed into the
    open pack with the LEAST remaining room that still fits; packs never
    exceed ``budget`` (offset packing overflows by up to one doc), so no
    document is ever truncated. A doc larger than the budget gets a pack
    of its own (the caller's split/truncate policy applies downstream).

    BFD is inherently sequential per group, so this is a deliberate
    Arrow ``applyInPandas`` stage — the per-GROUP work is bounded (shard
    the corpus so a group's (key, size) pairs fit one task: at 8 bytes a
    row, a 100M-doc group is ~1.6 GB; use more groups) while groups pack
    in parallel. The assignment is deterministic under any partitioning:
    the sort key is data-derived, bins are scanned in creation order, and
    ties break to the earliest-created pack. ``pack_chunks`` remains the
    single-window pure-SQL tier.
    """
    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    narrow = df.select(
        F.col(group_col), F.col(key_col),
        F.col(size_col).cast("long").alias(size_col),
        hash_bucket(F.col(key_col)).alias("__h"),
    )
    out_schema = StructType(
        [narrow.schema[group_col], narrow.schema[key_col],
         narrow.schema[size_col],
         StructField(pack_col, LongType(), False)])

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [size_col, "__h", key_col],
            ascending=[False, True, True]).reset_index(drop=True)
        remaining: list[int] = []  # room left per pack, index = pack id
        ids = []
        for size in pdf[size_col]:
            best, best_room = -1, None
            for i, room in enumerate(remaining):
                if size <= room and (best_room is None or room < best_room):
                    best, best_room = i, room
            if best < 0:
                remaining.append(max(budget - size, 0))
                ids.append(len(remaining) - 1)
            else:
                remaining[best] -= size
                ids.append(best)
        pdf[pack_col] = pd.Series(ids, dtype="int64")
        return pdf[[group_col, key_col, size_col, pack_col]]

    return narrow.groupBy(group_col).applyInPandas(pack, out_schema)


# --------------------------------------------------------------------------
# DSIR-style importance resampling (hashed n-gram features)
# --------------------------------------------------------------------------
# Public method: "Data Selection for Language Models via Importance
# Resampling" (Xie et al., NeurIPS 2023). Select raw-corpus documents
# whose hashed n-gram distribution looks like a TARGET corpus: fit bucket
# unigram+bigram count distributions for both, score each raw doc by the
# summed log-likelihood ratio of its grams, keep the top-scoring docs.
# Everything is Spark-built-ins: a map-side gram explode, two bounded
# n_buckets aggregations, one broadcast join against the ratio table, one
# per-doc re-aggregation, one TakeOrdered. The bucket hash reuses this
# module's portable md5 idiom, so the integer feature layer is
# oracle-checkable in DuckDB verbatim.

#: Default hashed-feature space (the DSIR paper uses 10k buckets).
DSIR_BUCKETS = 8192


def ngram_hash_features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """One row per (doc, gram-occurrence) with the gram's hash bucket —
    the DSIR feature extractor. Grams are lowercased whitespace unigrams
    plus adjacent bigrams; the bucket is the portable md5 hash
    (:func:`hash_bucket`), so DuckDB reproduces it exactly. Map-side
    only (explode of JVM expressions): at 100 TB this pipelines with the
    scan and never shuffles."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    # zip_with pads the shorter side with NULL, which concat_ws would
    # silently turn into a duplicate last unigram — slice to the true
    # n-1 bigrams so DuckDB's list_transform(range(...)) agrees exactly
    zipped = F.zip_with(
        toks, F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(1))),
        lambda a, b: F.concat_ws(" ", a, b))
    bigrams = F.slice(zipped, 1, F.greatest(F.size(toks) - 1, F.lit(0)))
    grams = F.concat(toks, F.when(F.size(toks) > 1, bigrams)
                     .otherwise(F.array()))
    return (df.select(F.col(id_col), F.explode(grams).alias("gram"))
            .where(F.col("gram") != "")
            .select(id_col,
                    hash_bucket(F.col("gram"), n_buckets).alias("bucket")))


def dsir_log_ratios(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = DSIR_BUCKETS,
    smoothing: float = 1.0,
    micro: bool = False,
) -> DataFrame:
    """Per-bucket log(p_target / p_corpus) with add-``smoothing``
    Laplace counts — the DSIR importance model. Two aggregations, each
    collapsing to at most ``n_buckets`` rows regardless of corpus size
    (partial map-side combine does the heavy lifting); the full outer
    join runs on those bounded tables. Returns (bucket, log_ratio);
    with ``micro=True`` the ratio is quantized to BIGINT micro-nats
    (exact downstream arithmetic — the engine-portable scoring path)."""
    def bucket_counts(df, alias):
        return (ngram_hash_features(df, text_col, id_col, n_buckets)
                .groupBy("bucket").agg(F.count("*").alias(alias)))

    c = bucket_counts(corpus, "c_n")
    t = bucket_counts(target, "t_n")
    joined = (c.join(t, "bucket", "full_outer")
              .select("bucket",
                      F.coalesce("c_n", F.lit(0)).alias("c_n"),
                      F.coalesce("t_n", F.lit(0)).alias("t_n")))
    tot = joined.agg(F.sum("c_n").alias("C"), F.sum("t_n").alias("T")).first()
    big_c = float(tot["C"]) + smoothing * n_buckets
    big_t = float(tot["T"]) + smoothing * n_buckets
    lr = (F.log((F.col("t_n") + F.lit(smoothing)) / F.lit(big_t))
          - F.log((F.col("c_n") + F.lit(smoothing)) / F.lit(big_c)))
    if micro:
        # quantize to integer micro-nats: floor(lr*1e6 + 0.5). From here
        # on every aggregate is EXACT integer arithmetic, so per-doc
        # weights are bit-identical across engines and shuffle orders —
        # the oracle-checkable scoring path. The only residual float op
        # was the ln above; a 1-ulp engine difference flips a bucket's
        # micro value only when lr*1e6 sits within that ulp of a floor
        # boundary (~1e-10 per bucket — negligible, and a false flip
        # shifts one weight by 1e-6, below any real selection gap).
        lr = F.floor(lr * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    return joined.select("bucket", lr.alias("log_ratio"))


def dsir_weights(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = DSIR_BUCKETS,
    smoothing: float = 1.0,
    length_normalize: bool = True,
    micro: bool = False,
) -> DataFrame:
    """Per-document DSIR importance weight: the mean (or sum, with
    ``length_normalize=False``) of its grams' log ratios. The ratio
    table is at most ``n_buckets`` rows — broadcast — so the only
    corpus-sized shuffle is the per-doc re-aggregation on ``id_col``.
    Returns (id_col, n_grams, dsir_weight); docs with no grams are
    dropped (no evidence either way).

    ``micro=True`` sums QUANTIZED integer ratios (micro-nats) and emits
    the weight as the deterministic double ``(micro_sum / n_grams) /
    1e6`` — every post-quantization op is exact or correctly-rounded,
    so the weight (and any ordering on it) is bit-identical across
    engines and shuffle orders: the driver-hashable form."""
    ratios = dsir_log_ratios(corpus, target, text_col, id_col,
                             n_buckets, smoothing, micro=micro)
    feats = ngram_hash_features(corpus, text_col, id_col, n_buckets)
    per_doc = (feats.join(F.broadcast(ratios), "bucket")
               .groupBy(id_col)
               .agg(F.count("*").alias("n_grams"),
                    F.sum("log_ratio").alias("__sum")))
    if micro:
        w = F.col("__sum").cast("double")
        if length_normalize:
            w = w / F.col("n_grams")
        w = w / F.lit(1e6)
    else:
        w = (F.col("__sum") / F.col("n_grams") if length_normalize
             else F.col("__sum"))
    return per_doc.select(id_col, "n_grams",
                          w.alias("dsir_weight"))


def dsir_sample(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    n_buckets: int = DSIR_BUCKETS,
    smoothing: float = 1.0,
    gumbel_seed: int | None = None,
    micro: bool = False,
) -> DataFrame:
    """Select the ``n`` corpus docs most target-like under the DSIR
    weight. Deterministic: ties (and the whole ordering) break on the
    doc id, and with ``gumbel_seed`` set the selection becomes the
    paper's Gumbel-top-k resample — still reproducible, because the
    noise is a pure hash of (seed, id), not an RNG. The global top-n is
    a TakeOrdered (no full sort materialization). Returns the selected
    docs with their weights. ``micro=True`` ranks on the quantized
    engine-exact weight (see :func:`dsir_weights`)."""
    w = dsir_weights(corpus, target, text_col, id_col, n_buckets,
                     smoothing, micro=micro)
    score = F.col("dsir_weight")
    if gumbel_seed is not None:
        # inverse-CDF Gumbel from a uniform derived of the portable
        # hash: u in (0,1), g = -log(-log(u)) — deterministic per id
        u = ((hash_bucket(F.concat_ws("\x1f", F.lit(str(gumbel_seed)),
                                      F.col(id_col).cast("string")))
              + F.lit(0.5)) / F.lit(float(HASH_SPACE)))
        score = score + (-F.log(-F.log(u)))
    ranked = w.withColumn("__score", score)
    out = (ranked.orderBy(F.col("__score").desc(), F.col(id_col))
           .limit(n))
    return corpus.join(
        F.broadcast(out.select(id_col, "n_grams", "dsir_weight")), id_col)


def temperature_resample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    alpha: float,
) -> DataFrame:
    """Temperature-based group rebalancing (the T5/mC4 recipe, Raffel et
    al. 2020 arXiv 1910.10683 §3.4.3 / Xue et al. 2021: sample groups
    ∝ p^alpha to keep head languages from drowning the tail). Pure
    DOWNSAMPLING form: each group's keep fraction is
    ``(n_g / n_min) ** (alpha - 1)`` — the smallest group keeps
    everything, larger groups shed mass until the kept distribution is
    ∝ p^alpha (exact up to hash granularity; upsampling/duplication is
    a training-loader concern, not a data-prep one).

    Scale shape: one bounded group-count aggregate, the keep-fraction
    table broadcast back (never collected — group cardinality may be
    large), then the same map-side portable-hash threshold filter every
    sampler here uses: deterministic, append-stable, engine-portable.
    ``alpha=1`` keeps everything; ``alpha=0`` equalizes group masses
    down to the smallest."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    counts = df.groupBy(group_col).agg(F.count("*").alias("__n"))
    n_min = counts.agg(F.min("__n")).first()[0]
    if n_min is None:
        return df
    keeps = counts.select(
        group_col,
        F.pow(F.col("__n") / F.lit(float(n_min)),
              F.lit(alpha - 1.0)).alias("__keep"))
    h = hash_bucket(F.col(key_col))
    return (df.join(F.broadcast(keeps), group_col)
            .filter(h < F.col("__keep") * F.lit(float(HASH_SPACE)))
            .drop("__keep"))


def unimax_allocation(
    df: DataFrame,
    group_col: str,
    weight_col: Column,
    budget: int,
    max_epochs: int = 1,
) -> DataFrame:
    """UniMax budget allocation (Chung et al., ICLR 2023 "UniMax: Fairer
    and More Effective Language Sampling for Large-Scale Multilingual
    Pretraining"): split a token ``budget`` across groups (languages) so
    every group is sampled as uniformly as possible without repeating any
    group more than ``max_epochs`` times. Water-filling closed form:
    processing groups by ascending capacity ``cap = max_epochs * n_tokens``,
    a group is either capped (takes all of ``cap``) or — from the first
    group whose even share of the remaining budget is below its capacity —
    takes exactly that even share, which stays constant for every group
    after it. Returns (group, n_tokens, alloc_tokens, epochs_used).

    Engine-exact: capacities and prefix sums stay BIGINT; the even share
    is ONE double division over exact integers and the cap comparison /
    final min are over that single value, so DuckDB reproduces the doubles
    bit-for-bit (the same exact-ints-then-one-IEEE-op discipline the
    oracle-parity rules mandate).

    Scale shape: one group-count aggregate (shuffle keyed on the group),
    then windows over ONE partition of the per-group table — bounded by
    group cardinality (languages: dozens), not rows; the allocation never
    touches the corpus. Apply the result as a broadcast keep-fraction
    join, as ``temperature_resample`` does."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be positive, got {max_epochs}")
    counts = df.groupBy(group_col).agg(
        F.sum(weight_col).cast("long").alias("n_tokens"))
    cap = (F.lit(int(max_epochs)) * F.col("n_tokens")).cast("long")
    order = Window.orderBy("cap", group_col)
    whole = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = (
        counts.withColumn("cap", cap)
        .withColumn("i", F.row_number().over(order))
        .withColumn(
            "c_prev",
            (F.sum("cap").over(order.rowsBetween(
                Window.unboundedPreceding, Window.currentRow))
             - F.col("cap")).cast("long"))
        .withColumn("n_groups", F.count("*").over(whole))
    )
    u_i = (
        (F.lit(int(budget)) - F.col("c_prev"))
        / (F.col("n_groups") - F.col("i") + F.lit(1)).cast("double")
    ).alias("u_i")
    flagged = ranked.withColumn("u_i", u_i).withColumn(
        "thresh",
        F.min(F.when(F.col("cap").cast("double") > F.col("u_i"),
                     F.struct("i", "u_i"))).over(whole))
    alloc = (
        F.when(F.col("thresh").isNull()
               | (F.col("i") < F.col("thresh.i")),
               F.col("cap").cast("double"))
        .otherwise(F.col("thresh.u_i"))
    )
    return flagged.select(
        group_col,
        "n_tokens",
        alloc.alias("alloc_tokens"),
        (alloc / F.col("n_tokens").cast("double")).alias("epochs_used"),
    )
