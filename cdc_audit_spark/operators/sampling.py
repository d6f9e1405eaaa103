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
