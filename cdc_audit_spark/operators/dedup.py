"""Deduplication operators for large-scale corpus cleaning.

Exact dedup is a content-hash groupBy (one shuffle on the digest — never on
the raw text, so shuffle volume is O(rows × 32 bytes) regardless of document
size). Near-dup uses MinHash+LSH: shingle → per-row signature → band keys →
bucket-grouped pair expansion. Signatures have two implementations: an
Arrow/numpy mapInPandas fast path (default — vectorized universal-hash
mixes; Spark's higher-order functions are interpreted, so the pure-SQL
variant pays ~7× in shingle construction) and the pure-expression variant
(no Python workers). At 100 TB the LSH band grouping is the only shuffle,
and it shuffles (id, band_hash) pairs, not documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "exact_dedup",
    "exact_dedup_groups",
    "minhash_signatures",
    "minhash_signatures_arrow",
    "minhash_lsh_pairs",
    "simhash",
    "ngram_jaccard_pairs",
    "semdedup",
    "duplicate_spans",
    "excise_spans",
]

# Seeded universal-hash constants (odd multipliers, signed-64 range).
# Wrap-around long arithmetic requires spark.sql.ansi.enabled=false
# (set by session.get_spark/tune).
import random as _random

_rng = _random.Random(2026)
_MIX_A = [(_rng.getrandbits(62) << 1) | 1 for _ in range(64)]
_MIX_B = [_rng.getrandbits(62) for _ in range(64)]
del _rng


def exact_dedup(df: DataFrame, cols: list[str], order_col: str) -> DataFrame:
    """Keep one deterministic representative (min ``order_col``) per distinct
    value of ``cols``.

    Window-over-digest rather than dropDuplicates: dropDuplicates keeps an
    *arbitrary* row, which breaks rerun determinism; ranking by an explicit
    tiebreak keeps results stable across cluster sizes.
    """
    key = F.md5(F.concat_ws("\x1f", *cols)) if len(cols) > 1 else F.md5(F.col(cols[0]))
    w = Window.partitionBy(key).orderBy(F.col(order_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Duplicate-group summary: content hash, surviving id, copy count."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def cdc_exact_index_sync(
    index: DataFrame | None,
    audit_batch: DataFrame,
    text_col: str,
    id_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Maintain the exact-dedup membership index from a CDC audit batch —
    the corpus-hygiene consumer of the audit log (reference audit rows:
    cdc_audit_gen_mysql.php:331-333; batch shape = sync's delta output).

    ``index`` is the persisted ``(digest, id)`` membership table of the
    current corpus (None for an empty corpus). The batch is reduced to one
    final image per document (keep-last on ``audit_pk``), then:

      * every touched document's old membership row is dropped — by id, so
        the OLD text (which an update's audit row does not carry) is never
        needed;
      * surviving inserts/updates add their new digest membership.

    Returns ``(new_index, additions)``: callers with rewrite-capable sinks
    persist ``new_index``; append-only callers append ``additions`` and
    tombstone the touched ids. Survivor resolution stays a view over the
    index (min id per digest) rather than maintained state — a min cannot
    be decremented under deletion without the membership rows anyway.

    Scale shape: the index (corpus-sized) is only ever the probe side of a
    semi/anti join against the batch's touched-id set, which is broadcast —
    the index never shuffles; the batch pays one keep-last shuffle on id.
    """
    from cdc_audit_spark.compact import keep_last_per_key
    from cdc_audit_spark.schema import AUDIT_EVENT

    final = keep_last_per_key(audit_batch, [id_col])
    touched = final.select(F.col(id_col).alias("id")).distinct()
    additions = (
        final.filter(F.col(AUDIT_EVENT) != "delete")
        .select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col).alias("id"))
    )
    if index is None:
        return additions, additions
    kept = index.join(F.broadcast(touched), "id", "left_anti")
    # stable (digest, id) column order regardless of join-key reordering
    return kept.unionByName(additions).select("digest", "id"), additions


def _shingles(text_col: str, shingle_size: int):
    """Word n-gram shingles as an array column, built entirely from JVM
    expressions: split → sliding concat via transform over an index sequence.
    Used by the exact-Jaccard verify stage; the minhash path uses the cheaper
    _shingle_hashes. The token array is let-bound (exprs.bind) so the split
    runs once per row, not once per shingle; the tree is memoized per
    (text_col, shingle_size) — identical every call, so construction
    should cost a dict lookup, not py4j round-trips (exprs.memo_column)."""
    from cdc_audit_spark.operators.exprs import bind, memo_column

    def build():
        def shingles_of(tokens):
            n = F.greatest(F.size(tokens) - F.lit(shingle_size - 1), F.lit(1))
            idx = F.sequence(F.lit(0), n - F.lit(1))
            return F.array_distinct(F.transform(
                idx,
                lambda i: F.concat_ws(" ", F.slice(tokens, i + 1,
                                                   shingle_size))))

        return bind(F.split(F.col(text_col), r"\s+"), shingles_of)

    return memo_column(("shingles", text_col, shingle_size), build)


def _shingle_hashes(text_col: str, shingle_size: int):
    """64-bit hash per word n-gram: shingle strings → xxhash64 each.

    (Measured alternative: combining per-token hashes with element_at-based
    linear mixes avoids building shingle strings but ran 3× slower in
    Spark's interpreted higher-order-function path — string building +
    one hash wins.)"""
    from cdc_audit_spark.operators.exprs import memo_column

    return memo_column(
        ("shingle_hashes", text_col, shingle_size),
        lambda: F.transform(_shingles(text_col, shingle_size),
                            lambda s: F.xxhash64(s)))


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    shingle_size: int = 3,
) -> DataFrame:
    """(id, sig: array<long>) — element i is min over shingles of
    xxhash64(i, shingle). One narrow map stage, no shuffle, no Python."""
    # Shape chosen for codegen: higher-order functions (transform/aggregate)
    # are interpreted, and a k-wide array expression re-evaluates its input
    # k times — so instead: hash each shingle ONCE, explode, and take the k
    # minima as ordinary aggregates of k universal-hash mixes
    # (h_i = a_i*h + b_i, wrap-around). The whole pipeline is one explode +
    # one hash-aggregate, fully inside whole-stage codegen; the shuffle
    # carries (id, 8-byte hash) pairs, never document text.
    sh_hashes = df.select(
        F.col(id_col).alias("id"),
        F.explode(_shingle_hashes(text_col, shingle_size)).alias("h"),
    )
    mins = [
        F.min(F.col("h") * F.lit(_MIX_A[i % len(_MIX_A)]) + F.lit(_MIX_B[i % len(_MIX_B)]))
        .alias(f"__m{i}")
        for i in range(num_hashes)
    ]
    return (
        sh_hashes.groupBy("id")
        .agg(*mins)
        .select("id", F.array(*[F.col(f"__m{i}") for i in range(num_hashes)]).alias("sig"))
    )


def minhash_signatures_arrow(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    shingle_size: int = 3,
) -> DataFrame:
    """(id, sig) via mapInPandas + numpy — the fast path.

    The SQL-expression variant (minhash_signatures) pays ~0.5 ms/doc in
    Spark's *interpreted* higher-order functions just to build shingle
    strings (transform/slice/concat are not codegen'd). Here each Arrow
    batch hashes its shingles in C (blake2b-8) and computes all
    ``num_hashes`` universal mixes in one numpy broadcast + min-reduce —
    measured ~6× faster at sf0.1. Same operator contract; a different (but
    equally deterministic, seed-fixed) hash family, so signatures are not
    interchangeable between the two implementations.

    (Measured alternative, rejected: per-token crc32 + vectorized Horner
    fold per shingle cuts pure hashing ~4× in isolation, but the stage is
    Arrow-transfer/stage-overhead-bound at realistic batch sizes — whole-
    stage time was unchanged at sf0.1, so the battle-tested digest family
    stays.)

    Scale shape: one narrow map stage, no shuffle, no driver involvement;
    Arrow transfer carries (id, text) in and (id, 8·num_hashes bytes) out.
    """
    import numpy as np

    a = np.array([_MIX_A[i % len(_MIX_A)] for i in range(num_hashes)], dtype=np.uint64)
    b = np.array([_MIX_B[i % len(_MIX_B)] for i in range(num_hashes)], dtype=np.uint64)

    def gen(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            ids, sigs = [], []
            for i, t in zip(pdf["id"], pdf[text_col]):
                toks = t.split()
                n = max(len(toks) - shingle_size + 1, 1)
                hs = np.fromiter(
                    (
                        int.from_bytes(
                            hashlib.blake2b(
                                " ".join(toks[j:j + shingle_size]).encode("utf-8"),
                                digest_size=8,
                            ).digest(),
                            "little",
                        )
                        for j in range(n)
                    ),
                    dtype=np.uint64,
                    count=n,
                )
                hs = np.unique(hs)
                with np.errstate(over="ignore"):
                    sig = (hs[:, None] * a[None, :] + b[None, :]).min(axis=0)
                ids.append(i)
                sigs.append(sig.view(np.int64))
            yield pd.DataFrame({"id": ids, "sig": sigs})

    narrow = df.select(F.col(id_col).alias("id"), F.col(text_col).alias(text_col))
    # CPU-bound Python stage: when the source has fewer splits than cores
    # (small local files), spread it; at scale input splits already exceed
    # cores and this is a no-op.
    par = df.sparkSession.sparkContext.defaultParallelism
    if narrow.rdd.getNumPartitions() < par:
        narrow = narrow.repartition(par)
    return narrow.mapInPandas(gen, schema="id long, sig array<long>")


def lsh_band_entries(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    impl: str = "arrow",
) -> DataFrame:
    """(id, band, bucket): each document's banded-LSH bucket keys — the
    joinable near-dup index representation (num_hashes/bands minhashes per
    band, hashed to one 64-bit bucket key). Tiny rows (3 longs), so joins
    and persisted indexes are independent of document size."""
    if num_hashes % bands:
        raise ValueError("num_hashes must divide evenly into bands")
    rows_per_band = num_hashes // bands
    sig_fn = minhash_signatures_arrow if impl == "arrow" else minhash_signatures
    sigs = sig_fn(df, text_col, id_col, num_hashes, shingle_size)
    return sigs.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(*[
                        F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)
                    ]).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select("id", "bk.band", "bk.bucket")


def incremental_lsh_dedup(
    batch: DataFrame,
    index: DataFrame | None,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    impl: str = "arrow",
    entries: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Dedup a NEW batch against everything accepted before it, without
    recomputing all-pairs — the growing-corpus form of near-dup dedup.

    ``entries`` optionally supplies the batch's precomputed
    ``lsh_band_entries`` (callers that also need the bucket keys — e.g.
    to prune the persisted index read to the dirs those buckets can
    touch — compute them once, ideally persisted, and pass them in).

    ``index`` is the persisted (band, bucket, id) table of previously
    accepted documents (None for the first batch). A new document is
    rejected if any of its band buckets (a) already exists in the index, or
    (b) is shared with a smaller-id document in the same batch — so the
    smallest id in every occupied bucket survives, deterministically.
    Returns (accepted_ids, accepted_entries): append ``accepted_entries``
    to the persisted index (next batch's ``index`` = old ∪ accepted) — the
    delta IS the return value, so a streaming caller appends it without
    diffing a growing table. Contract matches the batch survivor pipeline for
    bucket-clique duplicate families (the common case); chain-shaped
    families can reject more than batch connected-components would —
    verify candidates with ngram_jaccard_pairs first when that matters.

    Cost per batch: one signature pass over the batch + one shuffle of the
    tiny entry rows + a broadcast-or-hash join against the index. The index
    grows with accepted docs only (bands rows each).
    """
    if entries is None:
        entries = lsh_band_entries(
            batch, text_col, id_col, num_hashes, bands, shingle_size, impl
        )
    ids = F.sort_array(F.collect_list("id"))
    # all ids in a bucket except the smallest — intra-batch rejects
    intra = (
        entries.groupBy("band", "bucket")
        .agg(ids.alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode(F.slice("ids", 2, F.size("ids") - 1)).alias("id"))
        .distinct()
    )
    if index is not None:
        hist = entries.join(
            index.select("band", "bucket").distinct(), ["band", "bucket"], "left_semi"
        ).select("id").distinct()
        rejected = intra.unionByName(hist).distinct()
    else:
        rejected = intra
    all_ids = entries.select("id").distinct()
    accepted = all_ids.join(rejected, "id", "left_anti")
    accepted_entries = entries.join(accepted, "id", "left_semi")
    return accepted, accepted_entries


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    impl: str = "arrow",
    max_bucket_size: int | None = 256,
) -> DataFrame:
    """Near-duplicate candidate pairs (id_a < id_b) via banded LSH.

    Rows agreeing on all ``num_hashes/bands`` minhashes of any band land in
    the same bucket. Join input is (band, band_hash, id) — tiny rows — so the
    self-join shuffle is independent of document size. distinct() collapses
    pairs found in multiple bands.

    ``max_bucket_size`` guards the in-bucket pair expansion: a degenerate
    bucket — empty documents, boilerplate sharing one signature — would
    otherwise expand O(|bucket|²) pairs inside a single task (at corpus
    scale, one such bucket is a job-killer). Buckets above the cap are
    dropped entirely, the standard practice for web-scale minhash dedup:
    members of a mega-bucket are near-identical boilerplate that exact
    dedup (dedup_exact, cheaper and earlier in the pipeline) already
    collapses, and their pairwise links add nothing but quadratic work.
    The number of dropped buckets/entries is observable: run any action on
    the result, then read ``result.lsh_cap_observation.get``. ``None``
    disables the cap (exhaustive mode for bounded corpora).
    """
    band_entries = lsh_band_entries(
        df, text_col, id_col, num_hashes, bands, shingle_size, impl
    )
    # Pairs come from grouping per bucket, NOT a self-join: a self-join of
    # this lazy plan would compute the signatures twice (no reuse across the
    # two scan branches). One groupBy = one shuffle of (band,bucket,id), then
    # in-bucket pair expansion.
    ids_sorted = F.sort_array(F.collect_list("id"))
    pairs_in_bucket = F.filter(
        F.flatten(
            F.transform(
                F.col("ids"),
                lambda x: F.transform(F.col("ids"), lambda y: F.struct(x.alias("id_a"), y.alias("id_b"))),
            )
        ),
        lambda p: p["id_a"] < p["id_b"],
    )
    grouped = (
        band_entries.groupBy("band", "bucket")
        .agg(ids_sorted.alias("ids"))
        .filter(F.size("ids") > 1)
    )
    observation = None
    if max_bucket_size is not None:
        from pyspark.sql import Observation

        too_big = F.size("ids") > max_bucket_size
        observation = Observation("lsh_bucket_cap")
        grouped = grouped.observe(
            observation,
            F.sum(too_big.cast("long")).alias("dropped_buckets"),
            F.sum(F.when(too_big, F.size("ids")).otherwise(0).cast("long")).alias("dropped_entries"),
        ).filter(~too_big)
    out = (
        grouped.select(F.explode(pairs_in_bucket).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    out.lsh_cap_observation = observation
    return out


def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash fingerprint per document — ZERO-shuffle Arrow map.

    Per token: two 32-bit words carved out of ``md5(token)`` (hex chars
    1-8 and 9-16) supply 64 sign votes; sign → bits → one long;
    near-dup detection is then hamming-distance banding on the
    fingerprint.

    Shape (optimization guide §4.2): every document's tokens live in its
    own row, so the whole fingerprint is per-row work — the previous
    explode → 64-sum codegen aggregate shuffled 64 ints per doc through
    one id-keyed Exchange and evaluated 64 vote expression trees per
    TOKEN (measured 1.4 s at sf0.1); this mapInPandas stage memoizes
    md5 per distinct token (vocabulary-bound, not corpus-bound) and
    folds the votes as one vectorized numpy popcount per doc (~0.35 s,
    no Exchange at all; at scale: map-side only vs one corpus shuffle).

    Exactness is unchanged and oracle-checked: hashlib.md5 and Spark's
    ``md5`` both digest UTF-8 bytes; tokenization matches Java's
    ``split("\\s+", -1)`` byte for byte (the explicit ASCII class below
    — Python's ``\\s`` also matches \\x1c-\\x1f/\\x85, Java's does not;
    leading/trailing empty tokens are kept exactly like Java limit -1);
    NULL text emits no row, like explode(NULL). Bit 63 lands via the
    uint64 → int64 two's-complement view, the identity the DuckDB
    oracle spells ``+ (-2^63)``.
    """
    import hashlib
    import re

    import numpy as np
    import pandas as pd

    # Java \s, exactly — not Python \s (see docstring)
    pat = re.compile("[ \t\n\x0b\f\r]+")
    shifts = np.arange(64, dtype=np.uint64)

    def gen(batches):
        word_of: dict[str, int] = {}  # token -> packed (w2 << 32) | w1

        def packed(tok: str) -> int:
            w = word_of.get(tok)
            if w is None:
                h = hashlib.md5(tok.encode("utf-8")).hexdigest()
                # packed bit j = w1 bit j (j < 32), w2 bit j-32 (j >= 32)
                # == vote bit j of the fingerprint
                w = int(h[:8], 16) | (int(h[8:16], 16) << 32)
                word_of[tok] = w
            return w

        for pdf in batches:
            ids, fps = [], []
            for rid, txt in zip(pdf["id"], pdf["__t"]):
                if txt is None:
                    continue  # explode(split(NULL)) emits nothing
                toks = pat.split(txt)
                n = len(toks)
                arr = np.fromiter(
                    (packed(t) for t in toks), dtype=np.uint64, count=n)
                ones = ((arr[:, None] >> shifts) & np.uint64(1)).sum(axis=0)
                # vote sum s_j = 2*ones_j - n; bit set iff s_j > 0
                fp = int(((2 * ones > n).astype(np.uint64) << shifts).sum())
                if fp >= 1 << 63:
                    fp -= 1 << 64
                ids.append(rid)
                fps.append(fp)
            yield pd.DataFrame({
                "id": pd.Series(ids, dtype="int64"),
                "simhash64": pd.Series(fps, dtype="int64"),
            })

    narrow = df.select(F.col(id_col).alias("id"),
                       F.col(text_col).alias("__t"))
    # CPU-bound Python stage: when the source has fewer splits than
    # cores (small local files), spread it; at scale input splits
    # already exceed cores and this is a no-op.
    par = df.sparkSession.sparkContext.defaultParallelism
    if not df.isStreaming and narrow.rdd.getNumPartitions() < par:
        narrow = narrow.repartition(par)
    return narrow.mapInPandas(gen, schema="id long, simhash64 long")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    candidates: DataFrame,
    shingle_size: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs (id_a, id_b).

    The exact-verify stage after LSH: joins shingle sets back onto the
    (small) candidate set — broadcast when it fits — and computes
    |∩| / |∪| with array intersections, JVM-side.
    """
    sh = df.select(
        F.col(id_col).alias("id"), _shingles(text_col, shingle_size).alias("sh")
    )
    out = (
        candidates
        .join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .select("id_a", "id_b", "jaccard")
    )
    return out.filter(F.col("jaccard") >= threshold) if threshold > 0 else out


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    driver_gate: int = 100_000,
    head: list | None = None,
) -> DataFrame:
    """Cluster assignment over a candidate-pair edge list: (id, component)
    where component = the minimum id reachable from the node.

    Min-label propagation WITH POINTER HALVING: every node starts labeled
    with itself; each round pushes the smaller label across every edge
    (both directions) and then shortcuts each node to its label's label —
    the path-halving step that makes rounds O(log diameter) instead of
    O(diameter) (the Kiveris large-star effect without re-materializing
    the edge set). A duplicate family is shallow (one LSH bucket wide),
    but star-edge seeds chain THROUGH group minima and a corpus-scale
    near-dup chain can be long — 25 halved rounds cover diameter 2^25,
    and exhaustion raises instead of silently returning unconverged
    labels.

    Scale mechanics: each round is two aggregates on (node) — shuffle keys
    are node ids, partial aggs combine map-side. ``localCheckpoint`` after
    each round truncates the lineage so the plan doesn't deepen linearly
    with iterations (the classic iterative-DataFrame trap: analysis time
    grows superlinearly and executor stacks blow past ~50 joined rounds).

    SIZE GATE (the ``assign_audit_pk`` pattern — both sides pinned in
    tests): an edge set at or under ``driver_gate`` rows is a
    broadcast-scale subproblem — the iterative plan would spend a
    fixed-cost join+aggregate+action round-trip PER DIAMETER STEP on a
    graph that fits in a few MB, which dominates wall-clock for every
    incremental epoch (delta subgraphs are batch-sized by construction)
    and for fixture-scale one-shots. Under the gate the closure runs as
    a driver union-find over the collected edges — identical min-label
    semantics, zero iterative rounds (measured 3.9s → ~0.3s on the
    sf0.1 winnow graph). Over the gate (the 100 TB corpus-wide rebuild),
    the distributed propagation runs unchanged; ``driver_gate=0``
    forces it.

    ``head`` lets a caller that already ran the gate probe (a take of
    ``driver_gate + 1`` rows of (src, dst) on this same edge relation —
    see ``incremental_components``) hand the fetched rows in, so the
    probe is not re-run here.
    """
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # gate-check and edge fetch in ONE action on the LAZY plan: a take
    # of gate+1 rows either IS the whole edge set (run the driver
    # closure on it — the old checkpoint + count + collect spent three
    # jobs learning the same thing) or proves the graph is over-gate.
    # The take runs on the UNDIRECTED edges: union-find is direction-
    # and duplicate-agnostic, so the reversed union + distinct the
    # propagation rounds need — one full extra Exchange over 2x the
    # rows — is built only on the over-gate path (the gate therefore
    # counts raw edges, not bidirectional-distinct rows: same
    # magnitude, half the previous effective threshold's row count).
    # Only the over-gate path materializes the checkpoint — there the
    # edge lineage would otherwise recompute per propagation round
    # (measured 40x on the sf0.1 winnow graph).
    if head is None:
        head = und.take(driver_gate + 1)
    if len(head) <= driver_gate:
        return _driver_components(und, head)
    both = (
        und.unionByName(und.select(F.col("b").alias("a"),
                                   F.col("a").alias("b")))
        .distinct()
    )
    both = both.localCheckpoint(eager=True)
    labels = (
        both.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # smallest label any neighbor currently holds, per node
        neighbor_min = (
            both.join(labels.withColumnsRenamed({"id": "b", "component": "nbr_comp"}), "b")
            .groupBy("a")
            .agg(F.min("nbr_comp").alias("nbr_comp"))
            .withColumnRenamed("a", "id")
        )
        updated = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce("nbr_comp", "component")).alias("component"),
                (F.coalesce("nbr_comp", "component") < F.col("component")).alias("changed"),
            )
        ).localCheckpoint(eager=True)
        n_changed = updated.filter("changed").count()
        stepped = updated.drop("changed")
        if n_changed == 0:
            labels = stepped
            break
        # pointer halving: jump to the label's own label (every label IS
        # a node id, so the self-join always matches). At the fixpoint
        # this is the identity; before it, path lengths halve per round.
        ll = stepped.select(F.col("id").alias("component"),
                            F.col("component").alias("__cc"))
        labels = (
            stepped.join(ll, "component", "left")
            .select("id", F.coalesce("__cc", "component").alias("component"))
        ).localCheckpoint(eager=True)
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} halved "
            f"rounds (diameter past 2^{max_iter}) — the graph is "
            "pathological; raise max_iter explicitly")
    return labels


def _driver_components(both: DataFrame, rows: list | None = None) -> DataFrame:
    """Union-find closure of a gate-bounded (a, b) edge relation on the
    driver: path-halving find + union-by-min, so every root is the
    component's minimum id — exactly the fixed point the distributed
    min-label propagation converges to (same semantics for any orderable
    id type: Python and Spark ``min`` agree on longs and strings).
    Returns (id, component) with the input's id type. ``rows`` lets the
    caller pass the already-fetched edge rows (the gate check collects
    them anyway)."""
    if rows is None:
        rows = both.collect()
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        ra, rb = find(r["a"]), find(r["b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out_schema = T.StructType([
        T.StructField("id", both.schema["a"].dataType, False),
        T.StructField("component", both.schema["a"].dataType, False),
    ])
    return both.sparkSession.createDataFrame(
        [(x, find(x)) for x in parent], out_schema)


def dedup_cluster_survivors(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_size: int = 3,
    jaccard_threshold: float = 0.6,
) -> DataFrame:
    """End-to-end near-dup pipeline: LSH candidates → exact-Jaccard verify →
    connected components → (id, cluster, is_survivor). Survivor = min id per
    cluster; singleton documents survive trivially."""
    pairs = minhash_lsh_pairs(df, text_col, id_col, num_hashes, bands, shingle_size)
    verified = ngram_jaccard_pairs(
        df, text_col, id_col, pairs, shingle_size, threshold=jaccard_threshold
    ).select("id_a", "id_b")
    comp = connected_components(verified)
    return (
        df.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .select(
            "id",
            F.coalesce("component", "id").alias("cluster"),
            (F.coalesce("component", "id") == F.col("id")).alias("is_survivor"),
        )
    )


def semdedup(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.60,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv 2303.09540): semantic
    deduplication over an embedding column — cluster, then prune rows
    whose cosine similarity to a SMALLER-id row in the same cluster
    exceeds ``threshold``. Returns (id, cell, kept): every input row
    tagged, survivors ``kept=true`` (min-id representative per semantic
    duplicate set — the same deterministic-survivor contract as
    :func:`exact_dedup`).

    Spark shape: cluster assignment is the ``ivf_assign``
    broadcast-literal codegen expression (no shuffle); the within-cluster
    pair check is ONE equi-join on the cell id (pairwise work never
    crosses cluster boundaries — the whole point of the paper's design).
    At 100 TB the cluster count k must scale with the corpus (the paper
    uses 110k clusters for LAION-440M) so per-cell candidate sets stay
    bounded and the cell-key shuffle stays skew-free; with k fixed and
    rows growing, the per-cell quadratic join is the bottleneck — grow k,
    not the cluster size. The pair cosine runs in the same JVM
    zip_with/aggregate fold as :func:`~cdc_audit_spark.operators.\
similarity.cosine_pairs` (sequential accumulation, bit-identical to
    DuckDB's list_dot_product).
    """
    from cdc_audit_spark.operators.similarity import _self_dot, ivf_assign

    assign = ivf_assign(df, centroids, id_col=id_col, vec_col=vec_col)
    side = assign.select(
        F.col(id_col).alias("id"),
        F.col("cell").cast("long").alias("cell"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.sqrt(_self_dot(F.col(vec_col))).alias("nrm"),
    )
    a, b = side.alias("a"), side.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    sim = (dot / (F.col("a.nrm") * F.col("b.nrm"))).cast("double")
    pruned = (
        a.join(b, (F.col("a.cell") == F.col("b.cell"))
               & (F.col("b.id") < F.col("a.id")))
        .filter(sim > F.lit(threshold))
        .select(F.col("a.id").alias("id"))
        .distinct()
        .withColumn("__pruned", F.lit(True))
    )
    return (
        side.select("id", "cell")
        .join(pruned, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "cell",
            F.coalesce(~F.col("__pruned"), F.lit(True)).alias("kept"),
        )
    )


def duplicate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_tokens: int = 20,
    min_count: int = 2,
) -> DataFrame:
    """Exact substring-span dedup detection (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv 2107.06499): every maximal token span whose every
    ``min_tokens``-gram occurs at least ``min_count`` times ANYWHERE in
    the corpus (other docs or elsewhere in the same doc). Returns
    (id, span_start, span_end, n_grams) with token-index half-open
    spans — the input to span excision (:func:`excise_spans`).

    Spark shape, replacing the paper's single-node suffix array with
    two bounded shuffles: (1) sliding grams via Catalyst
    sequence/slice/concat_ws (no Python), md5-digested so the shuffle
    carries 32-byte keys, never text; grams repeated >= min_count are
    found with one digest groupBy and joined back (hash join — the dup
    set scales with the corpus, so it is NOT broadcast); (2) positions
    merge into maximal spans with the gaps-and-islands window per doc
    (shuffle on doc id; per-doc work bounded by doc length). A 24-bit
    digest would false-positive at corpus scale; full md5 keeps the
    collision odds ~2^-64 per pair.
    """
    L = int(min_tokens)
    grams = doc_grams(df, text_col, id_col, L)
    dup = (
        grams.groupBy("g").agg(F.count("*").alias("__c"))
        .filter(F.col("__c") >= min_count)
        .select("g")
    )
    hits = grams.join(dup, "g").select("id", "pos")
    return spans_from_hits(hits, L, id_col)


def doc_grams(df: DataFrame, text_col: str, id_col: str, L: int) -> DataFrame:
    """(id, pos, g): every sliding ``L``-token gram of every document,
    md5-digested so downstream shuffles/joins/state carry 32-byte keys,
    never text — the shared kernel of :func:`duplicate_spans` and the
    CDC-maintained gram index (``streaming.stream_dedup``)."""
    toks = F.split(F.col(text_col), r"\s+")
    base = df.select(
        F.col(id_col).alias("id"), toks.alias("t")
    ).filter(F.size("t") >= L)
    return base.select(
        "id",
        F.explode(F.sequence(F.lit(0), F.size("t") - L)).alias("pos"),
        "t",
    ).select(
        "id", "pos",
        F.md5(F.concat_ws("\x1f", F.slice("t", F.col("pos") + 1, L)))
        .alias("g"),
    )


def spans_from_hits(hits: DataFrame, L: int, id_col: str) -> DataFrame:
    """Merge duplicated-gram positions into maximal half-open token
    spans — the gaps-and-islands window of :func:`duplicate_spans`,
    shared with the CDC-maintained form. ``hits`` is (id, pos); output
    (id_col, span_start, span_end, n_grams), per-doc work bounded by
    doc length."""
    w = (
        Window.partitionBy("id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_end = F.max(F.col("pos") + L).over(w)
    brk = F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0)
    isl = F.sum(brk).over(Window.partitionBy("id").orderBy("pos"))
    return (
        hits.withColumn("__isl", isl)
        .groupBy(F.col("id").alias(id_col), "__isl")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + L).cast("long").alias("span_end"),
            F.count("*").alias("n_grams"),
        )
        .drop("__isl")
    )


def excise_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Cut :func:`duplicate_spans` spans out of each document: tokens
    whose index falls inside any of the doc's spans are dropped, the
    rest are rejoined with single spaces. Docs with no spans pass
    through verbatim (token-normalized). Returns (id, clean_text,
    n_dropped_tokens).

    One aggregation collapses each doc's spans to an array (small — spans
    per doc are bounded by len/min_tokens), one left join brings it to
    the doc, and the cut is a map-side Catalyst filter over token
    indices; the text itself never shuffles with the spans.
    """
    per_doc = spans.groupBy(F.col(id_col).alias("id")).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    toks = F.split(F.col(text_col), r"\s+")
    joined = df.select(F.col(id_col).alias("id"), toks.alias("t")).join(
        per_doc, "id", "left"
    )
    spans_arr = F.coalesce(
        "__spans",
        F.array().cast("array<struct<span_start:long,span_end:long>>"),
    )
    keep = F.filter(
        F.zip_with(
            F.col("t"),
            F.sequence(F.lit(0), F.size("t") - 1),
            lambda tok, i: F.struct(tok.alias("tok"), i.alias("i")),
        ),
        lambda s: ~F.exists(
            spans_arr,
            lambda sp: (s["i"] >= sp["span_start"])
            & (s["i"] < sp["span_end"]),
        ),
    )
    return joined.select(
        F.col("id").alias(id_col),
        F.array_join(F.transform(keep, lambda s: s["tok"]), " ")
        .alias("clean_text"),
        (F.size("t") - F.size(keep)).cast("long").alias("n_dropped_tokens"),
    )


def fingerprint_star_edges(
    fps: DataFrame,
    id_col: str = "id",
    fp_col: str = "fp",
    max_fp_df: int | None = None,
) -> DataFrame:
    """Connectivity edges over a (fp, id) fingerprint relation WITHOUT
    the within-group all-pairs blow-up: per fingerprint, every member is
    connected to the group's minimum id — the small-star seed of Kiveris
    et al. ("Connected Components in MapReduce and Beyond"). O(g) edges
    for a g-document fingerprint where the pair self-join emits
    g(g-1)/2 rows ON ONE JOIN KEY (a boilerplate fingerprint — license
    header, navigation chrome — shared by 1e5 docs of a web corpus is
    5e9 rows in one task). The transitive closure is IDENTICAL: within a
    group every member reaches every other through the minimum, and
    cross-group connectivity runs through shared documents exactly as
    with all-pairs edges.

    ``max_fp_df`` drops fingerprints whose document frequency in ``fps``
    exceeds the cap BEFORE edge generation (the MinHashLSH hot-band
    discard): ultra-frequent grams connect everything to everything and
    carry no duplicate evidence. Capping changes semantics (capped
    groups witness no edges), so the default is off and the
    oracle-checked forms stay uncapped.

    Input contract: one row per (fp, id) — ``winnow_fingerprints``
    explodes ``array_distinct`` output, so ``count(*)`` IS the document
    frequency. Plan shape: one hash-aggregate on fp (map-side partials)
    + one shuffle join back on fp; no self-join, no window.

    Output: (id_a, id_b) with id_a = the group minimum < id_b.
    """
    g = fps.select(F.col(fp_col).alias("fp"), F.col(id_col).alias("id"))
    stats = g.groupBy("fp").agg(
        F.min("id").alias("__min"), F.count("*").alias("__df"))
    if max_fp_df is not None:
        stats = stats.filter(F.col("__df") <= int(max_fp_df))
    return (g.join(stats.select("fp", "__min"), "fp")
            .filter(F.col("id") != F.col("__min"))
            .select(F.col("__min").alias("id_a"), F.col("id").alias("id_b"))
            .distinct())


def drop_hot_fingerprints(fps: DataFrame, max_fp_df: int,
                          fp_col: str = "fp") -> DataFrame:
    """Remove every row of fingerprints whose document frequency in
    ``fps`` exceeds ``max_fp_df`` — the shared hot-key discard of
    :func:`fingerprint_star_edges` for callers that need the SURVIVING
    (fp, id) rows (pair counting, index matching) rather than star
    edges. One aggregate + one left-anti join, both keyed on fp."""
    hot = (fps.groupBy(fp_col).agg(F.count("*").alias("__df"))
           .filter(F.col("__df") > int(max_fp_df))
           .select(fp_col))
    return fps.join(hot, fp_col, "left_anti")


def resolve_union_closure(
    labels: DataFrame,
    unions: DataFrame | None,
    label_col: str = "label",
    max_iter: int = 32,
    driver_gate: int = 100_000,
) -> DataFrame:
    """Resolve labels through a (child, parent) union ledger to their
    current roots: (label, root). The ledger is the union-find overlay the
    incremental components maintain — each record re-parents one FORMER
    canonical label onto the canonical that absorbed it, with parents
    fully resolved at write time, so chains only deepen when an absorbing
    canonical is itself absorbed later.

    A ledger at or under ``driver_gate`` rows (its DESIGN size — the
    overlay is merge-count-sized and broadcast by contract, and
    ``maybe_resolve_components`` flattens it long before this bound) is
    flattened on the driver and applied as ONE broadcast join — the
    labels side stays fully distributed and pays a single join instead
    of a fixpoint loop of join+action rounds. Past the gate, the
    iterative broadcast-join loop with localCheckpoint lineage
    truncation runs as before (``driver_gate=0`` forces it)."""
    out = labels.select(F.col(label_col).alias("label")).distinct() \
        .withColumn("root", F.col("label"))
    if unions is None:
        return out
    u_rows = unions.select("child", "parent").limit(driver_gate + 1).collect()
    if len(u_rows) <= driver_gate:
        if not u_rows:
            return out
        parent = {r["child"]: r["parent"] for r in u_rows}
        flat: dict = {}
        for start in parent:
            # Per-chain cycle guard: parents are resolved at write time so
            # a healthy ledger is acyclic, but a corrupted/hand-edited one
            # must fail loudly (like the iterative path's max_iter stop),
            # not hang the driver.
            chain = []
            on_chain = set()
            x = start
            while x in parent and x not in flat:
                if x in on_chain:
                    raise RuntimeError(
                        f"union ledger contains a cycle through {x!r} — "
                        "the ledger is corrupt; rebuild the components "
                        "state instead of resolving it")
                chain.append(x)
                on_chain.add(x)
                x = parent[x]
            root = flat.get(x, x)
            for node in chain:
                flat[node] = root
        f_schema = T.StructType([
            T.StructField("label", unions.schema["child"].dataType, False),
            T.StructField("__r", unions.schema["parent"].dataType, False),
        ])
        flat_df = unions.sparkSession.createDataFrame(
            list(flat.items()), f_schema)
        return (out.join(F.broadcast(flat_df), "label", "left")
                .select("label", F.coalesce("__r", "root").alias("root")))
    u = unions.select(F.col("child").alias("__c"), F.col("parent").alias("__p"))
    out = out.localCheckpoint(eager=True)
    for _ in range(max_iter):
        stepped = (
            out.join(F.broadcast(u), out["root"] == u["__c"], "left")
            .select("label",
                    F.coalesce("__p", "root").alias("root"),
                    F.col("__p").isNotNull().alias("moved"))
        ).localCheckpoint(eager=True)
        n_moved = stepped.filter("moved").count()
        out = stepped.drop("moved")
        if n_moved == 0:
            break
    else:
        raise RuntimeError(
            f"union ledger did not resolve in {max_iter} steps — run the "
            "resolve/compaction maintenance to flatten it")
    return out


def incremental_components(
    batch_df: DataFrame,
    text_col: str,
    id_col: str,
    idx: DataFrame | None = None,
    unions: DataFrame | None = None,
    k: int = 5,
    w: int = 4,
    fps: DataFrame | None = None,
    max_fp_df: int | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One insert batch of INCREMENTAL connected components over
    winnowing-fingerprint edges. State in, deltas out (the CDC index
    algebra shape, cf. ``cdc_exact_index_sync``):

    * ``idx``    — (fp, id, label): fingerprint index of previously
      inserted docs, labels as of their insert epoch (possibly stale);
    * ``unions`` — (child, parent): the union-find overlay recording
      every canonical label a later batch absorbed.

    Returns ``(members_delta, idx_delta, unions_delta)``:
    membership rows (id, label) for every batch doc, index rows for every
    batch fingerprint, and re-parenting records for every existing
    canonical the batch merged. Current labels for ANY doc = membership
    label resolved through the unions closure; min-union keeps the
    canonical equal to the component's minimum member id, so the resolved
    labeling is IDENTICAL to a one-shot ``connected_components`` run over
    the full corpus (the oracle-checked equivalence).

    Scale shape: the batch's fingerprints bound everything — the index
    contributes only fp-matched rows (manifest callers prune that read to
    the batch's fp dirs), the label-propagation kernel runs on the DELTA
    subgraph (batch ids + matched roots, never the corpus), and the
    ledger join is broadcast-sized. Deletes are out of scope by design:
    removing a member never splits the equivalence classes it witnessed
    (labels are names, not members); decremental connectivity needs a
    rebuild, the ANN recall→rebuild policy's analog.

    ``fps`` lets a caller hand in the batch's (id, fp) rows precomputed —
    the manifest epoch computes them ONCE, uses them to prune the index
    read to the batch's fp dirs, then passes them here (the
    ``lsh_band_entries`` pattern in ``apply_dedup_epoch``).

    ``max_fp_df`` (default off) discards fingerprints whose document
    frequency WITHIN THIS BATCH exceeds the cap before edge generation,
    index matching, and index writing — capped fingerprints witness no
    merges now or later (see :func:`fingerprint_star_edges`). The cap is
    batch-local by construction: a fingerprint under the cap in every
    batch can still accumulate corpus-wide, which
    ``maybe_rebuild_components``'s corpus-level cap handles on its
    amortized cadence.
    """
    from cdc_audit_spark.operators.text import winnow_fingerprints

    fps_b = fps if fps is not None else winnow_fingerprints(
        batch_df, text_col, id_col, k, w)
    if max_fp_df is not None:
        fps_b = drop_hot_fingerprints(fps_b, max_fp_df)
    # star edges, not the within-fp all-pairs self-join: identical
    # closure, O(g) rows per fingerprint group instead of O(g^2)
    edges_int = fingerprint_star_edges(fps_b)
    edges = edges_int
    if idx is not None:
        matched = (
            idx.withColumnsRenamed({"id": "__old_id", "label": "label"})
            .join(fps_b.withColumnRenamed("id", "__bid"), "fp")
            .select("__bid", "label")
            .distinct()
        )
        roots = resolve_union_closure(
            matched.select("label").distinct(), unions)
        edges_ext = (
            matched.join(roots, "label")
            .select(F.col("__bid").alias("id_a"), F.col("root").alias("id_b"))
            .distinct()
        )
        edges = edges_int.unionByName(edges_ext)
    # ONE gate probe serves both the closure kernel and the delta
    # derivations below: when the delta subgraph fits the driver gate
    # (every incremental epoch by construction — delta edges are
    # batch-sized), the probe's rows ARE the complete edge set, so the
    # unions delta joins a driver-resident LocalRelation instead of
    # re-deriving the whole fingerprint/index lineage inside each delta
    # evaluation (the per-epoch state commit was re-running it). The
    # over-gate rebuild path passes the original lazy edges through
    # unchanged, probe included (connected_components skips its own).
    _gate = 100_000
    head = edges.select(F.col("id_a").alias("a"),
                        F.col("id_b").alias("b")).take(_gate + 1)
    if len(head) <= _gate:
        edges = batch_df.sparkSession.createDataFrame(
            [(r["a"], r["b"]) for r in head], edges.schema)
    comp = connected_components(edges, driver_gate=_gate, head=head)
    batch_ids = batch_df.select(F.col(id_col).alias("id")).distinct()
    members_delta = (
        batch_ids.join(comp, "id", "left")
        .select("id", F.coalesce("component", "id").alias("label"))
    )
    idx_delta = fps_b.join(members_delta, "id").select("fp", "id", "label")
    if idx is not None:
        unions_delta = (
            edges.select(F.col("id_b").alias("id"))
            .join(batch_ids, "id", "left_anti")  # existing roots only
            .distinct()
            .join(comp, "id")
            .filter(F.col("component") < F.col("id"))
            .select(F.col("id").alias("child"),
                    F.col("component").alias("parent"))
        )
    else:
        unions_delta = members_delta.sparkSession.createDataFrame(
            [], "child long, parent long")
    return members_delta, idx_delta, unions_delta


def resolve_component_labels(
    members: DataFrame,
    unions: DataFrame | None,
) -> DataFrame:
    """Current (id, component) view of incrementally-maintained
    components: membership labels resolved through the unions closure.
    One broadcast join against the resolved ledger — the membership
    itself never re-shuffles."""
    resolved = resolve_union_closure(
        members.select("label").distinct(), unions)
    return members.join(F.broadcast(resolved), "label") \
        .select("id", F.col("root").alias("component"))
