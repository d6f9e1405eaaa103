"""Incremental aggregate maintenance from CDC deltas (materialized-view
maintenance) — the canonical *consumer* of the audit log this engine
produces.

The reference stops at delivering audit rows to a CSV sink
(cdc_audit_sync_mysql.php:243-258); what a warehouse does next is keep
aggregates current WITHOUT rescanning the base table. At 100 TB that
difference is the whole game: recomputing `SUM(x) GROUP BY g` is a full
scan per refresh, while maintenance touches only the changed keys.

Maintenance algebra for SUM/COUNT under the reference's audit format
(insert/update rows carry the NEW image, delete rows carry the OLD image —
gen:489-491):

    new_view(g) = old_view(g)
                - Σ v0[pk].val  for every audited pk     (old contribution)
                + Σ final[pk].val for pks whose final event ≠ delete

using each row's OWN group on each side, so rows that migrate between
groups debit the old group and credit the new one. COUNT is maintained the
same way and is what distinguishes a group whose sum fell to zero from a
group with no rows (the latter must disappear, as a direct aggregate would
have it).

Scale shape: the change batch is collapsed to one final row per touched pk
(keep_last_per_key — one shuffle of the BATCH, not the table), the old
contributions come from a semi-join of the base against the touched-pk set
(broadcast when the batch is small — the usual case; bucketed-on-pk base
tables make it shuffle-free, operators/bucketing.py), and the delta
aggregate shuffles only touched rows. Nothing scans the full base except
the one-time bootstrap of the view itself.

SUM/COUNT/AVG(=sum/cnt) are self-maintainable; MIN/MAX are not under
deletes (a retracted maximum needs a rescan of its group) — callers get a
loud error rather than a silent wrong answer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_audit_spark.compact import keep_last_per_key
from cdc_audit_spark.schema import AUDIT_EVENT

__all__ = [
    "bootstrap_group_sum",
    "maintain_group_sum",
    "group_sum_delta",
    "fold_group_sum_deltas",
    "incremental_group_sum",
    "bootstrap_join_group_sum",
    "join_group_sum_delta",
    "maintain_join_group_sum",
    "incremental_join_group_sum",
    "group_stats_delta",
    "incremental_group_stats",
    "incremental_distinct_count",
    "incremental_group_median",
    "incremental_group_topk",
]


def _sum_cnt(value: Column):
    return [
        F.sum(value).alias("total"),
        F.count("*").alias("n_rows"),
    ]


def bootstrap_group_sum(
    base: DataFrame, group_cols: list[str], value: Column
) -> DataFrame:
    """The one full-scan bootstrap of the view: (group, total, n_rows)."""
    return base.groupBy(*group_cols).agg(*_sum_cnt(value))


def maintain_group_sum(
    view: DataFrame,
    base: DataFrame,
    audit_batch: DataFrame,
    pk_cols: list[str],
    group_cols: list[str],
    value: Column,
) -> DataFrame:
    """Apply one audit batch to a (group, total, n_rows) view.

    `base` is the snapshot the view was computed from (pre-batch); only its
    touched keys are read. Returns the refreshed view with groups whose
    n_rows reached 0 dropped — identical to a direct aggregate over the
    post-batch snapshot.
    """
    return (
        view.select(*group_cols, "total", "n_rows")
        .unionByName(_debit_credit(base, audit_batch, pk_cols,
                                   group_cols, value))
        .groupBy(*group_cols)
        .agg(F.sum("total").alias("total"), F.sum("n_rows").alias("n_rows"))
        .filter(F.col("n_rows") > 0)
    )


def _debit_credit(
    base: DataFrame,
    audit_batch: DataFrame,
    pk_cols: list[str],
    group_cols: list[str],
    value: Column,
) -> DataFrame:
    """The un-folded debit ∪ credit contribution of one audit batch —
    shared by :func:`maintain_group_sum` (which folds it together with
    the view in ONE aggregation) and :func:`group_sum_delta` (which
    folds it alone into the LSM write unit)."""
    final = keep_last_per_key(audit_batch, pk_cols)
    touched = final.select(*pk_cols)
    debit = (
        base.join(F.broadcast(touched), pk_cols, "left_semi")
        .groupBy(*group_cols)
        .agg(
            (-F.sum(value)).alias("total"),
            (-F.count("*")).alias("n_rows"),
        )
    )
    credit = (
        final.filter(F.col(AUDIT_EVENT) != "delete")
        .groupBy(*group_cols)
        .agg(*_sum_cnt(value))
    )
    return debit.unionByName(credit)


def group_sum_delta(
    base: DataFrame,
    audit_batch: DataFrame,
    pk_cols: list[str],
    group_cols: list[str],
    value: Column,
) -> DataFrame:
    """The SIGNED (group, total, n_rows) delta one audit batch applies to
    the view — debits of the touched rows' old contributions in their OLD
    groups (negative) plus credits of the surviving final images in their
    NEW groups (positive), folded per group with exact cancellations
    dropped.

    The LSM write unit for O(delta) storage maintenance
    (``streaming.stream_mview.apply_mview_manifest_epoch``): a micro-batch
    commits ONLY this delta; readers fold the appended deltas with
    :func:`fold_group_sum_deltas`. ``view + delta`` folded equals
    :func:`maintain_group_sum` by construction."""
    return (
        _debit_credit(base, audit_batch, pk_cols, group_cols, value)
        .groupBy(*group_cols)
        .agg(F.sum("total").alias("total"), F.sum("n_rows").alias("n_rows"))
        # exact cancellations are no-ops in the fold: drop (0, 0) and
        # (0, NULL) rows (sum() ignores both), keep any row that moves
        # either the count or the total
        .filter((F.col("n_rows") != 0) | (F.col("total") != 0))
    )


def fold_group_sum_deltas(df: DataFrame, group_cols: list[str]) -> DataFrame:
    """Collapse appended signed view deltas (plus an optional absolute
    snapshot at the bottom) into the current (group, total, n_rows) view:
    sum per group, groups whose row count reached 0 disappear — exactly
    the view ``maintain_group_sum`` would have produced step by step."""
    return (
        df.select(*group_cols, "total", "n_rows")
        .groupBy(*group_cols)
        .agg(F.sum("total").alias("total"), F.sum("n_rows").alias("n_rows"))
        .filter(F.col("n_rows") > 0)
    )


def incremental_group_sum(
    base: DataFrame,
    audit_batch: DataFrame,
    pk_cols: list[str],
    group_cols: list[str],
    value: Column,
) -> DataFrame:
    """Bootstrap + one maintenance step — the self-contained form used by
    the oracle-checked query (equality with a direct aggregate over the
    post-batch snapshot proves the maintenance algebra).

    FUSED (optimization guide §2.4): bootstrap, debit and credit enter
    ONE group aggregate as raw signed rows instead of three separately
    aggregated branches folded by a fourth — partial aggregation
    collapses the same rows map-side either way, so the per-branch
    aggregates bought nothing and cost three extra Exchanges (plan: 5
    hash exchanges → 2). The per-group multiset of decimal addends is
    unchanged, so the result is exact-identical. The streamed LSM forms
    (:func:`group_sum_delta` / :func:`maintain_group_sum`) keep their
    pre-aggregated shape — there the aggregate IS the write unit."""
    final = keep_last_per_key(audit_batch, pk_cols)
    touched = final.select(*pk_cols)
    v, n = value.alias("__v"), F.lit(1).alias("__n")
    rows = (
        base.select(*group_cols, v, n)
        .unionByName(
            base.join(F.broadcast(touched), pk_cols, "left_semi")
            .select(*group_cols, (-value).alias("__v"),
                    F.lit(-1).alias("__n")))
        .unionByName(
            final.filter(F.col(AUDIT_EVENT) != "delete")
            .select(*group_cols, v, n))
    )
    return (
        rows.groupBy(*group_cols)
        .agg(F.sum("__v").alias("total"),
             F.sum("__n").cast("long").alias("n_rows"))
        .filter(F.col("n_rows") > 0)
    )


# --------------------------------------------------------------------------
# Two-table JOIN-view maintenance (signed-multiplicity IVM)
# --------------------------------------------------------------------------
# The classic delta-join rule for V = γ_{g, SUM(v), COUNT}(A ⋈ B): with
# each side's change expressed as a SIGNED row multiset (old image -1,
# surviving final image +1),
#
#     ΔV = ΔA ⋈ B_pre  +  A_pre ⋈ ΔB  +  ΔA ⋈ ΔB
#
# (A_new ⋈ B_new − A_pre ⋈ B_pre telescopes exactly into those three
# terms; multiplicities multiply through the join). Every term joins a
# BATCH-sized side against at most one snapshot, so per-batch compute is
# O(batch ⋈ matched rows), never O(|A| × |B|) — the standard incremental
# view maintenance result (Blakeley et al. 1986; DBToaster's first-order
# delta), re-expressed as Spark broadcast joins.


def _signed_delta(base: DataFrame, batch: DataFrame | None,
                  pk_cols: list[str], mult_col: str) -> DataFrame:
    """The signed row multiset a batch applies to a snapshot: touched
    keys' OLD images with multiplicity -1, surviving FINAL images with
    +1 (an update contributes both; a delete only the debit). ``None``
    batch -> empty delta. Audit columns are dropped — the multiset is
    state-shaped plus the multiplicity column."""
    state_cols = base.columns
    if batch is None:
        return base.filter(F.lit(False)).withColumn(mult_col, F.lit(1))
    final = keep_last_per_key(batch, pk_cols)
    touched = final.select(*pk_cols)
    olds = (base.join(F.broadcast(touched), pk_cols, "left_semi")
            .withColumn(mult_col, F.lit(-1)))
    news = (final.filter(F.col(AUDIT_EVENT) != "delete")
            .select(*state_cols)
            .withColumn(mult_col, F.lit(1)))
    return olds.unionByName(news)


def join_group_sum_delta(
    left: DataFrame,
    right: DataFrame,
    left_batch: DataFrame | None,
    right_batch: DataFrame | None,
    join_keys: list[str],
    left_pk: list[str],
    right_pk: list[str],
    group_cols: list[str],
    value: Column,
) -> DataFrame:
    """The signed (group, total, n_rows) delta a pair of audit batches
    (either may be None) applies to the JOIN view
    γ_{group, SUM(value), COUNT}(left ⋈ right on join_keys).

    Scale shape: ΔA ⋈ B_pre and ΔA ⋈ ΔB broadcast the batch-derived
    side; A_pre ⋈ ΔB is first narrowed by a broadcast semi-join on ΔB's
    join keys — the snapshot contributes only rows that can match the
    delta, so a key-partitioned or manifest-range base table prunes the
    scan too. Equal-key rows multiply through the join exactly as the
    relational delta rule requires."""
    la, rb = "__ma", "__mb"
    dA = _signed_delta(left, left_batch, left_pk, la)
    dB = _signed_delta(right, right_batch, right_pk, rb)
    a_pre = left.withColumn(la, F.lit(1))
    b_pre = right.withColumn(rb, F.lit(1))

    keys = [F.col(k) for k in join_keys]
    dkeysB = dB.select(*join_keys).distinct()
    a_near_db = a_pre.join(F.broadcast(dkeysB), join_keys, "left_semi")

    t1 = F.broadcast(dA).join(b_pre, join_keys)          # ΔA ⋈ B_pre
    t2 = a_near_db.join(F.broadcast(dB), join_keys)      # A_pre ⋈ ΔB
    t3 = F.broadcast(dA).join(dB, join_keys)             # ΔA ⋈ ΔB
    sign = (F.col(la) * F.col(rb)).alias("__sign")
    rows = (t1.select(*keys, *[F.col(c) for c in t1.columns
                               if c not in join_keys], sign)
            .unionByName(t2.select(*keys, *[F.col(c) for c in t2.columns
                                            if c not in join_keys], sign),
                         allowMissingColumns=True)
            .unionByName(t3.select(*keys, *[F.col(c) for c in t3.columns
                                            if c not in join_keys], sign),
                         allowMissingColumns=True))
    return (
        rows.groupBy(*group_cols)
        .agg(F.sum(value * F.col("__sign")).alias("total"),
             F.sum("__sign").alias("n_rows"))
        .filter((F.col("n_rows") != 0) | (F.col("total") != 0))
    )


def bootstrap_join_group_sum(
    left: DataFrame,
    right: DataFrame,
    join_keys: list[str],
    group_cols: list[str],
    value: Column,
) -> DataFrame:
    """The one full-scan bootstrap of the join view."""
    return (left.join(right, join_keys)
            .groupBy(*group_cols).agg(*_sum_cnt(value)))


def maintain_join_group_sum(
    view: DataFrame,
    left: DataFrame,
    right: DataFrame,
    left_batch: DataFrame | None,
    right_batch: DataFrame | None,
    join_keys: list[str],
    left_pk: list[str],
    right_pk: list[str],
    group_cols: list[str],
    value: Column,
) -> DataFrame:
    """Apply one audit-batch pair to a maintained join view.
    ``left``/``right`` are the PRE-batch snapshots the view was computed
    from. Returns the refreshed view — identical to a direct aggregate
    over the post-batch join (groups whose row count reached 0 drop)."""
    delta = join_group_sum_delta(left, right, left_batch, right_batch,
                                 join_keys, left_pk, right_pk,
                                 group_cols, value)
    return fold_group_sum_deltas(
        view.select(*group_cols, "total", "n_rows").unionByName(delta),
        group_cols)


def incremental_join_group_sum(
    left: DataFrame,
    right: DataFrame,
    left_batch: DataFrame | None,
    right_batch: DataFrame | None,
    join_keys: list[str],
    left_pk: list[str],
    right_pk: list[str],
    group_cols: list[str],
    value: Column,
) -> DataFrame:
    """Bootstrap + one maintenance step — the self-contained form the
    oracle-checked query uses (equality with a direct aggregate over the
    post-batch join proves the delta-join algebra end to end)."""
    view = bootstrap_join_group_sum(left, right, join_keys, group_cols,
                                    value)
    return maintain_join_group_sum(view, left, right, left_batch,
                                   right_batch, join_keys, left_pk,
                                   right_pk, group_cols, value)


# --------------------------------------------------------------------------
# Derived maintainable aggregates: moments (variance) and exact distincts
# --------------------------------------------------------------------------


def group_stats_delta(
    base: DataFrame,
    audit_batch: DataFrame,
    pk_cols: list[str],
    group_cols: list[str],
    value: Column,
) -> DataFrame:
    """Signed (group, total, total_sq, n_rows) delta — the second-moment
    extension of :func:`group_sum_delta`: SUM(v), SUM(v²) and COUNT are
    all self-maintainable under inserts/updates/deletes, and together
    they derive mean and variance exactly (Var = (Σv² − (Σv)²/n)/n).
    Same scale shape: one batch-keyed collapse, one broadcast semi-join
    debit, one credit aggregate. Keep ``value`` DECIMAL for engine-exact
    sums; the float division happens once, at read time."""
    final = keep_last_per_key(audit_batch, pk_cols)
    touched = final.select(*pk_cols)
    debit = (
        base.join(F.broadcast(touched), pk_cols, "left_semi")
        .groupBy(*group_cols)
        .agg((-F.sum(value)).alias("total"),
             (-F.sum(value * value)).alias("total_sq"),
             (-F.count("*")).alias("n_rows"))
    )
    credit = (
        final.filter(F.col(AUDIT_EVENT) != "delete")
        .groupBy(*group_cols)
        .agg(F.sum(value).alias("total"),
             F.sum(value * value).alias("total_sq"),
             F.count("*").alias("n_rows"))
    )
    return (
        debit.unionByName(credit)
        .groupBy(*group_cols)
        .agg(F.sum("total").alias("total"),
             F.sum("total_sq").alias("total_sq"),
             F.sum("n_rows").alias("n_rows"))
        .filter((F.col("n_rows") != 0) | (F.col("total") != 0)
                | (F.col("total_sq") != 0))
    )


def incremental_group_stats(
    base: DataFrame,
    audit_batch: DataFrame,
    pk_cols: list[str],
    group_cols: list[str],
    value: Column,
) -> DataFrame:
    """Bootstrap + one maintenance step of the moments view; groups whose
    row count reached 0 drop (a direct aggregate would have no row).
    Fused into ONE group aggregate over raw signed rows, exactly like
    :func:`incremental_group_sum` (same exactness argument; plan: 5 hash
    exchanges → 2); :func:`group_stats_delta` keeps its pre-aggregated
    LSM shape."""
    final = keep_last_per_key(audit_batch, pk_cols)
    touched = final.select(*pk_cols)
    v = value.alias("__v")
    vsq = (value * value).alias("__vsq")
    n = F.lit(1).alias("__n")
    rows = (
        base.select(*group_cols, v, vsq, n)
        .unionByName(
            base.join(F.broadcast(touched), pk_cols, "left_semi")
            .select(*group_cols, (-value).alias("__v"),
                    (-(value * value)).alias("__vsq"),
                    F.lit(-1).alias("__n")))
        .unionByName(
            final.filter(F.col(AUDIT_EVENT) != "delete")
            .select(*group_cols, v, vsq, n))
    )
    return (
        rows.groupBy(*group_cols)
        .agg(F.sum("__v").alias("total"),
             F.sum("__vsq").alias("total_sq"),
             F.sum("__n").cast("long").alias("n_rows"))
        .filter(F.col("n_rows") > 0)
    )


def incremental_distinct_count(
    base: DataFrame,
    audit_batch: DataFrame,
    pk_cols: list[str],
    group_cols: list[str],
    key_cols: list[str],
) -> DataFrame:
    """Exact COUNT(DISTINCT key) per group, maintained from CDC — the
    standard exact-distinct IVM result: the MAINTAINED state is the
    (group, key) pair-count table (one signed-delta fold at key grain —
    a pair whose supporting row count reaches 0 disappears), and the
    distinct count is a cheap roll-up over surviving pairs. Sketches
    (HLL) cannot subtract deletes; the pair table can, exactly, at the
    cost of key-grain state — the honest trade. Returns
    (group, n_distinct)."""
    pairs = incremental_group_sum(
        base, audit_batch, pk_cols, group_cols + key_cols, F.lit(1))
    return (pairs.groupBy(*group_cols)
            .agg(F.count("*").alias("n_distinct")))


def incremental_group_median(
    base: DataFrame,
    audit_batch: DataFrame,
    pk_cols: list[str],
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Exact per-group MEDIAN maintained from CDC — the order-statistic
    extension of the pair-grain trick: the MAINTAINED state is the
    (group, value) count table (a signed-delta fold, values whose
    support reaches 0 vanish), and the median is a cumulative roll-up
    over surviving values — smallest v with 2·cum(v) >= N, i.e.
    percentile_disc(0.5)'s lower-middle, deterministic on both engines
    in pure integer logic. Quantile sketches can't subtract deletes;
    the count table can, exactly, at value-grain state cost. The
    roll-up's windows shuffle only the (group, value) table, never the
    corpus. Returns (group, median)."""
    from pyspark.sql import Window

    pairs = incremental_group_sum(
        base, audit_batch, pk_cols, group_cols + [value_col], F.lit(1))
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    tot = Window.partitionBy(*group_cols)
    cum = (pairs
           .withColumn("__cum", F.sum("n_rows").over(w))
           .withColumn("__N", F.sum("n_rows").over(tot)))
    return (cum.filter(F.col("__cum") * 2 >= F.col("__N"))
            .groupBy(*group_cols)
            .agg(F.min(value_col).alias("median")))


def incremental_group_topk(
    base: DataFrame,
    audit_batch: DataFrame,
    pk_cols: list[str],
    group_cols: list[str],
    key_cols: list[str],
    k: int,
) -> DataFrame:
    """Exact per-group TOP-K keys by supporting row count, maintained
    from CDC — the heavy-hitter roll-up over the same (group, key)
    pair-count state as :func:`incremental_distinct_count` (Misra-Gries
    sketches can't subtract deletes; the pair table can). Deterministic:
    count desc, then key asc. Returns (group, key..., n_rows, rank)."""
    from pyspark.sql import Window

    pairs = incremental_group_sum(
        base, audit_batch, pk_cols, group_cols + key_cols, F.lit(1))
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("n_rows").desc(), *[F.col(c).asc() for c in key_cols])
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(*group_cols, *key_cols, "n_rows", "rank"))
