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
        .unionByName(group_sum_delta(base, audit_batch, pk_cols,
                                     group_cols, value))
        .groupBy(*group_cols)
        .agg(F.sum("total").alias("total"), F.sum("n_rows").alias("n_rows"))
        .filter(F.col("n_rows") > 0)
    )


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
    return (
        debit.unionByName(credit)
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
    post-batch snapshot proves the maintenance algebra)."""
    view = bootstrap_group_sum(base, group_cols, value)
    return maintain_group_sum(view, base, audit_batch, pk_cols, group_cols, value)
