"""Point-in-interval range join without a cross product.

Spark executes a plain ``point BETWEEN lo AND hi`` join as
BroadcastNestedLoopJoin (O(N·M) comparisons) unless the interval side fits
in memory. The scalable form bins the time axis:

  * every interval [lo, hi] is exploded into the bins it overlaps
    (sequence over bin ids — interval length / bin_width rows each);
  * every point maps to exactly one bin;
  * an EQUI-join on bin id pairs each point with only the intervals
    overlapping its bin, then the exact containment predicate filters
    residuals.

Shuffle volume: points × 1 + intervals × avg_bins_per_interval. Choose
``bin_width`` near the typical interval length — too small multiplies the
interval side, too large degrades toward the cross product within a bin.
This is the standard interval-binning strategy used by warehouse range-join
optimizations; here it is an explicit operator so the plan is inspectable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["point_in_interval_join"]


def _bin_of(ts: Column, bin_width_secs: int) -> Column:
    return (F.unix_micros(ts) / F.lit(bin_width_secs * 1_000_000)).cast("long")


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo_ts: str,
    hi_ts: str,
    bin_width_secs: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Rows of ``points`` joined with every interval containing their
    timestamp (``lo <= ts <= hi``), via bin equi-join + residual filter.

    ``how='inner'`` drops uncontained points; ``how='left'`` keeps them
    with null interval columns (the interval side's bin explosion never
    duplicates a point: a point matches an interval at most once because
    containment is checked exactly and (point, interval) pairs are unique
    per bin by construction — each point exists in exactly one bin).
    """
    if how not in ("inner", "left"):
        raise ValueError("point_in_interval_join supports inner and left")
    pb = points.withColumn("__bin", _bin_of(F.col(point_ts), bin_width_secs))
    lo_bin = _bin_of(F.col(lo_ts), bin_width_secs)
    hi_bin = _bin_of(F.col(hi_ts), bin_width_secs)
    ib = intervals.withColumn(
        "__bin", F.explode(F.sequence(lo_bin, hi_bin))
    )
    contained = (F.col(point_ts) >= F.col(lo_ts)) & (F.col(point_ts) <= F.col(hi_ts))
    if how == "inner":
        return pb.join(ib, "__bin").filter(contained).drop("__bin")
    # left: equi-join on bin, containment as join condition residual so
    # unmatched points survive with nulls
    cond = (pb["__bin"] == ib["__bin"]) & contained
    out = pb.join(ib, cond, "left").drop(ib["__bin"]).drop(pb["__bin"])
    return out
