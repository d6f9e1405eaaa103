"""As-of join — point-in-time lookup, an operator Spark lacks natively.

``asof_join(left, right, ...)`` attaches to every left row the latest right
row (per key) whose timestamp is <= the left row's timestamp (direction
'backward'; 'forward' is the mirror).

Implementation is the union-tag pattern, NOT a range join:
  1. union left and right rows, tagged;
  2. one shuffle: partition by key, order by (ts, tag) — right-before-left
     at equal timestamps so ties match backward semantics;
  3. running ``last(payload, ignorenulls=True)`` window fills each left row
     with the most recent right payload;
  4. keep left rows.

Cost: ONE hash shuffle + per-partition sort over |L|+|R| rows — the same
shape as a sort-merge join, with no range-explosion. A naive range join
(l.ts >= r.ts) is O(|L|·|R|) per key; pd.merge_asof via applyInPandas pulls
both sides through Python. This stays entirely in JVM window execution.
Skew: a hot key serializes into one partition's sort — acceptable for
typical entity keys; salt upstream if one key dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """For each left row: columns of the nearest right row at-or-before
    (backward) / at-or-after (forward) its ``on`` timestamp, matched within
    ``by`` keys. Right columns come back suffixed (ts as ``{on}{suffix}``);
    no right match → nulls (left join semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward or forward: {direction}")
    by = [by] if isinstance(by, str) else list(by)
    right_cols = right_cols or [c for c in right.columns if c not in by and c != on]

    payload = F.struct(F.col(on).alias(f"{on}{suffix}"), *[F.col(c) for c in right_cols])
    tagged_r = right.select(
        *by, F.col(on).alias("__ts"), F.lit(0).alias("__is_left"), payload.alias("__p")
    )
    left_cols = left.columns
    tagged_l = left.select(
        "*", F.col(on).alias("__ts"), F.lit(1).alias("__is_left"), F.lit(None).cast(
            tagged_r.schema["__p"].dataType
        ).alias("__p")
    )
    unioned = tagged_l.select(
        *left_cols, "__ts", "__is_left", "__p",
    ).unionByName(
        tagged_r.select(
            *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols
              if c not in by],
            *by, "__ts", "__is_left", "__p",
        ),
        allowMissingColumns=False,
    )

    if direction == "backward":
        # right rows sort before left at equal ts → ties match (<=)
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__ts").desc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    matched = unioned.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
    return (
        matched.filter(F.col("__is_left") == 1)
        .select(*left_cols, F.col("__m.*"))
    )
