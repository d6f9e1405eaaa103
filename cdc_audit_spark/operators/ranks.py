"""Scale-safe ranked exports: percent_rank / cume_dist / ntile without a
single-partition global window.

``percent_rank() OVER (ORDER BY ...)`` and friends force every row through
one WindowExec partition — the shape flagged GLOBAL-WINDOW in PLANS.md. For
a *total* order (a unique tiebreak column in the ORDER BY, which every
deterministic export needs anyway) the same values are pure arithmetic over
the global row number:

    percent_rank = (rn - 1) / (n - 1)        (0.0 when n == 1)
    cume_dist    = rn / n
    ntile(k)     = positional bucket of rn   (first n%k tiles get one extra)

and the global row number comes from ``capture.global_row_ids`` — a
range-repartitioned sort with per-partition offsets (parallel everywhere,
one bounded O(partitions) collect). SQL semantics notes:

  * With ties NOT broken (non-unique order), SQL percent_rank uses the
    tie-group's min row number and cume_dist its max; ``assume_unique=False``
    restores that with one extra aggregate+join on the distinct order keys.
  * ntile is positional by definition (ties split arbitrarily), so it needs
    the unique order to be deterministic at all — same requirement as SQL.

Reference parity: the reference engine has no windowed exports (its audit
scan is ORDER BY audit_pk — cdc_audit_sync_mysql.php:236-241); these are
the beyond-reference OLAP surface, kept exact vs the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_audit_spark.capture import global_row_ids

__all__ = ["ranked_export", "ntile_buckets"]


def _with_rn(df: DataFrame, order_cols: list[str], strategy: str) -> tuple[DataFrame, int]:
    ranked = global_row_ids(df, order_cols, "__rn", strategy=strategy)
    # count on the ranked frame reuses the persisted/shuffled lineage
    n = ranked.count()
    return ranked, n


def ranked_export(
    df: DataFrame,
    order_cols: list[str],
    percent_col: str | None = "percent_rank",
    cume_col: str | None = "cume_dist",
    assume_unique: bool = True,
    strategy: str = "distributed",
) -> DataFrame:
    """Append percent_rank/cume_dist over the total order ``order_cols``.

    ``assume_unique=True`` (a tiebreak column is present): both values are
    closed-form in the row number — zero extra shuffles beyond the ranked
    sort itself. Otherwise one aggregate+join on the distinct order keys
    reconstructs SQL tie semantics (min rn per group for percent_rank,
    max rn for cume_dist).
    """
    ranked, n = _with_rn(df, order_cols, strategy)
    if not assume_unique:
        groups = ranked.groupBy(*order_cols).agg(
            F.min("__rn").alias("__rn_min"), F.max("__rn").alias("__rn_max")
        )
        ranked = ranked.join(groups, order_cols)
        pr_rn, cd_rn = F.col("__rn_min"), F.col("__rn_max")
    else:
        pr_rn = cd_rn = F.col("__rn")
    out = ranked
    if percent_col:
        pr = (
            F.lit(0.0) if n == 1
            else (pr_rn - F.lit(1)).cast("double") / F.lit(float(n - 1))
        )
        out = out.withColumn(percent_col, pr)
    if cume_col:
        out = out.withColumn(cume_col, cd_rn.cast("double") / F.lit(float(n)))
    return out.drop("__rn", "__rn_min", "__rn_max")


def ntile_buckets(
    df: DataFrame,
    order_cols: list[str],
    k: int,
    out_col: str = "ntile",
    strategy: str = "distributed",
) -> DataFrame:
    """Append SQL-exact ``ntile(k)`` over the total order: the first
    ``n % k`` tiles hold ``n // k + 1`` rows, the rest ``n // k``."""
    ranked, n = _with_rn(df, order_cols, strategy)
    size, extra = n // k, n % k
    threshold = extra * (size + 1)
    rn = F.col("__rn")
    in_big = rn <= F.lit(threshold)
    tile = F.when(
        in_big, ((rn - 1) / F.lit(size + 1)).cast("long") + 1
    ).otherwise(
        F.lit(extra) + ((rn - 1 - F.lit(threshold)) / F.lit(max(size, 1))).cast("long") + 1
    )
    return ranked.withColumn(out_col, tile.cast("long")).drop("__rn")
