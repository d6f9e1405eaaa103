"""Skew-mitigation utilities for shuffle joins.

AQE's skew-join splitting (enabled in session.tune) handles most skew by
splitting oversized shuffle partitions. Salting is the explicit fallback
for the case AQE cannot fix: a SINGLE join key so hot that one key's rows
exceed an executor (e.g. a null-ish default id owning 10% of 100 TB).

``salted_join`` spreads each hot key over ``salts`` sub-keys: the large
(skewed) side gets a deterministic salt derived from hashing its row, the
small side is replicated ``salts`` times (explode of a literal range), and
the equi-join runs on (key, salt). Row multiplication is confined to the
small side — shuffle volume grows by ``salts × |small|``, while the hot
key's rows now land on ``salts`` different reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "with_salt"]

_SALT = "__salt"


def with_salt(df: DataFrame, salts: int) -> DataFrame:
    """Deterministic per-row salt in [0, salts): hash of the whole row.

    xxhash64 over all columns — stable across runs and partitionings
    (unlike rand() or monotonically_increasing_id), so retried tasks and
    re-executed stages produce identical salts (required for exactly-once
    sinks downstream).
    """
    return df.withColumn(_SALT, F.pmod(F.xxhash64(*df.columns), F.lit(salts)).cast("int"))


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salts: int = 8,
) -> DataFrame:
    """Equi-join robust to extreme key skew on the ``skewed`` side.

    Semantically identical to ``skewed.join(small, on, how)`` for
    ``how`` in (inner, left); the salt columns never escape. The small
    side is replicated ``salts``× — keep it the dimension side.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    keys = [on] if isinstance(on, str) else list(on)
    salted = with_salt(skewed, salts)
    replicated = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(s) for s in range(salts)]))
    ).withColumn(_SALT, F.col(_SALT).cast("int"))
    out = salted.join(replicated, keys + [_SALT], how)
    return out.drop(_SALT)
