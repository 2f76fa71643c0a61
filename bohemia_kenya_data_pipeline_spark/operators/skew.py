"""Manual skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join splitting handles most runtime skew by subdividing
oversized shuffle partitions, but two cases still need explicit
salting at 100 TB:

- a single join key so hot that even a split partition's build side
  overflows one task (AQE splits the probe side, not the key);
- a groupBy whose per-key partial state is itself huge (collect-style
  aggregates), where map-side combine cannot help because all rows of
  the key land on one reducer.

Both operators here produce IDENTICAL results to their unsalted
counterparts (oracle-checked); salting changes only the shuffle
layout. Reference parity: SURVEY §7.2 scale brief ("salting for
skew"); the reference itself is single-node R and never needed it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Aggregations that decompose into (partial on key+salt, final on key).
_COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
_PARTIAL = {"sum": F.sum, "count": lambda c: F.count(F.lit(1)), "min": F.min, "max": F.max}


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key pressure spread over ``n_salts``
    shuffle partitions per key: the (big) left side gets a per-row
    salt, the (small-per-key) right side is replicated once per salt
    value, and the join runs on (keys..., salt).

    Result is row-identical to ``left.join(right, on, how)`` — every
    left row still meets every matching right row exactly once. Costs
    ``n_salts``× the right side's shuffle volume; use when one key
    dominates and the right side per key is small (dim tables, per-key
    metadata), NOT for many-to-many explosions.

    The salt is derived from a nondeterministic row id — which rows
    land in which salt bucket varies per run, but the OUTPUT doesn't
    (any salt meets a full right replica). Supported ``how``: inner
    and left (semantics preserved because every left row carries
    exactly one salt and sees a complete right copy for it).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    keys = [on] if isinstance(on, str) else list(on)
    lt = left.withColumn(
        "__salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    rt = right.withColumn(
        "__salt", F.explode(F.array([F.lit(i) for i in range(n_salts)]))
    )
    return lt.join(rt, [*keys, "__salt"], how).drop("__salt")


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase grouped aggregation for skewed keys: partial-aggregate
    on (keys..., salt), then combine per key. ``aggs`` maps output
    column → (function, input column) with function one of
    sum/count/min/max (the decomposable set — avg is sum/count at the
    call site).

    Identical results to a plain groupBy (oracle-checked); the hot
    key's rows are first reduced across ``n_salts`` parallel partial
    states instead of one reducer. Spark's map-side combine usually
    makes this unnecessary for these functions — the operator is the
    pattern for when partial state is too big to combine map-side, and
    the differential keeps it honest.
    """
    bad = [f for f, _ in aggs.values() if f not in _PARTIAL]
    if bad:
        raise ValueError(f"unsupported agg functions {bad}: use {sorted(_PARTIAL)}")
    salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[_PARTIAL[f](c).alias(out) for out, (f, c) in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[_COMBINE[f](out).alias(out) for out, (f, c) in aggs.items()]
    )
