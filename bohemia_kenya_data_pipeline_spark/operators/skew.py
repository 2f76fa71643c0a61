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
#: 'count' is F.count(col) — non-null count, matching a plain groupBy
#: (COUNT(*) semantics: pass a known-non-null column or a literal key).
_COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
_PARTIAL = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}


def _salt(df: DataFrame, n_salts: int):
    """Deterministic per-row salt: hash of ALL columns, mod n.

    Deliberately NOT monotonically_increasing_id()/rand(): a
    nondeterministic expression feeding a shuffle is the
    indeterminate-stage hazard (SPARK-23207 class) — after a fetch
    failure, recomputed map tasks would re-salt rows differently and
    the retried aggregate could double-count or drop rows. Hashing row
    content is retry-stable; identical rows share a salt, which only
    matters if one key's rows are also all identical (then exact-dedup
    first, as everywhere else in this engine).
    """
    return F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))


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

    The salt is a deterministic hash of the whole row (see ``_salt`` —
    retry-stable, unlike a nondeterministic row id); any salt value
    meets a complete right replica, so the output is unaffected by
    which bucket a row lands in. Supported ``how``: inner and left
    (semantics preserved because every left row carries exactly one
    salt and sees a complete right copy for it).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    keys = [on] if isinstance(on, str) else list(on)
    lt = left.withColumn("__salt", _salt(left, n_salts))
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
    call site). 'count' is non-null count of the input column, exactly
    like plain ``F.count(col)``.

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
    partial = (
        df.withColumn("__salt", _salt(df, n_salts))
        .groupBy(*keys, "__salt")
        .agg(*[_PARTIAL[f](c).alias(out) for out, (f, c) in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[_COMBINE[f](out).alias(out) for out, (f, c) in aggs.items()]
    )
