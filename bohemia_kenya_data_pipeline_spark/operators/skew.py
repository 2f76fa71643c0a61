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

from pyspark.sql import DataFrame, Window
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


def skew_profile(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
    n_partitions: int = 32,
) -> DataFrame:
    """Key-distribution diagnostic: the planning job you run BEFORE
    choosing between a plain shuffle, :func:`salted_join`, or
    :func:`salted_aggregate` on a 100 TB fact.

    Returns the ``top_n`` heaviest keys with exact-integer shares
    (parts-per-million — integer math on purpose: a diagnostic that
    drives a rewrite decision should hash-compare bit-exactly across
    engines and runs):

    - ``rank``            heavy-hitter rank (count desc, key asc);
    - ``key``             the key, cast to string for genericity;
    - ``n``               row count of the key;
    - ``share_ppm``       floor(n * 1e6 / total_rows);
    - ``cum_share_ppm``   floor(cumulative n * 1e6 / total) — "the
      top-k keys are X% of the table", the number that says whether
      skew is a one-key or a head-heavy problem;
    - ``salts_rec``       ceil(n * n_partitions / total): how many
      salt buckets flatten this key to an average partition's share
      (1 = no salting needed at this parallelism);
    - ``total_rows`` / ``n_keys``  table-level context.

    Scale: one map-side-combinable count shuffle reduces the fact to
    #distinct-keys rows; the top-``top_n`` cut is then a distributed
    ``TakeOrderedAndProject`` (per-partition partial top-k, merged),
    NOT a global single-partition sort — a billion-distinct-key fact
    never funnels its whole count frame through one task. The
    rank/cumsum window runs over the <= ``top_n`` survivors only
    (cumulative share over ranks 1..k needs exactly those rows).
    """
    p = int(n_partitions)
    cnt = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cnt.agg(
        F.sum("n").alias("total_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    top = cnt.orderBy(F.col("n").desc(), F.col("key").asc()).limit(int(top_n))
    w = Window.orderBy(F.col("n").desc(), F.col("key").asc())
    ranked = top.withColumn("rank", F.row_number().over(w)).withColumn(
        "cum_n", F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            "rank",
            "key",
            F.col("n").cast("bigint").alias("n"),
            F.expr("(n * 1000000) div total_rows").cast("bigint").alias("share_ppm"),
            F.expr("(cum_n * 1000000) div total_rows")
            .cast("bigint")
            .alias("cum_share_ppm"),
            F.expr(f"(n * {p} + total_rows - 1) div total_rows")
            .cast("int")
            .alias("salts_rec"),
            F.col("total_rows").cast("bigint").alias("total_rows"),
            F.col("n_keys").cast("bigint").alias("n_keys"),
        )
    )
