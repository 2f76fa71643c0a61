"""Similarity search over embedding columns (array<float>).

Scale pack: brute-force cosine top-k as the exact baseline, and an
LSH-bucketed variant as the 100 TB path (candidates come from an
equi-join on hash buckets instead of a cross join).

All vector math is built-in ``zip_with``/``aggregate`` expressions —
JVM-side, no Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    d = dot(a, b)
    n = norm(a) * norm(b)
    return F.when(n > 0, d / n).otherwise(F.lit(0.0))


def cosine_prenormed(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine with norms staged per SIDE instead of per PAIR — in an
    n×m scoring join the per-pair ``cosine`` re-folds each vector's
    norm m (resp. n) times; precomputing a norm column per side cuts
    the fold work to the dot product alone, with bit-identical values
    (same norm expression, evaluated earlier)."""
    n = na * nb
    return F.when(n > 0, dot(a, b) / n).otherwise(F.lit(0.0))


def _as_double(vec_col: str) -> Column:
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force cosine top-k: each query row is scored against
    the whole corpus; top k per query by (score desc, neighbor id).

    Plan: broadcast(queries) × corpus — a map-side nested loop, then a
    single window shuffle on query_id. Linear in corpus size per query;
    the right exact baseline when the query set is small. Self-matches
    are excluded.

    Returns (query_id, neighbor_id, score, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "score",
            F.round(
                cosine_prenormed(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")), 4
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG-based, no numpy
    RNG state) for sign-LSH bucketing."""
    planes: list[list[float]] = []
    state = seed
    for _ in range(n_planes):
        row: list[float] = []
        for _ in range(dim):
            state = (state * 1103515245 + 12345) % (2**31)
            row.append((state / (2**31)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit i = (vec · plane_i) > 0, packed to int."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(v) for v in plane])
        bucket = bucket + F.when(dot(vec, p) > 0, F.lit(2**i)).otherwise(0)
    return bucket


def lsh_table_buckets(vec: Column, planes: list[list[float]], n_tables: int) -> Column:
    """Multi-table sign-LSH (OR-construction): split ``planes`` into
    ``n_tables`` groups of k planes; returns array<struct<tbl,bucket>>
    — one bucket per table. Explode + equi-join on (tbl, bucket) gives
    candidate recall 1-(1-p^k)^L instead of single-table p^k, at L×
    the (still linear) join volume. This is the knob that makes
    sign-LSH usable for real near-dup recall at scale."""
    if len(planes) % n_tables:
        raise ValueError("len(planes) must be divisible by n_tables")
    k = len(planes) // n_tables
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_bucket(vec, planes[t * k : (t + 1) * k]).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: multi-table sign-LSH (``n_tables`` tables ×
    ``n_planes`` planes each), candidates = distinct union of per-table
    bucket equi-join matches, exact cosine + rank within candidates.

    The 100 TB path — candidate generation is a shuffle-partitioned
    equi-join on (tbl, bucket) (≈ L·n/2^k candidates per query), never
    a cross join. Candidate recall = 1-(1-p^k)^L where
    p = 1-θ/π; k=4, L=8 gives ~0.98 for cosine ≥ 0.8 neighbors.

    Returns (query_id, neighbor_id, score, rank) — rank within
    candidates only.
    """
    planes = random_hyperplanes(dim, n_planes * n_tables, seed)
    q = (
        queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv"))
        .withColumn("qn", norm(F.col("qv")))
        .withColumn("tb", F.explode(lsh_table_buckets(F.col("qv"), planes, n_tables)))
    )
    c = (
        corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv"))
        .withColumn("cn", norm(F.col("cv")))
        .withColumn("tb", F.explode(lsh_table_buckets(F.col("cv"), planes, n_tables)))
    )
    cand = (
        q.join(c, "tb")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "qn", "neighbor_id", "cv", "cn")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "score",
        F.round(cosine_prenormed(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")), 4),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
