"""Goldens for windows.distributed_global_rank / ntile_from_rank —
equivalence with the single-reducer Window forms they replace, across
partition counts and the q=0 tiny-input edge."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bohemia_kenya_data_pipeline_spark.operators import windows as W


def _vals(spark, n, mod):
    # repeated values force the unique tiebreak to matter
    return spark.range(n).select(
        F.col("id"), (F.col("id") % mod).alias("v")
    )


def test_rank_matches_global_window(spark):
    df = _vals(spark, 97, 7)
    got = {
        r["id"]: r["rn"]
        for r in W.distributed_global_rank(
            df, ["v", "id"], num_partitions=5
        ).collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == want


def test_rank_partition_count_invariant(spark):
    df = _vals(spark, 50, 3)
    one = W.distributed_global_rank(df, ["v", "id"], num_partitions=1)
    many = W.distributed_global_rank(
        df.repartition(8), ["v", "id"], num_partitions=13
    )
    assert {(r["id"], r["rn"]) for r in one.collect()} == {
        (r["id"], r["rn"]) for r in many.collect()
    }


def test_ntile_from_rank_matches_window_ntile(spark):
    for n, k in [(97, 5), (100, 5), (7, 5), (3, 5), (12, 4)]:
        df = _vals(spark, n, 6)
        ranked = W.distributed_global_rank(df, ["v", "id"], num_partitions=4)
        got = {
            r["id"]: r["b"]
            for r in ranked.select(
                "id", W.ntile_from_rank(F.col("rn"), F.lit(n), k).alias("b")
            ).collect()
        }
        want = {
            r["id"]: r["b"]
            for r in df.withColumn(
                "b", F.ntile(k).over(Window.orderBy("v", "id"))
            ).collect()
        }
        assert got == want, (n, k)


def test_rank_branches_agree_within_one_action(spark):
    # regression for the repartitionByRange hazard: the offsets branch
    # and the local-rank branch must see the SAME bucket assignment in
    # every execution (range-exchange boundary sampling is re-randomized
    # per materialization; literal boundary buckets are not). Run the
    # same plan repeatedly and demand identical, gap-free ranks.
    df = _vals(spark, 2000, 17)
    r = W.distributed_global_rank(df, ["v", "id"], num_partitions=8)
    baseline = sorted((row["id"], row["rn"]) for row in r.collect())
    ranks = [rn for _, rn in baseline]
    assert sorted(ranks) == list(range(1, 2001))
    for _ in range(2):
        again = sorted((row["id"], row["rn"]) for row in r.collect())
        assert again == baseline


def test_rank_boundaries_batched_matches_per_call(spark):
    # the batched helper must yield boundaries that produce the same
    # ranks as the operator's self-serve path
    df = _vals(spark, 300, 11)
    n, bnds = W.rank_boundaries(
        df, {"a": ["v", "id"], "b": ["id"]}, num_partitions=6
    )
    assert n == 300
    got = {
        r["id"]: r["rn"]
        for r in W.distributed_global_rank(
            df, ["v", "id"], boundaries=bnds["a"], num_partitions=6
        ).collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in W.distributed_global_rank(
            df, ["v", "id"], num_partitions=6
        ).collect()
    }
    assert got == want


def test_lex_ge_matches_struct_semantics(spark):
    import itertools

    from pyspark.sql import functions as F

    rows = [(a, b) for a, b in itertools.product(range(3), range(3))]
    df = spark.createDataFrame(rows, ["x", "y"])
    for bound in [(0, 0), (1, 2), (2, 0)]:
        got = {
            (r["x"], r["y"])
            for r in df.filter(
                W.lex_ge([F.col("x"), F.col("y")], bound)
            ).collect()
        }
        want = {t for t in rows if t >= bound}
        assert got == want, bound


def test_full_sample_regime_collects_all_rows(spark):
    """Round-7 ADVICE fix: when target sample >= n (frac >= 1.0), the
    8-hex-char cap compare used to format 16**8 as a 9-char string and
    keep only hashes starting with '0' (~1/16 of rows). The boundary
    sample must now be the FULL key set, so the cuts equal
    pick_boundary_cuts over every key exactly."""
    df = _vals(spark, 60, 60)  # distinct keys so cuts are predictable
    # num_partitions=4, sample_per_partition=100 -> target=400 >= 60
    n, bounds = W.rank_boundaries(
        df, {"k": ["v", "id"]}, num_partitions=4, sample_per_partition=100
    )
    assert n == 60
    all_keys = sorted((r["v"], r["id"]) for r in df.collect())
    assert bounds["k"] == W.pick_boundary_cuts(all_keys, 4)
    # and the under-sampled regime would have produced FEWER than the
    # expected 3 cuts with high probability on 60 rows (~4 survivors);
    # full-sample guarantees exactly num_partitions-1
    assert len(bounds["k"]) == 3
    # ranks stay exact either way (monotonicity) — sanity-check via the
    # self-serve path which shares the fixed sampling code
    got = {
        r["id"]: r["rn"]
        for r in W.distributed_global_rank(
            df, ["v", "id"], num_partitions=4, sample_per_partition=100
        ).collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == want


def test_ntile_closed_form_exhaustive_grid(spark):
    """The NTILE closed form must be bit-identical to SQL NTILE for
    EVERY (n, buckets) shape, not just sampled ones: one Spark job
    evaluates the expression over the full grid n in 1..48 x k in
    1..10, and the reference is the NTILE definition computed in plain
    Python (first n%k buckets take n//k+1 rows). Covers q=0 (n<k),
    exact division, and every remainder class."""
    grid = [
        (n, k, rn) for n in range(1, 49) for k in range(1, 11)
        for rn in range(1, n + 1)
    ]
    df = spark.createDataFrame(grid, "n INT, k INT, rn INT")
    got_rows = []
    for k in range(1, 11):
        got_rows += (
            df.filter(F.col("k") == k)
            .select(
                "n", "k", "rn",
                W.ntile_from_rank(F.col("rn"), F.col("n"), k).alias("b"),
            )
            .collect()
        )
    got = {(r.n, r.k, r.rn): r.b for r in got_rows}

    def expected(n, k, rn):
        q, r = divmod(n, k)
        cut = r * (q + 1)
        if rn <= cut:
            return (rn + q) // (q + 1)
        return r + (rn - cut + max(q, 1) - 1) // max(q, 1)

    # sanity: the Python reference matches the NTILE definition by
    # bucket-size reconstruction on a few shapes
    for n, k in [(7, 3), (10, 4), (3, 5), (48, 10)]:
        sizes = {}
        for rn in range(1, n + 1):
            sizes[expected(n, k, rn)] = sizes.get(expected(n, k, rn), 0) + 1
        q, r = divmod(n, k)
        for b, s in sizes.items():
            assert s == (q + 1 if b <= r else q) or q == 0, (n, k, b, s)

    bad = [
        key for key in got
        if got[key] != expected(*key)
    ]
    assert bad == [], bad[:10]
