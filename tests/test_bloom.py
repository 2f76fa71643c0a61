"""Bloom-filter join pruning: no false negatives, measured FP rate,
merge identity, end-result equality with the plain semi join, and the
broadcast-only probe plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from bohemia_kenya_data_pipeline_spark.operators import bloom as B

N_BITS = 1 << 16  # small bitmap so FP behavior is measurable at test scale


def _members(spark):
    return spark.range(0, 2000).select((F.col("id") * 7 + 3).alias("k"))


def _universe(spark):
    return spark.range(0, 40000).select(F.col("id").alias("k"))


def test_no_false_negatives(spark):
    m = _members(spark)
    bl = B.bloom_words(m, "k", n_bits=N_BITS)
    passed = {
        r.k for r in B.might_contain(_universe(spark), bl, "k", n_bits=N_BITS).collect()
    }
    true_members = {r.k for r in m.filter(F.col("k") < 40000).collect()}
    assert true_members <= passed


def test_false_positive_rate_bounded(spark):
    m = _members(spark)
    bl = B.bloom_words(m, "k", n_bits=N_BITS)
    uni = _universe(spark)
    passed = B.might_contain(uni, bl, "k", n_bits=N_BITS).count()
    true = uni.join(m, "k", "semi").count()
    fp_rate = (passed - true) / (40000 - true)
    # 2000 keys * 3 hashes in 65536 bits -> fill ~0.088, fp ~ fill^3 ~ 0.07%
    assert fp_rate < 0.02, fp_rate
    # and the bloom actually prunes: vast majority of non-members dropped
    assert passed < 40000 * 0.1


def test_fill_factor_reported(spark):
    bl = B.bloom_words(_members(spark), "k", n_bits=N_BITS)
    row = B.bloom_stats(bl, n_bits=N_BITS).collect()[0]
    assert 0 < row.fill_factor < 0.15
    assert row.bits_set <= 3 * 2000


def test_merge_identity_exact(spark):
    a = spark.range(0, 1000).select(F.col("id").alias("k"))
    b = spark.range(500, 1500).select(F.col("id").alias("k"))
    merged = B.merge_blooms(
        B.bloom_words(a, "k", n_bits=N_BITS), B.bloom_words(b, "k", n_bits=N_BITS)
    )
    direct = B.bloom_words(a.unionByName(b), "k", n_bits=N_BITS)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_pruned_semi_join_equals_plain(spark):
    big = spark.range(0, 30000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    small = spark.range(0, 3000).select((F.col("id") * 11).alias("k"))
    got = B.bloom_pruned_semi_join(big, small, "k", n_bits=N_BITS)
    want = big.join(small, "k", "semi")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_null_keys_dropped_like_sql_equality(spark):
    big = spark.createDataFrame(
        [(1,), (None,), (2,)], "k int"
    )
    small = spark.createDataFrame([(1,), (None,)], "k int")
    got = B.bloom_pruned_semi_join(big, small, "k", n_bits=N_BITS)
    assert [r.k for r in got.collect()] == [1]


def test_probe_plan_is_single_broadcast_no_probe_shuffle(spark):
    """The probe side must stream through ONE broadcast of the one-row
    word map; the only shuffle allowed is the bloom build's own
    word_idx aggregation (which has map-side partial_bit_or)."""
    bl = B.bloom_words(_members(spark), "k", n_bits=N_BITS)
    plan = (
        B.might_contain(_universe(spark), bl, "k", n_bits=N_BITS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # one build-side word_idx shuffle, not one per hash function
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_bit_or" in plan


def test_empty_build_side_passes_nothing(spark):
    from pyspark.sql import functions as F

    empty = spark.createDataFrame([], "k long")
    probe = spark.range(5).select(F.col("id").alias("k"))
    bl = B.bloom_words(empty, "k", n_bits=N_BITS)
    assert B.might_contain(probe, bl, "k", n_bits=N_BITS).count() == 0
