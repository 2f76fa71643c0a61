"""Unit tests for hash sampling/splitting, sequence packing, PII scrub,
repetition features, and the contamination check — edge cases the
oracle differentials (tests/test_oracle_queries.py) don't isolate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bohemia_kenya_data_pipeline_spark.operators import dedup as dd
from bohemia_kenya_data_pipeline_spark.operators import sampling as smp
from bohemia_kenya_data_pipeline_spark.operators import text as tx
from bohemia_kenya_data_pipeline_spark.operators import windows as W


# ---------------------------------------------------------------------------
# sample_by_hash / split_by_hash
# ---------------------------------------------------------------------------


def test_sample_by_hash_partition_invariant(spark):
    df = spark.range(2000).withColumnRenamed("id", "k")
    a = {r.k for r in smp.sample_by_hash(df, "k", 0.3).collect()}
    b = {r.k for r in smp.sample_by_hash(df.repartition(7), "k", 0.3).collect()}
    assert a == b
    # ~30% with hash-uniform tolerance
    assert 0.24 * 2000 < len(a) < 0.36 * 2000


def test_sample_by_hash_edges(spark):
    df = spark.range(100).withColumnRenamed("id", "k")
    assert smp.sample_by_hash(df, "k", 0.0).count() == 0
    assert smp.sample_by_hash(df, "k", 1.0).count() == 100
    with pytest.raises(ValueError):
        smp.sample_by_hash(df, "k", -0.1)


def test_sample_by_hash_nested_monotone(spark):
    # Threshold semantics: a 10% sample is a subset of the 30% sample
    # at the same seed — the property that makes staged size sweeps
    # comparable.
    df = spark.range(1000).withColumnRenamed("id", "k")
    s10 = {r.k for r in smp.sample_by_hash(df, "k", 0.1).collect()}
    s30 = {r.k for r in smp.sample_by_hash(df, "k", 0.3).collect()}
    assert s10 <= s30


def test_split_by_hash_partitions_every_row_once(spark):
    df = spark.range(3000).withColumnRenamed("id", "k")
    out = smp.split_by_hash(df, "k", {"train": 8, "valid": 1, "test": 1})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 3000
    assert set(counts) == {"train", "valid", "test"}
    assert 0.74 * 3000 < counts["train"] < 0.86 * 3000
    # weights normalize: integer weights behave like 0.8/0.1/0.1
    with pytest.raises(ValueError):
        smp.split_by_hash(df, "k", {})


def test_split_by_hash_single_label(spark):
    df = spark.range(10).withColumnRenamed("id", "k")
    out = smp.split_by_hash(df, "k", {"all": 1.0})
    assert out.filter(F.col("split") == "all").count() == 10


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------


def test_pack_sequences_boundaries(spark):
    rows = [(i, "s", n) for i, n in enumerate([100, 100, 100, 100, 100])]
    df = spark.createDataFrame(rows, "doc_id INT, source STRING, n_tok INT")
    out = {
        r.doc_id: (r.cum_tokens, r.chunk_id)
        for r in W.pack_sequences(df, "n_tok", "doc_id", ["source"], 250).collect()
    }
    # starting offsets 0,100,200,300,400 -> chunks 0,0,0,1,1
    assert out == {0: (100, 0), 1: (200, 0), 2: (300, 0), 3: (400, 1), 4: (500, 1)}


def test_pack_sequences_oversized_doc_gets_own_chunks(spark):
    df = spark.createDataFrame(
        [(1, "s", 50), (2, "s", 900), (3, "s", 50)],
        "doc_id INT, source STRING, n_tok INT",
    )
    out = {r.doc_id: r.chunk_id for r in
           W.pack_sequences(df, "n_tok", "doc_id", ["source"], 256).collect()}
    # doc2 starts at offset 50 (chunk 0) and spills; doc3 starts at 950 -> chunk 3
    assert out == {1: 0, 2: 0, 3: 3}
    with pytest.raises(ValueError):
        W.pack_sequences(df, "n_tok", "doc_id", ["source"], 0)


def test_pack_sequences_partition_isolation(spark):
    df = spark.createDataFrame(
        [(1, "a", 200), (2, "b", 200), (3, "a", 200), (4, "b", 200)],
        "doc_id INT, source STRING, n_tok INT",
    )
    out = {(r.source, r.doc_id): r.chunk_id for r in
           W.pack_sequences(df, "n_tok", "doc_id", ["source"], 300).collect()}
    assert out == {("a", 1): 0, ("a", 3): 0, ("b", 2): 0, ("b", 4): 0}


# ---------------------------------------------------------------------------
# scrub_pii / repetition_features / ngram_contamination
# ---------------------------------------------------------------------------


def test_scrub_pii_redacts_all_three(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b-c_d@ex-ample.co.uk ip 192.168.0.1 tel +44 20 7946 0958 end")],
        "id INT, text STRING",
    )
    out = tx.scrub_pii(df).collect()[0].text
    assert out == "mail <EMAIL> ip <IP> tel <PHONE> end"


def test_scrub_pii_leaves_clean_text(spark):
    df = spark.createDataFrame([(1, "nothing sensitive here 42")], "id INT, text STRING")
    assert tx.scrub_pii(df).collect()[0].text == "nothing sensitive here 42"


def test_repetition_features_math(spark):
    df = spark.createDataFrame([(1, "a a a b"), (2, "x y"), (3, "")],
                               "doc_id INT, text STRING")
    out = {r.doc_id: r for r in tx.repetition_features(df).collect()}
    assert out[1].n_tokens == 4 and out[1].n_distinct_tokens == 2
    assert out[1].dup_token_ratio == 0.5 and out[1].top_token_ratio == 0.75
    assert out[2].dup_token_ratio == 0.0
    assert 3 not in out  # zero-token doc yields no row


def test_ngram_contamination_counts_distinct_grams(spark):
    corpus = spark.createDataFrame(
        [(1, "q w e r t"), (2, "z z z z")], "doc_id INT, text STRING"
    )
    bench = spark.createDataFrame([(9, "w e r x q w e")], "doc_id INT, text STRING")
    out = {r.doc_id: r.n_hits for r in
           dd.ngram_contamination(corpus, bench, n=3).collect()}
    # doc1 shares 3-grams "q w e" and "w e r"; doc2 shares nothing
    assert out == {1: 2}


def test_sampling_null_keys(spark):
    df = spark.createDataFrame([(1,), (2,), (None,)], "k INT")
    # sample: NULL keys dropped even at fraction 1.0 (documented)
    assert smp.sample_by_hash(df, "k", 1.0).count() == 2
    # split: NULL keys labeled NULL, never silently dumped in the last split
    out = {r.k: r.split for r in smp.split_by_hash(df, "k", {"train": 0.9, "test": 0.1}).collect()}
    assert out[None] is None
    assert all(v in ("train", "test") for k, v in out.items() if k is not None)


def test_pack_sequences_tiebreak_deterministic(spark):
    # equal order keys: the tiebreak column pins intra-tie order
    df = spark.createDataFrame(
        [(1, "s", 0, 100), (2, "s", 0, 100), (3, "s", 0, 100)],
        "doc_id INT, source STRING, ord INT, n_tok INT",
    )
    packed = W.pack_sequences(df, "n_tok", "ord", ["source"], 150, tiebreak_cols=["doc_id"])
    out = {r.doc_id: r.chunk_id for r in packed.collect()}
    out2 = {r.doc_id: r.chunk_id for r in
            W.pack_sequences(df.repartition(5), "n_tok", "ord", ["source"], 150,
                             tiebreak_cols=["doc_id"]).collect()}
    assert out == out2 == {1: 0, 2: 0, 3: 1}


def test_vocabulary_top_k_zero(spark):
    from bohemia_kenya_data_pipeline_spark.operators.text import vocabulary
    df = spark.createDataFrame([(1, "a b a")], "doc_id INT, text STRING")
    assert vocabulary(df, top_k=0).count() == 0
    assert vocabulary(df).count() == 2


def test_numeric_profile_quantile_names(spark):
    from bohemia_kenya_data_pipeline_spark.operators import stats as stx
    df = spark.createDataFrame([(float(i),) for i in range(100)], "v DOUBLE")
    prof = stx.numeric_profile(df, "v", quantiles=(0.5, 0.995, 0.999))
    assert [f for f in prof.columns if f.startswith("p")] == ["p50", "p99_5", "p99_9"]
    with pytest.raises(ValueError):
        # both format to "p100" at %g precision -> must raise, not
        # silently produce duplicate columns
        stx.numeric_profile(df, "v", quantiles=(0.9999999, 0.99999999))


def test_numeric_profile_approx_within_rank_error(spark):
    from bohemia_kenya_data_pipeline_spark.operators import stats as stx
    df = spark.createDataFrame([(float(i),) for i in range(10000)], "v DOUBLE")
    exact = stx.numeric_profile(df, "v").collect()[0]
    approx = stx.numeric_profile(df, "v", approx=True, approx_accuracy=1000).collect()[0]
    # rank error <= 1/accuracy -> value error <= n/accuracy on this
    # uniform 0..9999 data
    for c in ("p50", "p95"):
        assert abs(approx[c] - exact[c]) <= 10000 / 1000 + 1
    # non-quantile stats are unaffected by the approx flag
    assert (approx.n, approx.vmin, approx.vmax) == (exact.n, exact.vmin, exact.vmax)

def test_sample_fraction_out_of_range_raises(spark):
    import pytest

    from bohemia_kenya_data_pipeline_spark.operators import sampling as smp

    df = spark.range(10)
    for bad in (-0.1, 1.5, 25):  # 25 = "percent instead of fraction" bug
        with pytest.raises(ValueError, match=r"\[0, 1\]"):
            smp.sample_by_hash(df, "id", bad)
    # boundary values stay legal
    assert smp.sample_by_hash(df, "id", 1.0).count() == 10
    assert smp.sample_by_hash(df, "id", 0.0).count() == 0


def test_stratified_sample_rates_and_independence(spark):
    from bohemia_kenya_data_pipeline_spark.operators import sampling as smp

    df = spark.range(20_000).select(
        F.col("id"), F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("grp")
    )
    out = smp.stratified_sample_by_hash(df, "id", "grp", {"a": 0.5, "b": 0.1})
    counts = {r.grp: r.n for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["a"] / 10_000 - 0.5) < 0.03
    assert abs(counts["b"] / 10_000 - 0.1) < 0.03
    # changing one group's rate must not disturb the other group's
    # membership (per-row fate depends only on own hash + own rate)
    out2 = smp.stratified_sample_by_hash(df, "id", "grp", {"a": 0.5, "b": 0.9})
    a1 = {r.id for r in out.filter(F.col("grp") == "a").collect()}
    a2 = {r.id for r in out2.filter(F.col("grp") == "a").collect()}
    assert a1 == a2
    # unlisted groups drop by default
    df3 = df.withColumn("grp", F.lit("zzz"))
    assert smp.stratified_sample_by_hash(df3, "id", "grp", {"a": 0.5}).count() == 0
    with pytest.raises(ValueError):
        smp.stratified_sample_by_hash(df, "id", "grp", {})


def test_take_token_budget_invariants(spark):
    from bohemia_kenya_data_pipeline_spark.operators import sampling as smp

    df = spark.range(1000).select(
        F.col("id"),
        F.when(F.col("id") % 3 == 0, "x").otherwise("y").alias("grp"),
        (F.pmod(F.hash("id"), F.lit(500)) + 1).alias("tokens"),
    )
    budget = 5000
    out = smp.take_token_budget(df, "grp", "tokens", budget, "id")
    rows = out.groupBy("grp").agg(
        F.sum("tokens").alias("total"), F.max("tokens").alias("mx"), F.count("*").alias("n")
    ).collect()
    for r in rows:
        assert r.n >= 1
        # overshoot bounded by one document
        assert r.total < budget + r.mx
    # partition-layout invariance: same selection at different parallelism
    ids_a = {r.id for r in out.collect()}
    ids_b = {
        r.id for r in smp.take_token_budget(df.repartition(13), "grp", "tokens", budget, "id").collect()
    }
    assert ids_a == ids_b
    with pytest.raises(ValueError):
        smp.take_token_budget(df, "grp", "tokens", 0, "id")


def test_scrub_pii_parenthesized_phone_and_date_safety(spark):
    from bohemia_kenya_data_pipeline_spark.operators import text as tx

    df = spark.createDataFrame(
        [
            (1, "call (555) 123-4567 now"),
            (2, "intl +1 (650) 253-0000 line"),
            (3, "window 2026-08-14 end"),
            (4, "order 12345678 qty 42"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.text for r in tx.scrub_pii(df).collect()}
    # two-separator phone formats (') ' between area code and number)
    # must redact
    assert out[1] == "call (<PHONE> now"
    assert "<PHONE>" in out[2]
    # a single ISO date (8 digits) and short IDs survive
    assert out[3] == "window 2026-08-14 end"
    assert out[4] == "order 12345678 qty 42"


def test_split_by_hash_tolerates_float_weight_accumulation(spark):
    from bohemia_kenya_data_pipeline_spark.operators import sampling as smp

    df = spark.range(100).withColumnRenamed("id", "k")
    # weights whose normalized cumulative sum exceeds 1.0 by an ulp
    weights = {
        "a": 0.49406335015526,
        "b": 0.31002636969,
        "c": 0.96307329432,
        "d": 0.23918684932,
        "e": 0.66677528676,
        "f": 1.33e-16,
    }
    out = smp.split_by_hash(df, "k", weights)
    assert out.count() == 100
    labels = {r.split for r in out.select("split").distinct().collect()}
    assert labels <= set(weights)


# ---------------------------------------------------------------------------
# weighted_sample_top_k (A-ES weighted sampling without replacement)
# ---------------------------------------------------------------------------


def test_weighted_sample_deterministic_and_partition_invariant(spark):
    from pyspark.sql import functions as F

    from bohemia_kenya_data_pipeline_spark.operators import sampling as smp

    df = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") % 7 + 1).cast("double").alias("w")
    )
    a = {r.k for r in smp.weighted_sample_top_k(df, "k", "w", 50).collect()}
    b = {
        r.k
        for r in smp.weighted_sample_top_k(df.repartition(13), "k", "w", 50).collect()
    }
    assert a == b and len(a) == 50


def test_weighted_sample_favors_heavy_rows(spark):
    from pyspark.sql import functions as F

    from bohemia_kenya_data_pipeline_spark.operators import sampling as smp

    light = spark.range(0, 1000).select(F.col("id").alias("k"), F.lit(1.0).alias("w"))
    heavy = spark.range(1000, 1010).select(
        F.col("id").alias("k"), F.lit(1000.0).alias("w")
    )
    got = smp.weighted_sample_top_k(light.unionByName(heavy), "k", "w", 10)
    n_heavy = got.filter(F.col("k") >= 1000).count()
    assert n_heavy >= 7  # deterministic; w=1000 rows should dominate top-10


def test_weighted_sample_zero_null_weights_excluded(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, None), (4, 5.0)], "k int, w double"
    )
    from bohemia_kenya_data_pipeline_spark.operators import sampling as smp

    got = [r.k for r in smp.weighted_sample_top_k(df, "k", "w", 10).collect()]
    assert got == [4]


def test_weighted_sample_per_stratum_k(spark):
    from pyspark.sql import functions as F

    from bohemia_kenya_data_pipeline_spark.operators import sampling as smp

    df = spark.range(0, 90).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("g"),
        F.lit(2.0).alias("w"),
    )
    got = smp.weighted_sample_top_k(df, "k", "w", 5, strata_cols=["g"])
    per = {r.g: r.n for r in got.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert per == {"0": 5, "1": 5, "2": 5}


# ---------------------------------------------------------------------------
# Temperature mixture resampling
# ---------------------------------------------------------------------------


def _skewed(spark):
    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(25)]
    return spark.createDataFrame(rows, ["doc_id", "grp"])


def test_temperature_rates_flatten_mixture(spark):
    from bohemia_kenya_data_pipeline_spark.operators import sampling as smp

    rates = {
        r.grp: r.rate
        for r in smp.temperature_mix_rates(
            _skewed(spark), "grp", alpha=0.5, budget_frac=0.5
        ).collect()
    }
    # alpha<1 up-weights the rare group: its keep RATE must exceed the
    # dominant group's
    assert rates["small"] > rates["big"]
    # alpha=1 keeps natural proportions: every group gets the budget rate
    nat = {
        r.grp: r.rate
        for r in smp.temperature_mix_rates(
            _skewed(spark), "grp", alpha=1.0, budget_frac=0.5
        ).collect()
    }
    assert abs(nat["big"] - 0.5) < 1e-12 and abs(nat["small"] - 0.5) < 1e-12


def test_temperature_rate_clamps_at_one(spark):
    from bohemia_kenya_data_pipeline_spark.operators import sampling as smp

    # alpha=0 gives equal weight per group; the tiny group's target
    # (overall_budget/2 = 106 rows) exceeds its 25 members -> clamp
    rates = {
        r.grp: r.rate
        for r in smp.temperature_mix_rates(
            _skewed(spark), "grp", alpha=0.0, budget_frac=0.5
        ).collect()
    }
    assert rates["small"] == 1.0
    sampled = smp.temperature_mix(_skewed(spark), "doc_id", "grp", 0.0, 0.5)
    small = sampled.filter("grp = 'small'").count()
    assert small == 25  # clamped group kept whole


def test_temperature_mix_partition_invariant(spark):
    from bohemia_kenya_data_pipeline_spark.operators import sampling as smp

    df = _skewed(spark)
    a = smp.temperature_mix(df.coalesce(1), "doc_id", "grp", 0.5, 0.4)
    b = smp.temperature_mix(df.repartition(13), "doc_id", "grp", 0.5, 0.4)
    assert sorted(r.doc_id for r in a.collect()) == sorted(
        r.doc_id for r in b.collect()
    )


def test_temperature_mix_hits_budget_approximately(spark):
    from bohemia_kenya_data_pipeline_spark.operators import sampling as smp

    df = _skewed(spark)
    n = smp.temperature_mix(df, "doc_id", "grp", 0.5, 0.5).count()
    assert abs(n - 0.5 * 425) < 0.12 * 425  # hash-binomial tolerance


def test_cap_per_group_keeps_whole_small_groups(spark):
    from bohemia_kenya_data_pipeline_spark.operators import sampling as smp

    rows = [(i, "big") for i in range(20)] + [(100 + i, "small") for i in range(3)]
    df = spark.createDataFrame(rows, ["k", "g"])
    out = smp.cap_per_group(df, "g", "k", 5)
    got = {g: 0 for g in ("big", "small")}
    for r in out.collect():
        got[r.g] += 1
    assert got == {"big": 5, "small": 3}


def test_cap_per_group_deterministic_and_partition_invariant(spark):
    from bohemia_kenya_data_pipeline_spark.operators import sampling as smp

    rows = [(i, i % 4) for i in range(200)]
    df = spark.createDataFrame(rows, ["k", "g"])
    a = sorted(r.k for r in smp.cap_per_group(df.coalesce(1), "g", "k", 7).collect())
    b = sorted(r.k for r in smp.cap_per_group(df.repartition(11), "g", "k", 7).collect())
    assert a == b and len(a) == 28
