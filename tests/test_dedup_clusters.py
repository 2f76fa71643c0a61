"""Connected-components / near-dup cluster tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bohemia_kenya_data_pipeline_spark.operators import dedup


def _pairs(spark, edges):
    return spark.createDataFrame(edges, ["id_a", "id_b"])


def test_chain_is_one_component(spark):
    # 1-2-3-4-5 chain: transitivity must collapse to component 1 even
    # though (1,5) was never a pair
    comps = dedup.connected_components(_pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]))
    got = {r.id: r.component for r in comps.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_two_components_stay_separate(spark):
    comps = dedup.connected_components(_pairs(spark, [(1, 2), (2, 3), (10, 11)]))
    got = {r.id: r.component for r in comps.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_edge_direction_irrelevant(spark):
    a = dedup.connected_components(_pairs(spark, [(2, 1), (3, 2)]))
    b = dedup.connected_components(_pairs(spark, [(1, 2), (2, 3)]))
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_nonconvergence_raises(spark):
    long_chain = [(i, i + 1) for i in range(1, 30)]
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(_pairs(spark, long_chain), max_iters=3)


def test_drop_neardup_clusters_keeps_representatives(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 8)], ["doc_id", "text"]
    )
    pairs = _pairs(spark, [(1, 2), (2, 3), (5, 6)])
    kept = sorted(
        r.doc_id for r in dedup.drop_neardup_clusters(docs, pairs).collect()
    )
    # clusters {1,2,3} -> keep 1; {5,6} -> keep 5; 4 and 7 unpaired
    assert kept == [1, 4, 5, 7]


def test_incremental_dedup_null_text_and_store(spark):
    from pyspark.sql import functions as F

    from bohemia_kenya_data_pipeline_spark.operators.dedup import (
        incremental_exact_dedup,
    )

    batch = spark.createDataFrame(
        [(1, "alpha"), (2, None), (3, None), (4, "beta")], "doc_id INT, text STRING"
    )
    history = spark.createDataFrame([("x",)], "content_hash STRING").withColumn(
        "content_hash", F.md5(F.lit("beta"))
    ).select("content_hash")
    accepted, new_hashes = incremental_exact_dedup(batch, history)
    ids = sorted(r.doc_id for r in accepted.collect())
    # beta rejected by the store; ONE representative of the NULL-text
    # group kept (min id), consistent with drop_exact_duplicates
    assert ids == [1, 2]
    # the store never receives NULL hashes
    assert all(r.content_hash is not None for r in new_hashes.collect())


def test_dedup_lines_keep_first(spark):
    from bohemia_kenya_data_pipeline_spark.operators import text as tx

    df = spark.createDataFrame(
        [
            (1, "cookie banner\nunique one\ncookie banner"),
            (2, "cookie banner\nunique two"),
            (3, "cookie banner"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.text for r in tx.dedup_lines(df).collect()}
    # first occurrence survives; later copies (cross-doc AND the
    # within-doc repeat in doc 1) are removed
    assert out[1] == "cookie banner\nunique one"
    assert out[2] == "unique two"
    # doc 3 lost its only line -> empty string, row preserved
    assert out[3] == ""


def test_dedup_lines_drop_common(spark):
    from bohemia_kenya_data_pipeline_spark.operators import text as tx

    df = spark.createDataFrame(
        [
            (1, "boiler\nkeep a\nboiler"),
            (2, "boiler\nkeep b"),
            (3, "boiler\nkeep c"),
            (4, "pair\nkeep d"),
            (5, "pair\nkeep e"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r.text
        for r in tx.dedup_lines(df, policy="drop_common", max_doc_count=2).collect()
    }
    # 'boiler' appears in 3 docs (> 2): removed everywhere, including
    # both copies inside doc 1; 'pair' (2 docs, at threshold) stays
    assert out[1] == "keep a"
    assert out[2] == "keep b"
    assert out[3] == "keep c"
    assert out[4] == "pair\nkeep d"
    assert out[5] == "pair\nkeep e"


def test_dedup_lines_partition_invariance_and_validation(spark):
    import pytest as _pytest

    from bohemia_kenya_data_pipeline_spark.operators import text as tx

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("shared header\nbody "), F.col("id").cast("string")
        ).alias("text"),
    )
    a = {r.doc_id: r.text for r in tx.dedup_lines(df).collect()}
    b = {r.doc_id: r.text for r in tx.dedup_lines(df.repartition(17)).collect()}
    assert a == b
    assert a[0] == "shared header\nbody 0"
    assert a[5] == "body 5"
    with _pytest.raises(ValueError):
        tx.dedup_lines(df, policy="nope")


def test_edit1_pairs_complete_vs_bruteforce(spark):
    """The deletion-neighborhood generator must find EXACTLY the
    brute-force levenshtein<=1 pairs: substitutions, inserts, deletes
    in; transpositions and ed=2 out."""
    words = [
        "nguzo", "nguz0", "nguzzo", "nguo", "kwale", "kwal", "ab", "ba",
        "x", "", "same", "same1",
    ]
    df = spark.createDataFrame(list(enumerate(words)), ["id", "w"])
    got = set(map(tuple, dedup.edit1_pairs(df, "w", "id").collect()))

    def lev(a, b):
        import functools

        @functools.lru_cache(maxsize=None)
        def d(i, j):
            if i == 0 or j == 0:
                return i + j
            return min(
                d(i - 1, j) + 1,
                d(i, j - 1) + 1,
                d(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
            )
        return d(len(a), len(b))

    expect = {
        (i, j)
        for i in range(len(words))
        for j in range(i + 1, len(words))
        if lev(words[i], words[j]) <= 1
    }
    assert got == expect
    assert (6, 7) not in got  # 'ab'/'ba' transposition is ed 2


def test_edit1_pairs_max_len_skips_not_truncates(spark):
    df = spark.createDataFrame(
        [(1, "a" * 70), (2, "a" * 70), (3, "short"), (4, "shorn")], ["id", "w"]
    )
    got = set(map(tuple, dedup.edit1_pairs(df, "w", "id", max_len=64).collect()))
    # long strings are skipped entirely (even identical ones); the
    # short substitution pair is still found
    assert got == {(3, 4)}


def test_drop_exact_duplicates_best_keeps_highest_quality(spark):
    df = spark.createDataFrame(
        [(1, "same text", 5.0), (2, "same text", 9.0), (3, "same text", 9.0),
         (4, "other", 1.0)],
        ["doc_id", "text", "score"],
    )
    kept = dedup.drop_exact_duplicates_best(df, quality_col="score")
    got = sorted(r.doc_id for r in kept.collect())
    # highest score wins; tie between 2 and 3 breaks on min id
    assert got == [2, 4]
