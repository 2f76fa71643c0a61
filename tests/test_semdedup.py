"""Semantic (embedding-cluster) dedup tests — SemDeDup-style.

The full pipeline (anchor seeding -> rounded-argmax assignment ->
within-cluster pairs -> threshold) is oracle-checked end-to-end by the
``semantic_dedup_pairs`` gate entry; these goldens cover the pieces an
oracle can't isolate: recall vs brute force inside a cluster, cap
semantics, the apply contract, and partition invariance.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bohemia_kenya_data_pipeline_spark.operators import dedup


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], ["vec_id", "embedding"]
    )


# two tight duplicate groups far apart, plus a loner
_GROUP_A = [(1, [1.0, 0.0, 0.0]), (2, [0.999, 0.01, 0.0]), (3, [0.998, 0.02, 0.0])]
_GROUP_B = [(10, [0.0, 1.0, 0.0]), (11, [0.0, 0.999, 0.01])]
_LONER = [(99, [0.0, 0.0, 1.0])]


def test_within_cluster_pairs_found(spark):
    emb = _emb(spark, _GROUP_A + _GROUP_B + _LONER)
    pairs = dedup.semantic_dedup_pairs(emb, n_anchors=3, threshold=0.99)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # every within-group pair found (clusters are data-adaptive: tight
    # duplicate groups land in one anchor bucket), no cross-group pair
    assert {(1, 2), (1, 3), (2, 3), (10, 11)} <= got
    assert all(a // 10 == b // 10 for a, b in got)


def test_anchors_are_deterministic(spark):
    emb = _emb(spark, _GROUP_A + _GROUP_B + _LONER)
    a1 = dedup.semantic_anchor_vectors(emb, n_anchors=3)
    a2 = dedup.semantic_anchor_vectors(emb.repartition(7), n_anchors=3)
    assert a1 == a2  # md5-seeded, partition-invariant


def test_assignment_tie_breaks_on_anchor_index(spark):
    # a vector equidistant from two identical anchors must take the
    # smaller anchor index (rounded scores tie exactly)
    emb = _emb(spark, [(1, [1.0, 0.0])])
    anchors = [[0.0, 1.0], [0.6, 0.8], [0.6, 0.8]]
    asg = dedup.assign_semantic_cluster(emb, anchors)
    assert asg.collect()[0].cid == 1


def test_cap_bounds_cluster_pairs(spark):
    # 6 near-identical vectors -> one cluster -> C(6,2)=15 pairs; a
    # cap of 3 keeps the deterministic min-id 3 -> C(3,2)=3 pairs
    rows = [(i, [1.0, 0.001 * i, 0.0]) for i in range(6)]
    emb = _emb(spark, rows)
    full = dedup.semantic_dedup_pairs(emb, n_anchors=2, threshold=0.99)
    capped = dedup.semantic_dedup_pairs(
        emb, n_anchors=2, threshold=0.99, max_cluster_size=3
    )
    assert full.count() == 15
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert got == {(0, 1), (0, 2), (1, 2)}


def test_drop_keeps_min_id_representative(spark):
    emb = _emb(spark, _GROUP_A + _GROUP_B + _LONER)
    kept = dedup.drop_semantic_dups(emb, n_anchors=3, threshold=0.99)
    assert sorted(r.vec_id for r in kept.collect()) == [1, 10, 99]


def test_cluster_stats_price_the_cap(spark):
    emb = _emb(spark, _GROUP_A + _GROUP_B + _LONER)
    stats = dedup.semantic_cluster_stats(emb, n_anchors=3, min_size=2)
    sizes = sorted(r.n_members for r in stats.collect())
    assert sizes == [2, 3]  # loner's singleton cluster filtered out


def test_partition_invariance(spark):
    emb = _emb(spark, _GROUP_A + _GROUP_B + _LONER)
    p1 = dedup.semantic_dedup_pairs(emb.coalesce(1), n_anchors=3, threshold=0.99)
    p7 = dedup.semantic_dedup_pairs(emb.repartition(7), n_anchors=3, threshold=0.99)
    assert sorted(map(tuple, p1.collect())) == sorted(map(tuple, p7.collect()))


def test_split_no_leakage_components_stay_together(spark):
    # components of near-identical docs must share a split label
    from bohemia_kenya_data_pipeline_spark.operators import dedup, sampling as smp
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, "grp%d" % (i // 3)) for i in range(30)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 30, 3)] + [(i + 1, i + 2) for i in range(0, 30, 3)],
        ["id_a", "id_b"],
    )
    comps = dedup.connected_components(pairs).withColumnRenamed("id", "doc_id")
    keyed = docs.join(comps, "doc_id", "left").withColumn(
        "split_key", F.coalesce("component", F.col("doc_id"))
    )
    out = smp.split_by_hash(keyed, "split_key", {"train": 0.8, "test": 0.2})
    per_comp = (
        out.groupBy("split_key")
        .agg(F.countDistinct("split").alias("n_labels"))
        .collect()
    )
    assert all(r.n_labels == 1 for r in per_comp)
    labels = {r.split for r in out.collect()}
    assert labels <= {"train", "test"}
