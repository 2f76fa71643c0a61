"""Persistent ANN index (jobs.retrieval): exact parity with ivf_topk,
file-level partition pruning on the probed centroids, sidecar
round-trip."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from bohemia_kenya_data_pipeline_spark.jobs import retrieval as rt
from bohemia_kenya_data_pipeline_spark.operators import similarity as sim


def _toy_corpus(spark, n=400, dim=8):
    return spark.range(1, n + 1).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda j: ((F.col("id") * 37 + j * 11) % 19 - 9.0) / 9.0,
        ).alias("embedding"),
    )


def test_index_query_matches_ivf_topk_exactly(spark, tmp_path):
    corpus = _toy_corpus(spark)
    queries = corpus.filter(F.col("vec_id") % 40 == 0)
    path = str(tmp_path / "idx")
    cents = rt.build_ann_index(corpus, path, n_centroids=4, n_iters=3)
    got = rt.query_ann_index(spark, path, queries, k=5, n_probe=2)
    want = sim.ivf_topk(
        corpus, queries, k=5, n_centroids=4, n_probe=2, centroids=cents
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # sidecar round-trips the exact centroids
    assert rt.load_ann_centroids(spark, path) == [list(map(float, c)) for c in cents]


def test_index_scan_prunes_unprobed_partitions(spark, tmp_path):
    corpus = _toy_corpus(spark)
    queries = corpus.filter(F.col("vec_id") == 40)  # one query: n_probe dirs
    path = str(tmp_path / "idx2")
    cents = rt.build_ann_index(corpus, path, n_centroids=4, n_iters=3)
    assert len(glob.glob(f"{path}/cid=*")) == 4  # all buckets materialized
    out = rt.query_ann_index(spark, path, queries, k=3, n_probe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the probed-cid filter reaches the scan as a PARTITION filter
    # (directory-level skip), not a post-scan row filter
    assert "PartitionFilters" in plan and "cid" in plan.split("PartitionFilters", 1)[1][:200]
    assert out.count() == 3


def test_index_build_accepts_pretrained_and_drops_nulls(spark, tmp_path):
    corpus = _toy_corpus(spark, n=50).unionByName(
        spark.createDataFrame([(999, None)], "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    )
    path = str(tmp_path / "idx3")
    cents = [[1.0] + [0.0] * 7, [0.0] * 7 + [1.0]]
    out = rt.build_ann_index(corpus, path, centroids=cents)
    assert out == cents
    stored = spark.read.parquet(path)
    assert stored.count() == 50  # NULL embedding never indexed
    assert stored.filter(F.col("vec_id") == 999).count() == 0


def test_extend_ann_index_equals_rebuild(spark, tmp_path):
    corpus = _toy_corpus(spark, n=300)
    late = _toy_corpus(spark, n=400).filter(F.col("vec_id") > 300)
    queries = corpus.filter(F.col("vec_id") % 60 == 0)
    path = str(tmp_path / "idx_grow")
    cents = rt.build_ann_index(corpus, path, n_centroids=4, n_iters=3)
    rt.extend_ann_index(late, path)
    got = rt.query_ann_index(spark, path, queries, k=5, n_probe=2)
    # a rebuild over the full corpus with the SAME centroids must agree
    path2 = str(tmp_path / "idx_full")
    rt.build_ann_index(_toy_corpus(spark, n=400), path2, centroids=cents)
    want = rt.query_ann_index(spark, path2, queries, k=5, n_probe=2)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert spark.read.parquet(path).count() == 400
