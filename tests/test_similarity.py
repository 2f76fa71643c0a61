"""Goldens for the ANN paths: IVF recall in the approximate regime and
exactness in the exhaustive regime (the oracle covers exhaustive at
sf0.01; these run at sf0.001 for speed)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bohemia_kenya_data_pipeline_spark.operators import similarity as sim
from tests.conftest import SF_DIR


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_ivf_exhaustive_probe_equals_exact(spark):
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = {
        (r.query_id, r.neighbor_id, r.score, r.rank)
        for r in sim.cosine_topk(emb, queries, k=5).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id, r.score, r.rank)
        for r in sim.ivf_topk(emb, queries, k=5, n_centroids=4, n_probe=4, n_iters=2).collect()
    }
    assert exact == ivf


def test_ivf_approximate_recall(spark):
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = sim.cosine_topk(emb, queries, k=5).collect()
    truth = {(r.query_id, r.neighbor_id) for r in exact}
    got = {
        (r.query_id, r.neighbor_id)
        for r in sim.ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=4, n_iters=3).collect()
    }
    recall = len(truth & got) / len(truth)
    # probing half the buckets on clustered data should recover most
    # true neighbors; the bound is intentionally loose (synthetic
    # near-uniform embeddings are ANN's worst case)
    assert recall >= 0.4, recall


def test_ivf_training_deterministic(spark):
    emb = _emb(spark)
    c1 = sim.ivf_train_centroids(emb, n_centroids=4, n_iters=2)
    c2 = sim.ivf_train_centroids(emb.repartition(7), n_centroids=4, n_iters=2)
    assert c1 == c2  # partition-invariant: same init order, same means


def test_ivf_corpus_rows_assigned_once(spark):
    # every corpus vector belongs to exactly one inverted list — a
    # query probing all lists sees each neighbor exactly once
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    out = sim.ivf_topk(emb, queries, k=5, n_centroids=4, n_probe=4, n_iters=1)
    pairs = out.groupBy("query_id", "neighbor_id").count().filter(F.col("count") > 1)
    assert pairs.count() == 0


def test_ivf_sampled_training_recall_parity(spark):
    # the 100 TB training knob: centroids trained on a 30% hash-sample
    # must give approximate-regime recall within tolerance of
    # full-corpus training (centroid quality needs representativeness,
    # not the full corpus)
    import pytest

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = sim.cosine_topk(emb, queries, k=5).collect()
    truth = {(r.query_id, r.neighbor_id) for r in exact}

    def recall(train_fraction):
        got = {
            (r.query_id, r.neighbor_id)
            for r in sim.ivf_topk(
                emb, queries, k=5, n_centroids=8, n_probe=4, n_iters=3,
                train_fraction=train_fraction,
            ).collect()
        }
        return len(truth & got) / len(truth)

    full, sampled = recall(None), recall(0.3)
    assert sampled >= full - 0.15, (full, sampled)

    # sample too thin to seed n_centroids distinct vectors -> loud error
    tiny = emb.limit(40)
    with pytest.raises(ValueError, match="train_fraction"):
        sim.ivf_train_centroids(tiny, n_centroids=8, n_iters=1, train_fraction=0.01)
    # out-of-range fraction -> loud error
    with pytest.raises(ValueError, match="train_fraction"):
        sim.ivf_train_centroids(emb, n_centroids=4, train_fraction=1.5)


def test_ivf_sampled_training_deterministic(spark):
    emb = _emb(spark)
    c1 = sim.ivf_train_centroids(emb, n_centroids=4, n_iters=2, train_fraction=0.5)
    c2 = sim.ivf_train_centroids(
        emb.repartition(7), n_centroids=4, n_iters=2, train_fraction=0.5
    )
    assert c1 == c2  # hash-sample is partition-invariant
