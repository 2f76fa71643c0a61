"""Empty-input robustness probes (round 7): a 100 TB pipeline stage
routinely receives an empty upstream frame (a filter that matched
nothing, a fresh partition, a quarantined batch). The contract probed
here: every operator either returns an EMPTY frame with its normal
schema or raises a CLEAR ValueError — never a cryptic IndexError /
TypeError from an unguarded ``collect()[0]`` or driver-side reshape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bohemia_kenya_data_pipeline_spark.operators import dedup as dd
from bohemia_kenya_data_pipeline_spark.operators import similarity as sim
from bohemia_kenya_data_pipeline_spark.operators import text as tx
from bohemia_kenya_data_pipeline_spark.operators import windows as W


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id BIGINT, text STRING")


def _empty_emb(spark):
    return spark.createDataFrame([], "vec_id INT, embedding ARRAY<DOUBLE>")


def _some_emb(spark):
    return spark.createDataFrame(
        [(i, [float((i * 7 + j) % 5 - 2) for j in range(4)]) for i in range(6)],
        "vec_id INT, embedding ARRAY<DOUBLE>",
    )


def test_dedup_pair_generators_empty(spark):
    docs = _empty_docs(spark)
    assert dd.minhash_lsh_pairs(docs).count() == 0
    assert dd.ngram_jaccard_pairs(docs, threshold=0.5).count() == 0
    assert dd.embedding_neardup_pairs(_empty_emb(spark), dim=4).count() == 0


def test_rank_and_boundaries_empty(spark):
    df = spark.createDataFrame([], "v BIGINT, id BIGINT")
    n, bounds = W.rank_boundaries(df, {"k": ["v", "id"]}, num_partitions=4)
    assert n == 0 and bounds == {"k": []}
    out = W.distributed_global_rank(df, ["v", "id"], num_partitions=4)
    assert out.count() == 0
    assert "rn" in out.columns


def test_gap_fill_empty(spark):
    df = spark.createDataFrame([], "user_id BIGINT, ts TIMESTAMP, value DOUBLE")
    assert W.gap_fill_interpolate(df).count() == 0


def test_bm25_empty_corpus(spark):
    docs = _empty_docs(spark)
    qdf = spark.createDataFrame([(1, "hello world")], ["query_id", "query_text"])
    assert tx.bm25_topk(docs, qdf, k=5).count() == 0


def test_arrow_ann_empty_corpus_returns_empty(spark):
    emb = _some_emb(spark)
    empty = _empty_emb(spark)
    # non-empty queries against an empty corpus: no neighbors, no crash
    assert sim.cosine_topk_arrow(empty, emb, k=3).count() == 0
    assert sim.quantized_topk_arrow(empty, emb, k=3).count() == 0


def test_arrow_ann_empty_query_batch_is_loud(spark):
    emb = _some_emb(spark)
    empty = _empty_emb(spark)
    with pytest.raises(ValueError, match="empty query batch"):
        sim.cosine_topk_arrow(emb, empty, k=3)
    with pytest.raises(ValueError, match="empty query batch"):
        sim.quantized_topk_arrow(emb, empty, k=3)


def test_fold_ann_empty_inputs(spark):
    emb = _some_emb(spark)
    empty = _empty_emb(spark)
    assert sim.cosine_topk(empty, emb, k=3).count() == 0
    assert sim.cosine_topk(emb, empty, k=3).count() == 0
    assert sim.quantized_cosine_topk(empty, emb, k=3).count() == 0


def test_ivf_training_empty_corpus_is_loud_or_empty(spark):
    # training needs >= n_centroids vectors; an empty corpus must fail
    # with the documented thin-sample error, not a cryptic index error
    empty = _empty_emb(spark)
    with pytest.raises(ValueError):
        sim.ivf_train_centroids(empty, n_centroids=4, n_iters=1)


def test_text_quality_empty(spark):
    docs = _empty_docs(spark)
    assert tx.quality_features(docs).count() == 0
    assert tx.dedup_lines(docs).count() == 0


def test_round11_curation_operators_empty(spark):
    from bohemia_kenya_data_pipeline_spark.operators import clean as cl
    from bohemia_kenya_data_pipeline_spark.operators import multimodal as mmod
    from bohemia_kenya_data_pipeline_spark.operators import quality as ql
    from bohemia_kenya_data_pipeline_spark.operators import skew as sk

    # skew profile: empty fact -> empty profile, schema intact
    empty_k = spark.createDataFrame([], "k BIGINT")
    prof = sk.skew_profile(empty_k, "k")
    assert prof.count() == 0
    assert prof.columns == [
        "rank", "key", "n", "share_ppm", "cum_share_ppm",
        "salts_rec", "total_rows", "n_keys",
    ]

    # quantile gate: empty frame -> empty kept + empty report
    empty_s = spark.createDataFrame([], "src STRING, score BIGINT")
    kept, report = ql.group_quantile_gate(empty_s, "src", "score")
    assert kept.count() == 0 and report.count() == 0

    # k-anonymity: empty frame -> empty report; suppression keeps none
    assert cl.k_anonymity_report(empty_s, ["src"]).count() == 0
    assert cl.suppress_small_groups(empty_s, ["src"], k=2).count() == 0

    # multimodal transforms: empty payload frames flow through
    empty_b = spark.createDataFrame([], "doc_id BIGINT, payload BINARY")
    assert mmod.resize_images(empty_b, 4, 4).count() == 0
    assert mmod.resample_audio(empty_b, 8000).count() == 0
    assert mmod.audio_pcm_stats(empty_b).count() == 0


def test_classifier_empty_and_single_class_contract(spark):
    from bohemia_kenya_data_pipeline_spark.operators import text as tx2

    # empty corpus: no docs to score -> empty result, schema intact
    df = spark.createDataFrame([], "doc_id BIGINT, text STRING, pos BOOLEAN")
    out = tx2.quality_classifier_score(df, label=F.col("pos"))
    assert out.count() == 0
    assert out.columns == ["doc_id", "n_vocab_tokens", "score", "pred"]

    # single-class corpus: the prior ln(n_pos/n_neg) is undefined —
    # scores come back NULL (log of 0 / division by 0), never a crash;
    # documented contract: supply both classes
    one_cls = spark.createDataFrame(
        [(1, "a b", True), (2, "a", True)], "doc_id BIGINT, text STRING, pos BOOLEAN"
    )
    rows = tx2.quality_classifier_score(one_cls, label=F.col("pos")).collect()
    assert len(rows) == 2
    assert all(r.score is None for r in rows)


def test_curate_release_empty_and_degenerate_contract(spark):
    """Round-12 composed DAG: an empty corpus flows through the whole
    gate -> classify -> dedup -> pack chain as an empty frame with the
    contract schema; a single-class corpus (classifier prior
    undefined -> NULL scores -> pred never true) packs zero docs
    rather than crashing."""
    from bohemia_kenya_data_pipeline_spark.jobs import curate_release

    empty = spark.createDataFrame(
        [], "doc_id BIGINT, text STRING, source STRING, n_chars INT"
    )
    out = curate_release(empty)
    assert out.count() == 0
    assert out.columns == ["doc_id", "source", "n_tokens", "cum_tokens", "chunk_id"]

    one_cls = spark.createDataFrame(
        [(1, "alpha beta", "a", 400), (2, "gamma delta", "a", 500)],
        "doc_id BIGINT, text STRING, source STRING, n_chars INT",
    )
    assert curate_release(one_cls).count() == 0  # NULL pred -> all filtered


def test_zorder_fold_fresh_and_legacy_sidecar_contract(spark, tmp_path):
    """Round-12 fold: a freshly initialized table (one generation) is
    a no-op at any cap; a LEGACY sidecar without a generations field
    degrades to one base generation and also no-ops (never rewrites a
    table it cannot attribute)."""
    from bohemia_kenya_data_pipeline_spark.operators import (
        maintenance as mt,
        skipping as skp,
    )

    path = str(tmp_path / "zfresh")
    df = spark.range(500).select(
        (F.col("id") % 16).alias("a"), ((F.col("id") * 3) % 16).alias("b"),
        F.col("id").alias("v"),
    )
    mt.zorder_init(df, path, "a", "b", n_files=2, bits=4)
    rep = mt.zorder_fold(spark, path, max_generations=1)
    assert rep == {"folded": False, "recovered": False,
                   "n_generations": 1, "n_new_tiles": 0}

    # legacy sidecar: strip the generations field
    params = skp._read_json(spark, mt._zparams_path(path))
    params.pop("generations")
    skp._write_json(spark, mt._zparams_path(path), params)
    rep2 = mt.zorder_fold(spark, path, max_generations=1)
    assert rep2["folded"] is False and rep2["n_generations"] == 1
    assert spark.read.parquet(path).count() == 500
