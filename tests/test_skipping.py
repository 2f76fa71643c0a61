"""File-manifest data skipping (operators/skipping.py): pruning must
actually drop files, and the pruned read must equal the full scan +
filter bit-for-bit (min/max soundness, bloom no-false-negatives,
exact re-verification of false positives)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bohemia_kenya_data_pipeline_spark.operators import skipping as skp


def _clustered_table(spark, tmp_path, n=10_000, files=8):
    # range-clustered on k, one file per range bucket — the layout a
    # time/keyed 100 TB table gets from its ingest sort
    path = str(tmp_path / "tbl")
    df = spark.range(1, n + 1).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("v"),
        F.concat(F.lit("row_"), F.col("id")).alias("payload"),
    )
    df.repartitionByRange(files, "k").write.mode("overwrite").parquet(path)
    return path, df


def test_range_prune_drops_files_and_result_is_exact(spark, tmp_path):
    path, df = _clustered_table(spark, tmp_path)
    skp.build_file_manifest(spark, path, ["k", "v"])
    preds = [("k", "between", (2000, 2999))]
    kept, total = skp.prune_files(spark, path, preds)
    assert total == 8
    # a 10% key slice of a range-clustered layout touches 1-2 files
    assert 1 <= len(kept) <= 2
    got = skp.read_with_skipping(spark, path, preds)
    want = spark.read.parquet(path).filter(F.col("k").between(2000, 2999))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_every_range_op_is_sound(spark, tmp_path):
    path, _ = _clustered_table(spark, tmp_path, n=2_000, files=4)
    skp.build_file_manifest(spark, path, ["k"])
    full = spark.read.parquet(path)
    cases = [
        ([("k", "=", 1500)], F.col("k") == 1500),
        ([("k", "<", 300)], F.col("k") < 300),
        ([("k", "<=", 300)], F.col("k") <= 300),
        ([("k", ">", 1700)], F.col("k") > 1700),
        ([("k", ">=", 1700)], F.col("k") >= 1700),
    ]
    for preds, col_pred in cases:
        got = skp.read_with_skipping(spark, path, preds)
        want = full.filter(col_pred)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), preds


def test_empty_prune_returns_schema_stable_empty(spark, tmp_path):
    path, _ = _clustered_table(spark, tmp_path, n=500, files=2)
    skp.build_file_manifest(spark, path, ["k"])
    out = skp.read_with_skipping(spark, path, [("k", ">", 10_000_000)])
    assert out.count() == 0
    assert out.columns == spark.read.parquet(path).columns


def test_all_null_stats_file_drops_safely(spark, tmp_path):
    path = str(tmp_path / "tbln")
    a = spark.range(1, 101).select(F.col("id").alias("k"), F.lit("a").alias("s"))
    b = spark.createDataFrame(
        [(None, "b")] * 50, "k BIGINT, s STRING"
    )
    a.coalesce(1).write.mode("overwrite").parquet(path)
    b.coalesce(1).write.mode("append").parquet(path)
    skp.build_file_manifest(spark, path, ["k"])
    kept, total = skp.prune_files(spark, path, [("k", ">=", 1)])
    assert total == 2 and len(kept) == 1  # all-NULL file pruned
    got = skp.read_with_skipping(spark, path, [("k", ">=", 1)])
    want = spark.read.parquet(path).filter(F.col("k") >= 1)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bloom_prunes_files_for_clustered_keys(spark, tmp_path):
    path, df = _clustered_table(spark, tmp_path)
    skp.build_file_manifest(spark, path, ["k"], bloom_col="k")
    # probe keys all live in one range bucket
    keys = spark.range(4100, 4150).select(F.col("id").alias("k"))
    cand = skp.bloom_candidate_files(spark, path, keys, "k")
    assert 1 <= len(cand) <= 2
    got = skp.read_with_skipping(spark, path, in_keys=("k", keys))
    want = spark.read.parquet(path).join(
        F.broadcast(keys), "k", "semi"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bloom_has_no_false_negatives_exhaustive(spark, tmp_path):
    # every stored key must be found — probe ALL keys, tiny bitmap to
    # force false positives, exact semi join must still repair them
    path, df = _clustered_table(spark, tmp_path, n=1_000, files=4)
    skp.build_file_manifest(
        spark, path, ["k"], bloom_col="k", n_bits=1 << 10, n_hashes=3
    )
    keys = spark.range(1, 1_001).select(F.col("id").alias("k"))
    got = skp.read_with_skipping(spark, path, in_keys=("k", keys))
    assert got.count() == 1_000


def test_range_and_bloom_compose(spark, tmp_path):
    path, _ = _clustered_table(spark, tmp_path)
    skp.build_file_manifest(spark, path, ["k", "v"], bloom_col="k")
    keys = spark.range(3000, 3011).select(F.col("id").alias("k"))
    got = skp.read_with_skipping(
        spark, path, [("v", "<", 50)], in_keys=("k", keys)
    )
    want = (
        spark.read.parquet(path)
        .filter(F.col("v") < 50)
        .join(F.broadcast(keys), "k", "semi")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_guards(spark, tmp_path):
    path, _ = _clustered_table(spark, tmp_path, n=200, files=2)
    skp.build_file_manifest(spark, path, ["k"])
    with pytest.raises(ValueError, match="no min/max stats"):
        skp.prune_files(spark, path, [("v", ">", 1)])
    with pytest.raises(ValueError, match="unsupported op"):
        skp.read_with_skipping(spark, path, [("k", "!=", 1)])
    with pytest.raises(ValueError, match="without a bloom"):
        skp.bloom_candidate_files(
            spark, path, spark.range(3).select(F.col("id").alias("k")), "k"
        )
    with pytest.raises(ValueError, match="predicates and/or in_keys"):
        skp.read_with_skipping(spark, path)
    with pytest.raises(ValueError, match="at least one stats column"):
        skp.build_file_manifest(spark, path, [])
    params = skp.read_manifest_params(spark, path)
    assert params["stats_cols"] == ["k"] and params["bloom_col"] is None
