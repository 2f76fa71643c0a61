"""Schema-drift reconciliation on read (catalog.read_parquet_evolving):
missing-column backfill, lossless widening in the vectorized reader,
loud scan-time failure on anything else, and extra-column policy."""

from __future__ import annotations

import pytest
from py4j.protocol import Py4JJavaError
from pyspark.errors import PySparkException
from pyspark.sql import functions as F

from bohemia_kenya_data_pipeline_spark import catalog as cat

CONTRACT = "doc_id BIGINT, score DOUBLE, lang STRING, n_chars BIGINT"


@pytest.fixture()
def drifted_dir(spark, tmp_path):
    d = str(tmp_path / "landing")
    # era 1: before `lang`/`n_chars` existed; narrower numeric types
    spark.createDataFrame(
        [(1, 0.5), (2, 1.5)], "doc_id INT, score FLOAT"
    ).write.mode("append").parquet(d)
    # era 2: full contract plus a producer-side extra column
    spark.createDataFrame(
        [(3, 2.5, "en", 10, "x")],
        "doc_id BIGINT, score DOUBLE, lang STRING, n_chars BIGINT, extra STRING",
    ).write.mode("append").parquet(d)
    return d


def test_drift_reconciles_to_contract(spark, drifted_dir):
    df = cat.read_parquet_evolving(spark, drifted_dir, CONTRACT)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("doc_id", "bigint"), ("score", "double"),
        ("lang", "string"), ("n_chars", "bigint"),
    ]
    got = sorted(map(tuple, df.collect()))
    # era-1 rows: widened numerics (int->bigint, float->double inside
    # the reader), typed NULLs for the late columns
    assert got == [
        (1, 0.5, None, None),
        (2, 1.5, None, None),
        (3, 2.5, "en", 10),
    ]


def test_extra_column_policies(spark, tmp_path):
    # same-typed shards (mergeSchema footer pass requires it), one
    # carrying a producer extra
    d = str(tmp_path / "extras")
    spark.createDataFrame([(1, 0.5)], "doc_id BIGINT, score DOUBLE").write.mode(
        "append"
    ).parquet(d)
    spark.createDataFrame(
        [(2, 1.5, "x")], "doc_id BIGINT, score DOUBLE, extra STRING"
    ).write.mode("append").parquet(d)
    contract = "doc_id BIGINT, score DOUBLE"
    kept = cat.read_parquet_evolving(spark, d, contract, on_extra="keep")
    assert kept.columns == ["doc_id", "score", "extra"]
    assert sorted((r.extra for r in kept.collect()), key=str) == [None, "x"]
    dropped = cat.read_parquet_evolving(spark, d, contract)
    assert dropped.columns == ["doc_id", "score"]
    with pytest.raises(ValueError, match="unexpected columns.*extra"):
        cat.read_parquet_evolving(spark, d, contract, on_extra="fail")
    with pytest.raises(ValueError, match="on_extra"):
        cat.read_parquet_evolving(spark, d, contract, on_extra="nope")


def test_incompatible_drift_fails_loud_at_scan(spark, tmp_path):
    d = str(tmp_path / "bad")
    spark.createDataFrame([(1, "abc")], "doc_id BIGINT, score STRING").write.parquet(d)
    # string -> double is NOT a widening: the scan fails naming the
    # file — never silent NULLs
    with pytest.raises((Py4JJavaError, PySparkException), match="DATA_TYPE_MISMATCH"):
        cat.read_parquet_evolving(spark, d, "doc_id BIGINT, score DOUBLE").collect()
    # narrowing direction equally refused
    with pytest.raises((Py4JJavaError, PySparkException), match="DATA_TYPE_MISMATCH"):
        cat.read_parquet_evolving(spark, d, "doc_id INT, score STRING").collect()


def test_contract_pushdown_survives_reconciliation(spark, drifted_dir):
    q = cat.read_parquet_evolving(spark, drifted_dir, CONTRACT).filter(
        F.col("doc_id") == 3
    ).select("doc_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "doc_id" in plan
    assert [r.doc_id for r in q.collect()] == [3]
