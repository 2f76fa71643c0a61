"""Bucketed-table co-located join: write both join sides bucketed on
the join key and prove the join runs WITHOUT a shuffle — the
pre-partitioning strategy SCALING.md prescribes for repeated big-big
joins at 100 TB (pay the shuffle once at write time, never per query).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def warehouse_tables(spark, tmp_path):
    facts = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    dims = spark.range(1_000).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("tag")
    )
    for name, df in (("b_facts", facts), ("b_dims", dims)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # external table path: the warehouse dir is a static conf, so
        # point each bucketed table at the test tmp dir explicitly
        (
            df.write.bucketBy(8, "k")
            .sortBy("k")
            .option("path", str(tmp_path / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield "b_facts", "b_dims"
    for name in ("b_facts", "b_dims"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, warehouse_tables):
    facts, dims = warehouse_tables
    # disable broadcast so the co-location (not a broadcast) is what
    # avoids the exchange
    saved_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(facts).join(spark.table(dims), "k")
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("extended")
        )
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan
        # and it's actually correct
        assert joined.count() == 1_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved_threshold)


def test_bucketed_aggregate_has_no_shuffle(spark, warehouse_tables):
    facts, _ = warehouse_tables
    agg = spark.table(facts).groupBy("k").agg(F.sum("v").alias("s"))
    plan = agg._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("extended")
    )
    # groupBy on the bucket key reuses the write-time partitioning
    assert "Exchange hashpartitioning" not in plan, plan
    assert agg.count() == 10_000


def test_catalog_bucketed_api_roundtrip_no_shuffle(spark, tmp_path):
    from bohemia_kenya_data_pipeline_spark import catalog as cat

    df = spark.range(2000).selectExpr("id % 50 AS k", "id AS v")
    spark.sql("DROP TABLE IF EXISTS api_bucketed")
    cat.write_bucketed(df, "api_bucketed", ["k"], 8, str(tmp_path / "api_bucketed"))
    try:
        back = cat.read_bucketed(spark, "api_bucketed")
        assert back.count() == 2000
        agg = back.groupBy("k").count()
        plan = agg._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("extended")
        )
        assert "Exchange hashpartitioning" not in plan
        import pytest as _pytest

        with _pytest.raises(ValueError):
            cat.write_bucketed(df, "x", [], 8, str(tmp_path / "x"))
        with _pytest.raises(ValueError):
            cat.write_bucketed(df, "x", ["k"], 0, str(tmp_path / "x"))
    finally:
        spark.sql("DROP TABLE IF EXISTS api_bucketed")
