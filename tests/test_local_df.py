"""session.local_df: the JVM-literal (LocalTableScan) replacement for
``spark.createDataFrame(list, schema)`` — r14 optimization.

The classic list path builds an RDD-backed plan whose scan re-enters a
Python worker at execution time (measured 0.3-4.5 s of blocked wait per
task that touches it); ``local_df`` routes through pandas/Arrow and must
produce (a) a plan with no Python stage and (b) rows identical to the
classic path for every shape the engine stores in sidecars, manifests
and literal query inputs.
"""

from __future__ import annotations

import pytest

from bohemia_kenya_data_pipeline_spark.session import local_df


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


SHAPES = [
    # (rows, schema) — every call-site shape in the package
    ([("f1", 10, 20), ("f2", 11, 21)], "_file STRING, _size BIGINT, _mtime BIGINT"),
    ([(0, [1.0, 2.0]), (1, [3.5, -4.0])], "cid INT, cv ARRAY<DOUBLE>"),
    ([(0, 1, [0.5])], "m INT, k INT, cw ARRAY<DOUBLE>"),
    ([(0.25,), (0.5,)], "q DOUBLE"),
    ([(1, None, 3, True, 0.5)], "a BIGINT, psi DOUBLE, n BIGINT, f BOOLEAN, s DOUBLE"),
    ([("NATION_2",)], "node string"),
]


@pytest.mark.parametrize("rows,schema", SHAPES)
def test_matches_classic_createdataframe(spark, rows, schema):
    got = local_df(spark, rows, schema)
    want = spark.createDataFrame(rows, schema)
    assert got.schema == want.schema
    assert got.collect() == want.collect()
    assert "LocalTableScan" in _plan(got)
    # the point of the helper: no Python-runner stage in the plan
    assert "Scan ExistingRDD" not in _plan(got)


def test_column_name_list_schema(spark):
    rows = [("q1", "hello"), ("q2", "world")]
    got = local_df(spark, rows, ["query_id", "query_text"])
    want = spark.createDataFrame(rows, ["query_id", "query_text"])
    assert got.schema == want.schema
    assert got.collect() == want.collect()
    assert "LocalTableScan" in _plan(got)


def test_inferred_types_match_classic(spark):
    rows = [(1, 2.5, "x", True)]
    got = local_df(spark, rows, ["a", "b", "c", "d"])
    want = spark.createDataFrame(rows, ["a", "b", "c", "d"])
    assert got.dtypes == want.dtypes  # int->bigint, float->double, ...


def test_empty_with_ddl_schema(spark):
    got = local_df(spark, [], "k STRING, valid_from DATE, valid_to DATE")
    want = spark.createDataFrame([], "k STRING, valid_from DATE, valid_to DATE")
    assert got.schema.fieldNames() == want.schema.fieldNames()
    assert [f.dataType for f in got.schema.fields] == [
        f.dataType for f in want.schema.fields
    ]
    assert got.collect() == []
    # the empty path must stay JVM-only too (range(0) projection)
    assert "Scan ExistingRDD" not in _plan(got)


def test_joins_and_broadcasts_like_a_literal(spark):
    # the optimizer must see a sized literal it can broadcast: the
    # manifest fingerprint join (skipping._stats_rows) depends on it
    from pyspark.sql import functions as F

    big = spark.range(1000).select(
        F.concat(F.lit("f"), (F.col("id") % 8).cast("string")).alias("_file"),
        F.col("id").alias("v"),
    )
    fp = local_df(
        spark,
        [(f"f{i}", i, i) for i in range(8)],
        "_file STRING, _size BIGINT, _mtime BIGINT",
    )
    out = fp.join(big.groupBy("_file").count(), "_file", "left")
    assert out.count() == 8
