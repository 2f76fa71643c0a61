"""P2/O5 projection helper tests."""

from bohemia_kenya_data_pipeline_spark.operators import project as pj


def test_select_any_of_skips_missing(spark):
    df = spark.createDataFrame([(1, 2)], ["a", "b"])
    assert pj.select_any_of(df, ["b", "nope", "a"]).columns == ["b", "a"]


def test_select_matching(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["unused_x", "num_y", "other"])
    assert pj.select_matching(df, prefix="unused").columns == ["unused_x"]
    assert pj.select_matching(df, contains="num").columns == ["num_y"]
    assert pj.select_matching(df, regex="_(x|y)$").columns == ["unused_x", "num_y"]


def test_bind_cols_positional(spark):
    a = spark.createDataFrame([(1,), (2,)], ["x"])
    b = spark.createDataFrame([("p",), ("q",)], ["y"])
    got = {(r.x, r.y) for r in pj.bind_cols(a, b).collect()}
    assert got == {(1, "p"), (2, "q")}
