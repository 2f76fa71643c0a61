"""Golden tests for quality.py: P8 name normalization (incl.
collisions), P9 empty-column drop, ragged detector consolidation."""

from __future__ import annotations

from bohemia_kenya_data_pipeline_spark.operators import quality as ql


def test_normalize_column_names_keeps_last_segment(spark):
    df = spark.createDataFrame(
        [(1, 2, 3)], ["group_a-sub-hhid", "group_b-extid", "plain"]
    )
    assert ql.normalize_column_names(df).columns == ["hhid", "extid", "plain"]


def test_normalize_column_names_disambiguates_collisions(spark):
    df = spark.createDataFrame([(1, 2)], ["a-x", "b-x"])
    assert ql.normalize_column_names(df).columns == ["x", "x_2"]


def test_drop_empty_columns(spark):
    df = spark.createDataFrame(
        [(1, None, "a"), (2, None, None)],
        "id int, all_null string, partial string",
    )
    out = ql.drop_empty_columns(df)
    assert out.columns == ["id", "partial"]
    assert out.count() == 2


def test_consolidate_ragged_union_and_contract(spark):
    d1 = spark.createDataFrame(
        [("k1", "f", "a1", "desc1", "w9")],
        "KEY string, form_id string, anomalies_id string, "
        "anomalies_description string, anomalies_reports_to_wid string",
    )
    d2 = spark.createDataFrame(
        [("k2", "f", "a2", "desc2")],
        "KEY string, form_id string, anomalies_id string, anomalies_description string",
    )
    out = ql.consolidate([d1, d2])
    rows = {r.resolution_id: r for r in out.collect()}
    assert set(rows) == {"f__k1__a1", "f__k2__a2"}
    # missing column NULL-filled then ''-normalized
    assert rows["f__k2__a2"].anomalies_reports_to_wid == ""
    assert rows["f__k1__a1"].anomalies_reports_to_wid == "w9"
    assert all(r.resolution_status == "to_do" for r in rows.values())


def test_normalize_names_collision_with_real_column(spark):
    # regression: disambiguated 'x_2' must not collide with a real x_2
    df = spark.createDataFrame([(1, 2, 3)], ["a-x", "b-x", "x_2"])
    cols = ql.normalize_column_names(df).columns
    assert len(set(cols)) == 3 and cols[0] == "x"


def test_detect_duplication_percent_in_column_name(spark):
    df = spark.createDataFrame([("k1", "v"), ("k2", "v")], ["KEY", "pct%done"])
    rows = ql.detect_duplication(df, "pct%done", "f", "dup").collect()
    assert len(rows) == 2
    assert rows[0].anomalies_description == "pct%done:v duplicated 2 times"


def test_detect_threshold_rejects_unknown_direction(spark):
    import pytest as _pytest

    df = spark.createDataFrame([("k", 1.0)], ["KEY", "v"])
    with _pytest.raises(ValueError, match="direction"):
        ql.detect_threshold(df, "v", "f", "a", "d", 0.5, direction="greater")


def test_inconsistent_group_counts_null_as_value(spark):
    from bohemia_kenya_data_pipeline_spark.operators import quality as ql

    df = spark.createDataFrame(
        [("h1", None, "k1"), ("h1", "5", "k2"), ("h2", "7", "k3"), ("h2", "7", "k4"),
         (None, "9", "k5")],
        ["hhid", "cluster", "KEY"],
    )
    out = ql.detect_inconsistent_group(df, "hhid", "cluster", "f", "multi")
    rows = {r.KEY for r in out.collect()}
    # {NULL, '5'} is a disagreement (R n_distinct counts NA); {7,7} is
    # not; NULL group keys never flag
    assert rows == {"h1"}


def test_data_dictionary_empty_table_zero_nulls(spark):
    from bohemia_kenya_data_pipeline_spark.operators import quality as ql

    empty = spark.createDataFrame([], "a INT, b STRING")
    rows = {r.column: r for r in ql.data_dictionary(empty).collect()}
    assert rows["a"].n_rows == 0 and rows["a"].n_null == 0
    assert rows["b"].n_null == 0
