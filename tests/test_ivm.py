"""Incremental view maintenance: maintained state == recomputed state
under inserts/deletes/updates, group removal at zero, and the
delta-image helper."""

from __future__ import annotations

from pyspark.sql import functions as F

from bohemia_kenya_data_pipeline_spark.operators import ivm
from bohemia_kenya_data_pipeline_spark.operators import scd as sc


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k int, g string, v long")


def _maintain(spark, old_rows, new_rows):
    old, new = _snap(spark, old_rows), _snap(spark, new_rows)
    state = ivm.aggregate_state(old, ["g"], ["v"])
    diff = sc.snapshot_diff(old, new, ["k"])
    delta = ivm.delta_from_snapshot_diff(diff, old, new, ["k"], ["v", "g"]).withColumn(
        "g", F.coalesce("new_g", "old_g")
    )
    maintained = ivm.apply_delta(state, delta, ["g"], ["v"])
    recomputed = ivm.aggregate_state(new, ["g"], ["v"])
    return (
        sorted(map(tuple, maintained.collect())),
        sorted(map(tuple, recomputed.collect())),
    )


def test_ivm_insert_delete_update_match_recompute(spark):
    old = [(1, "a", 10), (2, "a", 20), (3, "b", 30)]
    new = [(2, "a", 25), (3, "b", 30), (4, "b", 40), (5, "a", 5)]
    got, want = _maintain(spark, old, new)
    assert got == want
    assert want == [("a", 2, 30), ("b", 2, 70)]


def test_ivm_group_vanishes_at_zero_count(spark):
    old = [(1, "a", 10), (2, "b", 20)]
    new = [(2, "b", 20)]
    got, want = _maintain(spark, old, new)
    assert got == want == [("b", 1, 20)]


def test_ivm_noop_delta_preserves_state(spark):
    old = [(1, "a", 10), (2, "b", 20)]
    got, want = _maintain(spark, old, old)
    assert got == want == [("a", 1, 10), ("b", 1, 20)]


def test_ivm_delta_images_attached(spark):
    old = _snap(spark, [(1, "a", 10)])
    new = _snap(spark, [(1, "a", 15), (2, "b", 20)])
    diff = sc.snapshot_diff(old, new, ["k"])
    delta = ivm.delta_from_snapshot_diff(diff, old, new, ["k"], ["v"])
    rows = {r.k: r for r in delta.collect()}
    assert rows[1].old_v == 10 and rows[1].new_v == 15
    assert rows[2].old_v is None and rows[2].new_v == 20
