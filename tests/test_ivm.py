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


def test_join_view_delta_matches_recompute_including_cross_term(spark):
    # the term a naive symmetric form double-counts: an inserted A row
    # joining an inserted B row must appear EXACTLY once (routed
    # through dA x B_new), plus deletes/updates on both sides at once
    from bohemia_kenya_data_pipeline_spark.operators import ivm as iv

    S = "__sign"
    a_old = spark.createDataFrame(
        [(1, 10, "a1"), (2, 20, "a2"), (3, 30, "a3")], "aid BIGINT, k BIGINT, av STRING"
    )
    b_old = spark.createDataFrame(
        [(10, "b10"), (20, "b20"), (40, "b40")], "k BIGINT, bv STRING"
    )
    # A: insert aid=4 on NEW key 40's partner... plus delete aid=2,
    # update aid=3's payload
    da = spark.createDataFrame(
        [
            (4, 50, "a4", 1),   # insert joining an INSERTED b key (cross term)
            (2, 20, "a2", -1),  # delete
            (3, 30, "a3", -1),  # update: retract old...
            (3, 30, "a3x", 1),  # ...assert new
        ],
        "aid BIGINT, k BIGINT, av STRING, __sign INT",
    )
    # B: insert k=50 and k=30 (so a3 gains a partner), delete k=40
    db = spark.createDataFrame(
        [(50, "b50", 1), (30, "b30", 1), (40, "b40", -1)],
        "k BIGINT, bv STRING, __sign INT",
    )
    b_new = iv.apply_join_view_delta(b_old, db, S)
    a_new = iv.apply_join_view_delta(a_old, da, S)
    v_old = a_old.join(b_old, ["k"])
    dv = iv.join_view_delta(a_old, da, b_new, db, ["k"], S)
    v_new = iv.apply_join_view_delta(v_old, dv, S)
    recompute = a_new.join(b_new, ["k"])
    assert sorted(map(tuple, v_new.collect())) == sorted(
        map(tuple, recompute.collect())
    )
    # the cross-term row is present exactly once
    assert v_new.filter((F.col("aid") == 4) & (F.col("bv") == "b50")).count() == 1


def test_apply_join_view_delta_multiset_and_guard(spark):
    from bohemia_kenya_data_pipeline_spark.operators import ivm as iv

    # duplicate identical rows are a legal multiset: net of +2 then -1
    # leaves exactly one copy
    view = spark.createDataFrame([(1, "x")], "k BIGINT, v STRING")
    dv = spark.createDataFrame(
        [(1, "x", 1), (1, "x", 1), (1, "x", -1), (2, "y", 1)],
        "k BIGINT, v STRING, __sign INT",
    )
    got = sorted(map(tuple, iv.apply_join_view_delta(view, dv).collect()))
    assert got == [(1, "x"), (1, "x"), (2, "y")]  # 1+2-1 = 2 copies + insert

    import pytest

    a = spark.createDataFrame([(1, 2, "p")], "aid BIGINT, k BIGINT, shared STRING")
    b = spark.createDataFrame([(2, "q")], "k BIGINT, shared STRING")
    with pytest.raises(ValueError, match="rename shared"):
        iv.join_view_delta(a, a, b, b, ["k"])


def test_ivm_sign_and_reserved_column_guards(spark):
    import pytest

    from bohemia_kenya_data_pipeline_spark.operators import ivm as iv

    a = spark.createDataFrame([(1, 2, "p")], "aid BIGINT, k BIGINT, av STRING")
    b = spark.createDataFrame([(2, "q")], "k BIGINT, bv STRING")
    da = spark.createDataFrame([(1, 2, "p", 1)], "aid BIGINT, k BIGINT, av STRING, __sign INT")
    db = spark.createDataFrame([(2, "q", 1)], "k BIGINT, bv STRING, __sign INT")

    # delta missing the sign column -> loud, names the input
    with pytest.raises(ValueError, match="delta_a is missing sign"):
        iv.join_view_delta(a, a, b, db, ["k"])
    with pytest.raises(ValueError, match="delta_b is missing sign"):
        iv.join_view_delta(a, da, b, b, ["k"])
    # snapshot carrying the sign column -> loud (would collide in join)
    with pytest.raises(ValueError, match="snapshot a_old"):
        iv.join_view_delta(da.drop("av"), da, b, db, ["k"])

    view = spark.createDataFrame([(1, "x")], "k BIGINT, v STRING")
    dv_ok = spark.createDataFrame([(1, "x", 1)], "k BIGINT, v STRING, __sign INT")
    # missing sign on apply
    with pytest.raises(ValueError, match="missing sign column"):
        iv.apply_join_view_delta(view, dv_ok.drop("__sign"))
    # reserved temp names
    with pytest.raises(ValueError, match="__net.*reserved"):
        iv.apply_join_view_delta(view.withColumnRenamed("v", "__net"),
                                 dv_ok.withColumnRenamed("v", "__net"))
    with pytest.raises(ValueError, match="__dup.*reserved"):
        iv.apply_join_view_delta(view.withColumnRenamed("v", "__dup"),
                                 dv_ok.withColumnRenamed("v", "__dup"))
