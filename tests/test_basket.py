"""Market-basket pairs: hand-computed support/confidence/lift, the
giant-basket cap, multi-occurrence collapse, and sizing stats."""

from __future__ import annotations

import pytest

from bohemia_kenya_data_pipeline_spark.operators import basket as bk


def _baskets(spark):
    # b1: {x, y}; b2: {x, y}; b3: {x, z}; b4: {y}
    rows = [
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"),
        (3, "x"), (3, "z"),
        (4, "y"),
    ]
    return spark.createDataFrame(rows, "bid int, item string")


def test_pairs_hand_computed(spark):
    got = {
        (r.item_a, r.item_b): r
        for r in bk.frequent_item_pairs(_baskets(spark), "bid", "item", min_support=1).collect()
    }
    xy = got[("x", "y")]
    # support 2; supp_x=3, supp_y=3, n_baskets=4
    assert xy.support == 2
    assert xy.confidence == pytest.approx(round(2 / 3, 4))
    assert xy.lift == pytest.approx(round(2 * 4 / (3 * 3), 4))
    xz = got[("x", "z")]
    assert xz.support == 1 and xz.lift == pytest.approx(round(1 * 4 / (3 * 1), 4))
    assert ("y", "z") not in got


def test_min_support_filters(spark):
    got = bk.frequent_item_pairs(_baskets(spark), "bid", "item", min_support=2)
    assert [(r.item_a, r.item_b) for r in got.collect()] == [("x", "y")]


def test_multi_occurrence_counts_once(spark):
    rows = [(1, "x"), (1, "x"), (1, "y")]
    df = spark.createDataFrame(rows, "bid int, item string")
    got = bk.frequent_item_pairs(df, "bid", "item", min_support=1).collect()
    assert len(got) == 1 and got[0].support == 1


def test_max_basket_drops_giant_basket_entirely(spark):
    rows = [(1, "x"), (1, "y")] + [(2, f"i{k}") for k in range(50)]
    df = spark.createDataFrame(rows, "bid int, item string")
    got = bk.frequent_item_pairs(df, "bid", "item", min_support=1, max_basket=10)
    pairs = [(r.item_a, r.item_b) for r in got.collect()]
    assert pairs == [("x", "y")]  # basket 2's 1225 pairs never generated
    # and the excluded basket does not inflate n_baskets in lift:
    # lift = 1 * 1 / (1 * 1) = 1.0
    assert got.collect()[0].lift == pytest.approx(1.0)


def test_basket_stats_prices_the_cap(spark):
    rows = [(1, "x"), (1, "y")] + [(2, f"i{k}") for k in range(50)]
    df = spark.createDataFrame(rows, "bid int, item string")
    s = bk.basket_stats(df, "bid", "item").collect()[0]
    assert s.n_baskets == 2 and s.max_items == 50
    assert s.total_pairs_uncapped == 1 + 50 * 49 // 2
