"""Goldens for windows.gap_fill_interpolate — hand-computed blends,
bucket means, per-key grids, and the hour-bucket mode."""

from __future__ import annotations

import datetime as dt

from bohemia_kenya_data_pipeline_spark.operators import windows as W


def _df(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "ts", "value"])


def _run(spark, rows, **kw):
    out = W.gap_fill_interpolate(_df(spark, rows), **kw).collect()
    return {
        (r["user_id"], r["bucket_ts"]): (r["value_filled"], r["src"]) for r in out
    }


def test_linear_interpolation_hand_computed(spark):
    # observed day1=10.0, day4=40.0 -> day2=20, day3=30 interpolated
    rows = [
        (1, dt.datetime(2024, 1, 1, 5), 10.0),
        (1, dt.datetime(2024, 1, 4, 9), 40.0),
    ]
    got = _run(spark, rows)
    assert got[(1, dt.datetime(2024, 1, 1))] == (10.0, "observed")
    assert got[(1, dt.datetime(2024, 1, 2))] == (20.0, "interpolated")
    assert got[(1, dt.datetime(2024, 1, 3))] == (30.0, "interpolated")
    assert got[(1, dt.datetime(2024, 1, 4))] == (40.0, "observed")


def test_bucket_mean_over_multiple_observations(spark):
    # two same-day observations average in exact cents: (10.01+10.02)/2
    rows = [
        (1, dt.datetime(2024, 1, 1, 1), 10.01),
        (1, dt.datetime(2024, 1, 1, 2), 10.02),
        (1, dt.datetime(2024, 1, 2, 1), 99.0),
    ]
    got = _run(spark, rows)
    assert got[(1, dt.datetime(2024, 1, 1))] == (10.015, "observed")


def test_grids_are_per_key_and_isolated(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1), 1.0),
        (1, dt.datetime(2024, 1, 3), 3.0),
        (2, dt.datetime(2024, 2, 10), 5.0),  # disjoint range, no gap
    ]
    got = _run(spark, rows)
    keys_u2 = [k for k in got if k[0] == 2]
    assert keys_u2 == [(2, dt.datetime(2024, 2, 10))]
    assert got[(1, dt.datetime(2024, 1, 2))] == (2.0, "interpolated")
    # user 1's grid must not bleed into user 2's dates
    assert (1, dt.datetime(2024, 2, 10)) not in got


def test_multiple_gaps_each_blend_their_own_neighbors(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1), 0.0),
        (1, dt.datetime(2024, 1, 3), 10.0),
        (1, dt.datetime(2024, 1, 5), 0.0),
    ]
    got = _run(spark, rows)
    assert got[(1, dt.datetime(2024, 1, 2))] == (5.0, "interpolated")
    assert got[(1, dt.datetime(2024, 1, 4))] == (5.0, "interpolated")


def test_hour_bucket_mode(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 10), 1.0),
        (1, dt.datetime(2024, 1, 1, 3, 50), 7.0),
    ]
    got = _run(spark, rows, bucket="hour")
    assert got[(1, dt.datetime(2024, 1, 1, 1))] == (3.0, "interpolated")
    assert got[(1, dt.datetime(2024, 1, 1, 2))] == (5.0, "interpolated")
    assert len([k for k in got if k[0] == 1]) == 4


def test_week_bucket_phase_matches_date_trunc(spark):
    # 2024-01-01 and 2024-01-15 are both Mondays (date_trunc('week')
    # anchors). Emitted bucket_ts must stay on Mondays — not snap to
    # the unix-epoch week phase (a Thursday, 4 days earlier).
    rows = [
        (1, dt.datetime(2024, 1, 1, 12), 0.0),
        (1, dt.datetime(2024, 1, 15, 12), 14.0),
    ]
    got = _run(spark, rows, bucket="week")
    assert got[(1, dt.datetime(2024, 1, 1))] == (0.0, "observed")
    assert got[(1, dt.datetime(2024, 1, 8))] == (7.0, "interpolated")
    assert got[(1, dt.datetime(2024, 1, 15))] == (14.0, "observed")
    assert all(k[1].weekday() == 0 for k in got)


def test_day_bucket_phase_survives_non_utc_session_tz(spark):
    # Under a non-UTC FIXED-OFFSET session timezone the day boundary is
    # offset from epoch multiples of 86400; emitted bucket_ts must equal
    # the date_trunc('day') values, not unix-aligned midnights. DST
    # zones are documented as unsupported for day/week buckets (the
    # 86400 s grid can't track 23/25 h date_trunc'd days) — this covers
    # the supported fixed-offset case.
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")  # +05:45
    try:
        rows = [
            (1, dt.datetime(2024, 1, 1, 8), 10.0),
            (1, dt.datetime(2024, 1, 3, 8), 30.0),
        ]
        got = _run(spark, rows)
        # collect() renders in the driver's UTC: Kathmandu midnight is
        # 18:15 UTC the prior day. Pre-fix the operator emitted
        # epoch-aligned 00:00 UTC midnights instead.
        assert got[(1, dt.datetime(2023, 12, 31, 18, 15))] == (10.0, "observed")
        assert got[(1, dt.datetime(2024, 1, 1, 18, 15))] == (20.0, "interpolated")
        assert got[(1, dt.datetime(2024, 1, 2, 18, 15))] == (30.0, "observed")
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
