"""Differential tests: every registered query vs its DuckDB oracle.

This mirrors the driver's correctness gate (row count + sorted-column
value comparison) at sf0.001 so regressions surface locally before the
per-round sf0.01 run.
"""

from __future__ import annotations

import pytest

from bohemia_kenya_data_pipeline_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_DIR, assert_frames_match


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_DIR)
    rel = duck.sql(ORACLES[name])
    assert_frames_match(df, rel)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_query_without_oracle_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_approx_count_distinct_error_bound(spark):
    # rsd=0.02: assert the estimate within 5 standard errors (10%) of
    # the exact count — a hash-match oracle is impossible by design
    # (HLL++ estimates are implementation-defined).
    exact = {
        r.event_type: r.n_users
        for r in QUERIES["count_distinct_exact"](spark, SF_DIR).collect()
    }
    approx = {
        r.event_type: r.n_users_approx
        for r in QUERIES["count_distinct_approx"](spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(0.10 * n, 2), (k, n, approx[k])


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_approx_count_distinct_rsd_sweep_sf01(spark):
    """rsd sweep at sf0.1 (VERDICT r4 ask 8): for each accuracy knob
    the HLL++ estimate must sit within 5 standard errors (5*rsd) of
    the exact per-type distinct count — the strongest local evidence
    available for a permanently rows-only driver entry (the estimate
    itself is implementation-defined). HLL++ is deterministic for a
    given rsd, so this golden is stable run-to-run."""
    import os

    from pyspark.sql import functions as F

    from bohemia_kenya_data_pipeline_spark.queries import _events

    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ev = _events(spark, sf01).select("event_type", "user_id")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for rsd in (0.01, 0.02, 0.05, 0.10):
        approx = {
            r.event_type: r.n
            for r in ev.groupBy("event_type")
            .agg(F.approx_count_distinct("user_id", rsd=rsd).alias("n"))
            .collect()
        }
        assert set(approx) == set(exact)
        for k, n in exact.items():
            tol = max(5 * rsd * n, 2)
            assert abs(approx[k] - n) <= tol, (rsd, k, n, approx[k])


# ---------------------------------------------------------------------------
# Generic as-of join (windows.asof_join)
# ---------------------------------------------------------------------------


def _asof_frames(spark):
    import datetime as dt

    T = dt.datetime
    left = spark.createDataFrame(
        [(1, T(2024, 1, 1, 10), "p1"), (1, T(2024, 1, 1, 12), "p2"),
         (2, T(2024, 1, 1, 9), "p3")],
        ["uid", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [(1, T(2024, 1, 1, 9, 30), 5.0), (1, T(2024, 1, 1, 11), 7.0),
         (1, T(2024, 1, 1, 12), 9.0), (3, T(2024, 1, 1, 8), 1.0)],
        ["uid", "rts", "val"],
    )
    return left, right


def test_asof_backward_inclusive_and_unmatched(spark):
    from bohemia_kenya_data_pipeline_spark.operators import windows as W

    left, right = _asof_frames(spark)
    got = {
        r.tag: r.val
        for r in W.asof_join(left, right, ["uid"], "ts", "rts", ["val"]).collect()
    }
    # p2's equal-timestamp right row matches (inclusive <=); p3's key
    # has no right rows at all -> NULL (left-join contract)
    assert got == {"p1": 5.0, "p2": 9.0, "p3": None}


def test_asof_forward_direction(spark):
    from bohemia_kenya_data_pipeline_spark.operators import windows as W

    left, right = _asof_frames(spark)
    got = {
        r.tag: r.val
        for r in W.asof_join(
            left, right, ["uid"], "ts", "rts", ["val"], direction="forward"
        ).collect()
    }
    assert got == {"p1": 7.0, "p2": 9.0, "p3": None}


def test_asof_tolerance_voids_far_matches(spark):
    from bohemia_kenya_data_pipeline_spark.operators import windows as W

    left, right = _asof_frames(spark)
    out = W.asof_join(
        left, right, ["uid"], "ts", "rts", ["val"], tolerance_seconds=60
    ).collect()
    got = {r.tag: (r.val, r.asof_ts) for r in out}
    # only p2's exact-timestamp match is within 60s; ts and value null
    # out TOGETHER
    assert got["p2"][0] == 9.0 and got["p2"][1] is not None
    assert got["p1"] == (None, None) and got["p3"] == (None, None)


def test_asof_partition_invariance(spark):
    from bohemia_kenya_data_pipeline_spark.operators import windows as W

    left, right = _asof_frames(spark)
    a = W.asof_join(left.coalesce(1), right.coalesce(1), ["uid"], "ts", "rts", ["val"])
    b = W.asof_join(left.repartition(7), right.repartition(5), ["uid"], "ts", "rts", ["val"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
