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
