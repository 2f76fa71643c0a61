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


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
