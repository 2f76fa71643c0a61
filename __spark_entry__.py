"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001;
``queries()``/``oracle_sql()`` expose the SURVEY §2 operator pack for
the DuckDB-oracle correctness gate (see
bohemia_kenya_data_pipeline_spark/queries.py).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bohemia_kenya_data_pipeline_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the goals-cascade warehouse build
    (00.store_se_goals.R shape — skeleton cross-join + fill-down +
    anti-joins + distinct rollup). Defaults to sf0.001 per the smoke
    contract; honors SPARK_GRAFT_SF_DIR."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    return QUERIES["goals_cascade"](spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted ⇒ rows-only check)."""
    return dict(ORACLES)
