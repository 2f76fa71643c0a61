"""Reshape operators: scaffold (skeleton cross join), pivot helpers.

Reference (in /root/reference/):
- expand_grid skeletons — pipeline-reporting/R/00.store_se_goals.R:
  41-45, 294-299, 401 (visit × extid placeholder frames)
- pivot_wider (55 uses) — e.g. efficacy_status...Rmd:219-226,
  processing_utils.R:255-264; pivot_longer (42 uses) — e.g.
  pharmacy-report.Rmd:189

Spark-first: scaffolds cross-join a *broadcast* literal frame (the
small axis — visits, dates, metrics) against the distinct keys, so
the cost is one distinct + map-side expansion, never an n×m shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scaffold(
    keys: DataFrame,
    values: Sequence[str],
    value_col: str,
) -> DataFrame:
    """J9 skeleton: every key row × every literal value (expand_grid).
    The literal axis is exploded map-side — no shuffle at all."""
    arr = F.array(*[F.lit(v) for v in values])
    return keys.withColumn(value_col, F.explode(arr))


def pivot_wider(
    df: DataFrame,
    id_cols: Sequence[str],
    names_from: str,
    values_from: str,
    names: Sequence[str],
) -> DataFrame:
    """pivot_wider with a declared name list (keeps the plan static —
    no driver-side distinct pass)."""
    return (
        df.groupBy(*id_cols).pivot(names_from, list(names)).agg(F.first(values_from))
    )


def pivot_longer(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    names_to: str = "name",
    values_to: str = "value",
) -> DataFrame:
    """pivot_longer via the built-in unpivot (melt)."""
    return df.unpivot(list(id_cols), list(value_cols), names_to, values_to)
