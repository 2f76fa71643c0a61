"""Projection helpers: predicate-existence selection (P2) and
horizontal concat (O5).

Reference (in /root/reference/):
- any_of / starts_with / contains / name-regex selections —
  pharmacy-report.Rmd:344 (starts_with('unused')),
  ento_lab_templates.Rmd:302 (contains('num')), :325-328 (regex)
- bind_cols — anomalies_report.Rmd:133 (single use)

These resolve against the declared schema driver-side (analysis-time
metadata), so they cost nothing at execution.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def select_any_of(df: DataFrame, names: Sequence[str]) -> DataFrame:
    """P2: select the subset of ``names`` that exist (dplyr any_of —
    missing names are silently skipped, unlike select())."""
    present = [c for c in names if c in df.columns]
    return df.select(*[F.col(f"`{c}`") for c in present])


def select_matching(
    df: DataFrame,
    prefix: str | None = None,
    contains: str | None = None,
    regex: str | None = None,
) -> DataFrame:
    """P2: starts_with / contains / matches over column *names*."""
    cols = df.columns
    if prefix is not None:
        cols = [c for c in cols if c.startswith(prefix)]
    if contains is not None:
        cols = [c for c in cols if contains in c]
    if regex is not None:
        pat = re.compile(regex)
        cols = [c for c in cols if pat.search(c)]
    return df.select(*[F.col(f"`{c}`") for c in cols])


def bind_cols(left: DataFrame, right: DataFrame) -> DataFrame:
    """O5: horizontal concat by row position (bind_cols). Implemented
    as a join on a synthetic per-partition-ordered row id — only
    well-defined when both frames share the same row order and count
    (the reference's single use concats aligned summaries).

    Positional alignment is inherently order-dependent: at scale
    prefer a real key join. Kept for parity with the one reference
    call site. Raises on a count mismatch — the inner join would
    otherwise silently truncate to the shorter frame.
    """
    n_left, n_right = left.count(), right.count()
    if n_left != n_right:
        raise ValueError(
            f"bind_cols requires equal row counts, got {n_left} vs {n_right}"
        )
    w = Window.orderBy(F.monotonically_increasing_id())
    lid = left.withColumn("__rid", F.row_number().over(w))
    rid = right.withColumn("__rid", F.row_number().over(w))
    return lid.join(rid, "__rid", "inner").drop("__rid")
