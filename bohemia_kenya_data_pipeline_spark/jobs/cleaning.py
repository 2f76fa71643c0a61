"""The cleaning DAG (pipeline-cleaning/Makefile:1-6, scripts 01-05)
as composable lazy jobs. Each stage is one DataFrame in, one out —
the zone writes (catalog.write_*) stay at the call site so the same
logic serves tests, backfills, and scheduled runs.

raw -> clean   (01.run_form_cleaning.R:99-157): name normalization,
               resolution expansion + DELETE-before-SET, village/typo
               standardization, corrected age
clean -> sanitized (02.run_data_sanitation.R:104-108): PII drop +
               hash, empty-column drop, location jitter
clean -> anomalies (05.run_anomaly_detection.R:50-104): detector
               union -> resolution_id contract + summary rollup
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame

from ..operators import clean as cl
from ..operators import quality as ql


def clean_form(
    raw: DataFrame,
    resolution: DataFrame,
    form_id: str,
    repeat_name: str | None = None,
    standardize_cols: Sequence[str] = ("village",),
    typo_fixes: dict[str, dict[str, str]] | None = None,
    cascade_mapping: Sequence[tuple[str, str]] | None = None,
) -> DataFrame:
    """raw -> clean: P8 names, C4 expansion, C1-C3 fixes, C10
    standardization. ``typo_fixes`` maps column -> {wrong: right}.
    Resolution joins broadcast; no data-side shuffle."""
    df = ql.normalize_column_names(raw)
    res = cl.expand_resolution(resolution, cascade_mapping)
    df = cl.google_sheets_fix(df, res, form_id, repeat_name)
    df = cl.standardize_strings(df, list(standardize_cols))
    for col, fixes in (typo_fixes or {}).items():
        df = cl.fix_typos(df, col, fixes)
    return df


def sanitize_form(
    clean: DataFrame,
    pii_denylist: Sequence[str],
    hash_cols: Sequence[str] | None = None,
    jitter_group: str | None = "hhid",
) -> DataFrame:
    """clean -> sanitized: C5 drop, C6 hash, C7 jitter, P9 empty-col
    drop (02.run_data_sanitation.R order)."""
    df = cl.drop_pii(clean, pii_denylist)
    df = cl.hash_pii(df, hash_cols)
    if (
        jitter_group
        and jitter_group in df.columns
        and "Latitude" in df.columns
        and "Longitude" in df.columns
    ):
        df = cl.jitter_locations(df, group_col=jitter_group)
    return ql.drop_empty_columns(df)


def run_anomaly_detection(
    detectors: Sequence[Callable[[], DataFrame]],
) -> tuple[DataFrame, DataFrame]:
    """clean -> anomalies: run every detector thunk, consolidate to
    the resolution contract, and build the summary rollup. Returns
    (anomalies_detection, summary) — write with
    catalog.write_history_partition for the _hist zones."""
    final = ql.consolidate([d() for d in detectors])
    return final, ql.summary_rollup(final)
