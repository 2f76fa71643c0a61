"""Scalar expression helpers — all JVM-side Column expressions.

Every helper returns a ``pyspark.sql.Column`` built from built-in
functions (whole-stage-codegen friendly; no Python row UDFs — SURVEY
§2.10: every observed scalar maps to a built-in).

Reference citations are to /root/reference (see SURVEY §2.7).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def pad_id(col: Column | str, width: int = 5) -> Column:
    """Zero-pad an id to fixed width (pad_hhid, processing_utils.R:2-9)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lpad(c.cast("string"), width, "0")


def empty_to_null(col: Column | str, *extra_tokens: str) -> Column:
    """'' -> NULL (na_if, lab.Rmd:213-214); extra tokens (e.g. 'none')
    also map to NULL."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.nullif(c, F.lit(""))
    for tok in extra_tokens:
        out = F.nullif(out, F.lit(tok))
    return out


def standardize_text(col: Column | str) -> Column:
    """upper + squish (collapse inner whitespace, trim) — the
    reference's standardization combo (processing_utils.R:183)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.upper(F.trim(F.regexp_replace(c, r"\s+", " ")))


def age_years(dob: Column | str, as_of: Column | None = None) -> Column:
    """Age in fractional years: (as_of - dob)/365.25
    (get_corrected_age, processing_utils.R:23-38)."""
    d = F.col(dob) if isinstance(dob, str) else dob
    ref = as_of if as_of is not None else F.current_date()
    return F.datediff(ref, F.to_date(d)) / F.lit(365.25)


def week_start(col: Column | str) -> Column:
    """floor_date(x, 'week') — Monday week start (01.knit_reports.R:65)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_trunc("week", c).cast("date")


def case_when(branches: Sequence[tuple[Column, Column]], otherwise: Column | None = None) -> Column:
    """Order-sensitive first-match case_when chain (118 uses in the
    reference, chains up to ~40 branches; SURVEY §7.4.1). ``branches``
    is an ordered list of (condition, value)."""
    if not branches:
        raise ValueError("case_when needs at least one branch")
    expr = F.when(branches[0][0], branches[0][1])
    for cond, val in branches[1:]:
        expr = expr.when(cond, val)
    return expr.otherwise(otherwise) if otherwise is not None else expr


def coalesce_typed(new: Column, old: Column, target_type: str) -> Column:
    """SET-over-old with the target column's type winning
    (convert_datatype + coalesce, processing_utils.R:213-229,305-318)."""
    return F.coalesce(new.cast(target_type), old)


def sha1_cols(cols: Iterable[str]) -> dict[str, Column]:
    """sha1 over id columns (PII hashing, processing_utils.R:120-144).
    NULLs stay NULL (the reference hashes only non-missing values)."""
    out: dict[str, Column] = {}
    for c in cols:
        col = F.col(c)
        out[c] = F.when(col.isNotNull(), F.sha1(col.cast("string")))
    return out


def parse_repeat_key(key: Column | str) -> tuple[Column, Column]:
    """Parse an ODK child KEY '<uuid>/<repeat_name>[<k>]' into
    (repeat_name, repeat_key int) (processing_utils.R:272-275)."""
    c = F.col(key) if isinstance(key, str) else key
    name = F.regexp_extract(c, r"/([^/\[]+)\[", 1)
    k = F.regexp_extract(c, r"\[(\d+)\]$", 1).cast("int")
    return name, k
