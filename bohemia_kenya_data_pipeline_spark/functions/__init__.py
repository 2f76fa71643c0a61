"""Scalar expression library (SURVEY §2.7)."""

from .scalars import (  # noqa: F401
    age_years,
    case_when,
    coalesce_typed,
    empty_to_null,
    pad_id,
    parse_repeat_key,
    sha1_cols,
    standardize_text,
    week_start,
)
