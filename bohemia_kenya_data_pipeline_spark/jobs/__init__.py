"""Composed zone-transition jobs (SURVEY §3.2): the cleaning DAG as
three DataFrame->DataFrame stages a deployment schedules per form."""

from .cleaning import clean_form, run_anomaly_detection, sanitize_form

__all__ = ["clean_form", "sanitize_form", "run_anomaly_detection"]
