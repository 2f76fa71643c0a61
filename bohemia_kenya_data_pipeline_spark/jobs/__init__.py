"""Composed zone-transition jobs (SURVEY §3.2): the cleaning DAG as
three DataFrame->DataFrame stages a deployment schedules per form,
plus the corpus-curation DAG for training-data pipelines."""

from .cleaning import clean_form, run_anomaly_detection, sanitize_form
from .curation import build_pretrain_dataset, curate_corpus, curate_release
from .ingest import assert_expectations, gated_ingest, ingest_batch
from .lakehouse import maintain_cdc_lakehouse

__all__ = [
    "clean_form",
    "sanitize_form",
    "run_anomaly_detection",
    "curate_corpus",
    "build_pretrain_dataset",
    "curate_release",
    "ingest_batch",
    "maintain_cdc_lakehouse",
]
