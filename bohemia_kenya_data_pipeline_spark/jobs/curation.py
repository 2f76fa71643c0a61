"""Composed corpus-curation job: the text-pipeline counterpart of the
cleaning DAG (jobs/cleaning.py). One lazy plan from raw documents to a
labeled, deduplicated, PII-scrubbed training corpus.

Mirrors the oracle-checked ``queries.corpus_curation`` rollup; this is
the reusable API form that returns the row-level corpus (the query
aggregates it for hash-comparison).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..operators import sampling as smp
from ..operators import text as tx


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 30,
    min_uniq_ratio: float = 0.3,
    weights: dict[str, float] | None = None,
    seed: int = 11,
) -> DataFrame:
    """normalize → PII scrub → quality filter → exact dedup →
    deterministic split, as one lazy plan (two shuffles: the dedup
    groupBy and whatever the caller does next).

    Returns the input columns plus ``text_clean`` (normalized,
    scrubbed), ``n_tokens``, and ``split``. The scrub runs BEFORE
    token counting so ``n_tokens`` (and the min_tokens filter)
    describe the text actually returned — a multi-token phone number
    collapses to one ``<PHONE>`` token and is counted as one, so
    downstream packing budgets are honest. Filtering and dedup use the
    normalized, scrubbed text: spacing/case variants collapse, and
    documents differing only in redacted PII dedup together.
    """
    weights = weights or {"train": 0.8, "valid": 0.1, "test": 0.1}
    normed = tx.normalize_text(docs, text_col, "text_clean")
    scrubbed = tx.scrub_pii(normed, "text_clean")
    toks = tx.tokens(F.col("text_clean"))
    feat = scrubbed.withColumn("n_tokens", F.size(toks).cast("bigint")).withColumn(
        "__uniq", F.size(F.array_distinct(toks)) / F.size(toks)
    )
    kept = feat.filter(
        (F.col("n_tokens") >= min_tokens) & (F.col("__uniq") >= min_uniq_ratio)
    ).drop("__uniq")
    deduped = dd.drop_exact_duplicates(kept, text_col="text_clean", id_col=id_col)
    return smp.split_by_hash(deduped, id_col, weights, seed=seed)
