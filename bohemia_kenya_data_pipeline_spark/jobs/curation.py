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


def build_pretrain_dataset(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    domain_col: str = "lang",
    line_split_regex: str = "\n",
    mix: dict[str, float] | None = None,
    default_mix: float = 0.1,
    token_budget: int = 20_000,
    pack_tokens: int = 512,
    seed: int = 42,
    substring_dedup: bool = False,
    span_n: int = 12,
    span_min_docs: int = 2,
) -> DataFrame:
    """The full pretraining-mixture pipeline as ONE lazy plan:
    corpus line-dedup (boilerplate removal) → [optional substring-level
    span cut] → exact document dedup → per-domain mixture sampling →
    per-domain token budget → sequence packing into training shards.

    ``substring_dedup=True`` inserts the Lee et al. 2022 span-cut
    stage (``dedup.remove_duplicate_spans``) between line dedup and
    exact dedup: every token range of >= ``span_n`` tokens shared by
    >= ``span_min_docs`` documents is cut from ALL of them, keeping
    the unique remainder — the dedup mode Lee et al. recommend over
    whole-document dropping (a doc sharing one boilerplate paragraph
    loses only that paragraph). Docs cut to nothing are dropped; the
    cut text is whitespace-normalized (token re-join), which exact
    dedup downstream then sees. Adds two shuffles (the 120-bit shingle
    key distinct+count and the per-doc merge window), both linear in
    corpus token count.

    Returns (id, domain, n_tokens, cum_tokens, chunk_id) — one row per
    surviving document with its shard assignment. Every stage is the
    oracle-checked operator it names; the composition itself is
    oracle-checked end-to-end by ``queries.pretrain_mix``.

    Shuffle census at 100 TB: line dedup (1 on md5(line) + 1 rebuild
    groupBy), exact dedup (1 on md5(text)), mixture sampling (0 —
    scan-local hash thresholds), token budget + packing (1 window on
    the domain: BOTH windows order by the same (hash-priority, id)
    keys — the packing step reuses the budget step's priority column
    explicitly — so Spark plans one exchange and one sort for the
    pair).
    """
    mix = mix or {"en": 0.9, "de": 0.6}
    domains = docs.select(F.col(id_col), F.col(domain_col))
    deduped_lines = tx.dedup_lines(
        docs, text_col, id_col, split_regex=line_split_regex
    ).filter(F.length(F.col(text_col)) > 0)
    if substring_dedup:
        cut = dd.remove_duplicate_spans(
            deduped_lines,
            n=span_n,
            text_col=text_col,
            id_col=id_col,
            min_docs=span_min_docs,
        )
        deduped_lines = cut.filter(F.col("n_tokens_kept") > 0).select(
            F.col(id_col), F.col("text_clean").alias(text_col)
        )
    exact = dd.drop_exact_duplicates(deduped_lines, text_col, id_col)
    with_domain = exact.join(domains, id_col).withColumn(
        "n_tokens", tx.token_count(text_col).cast("bigint")
    )
    mixed = smp.stratified_sample_by_hash(
        with_domain, id_col, domain_col, mix, default_fraction=default_mix, seed=seed
    )
    budgeted = smp.take_token_budget(
        mixed, domain_col, "n_tokens", token_budget, id_col, seed=seed
    )
    from ..operators import windows as W
    from ..operators.sampling import _hash_hex

    prio = budgeted.select(id_col, domain_col, "n_tokens").withColumn(
        "__prio", _hash_hex(F.col(id_col), seed)
    )
    packed = W.pack_sequences(
        prio,
        "n_tokens",
        "__prio",
        [domain_col],
        pack_tokens,
        tiebreak_cols=[id_col],
    )
    return packed.select(id_col, domain_col, "n_tokens", "cum_tokens", "chunk_id")


def curate_release(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    gate_col: str = "n_chars",
    q: float = 0.25,
    label=None,
    vocab_size: int = 256,
    pack_tokens: int = 512,
    seed: int = 42,
) -> DataFrame:
    """The round-11 curation trio composed into one release DAG:
    **gate → classify → dedup → pack**, one lazy plan.

    1. stratified quantile gate: every ``group_col`` stratum sheds its
       own worst ``q``-tail of ``gate_col`` (quality.group_quantile_gate
       — broadcast thresholds, NULL-safe strata);
    2. learned NB quality classifier trained ON THE GATED corpus (the
       production shape — the filter model never sees the rows the
       gate already rejected); only ``pred`` survivors continue;
    3. exact dedup (min-id per content hash);
    4. per-stratum sequence packing into ``pack_tokens`` shards with
       the hash-priority order (windows.pack_sequences).

    Returns ``(id, group, n_tokens, cum_tokens, chunk_id)`` — all
    integers/strings, so the end-to-end DAG is hash-checkable with NO
    quantized float in the output (the float machinery only routes
    rows; its decision margins are audited in
    tests/test_hash_boundary_audit.py).

    Shuffle census at 100 TB: percentile agg (group-sized), classifier
    token/doc aggregates (2, map-side combinable; weight table
    broadcast), dedup groupBy on md5(text), ONE window exchange on the
    stratum for budget+packing. Nothing corpus-sized shuffles twice.
    """
    from ..operators import quality as ql
    from ..operators import windows as W
    from ..operators.sampling import _hash_hex

    label = F.col(gate_col) >= 300 if label is None else label
    gated, _report = ql.group_quantile_gate(docs, group_col, gate_col, q=q)
    scored = tx.quality_classifier_score(
        gated, label=label, id_col=id_col, text_col=text_col,
        vocab_size=vocab_size,
    )
    kept = gated.join(
        scored.filter(F.col("pred")).select(id_col), id_col, "semi"
    )
    deduped = dd.drop_exact_duplicates(kept, text_col=text_col, id_col=id_col)
    nt = deduped.select(
        F.col(id_col), F.col(group_col),
        tx.token_count(text_col).cast("bigint").alias("n_tokens"),
    ).withColumn("__prio", _hash_hex(F.col(id_col), seed))
    packed = W.pack_sequences(
        nt, "n_tokens", "__prio", [group_col], pack_tokens,
        tiebreak_cols=[id_col],
    )
    return packed.select(id_col, group_col, "n_tokens", "cum_tokens", "chunk_id")
