"""Text-analysis operators for large-scale document pipelines.

Scale pack: language-ID, quality scoring, token counting, document
fingerprinting — all pure Column expressions (JVM-side, whole-stage
codegen) so they run at 100 TB without Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny per-language stopword profiles for the n-gram/stopword
#: heuristic language detector. Deliberately small + deterministic.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "en", "un"],
    "fr": ["le", "la", "de", "et", "les", "des", "un"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
    "zh": ["的", "是", "了", "在", "我", "有"],
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenizer → array<string> (empty tokens removed)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def bpe_ish_tokens(text: Column | str) -> Column:
    """BPE-ish regex tokenizer: punctuation split off into separate
    tokens (approximates subword pre-tokenization)."""
    c = F.col(text) if isinstance(text, str) else text
    spaced = F.regexp_replace(c, r"([^\w\s])", r" $1 ")
    return F.filter(F.split(F.trim(spaced), r"\s+"), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach document-quality features (length/punct/stopword ratios —
    the standard pretraining-data quality heuristics).

    Adds: n_chars_calc, n_tokens, avg_token_len, stopword_ratio,
    punct_ratio, uniq_token_ratio.
    """
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    stop = F.array([F.lit(s) for s in LANG_PROFILES["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop))
    total_len = F.length(F.regexp_replace(t, r"\s+", ""))
    return (
        df.withColumn("n_chars_calc", F.length(t))
        .withColumn("n_tokens", n_tok)
        .withColumn(
            "avg_token_len",
            F.when(n_tok > 0, F.round(total_len / n_tok, 4)),
        )
        .withColumn(
            "stopword_ratio",
            F.when(
                F.size(F.array_distinct(toks)) > 0,
                F.round(n_stop / F.size(F.array_distinct(toks)), 4),
            ),
        )
        .withColumn(
            "punct_ratio",
            F.round(
                F.length(F.regexp_replace(t, r"[\w\s]", "")) / F.greatest(F.length(t), F.lit(1)),
                4,
            ),
        )
        .withColumn(
            "uniq_token_ratio",
            F.when(n_tok > 0, F.round(F.size(F.array_distinct(toks)) / n_tok, 4)),
        )
    )


def fingerprint(text: Column | str) -> Column:
    """Canonical document fingerprint: md5 of the sorted distinct
    lowercase token set (order/duplication/case-insensitive identity;
    the classic "fingerprint" dedup key)."""
    c = F.col(text) if isinstance(text, str) else text
    canon = F.array_join(F.array_sort(F.array_distinct(tokens(F.lower(c)))), " ")
    return F.md5(canon)


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit counts (the lang-ID signal)."""
    toks = F.array_distinct(tokens(F.lower(F.col(text) if isinstance(text, str) else text)))
    return {
        lang: F.size(F.array_intersect(toks, F.array([F.lit(w) for w in words])))
        for lang, words in LANG_PROFILES.items()
    }


def detect_language(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: argmax of stopword-profile hits, 'und'
    when nothing matches. Ties broken by fixed language order (en
    first) for determinism."""
    scores = lang_scores(text_col)
    best = F.lit("und")
    best_score = F.lit(0)
    # iterate in fixed order; strict > keeps the earlier language on ties
    for lang in ["en", "es", "fr", "de", "zh"]:
        s = scores[lang]
        is_better = s > best_score
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_score = F.when(is_better, s).otherwise(best_score)
    return df.withColumn(out_col, best)
