"""Deterministic hash-based sampling and dataset splitting.

Training-data pipelines need samples and train/test splits that are
(a) reproducible across runs and engines, (b) partition- and
parallelism-invariant, and (c) cheap at 100 TB. Spark's native
``df.sample`` is none of these across engines: its RNG is seeded per
partition, so the selected rows change with the partition layout.

These operators instead derive a uniform value from ``md5`` of the row
key — a pure Column expression (JVM-side, whole-stage codegen, no
shuffle, no RNG state). ``md5`` produces identical lowercase hex in
Spark and DuckDB, so the selection is oracle-exact: the first 8 hex
chars of the digest are compared lexicographically against a threshold
encoding the sampling fraction (8 hex chars = 32 uniform bits, plenty
for per-mille-accurate fractions).

Scale notes:
- No shuffle: selection is a scan-local filter; the filter pushes into
  the scan for parquet row-group pruning of the *other* predicates.
- Skew-free: md5 is uniform regardless of key distribution.
- Seed changes the digest input (``key|seed``), so resampling with a
  new seed is a full reshuffle of membership, as expected.

Reference parity: the reference samples hh rosters with R's
``slice_sample`` seeded per strata (pipeline-analysis sampling scripts);
the hash formulation is the distributed-safe re-expression (SURVEY
§4.1 documents why RNG-identical output is impossible cross-engine).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: 16**8 — one past the largest 8-hex-char value ("ffffffff").
_HEX_SPACE = 16**8


def _hash_hex(key: Column, seed: int) -> Column:
    """First 8 hex chars of md5("<key>|<seed>") — 32 uniform bits as a
    lowercase hex string, identical in Spark and DuckDB."""
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(f"|{seed}"))), 1, 8)


def _threshold_hex(fraction: float) -> str:
    """Hex threshold such that P(hash_hex < threshold) == fraction.

    fraction == 1 maps to "g", which every hex string sorts below —
    an always-true predicate without a 9-char-comparison edge case.
    Out-of-range fractions raise on BOTH sides: a fraction > 1 is a
    caller bug (e.g. a percentage like 25 passed instead of 0.25) that
    silent keep-all would mask.
    """
    if not 0 <= fraction <= 1:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    t = int(round(fraction * _HEX_SPACE))
    return "g" if t >= _HEX_SPACE else format(t, "08x")


def sample_by_hash(
    df: DataFrame,
    key_col: str,
    fraction: float,
    seed: int = 42,
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen deterministically by key hash.

    Unlike ``df.sample`` the result is independent of partitioning and
    identical across engines; rows with equal keys are kept or dropped
    together (useful: sampling is stable under exact-dup re-ingestion).

    NULL keys are DROPPED (a NULL digest fails every comparison) —
    same rule as :func:`split_by_hash`, which labels them NULL. A
    membership decision for a row with no identity would not be
    reproducible, which defeats the operator; filter or repair NULL
    keys first if they must be retained.
    """
    return df.filter(_hash_hex(F.col(key_col), seed) < _threshold_hex(fraction))


def split_by_hash(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Assign each row a split label ("train"/"test"/...) by key hash.

    ``weights`` are normalized; labels are assigned by cumulative
    threshold in the given dict order, so every non-NULL-key row gets
    exactly one label and expected sizes follow the weights.
    Deterministic, partition-invariant, and reproducible cross-engine
    (same md5 formulation as :func:`sample_by_hash`).

    Rows with a NULL key get a NULL label — NOT the last split (the
    naive when-chain would silently dump them all into the final
    label, contaminating the eval split); mirrors
    :func:`sample_by_hash` dropping NULL keys.
    """
    if not weights:
        raise ValueError("weights must be a non-empty dict")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError(f"weights must sum to a positive value, got {total}")
    key = F.col(key_col)
    h = _hash_hex(key, seed)
    labels = list(weights)
    cum = 0.0
    expr = F.when(key.isNull(), F.lit(None).cast("string"))
    for label in labels[:-1]:
        # clamp: float accumulation can land at 1.0 + eps for valid
        # weights, which _threshold_hex correctly rejects from callers
        cum = min(cum + weights[label] / total, 1.0)
        expr = expr.when(h < _threshold_hex(cum), F.lit(label))
    return df.withColumn(out_col, expr.otherwise(F.lit(labels[-1])))


def stratified_sample_by_hash(
    df: DataFrame,
    key_col: str,
    group_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-domain weighted sampling: keep ~``fractions[group]`` of each
    group's rows, deterministically by key hash — the domain-mixture
    knob of a pretraining pipeline ("60% web, 20% code, 20% books"),
    expressed as per-group keep rates.

    Groups absent from ``fractions`` keep ``default_fraction`` (0 ==
    dropped). Selection is a scan-local when-chain over literal hex
    thresholds — no join, no shuffle, no RNG; membership is
    reproducible across engines and partitionings like
    :func:`sample_by_hash`, and changing one group's rate does not
    reshuffle any other group's membership (each row's fate depends
    only on its own hash and its group's threshold).
    """
    if not fractions:
        raise ValueError("fractions must be a non-empty dict")
    h = _hash_hex(F.col(key_col), seed)
    grp = F.col(group_col)
    chain = F.when(F.lit(False), F.lit(False))
    for g, frac in fractions.items():
        chain = chain.when(grp == g, h < _threshold_hex(frac))
    chain = chain.otherwise(h < _threshold_hex(default_fraction))
    return df.filter(chain)


def take_token_budget(
    df: DataFrame,
    group_col: str,
    token_col: str,
    budget: int,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Select documents per group until a token budget fills: rows are
    ranked by a deterministic hash priority (an unbiased, reproducible
    shuffle order), then kept while the budget is not yet exhausted
    BEFORE the row — so every group takes at least one document and
    overshoots by at most one document's tokens, the standard
    pretraining-mixture cutoff rule.

    One window shuffle on ``group_col``; the cumulative sum is a
    running frame (no second pass). At 100 TB group count is small
    (domains/languages), so per-group ordering dominates — the same
    cost profile as any per-domain ranking, and far cheaper than a
    global sort.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(_hash_hex(F.col(id_col), seed), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    running = F.sum(F.col(token_col)).over(w)
    return (
        df.withColumn("__running", running)
        .filter(F.col("__running") - F.col(token_col) < budget)
        .drop("__running")
    )


def weighted_sample_top_k(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    strata_cols: Sequence[str] = (),
    seed: int = 42,
    keep_priority: bool = False,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic and
    partition-invariant: keep the k rows (per stratum) with the
    highest priority u^(1/w) — the Efraimidis–Spirakis A-ES scheme,
    with u drawn from the repo's portable md5 hash family instead of
    an RNG. P(row selected) is proportional to its weight in the
    without-replacement sense; re-running, repartitioning, or moving
    engines reproduces the SAME sample (the reference's seeded
    set.seed sampling contract — SURVEY §4.1 — extended to weights).

    The training-data use: importance-weighted corpus subsampling
    ("sample documents proportional to quality score") where the
    sample must be reproducible across reruns and engines.

    Rows with NULL or non-positive weight are never selected (a zero
    weight cannot be "lucky"). Ties in priority are broken by key —
    u is injective-ish on 32 bits so this is a formality, but it
    pins total determinism.

    Plan: one window (rank over strata) — a single shuffle on the
    strata; with no strata, a global top-k via rank over an empty
    partition spec degenerates to a single-reducer sort, so prefer
    strata (or TABLESAMPLE-style pre-pruning: rows with
    u^(1/w) below the k-th priority can be pre-filtered by any cheap
    lower bound before the shuffle at 100 TB).
    """
    from pyspark.sql import Window

    key, w = F.col(key_col), F.col(weight_col)
    # (hash32 + 1) / 2^32 in (0, 1] — u == 0 would send every priority
    # to 0^x == 0; u == 1 is fine (priority 1 == certain winner cap).
    u = (
        F.conv(F.substring(F.md5(F.concat(key.cast("string"), F.lit(f"|ws{seed}"))), 1, 8), 16, 10)
        .cast("double")
        + 1.0
    ) / F.lit(4294967296.0)
    priority = F.pow(u, 1.0 / w)
    spec = (
        Window.partitionBy(*[F.col(c) for c in strata_cols])
        .orderBy(F.desc("__ws_priority"), key)
    )
    out = (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("__ws_priority", priority)
        .withColumn("__ws_rank", F.row_number().over(spec))
        .filter(F.col("__ws_rank") <= k)
        .drop("__ws_rank")
    )
    if keep_priority:
        return out
    return out.drop("__ws_priority")


def temperature_mix_rates(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    budget_frac: float = 0.5,
) -> DataFrame:
    """(group, n_orig, rate): per-group keep rates for temperature-
    based mixture rebalancing — group weights ∝ count^alpha
    (multilingual-LM sampling, e.g. Conneau & Lample 2019 §3.1), so
    alpha < 1 flattens the mixture (up-weights rare domains/languages)
    and alpha = 1 keeps natural proportions. The total expected sample
    is ``budget_frac`` of the corpus; per-group rates clamp at 1.0
    (a group can't be sampled above its size — the standard cap, which
    shifts mass to the remaining groups only via the budget, never
    silently).

    One count aggregate + a 1-row totals broadcast — rates are
    group-cardinality-sized metadata.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if not 0 < budget_frac <= 1:
        raise ValueError(f"budget_frac must be in (0, 1], got {budget_frac}")
    counts = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orig")
    )
    totals = counts.agg(
        F.sum("n_orig").alias("_total"),
        F.sum(F.pow("n_orig", F.lit(float(alpha)))).alias("_sw"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            F.col("_g").alias(group_col),
            "n_orig",
            F.least(
                F.lit(1.0),
                (F.col("_total") * budget_frac)
                * (F.pow("n_orig", F.lit(float(alpha))) / F.col("_sw"))
                / F.col("n_orig"),
            ).alias("rate"),
        )
    )


def temperature_mix(
    df: DataFrame,
    key_col: str,
    group_col: str,
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Temperature-resampled domain mixture: keep each group at the
    data-driven rate from :func:`temperature_mix_rates`, selecting
    rows deterministically by key hash (partition- and engine-
    invariant, like every sampler in this module).

    Unlike :func:`stratified_sample_by_hash` (literal caller-supplied
    fractions) the rates here are COMPUTED from the group counts, so
    the hash-uniform is compared against a rate COLUMN: the 32-bit
    digest prefix becomes u = hex/2^32 (exact — a power-of-two
    divide), and `rate >= 1.0 OR u < rate` keeps clamped groups whole
    without an 8-hex-chars boundary case. Selection is one broadcast
    join of group-cardinality rate metadata onto the scan — no data-
    side shuffle; membership within a group is a nested subset under a
    shrinking budget (same-hash ordering).

    NULL keys are dropped, NULL groups keep rate of their own NULL
    group (counted like any other value) — but a NULL key can never
    be selected (no reproducible identity), matching
    :func:`sample_by_hash`.
    """
    rates = temperature_mix_rates(df, group_col, alpha, budget_frac)
    u = (
        F.conv(_hash_hex(F.col(key_col), seed), 16, 10).cast("bigint")
        / F.lit(float(_HEX_SPACE))
    )
    return (
        df.join(F.broadcast(rates.select(group_col, "rate")), group_col)
        .filter((F.col("rate") >= 1.0) | (u < F.col("rate")))
        .drop("rate")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str | Sequence[str],
    key_col: str,
    max_rows: int,
    seed: int = 42,
) -> DataFrame:
    """Keep at most ``max_rows`` rows per group, chosen by hash order —
    the per-domain cap of a crawl pipeline (no single host may
    contribute more than N documents), and the generic anti-skew
    guard for any group-bounded sampling need.

    Hash order (not insertion or value order) makes the kept subset a
    deterministic pseudo-random sample of each group, stable across
    partitionings and engines; ties on the hash break by the key
    itself. One window shuffle on the group key(s) — the same
    exchange any per-group bound needs. Groups under the cap pass
    whole (rank <= cap needs no separate count).
    """
    if max_rows < 1:
        raise ValueError(f"max_rows must be >= 1, got {max_rows}")
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    w = Window.partitionBy(*groups).orderBy(
        _hash_hex(F.col(key_col), seed), F.col(key_col)
    )
    return (
        df.withColumn("_cap_rk", F.row_number().over(w))
        .filter(F.col("_cap_rk") <= max_rows)
        .drop("_cap_rk")
    )
