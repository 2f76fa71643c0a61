"""Bloom-filter join pruning — cut shuffle volume on the BIG side of a
selective join before the shuffle happens.

The reference joins landed form tables against small curated rosters
everywhere (e.g. pipeline-cleaning/R/01.run_form_cleaning.R joins each
form against the resolution sheets); at 100 TB the expensive part of
such a join is shuffling the big side, most of which will not match.
Spark's own runtime row-group filtering only kicks in for some join
shapes; this module makes the pattern explicit, mergeable, and
reusable as a stored artifact.

Spark-first design (100 TB):

- The bloom bitmap is a DataFrame of ``(word_idx, word)`` 64-bit words
  (sparse: absent word_idx == 0), built with one ``groupBy(word_idx)``
  + ``bit_or`` aggregation. Map-side combine collapses every scan
  partition to at most ``n_bits/64`` rows BEFORE the shuffle, so the
  build shuffles O(partitions x n_bits/64) words, independent of row
  count — the property that makes building a bloom cheaper than the
  join it prunes.
- Probing is ``n_hashes`` BROADCAST left joins of the (tiny) word
  table against the probe side, then a bit test — zero shuffles on
  the probe side, so the filter runs scan-side, exactly where a
  100 TB plan needs it.
- Blooms are mergeable by construction: ``bit_or`` over the union of
  word tables. union-of-blooms == bloom-of-union exactly
  (golden-tested), so per-partition / per-day blooms can be built
  independently and combined, like the HLL store in stats.py.
- No false negatives ever; false positives only widen the pruned set,
  and ``bloom_pruned_semi_join`` re-verifies with an exact semi join,
  so the END RESULT equals the plain semi join bit-for-bit (that
  equivalence IS the registered oracle).

Sizing: for n keys and false-positive rate p, n_bits ~ -n*ln(p)/ln(2)^2
and n_hashes ~ (n_bits/n)*ln(2). The defaults (2^20 bits, 3 hashes)
give ~2.5% FP at 100k keys; ``bloom_stats`` reports the measured fill
factor so callers can size from data instead of guessing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default bitmap size (bits). 2^20 bits = 16 Ki words = 128 KiB —
#: comfortably broadcastable; raise for build sides beyond ~300k keys.
DEFAULT_N_BITS = 1 << 20
DEFAULT_N_HASHES = 3


def _positions(key: Column, n_bits: int, n_hashes: int, seed: int) -> list[Column]:
    """k independent bit positions via seeded xxhash64 (JVM-side,
    codegen-friendly). Portability to DuckDB is NOT required here:
    the registered oracle checks the end-to-end join result, which is
    hash-independent by the no-false-negative + exact-verify design."""
    return [
        F.pmod(F.xxhash64(key, F.lit(seed * 1009 + i)), F.lit(n_bits)).cast("long")
        for i in range(n_hashes)
    ]


def bloom_words(
    df: DataFrame,
    key_col: str,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
    seed: int = 42,
) -> DataFrame:
    """Build the sparse word table ``(word_idx: long, word: long)`` of a
    bloom filter over ``df[key_col]``.

    NULL keys are skipped: SQL equality never matches NULL, so a NULL
    on the build side can never contribute a true match and encoding
    it would only add false positives.
    """
    if n_bits % 64 != 0:
        raise ValueError(f"n_bits must be a multiple of 64, got {n_bits}")
    key = F.col(key_col)
    pos = F.array(*_positions(key, n_bits, n_hashes, seed))
    return (
        df.filter(key.isNotNull())
        .select(F.explode(pos).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            # F.shiftleft only takes a literal shift amount; the SQL
            # form accepts a column
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def merge_blooms(*blooms: DataFrame) -> DataFrame:
    """Union-of-blooms: bitwise OR of word tables. Exactly equals the
    bloom built over the union of the inputs (same n_bits/n_hashes/seed
    required — the caller owns that invariant)."""
    out = blooms[0]
    for b in blooms[1:]:
        out = out.unionByName(b)
    return out.groupBy("word_idx").agg(F.bit_or("word").alias("word"))


def bloom_stats(bloom: DataFrame, n_bits: int = DEFAULT_N_BITS) -> DataFrame:
    """One-row sizing report: set-bit count, fill factor, and the
    implied false-positive rate fill^n_hashes (at the default 3 hashes).
    Run this before trusting a bloom to prune: fill > ~0.5 means the
    bitmap is undersized and the prune will pass almost everything."""
    return bloom.agg(
        F.sum(F.bit_count("word")).cast("long").alias("bits_set"),
        (F.sum(F.bit_count("word")) / F.lit(n_bits)).alias("fill_factor"),
    )


def might_contain(
    probe: DataFrame,
    bloom: DataFrame,
    key_col: str,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
    seed: int = 42,
) -> DataFrame:
    """Filter ``probe`` to rows whose key MIGHT be in the bloom
    (superset of true members; no false negatives). NULL probe keys are
    dropped — they can never match under SQL equality.

    Plan shape: the word table collapses to ONE row holding a
    ``map<word_idx, word>`` (<= n_bits/8 bytes — broadcastable by
    construction), broadcast once; the probe tests its k bits with
    ``element_at`` lookups. One broadcast, zero shuffles on the probe
    side, and the bloom build runs once (k separate joins would
    re-aggregate it k times).
    """
    key = F.col(key_col)
    words = bloom.agg(
        F.map_from_entries(F.collect_list(F.struct("word_idx", "word"))).alias("__bw_map")
    )
    out = probe.filter(key.isNotNull()).join(F.broadcast(words))
    keep = F.lit(True)
    for pos in _positions(key, n_bits, n_hashes, seed):
        word = F.coalesce(
            F.element_at(F.col("__bw_map"), (pos / 64).cast("long")), F.lit(0)
        )
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.pmod(pos, F.lit(64)).cast("int")
        )
        keep = keep & (word.bitwiseAND(mask) == mask)
    return out.filter(keep).drop("__bw_map")


def bloom_pruned_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str | None = None,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
    seed: int = 42,
) -> DataFrame:
    """Semi-join ``big`` to ``small`` with a bloom pre-filter on the big
    side. Result is EXACTLY ``big.join(small, key, "semi")`` — the bloom
    only reduces how much of ``big`` reaches the verify join, it never
    changes the answer (false positives are removed by the exact semi
    join; false negatives cannot exist).

    At 100 TB: the bloom build scans ``small`` once (cheap — that's the
    side you'd broadcast anyway or nearly so), and the prune drops
    non-matching ``big`` rows AT THE SCAN, before any shuffle or
    broadcast-hash probe of the real join. When ``small`` is too big to
    broadcast (shuffle semi join), the prune cuts the big side's
    shuffle volume by roughly the true miss rate.
    """
    sk = small_key or big_key
    bloom = bloom_words(small, sk, n_bits, n_hashes, seed)
    pruned = might_contain(big, bloom, big_key, n_bits, n_hashes, seed)
    cond = pruned[big_key] == small[sk]
    return pruned.join(small, cond, "semi")
