"""Market-basket co-occurrence: frequent item PAIRS with
support / confidence / lift — association-rule mining's first level,
kept in pure equi-join form so it scales and oracles.

(The full Apriori/FP-Growth lattice is deliberately out: pairwise
co-occurrence covers the dominant use — "what is bought/clicked/read
together" — in ONE self-join, where deeper itemsets need iterative
candidate generation for sharply diminishing returns.)

Spark-first design (100 TB):
- Pair generation is a self-equi-join on the basket id with an
  item < item ordering predicate — shuffle on basket id only.
- The quadratic hazard is the GIANT BASKET (a crawler session with
  10^5 items turns into 10^10 pairs). ``max_basket`` is the hot-cap
  guard, same philosophy as dedup._cap_buckets: baskets above the cap
  are DROPPED (loudly countable via basket_stats) rather than allowed
  to detonate the join; the pigeonhole argument for dedup does not
  apply here, so capping is a stated recall tradeoff, not a bug.
- Support counts are plain aggregations; confidence/lift divide by
  broadcast per-item supports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_stats(df: DataFrame, basket_col: str, item_col: str) -> DataFrame:
    """One-row sizing report: basket count, max/p99 distinct items per
    basket, and the total pair count a given cap would generate. Run
    before choosing ``max_basket``."""
    sizes = df.groupBy(basket_col).agg(
        F.count_distinct(F.col(item_col)).alias("n_items")
    )
    return sizes.agg(
        F.count(F.lit(1)).cast("long").alias("n_baskets"),
        F.max("n_items").cast("long").alias("max_items"),
        F.expr("percentile(n_items, 0.99)").alias("p99_items"),
        F.sum(F.col("n_items") * (F.col("n_items") - 1) / 2)
        .cast("long")
        .alias("total_pairs_uncapped"),
    )


def frequent_item_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket: int | None = None,
) -> DataFrame:
    """Item pairs co-occurring in >= ``min_support`` baskets, with

    - ``support``: number of baskets containing both items;
    - ``confidence``: support / baskets containing item_a
      (P(b in basket | a in basket), directional — the returned row
      carries the a->b direction where item_a < item_b; swap for the
      reverse rule);
    - ``lift``: support * n_baskets / (supp_a * supp_b), symmetric.

    Baskets with more than ``max_basket`` distinct items are excluded
    entirely (see module docstring). Multi-occurrence of an item in
    one basket counts once.
    """
    b, i = F.col(basket_col), F.col(item_col)
    items = df.select(b.alias("bid"), i.alias("item")).distinct()
    if max_basket is not None:
        sizes = items.groupBy("bid").agg(F.count(F.lit(1)).alias("__n"))
        keep = sizes.filter(F.col("__n") <= max_basket).select("bid")
        items = items.join(keep, "bid")
    # one-row basket count joined lazily (no eager .count() action —
    # the whole operator stays a single plan)
    nb = items.agg(F.count_distinct(F.col("bid")).cast("double").alias("__nb"))
    supp = items.groupBy("item").agg(F.count(F.lit(1)).cast("long").alias("supp"))

    l = items.alias("l")
    r = items.alias("r")
    pairs = (
        l.join(r, (F.col("l.bid") == F.col("r.bid")) & (F.col("l.item") < F.col("r.item")))
        .groupBy(F.col("l.item").alias("item_a"), F.col("r.item").alias("item_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .filter(F.col("support") >= min_support)
    )
    sa = supp.select(F.col("item").alias("item_a"), F.col("supp").alias("supp_a"))
    sb = supp.select(F.col("item").alias("item_b"), F.col("supp").alias("supp_b"))
    return (
        pairs.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .join(F.broadcast(nb))
        .select(
            "item_a",
            "item_b",
            "support",
            F.round(F.col("support") / F.col("supp_a"), 4).alias("confidence"),
            F.round(
                F.col("support") * F.col("__nb")
                / (F.col("supp_a") * F.col("supp_b")),
                4,
            ).alias("lift"),
        )
    )
