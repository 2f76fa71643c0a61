"""Iterative graph algorithms as DataFrame loops — PageRank.

The reference has no graph engine, but its entity web (households →
individuals → visits → samples) is graph-shaped, and a training-data
pipeline meets real graphs constantly (web link graphs for crawl
prioritization, citation graphs for source weighting). This module
shows the Spark-first pattern for FIXED-POINT iteration: each round is
one join + one aggregation, the loop lives in the DRIVER, and the data
never leaves the JVM.

PageRank recurrence (classic non-normalized form, damping d):

    r_0(v)     = 1
    r_{t+1}(v) = (1 - d) + d * sum over in-edges (u, v) of r_t(u) / outdeg(u)

Dangling nodes (no out-edges) simply stop propagating their mass —
the variant used by the original paper's simplified presentation; it
keeps every step a pure join+agg, which is what makes the recurrence
expressible BOTH as a DataFrame loop and as an unrolled SQL CTE chain
(the registered oracle runs the identical 3-round recurrence).

Spark-first design (100 TB):
- Edges shuffle once per round on the join key; ranks are
  node-cardinality (much smaller than edges). Broadcast is wrong here
  — ranks grow with the graph — so this is the rare loop that WANTS
  the shuffle, pre-partitioned: repartition edges and ranks on the
  same key once and every round's join co-locates.
- ``persist_each`` truncates the logical plan each round
  (persist + count + unpersist of the predecessor). Without it the
  lineage doubles per round and Catalyst analysis time explodes
  around ~15 rounds; with it each round's plan is flat. At cluster
  scale use checkpointing to cut the lineage fully.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def out_degrees(edges: DataFrame, src: str = "src") -> DataFrame:
    """(src, outdeg) — out-degree per source node."""
    return edges.groupBy(src).agg(F.count(F.lit(1)).cast("long").alias("outdeg"))


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    persist_each: bool = False,
) -> DataFrame:
    """Run ``n_iter`` PageRank rounds over ``edges`` (deduplicated by
    the caller if multi-edges should not double-count). Returns
    ``(node, rank)`` for every node appearing as src or dst.

    Deterministic up to float-summation order; callers comparing
    across engines should round (see the registered oracle).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = out_degrees(e)
    # weight each edge once: contribution factor 1/outdeg(src)
    ew = e.join(deg, "src").select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("inv_deg"))

    ranks = nodes.withColumn("r", F.lit(1.0))
    prev = None
    for _ in range(n_iter):
        contrib = (
            ew.join(ranks, ew.src == ranks.node)
            .select("dst", (F.col("r") * F.col("inv_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contrib, nodes.node == contrib.dst, "left").select(
            "node",
            (F.lit(1.0 - damping) + F.lit(damping) * F.coalesce("s", F.lit(0.0))).alias("r"),
        )
        if persist_each:
            ranks = ranks.persist()
            ranks.count()  # materialize now so the lineage truncates
            if prev is not None:
                prev.unpersist()
            prev = ranks
    return ranks.select("node", F.col("r").alias("rank"))
