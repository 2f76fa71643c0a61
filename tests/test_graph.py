"""PageRank: hand-computed fixed points, dangling-node semantics, and
persist_each equivalence."""

from __future__ import annotations

import pytest

from bohemia_kenya_data_pipeline_spark.operators import graph as gr


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_cycle_is_fixed_point(spark):
    # a->b->c->a: uniform ranks 1.0 are the exact fixed point at any
    # iteration count (each node receives exactly its own mass back)
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    for n in (1, 4):
        got = {r.node: r.rank for r in gr.pagerank(e, n_iter=n).collect()}
        assert got == {"a": 1.0, "b": 1.0, "c": 1.0}


def test_chain_hand_computed(spark):
    # a->b, one iteration: a has no in-edges -> 0.15;
    # b gets 0.15 + 0.85 * r0(a)/1 = 1.0
    e = _edges(spark, [("a", "b")])
    got = {r.node: round(r.rank, 9) for r in gr.pagerank(e, n_iter=1).collect()}
    assert got == {"a": 0.15, "b": 1.0}
    # second iteration: b now receives 0.85 * 0.15 = 0.1275 on top of 0.15
    got2 = {r.node: round(r.rank, 9) for r in gr.pagerank(e, n_iter=2).collect()}
    assert got2 == {"a": 0.15, "b": round(0.15 + 0.85 * 0.15, 9)}


def test_split_mass_over_out_degree(spark):
    # a->b and a->c: a's mass splits; one iteration gives b = c =
    # 0.15 + 0.85 * (1/2)
    e = _edges(spark, [("a", "b"), ("a", "c")])
    got = {r.node: round(r.rank, 9) for r in gr.pagerank(e, n_iter=1).collect()}
    assert got["b"] == got["c"] == round(0.15 + 0.85 * 0.5, 9)


def test_persist_each_matches_lazy(spark):
    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")],
    )
    lazy = {r.node: round(r.rank, 12) for r in gr.pagerank(e, n_iter=4).collect()}
    eager = {
        r.node: round(r.rank, 12)
        for r in gr.pagerank(e, n_iter=4, persist_each=True).collect()
    }
    assert lazy == eager


def test_total_mass_conserved_on_cycle_union(spark):
    # On a graph with no dangling nodes, total mass stays n (each
    # round redistributes then renormalizes by the damping identity)
    e = _edges(spark, [("a", "b"), ("b", "a"), ("c", "d"), ("d", "c")])
    df = gr.pagerank(e, n_iter=5)
    total = sum(r.rank for r in df.collect())
    assert total == pytest.approx(4.0)


def test_khop_bfs_minimum_hops(spark):
    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("d", "e")],
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r.node: r.hops for r in gr.khop_reachable(e, seeds, k=2).collect()}
    # c reachable at hop 1 via a->c (not 2 via b); d at hop 2; e beyond k
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}


def test_khop_cycle_terminates_and_no_revisit(spark):
    e = _edges(spark, [("a", "b"), ("b", "a")])
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r.node: r.hops for r in gr.khop_reachable(e, seeds, k=5).collect()}
    assert got == {"a": 0, "b": 1}


def test_triangle_count_hand_graphs(spark):
    # one triangle + a dangling edge
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")])
    assert gr.triangle_count(e).collect()[0].n_triangles == 1
    # K4 has 4 triangles; direction/duplicates must not matter
    k4 = _edges(
        spark,
        [("a", "b"), ("b", "a"), ("a", "c"), ("a", "d"), ("b", "c"),
         ("d", "b"), ("c", "d"), ("c", "d")],
    )
    assert gr.triangle_count(k4).collect()[0].n_triangles == 4
    # triangle-free square
    sq = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    assert gr.triangle_count(sq).collect()[0].n_triangles == 0


# ---------------------------------------------------------------------------
# Round 13: fixed-point (ppm BIGINT) PageRank — the hash-stable variant
# behind the migrated pagerank_trade_graph contract. Its claim is
# EXACTNESS: bit-identical results across engines, partitionings, and
# summation orders, so the tests pin it against a pure-Python integer
# reference and against itself under different physical layouts.
# ---------------------------------------------------------------------------


def _ppm_reference(pairs, n_iter=3):
    """Driver-side integer reference of graph.pagerank_ppm — same
    recurrence, plain dicts, no Spark."""
    nodes = {n for p in pairs for n in p}
    outdeg: dict = {}
    for s, _ in pairs:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {n: 1_000_000 for n in nodes}
    for _ in range(n_iter):
        contrib: dict = {n: 0 for n in nodes}
        for s, d in pairs:
            contrib[d] += r[s] // outdeg[s]
        r = {n: 150_000 + (850_000 * contrib[n]) // 1_000_000 for n in nodes}
    return r


def test_pagerank_ppm_matches_pure_python_reference(spark):
    pairs = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("d", "c"),
        ("c", "a"), ("d", "a"), ("e", "a"),  # e dangles into a only
    ]
    for n in (1, 3, 5):
        got = {
            r.node: r.rank_ppm
            for r in gr.pagerank_ppm(_edges(spark, pairs), n_iter=n).collect()
        }
        assert got == _ppm_reference(pairs, n_iter=n), f"n_iter={n}"


def test_pagerank_ppm_partition_invariant(spark):
    """Integer sums are order-exact: any repartitioning of the edge
    input must produce the IDENTICAL ppm ranks — the property the
    float variant lacks (its last-ulp depends on summation order) and
    the reason the migrated oracle can hash at full value level."""
    pairs = [(f"s{i % 7}", f"c{(i * 3) % 11}") for i in range(60)]
    e = _edges(spark, pairs).distinct()
    base = {
        r.node: r.rank_ppm for r in gr.pagerank_ppm(e, n_iter=3).collect()
    }
    for layout in (e.repartition(1), e.repartition(16, "dst"), e.coalesce(2)):
        got = {
            r.node: r.rank_ppm
            for r in gr.pagerank_ppm(layout, n_iter=3).collect()
        }
        assert got == base


def test_pagerank_ppm_dangling_nodes_keep_base_rank(spark):
    # customers in a bipartite graph: receive but never propagate;
    # sources with no in-edges settle at exactly 150_000 ppm
    e = _edges(spark, [("s1", "c1"), ("s1", "c2"), ("s2", "c1")])
    got = {
        r.node: r.rank_ppm for r in gr.pagerank_ppm(e, n_iter=3).collect()
    }
    assert got["s1"] == got["s2"] == 150_000
    # c1 gets s1's half + s2's all, c2 gets s1's half — exact integers
    assert got == _ppm_reference([("s1", "c1"), ("s1", "c2"), ("s2", "c1")])


def test_pagerank_ppm_empty_and_single_edge(spark):
    empty = spark.createDataFrame([], "src string, dst string")
    assert gr.pagerank_ppm(empty, n_iter=3).collect() == []
    one = {
        r.node: r.rank_ppm
        for r in gr.pagerank_ppm(
            _edges(spark, [("a", "b")]), n_iter=2
        ).collect()
    }
    assert one == _ppm_reference([("a", "b")], n_iter=2)


def test_pagerank_ppm_damping_multiply_headroom(spark):
    """ADVICE r13 (medium): the naive ``850000 * s`` damping multiply
    wraps silently (non-ANSI Spark) once the contribution sum s passes
    ~1.08e13 — only ~1e7 in-degree at 1e6-scale ranks, within range of
    popular nodes in real web/social graphs. pagerank_ppm now applies
    the exact split identity ``(s*d) div m = (s div m)*d +
    ((s mod m)*d) div m``, whose largest intermediate stays below s
    itself — the multiply can no longer overflow before the BIGINT sum
    would. Evaluate both forms in Spark at hostile magnitudes against
    Python big-int semantics."""
    from pyspark.sql import functions as F

    d, m = 850_000, 1_000_000
    hostile = [
        10_852_338_771_764_706,     # just past the naive wrap point
        2**62,                      # 4.6e18
        9_000_000_000_000_000_000,  # near BIGINT max
    ]
    df = spark.createDataFrame([(s,) for s in hostile], "s long")
    rows = df.select(
        "s",
        F.expr(f"(s div {m}) * {d} + ((s % {m}) * {d}) div {m}").alias("split"),
        # try_multiply -> NULL on overflow (under ANSI the plain
        # multiply throws; under non-ANSI it would wrap silently —
        # either way the naive form cannot produce the right rank)
        F.expr(f"try_multiply(CAST({d} AS LONG), s) div {m}").alias("naive"),
    ).collect()
    for r in rows:
        exact = (r.s * d) // m  # Python big-int: never wraps
        assert r.split == exact, f"split identity broke at s={r.s}"
        assert r.naive is None, f"naive multiply unexpectedly fit at s={r.s}"
