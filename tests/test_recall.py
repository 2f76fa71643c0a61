"""Measured recall gates for every lossy retrieval regime (round-7
VERDICT ask 1): the approximate paths were hash-checked as *the
deterministic path each defines*, and SCALING.md stated analytic
recall — this suite turns those claims into asserted facts against
exact ground truth on the sf0.01 embeddings fixture.

Every input is deterministic (fixed fixture, fixed seeds, literal
centroids/codebooks), so measured recall is a constant, not a random
variable — floors sit just below the measured value and a real
regression (plane reseed, probe-pruning bug, codebook drift) trips
them immediately. Measured values are published in COVERAGE.md.

| regime | measured |
|---|---|
| ivf fixed hyperplane centroids, n_probe=2/8   | 0.240@5 / 0.420@10 |
| ivf trained centroids (8, 5 iters), n_probe=2 | 0.620@5 / 0.530@10 |
| lsh_topk 4 planes x 8 tables                  | 0.700@5 / 0.660@10 |
| pq_topk trained codebooks (8x16)              | 0.260@5 / 0.320@10 |
| pq_topk literal LCG codebooks                 | 0.040@5 (oracle baseline) |
| embedding_neardup_pairs thr=0.3               | 0.690 pair recall |
| embedding_neardup_pairs thr=0.8 (planted)     | 1.000 pair recall |

The synthetic embeddings are near-uniform on the sphere — ANN's worst
case (documented in SCALING.md) — so absolute numbers are LOW bounds
on clustered real-world behavior; what the gate protects is that they
never silently get WORSE.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bohemia_kenya_data_pipeline_spark.operators import dedup as dd
from bohemia_kenya_data_pipeline_spark.operators import similarity as sim
from bohemia_kenya_data_pipeline_spark.queries import _IVF_FIXED_RAW, _PQ_CB

# the driver's gate fixture — identical embeddings table at every SF,
# named explicitly because the VERDICT contract is "measured on the
# sf0.01 fixture"
SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(corpus):
    # the production fixed query batch (queries._fixed_query_batch)
    return corpus.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 500))


@pytest.fixture(scope="module")
def ground_truth(corpus):
    """Exact cosine top-k per fixed query, computed independently in
    numpy (500x500 — trivially exact) with the engine's tie contract:
    score rounded to 4 dp, then (score desc, neighbor_id asc)."""
    rows = corpus.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    V = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    C = np.round(Vn @ Vn.T, 4)
    qidx = np.where((ids % 50 == 0) & (ids < 500))[0]

    def topk(k: int) -> dict[int, list[int]]:
        out = {}
        for qi in qidx:
            order = sorted(
                (j for j in range(len(ids)) if j != qi),
                key=lambda j: (-C[qi, j], ids[j]),
            )
            out[int(ids[qi])] = [int(ids[j]) for j in order[:k]]
        return out

    return {"ids": ids, "V": V, "C": C, "topk": topk}


def _recall_at_k(df, truth: dict[int, list[int]], k: int) -> float:
    got: dict[int, set[int]] = {}
    for r in df.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(set(truth[q]) & got.get(q, set())) for q in truth)
    return hits / (len(truth) * k)


# ---------------------------------------------------------------------------
# IVF — production regime (the exact config the ivf_ann_fixedq oracle runs)
# ---------------------------------------------------------------------------


def test_ivf_fixedq_production_recall(spark, corpus, queries, ground_truth):
    # literal hyperplane centroids, n_probe=2 of 8 — measured 0.240@5 /
    # 0.420@10. Hyperplane centroids don't adapt to the data, which is
    # why the trained regime below beats this at equal probe volume.
    r5 = _recall_at_k(
        sim.ivf_topk(corpus, queries, k=5, centroids=_IVF_FIXED_RAW, n_probe=2),
        ground_truth["topk"](5), 5,
    )
    r10 = _recall_at_k(
        sim.ivf_topk(corpus, queries, k=10, centroids=_IVF_FIXED_RAW, n_probe=2),
        ground_truth["topk"](10), 10,
    )
    assert r5 >= 0.20, r5
    assert r10 >= 0.40, r10


def test_ivf_fixedq_arrow_same_recall(spark, corpus, queries, ground_truth):
    # the production Arrow path must not trade recall for speed: same
    # centroids, same probes, same measured recall as the fold path
    truth = ground_truth["topk"](10)
    fold = _recall_at_k(
        sim.ivf_topk(corpus, queries, k=10, centroids=_IVF_FIXED_RAW, n_probe=2),
        truth, 10,
    )
    arrow = _recall_at_k(
        sim.ivf_topk_arrow(corpus, queries, centroids=_IVF_FIXED_RAW, n_probe=2, k=10),
        truth, 10,
    )
    assert arrow == fold, (arrow, fold)


def test_ivf_trained_recall_beats_hyperplane_centroids(
    spark, corpus, queries, ground_truth
):
    # data-adaptive (k-means) centroids at the SAME candidate volume —
    # measured 0.620@5 / 0.530@10 vs 0.240/0.420 for hyperplane
    # centroids: the docstring claim "recall at equal candidate volume
    # is typically higher" as an asserted fact.
    r5 = _recall_at_k(
        sim.ivf_topk(corpus, queries, k=5, n_centroids=8, n_probe=2, n_iters=5),
        ground_truth["topk"](5), 5,
    )
    r10 = _recall_at_k(
        sim.ivf_topk(corpus, queries, k=10, n_centroids=8, n_probe=2, n_iters=5),
        ground_truth["topk"](10), 10,
    )
    assert r5 >= 0.55, r5
    assert r10 >= 0.50, r10


# ---------------------------------------------------------------------------
# sign-LSH top-k
# ---------------------------------------------------------------------------


def test_lsh_topk_recall(spark, corpus, queries, ground_truth):
    # 4 planes x 8 tables (the defaults every caller gets) — measured
    # 0.700@5 / 0.660@10
    r5 = _recall_at_k(
        sim.lsh_topk(corpus, queries, k=5), ground_truth["topk"](5), 5
    )
    r10 = _recall_at_k(
        sim.lsh_topk(corpus, queries, k=10), ground_truth["topk"](10), 10
    )
    assert r5 >= 0.65, r5
    assert r10 >= 0.60, r10


# ---------------------------------------------------------------------------
# PQ — trained codebooks are the recall-bearing config
# ---------------------------------------------------------------------------


def test_pq_trained_recall_and_literal_baseline(spark, corpus, queries, ground_truth):
    # trained 8x16 codebooks: measured 0.260@5 / 0.320@10. The literal
    # LCG codebooks the pq_topk ORACLE uses measure 0.040@5 — they
    # exist to hash-check encode+ADC+ranking cross-engine, not to
    # retrieve; assert the gap so nobody ships the oracle config.
    truth5 = ground_truth["topk"](5)
    books = sim.pq_train_codebooks(corpus, n_subspaces=8, n_codewords=16, n_iters=4)
    trained5 = _recall_at_k(sim.pq_topk(corpus, queries, books, k=5), truth5, 5)
    trained10 = _recall_at_k(
        sim.pq_topk(corpus, queries, books, k=10), ground_truth["topk"](10), 10
    )
    literal5 = _recall_at_k(sim.pq_topk(corpus, queries, _PQ_CB, k=5), truth5, 5)
    assert trained5 >= 0.20, trained5
    assert trained10 >= 0.25, trained10
    assert trained5 >= 3 * literal5, (trained5, literal5)


# ---------------------------------------------------------------------------
# sign-LSH near-dup pair generation
# ---------------------------------------------------------------------------


def test_neardup_pair_recall_low_threshold(spark, corpus, ground_truth):
    # SCALING.md's analytic 1-(1-p^k)^L = 0.69 @ cos 0.3 — measured
    # 0.690 on the fixture (990 true pairs). The asserted floor makes
    # the analytic S-curve a checked contract.
    ids, C = ground_truth["ids"], ground_truth["C"]
    iu = np.triu_indices(len(ids), 1)
    m = C[iu] >= 0.3
    true_pairs = {
        (min(int(ids[a]), int(ids[b])), max(int(ids[a]), int(ids[b])))
        for a, b in zip(iu[0][m], iu[1][m])
    }
    assert len(true_pairs) > 500  # non-degenerate ground truth
    got = {
        (r.id_a, r.id_b)
        for r in dd.embedding_neardup_pairs(corpus, threshold=0.3).collect()
    }
    # every emitted pair is exact-verified, so precision is 1.0 by
    # construction — check it anyway (a verify-stage regression would
    # silently inflate recall)
    assert got <= true_pairs
    recall = len(true_pairs & got) / len(true_pairs)
    assert recall >= 0.65, recall


def test_neardup_pair_recall_high_cosine_planted(spark, corpus):
    # the fixture has no cos >= 0.8 pairs, so plant 20 deterministic
    # near-duplicates (5% relative perturbation) and require the
    # ~0.98-at-cos-0.8 analytic claim to hold on them — measured 1.000.
    rows = corpus.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    V = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    pert = []
    for vid in ids[:20]:
        v = V[np.where(ids == vid)[0][0]]
        noise = np.array([((vid * 31 + j * 17) % 97 - 48) / 2000.0 for j in range(64)])
        nv = v + np.linalg.norm(v) * noise * 0.05
        pert.append((int(10_000 + vid), [float(x) for x in nv]))
    aug = corpus.select("vec_id", "embedding").unionByName(
        corpus.sparkSession.createDataFrame(pert, "vec_id INT, embedding ARRAY<DOUBLE>")
    )
    ids2 = np.concatenate([ids, [p[0] for p in pert]])
    V2 = np.vstack([V, np.array([p[1] for p in pert])])
    V2n = V2 / np.linalg.norm(V2, axis=1, keepdims=True)
    C2 = np.round(V2n @ V2n.T, 4)
    iu = np.triu_indices(len(ids2), 1)
    m = C2[iu] >= 0.8
    true_pairs = {
        (min(int(ids2[a]), int(ids2[b])), max(int(ids2[a]), int(ids2[b])))
        for a, b in zip(iu[0][m], iu[1][m])
    }
    assert len(true_pairs) >= 20  # the planted pairs exist
    got = {
        (r.id_a, r.id_b)
        for r in dd.embedding_neardup_pairs(aug, threshold=0.8).collect()
    }
    recall = len(true_pairs & got) / len(true_pairs)
    assert recall >= 0.95, recall


# ---------------------------------------------------------------------------
# Hybrid retrieval — end-to-end approximation bound (VERDICT r6 ask 5)
# ---------------------------------------------------------------------------


def test_hybrid_fusion_tracks_exact_fusion(spark):
    """The dense leg of hybrid_rank_fusion is approximate (IVF,
    n_probe=2/8); this bounds the END-TO-END error: RRF-fuse the same
    BM25 leg with the EXACT cosine top-10 dense leg and require the
    production fusion to stay close — measured overlap@10 0.667, mean
    nDCG@10 0.760, per-query nDCG >= 0.624 (all deterministic)."""
    import math

    from bohemia_kenya_data_pipeline_spark import queries as Q
    from bohemia_kenya_data_pipeline_spark.operators import text as tx

    SF = SF_DIR
    approx = Q.QUERIES["hybrid_rank_fusion"](spark, SF)
    docs = Q._t(spark, SF, "documents")
    qdf = spark.createDataFrame(Q._BM25_QUERIES, ["query_id", "query_text"])
    bm = tx.bm25_topk(docs, qdf, k=10).select("query_id", "doc_id", "rank")
    emb = Q._t(spark, SF, "embeddings")
    dense_exact = sim.cosine_topk(
        emb, emb.filter(F.col("vec_id").isin(Q._HYBRID_QVEC_IDS)), k=10
    ).select(
        (F.col("query_id") / 100).cast("bigint").alias("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        "rank",
    )
    exact = sim.rrf_fuse([bm, dense_exact], k=60, top_k=10)

    def ranking(df):
        acc: dict[int, list[tuple[int, int]]] = {}
        for r in df.collect():
            acc.setdefault(r.query_id, []).append((r["rank"], r.doc_id))
        return {k: [d for _, d in sorted(v)] for k, v in acc.items()}

    a, e = ranking(approx), ranking(exact)
    assert set(a) == set(e) and len(e) >= 3
    overlaps, ndcgs = [], []
    for qid in e:
        ex, ap = e[qid], a[qid]
        overlaps.append(len(set(ex) & set(ap)) / len(ex))
        rel = {d: len(ex) - i for i, d in enumerate(ex)}
        dcg = sum(rel.get(d, 0) / math.log2(i + 2) for i, d in enumerate(ap))
        idcg = sum((len(ex) - i) / math.log2(i + 2) for i in range(len(ex)))
        ndcgs.append(dcg / idcg)
    assert min(ndcgs) >= 0.55, ndcgs
    assert sum(ndcgs) / len(ndcgs) >= 0.70, ndcgs
    assert sum(overlaps) / len(overlaps) >= 0.60, overlaps


# ---------------------------------------------------------------------------
# Lossy PAIR generators (round-7 extension: same contract, dedup family)
# ---------------------------------------------------------------------------


def _doc_jaccard_truth(docs_df, thr: float) -> set[tuple[int, int]]:
    """Exact word-2gram Jaccard pairs >= thr, computed driver-side
    (500-doc fixture — trivially exact)."""
    import itertools

    sets = {}
    for r in docs_df.select("doc_id", "text").collect():
        toks = r.text.split()
        sets[r.doc_id] = set(zip(toks, toks[1:]))
    out = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        A, B = sets[a], sets[b]
        u = len(A | B)
        if u and len(A & B) / u >= thr:
            out.add((a, b))
    return out


def test_minhash_banding_candidate_recall(spark):
    # 16 hashes x 4 bands (r=4): analytic candidate probability
    # 1-(1-J^4)^4 = 0.877 at J=0.8 and ~1 as J -> 1. The fixture's 25
    # true J>=0.5 pairs are all planted near-exact dups (J>=0.8), and
    # every one is caught — measured recall 1.000, 26 candidates total
    # (the S-curve's low-J suppression working as designed).
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    truth = _doc_jaccard_truth(docs, 0.5)
    assert len(truth) >= 20  # non-degenerate ground truth
    cand = {(r.id_a, r.id_b) for r in dd.minhash_lsh_pairs(docs).collect()}
    recall = len(truth & cand) / len(truth)
    assert recall >= 0.95, recall
    # and candidate volume stays linear-ish, not quadratic: the 500-doc
    # corpus must not generate more than a few times the true-pair count
    assert len(cand) <= 10 * len(truth), len(cand)


def test_ngram_jaccard_verify_recall_and_precision(spark):
    # generate->verify: recall inherits the banding S-curve (measured
    # 1.000 on the fixture's pairs), precision is EXACT by construction
    # — the verify stage computes true Jaccard, so no emitted pair may
    # fall below threshold.
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    truth = _doc_jaccard_truth(docs, 0.5)
    got = {
        (r.id_a, r.id_b)
        for r in dd.ngram_jaccard_pairs(docs, threshold=0.5, shingle_n=2).collect()
    }
    assert got == truth, (len(got), len(truth), len(got & truth))


def test_semantic_dedup_recall_regimes(spark, corpus):
    # SemDeDup-style anchor clustering finds pairs that share an argmax
    # anchor. Planted cos>=0.8 near-dups (its design regime): measured
    # recall 1.000 — near-identical vectors agree on the argmax. At
    # cos 0.3 on near-uniform data most pairs straddle anchor
    # boundaries: measured 0.257 — asserted as a floor AND a ceiling
    # band so the documented boundary-loss behavior stays visible
    # (a silent jump to ~1.0 would mean the cluster join went quadratic).
    rows = corpus.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    V = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    pert = []
    for vid in ids[:20]:
        v = V[np.where(ids == vid)[0][0]]
        noise = np.array([((vid * 31 + j * 17) % 97 - 48) / 2000.0 for j in range(64)])
        pert.append((int(10_000 + vid), [float(x) for x in v + np.linalg.norm(v) * noise * 0.05]))
    aug = corpus.select("vec_id", "embedding").unionByName(
        corpus.sparkSession.createDataFrame(pert, "vec_id INT, embedding ARRAY<DOUBLE>")
    )
    ids2 = np.concatenate([ids, [p[0] for p in pert]])
    V2 = np.vstack([V, np.array([p[1] for p in pert])])
    V2n = V2 / np.linalg.norm(V2, axis=1, keepdims=True)
    C2 = np.round(V2n @ V2n.T, 4)
    iu = np.triu_indices(len(ids2), 1)
    m = C2[iu] >= 0.8
    truth_hi = {
        (min(int(ids2[a]), int(ids2[b])), max(int(ids2[a]), int(ids2[b])))
        for a, b in zip(iu[0][m], iu[1][m])
    }
    got_hi = {
        (r.id_a, r.id_b)
        for r in dd.semantic_dedup_pairs(aug, n_anchors=8, threshold=0.8).collect()
    }
    assert len(truth_hi) >= 20
    assert len(truth_hi & got_hi) / len(truth_hi) >= 0.95

    # low-threshold regime on the raw corpus: boundary losses expected
    Cn = np.round((V / np.linalg.norm(V, axis=1, keepdims=True)) @ (V / np.linalg.norm(V, axis=1, keepdims=True)).T, 4)
    iu0 = np.triu_indices(len(ids), 1)
    m0 = Cn[iu0] >= 0.3
    truth_lo = {
        (min(int(ids[a]), int(ids[b])), max(int(ids[a]), int(ids[b])))
        for a, b in zip(iu0[0][m0], iu0[1][m0])
    }
    got_lo = {
        (r.id_a, r.id_b)
        for r in dd.semantic_dedup_pairs(corpus, n_anchors=8, threshold=0.3).collect()
    }
    recall_lo = len(truth_lo & got_lo) / len(truth_lo)
    assert 0.20 <= recall_lo <= 0.60, recall_lo
    # every emitted pair is exact-verified within its cluster
    assert got_lo <= truth_lo


# ---------------------------------------------------------------------------
# Knob monotonicity — recall vs candidate-volume knobs
# ---------------------------------------------------------------------------


def test_recall_monotone_in_probe_and_table_knobs(spark, corpus, queries, ground_truth):
    """More candidate volume must never lose recall: IVF's top-n_probe
    probe list is a prefix (candidates superset as n_probe grows) and
    LSH's table planes are a prefix of the seeded plane pool
    (candidates superset as n_tables grows) — a per-table reseed or
    probe-ordering bug breaks the subset property and shows up here as
    a non-monotone step. Measured sweeps on the fixture:
    IVF n_probe 1/2/4/8 -> 0.28 / 0.42 / 0.68 / 1.00 (exhaustive
    probes recover exact top-k exactly); LSH n_tables 2/4/8 ->
    0.16 / 0.44 / 0.66."""
    truth = ground_truth["topk"](10)
    ivf = [
        _recall_at_k(
            sim.ivf_topk(corpus, queries, k=10, centroids=_IVF_FIXED_RAW, n_probe=p),
            truth, 10,
        )
        for p in (1, 2, 4, 8)
    ]
    assert ivf == sorted(ivf), ivf
    assert ivf[-1] == 1.0, ivf  # n_probe == n_centroids degenerates to exact
    assert ivf[2] - ivf[0] >= 0.2, ivf  # the knob actually buys recall
    lsh = [
        _recall_at_k(sim.lsh_topk(corpus, queries, k=10, n_tables=L), truth, 10)
        for L in (2, 4, 8)
    ]
    assert lsh == sorted(lsh), lsh
    assert lsh[-1] - lsh[0] >= 0.2, lsh


def test_pq_recall_scales_with_code_budget(spark, corpus, queries, ground_truth):
    """PQ quality must track its storage budget: recall@10 measured
    0.24/0.32/0.40 across n_codewords 8/16/32 (at M=8) and
    0.18/0.32/0.49 across n_subspaces 4/8/16 (at K=16). Unlike the
    IVF/LSH knobs this is not a subset property — k-means could
    degrade silently — so the gate asserts the measured large-gap
    ordering: more codes must buy materially more recall."""
    truth = ground_truth["topk"](10)

    def r(n_sub, n_cw):
        books = sim.pq_train_codebooks(
            corpus, n_subspaces=n_sub, n_codewords=n_cw, n_iters=4
        )
        return _recall_at_k(sim.pq_topk(corpus, queries, books, k=10), truth, 10)

    cw = [r(8, k) for k in (8, 32)]
    assert cw[1] >= cw[0] + 0.05, cw
    sub = [r(m, 16) for m in (4, 16)]
    assert sub[1] >= sub[0] + 0.10, sub


def test_quantized_scoring_recall_perfect_on_fixture(spark, corpus, queries, ground_truth):
    """int8-quantized cosine (the storage-compressed scoring path) is
    technically lossy, but at 64 dims with per-vector symmetric scales
    the quantization error (~scale/2 per component) does not reorder
    this fixture's top-10 at all: measured recall 1.000@5 and 1.000@10
    on BOTH the fold and Arrow paths. Pinned so a scale/rounding
    regression in quantize_embeddings shows up as lost neighbors."""
    for k in (5, 10):
        t = ground_truth["topk"](k)
        assert _recall_at_k(sim.quantized_cosine_topk(corpus, queries, k=k), t, k) == 1.0
        assert _recall_at_k(sim.quantized_topk_arrow(corpus, queries, k=k), t, k) == 1.0


# ---------------------------------------------------------------------------
# Persistent serving index at a production centroid count (r8: VERDICT
# asks 1 + 6 — the C=64 build uses the Arrow assignment path)
# ---------------------------------------------------------------------------


def test_serving_index_recall_curve_at_production_c(
    spark, corpus, queries, ground_truth, tmp_path
):
    """query_ann_index recall-vs-n_probe at n_centroids=64 (auto ->
    Arrow assignment, C x D = 4096). Measured on the fixture
    (near-uniform sphere — ANN's WORST case, so these are lower
    bounds for clustered real embeddings):

        n_probe   1     2     4     8    12    16    24    32    48    64
        recall  0.11  0.25  0.39  0.62  0.72  0.77  0.83  0.91  0.98  1.00
        (@10; probed fraction = n_probe/64)

    Recommended operating point (published in SCALING.md): n_probe=32
    achieves >= 0.9@10 even on uniform data; note recall runs well
    ABOVE the probed fraction (0.62 at 12.5% probed) — trained
    centroids adapt even here. Gate: the curve's shape at three
    points, the >= 0.9@10 operating point, and exhaustive == exact."""
    cents = sim.ivf_train_centroids(corpus, n_centroids=64, n_iters=3)
    path = str(tmp_path / "idx64")
    from bohemia_kenya_data_pipeline_spark.jobs import retrieval as rt

    rt.build_ann_index(corpus, path, centroids=cents)  # auto -> arrow
    truth = ground_truth["topk"](10)
    r8 = _recall_at_k(
        rt.query_ann_index(spark, path, queries, k=10, n_probe=8), truth, 10
    )
    r32 = _recall_at_k(
        rt.query_ann_index(spark, path, queries, k=10, n_probe=32), truth, 10
    )
    r64 = _recall_at_k(
        rt.query_ann_index(spark, path, queries, k=10, n_probe=64), truth, 10
    )
    assert r8 >= 0.58, r8    # measured 0.620
    assert r32 >= 0.88, r32  # measured 0.910 — the >=0.9@10 operating point
    assert r64 == 1.0, r64   # exhaustive probing degenerates to exact
    assert r8 < r32 < r64    # monotone in candidate volume


def test_ivfpq_two_stage_recall_repair(spark, corpus, queries, ground_truth, tmp_path):
    """IVF-PQ at the production point (C=64 trained, 8x16 trained
    codebooks, n_probe=32): measured on the fixture —

        ADC-only @10            0.290
        rerank=50  @10          0.720
        rerank=200 @10          0.910

    ADC-only recall is bounded by PQ quantization on near-uniform
    data (mirrors pq_topk's 0.32@10), NOT by candidate pruning; exact
    rerank of the top-200 ADC candidates recovers 0.910@10 — exactly
    the raw-vector serving index's recall at the same n_probe
    (test_serving_index_recall_curve_at_production_c), i.e. the
    rerank stage fully repairs quantization loss within the probed
    candidates, which is the entire point of two-stage serving.
    Floors sit just below measured; monotonicity asserted so a
    rerank-path regression (e.g. reranking from codes instead of
    stored vectors) fails loudly."""
    from bohemia_kenya_data_pipeline_spark.jobs import retrieval as rt

    cents = sim.ivf_train_centroids(corpus, n_centroids=64, n_iters=3)
    cb = sim.pq_train_codebooks(corpus, 8, 16)
    path = str(tmp_path / "pqidx64")
    rt.build_ivfpq_index(
        corpus, path, centroids=cents, codebooks=cb, store_vec=True
    )
    truth = ground_truth["topk"](10)
    r_adc = _recall_at_k(
        rt.query_ivfpq_index(spark, path, queries, k=10, n_probe=32), truth, 10
    )
    r_rr50 = _recall_at_k(
        rt.query_ivfpq_index(spark, path, queries, k=10, n_probe=32, rerank=50),
        truth,
        10,
    )
    r_rr200 = _recall_at_k(
        rt.query_ivfpq_index(spark, path, queries, k=10, n_probe=32, rerank=200),
        truth,
        10,
    )
    assert r_adc >= 0.25, r_adc      # measured 0.290
    assert r_rr50 >= 0.68, r_rr50    # measured 0.720
    assert r_rr200 >= 0.88, r_rr200  # measured 0.910 = raw-index @ n_probe=32
    assert r_adc < r_rr50 < r_rr200  # rerank must repair, monotonically


# ---------------------------------------------------------------------------
# Hard-negative mining: candidates= composition (VERDICT r9 ask 3)
# ---------------------------------------------------------------------------


def test_hard_negative_candidates_composition_and_ivf_floor(spark, corpus):
    anchors = corpus.filter(F.col("vec_id") % 100 == 0)
    positives = anchors.select(
        F.col("vec_id").alias("anchor_id"),
        (F.col("vec_id") + 1).alias("positive_id"),
    )
    exact = sim.mine_hard_negatives(
        corpus, anchors, positives, n_neg=3, k_cand=8
    )
    exact_rows = sorted(map(tuple, exact.collect()))
    # an externally generated exact pool is value-identical to the
    # built-in pool — the composition seam changes nothing
    pool = sim.cosine_topk_arrow(corpus, anchors, k=8)
    composed = sim.mine_hard_negatives(
        corpus, anchors, positives, n_neg=3, candidates=pool
    )
    assert sorted(map(tuple, composed.collect())) == exact_rows
    # the sublinear generator: IVF candidates trade recall for the
    # probe-pruned scan — every anchor still gets its n_neg rows, and
    # the (anchor, negative) overlap with exact mining clears the
    # floor measured on this fixture (0.40 with n_probe=2/8 on
    # near-uniform sphere embeddings — ANN's worst case; see module
    # docstring). A plane reseed / probe bug / composition regression
    # trips this immediately.
    ivf_pool = sim.ivf_topk(
        corpus, anchors, k=8, centroids=_IVF_FIXED_RAW, n_probe=2
    )
    ivf_neg = sim.mine_hard_negatives(
        corpus, anchors, positives, n_neg=3, candidates=ivf_pool
    )
    ivf_rows = ivf_neg.collect()
    n_anchors = anchors.count()
    assert len(ivf_rows) == 3 * n_anchors
    exact_pairs = {(r[0], r[1]) for r in exact_rows}
    ivf_pairs = {(r.anchor_id, r.negative_id) for r in ivf_rows}
    overlap = len(exact_pairs & ivf_pairs) / len(exact_pairs)
    assert overlap >= 0.40, overlap
    # hard-negative contract holds under ANY generator: no self, no
    # declared positives, ranks dense 1..n_neg per anchor
    pos = {(r.anchor_id, r.positive_id) for r in positives.collect()}
    assert all((r.anchor_id, r.negative_id) not in pos for r in ivf_rows)
    assert all(r.anchor_id != r.negative_id for r in ivf_rows)
    by_anchor: dict[int, list[int]] = {}
    for r in ivf_rows:
        by_anchor.setdefault(r.anchor_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3] for v in by_anchor.values())
