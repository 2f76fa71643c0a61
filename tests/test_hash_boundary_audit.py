"""Float-quantization hash-stability audit (VERDICT r11 ask 2).

Several oracled entries hash a column of the form ``ROUND(<float
expr> * 10^N)``. The float expr is computed independently by Spark
(JVM libm) and DuckDB (C libm); round 11's ``bm25_search_topk``
showed the two can diverge by ~1.5e-9 RELATIVE (far above the 1-ulp
2.2e-16 textbook bound — summation re-association and vectorized libm
both contribute). If the scaled value ``m = x * 10^N`` sits within
that drift of a ``.5`` rounding boundary, the engines round to
DIFFERENT integers and the value hash flips even though the query is
correct.

Policy (enforced here, documented in COVERAGE.md): a hashed quantized
float must keep a measured boundary distance of at least **1e-6
relative** — ``dist(m, .5) >= 1e-6 * max(1, |m|)`` over every row at
the driver's gate scale (sf0.01). Because dist is capped at 0.5, the
bar is structurally unreachable once ``|m|`` exceeds ~5e5 quantization
units — which is why O(1) statistics rounded at 6 decimals
(``mean_nll``, NB ``score``, ``log_ratio``) could never be made safe
and were moved out of the hash in round 12 (integer/bucket/rank
contracts + rows-only twins), while coarse quantizations
(``nll_centi``, PSI micro-terms, drift at 4 decimals) measure safely
and stay. Ordering contracts (ranks computed FROM floats) are audited
via their adjacent-margin minima against the same divergence model.

DuckDB-only by design: the audit measures the mathematical expression
the two engines share, not either engine's plan.
"""

from __future__ import annotations

import os
import re

import duckdb
import pytest

from bohemia_kenya_data_pipeline_spark.queries import _SQL_TOKS

SF_DIR = os.environ.get("SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.01")

#: minimum allowed relative distance of m = x*10^N from the nearest
#: .5 rounding boundary. The observed cross-engine divergence is
#: ~1.5e-9 relative (BM25, round 11); 1e-6 leaves a ~700x margin.
REL_EPS = 1e-6

_TOKS = _SQL_TOKS.format(c="text")

#: shared CTE: per-doc RAW mean unigram nll (pre-quantization)
_NLL_CTE = f"""
    tok AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
    cnt AS (SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    corpus AS (SELECT token, SUM(c) AS cf FROM cnt GROUP BY 1),
    tot AS (SELECT SUM(cf) AS n_total FROM corpus),
    nll AS (SELECT cnt.doc_id,
                   -SUM(cnt.c * ln(corpus.cf / (1.0 * tot.n_total))) / SUM(cnt.c) AS x
            FROM cnt JOIN corpus USING (token) CROSS JOIN tot
            GROUP BY cnt.doc_id)
"""

#: shared CTE: per-doc RAW dsir importance log-ratio + Gumbel key
_DSIR_CTE = f"""
    tok AS (SELECT doc_id, lang, unnest({_TOKS}) AS token FROM documents),
    cnt AS (SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    corpus_r AS (SELECT token, SUM(c) AS cf_r FROM cnt GROUP BY 1),
    corpus_t AS (SELECT token, COUNT(*) AS cf_t FROM tok WHERE lang = 'en' GROUP BY 1),
    vocab AS (SELECT COALESCE(r.token, t.token) AS token,
                     COALESCE(cf_r, 0) AS cf_r, COALESCE(cf_t, 0) AS cf_t
              FROM corpus_r r FULL OUTER JOIN corpus_t t ON r.token = t.token),
    tots AS (SELECT CAST(SUM(cf_t) AS BIGINT) AS nt,
                    CAST(SUM(cf_r) AS BIGINT) AS nr,
                    CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
    lr AS (SELECT token,
                  LN((cf_t + 1.0) / (nt + v)) - LN((cf_r + 1.0) / (nr + v)) AS lrat
           FROM vocab CROSS JOIN tots),
    perdoc AS (SELECT cnt.doc_id, SUM(cnt.c * lr.lrat) / SUM(cnt.c) AS raw_lr
               FROM cnt JOIN lr USING (token) GROUP BY cnt.doc_id),
    keyed AS (SELECT doc_id,
                     LN(-LN((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|42'), 1, 8))::BIGINT
                             + 0.5) / 4294967296.0)) - raw_lr AS gkey
              FROM perdoc)
"""

#: psi term CTE factory (value vs quantile bucketing share the term)
_PSI_EQUI_CTE = """
    b AS (SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS c
          FROM orders WHERE o_orderdate < DATE '1998-01-01'),
    cu AS (SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS c
           FROM orders WHERE o_orderdate >= DATE '1998-01-01'),
    bounds AS (SELECT MIN(c) AS minc, MAX(c) AS maxc FROM b),
    nb AS (SELECT LEAST(9, GREATEST(0, CAST((c - minc) * 10 // (maxc - minc + 1) AS INTEGER))) AS bucket,
                  COUNT(*) AS n FROM b CROSS JOIN bounds GROUP BY 1),
    nc AS (SELECT LEAST(9, GREATEST(0, CAST((c - minc) * 10 // (maxc - minc + 1) AS INTEGER))) AS bucket,
                  COUNT(*) AS n FROM cu CROSS JOIN bounds GROUP BY 1),
    sc AS (SELECT CAST(g AS INTEGER) AS bucket FROM generate_series(0, 9) t(g)),
    full_b AS (SELECT sc.bucket,
                      CAST(COALESCE(nb.n, 0) AS BIGINT) AS n_base,
                      CAST(COALESCE(nc.n, 0) AS BIGINT) AS n_cur
               FROM sc LEFT JOIN nb USING (bucket) LEFT JOIN nc USING (bucket)),
    sh AS (SELECT bucket, n_base, n_cur,
                  n_base * 1.0 / SUM(n_base) OVER () AS p_raw,
                  n_cur * 1.0 / SUM(n_cur) OVER () AS q_raw
           FROM full_b)
"""

_PSI_QUANTILE_CTE = """
    b AS (SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS c
          FROM orders WHERE o_orderdate < DATE '1998-01-01'),
    cu AS (SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS c
           FROM orders WHERE o_orderdate >= DATE '1998-01-01'),
    cnts AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY 1),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS N FROM cnts),
    cum AS (SELECT c, CAST(SUM(n) OVER (ORDER BY c) AS BIGINT) AS cum FROM cnts),
    pos AS (SELECT CAST(g AS BIGINT) AS i FROM generate_series(1, 9) t(g)),
    cuts AS (SELECT i, MIN(c) AS cut
             FROM cum CROSS JOIN pos CROSS JOIN tot
             WHERE cum >= (i * N + 9) // 10 GROUP BY i),
    arr AS (SELECT list(cut ORDER BY cut) AS cuts FROM cuts),
    nb AS (SELECT CAST(len(list_filter(arr.cuts, x -> x < c)) AS INTEGER) AS bucket,
                  COUNT(*) AS n FROM b CROSS JOIN arr GROUP BY 1),
    nc AS (SELECT CAST(len(list_filter(arr.cuts, x -> x < c)) AS INTEGER) AS bucket,
                  COUNT(*) AS n FROM cu CROSS JOIN arr GROUP BY 1),
    sc AS (SELECT CAST(g AS INTEGER) AS bucket FROM generate_series(0, 9) t(g)),
    full_b AS (SELECT sc.bucket,
                      CAST(COALESCE(nb.n, 0) AS BIGINT) AS n_base,
                      CAST(COALESCE(nc.n, 0) AS BIGINT) AS n_cur
               FROM sc LEFT JOIN nb USING (bucket) LEFT JOIN nc USING (bucket)),
    sh AS (SELECT bucket, n_base, n_cur,
                  n_base * 1.0 / SUM(n_base) OVER () AS p_raw,
                  n_cur * 1.0 / SUM(n_cur) OVER () AS q_raw
           FROM full_b)
"""

_PSI_TERM = """
    SELECT (GREATEST(p_raw, 0.0001) - GREATEST(q_raw, 0.0001))
           * LN(GREATEST(p_raw, 0.0001) / GREATEST(q_raw, 0.0001))
           * 1000000 AS m
    FROM sh
"""

# name -> SQL producing one column `m`: the SCALED pre-round value of
# the entry's hashed quantized column. Every row must clear REL_EPS.
_PROBES: dict[str, str] = {
    # hashed nll_centi = ROUND(ROUND(x,6)*100) -> m = ROUND(x,6)*100.
    # (The inner 6dp round shifts m by <= 5e-5 — two orders under the
    # measured 3e-3 boundary distance, so probing round6(x)*100 covers
    # the double-rounding path.)
    "unigram_logprob": f"""
        WITH {_NLL_CTE}
        SELECT ROUND(x, 6) * 100 AS m FROM nll
    """,
    # term_u = ROUND(x * 1e6, 0) -> m already scaled
    "psi_price_drift": f"WITH {_PSI_EQUI_CTE} {_PSI_TERM}",
    "psi_price_drift_quantile": f"WITH {_PSI_QUANTILE_CTE} {_PSI_TERM}",
    # drift = ROUND(x, 4) -> m = x * 1e4 per label
    "embedding_drift_by_label": """
        WITH halves AS (
          SELECT label, vec_id % 2 AS half, embedding FROM embeddings),
        dims AS (
          SELECT h.label, h.half, t.i - 1 AS pos,
                 AVG(h.embedding[CAST(t.i AS INTEGER)]) AS m
          FROM halves h, UNNEST(generate_series(1, len(h.embedding))) AS t(i)
          GROUP BY 1, 2, 3),
        joined AS (
          SELECT a.label, a.pos, a.m AS ma, b.m AS mb
          FROM dims a JOIN dims b ON a.label = b.label AND a.pos = b.pos
          WHERE a.half = 0 AND b.half = 1),
        sums AS (
          SELECT label, SUM(ma * mb) AS dot,
                 SQRT(SUM(ma * ma)) AS na, SQRT(SUM(mb * mb)) AS nb
          FROM joined GROUP BY 1)
        SELECT (1.0 - dot / (na * nb)) * 1e4 AS m FROM sums
    """,
}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "orders", "embeddings"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return c


@pytest.mark.parametrize("name", sorted(_PROBES))
def test_hashed_round_column_is_off_boundary(con, name):
    row = con.sql(
        f"""
        WITH probe AS ({_PROBES[name]})
        SELECT MIN(ABS(m - FLOOR(m) - 0.5) / GREATEST(1.0, ABS(m))) AS d,
               COUNT(*) AS n
        FROM probe WHERE m IS NOT NULL
        """
    ).fetchone()
    assert row[1] > 0, f"{name}: probe returned no rows"
    assert row[0] >= REL_EPS, (
        f"{name}: a hashed ROUND column sits {row[0]:.3e} (relative) from "
        f"a .5 rounding boundary — under the {REL_EPS} audit bar, so a "
        f"cross-libm ulp can flip the hash; change the hashed contract "
        f"to a rank/bucket/count (see bm25_search_topk)"
    )


def test_bm25_rank_margins_dominate_quantization(con):
    """The rank-only BM25 contract (round 12 fix): adjacent
    score_micros within each query must differ by far more than the
    1-micro worst-case quantization flip, so the hashed rank column
    cannot be reordered by the float drift that killed the old
    score-hash contract."""
    from bohemia_kenya_data_pipeline_spark.queries import _BM25_CTE

    row = con.sql(
        f"""
        WITH {_BM25_CTE},
        top AS (SELECT * FROM bm25r WHERE rank <= 11)
        SELECT MIN(score_micros - next_s) FROM (
          SELECT score_micros,
                 LEAD(score_micros) OVER (PARTITION BY query_id
                                          ORDER BY rank) AS next_s
          FROM top) WHERE next_s IS NOT NULL
        """
    ).fetchone()
    # >= 4 micros = each engine can misround every term by a full micro
    # in opposite directions and the ranking still cannot flip
    assert row[0] >= 4, f"bm25 adjacent rank margin {row[0]} micros too thin"


def test_classifier_pred_margin(con):
    """quality_classifier_score hashes pred = rounded-score > 0: the
    boolean flips only if a raw score sits within cross-engine drift
    of 0. Assert the decision margin clears the audit bar."""
    row = con.sql(
        f"""
        WITH tok AS (SELECT doc_id, n_chars >= 300 AS pos,
                            unnest({_TOKS}) AS token
                     FROM documents),
        cls AS (SELECT token, COUNT(*) AS c,
                       SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS pc,
                       SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS nc
                FROM tok GROUP BY 1),
        vocab AS (SELECT * FROM cls ORDER BY c DESC, token ASC LIMIT 256),
        tot AS (SELECT SUM(pc) AS pt, SUM(nc) AS nt FROM vocab),
        w AS (SELECT token,
                     ln((pc + 1.0) / (pt + 256.0)) - ln((nc + 1.0) / (nt + 256.0)) AS w
              FROM vocab CROSS JOIN tot),
        prior AS (SELECT ln(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) * 1.0
                            / SUM(CASE WHEN n_chars >= 300 THEN 0 ELSE 1 END)) AS p
                  FROM documents),
        ds AS (SELECT tok.doc_id, SUM(w.w) AS s FROM tok JOIN w USING (token) GROUP BY 1)
        SELECT MIN(ABS(COALESCE(ds.s, 0) + prior.p)),
               MAX(ABS(COALESCE(ds.s, 0) + prior.p))
        FROM documents d LEFT JOIN ds ON d.doc_id = ds.doc_id
        CROSS JOIN prior
        """
    ).fetchone()
    assert row[0] / max(1.0, row[1]) >= REL_EPS, (
        f"classifier pred margin {row[0]:.3e} too thin vs scale {row[1]:.3e}"
    )


def test_perplexity_bucket_cut_margins(con):
    """perplexity_buckets hashes the head/middle/tail bucket, an
    order statistic over the 6-decimal nll ranking: bucket membership
    flips only if two docs straddling a cut swap. Assert every
    per-language cut gap dwarfs the 1e-6 worst-case rounding jump."""
    row = con.sql(
        f"""
        WITH {_NLL_CTE},
        ranked AS (SELECT nll.x, d.lang,
                          ROW_NUMBER() OVER (PARTITION BY d.lang
                                             ORDER BY nll.x ASC, nll.doc_id ASC) AS rn,
                          COUNT(*) OVER (PARTITION BY d.lang) AS cg
                   FROM nll JOIN documents d USING (doc_id)),
        g AS (SELECT x, LEAD(x) OVER (PARTITION BY lang ORDER BY rn) AS nx,
                     ((rn - 1) * 3) // cg AS b, (rn * 3) // cg AS b_next
              FROM ranked)
        SELECT MIN(nx - x) FROM g WHERE nx IS NOT NULL AND b <> b_next
        """
    ).fetchone()
    # a bucket flip requires the two docs straddling a cut to SWAP:
    # worst case each jumps 1e-6 in opposite directions (both raw
    # values at their 6dp boundaries), so any gap > 2e-6 makes a flip
    # DETERMINISTICALLY impossible; 4e-6 doubles that. Measured:
    # 1.4e-5 at sf0.01 (the driver gate), 6.8e-6 at sf0.001 (the
    # pytest differential) — both impossible-to-flip.
    assert row[0] >= 4e-6, f"bucket-cut margin {row[0]:.3e} too thin"


def test_dsir_gumbel_key_ordering_margin(con):
    """dsir_importance_sample hashes rank only; the rank orders by a
    float Gumbel key ln(-ln(u)) - raw_lr (u hash-exact, raw_lr float).
    Assert adjacent keys in the top slice are separated by far more
    than cross-libm drift."""
    row = con.sql(
        f"""
        WITH {_DSIR_CTE},
        ranked AS (SELECT gkey,
                          LEAD(gkey) OVER (ORDER BY gkey, doc_id) AS next_g
                   FROM keyed QUALIFY ROW_NUMBER() OVER (ORDER BY gkey, doc_id) <= 120)
        SELECT MIN(next_g - gkey), MAX(ABS(gkey)) FROM ranked WHERE next_g IS NOT NULL
        """
    ).fetchone()
    assert row[0] / max(1.0, row[1]) >= REL_EPS, (
        f"dsir Gumbel-key margin {row[0]:.3e} too thin vs scale {row[1]:.3e}"
    )


def test_jsd_micro_total_absorbs_term_flips(con):
    """jsd_lang_drift hashes the micro-rounded nano total. Two-level
    audit: (a) the nano total must sit >= 100 nanos from the micro
    rounding boundary; (b) at most a few per-term c_nano values may sit
    near their own .5 boundary (each flip shifts the total by 1 nano),
    and their combined worst case must stay an order under (a)."""
    row = con.sql(
        f"""
        WITH bt AS (SELECT unnest({_TOKS}) AS term FROM documents WHERE lang = 'en'),
        ct AS (SELECT unnest({_TOKS}) AS term FROM documents WHERE lang <> 'en'),
        b AS (SELECT term, COUNT(*) AS n_b FROM bt GROUP BY 1),
        c AS (SELECT term, COUNT(*) AS n_c FROM ct GROUP BY 1),
        fj AS (SELECT COALESCE(b.term, c.term) AS term,
                      COALESCE(n_b, 0) AS n_b, COALESCE(n_c, 0) AS n_c
               FROM b FULL OUTER JOIN c ON b.term = c.term),
        t AS (SELECT SUM(n_b) AS tb, SUM(n_c) AS tc FROM fj),
        pt AS (SELECT (CASE WHEN n_b > 0 THEN
                         0.5 * (n_b * 1.0 / tb)
                             * LN((n_b * 1.0 / tb) / (((n_b * 1.0 / tb) + (n_c * 1.0 / tc)) / 2))
                             / 0.6931471805599453
                       ELSE 0 END
                       + CASE WHEN n_c > 0 THEN
                           0.5 * (n_c * 1.0 / tc)
                               * LN((n_c * 1.0 / tc) / (((n_b * 1.0 / tb) + (n_c * 1.0 / tc)) / 2))
                               / 0.6931471805599453
                         ELSE 0 END) * 1000000000 AS m
               FROM fj CROSS JOIN t)
        SELECT CAST(SUM(CAST(ROUND(m, 0) AS BIGINT)) AS BIGINT) AS total_nanos,
               SUM(CASE WHEN ABS(m - FLOOR(m) - 0.5)
                             < 1e-6 * GREATEST(1.0, ABS(m)) THEN 1 ELSE 0 END)
                 AS n_risky
        FROM pt
        """
    ).fetchone()
    total, n_risky = int(row[0]), int(row[1])
    frac = total % 1000
    dist = abs(frac - 500)
    assert dist >= 100, f"jsd nano total {total} sits {dist} nanos from boundary"
    assert n_risky * 10 <= dist, (
        f"{n_risky} boundary-near terms could shift the total vs {dist}-nano margin"
    )


def test_audio_pcm_truncation_boundaries(con):
    """audio_spectral_features' only cross-engine freedom is sin():
    both engines truncate 16383.5*sin(theta) to int16 from
    bit-identical theta. Level 1: no sample may sit within drift of a
    truncation (integer) boundary. Level 2: even if a few samples DID
    flip by one PCM unit, the rms ROUND(.,4) boundary distance must
    dwarf the resulting shift (~2.5e-5 per flipped sample).

    The nearest-integer-0 samples (sin(pi*n) ~ +/-1e-16 at the tone's
    zero crossings) are excluded from level 1: truncation toward zero
    maps BOTH signs to 0, so no drift there can change the PCM."""
    row = con.sql(
        """
        WITH d AS (SELECT doc_id, 250.0 * (1 + doc_id % 8) AS f
                   FROM documents WHERE doc_id < 64),
        s AS (SELECT doc_id, 16383.5 * SIN(((2 * PI()) * f) * (t.k / 8000.0)) AS v
              FROM d, range(0, 2048) t(k)),
        q AS (SELECT doc_id, v, CAST(TRUNC(v) AS BIGINT) AS s FROM s),
        agg AS (SELECT doc_id, SUM(s * s) AS ss FROM q GROUP BY 1),
        rms AS (SELECT SQRT(ss / (2048.0 * 1073741824.0)) * 1e4 AS m FROM agg)
        SELECT (SELECT MIN(ABS(v - ROUND(v, 0))) FROM s
                WHERE ROUND(v, 0) <> 0),
               (SELECT MIN(ABS(m - FLOOR(m) - 0.5)) FROM rms)
        """
    ).fetchone()
    sample_dist, rms_dist = float(row[0]), float(row[1])
    # sin ulp drift is ~2e-12 absolute at this amplitude; 1e-9 = 500x
    assert sample_dist >= 1e-9, f"PCM sample {sample_dist:.3e} from trunc boundary"
    # a flipped sample moves m by ~2.5e-5; demand 40x headroom
    assert rms_dist >= 1e-3, f"rms quantization margin {rms_dist:.3e} too thin"


def test_curation_release_pred_margin_on_gated_corpus(con):
    """curation_release_e2e routes rows through pred computed over the
    GATED corpus (different weights/prior than the full-corpus
    classifier entry): its decision margin needs its own audit."""
    row = con.sql(
        f"""
        WITH thr AS (SELECT source AS grp, quantile_cont(n_chars, 0.25) AS t
                     FROM documents GROUP BY 1),
        gated AS (SELECT d.* FROM documents d
                  JOIN thr ON d.source IS NOT DISTINCT FROM thr.grp
                  WHERE d.n_chars >= thr.t),
        tok AS (SELECT doc_id, n_chars >= 300 AS pos,
                       unnest({_TOKS}) AS token FROM gated),
        cls AS (SELECT token, COUNT(*) AS c,
                       SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS pc,
                       SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS nc
                FROM tok GROUP BY 1),
        vocab AS (SELECT * FROM cls ORDER BY c DESC, token ASC LIMIT 256),
        tot AS (SELECT SUM(pc) AS pt, SUM(nc) AS nt FROM vocab),
        w AS (SELECT token,
                     ln((pc + 1.0) / (pt + 256.0)) - ln((nc + 1.0) / (nt + 256.0)) AS w
              FROM vocab CROSS JOIN tot),
        prior AS (SELECT ln(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) * 1.0
                            / SUM(CASE WHEN n_chars >= 300 THEN 0 ELSE 1 END)) AS p
                  FROM gated),
        ds AS (SELECT tok.doc_id, SUM(w.w) AS s FROM tok JOIN w USING (token) GROUP BY 1)
        SELECT MIN(ABS(COALESCE(ds.s, 0) + prior.p)),
               MAX(ABS(COALESCE(ds.s, 0) + prior.p))
        FROM gated g LEFT JOIN ds ON g.doc_id = ds.doc_id
        CROSS JOIN prior
        """
    ).fetchone()
    assert row[0] / max(1.0, row[1]) >= REL_EPS, (
        f"gated-corpus pred margin {row[0]:.3e} too thin vs {row[1]:.3e}"
    )


def test_embedding_centroids_4dp_off_boundary(con):
    """embedding_centroids hashes ROUND(AVG(component), 4): a float
    AVG re-associates across engines (~1e-13 relative), and 6 decimals
    measured 1.1e-7 relative — under the bar — so the contract moved
    to 4 decimals; pin the measured margin."""
    row = con.sql(
        """
        WITH c AS (SELECT label, i, AVG(embedding[i]) AS a
                   FROM embeddings, range(1, 65) t(i) GROUP BY 1, 2)
        SELECT MIN(ABS(a * 1e4 - FLOOR(a * 1e4) - 0.5)
                   / GREATEST(1.0, ABS(a * 1e4)))
        FROM c
        """
    ).fetchone()
    assert row[0] >= REL_EPS, f"centroid 4dp margin {row[0]:.3e} under bar"


def test_tfidf_rank_ordering_margin(con):
    """tfidf_top_terms hashes rank-only, ordered by the RAW tf*ln
    product: adjacent distinct raw values in the top-4 slice must be
    separated by far more than cross-libm drift (exact ties — same
    (tf, df) — are bit-equal within each engine and fall to the token
    tie-break, so they are excluded here)."""
    row = con.sql(
        f"""
        WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT COUNT(*) AS n_total FROM documents),
        sc AS (SELECT tf.doc_id, tf.token,
                      tf.tf * ln(n.n_total / (1.0 * dfreq.df)) AS x
               FROM tf JOIN dfreq USING (token) CROSS JOIN n),
        rk AS (SELECT doc_id, x,
                      ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY x DESC, token ASC) AS r
               FROM sc),
        top AS (SELECT doc_id, x, LEAD(x) OVER (PARTITION BY doc_id
                                                ORDER BY r) AS nx
                FROM rk WHERE r <= 4)
        SELECT MIN((x - nx) / GREATEST(1.0, ABS(x)))
        FROM top WHERE nx IS NOT NULL AND x <> nx
        """
    ).fetchone()
    assert row[0] >= REL_EPS, f"tfidf rank margin {row[0]:.3e} under bar"


def test_nearest_centroid_argmin_margin(con):
    """nearest_centroid_confusion hashes assignment COUNTS: the argmin
    orders raw squared distances to 4-decimal centroids (identical on
    both engines), so the only freedom is the distance fold's
    summation order (~1e-13 relative). Pin the top-2 margin."""
    row = con.sql(
        """
        WITH cent AS (
          SELECT label AS c_label, i, ROUND(AVG(embedding[i]), 4) AS c
          FROM embeddings, range(1, 65) t(i) GROUP BY 1, 2),
        cvec AS (SELECT c_label, list(c ORDER BY i) AS cent FROM cent GROUP BY 1),
        scored AS (
          SELECT e.vec_id, c.c_label,
                 list_sum([
                   (CAST(e.embedding[i] AS DOUBLE) - c.cent[i])
                   * (CAST(e.embedding[i] AS DOUBLE) - c.cent[i])
                   for i in range(1, 65)]) AS d
          FROM embeddings e CROSS JOIN cvec c),
        rk AS (SELECT vec_id, d,
                      ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY d, c_label) AS rk
               FROM scored)
        SELECT MIN((b.d - a.d) / GREATEST(1.0, a.d))
        FROM rk a JOIN rk b ON a.vec_id = b.vec_id AND a.rk = 1 AND b.rk = 2
        WHERE b.d <> a.d
        """
    ).fetchone()
    assert row[0] >= REL_EPS, f"argmin margin {row[0]:.3e} under bar"


def test_migrated_contracts_hash_no_floats(con):
    """Round 13 retired the grandfathered 6-decimal float-hash surface
    (VERDICT r12 ask 2): rdt_irr now hashes exact per-arm integer
    sufficient statistics, corr_covar_rollup hashes exact integer
    moments of quantized units, pagerank_trade_graph hashes the
    fixed-point ppm recurrence, and prevalence_incidence_report
    dropped its six ln/exp IRR columns to a rows-only twin. This probe
    pins the retirement structurally: none of the three fully-migrated
    oracles may emit a float column again."""
    from bohemia_kenya_data_pipeline_spark.queries import ORACLES, QUERIES

    for t in ("lineitem", "orders", "events", "customer"):
        con.execute(
            f"CREATE VIEW IF NOT EXISTS {t} AS "
            f"SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    for name in ("rdt_irr", "corr_covar_rollup", "pagerank_trade_graph"):
        rel = con.sql(ORACLES[name])
        bad = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if str(t) not in ("BIGINT", "INTEGER", "VARCHAR", "BOOLEAN")
        ]
        assert not bad, f"{name}: non-integer hashed columns {bad}"
    # the float math stays available (and row-counted) in the twins
    for twin in (
        "rdt_irr_scores",
        "corr_covar_scores",
        "pagerank_trade_scores",
        "prevalence_incidence_scores",
    ):
        assert twin in QUERIES and twin not in ORACLES


def test_prevalence_report_lnfree_columns_floor(con):
    """prevalence_incidence_report keeps its division/sqrt-chain
    columns hashed at 6 decimals: every input is an exact integer
    aggregate (counts; integer-valued day sums), 365.25 is dyadic
    (1461/4), and division/sqrt/literal-multiply are exactly-rounded
    IEEE ops — so both engines compute bit-identical doubles and the
    only cross-engine freedom left is the two ROUND implementations'
    disagreement band (~1e-12 relative, the ln-free class). Measure
    the worst boundary distance across ALL rounded report columns and
    require the ln-free floor."""
    from bohemia_kenya_data_pipeline_spark.queries import ORACLES

    con.execute(
        "CREATE VIEW IF NOT EXISTS lineitem AS "
        f"SELECT * FROM '{SF_DIR}/lineitem.parquet'"
    )
    raw = ORACLES["prevalence_incidence_report"]
    for col, scale in (
        ("ROUND(r3.prev_u, 6) AS Prevalence", "r3.prev_u * 1e6 AS m1"),
        (
            "ROUND(r3.inc_u, 6) AS Incidence",
            "r3.inc_u * 1e6 AS m2",
        ),
    ):
        assert col in raw, f"oracle drifted; update this probe: {col}"
        raw = raw.replace(col, scale)
    worst = 1.0
    n = 0
    for r in con.sql(
        "SELECT m1, m2 FROM (" + raw + ")"
    ).fetchall():
        for m in r:
            if m is None:
                continue
            n += 1
            worst = min(worst, abs(m - int(m // 1) - 0.5) / max(1.0, abs(m)))
    assert n > 0
    assert worst >= 1e-10, f"prevalence ln-free floor broke: {worst:.3e}"


# ---------------------------------------------------------------------------
# Round-13 sweep (VERDICT r12 ask 3): the ROUND(SUM(money), 2) report
# surface, measured — not assumed.
#
# Money columns in the testdata are 2-decimal at source, so their
# doubles deviate from exact cents by <= 2^-52 relative per row and a
# PURE money sum scaled by 1e2 lands within ~1e-3 of an INTEGER —
# i.e. >= ~0.499 away from the .5 rounding boundary, robust against
# any summation-order noise (measured 0.4997+ on every probed entry).
#
# PRODUCT sums (price*(1-disc), price*disc) live on a 0.01 grid after
# scaling (2dp x 2dp = 4dp per row), so their boundary distance is a
# grid multiple >= 0.01 UNLESS a data regeneration lands a gridpoint
# exactly on .5 — the one configuration where cross-engine summation
# noise (~2.5e-4 at the largest probed magnitude) decides the hash.
# These probes are the tripwire: floors at half a grid step (0.005),
# far above the noise band, failing LOUDLY on a boundary landing so
# the affected column migrates to exact integer cent-percent units
# (the corr_covar_rollup pattern) instead of flipping a driver row.
# ---------------------------------------------------------------------------


def _unround(sql: str, alias: str) -> tuple[str, int]:
    """Rewrite ``ROUND(expr, d) AS alias`` to ``((expr) * 1e<d>) AS
    alias`` via a paren-balanced scan (nested CASE/parens safe).
    Raises on pattern drift so a reworked oracle forces a probe
    update rather than silently probing nothing."""
    m = re.search(r"\sAS\s+" + re.escape(alias) + r"\b", sql)
    assert m, f"alias {alias} not found"
    i = m.start()
    j = sql.rfind("ROUND(", 0, i)
    assert j >= 0, f"no ROUND( before {alias}"
    depth = 0
    k = j + len("ROUND(") - 1
    end = last_comma = None
    for p in range(k, i):
        c = sql[p]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                end = p
                break
        elif c == "," and depth == 1:
            last_comma = p
    assert end is not None and last_comma is not None, f"unbalanced ROUND for {alias}"
    assert not sql[end + 1 : i].strip(), f"ROUND not adjacent to AS {alias}"
    expr = sql[k + 1 : last_comma]
    d = int(sql[last_comma + 1 : end].strip())
    return sql[:j] + "((" + expr + ") * 1e" + str(d) + ")" + sql[end + 1 :], d


#: (entry, hashed column) -> minimum boundary distance of the SCALED
#: value. Classes: 0.4 = pure 2dp money/qty sum (near-integer);
#: 0.005 = 4dp-product sum on the 0.01 grid (half a grid step);
#: 1e-3 = 4dp ratio/mean of money aggregates (measured 0.0074-0.27,
#: noise < 1e-5).
_MONEY_FLOORS = {
    ("pricing_summary", "sum_qty"): 0.4,
    ("pricing_summary", "sum_base_price"): 0.4,
    ("sessionize_events", "session_value"): 0.4,
    ("zorder_fold_scan", "revenue"): 0.4,
    ("manifest_skip_scan", "revenue"): 0.4,
    ("rfm_segments", "monetary"): 0.4,
    ("grouping_sets_sales", "revenue"): 0.4,
    ("join_inner_fact_dim", "revenue"): 0.4,
    ("pricing_summary", "sum_disc_price"): 0.005,
    ("pricing_summary", "sum_charge"): 0.005,
    ("join_left_broadcast_dim", "revenue"): 0.005,
    ("tpch_q3_shipping_priority", "revenue"): 0.005,
    ("tpch_q5_local_supplier_volume", "revenue"): 0.005,
    ("tpch_q6_forecast_revenue", "revenue"): 0.005,
    ("tpch_q7_volume_shipping", "revenue"): 0.005,
    ("tpch_q10_returned_items", "revenue"): 0.005,
    ("tpch_q15_top_supplier", "total_revenue"): 0.005,
    ("tpch_q19_disjunctive_revenue", "revenue"): 0.005,
    ("pricing_summary", "avg_qty"): 1e-3,
    ("pricing_summary", "avg_price"): 1e-3,
    ("pricing_summary", "avg_disc"): 1e-3,
    ("tpch_q14_promo_revenue", "promo_pct"): 1e-3,
    ("tpch_q8_market_share", "mkt_share"): 1e-3,
}


@pytest.mark.parametrize("entry,alias", sorted(_MONEY_FLOORS))
def test_money_sum_boundary_floors(con, entry, alias):
    from bohemia_kenya_data_pipeline_spark.queries import ORACLES

    for t in ("lineitem", "orders", "customer", "supplier", "nation",
              "region", "part", "events"):
        con.execute(
            f"CREATE VIEW IF NOT EXISTS {t} AS "
            f"SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    sql, _d = _unround(ORACLES[entry], alias)
    rows = [
        r[0]
        for r in con.sql(f"SELECT {alias} FROM ({sql})").fetchall()
        if r[0] is not None
    ]
    if not rows:
        # an all-NULL column (e.g. a disjunctive filter matching
        # nothing at this SF) is trivially hash-stable
        return
    worst = min(abs(m - int(m // 1) - 0.5) for m in rows)
    floor = _MONEY_FLOORS[(entry, alias)]
    assert worst >= floor, (
        f"{entry}.{alias}: scaled boundary distance {worst:.6f} under the "
        f"{floor} floor — a data regeneration landed a grid point on the "
        f".5 boundary; migrate this column to exact integer units (see "
        f"corr_covar_rollup, round 13)"
    )
