#!/usr/bin/env python
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized through the `noop` sink (executes the
whole plan on the executors, no driver collect) — so the timing covers
scan + shuffle + compute, exactly what a cluster run pays.

Every entry runs FIVE times: run 1 pays JIT/codegen warm-up (~3 s on
heavy plans) and is recorded as ``queries_warm``; ``queries`` (and
``value``) report STEADY state as the median of runs 3..5 — the number
that scales to a long-lived cluster. Round-7 change (VERDICT r6 ask 3):
a single second-run sample systematically overstated steady by up to
35% on JIT-heavy entries (6-repeat evidence on
spatial_nearest_hf_bucketed: 9.06 warm, then 3.99, 3.48, 3.04, 2.90,
2.96 — run #2 is not yet steady), which burned three consecutive
rounds of noise investigation; median-of-3 from run 3 onward retires
that class. Run 2 is a discarded ramp run.

``cleaning_dag_e2e`` is the composed raw→clean→sanitized(+anomalies)
jobs/ DAG over an ODK-shaped frame derived from the events table — the
end-to-end pipeline wall-time, not a per-operator query.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from bohemia_kenya_data_pipeline_spark import jobs  # noqa: E402
from bohemia_kenya_data_pipeline_spark.operators import quality as ql  # noqa: E402
from bohemia_kenya_data_pipeline_spark.queries import QUERIES, _events  # noqa: E402
from bohemia_kenya_data_pipeline_spark.session import get_spark  # noqa: E402

#: Representative headline set: one per operator family (scan+agg,
#: joins, windows, sessionize, pivot, as-of expansion, dedup pack,
#: similarity pack, text pack).
HEADLINE = [
    "goals_cascade",
    "resolution_delete_set",
    "rdt_state_machine",
    "spatial_cluster_assign",
    "pricing_summary",
    "join_inner_fact_dim",
    "join_left_broadcast_dim",
    "latest_order_per_customer",
    "count_distinct_exact",
    "window_top_n_per_group",
    "asof_weekly_snapshots",
    "sessionize_events",
    "pivot_status_by_month",
    "exact_duplicates",
    "minhash_lsh_pairs",
    "cosine_topk",
    "ivf_topk",
    # NOTE r5: warm time rose 3.25->4.42 s when the single-level
    # fallback became hierarchical escalation (spatial.py:543) — the
    # local cost of cutting the constant-density scale slope from 1.88
    # to 0.217 (BENCH_scale_r05.json). Expected; don't re-investigate.
    # NOTE r6: steady band measured 2.4-3.3 s across r5/r6 records and
    # a 5-repeat re-run (machine-load noise class, BASELINE.md) — a
    # 1.3x swing between two single measurements is not a regression.
    "spatial_nearest_hf_bucketed",
    "chunk_documents",
    "quality_features",
    "corpus_curation",
    "ngram_contamination",
    "repetition_features",
    "pack_sequences",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q10_returned_items",
    "tpch_q17_small_quantity_revenue",
    "tpch_q21_waiting_supplier",
    "pq_topk",
    "quantized_cosine_topk",
    "pretrain_mix",
    "line_dedup_corpus",
    "fuzzy_pairs_edit1",
    "efficacy_status_matrix",
    "tpch_q9_product_profit",
    "icf_verification_metrics",
    "pharmacy_ledger_reconciliation",
    "token_budget_take",
    # round-4 continuation additions: bloom pruning, sketch family,
    # graph iteration, basket mining, survival analysis
    "bloom_pruned_join",
    "cms_user_counts",
    "bitmap_distinct_rollup",
    "pagerank_trade_graph",
    "market_basket_brand_pairs",
    "retention_cohorts",
    "kaplan_meier_churn",
    "weighted_sample_docs",
    "ivm_maintained_agg",
    "bitmap_user_overlap",
    "cusum_drift_alarms",
    "attribution_last_touch",
    "embedding_drift_by_label",
    # round-5 continuation: semantic dedup, drift gates, as-of join,
    # Gopher quality, temperature remix
    "semantic_dedup_pairs",
    "asof_last_click",
    "gopher_quality_gate",
    "psi_price_drift",
    "temperature_mix_sample",
    "jsd_lang_drift",
    # round-6: production-regime ANN (fixed query batch, pruned probes)
    # promoted from scale_bench constructions to oracled entries.
    # ORACLE BASELINES vs PRODUCTION PATHS (VERDICT r6 ask 2): the
    # non-_arrow entries keep the expression-fold scoring plan so the
    # DuckDB hash compare checks the exact pair math — they are
    # deliberately superlinear at depth (slope_tail ~1.0-1.18 at 30x,
    # BENCH_scale_r06.json; cause: interpreted per-pair fold, see
    # SCALING.md "interpreted islands"). USE THE `_arrow` VARIANTS IN
    # PRODUCTION (slope_tail 0.09-0.29); never copy the fold plan.
    "ivf_ann_fixedq",          # oracle baseline — production: _arrow
    "cosine_fixedq",           # oracle baseline — production: _arrow
    "cosine_fixedq_arrow",
    "quantized_fixedq",        # oracle baseline — production: _arrow
    "quantized_fixedq_arrow",
    "ivf_ann_fixedq_arrow",
    # round-6: curation DAG with the Lee et al. substring-dedup stage
    "pretrain_mix_spans",
    "rfm_segments_scalable",
    "randomization_preselection",
    # round-7: CDC log replay (broadcast anti-join MERGE plan) and the
    # grid-bucketed range join (the equi-join rewrite of a range
    # predicate; see BENCH_scale_r07.json for both scaling regimes)
    "cdc_log_compaction",
    "interval_overlap_promos",
    "attribution_multi_touch",
    "semantic_decontamination",
    "quantile_sketch_prices",
    "ann_index_fixedq",        # serving-index regime (build + pruned query)
    "ivm_join_view",
    # round-8: composed CDC lakehouse maintenance (3 chained batches ->
    # snapshot MERGE + join-view IVM + aggregate IVM, no fact rescan)
    "lakehouse_cdc_e2e",
    # round-8: compressed serving index — codes-on-disk ADC over probed
    # partitions, and the two-stage (ADC candidates -> exact rerank)
    # serving shape; both include the index BUILD in the timing, like
    # ann_index_fixedq
    "ann_ivfpq_fixedq",
    "ann_ivfpq_rerank_fixedq",
    # round-8: file-manifest data skipping (write range-clustered copy
    # + build manifest + pruned scan, all inside the timing)
    "manifest_skip_scan",
    "bloom_skip_lookup",
    # round-8: steady-state near-dup ingest (index build + extend +
    # probe, timing includes all three passes)
    "incremental_minhash_dedup",
    # round-10: manifest lifecycle additions — append + fingerprint
    # extend + pruned read; z-order rewrite + two-sided box skipping
    "incremental_manifest_extend",
    "zorder_manifest_scan",
    "minhash_index_delete_probe",
    "incremental_ivfpq_ann",
    "hard_negatives_composed",
    # round-10: maintenance-loop action — tombstoned delete batch +
    # warm-start Lloyd retrain over the live index + in-place rewrite
    # (timing includes the initial build; the retrain reads only the
    # index, never the corpus)
    "ann_index_retrain",
    # round-11: MMR diversity re-rank over the fixed-query cosine pool
    # (generator + greedy applyInPandas re-rank, pool-bounded)
    "mmr_rerank_fixedq",
    # round-11: corpus-curation additions — in-job learned NB quality
    # classifier (train + broadcast-score in one plan), the pre-flight
    # key-skew diagnostic, and the stratified per-source quantile gate
    "quality_classifier_score",
    "skew_key_profile",
    "quantile_gate_by_source",
    # round-11: OPTIMIZE-shaped incremental z-order (init 60% + raw
    # append 40% + delta-only re-cluster + manifest repair + box read)
    "incremental_zorder_scan",
    # round-12: the curation trio composed as ONE hash-checked DAG:
    # quantile gate -> NB classify (trained on the gated corpus) ->
    # exact dedup -> per-source packing; integer-only output contract
    "curation_release_e2e",
    # round-12: generation folding (init + 2 append/extend ticks +
    # fold of the delta generations + box read; base never rewritten).
    # LIFECYCLE-PRICED (~11 s steady): the cost is five physical write
    # passes + a manifest build/repair, each hash-guarded through the
    # final pruned read — profile: init 8.0 / manifest 2.6 / 2x
    # append+extend 5.8 / fold+repair 8.3 / read 1.1 (cold); the
    # read itself is 1 s. Same class as incremental_zorder_scan.
    "zorder_fold_scan",
]


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _cleaning_dag_e2e(spark, sf_dir: str) -> None:
    """Composed jobs/ DAG at benchmark scale: synthesize an ODK-shaped
    raw form from the events table, run clean_form -> sanitize_form and
    the anomaly detectors, materialize every zone output."""
    ev = _events(spark, sf_dir)
    uid, eid = F.col("user_id"), F.col("event_id")
    raw = ev.select(
        F.concat(F.lit("uuid:"), eid.cast("string")).alias("meta-instanceID"),
        F.lpad(uid.cast("string"), 5, "0").alias("group_hh-hhid"),
        F.upper(F.col("event_type")).alias("group_hh-village"),
        (F.lit(-4.0) + F.pmod(uid, F.lit(999)) / 1000.0).alias("group_geo-Latitude"),
        (F.lit(39.0) + F.pmod(uid * 7, F.lit(999)) / 1000.0).alias("group_geo-Longitude"),
        F.col("value").alias("group_geo-Accuracy"),
        F.concat(F.lit("name"), uid.cast("string")).alias("firstname"),
        F.lit(None).cast("string").alias("unused_note"),
        F.pmod(eid, F.lit(90)).cast("string").alias("age"),
    )
    i = F.col("id")
    resolution = spark.range(200).select(
        F.lit("bench").alias("Form"),
        F.concat(F.lit("uuid:"), (i * 97).cast("string")).alias("instanceID"),
        F.when(i % 2 == 0, F.lit("age")).alias("Column"),
        F.when(i % 2 == 0, F.lit("42")).alias("Set To"),
        F.when(i % 2 == 0, F.lit("SET")).otherwise(F.lit("DELETE")).alias("Operation"),
        F.lit("").alias("RepeatName"),
        F.lit(0).alias("RepeatKey"),
        i.cast("int").alias("resolution_order"),
    )
    clean = jobs.clean_form(
        raw.withColumn("age", F.col("age").try_cast("double")),
        resolution,
        "bench",
        typo_fixes={"village": {"CLICK": "CLICKED"}},
    )
    # three zone sinks fan out from one cleaned frame; persisting it is
    # the standard multi-output pattern (otherwise each sink re-runs
    # the whole correction engine)
    clean = clean.persist()
    try:
        sanitized = jobs.sanitize_form(clean, ["firstname"], ["instanceID", "hhid"])
        keyed = clean.withColumnRenamed("instanceID", "KEY")
        final, summary = jobs.run_anomaly_detection(
            [
                lambda: ql.detect_threshold(
                    keyed, "Accuracy", "bench", "gps_accuracy", "GPS accuracy above 15m", 15.0
                ),
                lambda: ql.detect_duplication(keyed, "hhid", "bench", "dup_hhid"),
            ]
        )
        # summary is a rollup OF final: persist final so the summary
        # sink folds the cached anomaly rows instead of re-running the
        # detectors (same multi-output pattern as `clean` above)
        final = final.persist()
        try:
            _noop(sanitized)
            _noop(final)
            _noop(summary)
        finally:
            final.unpersist()
    finally:
        clean.unpersist()


_QUANT_CACHE: dict = {}


def _quantized_scoring_prequantized(spark, sf_dir: str) -> None:
    """Steady-state int8 search (VERDICT r4 ask 6): the corpus is
    quantized ONCE and persisted (warm run pays it, like a real index
    build at ingest); the measured steady work is integer-dot-product
    scoring only — the number that reflects how a long-lived int8
    index is actually used, vs `quantized_cosine_topk` above which
    deliberately measures quantize+score end-to-end."""
    from bohemia_kenya_data_pipeline_spark.operators import similarity as sim

    if sf_dir not in _QUANT_CACHE:
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        qc = sim.quantize_embeddings(emb, "embedding", "vec_id").persist()
        qc.count()
        _QUANT_CACHE[sf_dir] = qc
    qc = _QUANT_CACHE[sf_dir]
    queries = qc.filter(F.col("vec_id") % 50 == 0)
    _noop(sim.quantized_topk_prequantized(qc, queries, k=5))


_SKIP_BENCH_CACHE: dict = {}


def _skip_bench_copy(spark, sf_dir: str) -> str:
    """Range-clustered lineitem copy shared by the split manifest
    entries — written ONCE per sf_dir (the warm run pays it, like the
    table's real ingest layout), so manifest_build_only times the
    stats pass alone and manifest_pruned_query times the pruned read
    alone (VERDICT r9 ask 6: the composite manifest_skip_scan is
    build-dominated, slope 0.888, and hid the query-side cost)."""
    import tempfile

    if sf_dir not in _SKIP_BENCH_CACHE:
        path = os.path.join(
            tempfile.gettempdir(),
            "spark_graft_benchskip_"
            + os.path.basename(os.path.normpath(sf_dir))
            + f"_{os.getpid()}",
        )
        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        li.repartitionByRange(8, "l_shipdate").write.mode("overwrite").parquet(path)
        _SKIP_BENCH_CACHE[sf_dir] = path
    return _SKIP_BENCH_CACHE[sf_dir]


def _manifest_build_only(spark, sf_dir: str) -> None:
    from bohemia_kenya_data_pipeline_spark.operators import skipping as skp

    skp.build_file_manifest(
        spark, _skip_bench_copy(spark, sf_dir), ["l_shipdate", "l_quantity"]
    )


def _manifest_pruned_query(spark, sf_dir: str) -> None:
    from datetime import datetime

    from bohemia_kenya_data_pipeline_spark.operators import skipping as skp

    path = _skip_bench_copy(spark, sf_dir)
    out = skp.read_with_skipping(
        spark,
        path,
        [
            ("l_shipdate", ">=", datetime(1996, 1, 1)),
            ("l_shipdate", "<", datetime(1996, 4, 1)),
            ("l_quantity", ">", 30),
        ],
    )
    _noop(
        out.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


def record_line(
    spread: dict[str, float],
    warm: dict[str, float],
    steady: dict[str, float],
    n_runs: int,
    sf: float | None,
) -> str:
    """The ONE JSON record line. KEY ORDER IS LOAD-BEARING (VERDICT r7
    ask 2): the driver's ``BENCH_r{N}.json`` keeps only the last ~2 KB
    of output, so the steady ``queries`` dict goes first and the
    headline scalars — ``warm_total``, ``n_runs``, ``steady_method``,
    ``sf``, ``metric``, ``value`` — are the FINAL keys: any 2 KB tail
    of the line still parses every number a round review needs.

    Measurement-record fix, r15 (VERDICT r14 what's-wrong 1): at 97
    entries the spread+warm+steady line outgrew the driver's tail so
    far that even the STEADY dict's front was cut (BENCH_r13.json,
    ``parsed: null`` — the r8 key-ordering fix was no longer enough).
    ``queries_spread`` / ``queries_warm`` now go to the sidecar file
    ``main`` writes (``SPARK_GRAFT_BENCH_DETAIL``) instead of the
    record line; the line keeps only the steady dict + scalars —
    one-third the bytes, the most tail survives. The TIMING
    methodology (5 runs, steady = median of runs 3..5, noop sink) is
    unchanged, so values stay comparable with every prior round.
    ``json.dumps`` preserves insertion order;
    ``tests/test_bench_record.py`` pins the contract against an
    entry-count twice today's.
    """
    del spread  # sidecar-only since r15 (see docstring)
    return json.dumps(
        {
            "queries": steady,
            "unit": "sec",
            "warm_total": round(sum(warm.values()), 3),
            "n_runs": n_runs,
            "steady_method": (
                f"median_runs_3..{n_runs}" if n_runs > 2 else "run_2"
            ),
            "sf": sf,
            "metric": "headline_queries_total_steady",
            "value": round(sum(steady.values()), 3),
        }
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="bkdp-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/session once so query timings measure the engine,
    # not session startup.
    spark.range(1000).selectExpr("sum(id)").collect()

    entries: list[tuple[str, object]] = [
        (name, QUERIES[name]) for name in HEADLINE if name in QUERIES
    ]
    entries.append(("cleaning_dag_e2e", _cleaning_dag_e2e))
    entries.append(
        ("quantized_topk_prequantized", _quantized_scoring_prequantized)
    )
    # manifest_build_only MUST precede manifest_pruned_query: the
    # query entry reads the manifest the build entry leaves behind
    entries.append(("manifest_build_only", _manifest_build_only))
    entries.append(("manifest_pruned_query", _manifest_pruned_query))
    # local-iteration filter (comma-separated names); the driver runs
    # the full set — records produced with a filter are not comparable
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = set(only.split(","))
        entries = [e for e in entries if e[0] in keep]

    # clamp to >= 1 up front: a 0/negative value would otherwise run
    # every entry and then die computing the median — minutes of work
    # lost AFTER the measurements happened.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))
    warm: dict[str, float] = {}
    steady: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name, fn in entries:
        times: list[float] = []
        for _run in range(n_runs):
            t0 = time.perf_counter()
            if name in (
                "cleaning_dag_e2e",
                "quantized_topk_prequantized",
                "manifest_build_only",
                "manifest_pruned_query",
            ):
                fn(spark, sf_dir)  # these noop-materialize internally
            else:
                _noop(fn(spark, sf_dir))
            times.append(round(time.perf_counter() - t0, 3))
        warm[name] = times[0]
        # steady = median of runs 3..N (run 2 is a discarded ramp run —
        # measured up to 35% above true steady on JIT-heavy plans).
        # With SPARK_GRAFT_BENCH_RUNS=2 this degrades to the legacy
        # second-run sample for quick iteration, and =1 to warm-only
        # (tail falls back to the sole sample instead of median([])).
        tail = times[2:] if len(times) > 2 else times[1:] or times
        steady[name] = round(statistics.median(tail), 3)
        # per-entry noise band (max-min of the steady runs): makes the
        # record self-annotating — a cross-round delta smaller than the
        # recorded spread is machine noise, not a regression
        spread[name] = round(max(tail) - min(tail), 3)

    # full per-entry detail (warm runs + steady spread) goes to a
    # sidecar file, NOT the record line — the driver keeps only the
    # last ~2 KB of stdout and the three dicts together outgrew it
    # (VERDICT r14 what's-wrong 1). Set SPARK_GRAFT_BENCH_DETAIL="" to
    # skip the sidecar (e.g. read-only working dirs).
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL", "bench_detail_last.json"
    )
    if detail_path:
        with open(detail_path, "w") as fh:
            json.dump(
                {
                    "queries_spread": spread,
                    "queries_warm": warm,
                    "queries": steady,
                    "n_runs": n_runs,
                    "sf": sf,
                },
                fh,
                indent=1,
            )
    print(record_line(spread, warm, steady, n_runs, sf), flush=True)


if __name__ == "__main__":
    main()
