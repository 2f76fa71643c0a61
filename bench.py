#!/usr/bin/env python
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized through the `noop` sink (executes the
whole plan on the executors, no driver collect) — so the timing covers
scan + shuffle + compute, exactly what a cluster run pays.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bohemia_kenya_data_pipeline_spark.queries import QUERIES  # noqa: E402
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
    "quality_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="bkdp-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/session once so query timings measure the engine,
    # not sessionstartup.
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
        }
    )
    print(line, flush=True)


if __name__ == "__main__":
    main()
