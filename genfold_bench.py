#!/usr/bin/env python
"""Fold cost vs GENERATION COUNT at fixed bytes (VERDICT r12 ask 6).

`zorder_fold`'s 100 TB claim is that fold I/O is bounded by the
NON-BASE generations' bytes — i.e. the cost depends on how much delta
data accrued, not on how many tick generations it accrued in. The
data-scale slope rows (BENCH_scale_r*.json) vary BYTES at fixed
generation count; this script closes the missing axis: same table,
same delta bytes, folded as 8 vs 16 generations. If the claim holds,
fold wall time is ~flat in G (ratio ~1; the only G-dependent work is
per-file metadata: listing, sidecar bookkeeping, journal entries) and
the base generation's files are bit-identical before/after.

Prints one JSON line:

    {"metric": "zorder_fold_vs_generations", "g": {"8": sec, "16": sec},
     "ratio_16_over_8": r, "delta_bytes": {...}, "base_untouched": true,
     "sf": ...}

Run on an idle host; each G is measured once (the fold is a multi-pass
physical write — its run-to-run spread is the documented ±15% band, so
only a ratio far from 1 would indicate a G-dependent cost).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from bohemia_kenya_data_pipeline_spark.operators import maintenance as mt  # noqa: E402
from bohemia_kenya_data_pipeline_spark.operators import skipping as skp  # noqa: E402
from bohemia_kenya_data_pipeline_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _gen0_files(spark, path: str) -> dict[str, int]:
    params = skp._read_json(spark, mt._zparams_path(path))
    gen0 = set(params["generations"][0])
    return {
        os.path.basename(r["file"]): r["size_bytes"]
        for r in mt._list_parquet_files(spark, path).collect()
        if os.path.basename(r["file"]) in gen0
    }


def main() -> None:
    spark = get_spark(app_name="bkdp-genfold")
    spark.sparkContext.setLogLevel("ERROR")
    li = (
        spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
        .filter(F.col("l_orderkey") % 3 == 0)  # the zorder_fold_scan slice
    )
    base = li.filter(F.col("l_orderkey") % 10 < 6).persist()
    delta_pool = li.filter(F.col("l_orderkey") % 10 >= 6).persist()
    base.count(), delta_pool.count()

    out: dict = {
        "metric": "zorder_fold_vs_generations",
        "unit": "sec",
        "sf": float(os.path.basename(os.path.normpath(SRC)).replace("sf", "")),
        "g": {},
        "delta_bytes": {},
        "n_new_tiles": {},
        "base_untouched": True,
    }
    for g in (8, 16):
        path = os.path.join(tempfile.gettempdir(), f"spark_graft_genfold_{g}")
        shutil.rmtree(path, ignore_errors=True)
        for side in ("__manifest", "__z.json"):
            shutil.rmtree(path + side, ignore_errors=True)
            try:
                os.remove(path + side)
            except OSError:
                pass
        mt.zorder_init(base, path, "l_partkey", "l_suppkey", n_files=6, bits=15)
        skp.build_file_manifest(spark, path, ["l_partkey", "l_suppkey"])
        # SAME delta bytes for both runs, landed as g generations
        for i in range(g):
            delta_pool.filter(
                F.pmod(F.col("l_orderkey"), F.lit(g)) == i
            ).coalesce(1).write.mode("append").parquet(path)
            mt.zorder_extend(spark, path)
        before = _gen0_files(spark, path)
        params = skp._read_json(spark, mt._zparams_path(path))
        sizes = {
            os.path.basename(r["file"]): r["size_bytes"]
            for r in mt._list_parquet_files(spark, path).collect()
        }
        delta_bytes = sum(
            sizes.get(n, 0)
            for gen in params["generations"][1:]
            for n in gen
        )
        t0 = time.perf_counter()
        rep = mt.zorder_fold(spark, path, max_generations=1)
        dt = round(time.perf_counter() - t0, 3)
        assert rep["folded"] and rep["n_generations"] == g + 1, rep
        after = _gen0_files(spark, path)
        if before != after:
            out["base_untouched"] = False
        out["g"][str(g)] = dt
        out["delta_bytes"][str(g)] = int(delta_bytes)
        out["n_new_tiles"][str(g)] = rep["n_new_tiles"]
        shutil.rmtree(path, ignore_errors=True)
    out["ratio_16_over_8"] = round(out["g"]["16"] / out["g"]["8"], 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
