#!/usr/bin/env python
"""Capture ``.explain("formatted")`` for registered queries into the
``plans/`` evidence files the optimization rounds commit.

Usage:
    python plans_dump.py <suffix> <outdir> <query> [<query> ...]
    # e.g. python plans_dump.py after plans/r14 zorder_fold_scan

Writes ``<outdir>/<query>_<suffix>.txt``. ``SPARK_GRAFT_SF_DIR``
selects the data dir (default sf0.01 — plan SHAPE is scale-invariant;
AQE-final plans are not captured here, only the compile-time physical
plan the driver would submit).

The lifecycle entries return an eagerly ``localCheckpoint``-pinned
DataFrame (queries._pin) whose plan explains as a bare
``Scan ExistingRDD`` — useless as evidence. For plan capture ONLY,
``_pin`` is stubbed to identity so the file records the actual
computation (pruned scan + aggregation). The stub skips _pin's
scratch-dir cleanup too, so each capture leaves its per-invocation
temp dirs behind — harmless (unique names) but worth a /tmp sweep
after a large capture session.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bohemia_kenya_data_pipeline_spark import queries as Q  # noqa: E402
from bohemia_kenya_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    suffix, outdir, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="bkdp-plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(outdir, exist_ok=True)
    real_pin = Q._pin
    Q._pin = lambda df, *paths: df  # plan visibility; see module docstring
    try:
        for n in names:
            df = Q.QUERIES[n](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(outdir, f"{n}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(
                    f"== {n} ({suffix}) sf_dir={sf_dir} — "
                    "queries._pin bypassed for plan visibility ==\n"
                )
                f.write(buf.getvalue())
            print("wrote", path, flush=True)
    finally:
        Q._pin = real_pin
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
