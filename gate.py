#!/usr/bin/env python
"""Local correctness gate: run registered queries against their DuckDB
oracles exactly the way the driver does (row count + sorted-column
value compare) and print one line per query.

Usage:
    python gate.py                 # all queries, sf0.01
    python gate.py window_cumsum sessionize_events
    SPARK_GRAFT_GATE_SF_DIR=/root/testdata/sf0.001 python gate.py
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bohemia_kenya_data_pipeline_spark.queries import ORACLES, QUERIES  # noqa: E402
from bohemia_kenya_data_pipeline_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm(v):
    """Mirror of tests/conftest._norm — keep the two in sync so the
    gate, the pytest suite, and the driver agree on comparisons."""
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:] or sorted(ORACLES)
    spark = get_spark(app_name="bkdp-gate")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failed = []
    for name in names:
        if name not in ORACLES:
            print(f"{name}: UNKNOWN (not registered)", flush=True)
            failed.append(name)
            continue
        try:
            df = QUERIES[name](spark, sf_dir)
            rel = con.sql(ORACLES[name])
            cols = sorted(df.columns)
            ok_cols = cols == sorted(rel.columns)
            sp = sorted(
                (tuple(_norm(r[c]) for c in cols) for r in df.collect()), key=repr
            )
            raw = list(rel.columns)
            idx = [raw.index(c) for c in sorted(rel.columns)]
            du = sorted(
                (tuple(_norm(row[i]) for i in idx) for row in rel.fetchall()), key=repr
            )
            ok = ok_cols and sp == du
            print(f"{name}: {'OK' if ok else 'FAIL'} rows={len(sp)}/{len(du)}", flush=True)
            if not ok:
                failed.append(name)
                if not ok_cols:
                    print(f"  columns: {cols} vs {sorted(rel.columns)}")
                for a, b in zip(sp, du):
                    if a != b:
                        print(f"  first diff: {a} VS {b}")
                        break
        except Exception as ex:  # pragma: no cover - diagnostic path
            msg = (str(ex).splitlines() or ["<no message>"])[0]
            print(f"{name}: ERROR {msg[:200]}", flush=True)
            failed.append(name)

    print(f"GATE: {len(names) - len(failed)}/{len(names)} green", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
