"""The bench record line must survive the driver's ~2 KB tail
truncation: every headline scalar (metric, value, warm_total, n_runs,
steady_method, sf) has to live in the LAST 2 KB of the line, whatever
the entry count grows to (BENCH_r07.json lost its headline numbers to
exactly this — VERDICT r7 ask 2).
"""

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import record_line  # noqa: E402


def _fake_entries(n: int) -> dict[str, float]:
    # realistic key lengths: the widest real names are ~30 chars
    return {f"some_longish_query_name_{i:04d}": round(0.123 + i / 997, 3) for i in range(n)}


def test_headline_scalars_survive_2kb_tail():
    # 2x today's entry count: the contract must hold as HEADLINE grows
    n = 180
    e = _fake_entries(n)
    line = record_line(e, e, e, n_runs=5, sf=0.1)
    tail = line[-2048:]
    for key in ("warm_total", "n_runs", "steady_method", "sf", "metric", "value"):
        assert f'"{key}"' in tail, f"{key} not in the 2 KB tail"
    # the scalars must be parseable from the tail alone
    m = re.search(r'"metric": "([^"]+)", "value": ([0-9.]+)\}$', tail)
    assert m, "metric/value are not the final keys"
    assert m.group(1) == "headline_queries_total_steady"
    assert float(m.group(2)) > 0
    wt = re.search(r'"warm_total": ([0-9.]+)', tail)
    assert wt and abs(float(wt.group(1)) - round(sum(e.values()), 3)) < 1e-9


def test_line_is_valid_json_with_expected_order():
    e = _fake_entries(3)
    rec = json.loads(record_line(e, e, e, n_runs=5, sf=0.01))
    keys = list(rec)
    # big dicts first, steady `queries` last of the three, scalars last
    assert keys[:3] == ["queries_spread", "queries_warm", "queries"]
    assert keys[-2:] == ["metric", "value"]
    assert rec["value"] == round(sum(e.values()), 3)
    assert rec["steady_method"] == "median_runs_3..5"
