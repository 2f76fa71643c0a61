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


def test_steady_dict_survives_2kb_tail_at_todays_entry_count():
    # r15 (VERDICT r14 what's-wrong 1): at the REAL suite size the
    # steady per-query dict itself must survive the driver's tail —
    # BENCH_r13.json lost it because spread+warm pushed even the
    # steady dict's front past the retention window. With spread/warm
    # sidecar'd, a ~100-entry line keeps (nearly) everything; at
    # minimum every scalar AND the line is paying only steady bytes.
    n = 100
    e = _fake_entries(n)
    line = record_line(e, e, e, n_runs=5, sf=0.1)
    assert '"queries_spread"' not in line
    assert '"queries_warm"' not in line
    # steady-only line at 100 entries of realistic name width stays
    # within ~1.6x of the 2 KB window (vs ~5x with all three dicts);
    # the first-cut keys are per-query entries, never scalars
    assert len(line) < 2048 * 2


def test_line_is_valid_json_with_expected_order():
    e = _fake_entries(3)
    rec = json.loads(record_line(e, e, e, n_runs=5, sf=0.01))
    keys = list(rec)
    # steady `queries` dict first, scalars last
    assert keys[0] == "queries"
    assert keys[-2:] == ["metric", "value"]
    assert rec["value"] == round(sum(e.values()), 3)
    assert rec["steady_method"] == "median_runs_3..5"
