"""Physical-plan diagnostics: make the engine's scale invariants
checkable by callers, not just by this repo's test suite.

Every 100 TB discipline this engine enforces is visible in the
executed plan: filters pushed to scans, no row-at-a-time Python, no
nested-loop/cartesian joins sneaking in behind a non-equi predicate,
exchanges bounded. ``plan_stats`` parses those signals into a dict;
``assert_plan`` turns them into a loud CI gate a pipeline can run on
its own composed DataFrames before shipping them at scale (the same
checks ``tests/test_plans.py`` pins for the built-in operators).

Parsing the plan STRING is deliberate: it is the one stable,
version-tolerant surface (``explain``'s own output); private Catalyst
node classes are not.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, final: bool = False) -> str:
    """The physical plan as text.

    Default (``final=False``): the INITIAL adaptive plan — what
    ``executedPlan()`` returns before any action has run. Under AQE
    this is the ``AdaptiveSparkPlan isFinalPlan=false`` tree: static
    shape (joins as planned from static estimates, exchanges, scans,
    Python-eval nodes) is all visible, but runtime re-optimizations
    (SMJ→BHJ conversion, skew-split exchanges, coalesced partitions)
    are NOT — those exist only after execution. This is the right
    (and cheap) surface for the static invariants ``assert_plan``
    gates: a nested-loop join or row-Python node planned statically
    never disappears at runtime.

    ``final=True``: EXECUTE the plan and re-read ``executedPlan()``,
    which then reports ``isFinalPlan=true`` with every AQE rewrite
    applied. Use when gating on what AQE actually chose (e.g. "this
    join really ran broadcast"); costs one full run of the query.
    Execution goes through THIS DataFrame's own QueryExecution
    (``toRdd().count()`` — executor-side only, nothing collected): a
    sink write would run a separate command QueryExecution and leave
    this one's adaptive plan unfinalized.
    """
    qe = df._jdf.queryExecution()
    if final:
        qe.toRdd().count()
    return qe.executedPlan().toString()


#: row-at-a-time Python evaluation — the slow path this engine bans;
#: Arrow-batched nodes (ArrowEvalPython, MapInPandas/mapInArrow) are
#: the sanctioned Python escape hatch and counted separately
_ROW_PYTHON = re.compile(r"\bBatchEvalPython\b")
_ARROW_PYTHON = re.compile(r"\b(ArrowEvalPython|MapInPandas|PythonMapInArrow|FlatMapGroupsInPandas)\b")
_EXCHANGE = re.compile(r"\bExchange (hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)")
_BROADCAST_EXCHANGE = re.compile(r"\bBroadcastExchange\b")
_NESTED_LOOP = re.compile(r"\b(BroadcastNestedLoopJoin|CartesianProduct)\b")
_SORTMERGE = re.compile(r"\bSortMergeJoin\b")
_BROADCAST_HASH = re.compile(r"\bBroadcastHashJoin\b")
_SHUFFLED_HASH = re.compile(r"\bShuffledHashJoin\b")
_SCAN = re.compile(r"\b(?:File)?Scan (\w+)")
_PUSHED = re.compile(r"PushedFilters: \[([^\]]*)\]")
_CODEGEN = re.compile(r"\*\((\d+)\)")


def plan_stats(df: DataFrame, final: bool = False) -> dict:
    """Count the scale-relevant physical-plan features of ``df``.

    Stats reflect the INITIAL adaptive plan unless ``final=True``
    (which executes the query once — see :func:`plan_text` for the
    exact contract and cost of each mode).

    Returns::

        {"exchanges": shuffle exchange count (broadcast NOT included),
         "broadcast_exchanges": ..., "broadcast_hash_joins": ...,
         "sortmerge_joins": ..., "shuffled_hash_joins": ...,
         "nested_loop_joins": BroadcastNestedLoopJoin + CartesianProduct,
         "scans": file-source scan count,
         "scans_with_pushdown": scans carrying a non-empty PushedFilters,
         "row_python_nodes": BatchEvalPython (row-at-a-time UDF) count,
         "arrow_python_nodes": Arrow-batched Python node count,
         "codegen_spans": distinct WholeStageCodegen regions}
    """
    t = plan_text(df, final=final)
    pushed = [m for m in _PUSHED.findall(t) if m.strip()]
    return {
        "exchanges": len(_EXCHANGE.findall(t)),
        "broadcast_exchanges": len(_BROADCAST_EXCHANGE.findall(t)),
        "broadcast_hash_joins": len(_BROADCAST_HASH.findall(t)),
        "sortmerge_joins": len(_SORTMERGE.findall(t)),
        "shuffled_hash_joins": len(_SHUFFLED_HASH.findall(t)),
        "nested_loop_joins": len(_NESTED_LOOP.findall(t)),
        "scans": len(_SCAN.findall(t)),
        "scans_with_pushdown": len(pushed),
        "row_python_nodes": len(_ROW_PYTHON.findall(t)),
        "arrow_python_nodes": len(_ARROW_PYTHON.findall(t)),
        "codegen_spans": len(set(_CODEGEN.findall(t))),
    }


def assert_plan(
    df: DataFrame,
    max_exchanges: int | None = None,
    forbid_nested_loop: bool = True,
    forbid_row_python: bool = True,
    require_pushdown: bool = False,
    max_scans: int | None = None,
    final: bool = False,
) -> dict:
    """Fail loudly (``AssertionError`` naming the violated bound AND
    the measured stats) when ``df``'s physical plan breaks a scale
    invariant. Returns the stats on success so callers can log them.

    Defaults encode the engine-wide bans: no nested-loop/cartesian
    join (a non-equi predicate silently plans one — the #1 way a
    correct-on-a-sample pipeline dies at 100 TB) and no row-at-a-time
    Python (``BatchEvalPython``; Arrow-batched nodes stay legal).
    ``max_exchanges`` bounds shuffles for plans with a known shape;
    ``require_pushdown`` asserts at least one scan received pushed
    filters (use on filtered scans — an unfiltered full-table read
    legitimately pushes nothing); ``max_scans`` catches accidental
    double-reads of the same source (missing persist on a reused
    branch). Gates the INITIAL adaptive plan by default; ``final=True``
    executes the query once and gates the AQE-final plan instead (see
    :func:`plan_text`).
    """
    stats = plan_stats(df, final=final)
    problems = []
    if forbid_nested_loop and stats["nested_loop_joins"]:
        problems.append(
            f"{stats['nested_loop_joins']} nested-loop/cartesian join(s) "
            "(non-equi predicate? add an equi key or bucket the range)"
        )
    if forbid_row_python and stats["row_python_nodes"]:
        problems.append(
            f"{stats['row_python_nodes']} row-at-a-time Python node(s) "
            "(BatchEvalPython — use built-ins or an Arrow-batched UDF)"
        )
    if max_exchanges is not None and stats["exchanges"] > max_exchanges:
        problems.append(
            f"{stats['exchanges']} shuffle exchanges > bound {max_exchanges}"
        )
    if require_pushdown and stats["scans_with_pushdown"] == 0:
        problems.append(
            "no scan carries PushedFilters (filter not reaching the source)"
        )
    if max_scans is not None and stats["scans"] > max_scans:
        problems.append(
            f"{stats['scans']} scans > bound {max_scans} "
            "(reused branch without persist?)"
        )
    if problems:
        raise AssertionError(
            "plan invariants violated: " + "; ".join(problems) + f" — stats={stats}"
        )
    return stats
