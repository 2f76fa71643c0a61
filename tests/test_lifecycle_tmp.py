"""Round-13 regression pack for the pid-keyed temp-dir hazard.

Round 12's one red driver row (``orc_roundtrip_docs``: rows/schema
matched, hash didn't) was traced to the lifecycle queries' scratch
directories being *process-stable*: two builds of the same entry in one
process — a harness retry thread, concurrent panel workers, a second
``queries()`` build racing the first build's hash action — shared one
directory, so build #2's ``mode("overwrite")`` could rewrite the part
files build #1's still-lazy plan was about to read (mixed/duplicated
parts flip integer aggregates while preserving group keys and schema —
exactly the observed signature).

The round-13 contract, pinned here:

1. ``queries._fresh_tmp_path`` never hands out the same directory twice
   (pid + per-process monotonic counter);
2. every lifecycle entry returns an EAGERLY PINNED result
   (``localCheckpoint(eager=True)``) — the returned DataFrame is
   immune to ANY later mutation of scratch state, however the harness
   schedules builds vs. actions;
3. scratch dirs (and their ``__<tag>`` sidecars) are deleted at pin
   time, so /tmp stays bounded even though every build gets a fresh
   directory.
"""

from __future__ import annotations

import glob
import os
import tempfile

import pytest

from bohemia_kenya_data_pipeline_spark import queries as Q

from conftest import SF_DIR


def _hashable(df):
    """Order-insensitive value snapshot (the driver compare's shape)."""
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_fresh_tmp_path_never_repeats():
    seen = {Q._fresh_tmp_path("spark_graft_t13", SF_DIR) for _ in range(64)}
    assert len(seen) == 64
    # pid-scoped (isolates concurrent harness processes on one host)
    assert all(f"_{os.getpid()}_" in p for p in seen)


@pytest.mark.parametrize(
    "name",
    ["orc_roundtrip_docs", "ann_index_fixedq", "minhash_index_band_stats"],
)
def test_interleaved_double_build_hashes_identically(spark, name):
    """The r12 driver failure mode, reproduced deliberately: build the
    entry TWICE in one process, act on the second build first, then act
    on the first — under the old process-stable dirs, build #2's
    overwrite corrupted build #1's lazy read; pinned results must hash
    identically no matter the action order."""
    fn = Q.QUERIES[name]
    df1 = fn(spark, SF_DIR)
    df2 = fn(spark, SF_DIR)  # would have rewritten df1's dir pre-r13
    snap2 = _hashable(df2)  # act on the SECOND build first
    snap1 = _hashable(df1)  # first build's result must be unharmed
    assert snap1 == snap2
    # and re-collecting long after both scratch dirs are gone still
    # answers from the pinned blocks
    assert _hashable(df1) == snap1


def test_pin_survives_scratch_dir_removal(spark):
    """The pinned DataFrame must not depend on the temp dir at all —
    the dir is already deleted by the time the query returns."""
    df = Q.QUERIES["orc_roundtrip_docs"](spark, SF_DIR)
    sf = os.path.basename(os.path.normpath(SF_DIR))
    pat = os.path.join(
        tempfile.gettempdir(), f"spark_graft_orc_{sf}_{os.getpid()}_*"
    )
    assert glob.glob(pat) == []  # scratch dropped at pin time
    assert len(df.collect()) > 0  # still answers


def test_pin_cleans_sidecar_dirs(spark):
    """Index entries leave no ``__centroids``/``__tombstones``/
    ``__manifest`` orphans behind (the sidecars hang off the unique
    base path, so the pin-time glob can only match this build's)."""
    Q.QUERIES["ann_index_stats"](spark, SF_DIR)
    Q.QUERIES["zorder_fold_scan"](spark, SF_DIR)
    sf = os.path.basename(os.path.normpath(SF_DIR))
    leftovers = [
        p
        for pref in ("spark_graft_ivfpq_stats", "spark_graft_skip_zfold")
        for p in glob.glob(
            os.path.join(
                tempfile.gettempdir(), f"{pref}_{sf}_{os.getpid()}_*"
            )
        )
    ]
    assert leftovers == []


def test_pin_handles_empty_results(spark):
    """_pin on a 0-row (but schema'd) result: the eager checkpoint must
    not choke, and the scratch dir still gets dropped."""
    import pyspark.sql.functions as F

    df = spark.range(10).filter(F.col("id") < 0).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    scratch = Q._fresh_tmp_path("spark_graft_t13_empty", SF_DIR)
    os.makedirs(scratch, exist_ok=True)
    out = Q._pin(df, scratch)
    assert out.collect() == [] and out.columns == ["k", "v"]
    assert not os.path.exists(scratch)


def test_threaded_concurrent_builds_hash_identically(spark):
    """The driver-shaped race, run for real: TWO THREADS build and act
    on the same lifecycle entry concurrently (Spark schedules jobs from
    both threads into one context). Under the old process-stable dirs
    this interleaving is exactly what mixed part files mid-read; with
    unique dirs + eager pinning both threads must produce identical
    hashes, and each result must survive re-collection afterwards."""
    import threading

    fn = Q.QUERIES["orc_roundtrip_docs"]
    results: dict = {}
    errors: list = []

    def build_and_hash(tag: str) -> None:
        try:
            df = fn(spark, SF_DIR)
            results[tag] = (df, _hashable(df))
        except Exception as exc:  # pragma: no cover - diagnostic
            errors.append((tag, exc))

    threads = [
        threading.Thread(target=build_and_hash, args=(f"t{i}",))
        for i in range(2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    assert len(results) == 2
    (df_a, snap_a), (df_b, snap_b) = results["t0"], results["t1"]
    assert snap_a == snap_b
    # pinned results are stable under LATER re-collection too
    assert _hashable(df_a) == snap_a and _hashable(df_b) == snap_b


def test_no_query_uses_process_stable_scratch_dirs():
    """Structural guard: the ONLY gettempdir() in queries.py is inside
    _fresh_tmp_path, so no future lifecycle entry can quietly revert to
    a process-stable scratch dir (the r12 red-row class)."""
    import inspect

    src = inspect.getsource(Q)
    uses = [
        ln.strip()
        for ln in src.splitlines()
        if "gettempdir()" in ln and not ln.strip().startswith("#")
    ]
    assert len(uses) == 1, uses
    # and every _fresh_tmp_path result is pid+sequence suffixed
    assert "_{os.getpid()}_{next(_TMP_SEQ)}" in src
