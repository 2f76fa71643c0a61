"""Golden tests for table-maintenance operators (IO shape — no SQL
oracle is possible for layout): small-file detection, measured-size
compaction, and range-clustered writes whose per-file min/max ranges
must be disjoint (the property parquet footer pruning relies on)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from bohemia_kenya_data_pipeline_spark.operators import maintenance as mt


@pytest.fixture()
def fragmented(spark, tmp_path):
    """A deliberately over-fragmented dataset: 5k rows in 64 files."""
    path = str(tmp_path / "frag")
    spark.range(5000).select(
        F.col("id"), (F.col("id") % 97).alias("k"), F.sha1(F.col("id").cast("string")).alias("pad")
    ).repartition(64).write.parquet(path)
    return path


def test_file_stats_counts_every_file_and_row(spark, fragmented):
    stats = mt.dataset_file_stats(spark, fragmented, small_file_mb=16.0)
    rows = stats.collect()
    assert len(rows) == 64
    assert sum(r.n_rows for r in rows) == 5000
    # every 5k/64-row file is far below 16 MB
    assert all(r.is_small for r in rows)
    assert all(r.size_bytes and r.size_bytes > 0 for r in rows)


def test_compact_sizes_output_from_measured_bytes(spark, fragmented, tmp_path):
    dst = str(tmp_path / "compacted")
    total = mt.dataset_size_bytes(spark, fragmented)
    # pick a target that should yield exactly 2 files
    target_mb = (total / 2) / (1024 * 1024) + 1e-9
    n = mt.compact(spark, fragmented, dst, target_file_mb=target_mb)
    assert n == 2
    files = glob.glob(os.path.join(dst, "*.parquet"))
    assert len(files) == 2
    # content preserved exactly
    src_sum = spark.read.parquet(fragmented).agg(F.sum("id")).collect()[0][0]
    dst_sum = spark.read.parquet(dst).agg(F.sum("id")).collect()[0][0]
    assert src_sum == dst_sum
    assert spark.read.parquet(dst).count() == 5000


def test_compact_refuses_in_place(spark, fragmented):
    with pytest.raises(ValueError):
        mt.compact(spark, fragmented, fragmented)


def test_compact_partitioned_layout(spark, tmp_path):
    src, dst = str(tmp_path / "psrc"), str(tmp_path / "pdst")
    spark.range(1000).select(
        F.col("id"), (F.col("id") % 3).alias("part")
    ).repartition(16).write.parquet(src)
    mt.compact(spark, src, dst, target_file_mb=1.0, partition_by=["part"])
    # hive layout produced, content preserved per partition
    assert sorted(os.path.basename(p) for p in glob.glob(os.path.join(dst, "part=*"))) == [
        "part=0",
        "part=1",
        "part=2",
    ]
    got = {
        r.part: r.n
        for r in spark.read.parquet(dst).groupBy("part").agg(F.count("*").alias("n")).collect()
    }
    assert got == {0: 334, 1: 333, 2: 333}


def test_cluster_write_ranges_are_disjoint_and_sorted(spark, tmp_path):
    path = str(tmp_path / "clustered")
    df = spark.range(10_000).select(
        (F.hash("id") % 100_000).alias("key"), F.col("id").alias("payload")
    )
    mt.cluster_write(df, path, ["key"], n_files=8)
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    assert 1 < len(files) <= 8
    spans = []
    for f in files:
        part = spark.read.parquet(f)
        mn, mx = part.agg(F.min("key"), F.max("key")).collect()[0]
        # sorted inside the file: key sequence equals its sorted self
        keys = [r.key for r in part.select("key").collect()]
        assert keys == sorted(keys)
        spans.append((mn, mx))
    spans.sort()
    # disjoint file ranges -> footer min/max pruning works
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo
    assert spark.read.parquet(path).count() == 10_000


def test_cluster_write_validates_cols(spark, tmp_path):
    with pytest.raises(ValueError):
        mt.cluster_write(spark.range(10), str(tmp_path / "x"), [], 4)


def test_compact_refuses_in_place_across_uri_forms(spark, fragmented):
    # same location spelled as a plain path and a file: URI must still
    # trip the src==dst guard
    with pytest.raises(ValueError):
        mt.compact(spark, fragmented, f"file://{fragmented}")
    with pytest.raises(ValueError):
        mt.compact(spark, f"file://{fragmented}", fragmented)


def test_zorder_value_interleaves_bits(spark):
    rows = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (0, 2), (3, 3)], ["a", "b"]
    ).select("a", "b", mt.zorder_value("a", "b", bits=4).alias("z"))
    got = {(r.a, r.b): r.z for r in rows.collect()}
    # bit i of a -> 2i; bit i of b -> 2i+1
    assert got == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3, (2, 0): 4, (0, 2): 8, (3, 3): 15}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mt.zorder_value("a", "b", bits=0)


def test_zorder_value_expr_matches_column_chain(spark):
    # the one-parse SQL path (string inputs) and the Column-chain
    # fallback (expression inputs) must be bit-identical, including
    # NULL propagation and the top bit
    from pyspark.sql import functions as F

    rows = [(i * 977 % (1 << 15), i * 31 % (1 << 15)) for i in range(200)]
    rows += [(None, 5), (5, None), (None, None), (0, 0), ((1 << 15) - 1, (1 << 15) - 1)]
    df = spark.createDataFrame(rows, "a INT, b INT")
    got = df.select(
        mt.zorder_value("a", "b", bits=15).alias("z_expr"),
        mt.zorder_value(F.col("a"), F.col("b"), bits=15).alias("z_chain"),
    ).collect()
    assert all(r.z_expr == r.z_chain for r in got)
    # both paths produce BIGINT
    tps = dict(df.select(
        mt.zorder_value("a", "b", bits=15).alias("z_expr"),
        mt.zorder_value(F.col("a"), F.col("b"), bits=15).alias("z_chain"),
    ).dtypes)
    assert tps == {"z_expr": "bigint", "z_chain": "bigint"}


def test_zorder_write_tiles_both_dimensions(spark, tmp_path):
    """Z-order files must cover far smaller (a, b) boxes than a
    single-column sort, whose files each span the full b range."""
    import glob

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("a"), (F.col("id") / 64).cast("long").alias("b")
    )

    def max_b_span(path):
        spans = []
        for f in glob.glob(os.path.join(path, "*.parquet")):
            r = spark.read.parquet(f).agg(F.min("b"), F.max("b")).collect()[0]
            spans.append(r[1] - r[0] + 1)
        return max(spans)

    zpath = str(tmp_path / "zorder")
    mt.zorder_write(grid, zpath, "a", "b", n_files=16, bits=6)
    lpath = str(tmp_path / "linear")
    mt.cluster_write(grid, lpath, ["a"], n_files=16)
    assert spark.read.parquet(zpath).count() == 64 * 64
    # a predicate on b prunes via footer min/max only if files bound b
    # tightly: the a-sorted layout leaves EVERY file spanning all 64 b
    # values, while z-order tiles bound b at ~sqrt(file_rows)
    assert max_b_span(lpath) == 64
    assert max_b_span(zpath) <= 24


def test_gc_versions_keeps_newest(spark, tmp_path):
    root = str(tmp_path / "versioned")
    for v in (0, 1, 3, 7):
        spark.range(v + 1).write.parquet(f"{root}/v={v}")
    deleted = mt.gc_versions(spark, root, keep_last=2)
    assert deleted == [0, 1]
    assert spark.read.parquet(f"{root}/v=7").count() == 8
    assert spark.read.parquet(f"{root}/v=3").count() == 4
    assert sorted(
        p.name for p in (tmp_path / "versioned").iterdir() if p.name.startswith("v=")
    ) == ["v=3", "v=7"]
    # nothing to do below the window; missing root is a no-op
    assert mt.gc_versions(spark, root, keep_last=5) == []
    assert mt.gc_versions(spark, str(tmp_path / "nope")) == []
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mt.gc_versions(spark, root, keep_last=0)


def test_zorder_manifest_box_prunes_both_dimensions(spark, tmp_path):
    """Composed z-order + file manifest (VERDICT r9 ask 6): a
    two-sided box predicate over the manifest must prune files on a
    z-ordered layout where the single-column layout keeps everything
    on the second dimension — and the pruned read stays exact."""
    from bohemia_kenya_data_pipeline_spark.operators import skipping as skp

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("a"),
        (F.col("id") / 64).cast("long").alias("b"),
        F.col("id").alias("payload"),
    )
    preds = [("a", "between", (0, 31)), ("b", "between", (0, 15))]
    zpath = str(tmp_path / "zorder_m")
    mt.zorder_write(grid, zpath, "a", "b", n_files=16, bits=6)
    skp.build_file_manifest(spark, zpath, ["a", "b"])
    z_kept, z_total = skp.prune_files(spark, zpath, preds)
    lpath = str(tmp_path / "linear_m")
    mt.cluster_write(grid, lpath, ["a"], n_files=16)
    skp.build_file_manifest(spark, lpath, ["a", "b"])
    l_kept, l_total = skp.prune_files(spark, lpath, preds)
    # a-sorted: the a-leg keeps ~8 of 16 stripes and the b-leg prunes
    # NOTHING (every stripe spans all of b). z-order: the same box
    # intersects only the (a<32, b<16) tiles — strictly fewer files
    assert z_total == l_total == 16
    assert len(z_kept) < len(l_kept)
    got = skp.read_with_skipping(spark, zpath, preds)
    want = (
        spark.read.parquet(zpath)
        .filter(F.col("a").between(0, 31) & F.col("b").between(0, 15))
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_maintain_table_layout_tick(spark, fragmented):
    from bohemia_kenya_data_pipeline_spark.operators import skipping as skp

    before = sorted(map(tuple, spark.read.parquet(fragmented).collect()))
    # manifest present: a compaction must rebuild it (fingerprints of
    # every rewritten file are stale)
    skp.build_file_manifest(spark, fragmented, ["k"])

    # 64 tiny files -> small share 1.0 -> compact + manifest rebuild
    rep = mt.maintain_table_layout(
        spark, fragmented, small_file_mb=1.0, small_share_threshold=0.5
    )
    assert rep["n_files"] == 64 and rep["small_share"] == 1.0
    assert rep["compacted"] and rep["n_files_after"] == 1
    assert rep["manifest"] == "rebuilt"
    # data unchanged, files actually compacted on disk
    assert sorted(map(tuple, spark.read.parquet(fragmented).collect())) == before
    assert len(glob.glob(os.path.join(fragmented, "*.parquet"))) == 1
    # the rebuilt manifest serves an exact pruned read
    got = skp.read_with_skipping(spark, fragmented, [("k", "between", (10, 20))])
    want = spark.read.parquet(fragmented).filter(F.col("k").between(10, 20))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # no leftover stage/old siblings from the swap
    assert not glob.glob(fragmented + "__stage")
    assert not glob.glob(fragmented + "__old")

    # idempotent: the re-run degrades to the listing check
    rep2 = mt.maintain_table_layout(
        spark, fragmented, small_file_mb=1.0, small_share_threshold=0.5
    )
    assert not rep2["compacted"] and rep2["n_files"] == 1
    assert rep2["manifest"] == "absent"  # nothing repaired on a no-op tick


def test_maintain_table_layout_healthy_noop(spark, tmp_path):
    path = str(tmp_path / "healthy")
    spark.range(1000).coalesce(1).write.parquet(path)
    rep = mt.maintain_table_layout(
        spark, path, small_file_mb=0.0001, small_share_threshold=0.5
    )
    assert rep == {
        "n_files": 1, "n_small": 0, "small_share": 0.0,
        "compacted": False, "n_files_after": 1, "manifest": "absent",
    }


def test_zorder_extend_incremental_clustering(spark, tmp_path):
    from bohemia_kenya_data_pipeline_spark.operators import skipping as skp

    path = str(tmp_path / "zinc")
    base = spark.range(4000).select(
        (F.col("id") % 64).alias("a"), ((F.col("id") * 7) % 64).alias("b"),
        F.col("id").alias("v"),
    )
    mt.zorder_init(base, path, "a", "b", n_files=8, bits=6)
    skp.build_file_manifest(spark, path, ["a", "b"])

    # fresh table: extend is a no-op
    rep0 = mt.zorder_extend(spark, path)
    assert rep0 == {"extended": False, "recovered": False,
                    "n_delta_files": 0, "n_new_tiles": 0}

    # raw append (unclustered) -> extend re-clusters ONLY the delta
    delta = spark.range(4000, 6000).select(
        (F.col("id") % 64).alias("a"), ((F.col("id") * 7) % 64).alias("b"),
        F.col("id").alias("v"),
    )
    delta.coalesce(2).write.mode("append").parquet(path)
    n_before = len(glob.glob(os.path.join(path, "*.parquet")))
    rep = mt.zorder_extend(spark, path)
    assert rep["extended"] and rep["n_delta_files"] == 2
    assert rep["n_new_tiles"] >= 1
    # originals swapped out, no stage leftovers
    assert len(glob.glob(os.path.join(path, "*.parquet"))) == (
        n_before - 2 + rep["n_new_tiles"]
    )
    assert not glob.glob(path + "__zstage")
    # content is exactly base+delta (no loss, no duplication)
    got = spark.read.parquet(path)
    assert got.count() == 6000
    assert got.agg(F.sum("v")).first()[0] == sum(range(6000))

    # the manifest tick repairs stats and a box predicate reads exact
    skp.maintain_file_manifest(spark, path)
    want = got.filter(F.col("a").between(10, 20) & F.col("b").between(30, 40))
    pruned = skp.read_with_skipping(
        spark, path, [("a", "between", (10, 20)), ("b", "between", (30, 40))]
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(map(tuple, want.collect()))

    # second extend with nothing new: no-op again
    assert mt.zorder_extend(spark, path)["extended"] is False


def test_zorder_extend_replays_crashed_journal(spark, tmp_path):
    from bohemia_kenya_data_pipeline_spark.operators import skipping as skp

    path = str(tmp_path / "zcrash")
    base = spark.range(1000).select(
        (F.col("id") % 32).alias("a"), ((F.col("id") * 5) % 32).alias("b"),
        F.col("id").alias("v"),
    )
    mt.zorder_init(base, path, "a", "b", n_files=4, bits=5)
    delta = spark.range(1000, 1500).select(
        (F.col("id") % 32).alias("a"), ((F.col("id") * 5) % 32).alias("b"),
        F.col("id").alias("v"),
    )
    delta.coalesce(1).write.mode("append").parquet(path)

    # simulate a crash mid-swap: stage the clustered delta + journal
    # the intent, but neither move staged tiles in nor delete originals
    params = skp._read_json(spark, mt._zparams_path(path))
    known = set(params["files"])
    current = {os.path.basename(f) for f in glob.glob(os.path.join(path, "*.parquet"))}
    dnames = sorted(current - known)
    stage_dir = path + "__zstage"
    ddf = spark.read.parquet(*[os.path.join(path, n) for n in dnames])
    mt.cluster_write(
        ddf.withColumn("__z", mt.zorder_value("a", "b", 5)),
        stage_dir, ["__z"], 1, drop_cols=["__z"],
    )
    staged = sorted(os.path.basename(p) for p in glob.glob(os.path.join(stage_dir, "*.parquet")))
    params["pending_add"] = staged
    params["pending_remove"] = dnames
    params["files"] = sorted(known | set(staged))
    skp._write_json(spark, mt._zparams_path(path), params)

    # next tick replays the journal, then finds nothing new
    rep = mt.zorder_extend(spark, path)
    assert rep["recovered"] is True and rep["extended"] is False
    got = spark.read.parquet(path)
    assert got.count() == 1500  # no loss, no duplication after replay
    assert not glob.glob(stage_dir)
    # replay is idempotent
    assert mt.zorder_extend(spark, path)["recovered"] is False


def test_maintain_table_composed_tick(spark, tmp_path):
    from bohemia_kenya_data_pipeline_spark.operators import skipping as skp

    path = str(tmp_path / "master")
    base = spark.range(3000).select(
        (F.col("id") % 50).alias("a"), ((F.col("id") * 11) % 50).alias("b"),
        F.col("id").alias("v"),
    )
    mt.zorder_init(base, path, "a", "b", n_files=4, bits=6)
    skp.build_file_manifest(spark, path, ["a", "b"])

    # healthy table: every stage reports a no-op
    rep = mt.maintain_table(spark, path, small_file_mb=0.0001)
    assert rep["zorder"]["extended"] is False
    assert rep["layout"]["compacted"] is False
    assert rep["manifest"]["repaired"] is False

    # raw append -> one call re-clusters the delta AND repairs the
    # manifest; the pruned read is exact immediately afterwards
    spark.range(3000, 4000).select(
        (F.col("id") % 50).alias("a"), ((F.col("id") * 11) % 50).alias("b"),
        F.col("id").alias("v"),
    ).coalesce(1).write.mode("append").parquet(path)
    rep2 = mt.maintain_table(spark, path, small_file_mb=0.0001)
    assert rep2["zorder"]["extended"] is True
    assert rep2["manifest"]["repaired"] is True
    got = skp.read_with_skipping(
        spark, path, [("a", "between", (10, 20)), ("b", "between", (10, 20))]
    )
    want = spark.read.parquet(path).filter(
        F.col("a").between(10, 20) & F.col("b").between(10, 20)
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    # converged: a third call is a pure check
    rep3 = mt.maintain_table(spark, path, small_file_mb=0.0001)
    assert rep3["zorder"]["extended"] is False
    assert rep3["manifest"]["repaired"] is False

    # plain table without sidecars: only the layout stage runs
    plain = str(tmp_path / "plain")
    spark.range(100).coalesce(1).write.parquet(plain)
    rep4 = mt.maintain_table(spark, plain, small_file_mb=0.0001)
    assert rep4["zorder"] is None and rep4["manifest"] is None
    assert rep4["layout"]["compacted"] is False


def test_layout_tick_replays_pending_zjournal_before_compaction(spark, tmp_path):
    """ADVICE r11 (medium): a crashed zorder_extend can leave staged
    tiles ALREADY moved into the data dir while the delta originals are
    not yet deleted (mid-_zrecover crash). A direct maintain_table_layout
    call must replay that journal BEFORE compacting — otherwise the
    compaction bakes the duplicated rows into the new table and then
    resets the journal, making them permanent."""
    from bohemia_kenya_data_pipeline_spark.operators import skipping as skp

    path = str(tmp_path / "zlayout")
    base = spark.range(1000).select(
        (F.col("id") % 32).alias("a"), ((F.col("id") * 5) % 32).alias("b"),
        F.col("id").alias("v"),
    )
    mt.zorder_init(base, path, "a", "b", n_files=4, bits=5)
    delta = spark.range(1000, 1500).select(
        (F.col("id") % 32).alias("a"), ((F.col("id") * 5) % 32).alias("b"),
        F.col("id").alias("v"),
    )
    delta.coalesce(1).write.mode("append").parquet(path)

    # stage the clustered delta and journal the swap intent
    params = skp._read_json(spark, mt._zparams_path(path))
    known = set(params["files"])
    current = {
        os.path.basename(f) for f in glob.glob(os.path.join(path, "*.parquet"))
    }
    dnames = sorted(current - known)
    stage_dir = path + "__zstage"
    ddf = spark.read.parquet(*[os.path.join(path, n) for n in dnames])
    mt.cluster_write(
        ddf.withColumn("__z", mt.zorder_value("a", "b", 5)),
        stage_dir, ["__z"], 1, drop_cols=["__z"],
    )
    staged = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(stage_dir, "*.parquet"))
    )
    params["pending_add"] = staged
    params["pending_remove"] = dnames
    params["files"] = sorted(known | set(staged))
    skp._write_json(spark, mt._zparams_path(path), params)
    # crash mid-replay: staged tiles moved in, originals NOT deleted —
    # the table now physically holds the delta rows TWICE
    for name in staged:
        os.rename(os.path.join(stage_dir, name), os.path.join(path, name))
    assert spark.read.parquet(path).count() == 2000  # 1500 + dup 500

    # force the compactor to fire (tiny target so n_target < n_files)
    rep = mt.maintain_table_layout(
        spark, path, small_file_mb=64.0, small_share_threshold=0.0,
        target_file_mb=64.0,
    )
    got = spark.read.parquet(path)
    assert got.count() == 1500  # journal replayed first: no duplicates
    assert got.agg(F.sum("v")).first()[0] == sum(range(1500))
    assert rep["compacted"] is True
    # journal cleared and converged: another extend finds nothing
    params2 = skp._read_json(spark, mt._zparams_path(path))
    assert params2["pending_add"] == [] and params2["pending_remove"] == []
    assert mt.zorder_extend(spark, path)["extended"] is False


def test_zorder_fold_restores_pruning_and_content(spark, tmp_path):
    """VERDICT r11 ask 4: steady-state appends accrue one small tile
    generation per extend, and their overlapping (a, b) boxes decay
    pruning selectivity. zorder_fold (via the layout tick) re-clusters
    the non-base generations together: content identical, box reads
    open strictly fewer files, and the folded read equals a
    from-scratch single rebuild."""
    from bohemia_kenya_data_pipeline_spark.operators import skipping as skp

    path = str(tmp_path / "zfold")

    def slab(lo, hi):
        return spark.range(lo, hi).select(
            (F.col("id") % 64).alias("a"), ((F.col("id") * 7) % 64).alias("b"),
            F.col("id").alias("v"),
        )

    mt.zorder_init(slab(0, 4000), path, "a", "b", n_files=8, bits=6)
    skp.build_file_manifest(spark, path, ["a", "b"])
    for k in range(4):  # 4 append+extend ticks -> 5 generations
        slab(4000 + k * 500, 4000 + (k + 1) * 500).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        assert mt.zorder_extend(spark, path)["extended"] is True
    params = skp._read_json(spark, mt._zparams_path(path))
    assert len(params["generations"]) == 5
    skp.maintain_file_manifest(spark, path)

    preds = [("a", "between", (10, 20)), ("b", "between", (30, 40))]
    kept_before, total_before = skp.prune_files(spark, path, preds)

    # fold fires through the layout tick once the count passes the cap
    rep = mt.maintain_table_layout(
        spark, path, small_file_mb=0.0001, max_z_generations=3
    )
    assert rep["zfold"]["folded"] is True and rep["zfold"]["n_generations"] == 5
    assert rep["compacted"] is False  # fold, not compaction
    assert rep["manifest"] == "repaired"  # direct caller stays exact
    params2 = skp._read_json(spark, mt._zparams_path(path))
    assert len(params2["generations"]) == 2  # base + one folded
    assert params2["pending_add"] == [] and params2["pending_remove"] == []
    assert not glob.glob(path + "__zstage")

    # content is exactly base + all deltas (no loss, no duplication)
    got = spark.read.parquet(path)
    assert got.count() == 6000
    assert got.agg(F.sum("v")).first()[0] == sum(range(6000))

    # pruning selectivity strictly recovers
    kept_after, total_after = skp.prune_files(spark, path, preds)
    assert len(kept_after) < len(kept_before)

    # folded pruned read == a from-scratch single rebuild's pruned read
    rebuilt = str(tmp_path / "zrebuild")
    mt.zorder_init(slab(0, 6000), rebuilt, "a", "b", n_files=10, bits=6)
    skp.build_file_manifest(spark, rebuilt, ["a", "b"])
    got_rows = sorted(map(tuple, skp.read_with_skipping(spark, path, preds).collect()))
    want_rows = sorted(
        map(tuple, skp.read_with_skipping(spark, rebuilt, preds).collect())
    )
    assert got_rows == want_rows

    # idempotent: a second tick finds 2 generations and no-ops
    rep2 = mt.maintain_table_layout(
        spark, path, small_file_mb=0.0001, max_z_generations=3
    )
    assert rep2["zfold"]["folded"] is False
    assert rep2["zfold"]["n_generations"] == 2

    # raw appends newer than the last extend are NOT folded: they stay
    # the next extend's delta
    slab(6000, 6500).coalesce(1).write.mode("append").parquet(path)
    rep3 = mt.zorder_fold(spark, path, max_generations=1)
    assert rep3["folded"] is True  # folds the 2 clustered generations
    assert spark.read.parquet(path).count() == 6500
    assert mt.zorder_extend(spark, path)["extended"] is True  # delta intact


def test_maintenance_ticks_hold_single_writer_lock(spark, tmp_path):
    """VERDICT r11 ask 7: the staged-swap sibling names (__zstage,
    __stage, __old) assume one writer per table; the tick lock turns a
    concurrent second tick from silent journal corruption into a
    detected error, steals crashed (stale) locks, and is re-entrant so
    the composed tick's stages share one acquisition."""
    import os as _os
    import time as _time

    import pytest as _pytest

    path = str(tmp_path / "locked")
    spark.range(1000).select(
        (F.col("id") % 16).alias("a"), ((F.col("id") * 3) % 16).alias("b"),
        F.col("id").alias("v"),
    ).coalesce(4).write.parquet(path)
    mt.zorder_init(spark.read.parquet(path), path + "_z", "a", "b",
                   n_files=2, bits=4)

    lock = path + "__tick.lock"
    # a live lock (fresh mtime) blocks every public tick
    with open(lock, "w") as fh:
        fh.write("99999")
    with _pytest.raises(mt.ConcurrentMaintenanceError):
        mt.maintain_table_layout(spark, path, small_file_mb=0.0001)
    with _pytest.raises(mt.ConcurrentMaintenanceError):
        mt.maintain_table(spark, path)

    # a stale lock is presumed crashed and stolen
    _os.utime(lock, (1, 1))
    rep = mt.maintain_table_layout(spark, path, small_file_mb=0.0001)
    assert rep["n_files"] == 4
    assert not _os.path.exists(lock)  # released after the tick

    # composed tick re-enters through its stages without deadlocking,
    # and the z-ordered table's extend/fold acquire+release their own
    rep2 = mt.maintain_table(spark, path + "_z", small_file_mb=0.0001)
    assert rep2["zorder"]["extended"] is False
    assert not _os.path.exists(path + "_z__tick.lock")

    # the lock releases on failure too (no stuck table after an error)
    try:
        with mt._single_writer(spark, path):
            raise ValueError("boom")
    except ValueError:
        pass
    assert not _os.path.exists(lock)


def test_layout_tick_repairs_manifest_after_recovery_only(spark, tmp_path):
    """Review finding (r12): a direct layout tick that only REPLAYS a
    crashed extend journal (no fold, no compaction) still moved/
    deleted data files — the stats manifest must be repaired in that
    branch too, or pruned reads hit deleted paths / silently miss the
    moved-in tiles."""
    from bohemia_kenya_data_pipeline_spark.operators import skipping as skp

    path = str(tmp_path / "zrec")
    base = spark.range(1000).select(
        (F.col("id") % 32).alias("a"), ((F.col("id") * 5) % 32).alias("b"),
        F.col("id").alias("v"),
    )
    mt.zorder_init(base, path, "a", "b", n_files=4, bits=5)
    skp.build_file_manifest(spark, path, ["a", "b"])
    delta = spark.range(1000, 1500).select(
        (F.col("id") % 32).alias("a"), ((F.col("id") * 5) % 32).alias("b"),
        F.col("id").alias("v"),
    )
    delta.coalesce(1).write.mode("append").parquet(path)
    skp.maintain_file_manifest(spark, path)  # manifest knows the delta

    # stage + journal a swap, crash before any replay (pending intent)
    params = skp._read_json(spark, mt._zparams_path(path))
    known = set(params["files"])
    dnames = sorted(
        {os.path.basename(f) for f in glob.glob(os.path.join(path, "*.parquet"))}
        - known
    )
    stage_dir = path + "__zstage"
    ddf = spark.read.parquet(*[os.path.join(path, n) for n in dnames])
    mt.cluster_write(
        ddf.withColumn("__z", mt.zorder_value("a", "b", 5)),
        stage_dir, ["__z"], 1, drop_cols=["__z"],
    )
    staged = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(stage_dir, "*.parquet"))
    )
    params["pending_add"] = staged
    params["pending_remove"] = dnames
    params["files"] = sorted(known | set(staged))
    params["generations"] = mt._zgenerations(params) + [staged]
    skp._write_json(spark, mt._zparams_path(path), params)

    # direct layout tick: healthy small-file share (no compaction),
    # generation count under the cap (no fold) -> recovery only
    rep = mt.maintain_table_layout(spark, path, small_file_mb=0.0001)
    assert rep["compacted"] is False
    assert rep["zfold"]["folded"] is False and rep["zfold"]["recovered"] is False
    assert rep["manifest"] == "repaired"
    # the pruned read over the repaired manifest is exact (no missing
    # files, no ghost rows)
    preds = [("a", "between", (5, 25)), ("b", "between", (5, 25))]
    got = skp.read_with_skipping(spark, path, preds)
    want = spark.read.parquet(path).filter(
        F.col("a").between(5, 25) & F.col("b").between(5, 25)
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert spark.read.parquet(path).count() == 1500


def test_lock_release_is_tokened_after_steal(spark, tmp_path):
    """ADVICE r12 (medium): the original holder's exit must NOT delete
    a lock that was (stale-presumption) stolen by a new holder — an
    unconditional delete would admit a third concurrent writer, the
    silent-corruption scenario the lock exists to prevent. Release is
    now conditional on the lock still holding this tick's token."""
    path = str(tmp_path / "tok")
    lock = path + "__tick.lock"
    with mt._single_writer(spark, path):
        assert os.path.exists(lock)
        own = open(lock).read()
        assert ":" in own and own.split(":")[0] == str(os.getpid())
        # simulate a steal: a new holder replaced the lock file with
        # its own token while this tick was still running
        with open(lock, "w") as fh:
            fh.write("4242:feedfacefeedfacefeedfacefeedface")
    # the stolen lock SURVIVES the original holder's exit
    assert os.path.exists(lock)
    assert open(lock).read().startswith("4242:")
    os.remove(lock)
    # and the normal (un-stolen) exit still releases
    with mt._single_writer(spark, path):
        pass
    assert not os.path.exists(lock)


def test_lock_heartbeat_keeps_long_live_tick_fresh(spark, tmp_path):
    """ADVICE r12 (medium): a legitimate tick can outlive
    stale_seconds (hours-long fold/compaction on a 100 TB table); the
    heartbeat refreshes the lock mtime every stale_seconds/4 so a
    competitor never presumes a LIVE tick crashed and steals it."""
    import threading as _threading
    import time as _time

    path = str(tmp_path / "hb")
    outcome: dict = {}

    def _attempt() -> None:
        # a different thread has its own _TICK_LOCKS (threading.local),
        # so this goes through the full contention check
        try:
            with mt._single_writer(spark, path, stale_seconds=1.2):
                outcome["entered"] = True
        except mt.ConcurrentMaintenanceError:
            outcome["blocked"] = True

    with mt._single_writer(spark, path, stale_seconds=1.2):
        _time.sleep(2.6)  # > 2x stale_seconds; heartbeat fires ~every 0.3s
        t = _threading.Thread(target=_attempt)
        t.start()
        t.join()
    assert outcome == {"blocked": True}
    assert not os.path.exists(path + "__tick.lock")


def test_zorder_fold_clamps_nonpositive_max_generations(spark, tmp_path):
    """ADVICE r12 (low): max_generations <= 0 on a single-generation
    table used to pass the fold gate with an empty victims list and
    throw on the zero-path read; the base generation is never a fold
    victim, so the cap clamps to >= 1 and the tick no-ops."""
    path = str(tmp_path / "clamp0")
    df = spark.range(600).select(
        (F.col("id") % 16).alias("a"),
        ((F.col("id") * 7) % 16).alias("b"),
        F.col("id").alias("v"),
    )
    mt.zorder_init(df, path, "a", "b", n_files=2, bits=4)
    rep = mt.zorder_fold(spark, path, max_generations=0)
    assert rep["folded"] is False and rep["n_generations"] == 1
    assert spark.read.parquet(path).count() == 600


def test_heartbeat_survives_transient_settimes_failures():
    """ADVICE r13 (low): the heartbeat used to exit permanently on the
    FIRST setTimes exception — one transient FS hiccup (or an object
    store with unsupported setTimes) and an hours-long live tick
    becomes stealable after stale_seconds, the exact hazard the
    heartbeat prevents. It must treat failures as missed beats and
    keep going while the lock still exists."""
    import threading
    import time as _time

    class FlakyFS:
        def __init__(self):
            self.beats = 0
            self.stats = 0

        def setTimes(self, lock, a, b):
            self.beats += 1
            if self.beats <= 3:
                raise RuntimeError("transient fs hiccup")

        def exists(self, lock):
            self.stats += 1
            return True

    fs = FlakyFS()
    stop = threading.Event()
    t = threading.Thread(
        target=mt._heartbeat_loop, args=(fs, "lk", stop, 0.02), daemon=True
    )
    t.start()
    deadline = _time.time() + 10
    while fs.beats < 6 and _time.time() < deadline:
        _time.sleep(0.02)
    stop.set()
    t.join(2)
    assert fs.beats >= 6, "heartbeat died on a transient failure"
    assert fs.stats >= 3  # it checked the lock on each failure
    assert not t.is_alive()


def test_heartbeat_keeps_beating_when_stat_also_fails():
    """A failing exists() probe is also transient — only a PROVABLY
    missing lock (exists() returns False) ends the loop early."""
    import threading
    import time as _time

    class BlindFS:
        def __init__(self):
            self.beats = 0

        def setTimes(self, lock, a, b):
            self.beats += 1
            raise RuntimeError("down")

        def exists(self, lock):
            raise RuntimeError("also down")

    fs = BlindFS()
    stop = threading.Event()
    t = threading.Thread(
        target=mt._heartbeat_loop, args=(fs, "lk", stop, 0.02), daemon=True
    )
    t.start()
    deadline = _time.time() + 10
    while fs.beats < 4 and _time.time() < deadline:
        _time.sleep(0.02)
    stop.set()
    t.join(2)
    assert fs.beats >= 4
    assert not t.is_alive()


def test_heartbeat_exits_once_lock_provably_gone():
    """When the lock file no longer exists (released or stolen), the
    loop ends — setTimes on a deleted path must not spin forever."""
    import threading

    class GoneFS:
        def __init__(self):
            self.beats = 0

        def setTimes(self, lock, a, b):
            self.beats += 1
            raise RuntimeError("FileNotFound")

        def exists(self, lock):
            return False

    fs = GoneFS()
    stop = threading.Event()
    t = threading.Thread(
        target=mt._heartbeat_loop, args=(fs, "lk", stop, 0.02), daemon=True
    )
    t.start()
    t.join(5)
    assert not t.is_alive()
    assert fs.beats == 1
