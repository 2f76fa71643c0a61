"""S-layer round-trip tests: schema'd CSV read with ''->NULL, form
tree with form_id tagging, single-file CSV contract, partitioned
history sink + pruned read, dedup-on-ingest, file listing (S14)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, StringType, StructField, StructType,
)

from bohemia_kenya_data_pipeline_spark import catalog as cat

SCHEMA = StructType(
    [
        StructField("instanceID", StringType()),
        StructField("hhid", StringType()),
        StructField("age", IntegerType()),
    ]
)


@pytest.fixture()
def form_dir(tmp_path):
    d = tmp_path / "raw-form" / "v0demography"
    d.mkdir(parents=True)
    (d / "v0demography.csv").write_text(
        "instanceID,hhid,age\nuuid:a,00001,30\nuuid:b,,40\n"
    )
    d2 = tmp_path / "raw-form" / "safety"
    d2.mkdir(parents=True)
    (d2 / "safety.csv").write_text("instanceID,hhid,age\nuuid:c,00003,50\n")
    return str(tmp_path / "raw-form")


def test_read_csv_form_schema_and_null_normalization(spark, form_dir):
    df = cat.read_csv_form(spark, os.path.join(form_dir, "v0demography"), SCHEMA)
    rows = {r.instanceID: r for r in df.collect()}
    assert df.schema == SCHEMA  # declared, not inferred
    assert rows["uuid:b"].hhid is None  # '' -> NULL engine default
    assert rows["uuid:a"].age == 30


def test_read_form_tree_tags_form_id(spark, form_dir):
    df = cat.read_form_tree(spark, form_dir, SCHEMA)
    got = {(r.form_id, r.instanceID) for r in df.collect()}
    assert ("v0demography", "uuid:a") in got
    assert ("safety", "uuid:c") in got


def test_write_csv_single_file_contract(spark, tmp_path, form_dir):
    df = cat.read_csv_form(spark, os.path.join(form_dir, "v0demography"), SCHEMA)
    out = str(tmp_path / "clean")
    cat.write_csv(df, out, single_file=True)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 1  # one file per form, as the reference lays out


def test_history_partition_append_and_pruning(spark, tmp_path):
    df = spark.createDataFrame([("k1", "f")], ["KEY", "form_id"])
    out = str(tmp_path / "hist")
    cat.write_history_partition(df, out, partition_value="2026-08-01")
    cat.write_history_partition(df, out, partition_value="2026-08-02")
    full = spark.read.parquet(out)
    assert full.count() == 2
    one = full.filter(F.col("partition_date") == "2026-08-01")
    assert one.count() == 1
    # partition filter reaches the scan (pruning, not a full read)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "partition_date" in plan


def test_dedup_on_ingest(spark):
    df = spark.createDataFrame(
        [("r1", "a"), ("r1", "b"), ("r2", "c")], ["resolution_id", "v"]
    )
    assert cat.dedup_on_ingest(df, ["resolution_id"]).count() == 2


def test_list_files_as_table(spark, form_dir):
    listing = cat.list_files_as_table(spark, form_dir)
    rows = listing.collect()
    assert len(rows) == 2
    assert all(r.size > 0 for r in rows)
    assert any("v0demography.csv" in r.key for r in rows)


def test_seeded_sample_partition_invariant(spark):
    # W11: with a tiebreak key, the sampled set must not depend on the
    # physical partitioning (hash-of-key order, not per-partition rand)
    from bohemia_kenya_data_pipeline_spark.operators import windows as W

    df = spark.range(1000).select(
        (F.col("id") % 10).alias("grp"), F.col("id").cast("string").alias("rid")
    )
    a = {(r.grp, r.rid) for r in
         W.seeded_shuffle_sample(df, ["grp"], 5, seed=7, order_tiebreak="rid").collect()}
    b = {(r.grp, r.rid) for r in
         W.seeded_shuffle_sample(df.repartition(17), ["grp"], 5, seed=7,
                                 order_tiebreak="rid").collect()}
    assert a == b and len(a) == 50


def test_load_polygons_csv_roundtrip(spark, tmp_path):
    from bohemia_kenya_data_pipeline_spark.operators import spatial as sp

    p = tmp_path / "polys.csv"
    p.write_text(
        "pid,seq,lon,lat\n"
        "7,1,0.0,0.0\n7,2,1.0,0.0\n7,3,0.0,1.0\n"
        "3,1,5.0,5.0\n3,2,6.0,5.0\n3,3,6.0,6.0\n3,4,5.0,6.0\n"
    )
    polys = sp.load_polygons_csv(spark, str(p))
    assert [pid for pid, _ in polys] == [3, 7]
    assert polys[1][1] == [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0)]
    # loaded polygons drive the assignment end-to-end
    pts = spark.createDataFrame([(1, 0.2, 0.2)], ["id", "Longitude", "Latitude"])
    out = sp.assign_clusters(pts, polys).collect()[0]
    assert out.geo_cluster_num == 7


def test_landed_sheet_and_export_cap(spark, tmp_path):
    p = tmp_path / "sheet.csv"
    p.write_text("instanceID,hhid,age\nr1,00001,30\nr1,00001,30\nr2,00002,40\n")
    df = cat.read_landed_sheet(spark, str(p), SCHEMA, dedup_keys=["instanceID"])
    assert df.count() == 2
    cat.export_sheet_csv(df, str(tmp_path / "out"))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cap exceeded"):
        cat.export_sheet_csv(df, str(tmp_path / "out2"), max_rows=1)


# --------------------------------------------------------------------------
# JSONL source/sink (LLM-pipeline interchange format)
# --------------------------------------------------------------------------

JSONL_SCHEMA = "doc_id BIGINT, text STRING, score DOUBLE"


def test_jsonl_roundtrip_preserves_tricky_values(spark, tmp_path):
    rows = [
        (1, 'embedded "quotes" and \\ backslash', 0.5),
        (2, "newline\nand\ttab", -1.25),
        (3, "unicode: é中文 \U0001f600", 0.0),
        (4, None, None),  # explicit nulls survive (keep_nulls=True)
        (5, "", 2.0),  # empty string stays "" (not null — unlike CSV)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "score"])
    out = str(tmp_path / "docs_jsonl")
    cat.write_jsonl(df, out)
    back = cat.read_jsonl(spark, out, JSONL_SCHEMA)
    got = sorted(
        (r.doc_id, r.text, r.score) for r in back.select("doc_id", "text", "score").collect()
    )
    assert got == sorted(rows)
    # PERMISSIVE adds the corrupt-record column; clean data leaves it
    # NULL (persist first — corrupt-only queries on the raw scan are
    # disallowed by Spark, see read_jsonl docstring)
    cached = back.persist()
    try:
        assert cached.filter(F.col("_corrupt_record").isNotNull()).count() == 0
    finally:
        cached.unpersist()


def test_jsonl_corrupt_lines_quarantined_not_fatal(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "score": 1.0}\n'
        "{this is not json}\n"
        '{"doc_id": "notanint", "text": "bad type", "score": 2.0}\n'
        '{"doc_id": 3, "text": "also ok", "score": 3.0}\n'
    )
    back = cat.read_jsonl(spark, str(p), JSONL_SCHEMA)
    good = back.filter(F.col("_corrupt_record").isNull())
    bad = back.filter(F.col("_corrupt_record").isNotNull()).select(
        "doc_id", "_corrupt_record"
    )
    assert sorted(r.doc_id for r in good.select("doc_id").collect()) == [1, 3]
    bad_rows = bad.collect()
    assert len(bad_rows) == 2  # malformed line + type-mismatch line
    # the raw offending line is preserved verbatim for quarantine/debug
    assert "{this is not json}" in {r._corrupt_record for r in bad_rows}
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    # exact exception types only — a bare Exception would also match a
    # path typo or analysis error, making the FAILFAST assertion vacuous
    with pytest.raises((Py4JJavaError, PySparkException)):
        cat.read_jsonl(spark, str(p), JSONL_SCHEMA, mode="FAILFAST").collect()


def test_jsonl_keep_nulls_and_single_file_contract(spark, tmp_path):
    df = spark.createDataFrame([(1, None, None)], schema=JSONL_SCHEMA)
    out = tmp_path / "one"
    cat.write_jsonl(df, str(out), single_file=True)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 1
    raw = (out / parts[0]).read_text()
    assert '"text":null' in raw  # explicit null, not a dropped field
    out2 = tmp_path / "dropped"
    cat.write_jsonl(df, str(out2), single_file=True, keep_nulls=False)
    parts2 = [f for f in os.listdir(out2) if f.startswith("part-")]
    raw2 = (out2 / parts2[0]).read_text()
    assert '"text"' not in raw2  # Spark default: null fields omitted


def test_jsonl_compressed_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "alpha", 1.0), (2, "beta β", None)], schema=JSONL_SCHEMA
    )
    out = tmp_path / "gz"
    cat.write_jsonl(df, str(out), compression="gzip")
    assert any(f.endswith(".gz") for f in os.listdir(out) if f.startswith("part-"))
    back = cat.read_jsonl(spark, str(out), JSONL_SCHEMA)  # codec auto-detected
    got = sorted((r.doc_id, r.text, r.score) for r in back.collect())
    assert got == [(1, "alpha", 1.0), (2, "beta β", None)]


def test_jsonl_stream_incremental_ingest(spark, tmp_path):
    # two shards landed before the trigger: both consumed exactly once,
    # corrupt line quarantined not fatal — same contract as batch
    src = tmp_path / "landing"
    src.mkdir()
    (src / "shard-000.jsonl").write_text(
        '{"doc_id": 1, "text": "a", "score": 0.1}\n{"doc_id": 2, "text": "b", "score": 0.2}\n'
    )
    (src / "shard-001.jsonl").write_text(
        '{"doc_id": 3, "text": "c", "score": 0.3}\nnot json at all\n'
    )
    stream = cat.read_jsonl_stream(
        spark, str(src), JSONL_SCHEMA, max_files_per_trigger=1
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("jsonl_ingest")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT doc_id, _corrupt_record FROM jsonl_ingest ORDER BY doc_id"
    ).collect()
    assert [r.doc_id for r in rows if r.doc_id is not None] == [1, 2, 3]
    assert sum(1 for r in rows if r._corrupt_record is not None) == 1


# --------------------------------------------------------------------------
# ORC source/sink (second columnar serving format)
# --------------------------------------------------------------------------


def test_orc_roundtrip_tricky_values_and_arrays(spark, tmp_path):
    # nulls, unicode, newlines, empty strings, and array columns all
    # survive the columnar trip under a non-default codec — the value
    # classes JSONL/CSV mangle are exactly the ones to pin here
    rows = [
        (1, 'quotes " and \\ slash', [1.0, -2.5]),
        (2, "newline\nand\ttab", []),
        (3, "unicode: é中文 \U0001f600", None),
        (4, None, [0.0]),
        (5, "", [3.25, 4.5]),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, emb ARRAY<DOUBLE>")
    out = str(tmp_path / "docs_orc")
    cat.write_orc(df, out, compression="zstd", bloom_filter_cols=["doc_id"])
    back = cat.read_orc(spark, out)
    got = sorted((r.doc_id, r.text, r.emb) for r in back.collect())
    assert got == sorted(rows)
    # schema came from the footer, not inference heuristics
    assert dict(back.dtypes) == {"doc_id": "bigint", "text": "string", "emb": "array<double>"}


def test_orc_predicate_pushdown_reaches_scan(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("bucket")
    )
    out = str(tmp_path / "pushdown_orc")
    cat.write_orc(df, out)
    q = cat.read_orc(spark, out, "doc_id BIGINT, bucket BIGINT").filter(
        F.col("doc_id") == 42
    ).select("doc_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the filter reaches the ORC scan (stripe/row-group skipping) and
    # the projection prunes to the selected columns
    assert "PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,42)" in plan
    assert "ReadSchema: struct<doc_id:bigint>" in plan
    assert [r.doc_id for r in q.collect()] == [42]


def test_orc_schema_pin_fails_loud_on_contract_drift(spark, tmp_path):
    # pinning a schema on an ingest boundary: a producer-side retype
    # must fail at read/collect time, not flow wrong values downstream
    df = spark.createDataFrame([(1, "a")], "doc_id BIGINT, text STRING")
    out = str(tmp_path / "pin_orc")
    cat.write_orc(df, out)
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    with pytest.raises((Py4JJavaError, PySparkException)):
        cat.read_orc(spark, out, "doc_id ARRAY<DOUBLE>, text STRING").collect()


# --------------------------------------------------------------------------
# Raw-text corpus source/sink (*.txt shards)
# --------------------------------------------------------------------------


def test_text_corpus_roundtrip_line_mode(spark, tmp_path):
    texts = ["alpha doc", "unicode é中文", "", "trailing space "]
    df = spark.createDataFrame([(t,) for t in texts], "text STRING")
    out = str(tmp_path / "txt_shards")
    cat.write_text_corpus(df, out)
    back = cat.read_text_corpus(spark, out)
    assert sorted(r.value for r in back.collect()) == sorted(texts)


def test_text_corpus_embedded_newline_contract(spark, tmp_path):
    # records ARE lines: an embedded \n comes back as TWO records —
    # the documented contract callers must normalize around
    df = spark.createDataFrame([("one\ntwo",)], "text STRING")
    out = str(tmp_path / "nl_shards")
    cat.write_text_corpus(df, out)
    got = sorted(r.value for r in cat.read_text_corpus(spark, out).collect())
    assert got == ["one", "two"]


def test_text_corpus_wholetext_and_path_provenance(spark, tmp_path):
    src = tmp_path / "corpus"
    sub = src / "nested"
    sub.mkdir(parents=True)
    (src / "a.txt").write_text("doc A line 1\ndoc A line 2\n")
    (sub / "b.txt").write_text("doc B\n")
    whole = cat.read_text_corpus(spark, str(src), wholetext=True, include_path=True)
    rows = {r.source_file.rsplit("/", 1)[-1]: r.value for r in whole.collect()}
    # one row per FILE, newlines intact, recursive lookup found the
    # nested shard, and provenance survived
    assert rows["a.txt"] == "doc A line 1\ndoc A line 2\n"
    assert rows["b.txt"] == "doc B\n"
    lines = cat.read_text_corpus(spark, str(src))
    assert lines.count() == 3  # same corpus, line mode
