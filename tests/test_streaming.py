"""Streaming pack tests: differential (streaming over a static dir ==
batch plan on the same data) plus a real late-data watermark check."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from bohemia_kenya_data_pipeline_spark import streaming as st
from bohemia_kenya_data_pipeline_spark.operators import windows as W

BASE = dt.datetime(2026, 1, 1, 0, 0, 0)
SCHEMA = "user_id BIGINT, ts TIMESTAMP, event_type STRING"


def _rows():
    rows = []
    for u in range(1, 11):
        # session 1: 10 events ~5 min apart; session 2 (after 2 h gap):
        # 5 events ~5 min apart. Sub-second offsets included so the
        # differential catches any precision truncation in the
        # streaming path.
        for j in range(10):
            ts = BASE + dt.timedelta(minutes=5 * j, milliseconds=(137 * (u + j)) % 1000)
            rows.append((u, ts, "click"))
        start2 = BASE + dt.timedelta(minutes=45 + 120)
        for j in range(5):
            ts = start2 + dt.timedelta(minutes=5 * j, microseconds=(271 * (u + j)) % 1_000_000)
            rows.append((u, ts, "view"))
    return rows


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream") / "events")
    spark.createDataFrame(_rows(), SCHEMA).coalesce(1).write.parquet(path)
    return path


def _run_available_now(df, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_counts_match_batch(spark, events_dir):
    stream = st.stream_events(spark, events_dir, SCHEMA)
    out = st.windowed_event_counts(
        stream, window="15 minutes", watermark="10 minutes"
    )
    _run_available_now(out, "win_counts")
    got = {
        (r.window_start, r.window_end, r.event_type): r.n
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch_df = spark.read.parquet(events_dir)
    max_ts = batch_df.agg(F.max("ts")).collect()[0][0]
    final_watermark = max_ts - dt.timedelta(minutes=10)
    expected = {
        (r.win.start, r.win.end, r.event_type): r.n
        for r in batch_df.groupBy(
            F.window("ts", "15 minutes").alias("win"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        # append mode emits only windows finalized by the watermark
        if r.win.end <= final_watermark
    }
    assert got == expected
    assert len(got) > 0


def test_sessionize_stream_matches_batch_closed_sessions(spark, events_dir):
    stream = st.stream_events(spark, events_dir, SCHEMA)
    # 10 h watermark: no event-time timeout fires within this data, so
    # the stream emits exactly the data-closed sessions
    out = st.sessionize_stream(stream, gap_minutes=30, watermark="10 hours")
    _run_available_now(out, "sessions")
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    batch = W.sessionize(
        spark.read.parquet(events_dir), "user_id", "ts", gap_minutes=30
    )
    sess = (
        batch.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    last = sess.groupBy("user_id").agg(F.max("session_id").alias("session_id"))
    closed = sess.join(last, ["user_id", "session_id"], "left_anti")
    expected = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in closed.collect()
    }
    assert got == expected
    assert len(got) == 10  # one closed session per user


def test_watermark_drops_late_data(spark, tmp_path):
    path = str(tmp_path / "late_events")
    on_time = [(1, BASE + dt.timedelta(minutes=m), "click") for m in (0, 5, 40)]
    spark.createDataFrame(on_time, SCHEMA).coalesce(1).write.parquet(path)

    stream = st.stream_events(spark, path, SCHEMA)
    out = st.windowed_event_counts(stream, window="15 minutes", watermark="5 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("late_counts")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()  # watermark now 00:35
        # a late event in the already-finalized first window...
        late = [(1, BASE + dt.timedelta(minutes=1), "click")]
        spark.createDataFrame(late, SCHEMA).coalesce(1).write.mode("append").parquet(path)
        q.processAllAvailable()
        # ...and a far-future event to push the watermark past everything
        flush = [(1, BASE + dt.timedelta(hours=3), "click")]
        spark.createDataFrame(flush, SCHEMA).coalesce(1).write.mode("append").parquet(path)
        q.processAllAvailable()
    finally:
        q.stop()
    counts = {
        r.window_start: r.n for r in spark.sql("SELECT * FROM late_counts").collect()
    }
    # first window [00:00,00:15) was finalized before the late row
    # arrived: count stays 2, the late event is dropped
    assert counts[BASE] == 2
    assert counts[BASE + dt.timedelta(minutes=30)] == 1
