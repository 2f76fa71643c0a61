"""Structured Streaming pack.

The reference is batch-only (SURVEY §2.9: ODK pulls on a daily
schedule — no streams to consume), so nothing here mirrors a reference
operator. These are the streaming counterparts a large-scale
training-data/event pipeline needs, built on the same semantics as the
batch operators so each one is differentially testable: run the stream
with ``trigger(availableNow=True)`` over a static directory and the
result must equal the batch plan on the same data.

- :func:`stream_events` — file-source ``readStream`` over an events
  zone (schema'd, no inference — streaming requires it).
- :func:`windowed_event_counts` — watermarked tumbling/sliding window
  aggregation (late data beyond the watermark is dropped, state is
  bounded — the 100 TB property).
- :func:`sessionize_stream` — gap-based sessionization via
  ``applyInPandasWithState``: the custom-stateful-operator pattern
  (per-user session state with event-time timeout), emitting closed
  sessions.
"""

from __future__ import annotations

from .events import (
    bitmap_store_sink,
    dedup_stream,
    enrich_stream,
    ewma_alert_stream,
    incremental_dedup_sink,
    interval_join_streams,
    interval_join_streams_left,
    scd2_history_sink,
    session_window_counts,
    sessionize_stream,
    stream_events,
    windowed_event_counts,
)

__all__ = [
    "stream_events",
    "windowed_event_counts",
    "sessionize_stream",
    "session_window_counts",
    "enrich_stream",
    "ewma_alert_stream",
    "dedup_stream",
    "interval_join_streams",
    "interval_join_streams_left",
    "incremental_dedup_sink",
    "bitmap_store_sink",
    "scd2_history_sink",
]
