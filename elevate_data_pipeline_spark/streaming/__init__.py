from .events import (
    dedup_stream,
    enrich_stream,
    events_stream_schema,
    hourly_rollup,
    join_streams_interval,
    latest_state,
    quota_per_key,
    read_events_stream,
    sessionize_batch,
    sessionize_native,
    sessionize_stream,
    upsert_sink,
)
from .ingest import dedup_ingest_sink, drift_monitor_sink, topk_monitor_sink

__all__ = [
    "events_stream_schema",
    "read_events_stream",
    "hourly_rollup",
    "sessionize_batch",
    "sessionize_native",
    "sessionize_stream",
    "upsert_sink",
    "dedup_stream",
    "enrich_stream",
    "join_streams_interval",
    "latest_state",
    "quota_per_key",
    "dedup_ingest_sink",
    "drift_monitor_sink",
    "topk_monitor_sink",
]
