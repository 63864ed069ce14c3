from .events_stream import (
    read_events_stream,
    stream_hourly_rollup,
    stream_dedup_keep_first,
    stream_session_stats,
)

__all__ = [
    "read_events_stream",
    "stream_hourly_rollup",
    "stream_dedup_keep_first",
    "stream_session_stats",
]
