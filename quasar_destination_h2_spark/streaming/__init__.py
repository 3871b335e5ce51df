"""[EXT] Structured Streaming surface over the ``events`` table.

The reference has no streaming (its sink consumes one bounded byte
stream per push — ``H2CsvCreateSink.scala:42``; the PushmiPullyu hook
is accepted but unused, ``H2DestinationModule.scala:61``). This
module is the north-star extension: watermarked windowed
aggregations, stream dedup, and sessionization — all built-in
Structured Streaming operators, quarantined from the conformance
registry (tested by pytest round-trips instead, SURVEY §2.2).
"""

from .index_maintenance import (
    read_embeddings_stream,
    stream_append_to_index,
)
from .events import (
    clicks_to_purchases,
    dedup_events_stream,
    enrich_events_stream,
    hourly_event_counts,
    read_events_stream,
    running_user_stats,
    session_windows,
    stream_to_table,
)

__all__ = [
    "read_events_stream",
    "hourly_event_counts",
    "dedup_events_stream",
    "running_user_stats",
    "session_windows",
    "enrich_events_stream",
    "clicks_to_purchases",
    "stream_to_table",
    "stream_append_to_index",
    "read_embeddings_stream",
]
