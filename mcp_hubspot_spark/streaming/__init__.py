from .windows import (
    enrich_stream,
    hourly_counts_stream,
    interval_join_stream,
    session_stream,
)
from .incremental import IncrementalReader

__all__ = [
    "enrich_stream",
    "hourly_counts_stream",
    "interval_join_stream",
    "session_stream",
    "IncrementalReader",
]
