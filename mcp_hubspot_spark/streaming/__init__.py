from .windows import hourly_counts_stream, interval_join_stream, session_stream
from .incremental import IncrementalReader

__all__ = ["hourly_counts_stream", "interval_join_stream", "session_stream", "IncrementalReader"]
