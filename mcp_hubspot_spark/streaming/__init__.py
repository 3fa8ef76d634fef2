from .windows import (
    enrich_stream,
    hourly_counts_stream,
    interval_join_stream,
    session_stream,
)
from .incremental import IncrementalReader
from .ingest import (
    stream_docs_to_text_index,
    stream_embed_to_store,
    stream_merge_to_table,
)
from .monitor import histogram_fractions, stream_drift_monitor
from .span_dedup import stream_span_dedup
from .stateful import (
    first_seen_dedup,
    running_user_totals,
    streaming_cms,
    streaming_kmv_distinct,
    streaming_seasonal_stats,
    streaming_quantile_sketch,
    watermarked_dedup,
)

__all__ = [
    "enrich_stream",
    "hourly_counts_stream",
    "interval_join_stream",
    "session_stream",
    "IncrementalReader",
    "stream_embed_to_store",
    "stream_merge_to_table",
    "histogram_fractions",
    "stream_drift_monitor",
    "stream_span_dedup",
    "stream_docs_to_text_index",
    "first_seen_dedup",
    "running_user_totals",
    "streaming_cms",
    "streaming_kmv_distinct",
    "streaming_seasonal_stats",
    "streaming_quantile_sketch",
    "watermarked_dedup",
]
