"""Structured Streaming windowed operators (SURVEY §2.10).

The reference is request/response, but its streaming-shaped behaviors map
natively: cursor pagination → incremental feed, the 7-day FAISS retention →
watermark-bounded state. These operators run the SAME aggregation logic as
the batch ``events_hourly`` / ``events_sessions`` workload queries — one
definition, two execution modes, which is the Spark-first way to keep batch
and streaming results consistent.

Watermarks bound state: at 100 TB/day of events, an unbounded-state
aggregation dies; ``withWatermark`` lets Spark drop window state older than
the lateness bound, exactly like the reference drops >7-day-old partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_counts_stream(
    events: DataFrame,
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    """Tumbling event-time window counts over a streaming events frame."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows per user (streaming form of the batch
    ``events_sessions`` query)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts_r",
    within: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: right events landing within
    ``[left_ts, left_ts + within]`` for the same key (the streaming twin
    of the batch ``range_join`` — click→purchase attribution shape).

    Both sides carry a watermark and the join condition carries the time
    bound, which is what lets Spark EXPIRE join state: a buffered left row
    can stop waiting once the right watermark passes ``left_ts + within``.
    Without the bound the state store grows forever — the stream-stream
    equivalent of the n² trap.
    """
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[key] == r[key])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner").drop(r[key])


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: decorate a streaming fact with a
    batch dimension (user → segment, doc → source metadata). The static
    side is explicitly broadcast, so each micro-batch pays a map-side
    hash probe — NO shuffle of the stream, no state store, no watermark
    (stateless joins need none; only stream-stream joins hold state).
    The dimension snapshot is re-resolved per micro-batch under
    file-source refresh, which is the standard slowly-refreshing-dim
    pattern. At 100 TB/day the stream side never repartitions — the
    whole join lives in the scan stage of each micro-batch."""
    return events.join(F.broadcast(dim), on, how)
