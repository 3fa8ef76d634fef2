"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY §2.10 — the extension surface the reference's rolling 7-day index
implies: per-key state with explicit retention).

Two operators:

  * ``running_user_totals`` — per-key running aggregates that survive
    across micro-batches (the streaming form of a cumulative groupBy that
    batch mode cannot express incrementally).
  * ``first_seen_dedup`` — emit only the first occurrence of each key,
    with a processing-time state TTL so state is bounded (the reference's
    7-day partition expiry, reinterpreted as per-key state retention —
    reference ``faiss_manager.py:90-104``).

State is per-key and partitioned by the grouping key, so it scales
horizontally: 1000 executors each hold state only for their key range,
and the TTL bounds total state size regardless of stream length.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_TOTALS_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
_TOTALS_STATE = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _totals_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) across all micro-batches."""
    return events.groupBy("user_id").applyInPandasWithState(
        _totals_fn,
        outputStructType=_TOTALS_OUT,
        stateStructType=_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_SEEN_OUT = StructType(
    [StructField("user_id", LongType()), StructField("event_id", LongType())]
)
_SEEN_STATE = StructType([StructField("seen", LongType())])


def _make_dedup_fn(ttl_ms: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        rows = [pdf for pdf in pdfs]
        if not state.exists:
            first = pd.concat(rows).sort_values("event_id").iloc[:1]
            state.update((1,))
            state.setTimeoutDuration(ttl_ms)
            yield first[["user_id", "event_id"]]
        else:
            state.setTimeoutDuration(ttl_ms)

    return fn


def first_seen_dedup(events: DataFrame, ttl_ms: int = 7 * 86_400_000) -> DataFrame:
    """Emit each key's first-seen event only; forget keys after ``ttl_ms``
    of processing-time inactivity (bounded state — the 7-day retention
    default mirrors the reference's index expiry)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_dedup_fn(ttl_ms),
        outputStructType=_SEEN_OUT,
        stateStructType=_SEEN_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def watermarked_dedup(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    delay: str = "2 hours",
) -> DataFrame:
    """Built-in streaming dedup: ``dropDuplicatesWithinWatermark`` keeps
    the first arrival per key and lets the engine evict key state once the
    event-time watermark passes ``delay`` — state is bounded by TIME, not
    by a TTL on inactivity. Prefer this JVM-native operator over the
    ``applyInPandasWithState`` path (``first_seen_dedup``) whenever the
    eviction policy is expressible as a watermark; the custom path exists
    for policies that aren't (per-key processing-time TTL, first-by-
    secondary-ordering selection)."""
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        list(keys)
    )
