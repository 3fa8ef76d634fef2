"""Stateful streaming on the Spark 4 ``transformWithStateInPandas`` API —
the successor to ``applyInPandasWithState`` (typed state handles, timers,
RocksDB-backed state, schema evolution of state).

Operator: per-key running top-k values. State is a single bounded list
(k floats) per key — like the KMV sketch, the state size is independent
of stream length, which is the property that makes the computation
maintainable indefinitely. The older-API twins live in ``stateful.py``;
this module exists on the new API because at 100 TB/day the state store
(RocksDB, incremental checkpoints, per-key eviction) is exactly the part
the old API outgrows first.

Environment note: the new API's python<->JVM state protocol is protobuf;
in containers without ``google.protobuf`` the e2e test skips
(``pytest.importorskip``) while this module stays import-clean — the same
gate pattern as the optional sentence-transformers embedder.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType([StructField("topk", ArrayType(DoubleType()))])
_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("topk", ArrayType(DoubleType())),
    ]
)


class TopKValuesProcessor(StatefulProcessor):
    """Keep the k largest ``value``s ever seen per key; emit the refreshed
    (sorted descending) list after every micro-batch that touches the
    key."""

    def __init__(self, k: int = 3):
        self._k = k

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("topk", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        current: list[float] = (
            list(self._state.get()[0]) if self._state.exists() else []
        )
        for pdf in rows:
            current.extend(float(v) for v in pdf["value"])
        current = sorted(current, reverse=True)[: self._k]
        self._state.update((current,))
        yield pd.DataFrame({"user_id": [key[0]], "topk": [current]})

    def close(self) -> None:
        pass


def streaming_topk_values(events: DataFrame, k: int = 3) -> DataFrame:
    """Per-user running top-k event values via transformWithStateInPandas.
    Requires the RocksDB state store provider (set by the caller/test on
    the session); output mode Update — one refreshed row per touched key
    per batch."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=TopKValuesProcessor(k),
        outputStructType=_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
