"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY §2.10 — the extension surface the reference's rolling 7-day index
implies: per-key state with explicit retention).

Operators:

  * ``running_user_totals`` — per-key running aggregates that survive
    across micro-batches (the streaming form of a cumulative groupBy that
    batch mode cannot express incrementally).
  * ``first_seen_dedup`` — emit only the first occurrence of each key,
    with a processing-time state TTL so state is bounded (the reference's
    7-day partition expiry, reinterpreted as per-key state retention —
    reference ``faiss_manager.py:90-104``).
  * ``watermarked_dedup`` — the JVM-native watermark-evicted dedup.
  * ``streaming_kmv_distinct`` / ``streaming_quantile_sketch`` /
    ``streaming_cms`` — incrementally maintained mergeable sketches
    (bottom-k, hash-sampled quantiles, count-min cells), each pinned by
    a batch-agreement test against its operators.sketch twin.
  * ``streaming_seasonal_stats`` — online (dow, hod) cell mean/std via
    Welford/Chan merging, the live baseline for seasonal anomaly
    z-scoring.

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
    ArrayType,
    DoubleType,
    LongType,
    StringType,
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


_KMV_OUT = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_sketch", LongType()),
        StructField("est_distinct", DoubleType()),
    ]
)
_KMV_STATE = StructType([StructField("mins", ArrayType(LongType()))])

_KMV_DOMAIN = float(1 << 60)


def _make_kmv_fn(k: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        mins = list(state.get[0]) if state.exists else []
        seen = set(mins)
        for pdf in pdfs:
            seen.update(int(h) for h in pdf["_h"])
        mins = sorted(seen)[:k]
        state.update((mins,))
        n = len(mins)
        est = float(n) if n < k else (k - 1) * _KMV_DOMAIN / float(mins[-1])
        yield pd.DataFrame(
            {"event_type": [key[0]], "n_sketch": [n], "est_distinct": [est]}
        )

    return fn


def streaming_kmv_distinct(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "user_id",
    k: int = 64,
) -> DataFrame:
    """Incremental KMV distinct-count sketch per key: the streaming twin of
    ``operators.sketch.kmv_distinct``. State per key is the bottom-k
    distinct 60-bit hashes (k longs, CONSTANT regardless of stream length
    or true cardinality — the property that makes a distinct count
    maintainable incrementally at all). Each micro-batch merges its hashes
    into the state and emits the refreshed estimate, so after the stream
    drains the latest row per key equals the batch sketch over the same
    data — pinned by the batch-agreement test.

    The hash is computed JVM-side (md5 expression) before the rows reach
    the pandas state function; only (key, hash) pairs cross the Arrow
    boundary.
    """
    from pyspark.sql import functions as F

    hashed = events.select(
        F.col(key_col).alias("event_type"),
        F.conv(
            F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
        )
        .cast("long")
        .alias("_h"),
    )
    return hashed.groupBy("event_type").applyInPandasWithState(
        _make_kmv_fn(k),
        outputStructType=_KMV_OUT,
        stateStructType=_KMV_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_QSK_OUT = StructType(
    [
        StructField("event_type", StringType()),
        StructField("upd", LongType()),
        StructField("n_sample", LongType()),
        StructField("q", DoubleType()),
        StructField("value", DoubleType()),
    ]
)
_QSK_STATE = StructType(
    [
        StructField("hs", ArrayType(LongType())),
        StructField("vs", ArrayType(DoubleType())),
        StructField("upd", LongType()),
    ]
)


def _make_qsketch_fn(m: int, qs: list[float]):
    import math

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            hs, vs, upd = list(state.get[0]), list(state.get[1]), state.get[2]
        else:
            hs, vs, upd = [], [], 0
        pairs = list(zip(hs, vs))
        for pdf in pdfs:
            pairs.extend(
                zip((int(h) for h in pdf["_h"]), (float(v) for v in pdf["_v"]))
            )
        # identical merge rule to the batch twin: bottom-m by (hash,
        # value) — the deterministic uniform sample is closed under
        # union, so micro-batch merging loses nothing the batch keeps
        pairs.sort()
        pairs = pairs[:m]
        upd += 1
        state.update(([h for h, _ in pairs], [v for _, v in pairs], upd))
        vals = sorted(v for _, v in pairs)
        n = len(vals)
        yield pd.DataFrame(
            {
                "event_type": [key[0]] * len(qs),
                "upd": [upd] * len(qs),
                "n_sample": [n] * len(qs),
                "q": [float(q) for q in qs],
                "value": [
                    vals[max(0, math.ceil(q * n) - 1)] if n else None
                    for q in qs
                ],
            }
        )

    return fn


def streaming_quantile_sketch(
    events: DataFrame,
    key_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
    qs: list[float] | None = None,
    m: int = 256,
) -> DataFrame:
    """Incremental quantile estimation per key: the streaming twin of
    ``operators.sketch.hash_sample_quantiles``. State per key is the
    bottom-m (60-bit id-hash, value) pairs — a deterministic uniform
    sample that is CLOSED UNDER UNION, so merging micro-batches yields
    exactly the sample the batch operator computes over the same rows;
    the emitted discrete quantiles (element at ceil(q·n), no
    interpolation) therefore match the batch twin bit-for-bit after the
    stream drains — pinned by the agreement test. State is m pairs per
    key, constant in stream length; ``upd`` is a per-key emission
    counter so consumers can select each key's final refresh (sample
    REPLACEMENT can change values without changing n_sample, so a max
    over n is not enough — unlike KMV, whose estimate is monotone).

    The id hash is the same JVM-side md5 expression as the batch twin;
    only (key, hash, value) rows cross the Arrow boundary.
    """
    from pyspark.sql import functions as F

    qs = qs if qs is not None else [0.5, 0.9, 0.99]
    hashed = events.select(
        F.col(key_col).alias("event_type"),
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
        )
        .cast("long")
        .alias("_h"),
        F.col(value_col).cast("double").alias("_v"),
    )
    return hashed.groupBy("event_type").applyInPandasWithState(
        _make_qsketch_fn(m, qs),
        outputStructType=_QSK_OUT,
        stateStructType=_QSK_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_CMS_OUT = StructType(
    [
        StructField("row_idx", LongType()),
        StructField("n_batches", LongType()),
        StructField("cells", ArrayType(LongType())),
    ]
)
_CMS_STATE = StructType(
    [
        StructField("cells", ArrayType(LongType())),
        StructField("n_batches", LongType()),
    ]
)


def _make_cms_fn(width: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            cells, n_batches = list(state.get[0]), int(state.get[1])
        else:
            cells, n_batches = [0] * width, 0
        for pdf in pdfs:
            # map-side combine inside the state fn (see docstring)
            for b, c in pdf.groupby("bucket")["c"].sum().items():
                cells[int(b)] += int(c)
        n_batches += 1
        state.update((cells, n_batches))
        yield pd.DataFrame(
            {
                "row_idx": [key[0]],
                "n_batches": [n_batches],
                "cells": [cells],
            }
        )

    return fn


def streaming_cms(
    events: DataFrame,
    term_col: str = "event_type",
    depth: int = 4,
    width: int = 256,
    seed: str = "cms",
) -> DataFrame:
    """Incrementally maintained count-min sketch: the streaming twin of
    ``operators.sketch.cms_build``. Each event hashes into its
    (row_idx, bucket) cells JVM-side (the same ``_cms_bucket`` md5
    expression as the batch sketch); per-row-idx state is the
    ``width``-cell vector, merged by plain addition. Because cell-wise
    sum is ORDER-INDEPENDENT, the drained state equals the batch
    sketch over the same data exactly — the batch-agreement test
    compares every cell. State is ``depth × width`` longs TOTAL (a few
    KB) no matter how long the stream runs — the live form of the
    sketch's mergeability, and the feeder for heavy-hitter /
    point-frequency probes without any replay.

    Rows cross the Arrow boundary as per-event (row_idx, bucket, 1)
    cells — a streaming groupBy pre-aggregation cannot legally chain
    in front of another stateful operator, so the bucket-count
    reduction happens inside the state function (a pandas groupby per
    micro-batch partition, the map-side-combine equivalent).
    """
    from pyspark.sql import functions as F

    from ..operators.sketch import _cms_bucket

    t = F.col(term_col)
    cells = events.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("long").alias("row_idx"),
                        _cms_bucket(t, j, width, seed).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("_cell"),
    ).select(
        F.col("_cell.row_idx"), F.col("_cell.bucket"), F.lit(1).alias("c")
    )
    return cells.groupBy("row_idx").applyInPandasWithState(
        _make_cms_fn(width),
        outputStructType=_CMS_OUT,
        stateStructType=_CMS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_SEAS_OUT = StructType(
    [
        StructField("dow", LongType()),
        StructField("hod", LongType()),
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("std", DoubleType()),
    ]
)
_SEAS_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("m2", DoubleType()),
    ]
)


def _seasonal_stats_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    if state.exists:
        n, mean, m2 = int(state.get[0]), float(state.get[1]), float(state.get[2])
    else:
        n, mean, m2 = 0, 0.0, 0.0
    for pdf in pdfs:
        v = pdf["value"].astype(float)
        nb = int(len(v))
        if nb == 0:
            continue
        mb = float(v.mean())
        m2b = float(((v - mb) ** 2).sum())
        # Chan et al. parallel combine of (n, mean, M2) pairs
        delta = mb - mean
        tot = n + nb
        m2 = m2 + m2b + delta * delta * n * nb / tot
        mean = mean + delta * nb / tot
        n = tot
    state.update((n, mean, m2))
    # sample std is UNDEFINED for n=1: emit NULL like the batch
    # stddev_samp, so a z-scoring consumer's null-check skips singleton
    # cells instead of dividing by a fake 0.0 variance
    std = (m2 / (n - 1)) ** 0.5 if n > 1 else None
    yield pd.DataFrame(
        {
            "dow": [key[0]],
            "hod": [key[1]],
            "n": [n],
            "mean": [mean],
            "std": [std],
        }
    )


def streaming_seasonal_stats(events: DataFrame) -> DataFrame:
    """Online (day-of-week, hour-of-day) cell statistics — the live
    baseline behind ``operators.timeseries.seasonal_anomalies``: per
    cell, a running (count, mean, sample-std) maintained across
    micro-batches with Welford/Chan parallel merging, so an alerting
    consumer can z-score incoming values against an always-current
    seasonal profile without any batch recompute. State per cell is
    THREE numbers (n, mean, M2) — ≤168 cells total, constant forever.
    Chan's combine is exact in real arithmetic (float association
    error only), so after the stream drains the per-cell stats match
    the batch groupBy mean/stddev to ~1e-9 — pinned by the
    batch-agreement test. Cells with n=1 emit a NULL ``std`` (sample
    std is undefined), matching the batch ``stddev_samp`` contract —
    consumers must null-check, exactly as they would the batch twin.
    """
    from pyspark.sql import functions as F

    cells = events.select(
        F.dayofweek("ts").cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hod"),
        F.col("value").cast("double").alias("value"),
    )
    return cells.groupBy("dow", "hod").applyInPandasWithState(
        _seasonal_stats_fn,
        outputStructType=_SEAS_OUT,
        stateStructType=_SEAS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_MHSIG_OUT = StructType(
    [
        StructField("key", StringType()),
        StructField("n_docs", LongType()),
        StructField("sig", ArrayType(LongType())),
    ]
)
_MHSIG_STATE = StructType(
    [
        StructField("sig", ArrayType(LongType())),
        StructField("n", LongType()),
    ]
)


def _make_minhash_fn():
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        cur, n = (
            (list(state.get[0]), int(state.get[1]))
            if state.exists
            else (None, 0)
        )
        n0 = n  # every non-NULL row increments n, so n == n0 means
        # this batch contributed nothing (all-NULL text for an existing
        # key) — skip the no-op state.update AND the output row, which
        # would otherwise surface as a spurious 'update' downstream
        for pdf in pdfs:
            for sig in pdf["_sig"]:
                if sig is None:  # NULL text yields a NULL signature
                    continue
                s = [int(x) for x in sig]
                cur = s if cur is None else [
                    a if a < b else b for a, b in zip(cur, s)
                ]
                n += 1
        if cur is not None and n != n0:
            state.update((cur, n))
            yield pd.DataFrame(
                {"key": [key[0]], "n_docs": [n], "sig": [cur]}
            )

    return fn


def streaming_minhash_signature(
    docs: DataFrame,
    key_col: str = "source",
    text_col: str = "text",
    num_perm: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Incrementally maintained MinHash signature per key — the
    streaming story for the minhash/substring dedup family: a stream of
    documents (keyed by source, shard, or rolling-corpus bucket) keeps a
    LIVE num_perm-long signature of everything seen so far, so each new
    batch can be LSH-banded against the standing signatures without
    recomputing history (the incremental new-vs-old quadrant of
    operators.dedup.incremental_lsh_pairs, as a stream).

    The per-document signature is the SAME JVM expression the batch
    operator uses (operators.dedup.minhash_signature — md5 + affine
    rehash, no Python in the hashing path); only (key, signature) rows
    cross the Arrow boundary, and state per key is num_perm longs + a
    count, CONSTANT in stream length. Merging is elementwise min —
    min over a union of shingle sets is the min of the mins, so the
    drained state equals the batch elementwise-min signature over the
    same rows exactly (pinned by the batch-agreement test). NULL-text
    rows have no shingles, hence a NULL signature: they contribute
    nothing to the state and are not counted in ``n_docs``.
    """
    from pyspark.sql import functions as F

    from ..operators.dedup import minhash_signature

    # NULL text must reach the state fn as a NULL signature (the fn
    # skips those rows). minhash_signature itself returns the all-MOD
    # "empty set" SENTINEL for NULL input — min-merging that is a no-op
    # on the signature but would still count the row — so gate on the
    # text column explicitly.
    sigs = docs.select(
        F.col(key_col).cast("string").alias("key"),
        F.when(
            F.col(text_col).isNotNull(),
            minhash_signature(
                text_col, num_perm=num_perm, shingle_n=shingle_n
            ),
        ).alias("_sig"),
    )
    return sigs.groupBy("key").applyInPandasWithState(
        _make_minhash_fn(),
        outputStructType=_MHSIG_OUT,
        stateStructType=_MHSIG_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
