"""Streaming data-quality monitoring: per-micro-batch distribution drift
against a frozen reference histogram (the online twin of the batch
``orders_value_drift`` query — the retrain/alert trigger wired into the
ingestion path instead of a nightly job).

The reference histogram is computed ONCE from a reference DataFrame and
carried as a plain dict (bounded: one entry per bucket), so each
micro-batch pays a single bucket-count aggregate plus a driver-side L1
fold over <=n_buckets numbers — no state store, no stream-stream join,
nothing grows with history. Batches emit one drift row each into a
parquet log; alerting is a filter on that log."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def histogram_fractions(
    df: DataFrame, value_col: str, bucket_width: float, max_bucket: int
) -> dict[int, float]:
    """Fixed-width bucket fractions of ``value_col`` (top bucket clamps),
    as a plain dict — the frozen reference for the monitor."""
    rows = (
        df.groupBy(
            F.least(
                F.floor(F.col(value_col) / bucket_width).cast("long"),
                F.lit(max_bucket),
            ).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    total = sum(r.n for r in rows)
    if total == 0:
        raise ValueError(
            "histogram_fractions: reference is empty — a drift monitor "
            "needs a non-empty reference distribution (mirrors the "
            "per-batch n == 0 guard in stream_drift_monitor)"
        )
    return {int(r.bucket): r.n / total for r in rows}


# smoothing floor for the streaming PSI: empty micro-batch buckets would
# otherwise hit ln(0); 1e-6 bounds any single bucket's term at ~14·p
PSI_EPS = 1e-6


def stream_drift_monitor(
    stream_df: DataFrame,
    reference: dict[int, float],
    value_col: str,
    bucket_width: float,
    max_bucket: int,
    log_path: str,
    checkpoint_dir: str,
):
    """Start a streaming query appending one
    (batch_id, n_rows, l1_drift, psi, ks) row per micro-batch to
    ``log_path``. L1 drift = sum over buckets of |p_batch - p_ref| —
    same integer-count-ratio form as the batch drift query. ``psi`` is
    the online twin of the batch ``operators.profiling.psi_drift``
    score: sum of (p - q)·ln(p/q) over the bucket union, with both
    fractions floored at ``PSI_EPS`` — a micro-batch (unlike the batch
    operator's reference-quantile bins) routinely has EMPTY buckets, so
    the streaming form must smooth where the batch form can drop.
    ``ks`` is the online twin of ``operators.profiling.ks_drift``: the
    sup-distance between the two cumulative bucket fractions — exact
    for the bucketed distributions (needs no smoothing; cumsums are
    fine with empty buckets), and within one bucket's reference mass
    of the raw-value statistic. Returns the StreamingQuery handle."""
    import math

    def measure(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        rows = (
            batch_df.groupBy(
                F.least(
                    F.floor(F.col(value_col) / bucket_width).cast("long"),
                    F.lit(max_bucket),
                ).alias("bucket")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        n = sum(r.n for r in rows)
        if n == 0:
            return
        p = {int(r.bucket): r.n / n for r in rows}
        buckets = set(p) | set(reference)
        l1 = sum(
            abs(p.get(b, 0.0) - reference.get(b, 0.0)) for b in buckets
        )
        psi = sum(
            (pb - qb) * math.log(pb / qb)
            for b in buckets
            for pb in (max(p.get(b, 0.0), PSI_EPS),)
            for qb in (max(reference.get(b, 0.0), PSI_EPS),)
        )
        ks = cp = cq = 0.0
        for b in sorted(buckets):
            cp += p.get(b, 0.0)
            cq += reference.get(b, 0.0)
            ks = max(ks, abs(cp - cq))
        spark.createDataFrame(
            [(
                int(batch_id),
                int(n),
                float(round(l1, 6)),
                float(round(psi, 6)),
                float(round(ks, 6)),
            )],
            "batch_id long, n_rows long, l1_drift double, psi double,"
            " ks double",
        ).write.mode("append").parquet(log_path)

    return (
        stream_df.writeStream.foreachBatch(measure)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
