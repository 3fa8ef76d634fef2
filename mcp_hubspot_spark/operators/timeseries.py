"""Time-series resampling: fixed-grid gap filling with
last-observation-carried-forward (LOCF).

The missing piece between event streams and model-ready features: sensors
/ metrics / activity feeds land at irregular times, but joins and
training windows want one row per (key, grid point). Implemented with the
same single-shuffle union+window shape as the as-of join
(``operators.joins.asof_join``) — grid points and observations are
unioned, ONE window per key ordered by (ts, side, event id) carries the
last non-null observation forward, and grid rows are kept. No grid×event
join, no per-key driver loop.

Scale notes: the grid explode is bounded by (time span / step) per key —
pick the step so that bound is sane (a year at 1-minute grid is 525k rows
per key; resample hourly first if that is too many). The one window sorts
(events + grid points) per key, the same cost class as any per-key
sessionization; keys process independently and in parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "resample_locf",
    "scd2_intervals",
    "seasonality_profile",
    "seasonal_anomalies",
]


def _bucket_ceil(ts: Column, step_s: int) -> Column:
    """Smallest step-aligned timestamp >= ts (epoch-aligned buckets)."""
    step_us = F.lit(int(step_s) * 1_000_000)
    us = F.unix_micros(ts)
    rem = F.pmod(us, step_us)
    return F.timestamp_micros(
        (us - rem + F.when(rem > 0, step_us).otherwise(F.lit(0))).cast("long")
    )


def resample_locf(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
    step_s: int = 21_600,
) -> DataFrame:
    """One row per (key, grid point), where the grid runs from the first
    epoch-aligned point AT OR AFTER each key's first event through its
    last event — every grid point therefore has an observation to carry,
    so ``locf_value`` is never null. Ties (several events at one
    timestamp) resolve to the highest ``order_col`` — deterministic under
    any partitioning. Returns (key, grid_ts, locf_value)."""
    ev = events.select(key_col, ts_col, order_col, value_col)
    rng = ev.groupBy(key_col).agg(
        F.min(ts_col).alias("_t0"), F.max(ts_col).alias("_t1")
    )
    start = _bucket_ceil(F.col("_t0"), step_s)
    # a key whose whole history sits strictly between two grid points has
    # no grid rows at all (sequence() would reject start > stop)
    grid = rng.filter(start <= F.col("_t1")).select(
        key_col,
        F.explode(
            F.sequence(
                start,
                F.col("_t1"),
                F.expr(f"interval {int(step_s)} seconds"),
            )
        ).alias("_gts"),
    )
    g = grid.select(
        key_col,
        F.col("_gts").alias(ts_col),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias(order_col),
        F.lit(None).cast("double").alias(value_col),
    )
    e = ev.select(
        key_col,
        ts_col,
        F.lit(0).alias("_side"),
        F.col(order_col),
        F.col(value_col).cast("double").alias(value_col),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = g.unionByName(e).withColumn(
        "_lv", F.last(value_col, ignorenulls=True).over(w)
    )
    return filled.filter(F.col("_side") == 1).select(
        key_col,
        F.col(ts_col).alias("grid_ts"),
        F.col("_lv").alias("locf_value"),
    )


def scd2_intervals(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    order_col: str = "event_id",
    iso_fmt: str = "yyyy-MM-dd'T'HH:mm:ss",
    open_end: str = "9999-12-31T00:00:00",
) -> DataFrame:
    """Slowly-changing-dimension type-2 assembly from an append-only event
    stream: collapse each key's state history into validity intervals —
    one row per state RUN, with ``valid_from``/``valid_to`` bounds and an
    ``is_current`` flag on the open interval (closed with the sentinel
    ``open_end`` so downstream BETWEEN probes need no null handling).

    Change-based (a new interval starts when the state DIFFERS from the
    previous event's), the counterpart of gap-based sessionization. Plan
    shape: ONE shuffle on the key serves both window passes — lag() for
    change detection over the raw events, lead() to close intervals over
    the change rows (a filter of the first pass, same partitioning, so
    Catalyst reuses the sort). Ties at one timestamp break on
    ``order_col``, so the run boundaries are deterministic under any
    physical layout. At 100 TB keys process independently; the per-key
    sort is the same cost class as sessionization.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    changes = events.select(
        key_col, order_col, ts_col, state_col,
        F.lag(state_col).over(w).alias("_prev"),
    ).filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(state_col)))
    w2 = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    nxt = F.lead(ts_col).over(w2)
    return changes.select(
        key_col,
        F.col(state_col).alias("state"),
        F.date_format(ts_col, iso_fmt).alias("valid_from_iso"),
        F.coalesce(F.date_format(nxt, iso_fmt), F.lit(open_end)).alias(
            "valid_to_iso"
        ),
        nxt.isNull().alias("is_current"),
    )


def seasonality_profile(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Weekly seasonality profile: for every (day-of-week, hour-of-day)
    cell, the event count, mean value, and the mean's deviation from
    the overall mean — the load/engagement heatmap behind capacity
    planning and anomaly baselines (a cheap, assumption-free cousin of
    seasonal decomposition). ``dow`` follows Spark's ``dayofweek``
    convention (1 = Sunday … 7 = Saturday). Returns up to 7×24 rows
    (dow, hod, n_events, avg_value, dev_from_overall), floats rounded
    to 4 dp.

    Scale shape: one groupBy on the (dow, hod) derived key — ≤168
    groups, so the final reduce is trivial and the map-side partial
    aggregation does all the work; the overall mean rides in as a
    broadcast one-row cross join (derived from the same 168-row
    aggregate, not a second scan).
    """
    cells = (
        df.select(
            F.dayofweek(F.col(ts_col)).alias("dow"),
            F.hour(F.col(ts_col)).alias("hod"),
            F.col(value_col).cast("double").alias("_v"),
        )
        .groupBy("dow", "hod")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_v").alias("_sum"),
        )
    )
    overall = cells.agg(
        (F.sum("_sum") / F.sum("n_events")).alias("_overall")
    )
    avg = F.col("_sum") / F.col("n_events")
    return cells.crossJoin(F.broadcast(overall)).select(
        "dow",
        "hod",
        "n_events",
        F.round(avg, 4).alias("avg_value"),
        F.round(avg - F.col("_overall"), 4).alias("dev_from_overall"),
    )


def seasonal_anomalies(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    k: int = 20,
    min_cell_n: int = 2,
) -> DataFrame:
    """Seasonality-adjusted anomaly scoring: each event's z-score
    against its OWN (day-of-week, hour-of-day) cell's mean/stddev —
    "is 3 a.m. Sunday traffic weird *for 3 a.m. Sunday*" — returning
    the top-``k`` |z| events (ties break on ``id_col`` ascending).
    The anomaly-detection consumer of :func:`seasonality_profile`'s
    baseline; cells with fewer than ``min_cell_n`` events or zero
    variance are skipped (a singleton's z-score is undefined).

    Scale shape: the ≤168-row cell-stats aggregate joins back onto the
    events as a BROADCAST hash join (no shuffle on the event side
    beyond the final top-k), and the top-k is the standard
    TakeOrderedAndProject partial — per-partition heads merged on the
    driver, never a global sort. Sample stddev (n−1), matching SQL
    ``stddev``.
    """
    cell = [
        F.dayofweek(F.col(ts_col)).alias("dow"),
        F.hour(F.col(ts_col)).alias("hod"),
    ]
    stats = (
        df.select(*cell, F.col(value_col).cast("double").alias("_v"))
        .groupBy("dow", "hod")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.avg("_v").alias("_mean"),
            F.stddev("_v").alias("_std"),
        )
        .filter((F.col("_n") >= min_cell_n) & (F.col("_std") > 0))
    )
    z = (F.col(value_col).cast("double") - F.col("_mean")) / F.col("_std")
    return (
        df.select(
            F.col(id_col),
            *cell,
            F.col(value_col).cast("double").alias(value_col),
        )
        .join(F.broadcast(stats), ["dow", "hod"])
        .select(
            id_col,
            "dow",
            "hod",
            value_col,
            F.round(z, 4).alias("z_score"),
        )
        .orderBy(F.abs(F.col("z_score")).desc(), F.col(id_col).asc())
        .limit(k)
    )
