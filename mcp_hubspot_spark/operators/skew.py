"""Skew mitigation operators (scale extension — SURVEY §7 phase 5).

Hot keys break the shuffle contract: one reducer gets the hub key's entire
partition while the rest idle. Two classic remedies, expressed as plain
DataFrame compositions so they compose with everything else:

  * ``salted_aggregate`` — two-phase agg: shard each key across
    ``n_salts`` sub-keys (partial agg per shard), then merge the shards.
    Works for any algebraic aggregate (sum/count/min/max + count-backed
    avg).
  * ``salted_join`` — replicate the small side ``n_salts`` times, shard
    the big side's hot keys; the join key becomes (key, salt) so a hot
    key's rows spread over ``n_salts`` reducers.

AQE's runtime skew-join splitting (``spark.sql.adaptive.skewJoin``) covers
the sort-merge case automatically — these helpers are for aggregations
(where AQE does not split) and for forcing the layout when stats are
missing. Salting is deterministic here (hash of a stable column, not
rand()) so retried tasks produce identical shards.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_src: Column, n_salts: int) -> DataFrame:
    """Deterministic shard id in [0, n_salts) from a stable column (row id,
    payload hash) — NOT rand(): task retries must re-produce the same
    shard or shuffle files disagree."""
    return df.withColumn("_salt", F.pmod(F.xxhash64(salt_src), F.lit(n_salts)))


def _default_salt_src(df: DataFrame, exclude: Sequence[str]) -> Column:
    """Default salt source: hash of every NON-key column. Hashing the
    grouping/join key itself would give each hot key one constant salt —
    zero mitigation — so key columns are excluded."""
    rest = [c for c in df.columns if c not in set(exclude)]
    if not rest:
        raise ValueError(
            "no non-key columns to derive a salt from; pass salt_src "
            "explicitly (e.g. a row id)"
        )
    return F.xxhash64(*[F.col(c) for c in rest])


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_src: Column | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output name → (agg_fn, column) with agg_fn in
    {sum, count, min, max}. Phase 1 groups by (keys, salt) — the hot key's
    rows split over n_salts reducers; phase 2 merges shards (sum/sum,
    count→sum, min/min, max/max). The merge input is ≤ n_salts rows per
    key, so phase 2 is trivially balanced.
    """
    mergers = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1 = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for fn, _ in aggs.values():
        if fn not in phase1:
            raise ValueError(f"non-algebraic aggregate: {fn}")
    salted = with_salt(
        df,
        salt_src if salt_src is not None else _default_salt_src(df, keys),
        n_salts,
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[phase1[fn](c).alias(name) for name, (fn, c) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[mergers[fn](name).alias(name) for name, (fn, _) in aggs.items()]
    )


def _require_big_preserving(how: str) -> None:
    """Right/full joins would see the replicated small side as real rows
    (n_salts copies of every unmatched small row) — only joins that
    preserve the big side's semantics can be salted. Normalizes Spark's
    join-type alias spellings before validating."""
    norm_how = how.lower().replace("_", "")
    if norm_how not in (
        "inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti"
    ):
        raise ValueError(
            f"salted_join supports big-side-preserving joins only, not {how!r}"
        )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    salt_src: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: shard the big side, replicate the small side
    once per shard, join on (keys, salt). The small side grows n_salts×
    (it is small — that is the premise); the big side's hot keys spread
    across n_salts reducers instead of melting one."""
    _require_big_preserving(how)
    keys = list(on)
    big_s = with_salt(
        big, salt_src if salt_src is not None else _default_salt_src(big, keys), n_salts
    )
    small_r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return big_s.join(small_r, on=[*keys, "_salt"], how=how).drop("_salt")


# ----------------------------------------------------------- the advisor ----
# skew_report (operators/profiling.py) measures; these wire the
# measurement into an ACTION: profile the key, and only when the hottest
# key's load exceeds `threshold` x the mean per-key load does the plan
# switch to the salted two-phase form. The profile is one extra
# key-grain pass (top-k partial, bounded collect) — amortized in the
# production pipelines this exists for, where the same aggregation runs
# per batch against slowly-drifting key distributions; pass a cached
# `advice` dict to skip re-profiling.


def skew_advice(
    df: DataFrame,
    keys: Sequence[str],
    threshold: float = 8.0,
    k: int = 10,
) -> dict:
    """Profile the (composite) key and return the salting decision:
    ``{"skewed", "x_mean_max", "n_salts", "hot_keys"}``. ``n_salts`` is
    the next power of two covering the hottest key's x_mean (capped at
    64 — past that, shard-merge overhead beats residual imbalance);
    ``hot_keys`` carries the top-k (key, n_rows, x_mean) evidence so the
    decision is auditable, not a black box."""
    import math

    from .profiling import skew_report

    key_expr = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("NULL"))
            for c in keys
        ],
    )
    rows = skew_report(df.select(key_expr.alias("_k")), "_k", k=k).collect()
    x_max = max((float(r.x_mean) for r in rows), default=0.0)
    skewed = x_max >= threshold
    n_salts = (
        min(64, 2 ** math.ceil(math.log2(max(2.0, x_max)))) if skewed else 1
    )
    return {
        "skewed": skewed,
        "x_mean_max": x_max,
        "n_salts": n_salts,
        "hot_keys": [(r.key, int(r.n_rows), float(r.x_mean)) for r in rows],
    }


def adaptive_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    threshold: float = 8.0,
    advice: dict | None = None,
    salt_src: Column | None = None,
) -> DataFrame:
    """Aggregate that salts ITSELF when the profiler says so: plain
    one-shuffle groupBy on balanced keys (no salt columns, no second
    phase — the plan is byte-identical to hand-written groupBy.agg),
    the salted_aggregate two-phase form past the skew threshold.
    Results are identical either way (pinned by pytest); only the
    shuffle layout changes."""
    advice = advice if advice is not None else skew_advice(df, keys, threshold)
    if advice["skewed"]:
        return salted_aggregate(
            df, keys, aggs, salt_src=salt_src, n_salts=advice["n_salts"]
        )
    phase1 = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for fn, _ in aggs.values():
        if fn not in phase1:
            raise ValueError(f"non-algebraic aggregate: {fn}")
    return df.groupBy(*keys).agg(
        *[phase1[fn](c).alias(name) for name, (fn, c) in aggs.items()]
    )


def adaptive_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    threshold: float = 8.0,
    advice: dict | None = None,
    salt_src: Column | None = None,
) -> DataFrame:
    """Join that salts itself when the BIG side's key profile crosses
    the threshold; balanced keys get the plain equi-join (AQE remains
    free to broadcast or split it at runtime). Same results either way
    — only which reducers the hot key's rows land on changes."""
    # validate UNCONDITIONALLY: an unsupported `how` must fail at call
    # time, not the day the key distribution drifts past the threshold
    # and the salted branch fires for the first time in production
    _require_big_preserving(how)
    advice = (
        advice if advice is not None else skew_advice(big, on, threshold)
    )
    if advice["skewed"]:
        return salted_join(
            big, small, on, n_salts=advice["n_salts"],
            salt_src=salt_src, how=how,
        )
    return big.join(small, on=list(on), how=how)
