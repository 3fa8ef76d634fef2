"""Table profiling: per-column statistics in one scan.

The ANALYZE-TABLE staple a pipeline engine needs before it can make
sizing decisions (broadcast thresholds, skew detection, partition-count
targets): row count, null counts, distinct counts, min/max per column,
emitted in LONG format (one row per column) so downstream tooling joins
on column_name instead of parsing a wide one-row frame.

Scale notes baked into the shape: everything is ONE aggregate over ONE
scan. The exact ``countDistinct`` per column costs an Expand (one input
row duplicated per distinct-agg) — correct and oracle-checkable, which is
why it is the default here; at 100 TB swap it for
``approx_count_distinct`` or the mergeable KMV sketch
(``operators.sketch.kmv_distinct``) per the docstring contract — the
output schema is identical, only the estimator changes. min/max are
computed on the NATIVE type (so numeric/date ordering is right) and cast
to string only at the edge for the uniform long-format schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column (n_rows, n_non_null, n_distinct, min_value, max_value)
    in one pass; one output row per requested column."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__{c}__nn"),
            F.countDistinct(F.col(c)).alias(f"__{c}__nd"),
            F.min(F.col(c)).cast("string").alias(f"__{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"__{c}__max"),
        ]
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `__{c}__nn`, `__{c}__nd`, `__{c}__min`, `__{c}__max`"
        for c in cols
    )
    return row.selectExpr(
        "__n as n_rows",
        f"stack({len(cols)}, {stack_args}) as "
        "(column_name, n_non_null, n_distinct, min_value, max_value)",
    ).select(
        "column_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_non_null").cast("long").alias("n_non_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )
