"""Bucketed tables: pre-shuffled layout for co-located joins/aggs
(scale extension — SURVEY §7 "bucketing for co-located joins").

Writing both sides of a recurring join bucketed by the join key (same
bucket count) lets Spark join them with NO Exchange on either side: the
bucket files ARE the shuffle output, paid once at write time and amortized
over every subsequent join. At 100 TB this turns the nightly
fact-to-fact join from the cluster's dominant shuffle into a local merge.

Bucketed tables must go through the session catalog (``saveAsTable``) —
bucket metadata lives there, a bare ``parquet(path)`` write loses it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) catalog table.

    Sorting within buckets additionally enables merge-join without a Sort
    node and row-group skipping on the bucket key.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs the plan
    has no Exchange (verified in tests/test_plans.py)."""
    return spark.table(left_table).join(spark.table(right_table), on=on)
