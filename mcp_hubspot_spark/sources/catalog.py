"""Parquet catalog over a testdata scale-factor directory.

The reference's "sources" are remote REST scans with pushed-down
projection/filter/sort/limit (SURVEY §2.1 S1-S10). Here the source is
parquet and the pushdown is Catalyst's job: callers express ``select`` /
``filter`` on the returned DataFrame and ColumnPruning + PushDownPredicates
drive them into the scan (verified in tests via ``explain``).
"""

from __future__ import annotations

import os
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampType

from ..schemas import TESTDATA_SCHEMAS, TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    columns: Iterable[str] | None = None,
) -> DataFrame:
    """Load one table; ``columns`` applies projection (pruned at the scan)."""
    df = spark.read.parquet(table_path(sf_dir, name))
    # nanosecond-precision parquet timestamps arrive as long (see
    # session._DEFAULTS nanosAsLong): convert to microsecond timestamps.
    expected = TESTDATA_SCHEMAS.get(name)
    if expected is not None:
        actual = {f.name: f.dataType for f in df.schema.fields}
        for f in expected.fields:
            if isinstance(f.dataType, TimestampType) and isinstance(
                actual.get(f.name), LongType
            ):
                df = df.withColumn(
                    f.name, F.timestamp_micros((F.col(f.name) / 1000).cast("long"))
                )
    if columns is not None:
        df = df.select(*columns)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql()."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
