"""File-format sources and sinks beyond parquet (ingestion surface).

The reference ingests from REST JSON; a standalone engine needs the file
equivalents: schema-enforced JSONL and CSV readers with corrupt-record
capture, and a partitioned parquet writer with dynamic partition
overwrite (refresh ONE day/source without rewriting the table — the
backfill primitive for date-partitioned corpora).

Scale notes baked in:
  * explicit schema on every read — schema inference is a full extra pass
    over 100 TB and can mis-type sparse columns; PERMISSIVE +
    ``_corrupt_record`` quarantines bad lines instead of killing the job
    (badRecordsPath would externalize them; the column keeps it portable)
  * JSONL/CSV are line-splittable (uncompressed or zstd-seekable), so a
    large file still fans out across executors; gzip is NOT splittable —
    one 100 GB .gz = one task — hence the docstring warning, not a guard
  * the writer partitions by low-cardinality keys only (date/source):
    every distinct partition value is a directory; partitioning by a
    high-cardinality key melts the filesystem's namespace
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, StringType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_capture(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    multiline: bool = False,
) -> DataFrame:
    """Schema-enforced JSON-lines read. Malformed lines land in
    ``_corrupt_record`` (PERMISSIVE) instead of failing the scan — filter
    ``valid_rows`` / ``corrupt_rows`` downstream."""
    return (
        spark.read.schema(_with_corrupt_capture(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("multiLine", multiline)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """Schema-enforced CSV read with corrupt-record capture (same contract
    as ``read_jsonl``)."""
    return (
        spark.read.schema(_with_corrupt_capture(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", header)
        .option("delimiter", delimiter)
        .csv(path)
    )


def valid_rows(df: DataFrame) -> DataFrame:
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def corrupt_rows(df: DataFrame) -> DataFrame:
    """Spark refuses a query whose only referenced column from a raw
    JSON/CSV scan is the corrupt-record column
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN); per its own guidance the parsed
    result is cached first, then filtered."""
    return df.cache().filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "append",
    dynamic_overwrite: bool = False,
) -> None:
    """Partitioned parquet sink. With ``dynamic_overwrite=True`` an
    overwrite replaces ONLY the partitions present in ``df`` (dynamic
    partitionOverwriteMode) — the idempotent daily-backfill write; static
    overwrite would truncate the whole table first."""
    spark = df.sparkSession
    writer = df.write.partitionBy(*partition_by).format("parquet")
    if dynamic_overwrite:
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "DYNAMIC")
        try:
            writer.mode("overwrite").save(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    else:
        writer.mode(mode).save(path)


def read_evolved_parquet(spark, path: str) -> DataFrame:
    """Read a partitioned parquet table whose partitions were written
    under DIFFERENT schema versions (columns added over time — the normal
    state of a 100 TB table fed by a year of daily jobs). ``mergeSchema``
    unions the per-file schemas at footer-read time; rows from partitions
    predating a column surface it as null. Column REMOVAL/retype is not
    papered over — conflicting types still fail loudly, which is the
    behavior you want (silent coercion corrupts downstream casts)."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def write_sized(
    df: DataFrame,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sample_rows: int = 1_000,
) -> int:
    """Size-targeted parquet sink: pick the output file count so each file
    lands near ``target_file_bytes`` — the operational fix for the two
    failure modes of naive writes at 100 TB: thousands of KB-sized files
    (metadata pressure, slow listings, per-file open cost on every later
    read) after a high-parallelism job, or a handful of multi-GB files
    (no read parallelism) after a coalesced one.

    Estimate: sample up to ``sample_rows`` rows, measure their
    parquet-encoded size via Arrow with the same compression family, and
    scale by the (cheap, count()-based) row count. The estimate only
    steers file COUNT — a 2x error means 64 MiB or 256 MiB files, both
    fine — so a bounded sample is the right cost/precision trade.
    Returns the partition count used.
    """
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    n_rows = df.count()
    if n_rows == 0:
        df.write.mode("overwrite").parquet(path)
        return 1
    sample = df.limit(min(sample_rows, n_rows)).toPandas()
    buf = io.BytesIO()
    pq.write_table(
        pa.Table.from_pandas(sample, preserve_index=False),
        buf,
        compression="zstd",
    )
    est_total = buf.getbuffer().nbytes * (n_rows / max(1, len(sample)))
    n_parts = max(1, int(est_total // target_file_bytes) + 1)
    df.repartition(n_parts).write.mode("overwrite").parquet(path)
    return n_parts


def read_orc(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
) -> DataFrame:
    """ORC read (the Hive-era warehouse interchange format). Spark's
    native vectorized ORC reader gives the same scan-stage machinery as
    parquet — column pruning, predicate pushdown against stripe/row-group
    statistics and optional bloom filters — so downstream plans are
    format-agnostic. Passing ``schema`` skips footer inference AND
    enforces types at the boundary (a sparse column inferred from one
    stripe can mis-type the whole scan)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink with zstd compression; same low-cardinality-keys-only
    partitioning rule as the parquet writer."""
    writer = df.write.format("orc").option("compression", "zstd")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.mode(mode).save(path)


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    rows_per_shard: int = 100_000,
    compress: bool = True,
) -> int:
    """Corpus-delivery sink: JSON-lines shards of ~``rows_per_shard``
    rows each — the standard interchange for training-data handoff
    (loaders stream shards independently; shard count = download/read
    parallelism). gzip is the right call HERE even though it is not
    splittable: each shard is already a parallelism unit sized for one
    reader, and delivery bandwidth matters more than re-scan flexibility
    (keep parquet as the processing-side format). Row count is exact
    (one count()), shard count = ceil(n / rows_per_shard), rows are
    hash-spread so shards are near-uniform. Returns the shard count."""
    n = df.count()
    shards = max(1, -(-n // rows_per_shard))
    writer = df.repartition(shards).write.mode("overwrite")
    if compress:
        writer = writer.option("compression", "gzip")
    writer.json(path)
    return shards
