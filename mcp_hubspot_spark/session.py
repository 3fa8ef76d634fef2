"""SparkSession factory.

Tuned for the driver environment (local[$SPARK_GRAFT_CPUS], single JVM) but
every setting is chosen to also be the right default on a large cluster:
AQE for runtime re-planning (partition coalescing + skew-join splitting),
Arrow for any pandas-UDF edge, UTC session time zone so results are
environment-independent, and a broadcast threshold that lets dimension
tables (region/nation/customer at test scale; any <64MB dim at cluster
scale) broadcast instead of shuffling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    # Adaptive execution: coalesce small shuffle partitions, split skewed
    # ones, convert sort-merge joins to broadcast at runtime. This is the
    # single most important knob for "would this survive 100x data".
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Respect the advisory target size when coalescing instead of
    # stopping at defaultParallelism (Spark's own docs recommend false
    # on clusters). With the default=true, EVERY shuffle — even a few
    # KB of aggregation state — schedules >= defaultParallelism tasks,
    # which is pure scheduling overhead (measured ~0.5-1.5 s/stage
    # locally on tiny stages, ~4x on shuffle-stage-bound queries). With
    # false the post-shuffle partition count derives from actual bytes
    # (advisoryPartitionSizeInBytes), i.e. it scales with the data: a
    # 100 TB shuffle still gets tens of thousands of partitions, a 100 KB
    # one gets 1. CPU-heavy narrow stages are unaffected (fan_out pins
    # explicit partition counts, which AQE never coalesces — the
    # classifier-training pin relies on the same rule).
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    # Post-shuffle partition target (guide §9 baseline; §2.2 fewer-larger
    # partitions as data scales). Locally NEUTRAL by interleaved A/B
    # (r14: 12-query events tail 13.38 vs 13.66 s med at 256m vs the
    # 64 MiB default — sf0.1 shuffles never exceed 64 MiB, so AQE
    # coalescing decides identically); at 100 TB it quarters the reduce
    # partition count of large shuffles, directly cutting the M x R
    # shuffle-block quadratic.
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256m",
    # Deterministic, environment-independent semantics.
    "spark.sql.session.timeZone": "UTC",
    # Arrow transfer for pandas UDFs / toPandas (vector + multimodal ops).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Dimension tables broadcast instead of shuffle. 64 MiB: generous for a
    # 128 GiB driver; on a real cluster this is still safe for executors
    # with >=4 GiB.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Read-side split size; at 100 TB, ~128 MiB splits keep task counts sane.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Split-size FLOOR. Spark's split size is
    # min(maxPartitionBytes, max(openCostInBytes, totalBytes/minPartitionNum));
    # the 4 MiB default models HDFS/S3 seek cost and is right at cluster
    # scale, but on local page-cached files it forces every table smaller
    # than 4 MiB into ONE task — a 2.7 MB orders scan ran 1-of-32 cores.
    # 256 KiB keeps small local scans parallel while totalBytes/minPartitionNum
    # (not this floor) still governs real multi-GB inputs.
    "spark.sql.files.openCostInBytes": str(256 * 1024),
    "spark.sql.parquet.compression.codec": "zstd",
    # testdata events.ts is parquet TIMESTAMP(NANOS); read as long and let
    # the catalog convert to a microsecond timestamp (matches DuckDB, whose
    # timestamps are microsecond precision).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Quieter, faster local runs; harmless on a cluster.
    "spark.ui.enabled": "false",
    # local mode = the driver JVM IS the whole engine; the 1g default heap
    # GC-thrashes on wide shuffles long before the machine is used. 8g is
    # modest on the 128 GiB test box and a normal driver size on clusters.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "mcp-hubspot-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with scale-appropriate defaults.

    ``shuffle_partitions`` defaults to 2x the local core count — with AQE
    coalescing enabled the exact number matters little locally; on a real
    cluster you would size it to total cores * 2-3 and let AQE shrink.
    """
    master = master or os.environ.get(
        "SPARK_GRAFT_MASTER", f"local[{default_parallelism()}]"
    )
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(
        shuffle_partitions or 2 * default_parallelism()
    )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
