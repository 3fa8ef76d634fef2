"""Cache / staging layer (SURVEY §2.1 S16).

The reference caches the first conversation-threads page in a JSON blob and
serves it unless ``refresh_cache`` is passed (reference
``core/storage.py:25-67``, ``clients/conversation_client.py:230-259``).

Spark-first: a materialized staging table. ``read_or_build`` returns the
staged parquet if present, else builds + writes + returns it; ``refresh=True``
forces a rebuild (the reference's refresh_cache flag). For intra-session
reuse Spark's own ``df.cache()`` already covers the in-memory case — this
helper is for cross-job reuse, which is what the reference's disk cache is.
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def read_or_build(
    spark: SparkSession,
    path: str,
    build: Callable[[], DataFrame],
    refresh: bool = False,
) -> DataFrame:
    p = Path(path)
    if not refresh and p.exists() and any(p.glob("_SUCCESS")):
        return spark.read.parquet(path)
    df = build()
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def invalidate(path: str) -> bool:
    import shutil

    p = Path(path)
    if p.exists():
        shutil.rmtree(p)
        return True
    return False
