"""Top-k operators (SURVEY §2.6 O1-O5).

``orderBy(...).limit(k)`` compiles to ``TakeOrderedAndProjectExec``: each
partition computes a local top-k heap, then the driver merges k*numPartitions
rows — the same two-phase structure the reference hand-codes for its per-day
FAISS merge (reference ``faiss_manager.py:264-296``), but automatic and
O(k) memory per partition, which is what makes it survive 100 TB inputs.

Determinism: callers should always pass a unique tiebreaker as the last sort
column; a top-k whose boundary row is ambiguous is not reproducible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def top_k(
    df: DataFrame,
    order: Sequence[Column | str],
    k: int,
    project: Sequence[Column | str] | None = None,
) -> DataFrame:
    """Global top-k by ``order`` (physical: TakeOrderedAndProject)."""
    out = df.orderBy(*order).limit(k)
    if project is not None:
        out = out.select(*project)
    return out


def grouped_top_k(
    df: DataFrame,
    group: Sequence[str],
    order: Sequence[Column | str],
    k: int,
) -> DataFrame:
    """Top-k within each group via row_number window (SURVEY W1 analog).

    One shuffle on the group keys; no global sort. Rows come back with a
    ``rank`` column (1-based, like reference utils.py:100-108).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy(*group).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
