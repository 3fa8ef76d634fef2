"""Data-layout operators: Z-order clustering for multi-column data
skipping.

Why this exists at 100 TB: parquet readers skip row groups via min/max
footer stats, but a table sorted by ONE column has useless min/max on
every OTHER filter column. Interleaving the bits of two (or more)
bucketized key columns into a single Z-value and range-partition-sorting
by it gives every file a small bounding box in BOTH dimensions — filters
on either column (or both) then prune most files. This is the same
mechanism Delta/Iceberg expose as OPTIMIZE ZORDER BY; here it is a pure
DataFrame transform plus a normal sorted write, nothing engine-private.

The Z-value is a plain JVM expression (shift/or over bucket indices) —
no UDF, no shuffle beyond the one repartitionByRange the sorted write
needs anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["zorder_value", "write_zordered"]

_ZBITS = 16  # bits per dimension — 65536 buckets, plenty for file pruning


def _bucketize(col: Column, lo: Column, hi: Column) -> Column:
    """Map col into [0, 2^_ZBITS) by linear scaling over [lo, hi]."""
    span = F.greatest(hi - lo, F.lit(1e-12))
    frac = (col.cast("double") - lo) / span
    scaled = F.least(
        F.greatest(frac, F.lit(0.0)) * ((1 << _ZBITS) - 1), F.lit(float((1 << _ZBITS) - 1))
    )
    return F.round(scaled).cast("long")


def zorder_value(a_bucket: Column, b_bucket: Column) -> Column:
    """Interleave the low ``_ZBITS`` bits of two bucket indices (Morton
    code). Built as one fixed expression tree (2*_ZBITS shift/mask terms),
    codegen'd JVM-side."""
    terms = []
    for i in range(_ZBITS):
        bit_a = F.shiftright(a_bucket, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b_bucket, i).bitwiseAND(F.lit(1))
        terms.append(
            F.shiftleft(bit_a, 2 * i) + F.shiftleft(bit_b, 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
) -> None:
    """Write ``df`` range-partitioned and sorted by the Z-value of
    (col_a, col_b). Column min/max for bucketization come from one cheap
    agg over the two columns (a metadata-scale scan at any size — column
    pruning means only those two columns are read).

    The write itself: repartitionByRange on the z-value (the one shuffle,
    same as any globally-sorted write) + sortWithinPartitions, so each
    output file covers a contiguous Z-range = a small rectangle in
    (col_a, col_b) space — the property the skipping test measures.
    """
    stats = df.agg(
        F.min(F.col(col_a).cast("double")).alias("alo"),
        F.max(F.col(col_a).cast("double")).alias("ahi"),
        F.min(F.col(col_b).cast("double")).alias("blo"),
        F.max(F.col(col_b).cast("double")).alias("bhi"),
    ).first()
    za = _bucketize(F.col(col_a), F.lit(stats.alo), F.lit(stats.ahi))
    zb = _bucketize(F.col(col_b), F.lit(stats.blo), F.lit(stats.bhi))
    zed = df.withColumn("_z", zorder_value(za, zb))
    (
        zed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
