"""Z-order (Morton-curve) clustered layout: multi-dimensional data
skipping for the scan side.

``partitionBy`` prunes on ONE directory column and bucketBy co-locates
one JOIN key; z-ordering is the third layout axis — it clusters FILES so
that parquet min/max footer statistics become selective on SEVERAL
filter columns at once. Sorting by (a, b) makes file ranges tight on
``a`` but leaves ``b`` spanning its whole domain in every file;
interleaving the bits of both columns' bucket ids (the Morton code) and
range-partitioning + sorting on that single value keeps each file to a
small rectangle of the (a, b) space, so a predicate on EITHER column
skips most row groups at planning/scan time. This is exactly Delta's
``OPTIMIZE ZORDER BY`` — implemented here engine-side with plain
Spark expressions (bit shifts and ORs in whole-stage codegen) and plain
parquet output, no table-format runtime needed.

At 100 TB: z-order within each date partition (layout axes compose:
partitionBy(date) → zorder(symbol_bucket, user_bucket) → bucketBy for
the join key if any). The write costs one range shuffle on the z-value —
the same price as any global sort — and pays back on every selective
scan thereafter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # bits per dimension → 32-bit Morton code for 2-D


def _spread_bits(c: Column) -> Column:
    """Spread the low Z_BITS bits of ``c`` so bit i lands at bit 2i
    (the classic Morton interleave, expressed as JVM-side shifts/ORs)."""
    out = F.lit(0).cast("long")
    for i in range(Z_BITS):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return out


def z_value(a: Column, b: Column) -> Column:
    """Morton code of two non-negative bucket ids (Z_BITS bits each):
    bits of ``a`` at even positions, ``b`` at odd."""
    return _spread_bits(a).bitwiseOR(F.shiftleft(_spread_bits(b), 1))


def bucketize(c: Column, lo: Column | float, hi: Column | float) -> Column:
    """Map a numeric column into [0, 2^Z_BITS) bucket ids given bounds
    (inclusive lo, exclusive-ish hi; the max value folds into the top
    bucket)."""
    n = 1 << Z_BITS
    width = (F.lit(hi) - F.lit(lo)) / n
    raw = F.floor((c - F.lit(lo)) / width).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), raw))


def write_zordered(
    df: DataFrame,
    path: str,
    *,
    za: Column,
    zb: Column,
    files: int = 8,
) -> None:
    """Write ``df`` as plain parquet clustered on z_value(za, zb):
    range-partition into ``files`` tasks by the z-value and sort within
    each, so every output file covers a compact Morton range — a small
    rectangle of the 2-D space — and its parquet footer min/max for BOTH
    source columns is narrow."""
    z = z_value(za, zb).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
