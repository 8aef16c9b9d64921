"""Bucketed table layout: pre-shuffled storage for shuffle-free joins/aggs.

At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders,
trades ⋈ quotes) is shuffling BOTH sides on the join key — terabytes of
network and shuffle-file I/O per query. Bucketing pays that shuffle ONCE
at write time: ``bucketBy(n, key)`` hash-partitions rows into ``n``
files and records the layout in the catalog, so every later join or
aggregation on that key reads co-located buckets and the planner drops
the Exchange on both sides (SortMergeJoin with zero shuffles; with
``sortBy`` the per-bucket files are pre-sorted too, removing the Sort
when bucket counts align).

Reference parity: the reference's Gold layout partitions by
``(bar_date, symbol)`` for pruning (silver_to_gold_bars.py:72);
bucketing is the complementary layout axis — partitionBy prunes what you
*scan*, bucketBy co-locates what you *join*. The reference never needed
it at laptop scale; on a cluster it is the first lever for any key that
is joined repeatedly.

Sizing at 100 TB: pick ``buckets`` so one bucket of the largest table
fits an executor's shuffle memory (e.g. 100 TB / 4096 buckets ≈ 25 GB
per bucket pre-compression — use 8192+); both join sides must use the
SAME bucket count (or an integer multiple, with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``) for the
shuffle-free plan to apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    key: str | list[str],
    buckets: int = 8,
    sort: bool = True,
    path: str | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a catalog table bucketed (and optionally sorted)
    by ``key``. With ``path`` the table is external (data at ``path``,
    layout metadata in the session catalog); without, it lands in the
    warehouse dir. Works with the default in-memory catalog — no Hive
    metastore needed."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.format(fmt).mode(mode).bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its layout metadata attached (a
    plain ``spark.read.parquet`` on the files would lose the bucket spec
    and reintroduce the shuffle)."""
    return spark.table(table)
