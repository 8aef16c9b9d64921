"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``crypto_streaming_lakehouse_spark``; this module
only adapts the registry to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: 1-minute OHLCV+VWAP bars over the event stream."""
    from crypto_streaming_lakehouse_spark.registry import REGISTRY

    return REGISTRY["q_ohlcv_bars"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Oracle-backed queries are listed first and rows-only queries last, so
    a failure in a weaker-checked query can never truncate verification of
    the oracle-backed surface (the round-1 lesson: one bad entry masked
    every query registered after it).
    """
    from crypto_streaming_lakehouse_spark.registry import REGISTRY

    ordered = sorted(REGISTRY.items(), key=lambda kv: kv[1].sql is None)
    return {name: d.fn for name, d in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    from crypto_streaming_lakehouse_spark.registry import REGISTRY

    return {name: d.sql for name, d in REGISTRY.items() if d.sql is not None}
