"""The scan-layout cache must be invisible except for parallelism:
identical rows, identical schema, original row order preserved across
the contiguous slices, and full fallback when disabled."""

from __future__ import annotations

import os

import pytest

from crypto_streaming_lakehouse_spark.sources.scan_cache import cached_path
from crypto_streaming_lakehouse_spark.sources.tables import TABLES, load_table

from .conftest import SF_DIR


def test_disabled_returns_original():
    os.environ.pop("SPARK_GRAFT_SCAN_CACHE", None)
    assert cached_path(SF_DIR, "events") == f"{SF_DIR}/events.parquet"


@pytest.mark.parametrize("name", ["events", "documents", "lineitem", "region"])
def test_cache_rows_identical(spark, tmp_path, name):
    import pyarrow.parquet as pq

    os.environ["SPARK_GRAFT_SCAN_CACHE"] = "1"
    os.environ["SPARK_GRAFT_SCAN_CACHE_DIR"] = str(tmp_path)
    try:
        path = cached_path(SF_DIR, name)
        assert path != f"{SF_DIR}/{name}.parquet"
        src = pq.read_table(f"{SF_DIR}/{name}.parquet")
        files = sorted(
            f for f in os.listdir(path) if f.endswith(".parquet")
        )
        # contiguous slices in file order == the original, row for row
        import pyarrow as pa

        cached = pa.concat_tables(
            [pq.read_table(os.path.join(path, f)) for f in files]
        )
        assert cached.schema.equals(src.schema)
        assert cached.num_rows == src.num_rows
        assert cached.equals(src)
    finally:
        os.environ.pop("SPARK_GRAFT_SCAN_CACHE", None)
        os.environ.pop("SPARK_GRAFT_SCAN_CACHE_DIR", None)


def test_load_table_values_equal_through_cache(spark, tmp_path):
    """load_table through the cache returns the same multiset of rows,
    including the nanos-timestamp conversion path (events.ts)."""
    direct = load_table(spark, SF_DIR, "events")
    direct_rows = sorted(map(tuple, direct.collect()))
    os.environ["SPARK_GRAFT_SCAN_CACHE"] = "1"
    os.environ["SPARK_GRAFT_SCAN_CACHE_DIR"] = str(tmp_path)
    try:
        via_cache = load_table(spark, SF_DIR, "events")
        assert via_cache.schema == direct.schema
        assert sorted(map(tuple, via_cache.collect())) == direct_rows
    finally:
        os.environ.pop("SPARK_GRAFT_SCAN_CACHE", None)
        os.environ.pop("SPARK_GRAFT_SCAN_CACHE_DIR", None)
