"""Every registry query hash-matches its DuckDB oracle (the t2 gate,
replicated locally at sf0.001 for fast iteration)."""

from __future__ import annotations

import pytest

from crypto_streaming_lakehouse_spark.registry import REGISTRY

from .conftest import SF_DIR
from .oracle import compare, duckdb_connect


@pytest.fixture(scope="module")
def con():
    c = duckdb_connect(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, con, name):
    d = REGISTRY[name]
    df = d.fn(spark, SF_DIR)
    if d.sql is None:
        assert df.count() >= 0  # rows-only check, mirroring the driver
    else:
        compare(df, con, d.sql)
