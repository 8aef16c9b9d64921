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


def test_decimal_exact_bitwise(spark, con):
    """Pin q_decimal_exact's underlying DECIMAL sums bit-for-bit.

    The registry query renders pinned-scale strings for driver-hash
    robustness (VERDICT r04); this test keeps the exactness claim honest
    by comparing the raw Decimal aggregates between engines with NO
    canonicalization at all — Python decimal.Decimal equality, exact
    scale included.
    """
    from decimal import Decimal

    from pyspark.sql import functions as F

    from crypto_streaming_lakehouse_spark.sources.tables import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    spark_rows = {
        r["l_returnflag"]: (r["gross"], r["discount_amt"], r["n"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum(price).alias("gross"),
            F.sum(price * disc).alias("discount_amt"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    oracle_rows = {
        f: (g, d, n)
        for f, g, d, n in con.execute(
            """
            SELECT l_returnflag,
                   sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS gross,
                   sum(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(l_discount AS DECIMAL(18,2))) AS discount_amt,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag
            """
        ).fetchall()
    }
    assert set(spark_rows) == set(oracle_rows)
    for flag, (g, d, n) in spark_rows.items():
        og, od, on = oracle_rows[flag]
        assert isinstance(g, Decimal) and isinstance(og, Decimal)
        # Exact equality of value; scale pinned explicitly (engines widen
        # sum() to different precisions but must agree on the scale).
        assert g == og and d == od and n == on
        assert -g.as_tuple().exponent == 2
        assert -d.as_tuple().exponent == 4
