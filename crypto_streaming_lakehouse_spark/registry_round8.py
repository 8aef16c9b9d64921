"""Round-8: oracle-backed queries over the SNAPSHOT TABLE LAYER
(sources/snapshots.py) — the versioned-manifest lakehouse format gets
driver-verifiable correctness rows instead of pytest-only evidence.

Both queries materialize a deterministic snapshot table from the
``orders`` fixture (three appended commits banded by order year, plus a
derived ``order_year`` partition-style column so manifest min/max stats
are discriminative), then read THROUGH ``snapshot_read`` — one with
manifest file-skipping, one with time travel to version 1 — and
aggregate. The DuckDB oracle expresses the same logical content as a
plain filter over ``orders``, which is exactly the equivalence the
snapshot layer must preserve: versioned reads are just filters the
metadata resolved for free.

Reference parity: the reference has no table format at all — its bronze
→ silver hop rewrites plain parquet dirs (bronze_to_silver_trades.py:
85-87), so versioned reads are the capability gap the north star calls
out; there is no reference file to cite line-for-line.

The build is memoized per (application, sf_dir) AND on disk (the table
content is a pure function of the immutable fixture, so a completed
build from an earlier session is reusable; a ``_BUILD_OK`` marker
distinguishes complete builds from crashed ones). Scratch lives under
the gitignored ``.tmp/`` (override: $SPARK_GRAFT_SNAPSHOT_TMP).
"""

from __future__ import annotations

import hashlib
import os
import pathlib
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import r6, register
from .sources.snapshots import snapshot_read, snapshot_write
from .sources.tables import load_table

#: Yearly commit bands (complete partition of any year value, so every
#: fixture row lands in exactly one commit at any scale factor).
_BANDS_DESC = "v1: year<=1997; v2: 1998-1999; v3: year>=2000"

_SNAP_MEMO: dict[tuple[str, str], str] = {}


def _scratch_base() -> pathlib.Path:
    return pathlib.Path(
        os.environ.get(
            "SPARK_GRAFT_SNAPSHOT_TMP", "/root/repo/.tmp/snapshot_tables"
        )
    )


def orders_snapshot_table(spark: SparkSession, sf_dir: str) -> str:
    """Build (or reuse) the three-commit snapshot table over ``orders``.

    Commit 1 = orders with order_year <= 1997, commit 2 = 1998-1999,
    commit 3 = >= 2000 — so per-file ``order_year`` min/max bounds in
    the manifest are disjoint across commits and file-skipping has real
    work to do. Each commit is written as 2 files (repartition(2)) so a
    commit is never a single-file degenerate case.

    At 100 TB this build step IS the ingestion pipeline (periodic
    appends of new time bands); the queries below only ever read
    manifests + surviving files, so their cost is independent of how
    many historical commits exist.
    """
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _SNAP_MEMO.get(key)
    if hit is not None:
        return hit
    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    table = _scratch_base() / f"orders_{digest}"
    ok = table / "_BUILD_OK"
    if ok.is_file() and ok.read_text().strip() == _BANDS_DESC:
        _SNAP_MEMO[key] = str(table)
        return str(table)
    # Incomplete/stale build (crashed session, changed band spec):
    # rebuild from scratch — the fixture is immutable, so a completed
    # rebuild is byte-equivalent in content.
    shutil.rmtree(table, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    y = F.col("order_year")
    for band in (y <= 1997, (y >= 1998) & (y <= 1999), y >= 2000):
        snapshot_write(orders.where(band).repartition(2), str(table))
    ok.write_text(_BANDS_DESC)
    _SNAP_MEMO[key] = str(table)
    return str(table)


# ---------------------------------------------------------------------------
# Snapshot read with manifest file-skipping
# ---------------------------------------------------------------------------


@register(
    "q_snapshot_prune_read",
    """
SELECT CAST(month(o_orderdate) AS INTEGER) AS month,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(o_totalprice) AS REAL) AS sum_price,
       CAST(avg(o_totalprice) AS REAL) AS avg_price
FROM orders
WHERE year(o_orderdate) = 1998
GROUP BY 1
""",
    "snapshot",
    "lakehouse",
)
def q_snapshot_prune_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order totals for 1998, read through ``snapshot_read``
    with manifest-statistics pruning on the ``order_year`` band column:
    only commit 2's files (1998-1999) survive the manifest check — the
    other two commits are dropped before Spark ever lists them. Pruning
    is a superset guarantee, so the actual year filter still applies.

    Oracle equivalence: the snapshot table's latest version holds
    exactly the ``orders`` content (three appends partition the table),
    so the result must equal the same aggregate over the raw fixture.

    Scale: the read lists O(surviving files), not O(table files) — the
    same math as Delta/Iceberg data skipping; the aggregate is one
    map-side-combined shuffle over one year of data.
    """
    table = orders_snapshot_table(spark, sf_dir)
    df = snapshot_read(spark, table, prune=("order_year", 1998, 1998))
    return (
        df.where(F.col("order_year") == 1998)
        .groupBy(F.month("o_orderdate").alias("month"))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            r6(F.sum("o_totalprice"), "sum_price"),
            r6(F.avg("o_totalprice"), "avg_price"),
        )
    )


# ---------------------------------------------------------------------------
# Snapshot time travel
# ---------------------------------------------------------------------------


@register(
    "q_snapshot_time_travel",
    """
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
       CAST(sum(o_totalprice) AS REAL) AS sum_price
FROM orders
WHERE year(o_orderdate) <= 1997
GROUP BY 1
""",
    "snapshot",
    "lakehouse",
)
def q_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly order rollup AT TABLE VERSION 1 — the snapshot table after
    its first commit only (years <= 1997), read while the head is at
    version 3. Time travel must serve exactly the version-1 file set
    regardless of later appends; the oracle is the equivalent year
    filter over the raw fixture.

    Scale: resolving a version is one manifest read; the scan touches
    only that version's files. History depth never enters the plan.
    """
    table = orders_snapshot_table(spark, sf_dir)
    df = snapshot_read(spark, table, version=1)
    return df.groupBy(
        F.col("order_year").cast("int").alias("order_year")
    ).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.countDistinct("o_custkey").cast("long").alias("n_custs"),
        r6(F.sum("o_totalprice"), "sum_price"),
    )
