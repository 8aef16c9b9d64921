"""Isolated per-query timing: fresh session, scan-cache layout,
8 MB splits, memo_clear per run, min of 3 warm runs; DuckDB oracle
min-of-3 in the same process.
Usage: python scripts/time_one.py q_name [sf_dir]   (default sf_dir:
/root/repo/.tmp/sf1.0 — the synthesized 10x fixture)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SCAN_CACHE", "1")
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.tmp/sf1.0"
name = sys.argv[1]
from crypto_streaming_lakehouse_spark.registry import REGISTRY
from crypto_streaming_lakehouse_spark.session import get_spark
from crypto_streaming_lakehouse_spark.extensions.dedup import memo_clear
spark = get_spark(
    "time-one", cpus="32", shuffle_partitions=32,
    extra_conf={
        "spark.sql.files.maxPartitionBytes": "8m",
        "spark.sql.files.openCostInBytes": "4m",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
    },
)
d = REGISTRY[name]
d.fn(spark, SF).write.format("noop").mode("overwrite").save()
best = float("inf")
for _ in range(3):
    memo_clear()
    t0 = time.perf_counter()
    d.fn(spark, SF).write.format("noop").mode("overwrite").save()
    best = min(best, time.perf_counter() - t0)
from tests.oracle import duckdb_connect
con = duckdb_connect(SF)
db = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    con.execute(d.sql).fetchall()
    db = min(db, time.perf_counter() - t0)
print(f"RESULT {name} spark={best:.2f} duckdb={db:.2f} ratio={best/db:.2f}")
