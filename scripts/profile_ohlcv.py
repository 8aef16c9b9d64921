"""Decompose q_ohlcv_bars wall time at sf1.0 under the exact bench
session (VERDICT r10 item 4): scan / agg / memo layout / consumer read.
Min-of-3 per stage, memos cleared before each timed run (bench's cold
protocol)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SCAN_CACHE", "1")

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.tmp/sf1.0")

from crypto_streaming_lakehouse_spark.extensions.dedup import memo_clear
from crypto_streaming_lakehouse_spark.operators.bars import gold_bars_cut, ohlcv_bars
from crypto_streaming_lakehouse_spark.registry import REGISTRY
from crypto_streaming_lakehouse_spark.session import get_spark
from crypto_streaming_lakehouse_spark.sources.tables import events_as_trades

spark = get_spark(
    "profile-ohlcv",
    cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
    shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "12")),
    extra_conf={
        "spark.sql.files.maxPartitionBytes": "8m",
        "spark.sql.files.openCostInBytes": "4m",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
    },
)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, n=3, warm=True):
    if warm:
        memo_clear()
        fn()  # one warmup (JIT/codegen), bench does the same
    ts = []
    for _ in range(n):
        memo_clear()
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{label:36s} min {min(ts):6.3f}s  all {[round(t,3) for t in ts]}",
          flush=True)
    return min(ts)


# Stage A: events scan + trades projection only
timed("A scan+project (events_as_trades)", lambda: noop(events_as_trades(spark, SF)))

# Stage B: scan + OHLCV grouped agg (NO memo layout work)
timed("B scan+agg (ohlcv_bars direct)", lambda: noop(ohlcv_bars(events_as_trades(spark, SF))))

# Stage C: memo build (agg + repartition(symbol) + localCheckpoint)
def build_memo():
    gold_bars_cut(spark, SF)
timed("C memo build (gold_bars_cut)", build_memo)

# Stage D: full registry query cold (memo build + select + noop)
timed("D q_ohlcv_bars cold (full)", lambda: noop(REGISTRY["q_ohlcv_bars"].fn(spark, SF)))

# Stage E: consumer read when memo already built (warm second query)
memo_clear()
gold_bars_cut(spark, SF)
t0 = time.perf_counter()
noop(REGISTRY["q_ohlcv_bars"].fn(spark, SF))
print(f"{'E memo-warm consumer read':36s} min {time.perf_counter()-t0:6.3f}s",
      flush=True)

n_bars = gold_bars_cut(spark, SF).count()
n_trades = events_as_trades(spark, SF).count()
print(f"rows: trades={n_trades} bars={n_bars}", flush=True)
spark.stop()
