import sys, os, time, json
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_SCAN_CACHE", "1")
from crypto_streaming_lakehouse_spark.registry import REGISTRY
from crypto_streaming_lakehouse_spark.session import get_spark
from crypto_streaming_lakehouse_spark.extensions.dedup import memo_clear
import bench
sf = "/root/testdata/sf0.1"
spark = get_spark("bench-gc-test", cpus="32", shuffle_partitions=32,
    extra_conf={"spark.sql.files.maxPartitionBytes": "8m",
                "spark.sql.files.openCostInBytes": "4m",
                "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k"})
names = [n for n in bench.HEADLINE if n in REGISTRY]
gc_mode = os.environ.get("GC_MODE") == "1"
def run(name):
    t0 = time.perf_counter()
    REGISTRY[name].fn(spark, sf).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0
for n in names: run(n)       # warmup
memo_clear()
timings = {}
for n in names:
    if gc_mode:
        spark.sparkContext._jvm.System.gc()
    timings[n] = round(run(n), 3)
print(json.dumps({"total": round(sum(timings.values()),2),
                  "pagerank": timings.get("q_pagerank"),
                  "triangle": timings.get("q_triangle_count"),
                  "bfs": timings.get("q_bfs_khop"),
                  "label_prop": timings.get("q_label_prop_communities")}))
spark.stop()
