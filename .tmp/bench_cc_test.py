import sys, os, time, json
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_SCAN_CACHE", "1")
from pyspark.sql import SparkSession
cc = os.environ.get("CC_SIZE")
b = (SparkSession.builder.master("local[32]").appName("bench-cc")
     .config("spark.sql.session.timeZone", "UTC")
     .config("spark.ui.enabled", "false")
     .config("spark.sql.shuffle.partitions", "32")
     .config("spark.sql.files.maxPartitionBytes", "8m")
     .config("spark.sql.files.openCostInBytes", "4m")
     .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
     .config("spark.driver.memory", "8g"))
if cc:
    b = b.config("spark.driver.extraJavaOptions", f"-XX:ReservedCodeCacheSize={cc} -XX:+UseCodeCacheFlushing")
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
from crypto_streaming_lakehouse_spark.registry import REGISTRY
from crypto_streaming_lakehouse_spark.extensions.dedup import memo_clear
import bench
sf = "/root/testdata/sf0.1"
names = [n for n in bench.HEADLINE if n in REGISTRY]
def run(name):
    t0 = time.perf_counter()
    REGISTRY[name].fn(spark, sf).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0
for n in names: run(n)
memo_clear()
timings = {n: round(run(n), 3) for n in names}
print(json.dumps({"cc": cc, "total": round(sum(timings.values()),2),
                  "pagerank": timings.get("q_pagerank"),
                  "triangle": timings.get("q_triangle_count")}))
spark.stop()
