import sys, time
sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("SPARK_GRAFT_SCAN_CACHE", "1")
from crypto_streaming_lakehouse_spark.registry import REGISTRY
from crypto_streaming_lakehouse_spark.session import get_spark
from crypto_streaming_lakehouse_spark.extensions.dedup import memo_clear
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("time-one", cpus="32", shuffle_partitions=32,
    extra_conf={"spark.sql.files.maxPartitionBytes": "8m",
                "spark.sql.files.openCostInBytes": "4m",
                "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k"})
for name in sys.argv[1:]:
    fn = REGISTRY[name].fn
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    best = []
    for _ in range(3):
        memo_clear()
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        best.append(round(time.perf_counter() - t0, 2))
    print(name, best, flush=True)
spark.stop()
