import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import Window, functions as F
from crypto_streaming_lakehouse_spark.session import get_spark
from crypto_streaming_lakehouse_spark.sources.tables import load_table
from crypto_streaming_lakehouse_spark.registry_round7 import MW_A, MW_B, MW_PARTS

sf = "/root/testdata/sf0.01"
spark = get_spark("dbg-mw")
orders = load_table(spark, sf, "orders")
sub = orders.where(F.col("o_orderpriority").isin(MW_A, MW_B)).select(
    F.col("o_totalprice").alias("v"),
    F.when(F.col("o_orderpriority") == MW_A, 1).otherwise(0).alias("is_a"),
)
vals = (
    sub.groupBy("v")
    .agg(F.sum("is_a").alias("cnt_a"), F.count("*").alias("cnt"))
    .repartitionByRange(MW_PARTS, "v")
    .withColumn("pid", F.spark_partition_id())
)
# check pid monotonicity vs v
chk = vals.groupBy("pid").agg(F.min("v").alias("mn"), F.max("v").alias("mx"), F.count("*").alias("c")).orderBy("pid").collect()
for r in chk: print(r)
wp = Window.partitionBy("pid").orderBy("v")
local = vals.withColumn("local_end", F.sum("cnt").over(wp))
totals = vals.groupBy("pid").agg(F.sum("cnt").alias("ptot"))
wo = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
offsets = totals.select("pid", F.coalesce(F.sum("ptot").over(wo), F.lit(0)).alias("poff"))
print(offsets.collect())
rk = local.join(F.broadcast(offsets), "pid").select("v","cnt_a","cnt",(F.col("poff")+F.col("local_end")-F.col("cnt")).alias("cum_before"))
srows = {r.v: r.cum_before for r in rk.collect()}
# duck truth
import duckdb
con = duckdb.connect()
drows = con.sql(f"""
WITH sub AS (SELECT o_totalprice AS v, CASE WHEN o_orderpriority='{MW_A}' THEN 1 ELSE 0 END AS is_a
             FROM '/root/testdata/sf0.01/orders.parquet' WHERE o_orderpriority IN ('{MW_A}','{MW_B}')),
vals AS (SELECT v, sum(is_a) cnt_a, count(*) cnt FROM sub GROUP BY v)
SELECT v, sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - cnt FROM vals
""").fetchall()
bad = [(v, srows.get(v), d) for v, d in drows if srows.get(v) != d]
print("n_bad", len(bad), "of", len(drows))
print(bad[:10])
spark.stop()
