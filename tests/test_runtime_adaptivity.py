"""Runtime re-planning and runtime-metrics surfaces that only matter at
cluster scale: dynamic partition pruning (skip fact partitions based on a
dim filter discovered at runtime), AQE skew-join splitting (the hot-key
mitigation that needs no manual salting), and single-pass observed
metrics (operational counts without a second scan)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from crypto_streaming_lakehouse_spark.plans.audit import explain_string
from crypto_streaming_lakehouse_spark.plans.metrics import observe_metrics
from crypto_streaming_lakehouse_spark.sources.tables import load_table

from .conftest import SF_DIR
from .test_bucketing import _conf


def test_dynamic_partition_pruning(spark, tmp_path):
    # Date-partitioned fact (the Silver/Gold layout) joined to a dim
    # filtered at runtime: the fact scan's PartitionFilters must carry a
    # dynamicpruning subquery so only the dim's surviving dates are read.
    ev = load_table(spark, SF_DIR, "events")
    fact_path = str(tmp_path / "fact")
    ev.withColumn("event_date", F.to_date("ts")).write.partitionBy(
        "event_date"
    ).parquet(fact_path)
    fact = spark.read.parquet(fact_path)

    dim_path = str(tmp_path / "dim")
    fact.select("event_date").distinct().orderBy("event_date").limit(
        2
    ).withColumn("keep", F.lit(1)).write.parquet(dim_path)
    dim = spark.read.parquet(dim_path)

    joined = fact.join(dim.where(F.col("keep") == 1), "event_date")
    plan = explain_string(joined, "formatted")
    assert "dynamicpruningexpression" in plan

    # Correctness: identical to the static two-step filter.
    kept = [r[0] for r in dim.where(F.col("keep") == 1).select("event_date").collect()]
    assert joined.count() == fact.where(F.col("event_date").isin(kept)).count()


def test_aqe_splits_skewed_join_partition(spark):
    # One hot key carrying ~2/3 of the left side: AQE's runtime skew-join
    # splits the oversized shuffle partition into parallel sub-reads
    # (SortMergeJoin(skew=true)) — the no-code-change alternative to the
    # manual salting operator (operators/skew.py) when AQE owns the plan.
    with _conf(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    ):
        left = (
            spark.range(0, 200000)
            .withColumn(
                "k",
                F.when(F.col("id") % 3 != 0, F.lit(7)).otherwise(
                    F.col("id") % 1000
                ),
            )
            .withColumn("payload", F.sha2(F.col("id").cast("string"), 256))
        )
        right = spark.range(0, 1000).withColumnRenamed("id", "k").withColumn(
            "v", F.col("k") * 2
        )
        joined = left.join(right, "k")
        assert len(joined.collect()) == 200000
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan
        assert re.search(r"AQEShuffleRead skewed", final_plan)


def test_observed_metrics_single_pass(spark):
    ev = load_table(spark, SF_DIR, "events")
    instrumented, obs = observe_metrics(
        ev.where(F.col("value").isNotNull()),
        "quality",
        rows=F.count(F.lit(1)),
        null_props=F.count(F.when(F.col("props").isNull(), 1)),
        max_ts=F.max("ts"),
    )
    # One action drives both the query result and the metrics.
    out_rows = instrumented.groupBy("event_type").count().collect()
    got = obs.get
    expected = ev.where(F.col("value").isNotNull())
    assert got["rows"] == expected.count()
    assert got["null_props"] == expected.where(F.col("props").isNull()).count()
    assert got["max_ts"] == expected.agg(F.max("ts")).first()[0]
    assert sum(r["count"] for r in out_rows) == got["rows"]


def test_runtime_bloom_filter_prunes_probe_side(spark):
    # Runtime bloom-filter join pruning: the selective dim side builds a
    # bloom_filter_agg, and the 100 TB probe side gets a might_contain()
    # pre-filter ahead of the shuffle — rows that can't join never move.
    # The application-side size gate (10 GB default — sized for clusters)
    # is lowered so the fixture-scale plan exercises the injection path.
    with _conf(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold": "0",
        },
    ):
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").where(
            F.col("o_totalprice") > 400000
        )
        joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = explain_string(joined, "formatted")
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
        # Filter injection must not change the answer.
        plain = li.join(
            orders.hint("broadcast"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert joined.count() == plain.count()
