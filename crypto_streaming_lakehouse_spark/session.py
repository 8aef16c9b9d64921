"""SparkSession factory.

Defaults chosen for correctness-vs-oracle and 100 TB-mindset scaling:
UTC session timezone (DuckDB oracle parity), AQE on (runtime coalesce +
skew-join handling), Arrow on (fast Pandas-UDF path), shuffle partitions
sized to the local core count rather than the 200 default.

On a real cluster the same builder applies; only master/memory change.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "crypto-streaming-lakehouse-spark",
    *,
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with the engine's defaults."""
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", n))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Whole-stage-codegen class cache (STATIC conf). Spark's default
        # is 100 entries; a long-lived analytics session compiles far
        # more distinct codegen units than that (this repo's 55-query
        # bench session compiles ~300+), so warm-pass classes are
        # EVICTED before the next execution of the same query and every
        # run re-pays Janino compilation. Measured (order-reversed A/B,
        # .tmp/ab_codegen.json, round 8): full bench 61 s → 39 s, every
        # query improved, iterative/graph family -1.6..-2.3 s each.
        # This was the previously-unexplained "long-session inflation"
        # of rounds 5-7 (GC/heap/code-cache were all A/B'd and cleared).
        # Cost is driver-side memory for cached generated classes —
        # the right trade for any session that runs a query workload.
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "10000"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    # Operator-controlled conf injection (semicolon-separated k=v), e.g.
    # SPARK_GRAFT_EXTRA_CONF="spark.sql.codegen.cache.maxEntries=10000".
    # Needed for STATIC confs, which must be set before the session
    # exists — the mechanism behind the A/B experiments in SCALE.md.
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for item in filter(None, env_conf.split(";")):
        k, _, v = item.partition("=")
        builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def iter_parts(spark: SparkSession) -> int:
    """The partition width used for iterative-loop state (and for the
    pre-partitioned loop-invariant tables that join against it): a
    quarter of the session shuffle count, floored at 8. Keeping the
    memoized edge layout and the loop scope on the SAME width means no
    re-exchange at the loop boundary."""
    return max(8, int(spark.conf.get("spark.sql.shuffle.partitions")) // 4)


@contextmanager
def iter_shuffle_scope(spark: SparkSession, parts: int | None = None):
    """Temporarily shrink ``spark.sql.shuffle.partitions`` around the
    EAGER materialization of an iterative loop (PageRank/BFS/label-prop).

    Why: each iteration of those loops shuffles a node-sized table that
    is tiny relative to the session-wide partition count — at local
    scale every round launches full-width stages of near-empty tasks,
    and even on a cluster the rank/frontier/label tables are orders of
    magnitude smaller than the fact-table shuffles the session count is
    sized for. AQE's coalescer keeps parallelism-first partition counts
    (the right default for CPU-heavy text stages), so the iteration
    stages stay wide unless the initial count is lowered. Scoping the
    conf around an eager ``localCheckpoint``/``checkpoint`` of the loop
    output confines the narrow setting to the iterations; callers'
    lazily-returned plans never see it. Measured at sf0.1/local[32]:
    PageRank 2.8 s → 2.2 s (min-of-3, same session).

    ``parts`` defaults to ``iter_parts`` (a quarter of the session
    count, floored at 8) — iteration shuffles scale with node count, not
    fact-table bytes, so a fixed fraction of the session sizing is the
    right cluster default; the pre-partitioned loop-invariant tables use
    the same width so the loop boundary never re-exchanges.

    AQE is also disabled inside the scope: every iteration's shuffle is
    a node-sized table of known, fixed shape, so AQE's per-stage
    materialize-and-replan barrier (a separate job per exchange) buys
    nothing and costs a scheduling round-trip per iteration — measured
    3.9 s → 3.3 s on the 8-iteration PageRank loop at sf0.1. This is a
    conf scoped to the loop materialization only, not a plan property: a
    cluster session that wants AQE skew-splitting inside a hub-skewed
    loop re-enables it via its session conf before materializing.
    """
    key = "spark.sql.shuffle.partitions"
    aqe = "spark.sql.adaptive.enabled"
    old = spark.conf.get(key)
    old_aqe = spark.conf.get(aqe)
    if parts is None:
        parts = iter_parts(spark)
    spark.conf.set(key, str(parts))
    spark.conf.set(aqe, "false")
    try:
        yield
    finally:
        spark.conf.set(key, old)
        spark.conf.set(aqe, old_aqe)


@contextmanager
def wide_build_scope(spark: SparkSession):
    """Temporarily disable AQE partition coalescing around the EAGER
    materialization of a CPU-dense derivation build.

    Why: AQE's coalescer sizes post-shuffle partitions by shuffle BYTES,
    which is the right proxy when bytes ≈ work — but array-exploding
    builds (per-order part arrays → C(k,2) pair rows, per-doc shingle
    sets → posting rows) do 20–100× more row work than their input
    bytes suggest, so the coalesced stage runs a handful of tasks on a
    32-core host. Scoped to the build's eager action only (the conf is
    consulted at execution), so every query plan around it keeps the
    session's adaptive defaults. At production scale these builds'
    shuffles are TB-sized and the coalescer never bites — the scope is
    then a no-op by construction, same argument as iter_shuffle_scope.
    Measured: co-purchase edge build 3.4 s → 1.9 s cold at sf0.1.
    """
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, old)
