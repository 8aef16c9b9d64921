"""Breadth queries beyond the reference surface (SURVEY.md §2.8 listed
these as absent-by-design in the reference; they are table stakes for a
general engine, each a one-primitive composition):

- as-of join (operators.asof — union+window, oracle: DuckDB ASOF JOIN)
- set operations (UNION / INTERSECT / EXCEPT, all distinct semantics)
- hierarchical aggregation (ROLLUP / CUBE)
- exact + approximate distinct counting, approximate percentiles
  (approx queries have no bit-exact oracle by nature → rows-only check)

Timestamps are compared as epoch MICROSECONDS on both engines: the fixture
stores TIMESTAMP(NANOS), Spark's loader floors to micros, and DuckDB's
epoch_us() floors the same way — integer equality, no truncation skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.asof import asof_join_backward
from .registry import r6, register
from .sources.tables import load_table


# ---------------------------------------------------------------------------
# As-of join
# ---------------------------------------------------------------------------


@register(
    "q_asof_join",
    """
WITH a AS (
  SELECT event_id, user_id, epoch_us(ts) AS t_us, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
), b AS (
  SELECT user_id, epoch_us(ts) AS t_us, max(value) AS view_value
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
)
SELECT a.event_id, a.user_id, a.t_us, a.purchase_value,
       b.view_value, b.t_us AS view_t_us
FROM a ASOF LEFT JOIN b ON a.user_id = b.user_id AND a.t_us >= b.t_us
""",
    "join",
    "asof",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase + the user's latest at-or-before view (value + time).

    Right side pre-aggregated to one row per (user, time) so the as-of
    pick is deterministic on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        F.col("value").alias("purchase_value"),
    )
    b = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", F.unix_micros("ts").alias("t_us"))
        .agg(F.max("value").alias("view_value"))
        .withColumn("view_t_us", F.col("t_us"))
    )
    out = asof_join_backward(
        a, b, on=["user_id"], time_col="t_us",
        right_value_cols=["view_value", "view_t_us"],
    )
    return out.select(
        "event_id", "user_id", "t_us", "purchase_value", "view_value", "view_t_us"
    )


# ---------------------------------------------------------------------------
# Set operations (distinct semantics, matching SQL UNION/INTERSECT/EXCEPT)
# ---------------------------------------------------------------------------


def _users_of(ev: DataFrame, etype: str) -> DataFrame:
    return ev.where(F.col("event_type") == etype).select("user_id")


_SET_SQL = """
SELECT user_id FROM events WHERE event_type = 'purchase'
{op}
SELECT user_id FROM events WHERE event_type = 'view'
"""


@register("q_set_union", _SET_SQL.format(op="UNION"), "setop")
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return _users_of(ev, "purchase").union(_users_of(ev, "view")).distinct()


@register("q_set_intersect", _SET_SQL.format(op="INTERSECT"), "setop")
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return _users_of(ev, "purchase").intersect(_users_of(ev, "view"))


@register("q_set_except", _SET_SQL.format(op="EXCEPT"), "setop")
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return _users_of(ev, "purchase").subtract(_users_of(ev, "view"))


# ---------------------------------------------------------------------------
# ROLLUP / CUBE
# ---------------------------------------------------------------------------

_HIER_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(l_quantity) AS REAL) AS sum_qty,
       count(*) AS n
FROM lineitem GROUP BY {op} (l_returnflag, l_linestatus)
"""


def _hier(spark: SparkSession, sf_dir: str, op: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    grouped = getattr(li, op)("l_returnflag", "l_linestatus")
    return grouped.agg(
        r6(F.sum("l_quantity"), "sum_qty"), F.count("*").alias("n")
    ).select("l_returnflag", "l_linestatus", "sum_qty", "n")


@register("q_rollup", _HIER_SQL.format(op="ROLLUP"), "agg", "rollup")
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hier(spark, sf_dir, "rollup")


@register("q_cube", _HIER_SQL.format(op="CUBE"), "agg", "rollup")
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hier(spark, sf_dir, "cube")


# ---------------------------------------------------------------------------
# Distinct counting & percentiles
# ---------------------------------------------------------------------------


@register(
    "q_count_distinct",
    """
SELECT event_type, count(DISTINCT user_id) AS users, count(*) AS events
FROM events GROUP BY event_type
""",
    "agg",
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("users"),
        F.count("*").alias("events"),
    )


@register("q_approx_count_distinct", None, "agg", "approx")
def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counting — the 100 TB path where exact
    count(DISTINCT) would shuffle every key. No bit-exact oracle exists
    across engines (different sketches) → driver runs the rows-only check;
    exactness of the exact twin is q_count_distinct."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users")
    )


@register("q_percentile_approx", None, "agg", "approx")
def q_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-digest-style quantiles per group (rows-only check: sketch
    boundaries are engine-specific; the exact-aggregation surface is
    covered by the oracle-checked agg queries)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.9, 0.99], 10000).alias("p")
    )
