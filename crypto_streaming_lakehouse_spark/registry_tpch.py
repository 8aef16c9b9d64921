"""TPC-H-shape relational breadth beyond the Q1/Q3/Q5/Q18 forms already
in the registry: correlated scalar-subquery decorrelation (Q2 shape),
top-k revenue join chains (Q10), conditional-share aggregation (Q14),
and null-aware NOT IN anti-join with distinct counting (Q16).

The fixture schema is a slimmed TPC-H (no partsupp table), so the
part↔supplier relation is derived from lineitem where the original
queries use partsupp — the plan shapes (decorrelated min subquery,
NOT IN null-aware anti join, grouped distinct count) are preserved,
which is what these queries exist to pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import r6, register
from .sources.tables import load_table

# ---------------------------------------------------------------------------
# Q2 shape: correlated scalar min subquery (decorrelated by Catalyst)
# ---------------------------------------------------------------------------


@register(
    "q_min_price_supplier",
    """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS unit_price
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT p.p_partkey, p.p_brand, s.s_name,
       CAST(ps.unit_price AS REAL) AS unit_price
FROM ps
JOIN part p ON p.p_partkey = ps.l_partkey
JOIN supplier s ON s.s_suppkey = ps.l_suppkey
WHERE p.p_size <= 5
  AND ps.unit_price = (
    SELECT min(ps2.unit_price) FROM ps ps2
    WHERE ps2.l_partkey = ps.l_partkey
  )
""",
    "tpch",
    "subquery",
)
def q_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for every small part, the supplier(s) offering its
    minimum unit price — a correlated scalar MIN subquery that Catalyst
    decorrelates into an aggregate + equi-join (no per-row re-execution).
    The part↔supplier offer relation derives from lineitem (slimmed
    schema, see module docstring); price comparison is exact IEEE
    division on both engines, so the equality filter can't flip.

    Plan: one (part, supp) aggregate, one per-part min re-aggregate,
    joined back — all key-partitioned; the dims broadcast. The
    decorrelation is pinned by tests/test_plans.py (no NLJ)."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("up"))
    pmin = ps.groupBy("pk").agg(F.min("up").alias("up_min"))
    part = load_table(spark, sf_dir, "part").where(F.col("p_size") <= 5)
    sup = load_table(spark, sf_dir, "supplier")
    return (
        ps.join(pmin, "pk")
        .where(F.col("up") == F.col("up_min"))
        .join(
            F.broadcast(part), F.col("pk") == F.col("p_partkey")
        )
        .join(F.broadcast(sup), F.col("sk") == F.col("s_suppkey"))
        .select("p_partkey", "p_brand", "s_name", r6("up", "unit_price"))
    )


# ---------------------------------------------------------------------------
# Q10 shape: returned-item revenue ranking
# ---------------------------------------------------------------------------

Q10_TOPK = 20


@register(
    "q_returned_revenue",
    f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(sum(l.l_extendedprice * (1 - l.l_discount)) AS REAL) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY CAST(sum(l.l_extendedprice * (1 - l.l_discount)) AS REAL) DESC,
         c.c_custkey
LIMIT {Q10_TOPK}
""",
    "tpch",
    "join",
)
def q_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-{Q10_TOPK} customers by revenue lost to
    returns — fact-to-fact join (lineitem ⋈ orders on the shuffle key)
    with broadcast dims (customer, nation), one grouped aggregate, and a
    TakeOrderedAndProject for the top-k (never a global sort). Ranking
    compares the float32-canonicalized revenue with c_custkey tiebreak on
    BOTH engines, so the cut is deterministic."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            r6(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                "revenue",
            ),
            F.count("*").alias("n_items"),
        )
    )
    return rev.orderBy(F.desc("revenue"), "c_custkey").limit(Q10_TOPK)


# ---------------------------------------------------------------------------
# Q14 shape: promotion revenue share
# ---------------------------------------------------------------------------


@register(
    "q_promo_share",
    """
SELECT CAST(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                        THEN l.l_extendedprice * (1 - l.l_discount) END)
            / sum(l.l_extendedprice * (1 - l.l_discount)) AS REAL)
         AS promo_share_pct,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_promo_items
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
""",
    "tpch",
    "agg",
)
def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotional revenue share over a ship-date year —
    a conditional-aggregate ratio in ONE pass over the date-pruned fact
    scan with the part dim broadcast. The date predicate pushes to the
    parquet scan (PushedFilters); at 100 TB with date-partitioned layout
    this is partition pruning, reading 1 year of 7."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    is_promo = F.col("p_type") == "PROMO"
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            r6(
                100.0 * F.sum(F.when(is_promo, rev)) / F.sum(rev),
                "promo_share_pct",
            ),
            F.count("*").alias("n_items"),
            F.sum(F.when(is_promo, 1).otherwise(0)).alias("n_promo_items"),
        )
    )


# ---------------------------------------------------------------------------
# Q16 shape: NOT IN null-aware anti join + grouped distinct count
# ---------------------------------------------------------------------------


@register(
    "q_supplier_diversity",
    """
SELECT p.p_brand, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS n_suppliers
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size <= 10
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_size
""",
    "tpch",
    "subquery",
)
def q_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per (brand, size) for
    small parts, EXCLUDING flagged suppliers via NOT IN — the null-aware
    anti-join form (semantically distinct from a plain anti join when the
    subquery could yield NULLs; s_suppkey is non-null here, so the
    exclusion is exact on both engines). Distinct counting expands to the
    two-phase (key, supp) dedup + count — both shuffles on the group key.

    Plan: date-free fact scan with the part dim broadcast, the flagged-
    supplier set broadcast for the anti join, one distinct-aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") <= 10)
    flagged = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(flagged),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("n_suppliers"))
    )
