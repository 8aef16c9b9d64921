"""Round-9: risk-adjusted performance, effect-size/variance statistics,
per-node graph structure, distributed PCA, nearest-neighbor temporal
join, and hashing-trick featurization —

- **Sharpe / Sortino** (per-symbol risk-adjusted return ratios from
  1-minute bar returns — the canonical performance report),
- **partial correlation** (quantity ↔ price controlling for discount,
  per return flag — the confound-removed dependence measure),
- **Cohen's d** (pooled-standard-deviation effect size of returned vs
  kept revenue — the practical-significance twin of the t-test),
- **Brown–Forsythe** (variance-homogeneity F on deviations from group
  MEDIANS — the robust Levene variant, the ANOVA precondition check),
- **Q-Q deciles** (urgent vs normal order-value quantiles side by side
  — the distribution-shift diagnostic behind every "did the mix
  change?" question),
- **Markov entropy rate** (per-state conditional entropy of the event
  transition chain, stationary-weighted — behavior predictability),
- **local clustering coefficient** (per-node triangle density on the
  part co-purchase graph via the degree-ordered edge iterator),
- **modularity by brand** (does the brand partition explain the
  co-purchase graph's edges? Newman Q per community),
- **PCA power iteration** (top principal component of the embedding
  covariance — three declarative mat-vec rounds over a dim²-sized
  matrix built in ONE corpus scan),
- **nearest-purchase join** (each browse event matched to its user's
  temporally NEAREST purchase, backward or forward — the symmetric
  generalization of the as-of join),
- **cross-sectional momentum** (rank symbols each hour by the previous
  hour's return; does rank predict the next return?),
- **feature hashing** (signed hashing-trick bag-of-words — the
  fixed-width featurizer streaming pipelines use when a vocabulary
  is too big to broadcast).

Registry conventions as everywhere (see registry.py): each query is a
(Spark builder, DuckDB oracle) pair via ``@register``; float outputs are
float32-canonicalized (r6/r6z) at the output boundary only; divisions
guard their denominators on BOTH engines (ANSI mode + the sf0.1
non-positive-price hazard class); graph queries reuse the memoized
co-purchase edge/degree tables so the expensive self-join is built once
per session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.hashing import md5_int32, md5_int32_sql
from .operators.bars import gold_bars_cut
from .registry import BARS_CTE, r6, r6z, register
from .registry_ext import EMB_CTE
from .registry_round3 import (
    _TRI_EDGES_SQL,
    copurchase_deg_cut,
    copurchase_edges_cut,
)
from .sources.tables import load_table

# ---------------------------------------------------------------------------
# Sharpe / Sortino ratios
# ---------------------------------------------------------------------------


@register(
    "q_sharpe_sortino",
    BARS_CTE
    + """
, rets AS (
  SELECT symbol,
         CASE WHEN lag("close") OVER w <> 0
              THEN "close" / lag("close") OVER w - 1 END AS ret
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY bar_start)
), s AS (
  SELECT symbol,
         count(*) AS n,
         avg(ret) AS mu,
         stddev_samp(ret) AS sd,
         sqrt(sum(CASE WHEN ret < 0 THEN ret * ret ELSE 0 END)
              / count(*)) AS dd
  FROM rets WHERE ret IS NOT NULL
  GROUP BY symbol
)
SELECT symbol,
       CAST(n AS BIGINT) AS n,
       CAST(CASE WHEN abs(mu) < 1e-6 THEN 0 ELSE mu END AS REAL) AS mean_ret,
       CAST(CASE WHEN sd > 0 THEN
            CASE WHEN abs(mu / sd) < 1e-6 THEN 0 ELSE mu / sd END
            END AS REAL) AS sharpe,
       CAST(CASE WHEN dd > 0 THEN
            CASE WHEN abs(mu / dd) < 1e-6 THEN 0 ELSE mu / dd END
            END AS REAL) AS sortino
FROM s
""",
    "quant",
    "agg",
)
def q_sharpe_sortino(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol Sharpe and Sortino ratios over 1-minute simple
    returns: mean return over total vs downside-only deviation — the
    pair of risk-adjusted performance numbers every strategy report
    leads with. Downside deviation is the root-mean-SQUARE of negative
    returns over ALL periods (the standard Sortino denominator).
    Returns guard lag(close) <> 0 on both engines (sf0.1 contains
    zero-price bars; the q_return_correlation hazard class). Ratios of
    near-cancelling sums are r6z-snapped.

    Scale: one symbol-partitioned window + one symbol agg — both share
    the gold-bars symbol exchange, so the query adds zero shuffles."""
    bars = gold_bars_cut(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("bar_start")
    prev = F.lag("close").over(w)
    rets = bars.select(
        "symbol",
        F.when(prev != 0, F.col("close") / prev - 1).alias("ret"),
    ).where(F.col("ret").isNotNull())
    s = rets.groupBy("symbol").agg(
        F.count("*").alias("n"),
        F.avg("ret").alias("mu"),
        F.stddev_samp("ret").alias("sd"),
        F.sqrt(
            F.sum(
                F.when(F.col("ret") < 0, F.col("ret") * F.col("ret"))
                .otherwise(F.lit(0.0))
            )
            / F.count("*")
        ).alias("dd"),
    )
    return s.select(
        "symbol",
        F.col("n").cast("long").alias("n"),
        r6z(F.col("mu"), "mean_ret"),
        r6z(F.when(F.col("sd") > 0, F.col("mu") / F.col("sd")), "sharpe"),
        r6z(F.when(F.col("dd") > 0, F.col("mu") / F.col("dd")), "sortino"),
    )


# ---------------------------------------------------------------------------
# Partial correlation
# ---------------------------------------------------------------------------


@register(
    "q_partial_corr",
    """
WITH m AS (
  SELECT l_returnflag,
         count(*) AS n,
         covar_samp(l_quantity, l_extendedprice) AS cxy,
         covar_samp(l_quantity, l_discount) AS cxz,
         covar_samp(l_extendedprice, l_discount) AS cyz,
         stddev_samp(l_quantity) AS sx,
         stddev_samp(l_extendedprice) AS sy,
         stddev_samp(l_discount) AS sz
  FROM lineitem GROUP BY l_returnflag
), r AS (
  SELECT l_returnflag, n,
         CASE WHEN sx > 0 AND sy > 0 THEN cxy / (sx * sy) END AS rxy,
         CASE WHEN sx > 0 AND sz > 0 THEN cxz / (sx * sz) END AS rxz,
         CASE WHEN sy > 0 AND sz > 0 THEN cyz / (sy * sz) END AS ryz
  FROM m
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n,
       CAST(CASE WHEN abs(rxy) < 1e-6 THEN 0 ELSE rxy END AS REAL) AS rxy,
       CAST(CASE WHEN (1 - rxz * rxz) * (1 - ryz * ryz) > 0 THEN
            CASE WHEN abs((rxy - rxz * ryz)
                 / sqrt((1 - rxz * rxz) * (1 - ryz * ryz))) < 1e-6 THEN 0
                 ELSE (rxy - rxz * ryz)
                      / sqrt((1 - rxz * rxz) * (1 - ryz * ryz)) END
            END AS REAL) AS partial_rxy_given_z
FROM r
""",
    "stats",
    "agg",
)
def q_partial_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial correlation of quantity and extended price CONTROLLING
    for discount, per return flag — the first-order confound removal
    behind 'is the quantity-price link real or discount-driven?'.
    Spelled from covariances and standard deviations (not F.corr) so
    every division is explicitly guarded — Spark's ANSI mode evaluates
    aggregates in all when() branches, the round-7 corr lesson.

    Scale: one grouped agg computing all six moments in a single pass;
    the partial-correlation algebra runs on a flags-sized table."""
    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.covar_samp("l_quantity", "l_extendedprice").alias("cxy"),
        F.covar_samp("l_quantity", "l_discount").alias("cxz"),
        F.covar_samp("l_extendedprice", "l_discount").alias("cyz"),
        F.stddev_samp("l_quantity").alias("sx"),
        F.stddev_samp("l_extendedprice").alias("sy"),
        F.stddev_samp("l_discount").alias("sz"),
    )
    rxy = F.when(
        (F.col("sx") > 0) & (F.col("sy") > 0),
        F.col("cxy") / (F.col("sx") * F.col("sy")),
    )
    rxz = F.when(
        (F.col("sx") > 0) & (F.col("sz") > 0),
        F.col("cxz") / (F.col("sx") * F.col("sz")),
    )
    ryz = F.when(
        (F.col("sy") > 0) & (F.col("sz") > 0),
        F.col("cyz") / (F.col("sy") * F.col("sz")),
    )
    r = m.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        rxy.alias("rxy"),
        rxz.alias("rxz"),
        ryz.alias("ryz"),
    )
    denom = (1 - F.col("rxz") * F.col("rxz")) * (
        1 - F.col("ryz") * F.col("ryz")
    )
    return r.select(
        "l_returnflag",
        "n",
        r6z(F.col("rxy"), "rxy"),
        r6z(
            F.when(
                denom > 0,
                (F.col("rxy") - F.col("rxz") * F.col("ryz"))
                / F.sqrt(denom),
            ),
            "partial_rxy_given_z",
        ),
    )


# ---------------------------------------------------------------------------
# Cohen's d effect size
# ---------------------------------------------------------------------------


@register(
    "q_cohens_d",
    """
WITH g AS (
  SELECT l_returnflag,
         count(*) AS n,
         avg(l_extendedprice) AS mu,
         var_samp(l_extendedprice) AS v
  FROM lineitem WHERE l_returnflag IN ('R', 'N')
  GROUP BY l_returnflag
), w AS (
  SELECT
    max(CASE WHEN l_returnflag = 'R' THEN n END) AS n1,
    max(CASE WHEN l_returnflag = 'N' THEN n END) AS n2,
    max(CASE WHEN l_returnflag = 'R' THEN mu END) AS mu1,
    max(CASE WHEN l_returnflag = 'N' THEN mu END) AS mu2,
    max(CASE WHEN l_returnflag = 'R' THEN v END) AS v1,
    max(CASE WHEN l_returnflag = 'N' THEN v END) AS v2
  FROM g
)
SELECT CAST(n1 AS BIGINT) AS n_returned,
       CAST(n2 AS BIGINT) AS n_kept,
       CAST(mu1 - mu2 AS REAL) AS mean_diff,
       CAST(CASE WHEN n1 + n2 > 2
                 AND ((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2) > 0
            THEN (mu1 - mu2)
                 / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2))
            END AS REAL) AS cohens_d
FROM w
""",
    "stats",
    "agg",
)
def q_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d of extended price between returned (R) and kept (N)
    line items: mean difference in pooled-standard-deviation units —
    the effect-size number a significance test (q_welch_ttest) should
    always ship with. The pooled variance is guarded > 0 so a
    degenerate constant-price fixture yields NULL, not NaN, on both
    engines.

    Scale: one filtered two-group agg, then scalar algebra on a
    one-row table (conditional-max pivot, no join)."""
    li = load_table(spark, sf_dir, "lineitem")
    g = (
        li.where(F.col("l_returnflag").isin("R", "N"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.avg("l_extendedprice").alias("mu"),
            F.var_samp("l_extendedprice").alias("v"),
        )
    )

    def pick(col: str, flag: str):
        return F.max(F.when(F.col("l_returnflag") == flag, F.col(col)))

    w = g.agg(
        pick("n", "R").alias("n1"),
        pick("n", "N").alias("n2"),
        pick("mu", "R").alias("mu1"),
        pick("mu", "N").alias("mu2"),
        pick("v", "R").alias("v1"),
        pick("v", "N").alias("v2"),
    )
    pooled = (
        (F.col("n1") - 1) * F.col("v1") + (F.col("n2") - 1) * F.col("v2")
    ) / (F.col("n1") + F.col("n2") - 2)
    return w.select(
        F.col("n1").cast("long").alias("n_returned"),
        F.col("n2").cast("long").alias("n_kept"),
        r6(F.col("mu1") - F.col("mu2"), "mean_diff"),
        r6(
            F.when(
                (F.col("n1") + F.col("n2") > 2) & (pooled > 0),
                (F.col("mu1") - F.col("mu2")) / F.sqrt(pooled),
            ),
            "cohens_d",
        ),
    )


# ---------------------------------------------------------------------------
# Brown–Forsythe variance-homogeneity test
# ---------------------------------------------------------------------------


@register(
    "q_brown_forsythe",
    """
WITH med AS (
  SELECT o_orderpriority, median(o_totalprice) AS med
  FROM orders GROUP BY o_orderpriority
), z AS (
  SELECT o.o_orderpriority, abs(o.o_totalprice - m.med) AS z
  FROM orders o JOIN med m USING (o_orderpriority)
), g AS (
  SELECT o_orderpriority, count(*) AS n, sum(z) AS s1, sum(z * z) AS s2
  FROM z GROUP BY o_orderpriority
), tot AS (
  SELECT count(*) AS k, sum(n) AS nn, sum(s1) AS s1_all,
         sum(n * (s1 / n - (SELECT sum(s1) FROM g) / (SELECT sum(n) FROM g))
               * (s1 / n - (SELECT sum(s1) FROM g) / (SELECT sum(n) FROM g)))
           AS ssb,
         sum(s2 - s1 * s1 / n) AS ssw
  FROM g
)
SELECT CAST(k AS BIGINT) AS k_groups,
       CAST(nn AS BIGINT) AS n,
       CAST(CASE WHEN k > 1 AND nn > k AND ssw > 0
            THEN (ssb / (k - 1)) / (ssw / (nn - k)) END AS REAL) AS f_stat
FROM tot
""",
    "stats",
    "join",
)
def q_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe variance-homogeneity F across order priorities on
    order value: a one-way ANOVA on absolute deviations from each
    group's MEDIAN (robust to the heavy right tail that breaks plain
    Levene) — the precondition check before trusting q_anova_oneway.
    Sums of squares come from power sums; the F ratio guards SSW > 0.

    Scale: one grouped exact median (5 groups), broadcast back onto the
    fact scan (5-row dim join), one grouped power-sum agg, then scalar
    algebra — two passes over orders, no wide shuffle."""
    o = load_table(spark, sf_dir, "orders")
    med = o.groupBy("o_orderpriority").agg(
        F.median("o_totalprice").alias("med")
    )
    z = o.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority",
        F.abs(F.col("o_totalprice") - F.col("med")).alias("z"),
    )
    g = z.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum("z").alias("s1"),
        F.sum(F.col("z") * F.col("z")).alias("s2"),
    )
    # Grand mean folded in via a window-free second agg: everything
    # after g is a k-row table, so compute the grand mean with a scalar
    # subquery the same way the oracle does.
    gm = g.agg(
        (F.sum("s1") / F.sum("n")).alias("zbar")
    )
    tot = (
        g.crossJoin(F.broadcast(gm))
        .agg(
            F.count("*").alias("k"),
            F.sum("n").alias("nn"),
            F.sum(
                F.col("n")
                * (F.col("s1") / F.col("n") - F.col("zbar"))
                * (F.col("s1") / F.col("n") - F.col("zbar"))
            ).alias("ssb"),
            F.sum(
                F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")
            ).alias("ssw"),
        )
    )
    return tot.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("nn").cast("long").alias("n"),
        r6(
            F.when(
                (F.col("k") > 1) & (F.col("nn") > F.col("k")) & (F.col("ssw") > 0),
                (F.col("ssb") / (F.col("k") - 1))
                / (F.col("ssw") / (F.col("nn") - F.col("k"))),
            ),
            "f_stat",
        ),
    )


# ---------------------------------------------------------------------------
# Q-Q deciles
# ---------------------------------------------------------------------------


@register(
    "q_qq_deciles",
    """
WITH q AS (
  SELECT quantile_cont(o_totalprice,
                       [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
           FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
           AS qu,
         quantile_cont(o_totalprice,
                       [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
           FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
           AS qo
  FROM orders
)
SELECT CAST(d.decile AS BIGINT) AS decile,
       CAST(qu[d.decile] AS REAL) AS q_urgent,
       CAST(qo[d.decile] AS REAL) AS q_other,
       CAST(CASE WHEN qo[d.decile] <> 0
            THEN qu[d.decile] / qo[d.decile] END AS REAL) AS qq_ratio
FROM q, (SELECT unnest(range(1, 10)) AS decile) d
""",
    "stats",
    "distribution",
)
def q_qq_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-Q table: order-value deciles of urgent/high-priority orders
    against all other orders, plus their ratio — the
    quantile-by-quantile distribution comparison behind 'did priority
    shift the whole distribution or just the tail?'. Exact interpolated
    quantiles (both engines' quantile_cont).

    Scale: ONE aggregation computing both groups' nine deciles as two
    filtered percentile-array aggregates over a single scan (no
    per-decile fan-out; the cross join exists only on the oracle side
    where DuckDB needs a decile dimension row set)."""
    o = load_table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    fracs = F.array(*[F.lit(i / 10.0) for i in range(1, 10)])
    q = o.agg(
        F.percentile(
            F.when(urgent, F.col("o_totalprice")), fracs
        ).alias("qu"),
        F.percentile(
            F.when(~urgent, F.col("o_totalprice")), fracs
        ).alias("qo"),
    )
    exploded = q.select(
        F.posexplode(F.arrays_zip(F.col("qu"), F.col("qo")))
    ).select(
        (F.col("pos") + 1).cast("long").alias("decile"),
        F.col("col.qu").alias("q_urgent"),
        F.col("col.qo").alias("q_other"),
    )
    return exploded.select(
        "decile",
        r6(F.col("q_urgent"), "q_urgent"),
        r6(F.col("q_other"), "q_other"),
        r6(
            F.when(F.col("q_other") != 0, F.col("q_urgent") / F.col("q_other")),
            "qq_ratio",
        ),
    )


# ---------------------------------------------------------------------------
# Markov entropy rate
# ---------------------------------------------------------------------------


@register(
    "q_markov_entropy_rate",
    """
WITH s AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM events
), t AS (
  SELECT prev_type, next_type, count(*) AS cnt
  FROM s WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
), rows_h AS (
  SELECT prev_type,
         sum(cnt) AS row_n,
         -sum(cnt * ln(cnt)) AS neg_sum_clogc
  FROM t GROUP BY prev_type
), h AS (
  SELECT prev_type, row_n,
         ln(row_n) + neg_sum_clogc / row_n AS row_entropy
  FROM rows_h
)
SELECT prev_type,
       CAST(row_n AS BIGINT) AS n_transitions,
       CAST(row_n * 1.0 / (SELECT sum(row_n) FROM h) AS REAL) AS pi,
       CAST(CASE WHEN abs(row_entropy) < 1e-6 THEN 0 ELSE row_entropy END
            AS REAL) AS row_entropy,
       CAST(CASE WHEN abs(row_n * row_entropy /
                          (SELECT sum(row_n) FROM h)) < 1e-6 THEN 0
            ELSE row_n * row_entropy / (SELECT sum(row_n) FROM h) END
            AS REAL) AS entropy_contrib
FROM h
""",
    "analytics",
    "entropy",
)
def q_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy RATE of the event-type Markov chain: per current state,
    the conditional entropy of the next event weighted by the state's
    empirical frequency — how predictable user behavior is, state by
    state (the sum of entropy_contrib is the chain's entropy rate).
    Row entropy is spelled ln(n) − Σ c·ln(c)/n from integer counts, so
    both engines sum the same few exact-integer-argument logs instead
    of accumulating tiny p·ln p terms in different orders.

    Scale: the same one-window + one-count plan as
    q_markov_transitions; everything after the (prev, next) count is
    states²-sized."""
    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(wu).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    t = s.groupBy("prev_type", "next_type").agg(F.count("*").alias("cnt"))
    h = t.groupBy("prev_type").agg(
        F.sum("cnt").alias("row_n"),
        (-F.sum(F.col("cnt") * F.log(F.col("cnt")))).alias("neg_sum_clogc"),
    ).select(
        "prev_type",
        "row_n",
        (
            F.log(F.col("row_n")) + F.col("neg_sum_clogc") / F.col("row_n")
        ).alias("row_entropy"),
    )
    total = h.agg(F.sum("row_n").alias("tot"))
    return h.crossJoin(F.broadcast(total)).select(
        "prev_type",
        F.col("row_n").cast("long").alias("n_transitions"),
        r6(F.col("row_n") * 1.0 / F.col("tot"), "pi"),
        r6z(F.col("row_entropy"), "row_entropy"),
        r6z(
            F.col("row_n") * F.col("row_entropy") / F.col("tot"),
            "entropy_contrib",
        ),
    )


# ---------------------------------------------------------------------------
# Local clustering coefficient
# ---------------------------------------------------------------------------


@register(
    "q_local_clustering",
    "WITH "
    + _TRI_EDGES_SQL
    + """
, tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM edges e1
  JOIN edges e2 ON e2.u = e1.v
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
), tri_nodes AS (
  SELECT node, count(*) AS n_tri FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b AS node FROM tri
    UNION ALL SELECT c AS node FROM tri
  ) GROUP BY node
)
SELECT d.node AS node,
       CAST(d.d AS BIGINT) AS degree,
       CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_triangles,
       CAST(CASE WHEN d.d >= 2
            THEN 2.0 * coalesce(t.n_tri, 0) / (d.d * (d.d - 1)) END
            AS REAL) AS clustering_coeff
FROM deg d LEFT JOIN tri_nodes t ON t.node = d.node
""",
    "graph",
    "join",
)
def q_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient of the part co-purchase
    graph: 2·T(v) / (d(v)·(d(v)−1)) — how much of each node's
    neighborhood is itself connected, the node-level dual of
    q_triangle_count's global transitivity (same memoized edge/degree
    tables, same degree-ordered orientation).

    The Spark plan extends the edge-iterator intersection: instead of
    counting |N⁺(u) ∩ N⁺(v)| per pivot edge, it EXPLODES the
    intersection elements, so each triangle (u, v, w) appears exactly
    once and credits all three corners via a 3-way unpivot + node
    count. Work stays O(m^1.5) with per-key output bounded by the
    orientation (√(2m) adjacency rows); the oracle reaches the same
    per-node counts from the id-ordered 3-way self-join. Degree-1
    nodes yield NULL (coefficient undefined), pinned on both engines.
    """
    from .extensions.dedup import _cut_lineage

    edges = copurchase_edges_cut(spark, sf_dir)
    deg = copurchase_deg_cut(spark, sf_dir)
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    # Node-sized degree table vs m-sized edge list: broadcast when it
    # fits — q_triangle_count's size dispatch, same memoized statistic.
    import os as _os

    from .extensions.dedup import memo_scalar as _memo_scalar

    if _memo_scalar(
        spark,
        f"copurchase_n_nodes:{sf_dir}",
        lambda: copurchase_deg_cut(spark, sf_dir).count(),
    ) <= int(_os.environ.get("SPARK_GRAFT_LPA_BROADCAST_MAX_NODES", 10**7)):
        du, dv = F.broadcast(du), F.broadcast(dv)
    withdeg = edges.join(du, "u").join(dv, "v")
    uk = F.struct(F.col("du"), F.col("u"))
    vk = F.struct(F.col("dv"), F.col("v"))
    directed = withdeg.select(
        F.when(uk < vk, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(uk < vk, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    directed = _cut_lineage(directed, partition_by=("src",))
    adj = directed.groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("nbrs")
    )
    au = adj.select(F.col("src").alias("a_u"), F.col("nbrs").alias("nu"))
    av = adj.select(F.col("src").alias("a_v"), F.col("nbrs").alias("nv"))
    # ONE pass emits all three corners of each triangle: the previous
    # 3-way unionAll of projections re-executed the whole wedge-join +
    # intersect subplan per corner (Spark re-runs shared subplans per
    # reference — no exchange boundary to reuse here), tripling the
    # O(m^1.5) intersection work. flatten(transform(∩, w → [u, v, w]))
    # yields the identical node multiset in a single wedge pass:
    # measured 4.8 s → 2.9 s warm min-of-3 at sf0.1/local[32] (with the
    # degree broadcast above), counts unchanged.
    tri_nodes = (
        directed.join(au, directed["src"] == au["a_u"])
        .join(av, directed["dst"] == av["a_v"])
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.array_intersect("nu", "nv"),
                        lambda w: F.array(F.col("src"), F.col("dst"), w),
                    )
                )
            ).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").alias("n_tri"))
    )
    out = deg.join(tri_nodes, "node", "left")
    n_tri = F.coalesce(F.col("n_tri"), F.lit(0))
    return out.select(
        "node",
        F.col("d").cast("long").alias("degree"),
        n_tri.cast("long").alias("n_triangles"),
        r6(
            F.when(
                F.col("d") >= 2,
                2.0 * n_tri / (F.col("d") * (F.col("d") - 1)),
            ),
            "clustering_coeff",
        ),
    )


# ---------------------------------------------------------------------------
# Modularity of the brand partition
# ---------------------------------------------------------------------------


@register(
    "q_modularity_brand",
    "WITH "
    + _TRI_EDGES_SQL
    + """
, node_comm AS (
  SELECT d.node, p.p_brand AS comm, d.d
  FROM deg d JOIN part p ON p.p_partkey = d.node
), m AS (
  SELECT count(*) AS m_edges FROM edges
), internal AS (
  SELECT cu.comm, count(*) AS e_in
  FROM edges e
  JOIN node_comm cu ON cu.node = e.u
  JOIN node_comm cv ON cv.node = e.v
  WHERE cu.comm = cv.comm
  GROUP BY cu.comm
), by_comm AS (
  SELECT comm, count(*) AS n_nodes, sum(d) AS d_sum
  FROM node_comm GROUP BY comm
)
SELECT b.comm AS brand,
       CAST(b.n_nodes AS BIGINT) AS n_nodes,
       CAST(coalesce(i.e_in, 0) AS BIGINT) AS internal_edges,
       CAST(b.d_sum AS BIGINT) AS degree_sum,
       CAST(coalesce(i.e_in, 0) * 1.0 / m.m_edges
            - (b.d_sum * 1.0 / (2 * m.m_edges))
              * (b.d_sum * 1.0 / (2 * m.m_edges)) AS REAL) AS q_contrib
FROM by_comm b
LEFT JOIN internal i ON i.comm = b.comm
CROSS JOIN m
""",
    "graph",
    "agg",
)
def q_modularity_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the BRAND partition over the part
    co-purchase graph: per brand, (internal-edge share) − (expected
    share from degree sums)² — does the catalog's brand structure
    explain who gets bought together? (Σ q_contrib is the partition's
    modularity Q.) Reuses the memoized edge/degree tables; the brand
    lookup is a broadcast dimension join on both edge endpoints.

    Scale: edges join a node→community map (broadcastable dimension);
    everything after the two keyed lookups is communities-sized. The
    same plan scores ANY label column — this instantiates it with a
    ground-truth-style partition instead of label-prop output so the
    oracle stays a pure join-agg (the label-prop twin's 2-round
    semantics is already oracle-pinned by q_label_prop_communities).
    """
    edges = copurchase_edges_cut(spark, sf_dir)
    deg = copurchase_deg_cut(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("node"), F.col("p_brand").alias("comm")
    )
    node_comm = deg.join(F.broadcast(part), "node").select(
        "node", "comm", "d"
    )
    m = edges.agg(F.count("*").alias("m_edges"))
    nc_u = node_comm.select(F.col("node").alias("u"), F.col("comm").alias("cu"))
    nc_v = node_comm.select(F.col("node").alias("v"), F.col("comm").alias("cv"))
    internal = (
        edges.join(F.broadcast(nc_u), "u")
        .join(F.broadcast(nc_v), "v")
        .where(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("comm"))
        .agg(F.count("*").alias("e_in"))
    )
    by_comm = node_comm.groupBy("comm").agg(
        F.count("*").alias("n_nodes"), F.sum("d").alias("d_sum")
    )
    out = (
        by_comm.join(internal, "comm", "left")
        .crossJoin(F.broadcast(m))
    )
    e_in = F.coalesce(F.col("e_in"), F.lit(0))
    exp_share = F.col("d_sum") * 1.0 / (2 * F.col("m_edges"))
    return out.select(
        F.col("comm").alias("brand"),
        F.col("n_nodes").cast("long").alias("n_nodes"),
        e_in.cast("long").alias("internal_edges"),
        F.col("d_sum").cast("long").alias("degree_sum"),
        r6(
            e_in * 1.0 / F.col("m_edges") - exp_share * exp_share,
            "q_contrib",
        ),
    )


# ---------------------------------------------------------------------------
# PCA top component via power iteration
# ---------------------------------------------------------------------------


@register(
    "q_pca_power_iteration",
    """
WITH x AS MATERIALIZED (
  SELECT vec_id,
         unnest(range(1, len(embedding) + 1)) AS i,
         unnest(embedding) AS xi
  FROM embeddings
), cov_half AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j,
         (sum(a.xi * b.xi) - sum(a.xi) * sum(b.xi) / count(*))
           / count(*) AS c
  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY a.i, b.i
), cov AS MATERIALIZED (
  SELECT i, j, c FROM cov_half
  UNION ALL
  SELECT j AS i, i AS j, c FROM cov_half WHERE i <> j
), it1 AS MATERIALIZED (
  SELECT i, sum(c) AS y FROM cov GROUP BY i
), n1 AS MATERIALIZED (SELECT sqrt(sum(y * y)) AS nrm FROM it1),
v1 AS MATERIALIZED (
  SELECT i, CASE WHEN nrm > 0 THEN y / nrm END AS xv FROM it1, n1
), it2 AS MATERIALIZED (
  SELECT cov.i, sum(cov.c * v1.xv) AS y
  FROM cov JOIN v1 ON v1.i = cov.j GROUP BY cov.i
), n2 AS MATERIALIZED (SELECT sqrt(sum(y * y)) AS nrm FROM it2),
v2 AS MATERIALIZED (
  SELECT i, CASE WHEN nrm > 0 THEN y / nrm END AS xv FROM it2, n2
), it3 AS MATERIALIZED (
  SELECT cov.i, sum(cov.c * v2.xv) AS y
  FROM cov JOIN v2 ON v2.i = cov.j GROUP BY cov.i
), lam AS MATERIALIZED (
  SELECT sum(v2.xv * it3.y) AS lambda FROM v2 JOIN it3 ON it3.i = v2.i
), n3 AS MATERIALIZED (SELECT sqrt(sum(y * y)) AS nrm FROM it3)
SELECT CAST(it3.i AS BIGINT) AS dim,
       CAST(CASE WHEN n3.nrm > 0 THEN
            CASE WHEN abs(it3.y / n3.nrm) < 1e-6 THEN 0
                 ELSE it3.y / n3.nrm END
            END AS REAL) AS loading,
       CAST(lam.lambda AS REAL) AS eigenvalue,
       CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_vectors
FROM it3, lam, n3
""",
    "ml",
    "linalg",
)
def q_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding covariance by THREE
    declarative power-iteration rounds: build C = (Σxxᵀ − μμᵀn)/n from
    ONE corpus pass (pairwise power sums over the exploded coordinates,
    i ≤ j half then mirrored), start from the all-ones vector, and chain
    normalize(C·v) three times as dim²-row join-aggregates. Output: the
    unit loading vector and the Rayleigh eigenvalue λ = v₂ᵀ(C·v₂).
    Deterministic (fixed start, no RNG); the dominant-eigenvector sign
    is pinned by the start vector's projection on both engines.

    Scale: the ONLY data-sized stage is the covariance build — exploded
    coordinates self-joined per vec_id (bounded fan-out d² per vector,
    map-side combinable to d² cells). Every iteration is a join-agg on
    the dim²-row matrix (4096 rows at d=64) against a d-row vector —
    broadcast-sized regardless of corpus size, which is exactly why
    power iteration is the distributed way to take one eigenvector at
    100 TB (the corpus is touched once; iterations touch only C). The
    matrix is lineage-cut so the three rounds reuse one build."""
    from .extensions.dedup import _cut_lineage

    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id", F.posexplode("embedding").alias("i0", "xi")
    ).select("vec_id", (F.col("i0") + 1).alias("i"), "xi")
    a = x.alias("a")
    b = x.alias("b")
    cov_half = (
        a.join(
            b,
            (F.col("a.vec_id") == F.col("b.vec_id"))
            & (F.col("a.i") <= F.col("b.i")),
        )
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(
            (
                (
                    F.sum(F.col("a.xi") * F.col("b.xi"))
                    - F.sum(F.col("a.xi")) * F.sum(F.col("b.xi")) / F.count("*")
                )
                / F.count("*")
            ).alias("c")
        )
    )
    cov = cov_half.unionAll(
        cov_half.where(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), F.col("c")
        )
    )
    # The three mat-vec rounds each reference the matrix; cut it once so
    # the expensive corpus-side build runs exactly once per execution.
    cov = _cut_lineage(cov, partition_by=("j",))

    def normalize(it: DataFrame) -> DataFrame:
        nrm = it.agg(F.sqrt(F.sum(F.col("y") * F.col("y"))).alias("nrm"))
        return it.crossJoin(F.broadcast(nrm)).select(
            "i",
            F.when(F.col("nrm") > 0, F.col("y") / F.col("nrm")).alias("xv"),
        )

    it1 = cov.groupBy("i").agg(F.sum("c").alias("y"))  # C · ones
    v1 = normalize(it1)
    it2 = (
        cov.join(F.broadcast(v1.select(F.col("i").alias("j"), "xv")), "j")
        .groupBy("i")
        .agg(F.sum(F.col("c") * F.col("xv")).alias("y"))
    )
    v2 = normalize(it2)
    it3 = (
        cov.join(F.broadcast(v2.select(F.col("i").alias("j"), "xv")), "j")
        .groupBy("i")
        .agg(F.sum(F.col("c") * F.col("xv")).alias("y"))
    )
    lam = (
        v2.join(it3, "i")
        .agg(F.sum(F.col("xv") * F.col("y")).alias("lambda"))
    )
    n3 = it3.agg(F.sqrt(F.sum(F.col("y") * F.col("y"))).alias("nrm"))
    n_vec = emb.agg(F.count("*").alias("n_vectors"))
    return (
        it3.crossJoin(F.broadcast(lam))
        .crossJoin(F.broadcast(n3))
        .crossJoin(F.broadcast(n_vec))
        .select(
            F.col("i").cast("long").alias("dim"),
            r6z(
                F.when(F.col("nrm") > 0, F.col("y") / F.col("nrm")),
                "loading",
            ),
            r6(F.col("lambda"), "eigenvalue"),
            F.col("n_vectors").cast("long").alias("n_vectors"),
        )
    )


# ---------------------------------------------------------------------------
# Nearest-purchase temporal join
# ---------------------------------------------------------------------------


@register(
    "q_nearest_purchase",
    """
WITH s AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS t,
         last_value(CASE WHEN event_type = 'purchase'
                         THEN CAST(floor(epoch(ts)) AS BIGINT) END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS prev_p,
         first_value(CASE WHEN event_type = 'purchase'
                          THEN CAST(floor(epoch(ts)) AS BIGINT) END
                     IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS next_p
  FROM events
)
SELECT event_id,
       user_id,
       CAST(CASE
         WHEN prev_p IS NOT NULL AND
              (next_p IS NULL OR t - prev_p <= next_p - t) THEN prev_p
         ELSE next_p END AS BIGINT) AS nearest_purchase_t,
       CAST(CASE
         WHEN prev_p IS NOT NULL AND
              (next_p IS NULL OR t - prev_p <= next_p - t) THEN t - prev_p
         ELSE next_p - t END AS BIGINT) AS gap_s,
       CASE
         WHEN prev_p IS NOT NULL AND
              (next_p IS NULL OR t - prev_p <= next_p - t) THEN 'backward'
         ELSE 'forward' END AS direction
FROM s
WHERE event_type <> 'purchase'
  AND (prev_p IS NOT NULL OR next_p IS NOT NULL)
""",
    "temporal",
    "window",
)
def q_nearest_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric as-of join: every non-purchase event matched to its
    user's temporally NEAREST purchase, looking BOTH directions (the
    backward-only as-of join is q_asof_join; attribution wants
    whichever side is closer). Spelled as one ordered pass per user —
    carry the last purchase time forward (last_value IGNORE NULLS over
    the preceding frame) and the next purchase time backward
    (first_value over the following frame), then pick the nearer, ties
    to the earlier (backward) side. Distances are whole-second epochs
    on both engines (ts.cast(long) ≡ floor(epoch(ts)), the repo's
    timestamp-gap convention).

    Scale: NO join at all — two frames over one user_id window, both
    sharing a single exchange; this is the plan shape that wins over
    the naive events×purchases range join, whose per-user fan-out is
    views × purchases."""
    ev = load_table(spark, sf_dir, "events")
    t = F.col("ts").cast("long")
    pt = F.when(F.col("event_type") == "purchase", t)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    s = ev.select(
        "event_id",
        "user_id",
        "event_type",
        t.alias("t"),
        F.last(pt, ignorenulls=True).over(back).alias("prev_p"),
        F.first(pt, ignorenulls=True).over(fwd).alias("next_p"),
    )
    take_prev = F.col("prev_p").isNotNull() & (
        F.col("next_p").isNull()
        | (F.col("t") - F.col("prev_p") <= F.col("next_p") - F.col("t"))
    )
    return (
        s.where(
            (F.col("event_type") != "purchase")
            & (F.col("prev_p").isNotNull() | F.col("next_p").isNotNull())
        )
        .select(
            "event_id",
            "user_id",
            F.when(take_prev, F.col("prev_p"))
            .otherwise(F.col("next_p"))
            .cast("long")
            .alias("nearest_purchase_t"),
            F.when(take_prev, F.col("t") - F.col("prev_p"))
            .otherwise(F.col("next_p") - F.col("t"))
            .cast("long")
            .alias("gap_s"),
            F.when(take_prev, F.lit("backward"))
            .otherwise(F.lit("forward"))
            .alias("direction"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-sectional momentum
# ---------------------------------------------------------------------------


@register(
    "q_xsection_momentum",
    BARS_CTE
    + """
, hourly AS (
  SELECT symbol,
         date_trunc('hour', bar_start) AS hr,
         arg_min("open", bar_start) AS first_open,
         arg_max("close", bar_start) AS last_close
  FROM bars GROUP BY symbol, date_trunc('hour', bar_start)
), rets AS (
  SELECT symbol, hr,
         CASE WHEN first_open <> 0
              THEN last_close / first_open - 1 END AS ret
  FROM hourly
), with_prev AS (
  SELECT symbol, hr, ret,
         lag(ret) OVER (PARTITION BY symbol ORDER BY hr) AS prev_ret
  FROM rets
), ranked AS (
  SELECT symbol, hr, ret, prev_ret,
         row_number() OVER (
           PARTITION BY hr
           ORDER BY prev_ret DESC NULLS LAST, symbol) AS mom_rank,
         count(*) OVER (PARTITION BY hr) AS n_symbols
  FROM with_prev
)
SELECT CAST(mom_rank AS BIGINT) AS mom_rank,
       CAST(count(*) AS BIGINT) AS n_obs,
       CAST(CASE WHEN abs(avg(ret)) < 1e-6 THEN 0 ELSE avg(ret) END AS REAL)
         AS avg_fwd_ret,
       CAST(CASE WHEN abs(avg(prev_ret)) < 1e-6 THEN 0 ELSE avg(prev_ret)
            END AS REAL) AS avg_prev_ret
FROM ranked
WHERE prev_ret IS NOT NULL AND ret IS NOT NULL
  AND n_symbols = (SELECT count(DISTINCT symbol) FROM rets)
GROUP BY mom_rank
""",
    "quant",
    "window",
)
def q_xsection_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-sectional momentum check: each hour, rank symbols by the
    PREVIOUS hour's return (1 = strongest), then average the CURRENT
    hour's return per rank — does last hour's winner keep winning?
    Hours missing any symbol are excluded so ranks always span the full
    cross-section; ties and NULL prev-returns are pinned (DESC NULLS
    LAST, then symbol). Returns guard first_open <> 0 (the sf0.1
    zero-price hazard).

    Scale: one (symbol, hour) agg over bars, one symbol-window lag, one
    hour-window rank — the rank's partition count is the number of
    hours and its width the symbol cross-section, never data-sized."""
    bars = gold_bars_cut(spark, sf_dir)
    hourly = bars.groupBy(
        "symbol", F.date_trunc("hour", "bar_start").alias("hr")
    ).agg(
        F.min_by("open", "bar_start").alias("first_open"),
        F.max_by("close", "bar_start").alias("last_close"),
    )
    rets = hourly.select(
        "symbol",
        "hr",
        F.when(
            F.col("first_open") != 0,
            F.col("last_close") / F.col("first_open") - 1,
        ).alias("ret"),
    )
    ws = Window.partitionBy("symbol").orderBy("hr")
    with_prev = rets.withColumn("prev_ret", F.lag("ret").over(ws))
    wh = Window.partitionBy("hr").orderBy(
        F.col("prev_ret").desc_nulls_last(), F.col("symbol")
    )
    ranked = with_prev.select(
        "symbol",
        "hr",
        "ret",
        "prev_ret",
        F.row_number().over(wh).alias("mom_rank"),
        F.count("*").over(Window.partitionBy("hr")).alias("n_symbols"),
    )
    n_all = rets.agg(
        F.countDistinct("symbol").alias("n_sym_all")
    )
    return (
        ranked.crossJoin(F.broadcast(n_all))
        .where(
            F.col("prev_ret").isNotNull()
            & F.col("ret").isNotNull()
            & (F.col("n_symbols") == F.col("n_sym_all"))
        )
        .groupBy(F.col("mom_rank").cast("long").alias("mom_rank"))
        .agg(
            F.count("*").cast("long").alias("n_obs"),
            r6z(F.avg("ret"), "avg_fwd_ret"),
            r6z(F.avg("prev_ret"), "avg_prev_ret"),
        )
    )


# ---------------------------------------------------------------------------
# Feature hashing (hashing trick)
# ---------------------------------------------------------------------------

#: Feature-vector width for the hashing trick (2^6 keeps the oracle's
#: output compact while exercising real modular bucketing).
FH_DIM = 64


@register(
    "q_feature_hashing",
    f"""
WITH words AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
  FROM documents
), hashed AS (
  SELECT w,
         {md5_int32_sql("w")} % {FH_DIM} AS bucket,
         CASE WHEN substr(md5(w), 9, 1)
              IN ('0','1','2','3','4','5','6','7')
              THEN 1 ELSE -1 END AS sign
  FROM words WHERE w <> ''
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(sum(sign) AS BIGINT) AS signed_sum,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT w) AS BIGINT) AS n_distinct_words
FROM hashed GROUP BY bucket
""",
    "llm",
    "featurize",
)
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed hashing-trick featurization (Weinberger et al. 2009): every
    token maps to one of {FH_DIM} buckets by hash, with a second hash
    bit choosing ±1 so collisions cancel in expectation — the
    fixed-width bag-of-words featurizer a streaming pipeline uses when
    the vocabulary is unbounded or too big to broadcast. Output is the
    corpus-level feature vector plus per-bucket token/vocabulary loads
    (the collision audit). Hashes are md5-prefix-derived so both
    engines bucket identically (the repo's portable-hash convention;
    xxhash64 exists only on the Spark side).

    Scale: explode → map-side-combinable agg on {FH_DIM} keys; the
    distinct-word count per bucket is the only part that carries words
    through the shuffle, and it is bounded by vocabulary, not corpus,
    size after partial aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        ).alias("w")
    ).where(F.col("w") != "")
    md5_9 = F.substring(F.md5(F.col("w").cast("binary")), 9, 1)
    hashed = words.select(
        "w",
        (md5_int32(F.col("w")) % FH_DIM).alias("bucket"),
        F.when(
            md5_9.isin(*"01234567"), F.lit(1)
        ).otherwise(F.lit(-1)).alias("sign"),
    )
    return hashed.groupBy(F.col("bucket").cast("long").alias("bucket")).agg(
        F.sum("sign").cast("long").alias("signed_sum"),
        F.count("*").cast("long").alias("n_tokens"),
        F.countDistinct("w").cast("long").alias("n_distinct_words"),
    )


# ---------------------------------------------------------------------------
# Multiple linear regression (closed form, 2 features + intercept)
# ---------------------------------------------------------------------------


@register(
    "q_multiple_regression",
    """
WITH m AS (
  SELECT count(*) AS n,
         sum(l_quantity) AS sx1, sum(l_discount) AS sx2,
         sum(l_extendedprice) AS sy,
         sum(l_quantity * l_quantity) AS sx1x1,
         sum(l_quantity * l_discount) AS sx1x2,
         sum(l_discount * l_discount) AS sx2x2,
         sum(l_quantity * l_extendedprice) AS sx1y,
         sum(l_discount * l_extendedprice) AS sx2y,
         sum(l_extendedprice * l_extendedprice) AS syy
  FROM lineitem
), solve AS (
  SELECT n, sy,
         -- normal equations A*beta = b with A = [[n,sx1,sx2],
         -- [sx1,sx1x1,sx1x2],[sx2,sx1x2,sx2x2]], b = [sy,sx1y,sx2y];
         -- solved by the adjugate (cofactor) inverse.
         (sx1x1 * sx2x2 - sx1x2 * sx1x2) AS c00,
         -(sx1 * sx2x2 - sx1x2 * sx2) AS c01,
         (sx1 * sx1x2 - sx1x1 * sx2) AS c02,
         -(sx1 * sx2x2 - sx2 * sx1x2) AS c10,
         (n * sx2x2 - sx2 * sx2) AS c11,
         -(n * sx1x2 - sx1 * sx2) AS c12,
         (sx1 * sx1x2 - sx2 * sx1x1) AS c20,
         -(n * sx1x2 - sx2 * sx1) AS c21,
         (n * sx1x1 - sx1 * sx1) AS c22,
         n * (sx1x1 * sx2x2 - sx1x2 * sx1x2)
           - sx1 * (sx1 * sx2x2 - sx1x2 * sx2)
           + sx2 * (sx1 * sx1x2 - sx1x1 * sx2) AS det,
         sx1y, sx2y, syy
  FROM m
), beta AS (
  SELECT n, sy, syy,
         (c00 * sy + c01 * sx1y + c02 * sx2y) / det AS b0,
         (c10 * sy + c11 * sx1y + c12 * sx2y) / det AS b1,
         (c20 * sy + c21 * sx1y + c22 * sx2y) / det AS b2,
         det
  FROM solve WHERE det <> 0
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(b0 AS REAL) AS beta0,
       CAST(b1 AS REAL) AS beta_quantity,
       CAST(b2 AS REAL) AS beta_discount
FROM beta
""",
    "ml",
    "regression",
)
def q_multiple_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple linear regression — extended price on quantity AND
    discount with intercept — solved in CLOSED FORM from one pass of
    power sums (normal equations, 3×3 adjugate inverse). The
    multi-feature upgrade of q_regression's single-feature OLS: at any
    scale the data is touched once and the algebra runs on a 1-row
    moment table, which is exactly how distributed OLS should be
    spelled (the Gram matrix is the sufficient statistic).

    Both engines evaluate the identical cofactor expressions from the
    identical sums, so agreement is limited only by float ulps
    (r6-collapsed at the boundary)."""
    li = load_table(spark, sf_dir, "lineitem")
    x1, x2, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    m = li.agg(
        F.count("*").alias("n"),
        F.sum(x1).alias("sx1"),
        F.sum(x2).alias("sx2"),
        F.sum(y).alias("sy"),
        F.sum(x1 * x1).alias("sx1x1"),
        F.sum(x1 * x2).alias("sx1x2"),
        F.sum(x2 * x2).alias("sx2x2"),
        F.sum(x1 * y).alias("sx1y"),
        F.sum(x2 * y).alias("sx2y"),
        F.sum(y * y).alias("syy"),
    )
    n, sx1, sx2 = F.col("n"), F.col("sx1"), F.col("sx2")
    sx1x1, sx1x2, sx2x2 = F.col("sx1x1"), F.col("sx1x2"), F.col("sx2x2")
    sy, sx1y, sx2y = F.col("sy"), F.col("sx1y"), F.col("sx2y")
    c00 = sx1x1 * sx2x2 - sx1x2 * sx1x2
    c01 = -(sx1 * sx2x2 - sx1x2 * sx2)
    c02 = sx1 * sx1x2 - sx1x1 * sx2
    c10 = -(sx1 * sx2x2 - sx2 * sx1x2)
    c11 = n * sx2x2 - sx2 * sx2
    c12 = -(n * sx1x2 - sx1 * sx2)
    c20 = sx1 * sx1x2 - sx2 * sx1x1
    c21 = -(n * sx1x2 - sx2 * sx1)
    c22 = n * sx1x1 - sx1 * sx1
    det = n * c00 + sx1 * c01 + sx2 * c02
    solved = m.where(det != 0).select(
        F.col("n").cast("long").alias("n"),
        r6((c00 * sy + c01 * sx1y + c02 * sx2y) / det, "beta0"),
        r6((c10 * sy + c11 * sx1y + c12 * sx2y) / det, "beta_quantity"),
        r6((c20 * sy + c21 * sx1y + c22 * sx2y) / det, "beta_discount"),
    )
    return solved


# ---------------------------------------------------------------------------
# Logistic regression via IRLS / Newton (2 iterations, declarative)
# ---------------------------------------------------------------------------


@register(
    "q_irls_logistic",
    """
WITH base AS (
  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1.0 ELSE 0.0 END AS y,
         o_totalprice AS raw_x
  FROM orders
), std AS (
  SELECT avg(raw_x) AS mu, stddev_samp(raw_x) AS sd FROM base
), d AS MATERIALIZED (
  SELECT y, (raw_x - std.mu) / std.sd AS x FROM base, std WHERE std.sd > 0
),
-- Newton iteration 1 from beta = (0, 0): p = 0.5, w = 0.25 for every
-- row, so H and the gradient are plain moments.
it1 AS MATERIALIZED (
  SELECT count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx,
         sum(y - 0.5) AS g0, sum((y - 0.5) * x) AS g1
  FROM d
), b1 AS MATERIALIZED (
  SELECT n,
         (0.25 * sxx * g0 - 0.25 * sx * g1)
           / (0.25 * n * 0.25 * sxx - 0.25 * sx * 0.25 * sx) AS b0,
         (0.25 * n * g1 - 0.25 * sx * g0)
           / (0.25 * n * 0.25 * sxx - 0.25 * sx * 0.25 * sx) AS b1
  FROM it1
),
-- Newton iteration 2 at beta = (b0, b1): one more scan, per-row sigmoid.
it2 AS MATERIALIZED (
  SELECT b1.n AS n, b1.b0 AS b0p, b1.b1 AS b1p,
         sum(pw.w) AS h00, sum(pw.w * pw.x) AS h01,
         sum(pw.w * pw.x * pw.x) AS h11,
         sum(pw.r) AS g0, sum(pw.r * pw.x) AS g1
  FROM b1, (
    SELECT d.x,
           1.0 / (1.0 + exp(-(b1.b0 + b1.b1 * d.x))) AS p,
           (1.0 / (1.0 + exp(-(b1.b0 + b1.b1 * d.x))))
             * (1.0 - 1.0 / (1.0 + exp(-(b1.b0 + b1.b1 * d.x)))) AS w,
           d.y - 1.0 / (1.0 + exp(-(b1.b0 + b1.b1 * d.x))) AS r
    FROM d, b1
  ) pw
  GROUP BY b1.n, b1.b0, b1.b1
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(CASE WHEN h00 * h11 - h01 * h01 <> 0 THEN
         CASE WHEN abs(b0p + (h11 * g0 - h01 * g1)
              / (h00 * h11 - h01 * h01)) < 1e-6 THEN 0
         ELSE b0p + (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01) END
         END AS REAL) AS beta0,
       CAST(CASE WHEN h00 * h11 - h01 * h01 <> 0 THEN
         CASE WHEN abs(b1p + (h00 * g1 - h01 * g0)
              / (h00 * h11 - h01 * h01)) < 1e-6 THEN 0
         ELSE b1p + (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01) END
         END AS REAL) AS beta1
FROM it2
""",
    "ml",
    "iterative",
)
def q_irls_logistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression (is the order high-priority? ~ standardized
    order value) trained IN-ENGINE by two Newton/IRLS steps, fully
    declaratively: each iteration is ONE scan that aggregates the 2×2
    Hessian and gradient moments, and the solve is closed-form algebra
    on a 1-row table — the canonical distributed GLM shape (the
    per-iteration sufficient statistic is k×k, broadcast back onto the
    next scan; no collect, no driver loop). Iteration 1 starts at
    β = 0 where the sigmoid is constant 0.5, so its moments are plain
    sums; iteration 2 recomputes per-row sigmoids at the new β via a
    broadcast 1-row join.

    Both engines run the identical algebra; exp() ulp drift across
    150k-row sums is collapsed by the float32 boundary (r6z)."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1.0)
        )
        .otherwise(F.lit(0.0))
        .alias("y"),
        F.col("o_totalprice").alias("raw_x"),
    )
    std = base.agg(
        F.avg("raw_x").alias("mu"), F.stddev_samp("raw_x").alias("sd")
    )
    d = (
        base.crossJoin(F.broadcast(std))
        .where(F.col("sd") > 0)
        .select("y", ((F.col("raw_x") - F.col("mu")) / F.col("sd")).alias("x"))
    )
    it1 = d.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") - 0.5).alias("g0"),
        F.sum((F.col("y") - 0.5) * F.col("x")).alias("g1"),
    )
    det1 = 0.25 * F.col("n") * 0.25 * F.col("sxx") - 0.25 * F.col("sx") * 0.25 * F.col("sx")
    b1 = it1.select(
        F.col("n"),
        ((0.25 * F.col("sxx") * F.col("g0") - 0.25 * F.col("sx") * F.col("g1")) / det1).alias("b0"),
        ((0.25 * F.col("n") * F.col("g1") - 0.25 * F.col("sx") * F.col("g0")) / det1).alias("b1"),
    )
    p = 1.0 / (1.0 + F.exp(-(F.col("b0") + F.col("b1") * F.col("x"))))
    pw = d.crossJoin(F.broadcast(b1)).select(
        "x",
        F.col("n"),
        F.col("b0").alias("b0p"),
        F.col("b1").alias("b1p"),
        (p * (1.0 - p)).alias("w"),
        (F.col("y") - p).alias("r"),
    )
    it2 = pw.groupBy("n", "b0p", "b1p").agg(
        F.sum("w").alias("h00"),
        F.sum(F.col("w") * F.col("x")).alias("h01"),
        F.sum(F.col("w") * F.col("x") * F.col("x")).alias("h11"),
        F.sum("r").alias("g0"),
        F.sum(F.col("r") * F.col("x")).alias("g1"),
    )
    det2 = F.col("h00") * F.col("h11") - F.col("h01") * F.col("h01")
    return it2.select(
        F.col("n").cast("long").alias("n"),
        r6z(
            F.when(
                det2 != 0,
                F.col("b0p")
                + (F.col("h11") * F.col("g0") - F.col("h01") * F.col("g1")) / det2,
            ),
            "beta0",
        ),
        r6z(
            F.when(
                det2 != 0,
                F.col("b1p")
                + (F.col("h00") * F.col("g1") - F.col("h01") * F.col("g0")) / det2,
            ),
            "beta1",
        ),
    )


# ---------------------------------------------------------------------------
# Rolling CAPM beta
# ---------------------------------------------------------------------------


@register(
    "q_rolling_beta",
    BARS_CTE
    + """
, rets AS (
  SELECT symbol, bar_start,
         CAST(floor(epoch(bar_start)) AS BIGINT) AS t,
         CASE WHEN lag("close") OVER w <> 0
              THEN "close" / lag("close") OVER w - 1 END AS ret
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY bar_start)
), mkt AS (
  SELECT bar_start, t, avg(ret) AS mret, count(*) AS n_sym
  FROM rets WHERE ret IS NOT NULL
  GROUP BY bar_start, t
), joined AS (
  SELECT r.symbol, r.bar_start, r.t, r.ret, m.mret
  FROM rets r JOIN mkt m USING (bar_start, t)
  WHERE r.ret IS NOT NULL
), rolled AS (
  SELECT symbol, bar_start,
         count(*) OVER w AS n,
         sum(ret) OVER w AS sr, sum(mret) OVER w AS sm,
         sum(ret * mret) OVER w AS srm,
         sum(mret * mret) OVER w AS smm
  FROM joined
  WINDOW w AS (PARTITION BY symbol ORDER BY t
               RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW)
)
SELECT symbol, bar_start,
       CAST(n AS BIGINT) AS n_obs,
       CAST(CASE WHEN n >= 5 AND smm - sm * sm / n > 0 THEN
            CASE WHEN abs((srm - sr * sm / n) / (smm - sm * sm / n))
                 < 1e-6 THEN 0
                 ELSE (srm - sr * sm / n) / (smm - sm * sm / n) END
            END AS REAL) AS rolling_beta
FROM rolled
""",
    "quant",
    "window",
)
def q_rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 30-minute CAPM beta per symbol against the equal-weight
    market: rolling covariance over rolling market variance from power
    sums in ONE RANGE frame pass — the time-varying twin of
    q_capm_beta's full-sample estimate (risk desks watch beta drift,
    not just its level). Variance guard > 0 and a minimum window of 5
    observations on both engines; returns guard lag(close) <> 0.

    Scale: the market series is a (minute)-keyed mean over symbols —
    tiny — joined back on the minute key; the rolling frame runs
    per-symbol over the SAME symbol partitioning the returns window
    already established. State per frame is five scalars (power sums),
    never the row buffer."""
    bars = gold_bars_cut(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("bar_start")
    prev = F.lag("close").over(w)
    rets = bars.select(
        "symbol",
        "bar_start",
        F.col("bar_start").cast("long").alias("t"),
        F.when(prev != 0, F.col("close") / prev - 1).alias("ret"),
    ).where(F.col("ret").isNotNull())
    mkt = rets.groupBy("bar_start", "t").agg(
        F.avg("ret").alias("mret"), F.count("*").alias("n_sym")
    )
    joined = rets.join(F.broadcast(mkt), ["bar_start", "t"]).select(
        "symbol", "bar_start", "t", "ret", "mret"
    )
    wr = (
        Window.partitionBy("symbol")
        .orderBy("t")
        .rangeBetween(-1800, Window.currentRow)
    )
    rolled = joined.select(
        "symbol",
        "bar_start",
        F.count("*").over(wr).alias("n"),
        F.sum("ret").over(wr).alias("sr"),
        F.sum("mret").over(wr).alias("sm"),
        F.sum(F.col("ret") * F.col("mret")).over(wr).alias("srm"),
        F.sum(F.col("mret") * F.col("mret")).over(wr).alias("smm"),
    )
    var_m = F.col("smm") - F.col("sm") * F.col("sm") / F.col("n")
    cov = F.col("srm") - F.col("sr") * F.col("sm") / F.col("n")
    return rolled.select(
        "symbol",
        "bar_start",
        F.col("n").cast("long").alias("n_obs"),
        r6z(
            F.when((F.col("n") >= 5) & (var_m > 0), cov / var_m),
            "rolling_beta",
        ),
    )


# ---------------------------------------------------------------------------
# Naive Bayes language classifier (train + resubstitution eval in-engine)
# ---------------------------------------------------------------------------


@register(
    "q_naive_bayes",
    """
WITH words AS MATERIALIZED (
  SELECT doc_id, lang,
         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
  FROM documents
), wc AS MATERIALIZED (
  SELECT doc_id, lang, w, count(*) AS cnt
  FROM words WHERE w <> '' GROUP BY doc_id, lang, w
), class_tot AS MATERIALIZED (
  SELECT lang, sum(cnt) AS tot, count(DISTINCT doc_id) AS n_docs
  FROM wc GROUP BY lang
), vocab AS MATERIALIZED (
  SELECT count(DISTINCT w) AS v FROM wc
), cw AS MATERIALIZED (
  SELECT lang, w, sum(cnt) AS c FROM wc GROUP BY lang, w
), n_all AS MATERIALIZED (SELECT sum(n_docs) AS total_docs FROM class_tot),
scored AS MATERIALIZED (
  SELECT d.doc_id, d.true_lang, ct.lang AS cand_lang,
         ln(ct.n_docs * 1.0 / n_all.total_docs)
         + sum(d.cnt * (ln(coalesce(cw.c, 0) + 1.0)
                        - ln(ct.tot + vocab.v))) AS score
  FROM (SELECT doc_id, lang AS true_lang, w, cnt FROM wc) d
  CROSS JOIN class_tot ct
  CROSS JOIN vocab
  CROSS JOIN n_all
  LEFT JOIN cw ON cw.lang = ct.lang AND cw.w = d.w
  GROUP BY d.doc_id, d.true_lang, ct.lang, ct.n_docs, ct.tot,
           vocab.v, n_all.total_docs
), pred AS (
  SELECT doc_id, true_lang, cand_lang,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY round(score, 9) DESC, cand_lang)
           AS rk
  FROM scored
)
SELECT true_lang, cand_lang AS pred_lang,
       CAST(count(*) AS BIGINT) AS n_docs
FROM pred WHERE rk = 1
GROUP BY true_lang, cand_lang
""",
    "llm",
    "classifier",
)
def q_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive-Bayes language classifier trained AND evaluated
    in-engine: per-language Laplace-smoothed unigram log-likelihoods
    from one grouped count, then every document rescored against every
    language and argmax'd — reported as the (true, predicted) confusion
    counts (resubstitution eval; the heuristic twin is q_lang_id /
    q_langid_confusion, this is the learned model). Scores are built
    from logs of EXACT integer counts, ties broken on the score rounded
    to 1e-9 then language, so both engines argmax identically.

    Scale: training is a (lang, word)-keyed count — posting-shaped,
    map-side combinable; scoring joins each doc's distinct words to the
    per-language rows of exactly those words (the candidate join is
    docs' postings × languages, NEVER docs × vocabulary), and the
    language dimension is constant. The confusion output is languages²."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        ).alias("w"),
    ).where(F.col("w") != "")
    wc = words.groupBy("doc_id", "lang", "w").agg(F.count("*").alias("cnt"))
    class_tot = wc.groupBy("lang").agg(
        F.sum("cnt").alias("tot"), F.countDistinct("doc_id").alias("n_docs")
    )
    vocab = wc.agg(F.countDistinct("w").alias("v"))
    cw = wc.groupBy("lang", "w").agg(F.sum("cnt").alias("c"))
    n_all = class_tot.agg(F.sum("n_docs").alias("total_docs"))
    d = wc.select("doc_id", F.col("lang").alias("true_lang"), "w", "cnt")
    cand = (
        d.crossJoin(
            F.broadcast(
                class_tot.select(
                    F.col("lang").alias("cand_lang"), "tot", "n_docs"
                )
            )
        )
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(n_all))
        .join(
            cw.select(
                F.col("lang").alias("cw_lang"), F.col("w").alias("cw_w"),
                "c",
            ),
            (F.col("cand_lang") == F.col("cw_lang"))
            & (F.col("w") == F.col("cw_w")),
            "left",
        )
    )
    scored = cand.groupBy(
        "doc_id", "true_lang", "cand_lang", "n_docs", "tot", "v", "total_docs"
    ).agg(
        F.sum(
            F.col("cnt")
            * (
                F.log(F.coalesce(F.col("c"), F.lit(0)) + 1.0)
                - F.log(F.col("tot") + F.col("v"))
            )
        ).alias("like")
    ).select(
        "doc_id",
        "true_lang",
        "cand_lang",
        (
            F.log(F.col("n_docs") * 1.0 / F.col("total_docs")) + F.col("like")
        ).alias("score"),
    )
    wd = Window.partitionBy("doc_id").orderBy(
        F.round(F.col("score"), 9).desc(), F.col("cand_lang")
    )
    pred = scored.withColumn("rk", F.row_number().over(wd)).where(
        F.col("rk") == 1
    )
    return pred.groupBy(
        "true_lang", F.col("cand_lang").alias("pred_lang")
    ).agg(F.count("*").cast("long").alias("n_docs"))


# ---------------------------------------------------------------------------
# 2-D histogram (density grid)
# ---------------------------------------------------------------------------


@register(
    "q_histogram2d",
    """
SELECT CAST(CAST(l_quantity AS BIGINT) // 5 AS BIGINT) AS qty_bin,
       CAST(CAST(round(l_discount * 100) AS BIGINT) // 2 AS BIGINT)
         AS disc_bin,
       CAST(count(*) AS BIGINT) AS n,
       CAST(avg(l_extendedprice) AS REAL) AS avg_price
FROM lineitem
GROUP BY 1, 2
""",
    "analytics",
    "distribution",
)
def q_histogram2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-grid 2-D histogram: line items binned by (quantity ÷ 5,
    discount percentage ÷ 2) with per-cell counts and mean price — the
    density grid behind every heatmap-style joint-distribution view
    (q_histogram's 2-D sibling; q_activity_heatmap is the calendar
    variant). Bin keys are exact integers on both engines (quantity is
    integral; discount × 100 rounds to an integer before the floor
    division, avoiding the DuckDB //-on-DOUBLE trap).

    Scale: one scan-fused grouped count on a bounded grid (≤ 11×6
    cells) — map-side combine collapses everything before the shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        (F.col("l_quantity").cast("long") / 5).cast("long").alias("qty_bin"),
        (F.round(F.col("l_discount") * 100).cast("long") / 2)
        .cast("long")
        .alias("disc_bin"),
    ).agg(
        F.count("*").cast("long").alias("n"),
        r6(F.avg("l_extendedprice"), "avg_price"),
    )


# ---------------------------------------------------------------------------
# kNN classifier evaluation over embeddings
# ---------------------------------------------------------------------------


@register(
    "q_knn_classifier",
    EMB_CTE
    + """
, lab AS (SELECT vec_id, label FROM embeddings)
, q AS (SELECT n.vec_id AS q_id, n.v AS qv, n.nrm AS qn, lab.label AS true_label
        FROM n JOIN lab ON lab.vec_id = n.vec_id WHERE n.vec_id < 100)
, scored AS (
  SELECT q.q_id, q.true_label, n.vec_id,
         list_reduce(list_transform(generate_series(1, len(q.qv)), i -> q.qv[i] * n.v[i]), (x, y) -> x + y) / (q.qn * n.nrm) AS cosine
  FROM q JOIN n ON n.vec_id <> q.q_id
), nn AS (
  SELECT q_id, true_label, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
                                 ORDER BY cosine DESC, vec_id) AS rk
    FROM scored
  ) WHERE rk <= 5
), votes AS (
  SELECT nn.q_id, nn.true_label, lab.label AS cand, count(*) AS cnt
  FROM nn JOIN lab ON lab.vec_id = nn.vec_id
  GROUP BY nn.q_id, nn.true_label, lab.label
), pred AS (
  SELECT q_id, true_label, cand AS pred_label FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
                                 ORDER BY cnt DESC, cand) AS rk
    FROM votes
  ) WHERE rk = 1
)
SELECT CAST(true_label AS BIGINT) AS true_label,
       CAST(count(*) AS BIGINT) AS n_queries,
       CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct
FROM pred GROUP BY true_label
""",
    "vector",
    "classifier",
)
def q_knn_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-nearest-neighbor (k=5, cosine) label prediction over the
    labeled embeddings, leave-one-out for the first 100 vectors, scored
    as per-label accuracy counts — the lazy-learner baseline every
    embedding-quality audit wants beside q_nearest_centroid's
    parametric one. Neighbor and vote ties are pinned (cosine desc,
    vec_id; count desc, label) so both engines pick identical winners.

    Scale: the query set is a bounded broadcast against one corpus
    scan (the q_ann_cosine_topk plan), votes are k rows per query.
    This is the exact-truth BASELINE; the production-shaped swap is
    q_knn_ivf_classifier (registry_round10.py), which feeds the same
    vote/eval stages from IVF candidates instead of the full corpus —
    run both for the accuracy-vs-cost trade."""
    from .extensions import similarity as S
    from .extensions.dedup import memo_scalar

    emb = load_table(spark, sf_dir, "embeddings")
    lab = emb.select("vec_id", "label")
    n = memo_scalar(spark, f"emb_count:{sf_dir}", emb.count)
    topk = S.cosine_topk(emb, n_queries=100, k=5, n_corpus=n)
    nn = topk.join(
        F.broadcast(lab.select(F.col("vec_id").alias("q_id"),
                               F.col("label").alias("true_label"))),
        "q_id",
    ).join(F.broadcast(lab), "vec_id")
    votes = nn.groupBy("q_id", "true_label", F.col("label").alias("cand")).agg(
        F.count("*").alias("cnt")
    )
    wv = Window.partitionBy("q_id").orderBy(
        F.col("cnt").desc(), F.col("cand")
    )
    pred = votes.withColumn("rk", F.row_number().over(wv)).where(
        F.col("rk") == 1
    )
    return pred.groupBy(F.col("true_label").cast("long").alias("true_label")).agg(
        F.count("*").cast("long").alias("n_queries"),
        F.sum(
            F.when(F.col("cand") == F.col("true_label"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_correct"),
    )


# ---------------------------------------------------------------------------
# Snapshot schema evolution, read through the evolved manifest
# ---------------------------------------------------------------------------

_EVO_DESC = "v1: pre-1998 (key,price); v2 merge: 1998+ (+priority)"
_EVO_MEMO: dict[tuple[str, str], str] = {}


def evolved_snapshot_table(spark: SparkSession, sf_dir: str) -> str:
    """Build (or reuse) a two-commit snapshot table whose SECOND commit
    widened the schema: v1 = pre-1998 orders as (o_orderkey,
    o_totalprice); v2 = a merge-mode append of 1998+ orders carrying an
    extra o_orderpriority column. The manifest-schema read path must
    surface the old rows with NULL priority — exactly Delta's
    mergeSchema contract (see sources/snapshots._merged_schema).
    Memoized per (session, sf_dir) and on disk like the round-8 builds."""
    import hashlib as _h
    import pathlib as _p
    import shutil as _sh

    from .registry_round8 import _scratch_base
    from .sources.snapshots import snapshot_write

    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _EVO_MEMO.get(key)
    if hit is not None:
        return hit
    digest = _h.md5(("evo:" + sf_dir).encode()).hexdigest()[:10]
    table = _p.Path(_scratch_base()) / f"orders_evo_{digest}"
    ok = table / "_BUILD_OK"
    if ok.is_file() and ok.read_text().strip() == _EVO_DESC:
        _EVO_MEMO[key] = str(table)
        return str(table)
    _sh.rmtree(table, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders")
    old = orders.where(F.year("o_orderdate") <= 1997).select(
        "o_orderkey", "o_totalprice"
    )
    new = orders.where(F.year("o_orderdate") >= 1998).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    snapshot_write(old.repartition(2), str(table))
    snapshot_write(new.repartition(2), str(table), schema_mode="merge")
    ok.write_text(_EVO_DESC)
    _EVO_MEMO[key] = str(table)
    return str(table)


@register(
    "q_snapshot_schema_evolution",
    """
WITH t AS (
  SELECT o_orderkey, o_totalprice,
         CASE WHEN year(o_orderdate) >= 1998
              THEN o_orderpriority END AS o_orderpriority
  FROM orders
)
SELECT coalesce(o_orderpriority, '<pre-evolution>') AS priority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(o_totalprice) AS REAL) AS sum_price
FROM t GROUP BY 1
""",
    "snapshot",
    "lakehouse",
)
def q_snapshot_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read THROUGH a schema evolution: the table's second commit added
    o_orderpriority under schema_mode='merge', so the head version's
    manifest schema is the widened one and pre-evolution files read the
    new column as NULL — this query aggregates over exactly that mixed
    file set and must match plain SQL that nulls the column for the
    old band. Verifies the manifest-schema read path end to end
    (sources/snapshots.py snapshot_read), not just via pytest.

    Scale: the read is manifests + the version's file list; grouping is
    priorities-sized. Reference parity: the reference rewrites whole
    parquet dirs on schema change (no table format at all) — evolution
    without rewrite is part of the lakehouse capability gap."""
    from .sources.snapshots import snapshot_read

    table = evolved_snapshot_table(spark, sf_dir)
    t = snapshot_read(spark, table)
    return t.groupBy(
        F.coalesce(F.col("o_orderpriority"), F.lit("<pre-evolution>")).alias(
            "priority"
        )
    ).agg(
        F.count("*").cast("long").alias("n_orders"),
        r6(F.sum("o_totalprice"), "sum_price"),
    )


# ---------------------------------------------------------------------------
# Dup-cluster-aware train/val/test split
# ---------------------------------------------------------------------------


def _dedup_aware_split_sql() -> str:
    from .registry_ext import _components_sql

    comp_hash = md5_int32_sql("CAST(component AS VARCHAR)")
    doc_hash = md5_int32_sql("CAST(doc_id AS VARCHAR)")
    base = _components_sql()
    anchor = "SELECT id AS doc_id, min(lbl) AS component FROM reach GROUP BY id"
    # str.replace silently no-ops when the anchor drifts, degenerating the
    # oracle into the plain components query — fail loudly at import instead.
    if anchor not in base:
        raise AssertionError(
            "_components_sql() drifted: dedup-aware-split oracle anchor "
            "not found"
        )
    return base.replace(
        anchor,
        f""", comp AS (
  SELECT id AS doc_id, min(lbl) AS component FROM reach GROUP BY id
), assign AS (
  SELECT doc_id, component,
         {comp_hash} % 10 AS cb,
         {doc_hash} % 10 AS nb
  FROM comp
), per_comp AS (
  SELECT component,
         CASE WHEN min(cb) < 8 THEN 'train'
              WHEN min(cb) = 8 THEN 'val' ELSE 'test' END AS split,
         count(*) AS n_docs,
         count(DISTINCT CASE WHEN nb < 8 THEN 'train'
                             WHEN nb = 8 THEN 'val' ELSE 'test' END)
           AS n_naive_splits
  FROM assign GROUP BY component
)
SELECT split,
       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_components,
       CAST(sum(CASE WHEN n_naive_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_would_leak_naive
FROM per_comp GROUP BY split""",
        1,
    )


@register(
    "q_dedup_aware_split",
    _dedup_aware_split_sql(),
    "llm",
    "split",
)
def q_dedup_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware train/val/test split: hash the dup COMPONENT, not
    the document, into 80/10/10 buckets, so an entire near-duplicate
    cluster lands in one split — the leakage guard q_hash_split alone
    cannot give (a train doc's near-twin in test inflates eval). Also
    reports, per split, how many of its components WOULD have straddled
    splits under naive per-doc hashing (the leak count this operator
    exists to zero out). Deterministic: md5-bucketed on both engines,
    component labels are min-reachable-ids.

    Scale: reuses the memoized pair→component closure (the expensive
    step, already bounded by the df-capped posting join); everything
    here is one component-keyed agg + a 3-row rollup. Reference parity:
    none — the reference has no dedup or split tooling at all; this is
    the training-data extension surface (brief §'beyond the reference').
    """
    from .registry_ext import _components_cut

    comp = _components_cut(spark, sf_dir)
    bucket = lambda c: md5_int32(c.cast("string")) % 10  # noqa: E731
    split_of = lambda b: (  # noqa: E731
        F.when(b < 8, F.lit("train")).when(b == 8, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    assign = comp.select(
        "doc_id",
        "component",
        bucket(F.col("component")).alias("cb"),
        bucket(F.col("doc_id")).alias("nb"),
    )
    per_comp = assign.groupBy("component").agg(
        split_of(F.min("cb")).alias("split"),
        F.count("*").alias("n_docs"),
        F.countDistinct(split_of(F.col("nb"))).alias("n_naive_splits"),
    )
    return per_comp.groupBy("split").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_components"),
        F.sum(F.when(F.col("n_naive_splits") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_would_leak_naive"),
    )


# ---------------------------------------------------------------------------
# Leave-one-out target encoding
# ---------------------------------------------------------------------------


@register(
    "q_target_encoding",
    """
WITH base AS (
  SELECT p.p_brand,
         CASE WHEN l.l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), g AS (
  SELECT p_brand, count(*) AS n_g, sum(y) AS s_g FROM base GROUP BY p_brand
), prior AS (SELECT sum(s_g) / sum(n_g) AS mu FROM g)
SELECT g.p_brand,
       CAST(g.n_g AS BIGINT) AS n_rows,
       CAST(g.s_g / g.n_g AS REAL) AS raw_rate,
       -- smoothed LOO encoding evaluated at a POSITIVE example
       CAST(CASE WHEN g.n_g > 1
            THEN (g.s_g - 1 + 20 * prior.mu) / (g.n_g - 1 + 20) END
            AS REAL) AS loo_enc_pos,
       -- …and at a negative example
       CAST(CASE WHEN g.n_g > 1
            THEN (g.s_g + 20 * prior.mu) / (g.n_g - 1 + 20) END
            AS REAL) AS loo_enc_neg
FROM g CROSS JOIN prior
""",
    "ml",
    "featurize",
)
def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed leave-one-out target encoding of part brand against the
    returned-flag target — the leakage-aware categorical encoder every
    tabular-ML pipeline ships (encode a row WITHOUT its own label:
    (s_g − y + m·μ)/(n_g − 1 + m), smoothing m=20 toward the global
    prior). Emitted per brand at both label values, which is the whole
    encoder — applying it to a row is a broadcast dim join.

    Scale: one fact-dim broadcast join + one brand-keyed agg; the
    encoder table is categories-sized, exactly why target encoding
    scales where one-hot cannot."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    base = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li["l_partkey"] == part["p_partkey"],
    ).select(
        "p_brand",
        F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0).alias("y"),
    )
    g = base.groupBy("p_brand").agg(
        F.count("*").alias("n_g"), F.sum("y").alias("s_g")
    )
    prior = g.agg((F.sum("s_g") / F.sum("n_g")).alias("mu"))
    m = F.lit(20.0)
    out = g.crossJoin(F.broadcast(prior))
    return out.select(
        "p_brand",
        F.col("n_g").cast("long").alias("n_rows"),
        r6(F.col("s_g") / F.col("n_g"), "raw_rate"),
        r6(
            F.when(
                F.col("n_g") > 1,
                (F.col("s_g") - 1 + m * F.col("mu"))
                / (F.col("n_g") - 1 + m),
            ),
            "loo_enc_pos",
        ),
        r6(
            F.when(
                F.col("n_g") > 1,
                (F.col("s_g") + m * F.col("mu")) / (F.col("n_g") - 1 + m),
            ),
            "loo_enc_neg",
        ),
    )


# ---------------------------------------------------------------------------
# Cross-validation folds with stratification audit
# ---------------------------------------------------------------------------


@register(
    "q_cv_folds",
    f"""
WITH base AS (
  SELECT {md5_int32_sql("CAST(o_orderkey AS VARCHAR)")} % 5 AS fold,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1.0 ELSE 0.0 END AS y,
         o_totalprice
  FROM orders
), g AS (
  SELECT fold, count(*) AS n, sum(y) AS pos, avg(o_totalprice) AS avg_price
  FROM base GROUP BY fold
), tot AS (SELECT sum(pos) / sum(n) AS global_rate FROM g)
SELECT CAST(fold AS BIGINT) AS fold,
       CAST(n AS BIGINT) AS n_rows,
       CAST(pos / n AS REAL) AS class_rate,
       CAST(pos / n - tot.global_rate AS REAL) AS rate_minus_global,
       CAST(avg_price AS REAL) AS avg_price
FROM g CROSS JOIN tot
""",
    "ml",
    "split",
)
def q_cv_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold cross-validation assignment (md5-bucketed on
    the order key — reproducible across engines and runs, the
    q_hash_split convention) WITH the stratification audit: per fold,
    the positive-class rate against the global rate and the mean order
    value — the balance check that tells you whether hash folds are
    exchangeable before trusting CV variance. (For a component-aware
    variant that keeps near-dup clusters inside one fold, compose with
    q_dedup_aware_split's bucketing.)

    Scale: one scan-fused agg on 5 keys plus a 1-row global broadcast."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        (md5_int32(F.col("o_orderkey").cast("string")) % 5).alias("fold"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1.0
        ).otherwise(0.0).alias("y"),
        "o_totalprice",
    )
    g = base.groupBy("fold").agg(
        F.count("*").alias("n"),
        F.sum("y").alias("pos"),
        F.avg("o_totalprice").alias("avg_price"),
    )
    tot = g.agg((F.sum("pos") / F.sum("n")).alias("global_rate"))
    return g.crossJoin(F.broadcast(tot)).select(
        F.col("fold").cast("long").alias("fold"),
        F.col("n").cast("long").alias("n_rows"),
        r6(F.col("pos") / F.col("n"), "class_rate"),
        r6(F.col("pos") / F.col("n") - F.col("global_rate"),
           "rate_minus_global"),
        r6(F.col("avg_price"), "avg_price"),
    )


# ---------------------------------------------------------------------------
# Price elasticity (log-log OLS slope per brand)
# ---------------------------------------------------------------------------


@register(
    "q_price_elasticity",
    """
WITH base AS (
  SELECT p.p_brand,
         ln(l.l_quantity) AS lq,
         ln(l.l_extendedprice / l.l_quantity) AS lp
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
), m AS (
  SELECT p_brand, count(*) AS n,
         covar_samp(lq, lp) AS c, var_samp(lp) AS v,
         avg(lq) AS mean_lq, avg(lp) AS mean_lp
  FROM base GROUP BY p_brand
)
SELECT p_brand,
       CAST(n AS BIGINT) AS n,
       CAST(CASE WHEN v > 0 THEN
            CASE WHEN abs(c / v) < 1e-6 THEN 0 ELSE c / v END
            END AS REAL) AS elasticity,
       CAST(mean_lp AS REAL) AS mean_log_price
FROM m
""",
    "analytics",
    "regression",
)
def q_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Own-price elasticity per brand: the log-log OLS slope
    cov(ln q, ln p)/var(ln p) of quantity against unit price — the
    pricing-analytics staple (elasticity < −1 ⇒ revenue falls when
    price rises). Log domains guarded positive on BOTH engines (sf0.1
    carries non-positive values smaller scales don't — the standing
    hazard class); the variance guard keeps single-price brands NULL
    rather than NaN.

    Scale: one fact-dim broadcast join + one brand-keyed moment agg;
    the regression algebra runs on a brands-sized table."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    base = (
        li.where((F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0))
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li["l_partkey"] == part["p_partkey"],
        )
        .select(
            "p_brand",
            F.log(F.col("l_quantity")).alias("lq"),
            F.log(F.col("l_extendedprice") / F.col("l_quantity")).alias("lp"),
        )
    )
    m = base.groupBy("p_brand").agg(
        F.count("*").alias("n"),
        F.covar_samp("lq", "lp").alias("c"),
        F.var_samp("lp").alias("v"),
        F.avg("lp").alias("mean_lp"),
    )
    return m.select(
        "p_brand",
        F.col("n").cast("long").alias("n"),
        r6z(F.when(F.col("v") > 0, F.col("c") / F.col("v")), "elasticity"),
        r6(F.col("mean_lp"), "mean_log_price"),
    )


# ---------------------------------------------------------------------------
# Logistic calibration bins (reliability diagram data)
# ---------------------------------------------------------------------------

#: Shared IRLS chain (see q_irls_logistic) ending in a 1-row beta CTE —
#: the calibration query appends scoring + binning to the same algebra.
_IRLS_BETA_CTES = """
WITH base AS (
  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1.0 ELSE 0.0 END AS y,
         o_totalprice AS raw_x
  FROM orders
), std AS (
  SELECT avg(raw_x) AS mu, stddev_samp(raw_x) AS sd FROM base
), d AS MATERIALIZED (
  SELECT y, (raw_x - std.mu) / std.sd AS x FROM base, std WHERE std.sd > 0
), it1 AS MATERIALIZED (
  SELECT count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx,
         sum(y - 0.5) AS g0, sum((y - 0.5) * x) AS g1
  FROM d
), b1 AS MATERIALIZED (
  SELECT n,
         (0.25 * sxx * g0 - 0.25 * sx * g1)
           / (0.25 * n * 0.25 * sxx - 0.25 * sx * 0.25 * sx) AS b0,
         (0.25 * n * g1 - 0.25 * sx * g0)
           / (0.25 * n * 0.25 * sxx - 0.25 * sx * 0.25 * sx) AS b1
  FROM it1
), it2 AS MATERIALIZED (
  SELECT b1.n AS n, b1.b0 AS b0p, b1.b1 AS b1p,
         sum(pw.w) AS h00, sum(pw.w * pw.x) AS h01,
         sum(pw.w * pw.x * pw.x) AS h11,
         sum(pw.r) AS g0, sum(pw.r * pw.x) AS g1
  FROM b1, (
    SELECT d.x,
           1.0 / (1.0 + exp(-(b1.b0 + b1.b1 * d.x))) AS p,
           (1.0 / (1.0 + exp(-(b1.b0 + b1.b1 * d.x))))
             * (1.0 - 1.0 / (1.0 + exp(-(b1.b0 + b1.b1 * d.x)))) AS w,
           d.y - 1.0 / (1.0 + exp(-(b1.b0 + b1.b1 * d.x))) AS r
    FROM d, b1
  ) pw
  GROUP BY b1.n, b1.b0, b1.b1
), beta AS MATERIALIZED (
  SELECT n,
         b0p + (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01) AS b0,
         b1p + (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01) AS b1
  FROM it2 WHERE h00 * h11 - h01 * h01 <> 0
)
"""


@register(
    "q_logistic_calibration",
    _IRLS_BETA_CTES
    + """
, scored AS (
  SELECT d.y,
         CAST(1.0 / (1.0 + exp(-(beta.b0 + beta.b1 * d.x))) AS REAL) AS p
  FROM d, beta
)
SELECT CAST(least(floor(p * 10), 9) AS BIGINT) AS p_bin,
       CAST(count(*) AS BIGINT) AS n,
       CAST(avg(y) AS REAL) AS observed_rate,
       CAST(avg(p) AS REAL) AS mean_predicted
FROM scored GROUP BY 1
""",
    "ml",
    "eval",
)
def q_logistic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram data for the q_irls_logistic model: score
    every order with the trained β, bucket predicted probabilities into
    deciles, and report observed positive rate vs mean prediction per
    bin — the calibration check that decides whether the classifier's
    scores are usable as probabilities (train → calibrate entirely
    in-engine, one more scan over the fact table). Predictions are
    float32-collapsed BEFORE binning (the q_price_dispersion
    convention) so a knife-edge probability lands in the same decile on
    both engines.

    Scale: one additional scan over orders with a 1-row β broadcast,
    folding into a ≤10-key agg."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1.0)
        )
        .otherwise(F.lit(0.0))
        .alias("y"),
        F.col("o_totalprice").alias("raw_x"),
    )
    std = base.agg(
        F.avg("raw_x").alias("mu"), F.stddev_samp("raw_x").alias("sd")
    )
    d = (
        base.crossJoin(F.broadcast(std))
        .where(F.col("sd") > 0)
        .select("y", ((F.col("raw_x") - F.col("mu")) / F.col("sd")).alias("x"))
    )
    it1 = d.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") - 0.5).alias("g0"),
        F.sum((F.col("y") - 0.5) * F.col("x")).alias("g1"),
    )
    det1 = (
        0.25 * F.col("n") * 0.25 * F.col("sxx")
        - 0.25 * F.col("sx") * 0.25 * F.col("sx")
    )
    b1 = it1.select(
        ((0.25 * F.col("sxx") * F.col("g0") - 0.25 * F.col("sx") * F.col("g1")) / det1).alias("b0"),
        ((0.25 * F.col("n") * F.col("g1") - 0.25 * F.col("sx") * F.col("g0")) / det1).alias("b1"),
    )
    p1 = 1.0 / (1.0 + F.exp(-(F.col("b0") + F.col("b1") * F.col("x"))))
    pw = d.crossJoin(F.broadcast(b1)).select(
        "x",
        F.col("b0").alias("b0p"),
        F.col("b1").alias("b1p"),
        (p1 * (1.0 - p1)).alias("w"),
        (F.col("y") - p1).alias("r"),
    )
    it2 = pw.groupBy("b0p", "b1p").agg(
        F.sum("w").alias("h00"),
        F.sum(F.col("w") * F.col("x")).alias("h01"),
        F.sum(F.col("w") * F.col("x") * F.col("x")).alias("h11"),
        F.sum("r").alias("g0"),
        F.sum(F.col("r") * F.col("x")).alias("g1"),
    )
    det2 = F.col("h00") * F.col("h11") - F.col("h01") * F.col("h01")
    beta = it2.where(det2 != 0).select(
        (F.col("b0p") + (F.col("h11") * F.col("g0") - F.col("h01") * F.col("g1")) / det2).alias("b0"),
        (F.col("b1p") + (F.col("h00") * F.col("g1") - F.col("h01") * F.col("g0")) / det2).alias("b1"),
    )
    scored = d.crossJoin(F.broadcast(beta)).select(
        "y",
        (1.0 / (1.0 + F.exp(-(F.col("b0") + F.col("b1") * F.col("x")))))
        .cast("float")
        .alias("p"),
    )
    return scored.groupBy(
        F.least(F.floor(F.col("p") * 10), F.lit(9))
        .cast("long")
        .alias("p_bin")
    ).agg(
        F.count("*").cast("long").alias("n"),
        r6(F.avg("y"), "observed_rate"),
        r6(F.avg("p"), "mean_predicted"),
    )


# ---------------------------------------------------------------------------
# Decision stump (depth-1 regression tree, decile candidate splits)
# ---------------------------------------------------------------------------


@register(
    "q_decision_stump",
    """
WITH cand AS MATERIALIZED (
  SELECT unnest(quantile_cont(o_totalprice,
                [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])) AS thr
  FROM orders
), base AS MATERIALIZED (
  SELECT o_totalprice AS x,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1.0 ELSE 0.0 END AS y
  FROM orders
), tot AS MATERIALIZED (
  SELECT count(*) AS n, sum(y) AS s, sum(y * y) AS ss FROM base
), split AS MATERIALIZED (
  SELECT c.thr,
         count(*) FILTER (WHERE b.x <= c.thr) AS nl,
         sum(b.y) FILTER (WHERE b.x <= c.thr) AS sl
  FROM base b CROSS JOIN cand c
  GROUP BY c.thr
), scored AS (
  SELECT s.thr, s.nl, tot.n - s.nl AS nr,
         -- variance reduction = SSE(parent) - SSE(left) - SSE(right);
         -- with y in {0,1}, SSE(g) = sum(y) - sum(y)^2/n(g), so the
         -- reduction is sl^2/nl + sr^2/nr - s^2/n (exact rationals
         -- over integer counts).
         CASE WHEN s.nl > 0 AND tot.n - s.nl > 0 THEN
           s.sl * s.sl / s.nl
           + (tot.s - s.sl) * (tot.s - s.sl) / (tot.n - s.nl)
           - tot.s * tot.s / tot.n END AS gain,
         CASE WHEN s.nl > 0 THEN s.sl / s.nl END AS mean_left,
         CASE WHEN tot.n - s.nl > 0 THEN
           (tot.s - s.sl) / (tot.n - s.nl) END AS mean_right
  FROM split s CROSS JOIN tot
)
SELECT CAST(thr AS REAL) AS threshold,
       CAST(nl AS BIGINT) AS n_left,
       CAST(nr AS BIGINT) AS n_right,
       CAST(mean_left AS REAL) AS mean_left,
       CAST(mean_right AS REAL) AS mean_right,
       CAST(gain AS REAL) AS variance_reduction
FROM (
  SELECT *, row_number() OVER (ORDER BY round(gain, 9) DESC, thr) AS rk
  FROM scored WHERE gain IS NOT NULL
) WHERE rk = 1
""",
    "ml",
    "tree",
)
def q_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-1 regression tree (a boosting stump) learned in-engine:
    candidate thresholds are the feature's deciles, the winning split
    maximizes variance reduction computed from EXACT integer counts
    (with a 0/1 target, SSE algebra collapses to s²/n terms), and the
    argmax is pinned by the 1e-9-rounded gain then threshold — the
    q_naive_bayes determinism convention. This is one round of every
    gradient-boosting library's inner loop, expressed as Spark
    aggregates.

    Scale: candidate evaluation is ONE scan with a 9-row broadcast
    (each row tested against all thresholds via filtered aggregates);
    no per-candidate passes, no sort of the feature column — the
    histogram-split strategy LightGBM-style trainers use distributed."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_totalprice").alias("x"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1.0)
        )
        .otherwise(F.lit(0.0))
        .alias("y"),
    )
    fracs = F.array(*[F.lit(i / 10.0) for i in range(1, 10)])
    cand = o.agg(
        F.explode(F.percentile("o_totalprice", fracs)).alias("thr")
    )
    tot = base.agg(F.count("*").alias("n"), F.sum("y").alias("s"))
    split = (
        base.crossJoin(F.broadcast(cand))
        .groupBy("thr")
        .agg(
            F.count(F.when(F.col("x") <= F.col("thr"), 1)).alias("nl"),
            F.sum(
                F.when(F.col("x") <= F.col("thr"), F.col("y")).otherwise(0.0)
            ).alias("sl"),
        )
    )
    scored = split.crossJoin(F.broadcast(tot)).select(
        "thr",
        "nl",
        (F.col("n") - F.col("nl")).alias("nr"),
        F.when(
            (F.col("nl") > 0) & (F.col("n") - F.col("nl") > 0),
            F.col("sl") * F.col("sl") / F.col("nl")
            + (F.col("s") - F.col("sl"))
            * (F.col("s") - F.col("sl"))
            / (F.col("n") - F.col("nl"))
            - F.col("s") * F.col("s") / F.col("n"),
        ).alias("gain"),
        # Same div-by-zero guards as gain: a decile threshold equal to
        # the column min/max would make nl or nr zero, and Spark ANSI
        # raises where DuckDB yields NULL. Unreachable on o_totalprice,
        # but the stump must stay safe on discrete features.
        F.when(
            F.col("nl") > 0, F.col("sl") / F.col("nl")
        ).alias("mean_left"),
        F.when(
            F.col("n") - F.col("nl") > 0,
            (F.col("s") - F.col("sl")) / (F.col("n") - F.col("nl")),
        ).alias("mean_right"),
    )
    w = Window.orderBy(F.round(F.col("gain"), 9).desc(), F.col("thr"))
    best = (
        scored.where(F.col("gain").isNotNull())
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
    )
    return best.select(
        r6(F.col("thr"), "threshold"),
        F.col("nl").cast("long").alias("n_left"),
        F.col("nr").cast("long").alias("n_right"),
        r6(F.col("mean_left"), "mean_left"),
        r6(F.col("mean_right"), "mean_right"),
        r6(F.col("gain"), "variance_reduction"),
    )
