"""Round-7 batch 2: recursive-query equivalence, market-basket mining,
weighted order statistics, and survival analysis —

- **hierarchy depth via pointer doubling** (the recursive-CTE query shape
  Spark lacks natively, re-expressed as O(log depth) binary-lifting
  self-joins instead of O(depth) naive iteration — the scalable spelling
  of WITH RECURSIVE for parent-pointer rollups),
- **market-basket lift** (association-rule mining: top part pairs by
  lift at a minimum support over the order baskets),
- **weighted median** (quantity-weighted median price per return flag —
  the cumulative-weight order statistic, exact, no sampling),
- **Kaplan-Meier survival** (user-tenure survival curve with censoring —
  the product-limit estimator over the event stream).

Registry conventions as everywhere (see registry.py): each query is a
(Spark builder, DuckDB oracle) pair via ``@register``; float outputs are
float32-canonicalized (r6) at the output boundary; everything else here
is integer-exact or single-division rational, so both engines agree to
the bit before the cast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import r6, register
from .sources.tables import load_table

# ---------------------------------------------------------------------------
# Hierarchy depth via pointer doubling
# ---------------------------------------------------------------------------

#: Deterministic synthetic forest over user ids: parent(u) = u div 7 for
#: u >= 7, roots below. The engine treats it as opaque parent pointers —
#: the operator is the generic WITH RECURSIVE depth rollup.
_HIER_BASE = 7
#: Doubling rounds: covers depth <= 2^6 = 64, i.e. ids < 7^64 — a
#: data-independent unroll bound (vs naive iteration, whose round count
#: grows with the actual depth).
_HIER_ROUNDS = 6


@register(
    "q_hierarchy_depth",
    f"""
WITH RECURSIVE users AS (
  SELECT DISTINCT user_id AS u FROM events
), walk AS (
  -- FK-closed walk: a step is taken only FROM a node that exists in the
  -- table (p.u = w.cur), the org-chart semantics where parent pointers
  -- are foreign keys. A dangling parent value is still counted as the
  -- final step (the base row's cur is always a real node), after which
  -- the walk stops — exactly the pointer-doubling left join's behavior.
  -- On an id space closed under div {_HIER_BASE} (sf0.01/sf0.1 dense
  -- ids) this is identical to the unconstrained value walk; the sf1.0
  -- shifted-id fixture is NOT closed and exposed the divergence
  -- (round-10 sweep).
  SELECT u, u AS cur, 0 AS d FROM users
  UNION ALL
  SELECT w.u, w.cur // {_HIER_BASE}, w.d + 1
  FROM walk w JOIN users p ON p.u = w.cur
  WHERE w.cur >= {_HIER_BASE}
), depth AS (
  SELECT u, max(d) AS depth FROM walk GROUP BY u
)
SELECT CAST(depth AS BIGINT) AS depth,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(min(u) AS BIGINT) AS min_user,
       CAST(max(u) AS BIGINT) AS max_user
FROM depth GROUP BY depth
""",
    "graph",
    "recursive",
)
def q_hierarchy_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-of-node rollup over a parent-pointer hierarchy (synthetic
    deterministic forest parent(u) = u div 7) — the WITH RECURSIVE query
    shape, which Spark SQL lacks, re-expressed scale-first. Semantics
    are FK-CLOSED: a walk continues only through parents that exist as
    rows (a dangling parent value counts as the last step, then the
    walk stops) — the self-join below implements exactly that, and the
    oracle's recursion is constrained the same way.

    Plan: binary lifting (pointer doubling). The state table carries
    (node, 2^k-th ancestor-or-NULL, steps walked); each round LEFT
    self-joins the jump table onto its own ancestor column, doubling the
    walked distance. O(log max_depth) rounds of one node-sized keyed
    exchange each — vs the naive one-parent-per-round loop whose round
    count (and shuffle count) grows linearly with the hierarchy depth.
    The unroll bound (6 rounds → depth ≤ 64) is data-independent; every
    row's walk terminates at its root regardless. Integer-exact
    throughout.
    """
    users = (
        load_table(spark, sf_dir, "events")
        .select(F.col("user_id").alias("u"))
        .distinct()
    )
    parent = F.when(
        F.col("u") >= _HIER_BASE, F.expr(f"u div {_HIER_BASE}")
    )
    j = users.select(
        "u",
        parent.alias("anc"),
        F.when(F.col("u") >= _HIER_BASE, F.lit(1))
        .otherwise(F.lit(0))
        .alias("d"),
    )
    for _ in range(_HIER_ROUNDS):
        j2 = j.select(
            F.col("u").alias("u2"),
            F.col("anc").alias("anc2"),
            F.col("d").alias("d2"),
        )
        # NULL anc (already at root) never matches — the left join keeps
        # the finished row as-is; a matched row jumps to its ancestor's
        # ancestor and accumulates the walked steps.
        j = j.join(j2, j["anc"] == j2["u2"], "left").select(
            "u",
            F.col("anc2").alias("anc"),
            (F.col("d") + F.coalesce(F.col("d2"), F.lit(0))).alias("d"),
        )
    return (
        j.groupBy(F.col("d").cast("long").alias("depth"))
        .agg(
            F.count("*").alias("n_users"),
            F.min("u").cast("long").alias("min_user"),
            F.max("u").cast("long").alias("max_user"),
        )
    )


# ---------------------------------------------------------------------------
# Market-basket lift
# ---------------------------------------------------------------------------

BASKET_MIN_SUPPORT = 3  # pair must co-occur in at least this many orders
BASKET_TOP_K = 20


@register(
    "q_basket_lift",
    f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n AS (
  SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_orders FROM items
), item_cnt AS (
  SELECT l_partkey, count(*) AS cnt FROM items GROUP BY l_partkey
), pair_cnt AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_ab
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
)
SELECT CAST(pa AS BIGINT) AS part_a, CAST(pb AS BIGINT) AS part_b,
       CAST(n_ab AS BIGINT) AS n_both,
       CAST(n_ab / n.n_orders AS REAL) AS support,
       CAST(n_ab * n.n_orders / (ca.cnt * CAST(cb.cnt AS DOUBLE)) AS REAL)
           AS lift
FROM pair_cnt
JOIN item_cnt ca ON ca.l_partkey = pa
JOIN item_cnt cb ON cb.l_partkey = pb
CROSS JOIN n
WHERE n_ab >= {BASKET_MIN_SUPPORT}
ORDER BY n_ab * n.n_orders / (ca.cnt * CAST(cb.cnt AS DOUBLE)) DESC, pa, pb
LIMIT {BASKET_TOP_K}
""",
    "analytics",
    "basket",
)
def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over the order baskets: the top-20 part
    pairs by lift (observed co-occurrence over independence expectation)
    among pairs co-occurring in ≥ BASKET_MIN_SUPPORT orders. Lift > 1
    flags genuinely associated parts — the classic market-basket
    recommendation signal.

    Plan: per-order part arrays pair-explode into C(k,2) pair rows (the
    same bounded JVM-side explosion as the co-purchase edge build —
    basket sizes are bounded, never corpus-sized), one pair-keyed count,
    two broadcast-joined item counts, and a scalar order count folded in
    as a 1-row broadcast. Lift is a single rational expression of exact
    integer counts, bit-identical on both engines; the top-k order is
    made total by the (part_a, part_b) tiebreak.
    """
    from .extensions.dedup import _cut_lineage

    li = load_table(spark, sf_dir, "lineitem")
    # The distinct basket-items table feeds THREE independent
    # aggregations (order count, per-item counts, per-order baskets);
    # lazily it re-executed the full lineitem scan + distinct shuffle
    # under each (plan showed 3 copies, zero ReusedExchange). One
    # per-call lineage cut computes it once (guide §1.2).
    items = _cut_lineage(li.select("l_orderkey", "l_partkey").distinct())
    # Scalar order count as a 1-row broadcast (same pattern as the other
    # broadcast-scalar totals in the registry).
    n = items.agg(
        F.countDistinct("l_orderkey").cast("double").alias("n_orders")
    )
    item_cnt = items.groupBy("l_partkey").agg(F.count("*").alias("cnt"))
    baskets = items.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    # JVM-side ordered-pair generation over the per-order part array —
    # same spelling as the co-purchase edge build (registry_round3.py).
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) ->"
                " transform(slice(ps, i + 2, size(ps)),"
                " y -> struct(x AS pa, y AS pb))))"
            )
        ).alias("p")
    ).select("p.pa", "p.pb")
    pair_cnt = pairs.groupBy("pa", "pb").agg(F.count("*").alias("n_ab"))
    ca = item_cnt.select(
        F.col("l_partkey").alias("pa"), F.col("cnt").alias("cnt_a")
    )
    cb = item_cnt.select(
        F.col("l_partkey").alias("pb"), F.col("cnt").alias("cnt_b")
    )
    lift = (
        F.col("n_ab") * F.col("n_orders")
        / (F.col("cnt_a") * F.col("cnt_b").cast("double"))
    )
    out = (
        pair_cnt.where(F.col("n_ab") >= BASKET_MIN_SUPPORT)
        .join(F.broadcast(ca), "pa")
        .join(F.broadcast(cb), "pb")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("pa").cast("long").alias("part_a"),
            F.col("pb").cast("long").alias("part_b"),
            F.col("n_ab").cast("long").alias("n_both"),
            r6(F.col("n_ab") / F.col("n_orders"), "support"),
            r6(lift, "lift"),
            lift.alias("_lift_exact"),
        )
        .orderBy(
            F.col("_lift_exact").desc(), "part_a", "part_b"
        )
        .limit(BASKET_TOP_K)
        .drop("_lift_exact")
    )
    return out


# ---------------------------------------------------------------------------
# Weighted median
# ---------------------------------------------------------------------------


WMED_PARTS = 8  # range partitions for the distributed weight prefix sum


@register(
    "q_weighted_median",
    """
WITH vals AS (
  SELECT l_returnflag, l_extendedprice AS price, sum(l_quantity) AS w
  FROM lineitem GROUP BY l_returnflag, l_extendedprice
), c AS (
  SELECT l_returnflag, price,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY price) AS cumw,
         sum(w) OVER (PARTITION BY l_returnflag) AS totw
  FROM vals
), hit AS (
  SELECT l_returnflag, price, totw,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY cumw) AS rn
  FROM c WHERE cumw >= totw / 2
)
SELECT l_returnflag,
       CAST(totw AS DOUBLE) AS total_weight,
       CAST(price AS DOUBLE) AS weighted_median_price
FROM hit WHERE rn = 1
""",
    "analytics",
    "order-statistic",
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per return flag: the
    smallest price whose cumulative quantity weight reaches half the
    total — the exact weighted order statistic (no interpolation, no
    sampling).

    Scale: weights collapse to per-VALUE sums first (one keyed agg,
    fully parallel), and the cumulative weight over the price order is
    the same DISTRIBUTED PREFIX SUM as q_pack_sequences /
    q_mann_whitney — range-partition by (flag, price), intra-partition
    cumsum, a (flag × partition)-row offset table broadcast back — so no
    per-flag single-partition sort ever touches the data (a naive
    PARTITION BY flag window funnels the whole fact table through ~3
    partitions at any scale). Weights are integer-valued doubles: every
    cumulative sum is exact, so both engines select the identical price.
    The lineage cut pins one sampled range-boundary set for the window
    and totals passes (same correctness argument as q_mann_whitney).
    """
    from .extensions.dedup import _cut_lineage

    li = load_table(spark, sf_dir, "lineitem")
    vals = _cut_lineage(
        li.groupBy("l_returnflag", F.col("l_extendedprice").alias("price"))
        .agg(F.sum("l_quantity").alias("w"))
        .repartitionByRange(WMED_PARTS, "l_returnflag", "price")
        .withColumn("pid", F.spark_partition_id())
    )
    wp = Window.partitionBy("l_returnflag", "pid").orderBy("price")
    local = vals.withColumn("local_end", F.sum("w").over(wp))
    totals = vals.groupBy("l_returnflag", "pid").agg(
        F.sum("w").alias("ptot")
    )
    # Range partitioning on (flag, price) is lexicographic, so within a
    # flag ascending pid IS ascending price range — the per-flag offset
    # is a running sum over the tiny (flag, pid) totals table.
    wo = (
        Window.partitionBy("l_returnflag")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "l_returnflag",
        "pid",
        F.coalesce(F.sum("ptot").over(wo), F.lit(0)).alias("poff"),
    )
    # Total weight per flag folds the tiny (flag, pid) totals table
    # instead of re-scanning vals a third time (guide §1.2). Exact:
    # weights are integer-valued doubles, so Σ_pid(Σ_partition w) ≡
    # Σ w regardless of grouping order.
    totw = totals.groupBy("l_returnflag").agg(F.sum("ptot").alias("totw"))
    c = (
        local.join(F.broadcast(offsets), ["l_returnflag", "pid"])
        .join(F.broadcast(totw), "l_returnflag")
        .select(
            "l_returnflag",
            "price",
            (F.col("poff") + F.col("local_end")).alias("cumw"),
            "totw",
        )
    )
    # Per-price weights merged + positive ⇒ cumw is strictly increasing
    # within a flag, so the first qualifying row is min(cumw) — an agg,
    # no second window pass.
    hit = (
        c.where(F.col("cumw") >= F.col("totw") / 2)
        .groupBy("l_returnflag")
        .agg(
            F.min(F.struct("cumw", "price", "totw")).alias("m"),
        )
    )
    return hit.select(
        "l_returnflag",
        F.col("m.totw").cast("double").alias("total_weight"),
        F.col("m.price").cast("double").alias("weighted_median_price"),
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival
# ---------------------------------------------------------------------------

#: Session gap threshold — same 30-minute convention as
#: q_session_ids_batch / q_session_window.
KM_GAP_MIN = 30


@register(
    "q_kaplan_meier",
    f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN floor(epoch(ts)) - floor(epoch(lag(ts) OVER w))
                   <= {KM_GAP_MIN * 60}
              THEN 0 ELSE 1 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
  FROM flagged
), sessions AS (
  SELECT user_id, seq,
         (CAST(floor(epoch(max(ts))) AS BIGINT)
          - CAST(floor(epoch(min(ts))) AS BIGINT)) // 60 AS dur_min
  FROM numbered GROUP BY user_id, seq
), obs AS (
  SELECT dur_min,
         CASE WHEN seq = max(seq) OVER (PARTITION BY user_id)
              THEN 0 ELSE 1 END AS ended
  FROM sessions
), per_t AS (
  SELECT dur_min, count(*) AS n_t, sum(ended) AS d_t
  FROM obs GROUP BY dur_min
), risk AS (
  SELECT dur_min, d_t,
         sum(n_t) OVER (ORDER BY dur_min DESC) AS n_at_risk
  FROM per_t
), km AS (
  SELECT dur_min, d_t, n_at_risk,
         CASE WHEN max(CASE WHEN d_t = n_at_risk THEN 1 ELSE 0 END)
                   OVER (ORDER BY dur_min) = 1
              THEN 0.0
              ELSE exp(sum(CASE WHEN d_t < n_at_risk
                                THEN ln(1 - CAST(d_t AS DOUBLE) / n_at_risk)
                           END) OVER (ORDER BY dur_min)) END AS s
  FROM risk
)
SELECT CAST(dur_min AS BIGINT) AS duration_min,
       CAST(n_at_risk AS BIGINT) AS n_at_risk,
       CAST(d_t AS BIGINT) AS n_ended,
       CAST(s AS REAL) AS km_survival
FROM km WHERE d_t > 0
""",
    "analytics",
    "survival",
)
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit survival curve over SESSION duration
    (whole minutes, 30-min-gap sessionization — same convention as
    q_session_ids_batch), with right-censoring: each user's
    chronologically last session may have outlived the corpus, so it
    counts in the at-risk set at every duration it survives through but
    contributes no termination event. S(t) = Π over ended-session
    durations ≤ t of (1 − d_t / n_t) — the standard survival estimator
    (retention teams read it as "chance a session lasts beyond t").

    Scale: sessionization is one user-keyed exchange shared by both
    window passes; every KM window then runs over the per-duration
    AGGREGATED table — at most one row per distinct whole-minute
    duration, corpus-size-independent — so the unpartitioned ordered
    windows are bounded, never data-sized. The cumulative product is
    exp∘Σln of single rational divisions (float32 canonicalization
    absorbs libm ulp drift); the S(t)=0 edge (a duration where every
    at-risk session ends) is an explicit zero on both engines, since
    Spark's log(0) is NULL while DuckDB's is -inf.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ok = (
        F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    ) <= KM_GAP_MIN * 60
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap_ok, 0).otherwise(1).alias("new_session"),
    )
    wseq = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    numbered = flagged.select(
        "user_id", "ts", F.sum("new_session").over(wseq).alias("seq")
    )
    sessions = numbered.groupBy("user_id", "seq").agg(
        (
            (F.max("ts").cast("long") - F.min("ts").cast("long"))
            / F.lit(60)
        )
        .cast("long")
        .alias("dur_min")
    )
    last_seq = F.max("seq").over(Window.partitionBy("user_id"))
    obs = sessions.select(
        "dur_min",
        F.when(F.col("seq") == last_seq, F.lit(0))
        .otherwise(F.lit(1))
        .alias("ended"),
    )
    per_t = obs.groupBy("dur_min").agg(
        F.count("*").alias("n_t"), F.sum("ended").alias("d_t")
    )
    # Windows below run over the per-duration table (≤ one row per
    # distinct whole-minute duration) — unpartitioned is fine at any
    # corpus size.
    w_desc = (
        Window.orderBy(F.col("dur_min").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    risk = per_t.select(
        "dur_min", "d_t", F.sum("n_t").over(w_desc).alias("n_at_risk")
    )
    w_asc = Window.orderBy("dur_min").rowsBetween(
        Window.unboundedPreceding, 0
    )
    hit_zero = F.max(
        F.when(F.col("d_t") == F.col("n_at_risk"), 1).otherwise(0)
    ).over(w_asc)
    sum_ln = F.sum(
        F.when(
            F.col("d_t") < F.col("n_at_risk"),
            F.log(1 - F.col("d_t").cast("double") / F.col("n_at_risk")),
        )
    ).over(w_asc)
    s = F.when(hit_zero == 1, F.lit(0.0)).otherwise(F.exp(sum_ln))
    return (
        risk.withColumn("s", s)
        .where(F.col("d_t") > 0)
        .select(
            F.col("dur_min").cast("long").alias("duration_min"),
            F.col("n_at_risk").cast("long").alias("n_at_risk"),
            F.col("d_t").cast("long").alias("n_ended"),
            r6("s", "km_survival"),
        )
    )
