"""Round-7 batch 3: resampling inference and changepoint detection —

- **Poisson bootstrap CI** (the distributed bootstrap: per-replicate
  Poisson(1) resample counts derived from a portable hash, replicate
  means, nearest-rank confidence bounds — how uncertainty is estimated
  when the data cannot sit on one machine),
- **binary-segmentation changepoint** (per-symbol single best mean-shift
  split of the bar-close series by the scaled CUSUM criterion — the
  first round of binary segmentation, prefix-sum exact).

Registry conventions as everywhere (see registry.py): (Spark builder,
DuckDB oracle) pairs via ``@register``; hashes are md5-derived
(functions.hashing) so both engines draw identical resamples; float
outputs are float32-canonicalized (r6) at the output boundary.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.hashing import md5_int32, md5_int32_sql
from .operators.bars import gold_bars_cut
from .registry import BARS_CTE, r6, register
from .sources.tables import load_table

# ---------------------------------------------------------------------------
# Poisson bootstrap
# ---------------------------------------------------------------------------

BOOT_B = 32  # bootstrap replicates
#: Cumulative Poisson(1) CDF thresholds: a uniform u in [0,1) maps to the
#: resample count c = #{thresholds <= u}. Truncated at 8 draws (the
#: omitted tail mass is < 1.2e-6 — one in ~9e5 row-replicates).
_POIS_CDF = []
_acc = 0.0
for _k in range(8):
    _acc += math.exp(-1.0) / math.factorial(_k)
    _POIS_CDF.append(_acc)

#: Nearest-rank 2.5% / 97.5% bounds over B=32 sorted replicate means.
_LO_RANK = 2  # 1-based: 2nd smallest
_HI_RANK = 31  # 1-based: 2nd largest


def _pois_case_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {t!r} THEN {k}" for k, t in enumerate(_POIS_CDF)
    )
    return f"CASE {branches} ELSE 8 END"


@register(
    "q_poisson_bootstrap",
    f"""
WITH draws AS (
  SELECT o_orderpriority, o_totalprice, b.b,
         {_pois_case_sql(
             "CAST(" + md5_int32_sql(
                 "CAST(o_orderkey AS VARCHAR) || ':' || CAST(b.b AS VARCHAR)"
             ) + " AS DOUBLE) / 4294967296.0"
         )} AS c
  FROM orders CROSS JOIN (SELECT unnest(generate_series(0, {BOOT_B - 1})) AS b) b
), reps AS (
  SELECT o_orderpriority, b,
         sum(o_totalprice * c) / sum(c) AS mean_b
  FROM draws GROUP BY o_orderpriority, b HAVING sum(c) > 0
), ranked AS (
  SELECT o_orderpriority, mean_b,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY mean_b, b) AS rk
  FROM reps
), base AS (
  SELECT o_orderpriority, count(*) AS n_orders, avg(o_totalprice) AS mean_price
  FROM orders GROUP BY o_orderpriority
)
SELECT base.o_orderpriority,
       CAST(n_orders AS BIGINT) AS n_orders,
       CAST(mean_price AS REAL) AS mean_price,
       CAST(min(CASE WHEN rk = {_LO_RANK} THEN mean_b END) AS REAL) AS ci_lo,
       CAST(min(CASE WHEN rk = {_HI_RANK} THEN mean_b END) AS REAL) AS ci_hi
FROM base JOIN ranked ON base.o_orderpriority = ranked.o_orderpriority
GROUP BY base.o_orderpriority, n_orders, mean_price
""",
    "stats",
    "resampling",
)
def q_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for the mean order price per
    priority: each of B=32 replicates resamples every order
    Poisson(1)-many times (the distributed approximation of draw-N-with-
    replacement — counts are independent per row, so no global coordination
    is ever needed), computes the weighted replicate mean, and the CI is
    the nearest-rank 2.5%/97.5% of the sorted replicate means. The
    per-(row, replicate) count is the inverse Poisson CDF of a portable
    md5 uniform, so both engines draw the IDENTICAL resamples.

    Scale: a bounded ×B row multiplier into one keyed partial agg —
    replicate sums combine map-side; the rank/CI step runs over the
    (priorities × B)-row replicate table. This is the canonical
    shared-nothing bootstrap: no resample ever materializes N draws.
    """
    orders = load_table(spark, sf_dir, "orders")
    b = F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b")
    u = (
        md5_int32(
            F.concat_ws(
                ":", F.col("o_orderkey").cast("string"), F.col("b").cast("string")
            )
        ).cast("double")
        / F.lit(4294967296.0)
    )
    c = F.lit(8)
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        c = F.when(u < F.lit(_POIS_CDF[k]), F.lit(k)).otherwise(c)
    draws = orders.select(
        "o_orderkey", "o_orderpriority", "o_totalprice", b
    ).select("o_orderpriority", "o_totalprice", "b", c.alias("c"))
    reps = (
        draws.groupBy("o_orderpriority", "b")
        .agg(
            F.sum(F.col("o_totalprice") * F.col("c")).alias("sx"),
            F.sum("c").alias("sc"),
        )
        .where(F.col("sc") > 0)
        .select(
            "o_orderpriority", "b", (F.col("sx") / F.col("sc")).alias("mean_b")
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("o_orderpriority").orderBy("mean_b", "b")
    )
    ranked = reps.withColumn("rk", rk)
    ci = ranked.groupBy("o_orderpriority").agg(
        F.min(F.when(F.col("rk") == _LO_RANK, F.col("mean_b"))).alias("lo"),
        F.min(F.when(F.col("rk") == _HI_RANK, F.col("mean_b"))).alias("hi"),
    )
    base = orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.avg("o_totalprice").alias("mean_price"),
    )
    return base.join(ci, "o_orderpriority").select(
        "o_orderpriority",
        F.col("n_orders").cast("long").alias("n_orders"),
        r6("mean_price", "mean_price"),
        r6("lo", "ci_lo"),
        r6("hi", "ci_hi"),
    )


# ---------------------------------------------------------------------------
# Binary-segmentation changepoint
# ---------------------------------------------------------------------------

CP_MIN_SEG = 10  # minimum bars on each side of a candidate split


@register(
    "q_changepoint_split",
    BARS_CTE
    + f"""
, seq AS (
  SELECT symbol, bar_start, "close",
         row_number() OVER w AS k,
         sum("close") OVER (PARTITION BY symbol ORDER BY bar_start
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sk,
         count(*) OVER (PARTITION BY symbol) AS n,
         sum("close") OVER (PARTITION BY symbol) AS s
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY bar_start)
), scored AS (
  SELECT symbol, bar_start, k, n,
         sk / k AS mean_left,
         (s - sk) / (n - k) AS mean_right,
         sqrt(CAST(k AS DOUBLE) * (n - k) / n)
           * abs(sk / k - (s - sk) / (n - k)) AS t_stat
  FROM seq
  WHERE k >= {CP_MIN_SEG} AND k <= n - {CP_MIN_SEG}
), best AS (
  SELECT symbol, bar_start, mean_left, mean_right, t_stat,
         row_number() OVER (PARTITION BY symbol
                            ORDER BY t_stat DESC, bar_start) AS rn
  FROM scored
)
SELECT symbol, bar_start AS split_bar,
       CAST(mean_left AS REAL) AS mean_left,
       CAST(mean_right AS REAL) AS mean_right,
       CAST(t_stat AS REAL) AS t_stat
FROM best WHERE rn = 1
""",
    "timeseries",
    "changepoint",
)
def q_changepoint_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single best mean-shift changepoint per symbol over the bar-close
    series (the first round of binary segmentation): maximize the scaled
    CUSUM criterion √(k(n−k)/n)·|mean_left − mean_right| over all splits
    leaving ≥ CP_MIN_SEG bars on each side; earliest bar wins ties. The
    companion to q_cusum_drift — that one flags drift online, this one
    localizes the break offline.

    Scale: prefix sums over the symbol-partitioned bar order (the same
    one exchange the bars table carries), then a per-symbol top-1 — the
    criterion for every candidate split comes from the prefix sums, so
    the scan is O(n) with no per-split recomputation. Prefix sums are
    evaluated in the same deterministic bar order on both engines, so
    the argmax compares bit-identical doubles.
    """
    bars = gold_bars_cut(spark, sf_dir)
    wo = Window.partitionBy("symbol").orderBy("bar_start")
    wcum = wo.rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy("symbol")
    seq = bars.select(
        "symbol",
        "bar_start",
        F.row_number().over(wo).alias("k"),
        F.sum("close").over(wcum).alias("sk"),
        F.count("*").over(wall).alias("n"),
        F.sum("close").over(wall).alias("s"),
    )
    ml = F.col("sk") / F.col("k")
    mr = (F.col("s") - F.col("sk")) / (F.col("n") - F.col("k"))
    t = F.sqrt(
        F.col("k").cast("double") * (F.col("n") - F.col("k")) / F.col("n")
    ) * F.abs(ml - mr)
    scored = seq.where(
        (F.col("k") >= CP_MIN_SEG) & (F.col("k") <= F.col("n") - CP_MIN_SEG)
    ).select(
        "symbol",
        "bar_start",
        ml.alias("mean_left"),
        mr.alias("mean_right"),
        t.alias("t_stat"),
    )
    rn = F.row_number().over(
        Window.partitionBy("symbol").orderBy(
            F.col("t_stat").desc(), "bar_start"
        )
    )
    return (
        scored.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select(
            "symbol",
            F.col("bar_start").alias("split_bar"),
            r6("mean_left", "mean_left"),
            r6("mean_right", "mean_right"),
            r6("t_stat", "t_stat"),
        )
    )
