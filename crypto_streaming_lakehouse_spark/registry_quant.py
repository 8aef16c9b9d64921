"""Quantitative time-series analytics over the trade/bar frames — the
operators a user of the reference's analysis layer reaches for next:
time-weighted average price (TWAP), running-peak drawdown, cross-symbol
return correlation, and linear gap interpolation (completing the
densify family's zero-fill / forward-fill with the third mode).

Registry conventions as everywhere: each query is a (Spark builder,
DuckDB oracle) pair, float outputs float32-canonicalized (r6/r6z),
set/row membership decided on integer-exact quantities only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.bars import gold_bars_cut
from .registry import BARS_CTE, r6, r6z, register
from .sources.tables import TRADES_CTE, events_as_trades, load_table

# ---------------------------------------------------------------------------
# Time-weighted average price (TWAP)
# ---------------------------------------------------------------------------


@register(
    "q_twap",
    TRADES_CTE
    + """
, t AS (
  SELECT symbol, event_time, price, event_id,
         date_trunc('hour', event_time) AS hour_start,
         date_trunc('hour', event_time) + INTERVAL 1 HOUR AS hour_end,
         lead(event_time) OVER (
           PARTITION BY symbol, date_trunc('hour', event_time)
           ORDER BY event_time, event_id) AS next_time
  FROM trades
), wtd AS (
  SELECT symbol, hour_start, price,
         epoch_us(coalesce(next_time, hour_end))
           - epoch_us(event_time) AS dur_us
  FROM t
)
SELECT symbol, hour_start,
       CAST(count(*) AS BIGINT) AS trades,
       CAST(sum(dur_us) AS BIGINT) AS covered_us,
       CAST(CASE WHEN sum(dur_us) > 0
            THEN sum(price * dur_us) / sum(dur_us) END AS REAL) AS twap
FROM wtd
GROUP BY symbol, hour_start
""",
    "quant",
    "agg",
)
def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average price per (symbol, hour): each trade's price
    weighted by the microseconds until the next same-symbol trade in the
    hour (the last trade carries to the hour end) — the execution
    benchmark that, unlike VWAP, is robust to burst volume. Weights are
    integer microseconds (unix_micros on both engines), so only the
    final ratio needs float canonicalization. Plan: one window + one
    aggregate, both on (symbol, hour) — a single shuffle, state bounded
    by symbols × hours at any scale."""
    trades = events_as_trades(spark, sf_dir)
    hour_start = F.date_trunc("hour", F.col("event_time"))
    t = trades.select(
        "symbol",
        "event_time",
        "price",
        "event_id",
        hour_start.alias("hour_start"),
        (hour_start + F.expr("INTERVAL 1 HOUR")).alias("hour_end"),
    )
    w = Window.partitionBy("symbol", "hour_start").orderBy(
        "event_time", "event_id"
    )
    wtd = t.select(
        "symbol",
        "hour_start",
        "price",
        (
            F.unix_micros(
                F.coalesce(F.lead("event_time").over(w), F.col("hour_end"))
            )
            - F.unix_micros("event_time")
        ).alias("dur_us"),
    )
    return wtd.groupBy("symbol", "hour_start").agg(
        F.count("*").alias("trades"),
        F.sum("dur_us").alias("covered_us"),
        r6(
            F.when(
                F.sum("dur_us") > 0,
                F.sum(F.col("price") * F.col("dur_us")) / F.sum("dur_us"),
            ),
            "twap",
        ),
    )


# ---------------------------------------------------------------------------
# Running-peak drawdown
# ---------------------------------------------------------------------------


@register(
    "q_drawdown",
    BARS_CTE
    + """
SELECT symbol, bar_start,
       CAST("close" AS REAL) AS close,
       CAST(peak AS REAL) AS peak,
       CAST(CASE WHEN peak <> 0 THEN (peak - "close") / peak END AS REAL)
         AS drawdown
FROM (
  SELECT symbol, bar_start, "close",
         max("close") OVER (
           PARTITION BY symbol ORDER BY bar_start
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
  FROM bars
)
""",
    "quant",
    "window",
)
def q_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bar drawdown from the running peak close — the risk metric
    behind max-drawdown reporting. The cumulative max is a prefix frame
    (no recomputation, single pass after one shuffle on symbol); peak
    SELECTS an existing close rather than computing, so only the final
    ratio is float-canonicalized."""
    bars = gold_bars_cut(spark, sf_dir)
    w = (
        Window.partitionBy("symbol")
        .orderBy("bar_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    peak = F.max("close").over(w)
    return bars.select(
        "symbol",
        "bar_start",
        r6(F.col("close"), "close"),
        r6(peak, "peak"),
        r6(F.when(peak != 0, (peak - F.col("close")) / peak), "drawdown"),
    )


# ---------------------------------------------------------------------------
# Cross-symbol return correlation
# ---------------------------------------------------------------------------


@register(
    "q_return_correlation",
    BARS_CTE
    + """
, rets AS (
  SELECT symbol, bar_start,
         CASE WHEN lag("close") OVER w <> 0
              THEN "close" / lag("close") OVER w - 1 END AS ret
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY bar_start)
)
SELECT a.symbol AS sym_a, b.symbol AS sym_b,
       CAST(count(*) AS BIGINT) AS n,
       CAST(CASE WHEN abs(corr(a.ret, b.ret)) < 1e-6 THEN 0
                 ELSE corr(a.ret, b.ret) END AS REAL) AS ret_corr
FROM rets a JOIN rets b
  ON a.bar_start = b.bar_start AND a.symbol < b.symbol
WHERE a.ret IS NOT NULL AND b.ret IS NOT NULL
GROUP BY a.symbol, b.symbol
""",
    "quant",
    "join",
)
def q_return_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise correlation of 1-minute simple returns between symbols,
    aligned on bar_start — the cross-asset dependence matrix (pairs
    trading, portfolio risk). Self-join on the minute key with symbol <
    symbol for each unordered pair once; at scale the join key is time
    (dense, unskewed) and the pair count is symbols², independent of
    data volume. Correlations are cancellation-prone near 0, so r6z
    snaps |corr| < 1e-6 on both engines. The simple return guards
    lag(close) <> 0 on both engines: sf0.1 events contain non-positive
    prices that smaller scales don't (the known ANSI divide-by-zero
    hazard class), and a zero denominator has no meaningful return."""
    bars = gold_bars_cut(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("bar_start")
    prev = F.lag("close").over(w)
    rets = bars.select(
        "symbol",
        "bar_start",
        F.when(prev != 0, F.col("close") / prev - 1).alias("ret"),
    ).where(F.col("ret").isNotNull())
    a = rets.select(
        F.col("symbol").alias("sym_a"),
        F.col("bar_start").alias("t"),
        F.col("ret").alias("ret_a"),
    )
    b = rets.select(
        F.col("symbol").alias("sym_b"),
        F.col("bar_start").alias("t2"),
        F.col("ret").alias("ret_b"),
    )
    return (
        a.join(
            b,
            (F.col("t") == F.col("t2")) & (F.col("sym_a") < F.col("sym_b")),
        )
        .groupBy("sym_a", "sym_b")
        .agg(
            F.count("*").alias("n"),
            r6z(F.corr("ret_a", "ret_b"), "ret_corr"),
        )
    )


# ---------------------------------------------------------------------------
# Linear interpolation on the dense minute grid
# ---------------------------------------------------------------------------


@register(
    "q_interpolate_linear",
    BARS_CTE
    + """
, bounds AS (
  SELECT symbol, min(bar_start) AS lo, max(bar_start) AS hi FROM bars
  GROUP BY symbol
), grid AS (
  SELECT symbol, unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS bar_start
  FROM bounds
), joined AS (
  SELECT g.symbol, g.bar_start, b."close" AS close_obs,
         b.bar_start AS t_obs
  FROM grid g LEFT JOIN bars b
    ON b.symbol = g.symbol AND b.bar_start = g.bar_start
), filled AS (
  SELECT symbol, bar_start, close_obs,
         last_value(close_obs IGNORE NULLS) OVER wb AS prev_close,
         last_value(t_obs IGNORE NULLS) OVER wb AS prev_t,
         first_value(close_obs IGNORE NULLS) OVER wf AS next_close,
         first_value(t_obs IGNORE NULLS) OVER wf AS next_t
  FROM joined
  WINDOW wb AS (PARTITION BY symbol ORDER BY bar_start
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY symbol ORDER BY bar_start
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT symbol, bar_start,
       CAST(close_obs IS NOT NULL AS BOOLEAN) AS observed,
       CAST(CASE
         WHEN close_obs IS NOT NULL THEN close_obs
         WHEN prev_close IS NULL THEN next_close
         WHEN next_close IS NULL THEN prev_close
         ELSE prev_close
              + (next_close - prev_close)
                * (epoch_us(bar_start) - epoch_us(prev_t))
                / (epoch_us(next_t) - epoch_us(prev_t))
       END AS REAL) AS close_interp
FROM filled
""",
    "quant",
    "densify",
)
def q_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of missing minutes on the dense per-symbol
    grid — the third gap-fill mode next to q_densify_ffill's zero-fill
    and forward-fill. Neighbor values come from ignorenulls window
    lookups (prev pair and next pair are null together on grid-only
    rows, so per-column fills stay row-consistent); time deltas are
    integer microseconds, only the blend is float. Two window passes
    over one (symbol) shuffle; grid size is time-range × symbols."""
    bars = gold_bars_cut(spark, sf_dir)
    bounds = bars.groupBy("symbol").agg(
        F.min("bar_start").alias("lo"), F.max("bar_start").alias("hi")
    )
    grid = bounds.select(
        "symbol",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 MINUTE"))).alias(
            "bar_start"
        ),
    )
    b = bars.select(
        F.col("symbol").alias("b_symbol"),
        F.col("bar_start").alias("t_obs"),
        F.col("close").alias("close_obs"),
    )
    joined = grid.join(
        b,
        (F.col("symbol") == F.col("b_symbol"))
        & (F.col("bar_start") == F.col("t_obs")),
        "left",
    ).select("symbol", "bar_start", "close_obs", "t_obs")
    # Both lookups use GROWING frames ([unboundedPreceding, currentRow]),
    # which Spark's WindowExec maintains incrementally in O(n); the
    # forward lookup runs over REVERSED time order instead of a
    # [currentRow, unboundedFollowing] frame — that shrinking frame is
    # recomputed per row (O(n²) per partition: 43k grid minutes/symbol
    # took ~240 s at sf0.01; this shape takes ~2 s).
    wb = (
        Window.partitionBy("symbol")
        .orderBy("bar_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf_rev = (
        Window.partitionBy("symbol")
        .orderBy(F.desc("bar_start"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = joined.select(
        "symbol",
        "bar_start",
        "close_obs",
        F.last("close_obs", ignorenulls=True).over(wb).alias("prev_close"),
        F.last("t_obs", ignorenulls=True).over(wb).alias("prev_t"),
        F.last("close_obs", ignorenulls=True).over(wf_rev).alias("next_close"),
        F.last("t_obs", ignorenulls=True).over(wf_rev).alias("next_t"),
    )
    frac = (
        (F.unix_micros("bar_start") - F.unix_micros("prev_t")).cast("double")
        / (F.unix_micros("next_t") - F.unix_micros("prev_t")).cast("double")
    )
    interp = (
        F.when(F.col("close_obs").isNotNull(), F.col("close_obs"))
        .when(F.col("prev_close").isNull(), F.col("next_close"))
        .when(F.col("next_close").isNull(), F.col("prev_close"))
        .otherwise(
            F.col("prev_close")
            + (F.col("next_close") - F.col("prev_close")) * frac
        )
    )
    return filled.select(
        "symbol",
        "bar_start",
        F.col("close_obs").isNotNull().alias("observed"),
        r6(interp, "close_interp"),
    )


# ---------------------------------------------------------------------------
# Range-based volatility estimators (Parkinson, Garman–Klass)
# ---------------------------------------------------------------------------


@register(
    "q_volatility_estimators",
    BARS_CTE
    + """
SELECT symbol, bar_date,
       CAST(count(*) AS BIGINT) AS bars,
       CAST(sqrt(sum(pow(ln(high / low), 2)) / (4 * ln(2) * count(*)))
            AS REAL) AS parkinson,
       CAST(sqrt(sum(0.5 * pow(ln(high / low), 2)
                     - (2 * ln(2) - 1) * pow(ln("close" / "open"), 2))
                 / count(*)) AS REAL) AS garman_klass
FROM bars
WHERE high > 0 AND low > 0 AND "open" > 0 AND "close" > 0
GROUP BY symbol, bar_date
""",
    "quant",
    "agg",
)
def q_volatility_estimators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-based daily volatility from intraday bars: Parkinson (high/
    low range) and Garman–Klass (range + open/close) — 5–7× more
    efficient than close-to-close sampling at the same bar count, the
    standard estimators over exactly the OHLC columns the Gold layer
    already carries. One aggregate over (symbol, day): a single shuffle
    with tiny output, scan-side partial aggregation at any scale."""
    bars = gold_bars_cut(spark, sf_dir)
    hl2 = F.pow(F.log(F.col("high") / F.col("low")), 2)
    co2 = F.pow(F.log(F.col("close") / F.col("open")), 2)
    ln2 = 0.6931471805599453
    return (
        bars.where(
            (F.col("high") > 0)
            & (F.col("low") > 0)
            & (F.col("open") > 0)
            & (F.col("close") > 0)
        )
        .groupBy("symbol", "bar_date")
        .agg(
            F.count("*").alias("bars"),
            r6(
                F.sqrt(F.sum(hl2) / (4 * ln2 * F.count("*"))),
                "parkinson",
            ),
            r6(
                F.sqrt(
                    F.sum(0.5 * hl2 - (2 * ln2 - 1) * co2) / F.count("*")
                ),
                "garman_klass",
            ),
        )
    )


# ---------------------------------------------------------------------------
# Order-flow imbalance per bar
# ---------------------------------------------------------------------------


@register(
    "q_orderflow_imbalance",
    TRADES_CTE
    + """
SELECT symbol,
       date_trunc('minute', event_time) AS bar_start,
       CAST(sum(CASE WHEN side = 'buy' THEN size ELSE 0 END) AS REAL)
         AS buy_vol,
       CAST(sum(CASE WHEN side = 'sell' THEN size ELSE 0 END) AS REAL)
         AS sell_vol,
       CAST(CASE WHEN sum(size) <> 0
            THEN (sum(CASE WHEN side = 'buy' THEN size ELSE 0 END)
                  - sum(CASE WHEN side = 'sell' THEN size ELSE 0 END))
                 / sum(size) END AS REAL) AS imbalance
FROM trades
GROUP BY symbol, date_trunc('minute', event_time)
""",
    "quant",
    "agg",
)
def q_orderflow_imbalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed order-flow imbalance per (symbol, minute): (buy − sell) /
    total volume, the classic microstructure pressure signal computed
    from the same grouping the OHLCV bars use — conditional sums fold
    into the one existing aggregate pass, so the signal is free if
    computed alongside the bars (same single shuffle)."""
    trades = events_as_trades(spark, sf_dir)
    buy = F.sum(F.when(F.col("side") == "buy", F.col("size")).otherwise(0.0))
    sell = F.sum(F.when(F.col("side") == "sell", F.col("size")).otherwise(0.0))
    total = F.sum("size")
    return trades.groupBy(
        "symbol", F.date_trunc("minute", "event_time").alias("bar_start")
    ).agg(
        r6(buy, "buy_vol"),
        r6(sell, "sell_vol"),
        r6(F.when(total != 0, (buy - sell) / total), "imbalance"),
    )


# ---------------------------------------------------------------------------
# Candlestick pattern flags
# ---------------------------------------------------------------------------


@register(
    "q_candlestick_flags",
    BARS_CTE
    + """
SELECT symbol, bar_start,
       CAST(abs("close" - "open") <= 0.1 * (high - low) AND high > low
            AS BOOLEAN) AS is_doji,
       CAST("close" > "open"
            AND lag("close") OVER w < lag("open") OVER w
            AND "close" >= lag("open") OVER w
            AND "open" <= lag("close") OVER w
            AS BOOLEAN) AS is_bull_engulf,
       CAST((high - low) > 2 * abs("close" - "open")
            AND (least("open", "close") - low)
                >= 0.6 * (high - low)
            AS BOOLEAN) AS is_hammer
FROM bars
WINDOW w AS (PARTITION BY symbol ORDER BY bar_start)
""",
    "quant",
    "window",
)
def q_candlestick_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic candlestick morphology flags per bar — doji (body ≤ 10%
    of range), bullish engulfing (green body engulfing the previous red
    body, via lag), hammer (long lower shadow). All comparisons are on
    unmodified OHLC doubles or products of them (IEEE-deterministic on
    both engines), so the booleans are bit-exact — no float
    canonicalization needed. One window shuffle on symbol."""
    bars = gold_bars_cut(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("bar_start")
    o, c, h, lo = (F.col(x) for x in ("open", "close", "high", "low"))
    body = F.abs(c - o)
    rng = h - lo
    prev_o = F.lag("open").over(w)
    prev_c = F.lag("close").over(w)
    return bars.select(
        "symbol",
        "bar_start",
        ((body <= 0.1 * rng) & (h > lo)).alias("is_doji"),
        (
            (c > o)
            & (prev_c < prev_o)
            & (c >= prev_o)
            & (o <= prev_c)
        ).alias("is_bull_engulf"),
        (
            (rng > 2 * body)
            & ((F.least(o, c) - lo) >= 0.6 * rng)
        ).alias("is_hammer"),
    )
