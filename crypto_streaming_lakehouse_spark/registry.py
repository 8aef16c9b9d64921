"""Named query registry: every operator from SURVEY.md §2 as a
(Spark DataFrame builder, DuckDB oracle SQL) pair.

The driver contract (`__spark_entry__.py`) runs both sides at sf=0.01 and
compares row-count + schema + order-insensitive value hash. Conventions that
make the comparison deterministic (SURVEY.md §7 hard parts):

- every computed column is aliased identically on both sides;
- float aggregates / transcendental results are ``CAST(x AS REAL)`` on both
  sides (sum order and libm may differ in final ulps);
- scalar functions that return INT in Spark but BIGINT in DuckDB are cast
  to long on the Spark side;
- DuckDB's tz-aware ``to_timestamp`` is avoided in oracles — ``epoch_ms``
  keeps timestamps naive like Spark's session-UTC timestamps;
- Spark's NaN-returning ``stddev_samp`` over 1-row frames is normalized to
  NULL (operators.analysis) to match ANSI semantics.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.symbols import (
    normalize_symbol_expr,
    normalize_symbol_sql,
    normalize_symbol_udf,
)
from .operators import analysis as A
from .operators.bars import gold_bars_cut
from .schemas import DEDUP_KEY
from .sources.tables import TRADES_CTE, events_as_trades, load_table

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    sql: str | None  # None → non-SQL-expressible; driver does rows-only check
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, sql: str | None, *tags: str):
    def deco(fn: QueryFn) -> QueryFn:
        # A duplicate name would silently REPLACE an operator (and its
        # oracle) across the whole driver/test surface — fail loudly at
        # import time instead.
        if name in REGISTRY:
            raise ValueError(f"duplicate registry name: {name}")
        REGISTRY[name] = QueryDef(name, fn, sql, tuple(tags))
        return fn

    return deco


def r6(c, alias: str):
    """Float32-cast a compared float column (oracle twin: CAST(x AS REAL)).

    Canonicalization for the oracle hash: Spark and DuckDB may differ in the
    last ulps of a double (sum order, libm, Welford vs two-pass stddev), and
    decimal rounding half-way boundaries make round(x, 6) itself unstable
    (observed at sf0.1: 4.1390625 rounded differently by the two engines).
    Casting both sides to float32 collapses near-equal doubles to identical
    bits with ~2^-24 relative slack.
    """
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("float").alias(alias)


def r6z(c, alias: str):
    """Like r6, plus snap |x| < 1e-6 to exact 0 (oracle twin:
    CAST(CASE WHEN abs(x) < 1e-6 THEN 0 ELSE x END AS REAL)).

    For cancellation-prone outputs (means of signed values, z-scores): when
    the true value is ~0, the two engines' sums land at different tiny
    magnitudes (±1e-9) — beyond any relative tolerance — so only an absolute
    snap makes them comparable. Also normalizes -0.0 vs 0.0.
    """
    c = F.col(c) if isinstance(c, str) else c
    snapped = F.when(F.abs(c) < 1e-6, F.lit(0.0)).otherwise(c)
    return snapped.cast("float").alias(alias)


def _sql_z(expr: str) -> str:
    return f"CAST(CASE WHEN abs({expr}) < 1e-6 THEN 0 ELSE {expr} END AS REAL)"


# ---------------------------------------------------------------------------
# Shared oracle CTEs
# ---------------------------------------------------------------------------

BARS_CTE = (
    TRADES_CTE
    + """
, bars AS (
  SELECT symbol,
         date_trunc('minute', event_time) AS bar_start,
         date_trunc('minute', event_time) + INTERVAL 1 MINUTE AS bar_end,
         arg_min(price, event_time) AS "open",
         max(price) AS high,
         min(price) AS low,
         arg_max(price, event_time) AS "close",
         sum(size) AS volume,
         CASE WHEN sum(size) <> 0
              THEN sum(price * size) / sum(size) END AS vwap,
         count(*) AS trades,
         CAST(date_trunc('minute', event_time) AS DATE) AS bar_date
  FROM trades
  GROUP BY symbol, date_trunc('minute', event_time)
)
"""
)

# Windowed signal stack mirroring /root/reference/notebooks/analysis.ipynb
# cell 4 (lag/lead → log returns → trailing 30-min RANGE frame stats →
# guarded z-scores → gap pct).
SIGNALS_CTE = (
    BARS_CTE
    + """
, g AS (
  SELECT symbol, bar_start, "open", "close", vwap, volume,
         CAST(epoch(bar_start) AS BIGINT) AS ts_s
  FROM bars
), g1 AS (
  SELECT *,
         lag("close") OVER w AS prev_close,
         lead("open") OVER w AS next_open
  FROM g WINDOW w AS (PARTITION BY symbol ORDER BY ts_s)
), g2 AS (
  SELECT *,
         CASE WHEN prev_close IS NOT NULL AND prev_close <> 0
              THEN ("close" / prev_close) - 1 END AS ret,
         CASE WHEN prev_close > 0 AND "close" > 0
              THEN ln("close" / prev_close) END AS logret
  FROM g1
), g3 AS (
  SELECT *,
         avg(logret)         OVER wt AS ret_mu,
         stddev_samp(logret) OVER wt AS ret_sd,
         avg(volume)         OVER wt AS vol_mu,
         stddev_samp(volume) OVER wt AS vol_sd
  FROM g2
  WINDOW wt AS (PARTITION BY symbol ORDER BY ts_s
                RANGE BETWEEN 1800 PRECEDING AND 1 PRECEDING)
), sig AS (
  SELECT *,
         CASE WHEN ret_sd IS NOT NULL AND ret_sd > 1e-9
              THEN (logret - ret_mu) / ret_sd END AS z_ret,
         CASE WHEN vol_sd IS NOT NULL AND vol_sd > 1e-9
              THEN (volume - vol_mu) / vol_sd END AS z_vol,
         CASE WHEN next_open IS NOT NULL AND "close" <> 0
              THEN (next_open - "close") / "close" END AS gap_pct
  FROM g3
)
"""
)


def _bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold_bars_cut(spark, sf_dir)


# ---------------------------------------------------------------------------
# Flagship: OHLCV bars (A1–A6, P13, T2-in-batch)
# ---------------------------------------------------------------------------


@register(
    "q_ohlcv_bars",
    BARS_CTE
    + """
SELECT symbol, bar_start, bar_end, "open", high, low, "close",
       CAST(volume AS REAL) AS volume, CAST(vwap AS REAL) AS vwap, trades, bar_date
FROM bars
""",
    "agg",
    "window",
)
def q_ohlcv_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bars(spark, sf_dir).select(
        "symbol",
        "bar_start",
        "bar_end",
        "open",
        "high",
        "low",
        "close",
        r6("volume", "volume"),
        r6("vwap", "vwap"),
        "trades",
        "bar_date",
    )


@register(
    "q_tumbling_window_batch",
    TRADES_CTE
    + """
SELECT symbol,
       date_trunc('minute', event_time) AS bar_start,
       date_trunc('minute', event_time) + INTERVAL 1 MINUTE AS bar_end,
       count(*) AS n_events,
       CAST(sum(price) AS REAL) AS sum_price
FROM trades GROUP BY 1, 2, 3
""",
    "window",
)
def q_tumbling_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = events_as_trades(spark, sf_dir)
    return (
        t.groupBy("symbol", F.window("event_time", "1 minute").alias("w"))
        .agg(F.count("*").alias("n_events"), r6(F.sum("price"), "sum_price"))
        .select(
            "symbol",
            F.col("w.start").alias("bar_start"),
            F.col("w.end").alias("bar_end"),
            "n_events",
            "sum_price",
        )
    )


@register(
    "q_argmin_argmax",
    TRADES_CTE
    + """
SELECT symbol,
       arg_min(price, event_time) AS first_price,
       arg_max(price, event_time) AS last_price,
       min(event_time) AS first_time,
       max(event_time) AS last_time
FROM trades GROUP BY symbol
""",
    "agg",
)
def q_argmin_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_as_trades(spark, sf_dir).groupBy("symbol").agg(
        F.min_by("price", "event_time").alias("first_price"),
        F.max_by("price", "event_time").alias("last_price"),
        F.min("event_time").alias("first_time"),
        F.max("event_time").alias("last_time"),
    )


@register(
    "q_global_agg",
    TRADES_CTE
    + """
SELECT count(*) AS n_rows,
       min(event_time) AS first_event,
       max(event_time) AS last_event,
       CAST(sum(price) AS REAL) AS sum_price
FROM trades
""",
    "agg",
)
def q_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_as_trades(spark, sf_dir).agg(
        F.count("*").alias("n_rows"),
        F.min("event_time").alias("first_event"),
        F.max("event_time").alias("last_event"),
        r6(F.sum("price"), "sum_price"),
    )


@register(
    "q_count_nonnull",
    TRADES_CTE
    + """
SELECT symbol, count(*) AS n_rows,
       count(CASE WHEN price > 100 THEN price END) AS n_high
FROM trades GROUP BY symbol
""",
    "agg",
)
def q_count_nonnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        events_as_trades(spark, sf_dir)
        .withColumn("price_high", F.when(F.col("price") > 100, F.col("price")))
        .groupBy("symbol")
        .agg(F.count("*").alias("n_rows"), F.count("price_high").alias("n_high"))
    )


@register(
    "q_groupby_agg",
    """
SELECT l_returnflag, l_linestatus,
       CAST(sum(l_quantity) AS REAL) AS sum_qty,
       CAST(sum(l_extendedprice) AS REAL) AS sum_base_price,
       CAST(sum(l_extendedprice * (1 - l_discount)) AS REAL) AS sum_disc_price,
       CAST(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS REAL) AS sum_charge,
       CAST(avg(l_quantity) AS REAL) AS avg_qty,
       CAST(avg(l_extendedprice) AS REAL) AS avg_price,
       CAST(avg(l_discount) AS REAL) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    "agg",
)
def q_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical grouped-aggregation benchmark query."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r6(F.sum("l_quantity"), "sum_qty"),
            r6(F.sum("l_extendedprice"), "sum_base_price"),
            r6(F.sum(disc_price), "sum_disc_price"),
            r6(F.sum(disc_price * (1 + F.col("l_tax"))), "sum_charge"),
            r6(F.avg("l_quantity"), "avg_qty"),
            r6(F.avg("l_extendedprice"), "avg_price"),
            r6(F.avg("l_discount"), "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Projection / scalar expressions (P1–P11)
# ---------------------------------------------------------------------------


@register(
    "q_project_rename",
    "SELECT event_id AS id, event_type AS symbol, ts AS event_time, value AS price FROM events",
    "scalar",
)
def q_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("id"),
        F.col("event_type").alias("symbol"),
        F.col("ts").alias("event_time"),
        F.col("value").alias("price"),
    )


@register(
    "q_cast",
    """
SELECT event_id,
       CAST(user_id AS INTEGER) AS uid_int,
       CAST(user_id AS DOUBLE) AS uid_dbl,
       CAST(user_id AS VARCHAR) AS uid_str,
       CAST(trunc(value) AS BIGINT) AS value_long,
       CAST(ts AS DATE) AS ts_date
FROM events
""",
    "scalar",
)
def q_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark's double→integral cast truncates toward zero; DuckDB's rounds,
    # hence trunc() on the oracle side.
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.col("user_id").cast("int").alias("uid_int"),
        F.col("user_id").cast("double").alias("uid_dbl"),
        F.col("user_id").cast("string").alias("uid_str"),
        F.col("value").cast("long").alias("value_long"),
        F.col("ts").cast("date").alias("ts_date"),
    )


@register(
    "q_derived_cols",
    """
SELECT event_id,
       CAST(ts AS DATE) AS event_date,
       date_trunc('minute', ts) AS event_minute,
       len(props) AS props_len
FROM events
""",
    "scalar",
)
def q_derived_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .withColumn("event_date", F.to_date("ts"))
        .withColumn("event_minute", F.date_trunc("minute", F.col("ts")))
        .withColumn("props_len", F.length("props").cast("long"))
        .select("event_id", "event_date", "event_minute", "props_len")
    )


@register(
    "q_filter_eq",
    TRADES_CTE + "SELECT event_id, symbol, price FROM trades WHERE symbol = 'purchase'",
    "filter",
)
def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        events_as_trades(spark, sf_dir)
        .where(F.col("symbol") == "purchase")
        .select("event_id", "symbol", "price")
    )


@register(
    "q_filter_null_threshold",
    TRADES_CTE
    + """
SELECT event_id, price, user_id FROM trades
WHERE price IS NOT NULL AND price > 1e-12 AND user_id % 3 = 0
""",
    "filter",
)
def q_filter_null_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        events_as_trades(spark, sf_dir)
        .where(
            F.col("price").isNotNull()
            & (F.col("price") > 1e-12)
            & (F.col("user_id") % 3 == 0)
        )
        .select("event_id", "price", "user_id")
    )


@register(
    "q_when_null_else",
    TRADES_CTE
    + """
SELECT event_id,
       CASE WHEN price > 100 THEN price END AS price_high,
       CASE WHEN side = 'buy' THEN price ELSE -price END AS signed_price,
       CASE WHEN price > 150 THEN 'hot' WHEN price > 75 THEN 'warm' END AS bucket
FROM trades
""",
    "scalar",
)
def q_when_null_else(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = events_as_trades(spark, sf_dir)
    return t.select(
        "event_id",
        F.when(F.col("price") > 100, F.col("price")).alias("price_high"),
        F.when(F.col("side") == "buy", F.col("price"))
        .otherwise(-F.col("price"))
        .alias("signed_price"),
        F.when(F.col("price") > 150, "hot")
        .when(F.col("price") > 75, "warm")
        .alias("bucket"),
    )


@register(
    "q_from_json",
    """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k2
FROM events
""",
    "scalar",
)
def q_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.from_json("props", "k INT").getField("k").alias("k"),
        F.get_json_object("props", "$.k").cast("int").alias("k2"),
    )


@register(
    "q_epoch_ms_to_ts",
    TRADES_CTE
    + """
SELECT event_id,
       epoch_ms(event_time) AS ms,
       epoch_ms(epoch_ms(event_time)) AS ts_ms,
       epoch_ms(CAST(floor(epoch_ms(event_time) / 1000) AS BIGINT) * 1000) AS ts_sec
FROM trades
""",
    "scalar",
)
def q_epoch_ms_to_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = events_as_trades(spark, sf_dir)
    ms = F.unix_millis(F.col("event_time"))
    return t.select(
        "event_id",
        ms.alias("ms"),
        F.timestamp_millis(ms).alias("ts_ms"),
        F.floor(ms / 1000).cast("timestamp").alias("ts_sec"),
    )


@register(
    "q_date_funcs",
    TRADES_CTE
    + """
SELECT event_id,
       CAST(event_time AS DATE) AS d,
       CAST(floor(epoch(event_time)) AS BIGINT) AS epoch_s,
       year(event_time) AS y, month(event_time) AS mo, day(event_time) AS dom,
       hour(event_time) AS h, minute(event_time) AS mi,
       dayofweek(event_time) + 1 AS dow
FROM trades
""",
    "scalar",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DuckDB's date-part functions return BIGINT and its dow is 0-based
    # Sunday; Spark casts + dow offset align the two.
    t = events_as_trades(spark, sf_dir)
    c = F.col("event_time")
    return t.select(
        "event_id",
        F.to_date(c).alias("d"),
        F.unix_timestamp(c).alias("epoch_s"),
        F.year(c).cast("long").alias("y"),
        F.month(c).cast("long").alias("mo"),
        F.dayofmonth(c).cast("long").alias("dom"),
        F.hour(c).cast("long").alias("h"),
        F.minute(c).cast("long").alias("mi"),
        F.dayofweek(c).cast("long").alias("dow"),
    )


@register(
    "q_math_funcs",
    TRADES_CTE
    + """
SELECT event_id,
       CAST(ln(price + 1) AS REAL) AS ln_p1,
       CAST(abs(price - 100) AS REAL) AS abs_diff,
       CAST(sqrt(price) AS REAL) AS sqrt_p,
       CAST(price * price AS REAL) AS p_sq,
       CAST(exp(price / 1000) AS REAL) AS exp_p,
       CAST((price * size + 1) / (price + 1) AS REAL) AS ratio
FROM trades
""",
    "scalar",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = events_as_trades(spark, sf_dir)
    p, s = F.col("price"), F.col("size")
    return t.select(
        "event_id",
        r6(F.log(p + 1), "ln_p1"),
        r6(F.abs(p - 100), "abs_diff"),
        r6(F.sqrt(p), "sqrt_p"),
        r6(p * p, "p_sq"),
        r6(F.exp(p / 1000), "exp_p"),
        r6((p * s + 1) / (p + 1), "ratio"),
    )


@register(
    "q_lit_defaults",
    TRADES_CTE
    + """
SELECT event_id,
       CAST(NULL AS DOUBLE) AS z_default,
       FALSE AS flag_default,
       CAST(1.0 AS DOUBLE) AS one,
       'x' AS tag
FROM trades
""",
    "scalar",
)
def q_lit_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_as_trades(spark, sf_dir).select(
        "event_id",
        F.lit(None).cast("double").alias("z_default"),
        F.lit(False).alias("flag_default"),
        F.lit(1.0).alias("one"),
        F.lit("x").alias("tag"),
    )


# ---------------------------------------------------------------------------
# Symbol normalization (P12) — native exprs + Python UDF twin
# ---------------------------------------------------------------------------

SYMBOL_CASES = [
    ("kraken", "XBT/USDT"),
    ("kraken", "ETH/USD"),
    ("kraken", "xbt/usdt"),
    ("kraken", "XBTUSDT"),
    ("coinbase", "BTC-USD"),
    ("coinbasepro", "ETH-EUR"),
    ("coinbase-advanced", "SOL-USDC"),
    ("coinbase", "BTCUSD"),
    ("binance", "BTCUSDT"),
    ("binance", "ETHUSD"),
    ("binance", "XETHBTC"),
    ("binance", " SOLUSDT "),
    ("binance", "USDT"),
    ("bitfinex", "BTCEUR"),
    ("", "DOGEUSDT"),
    (None, "FOO"),
]


def _symbol_values_sql() -> str:
    rows = ", ".join(
        "({}, '{}')".format(
            "CAST(NULL AS VARCHAR)" if ex is None else f"'{ex}'", sym
        )
        for ex, sym in SYMBOL_CASES
    )
    return f"(VALUES {rows}) AS t(exchange, sym)"


_SYMBOL_ORACLE = f"""
SELECT exchange, sym,
       {normalize_symbol_sql('exchange', 'sym')} AS norm
FROM {_symbol_values_sql()}
"""


def _symbol_frame(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(SYMBOL_CASES, "exchange string, sym string")


@register("q_symbol_normalize", _SYMBOL_ORACLE, "scalar", "udf")
def q_symbol_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _symbol_frame(spark)
    return df.select(
        "exchange",
        "sym",
        normalize_symbol_expr(F.col("exchange"), F.col("sym")).alias("norm"),
    )


@register("q_symbol_normalize_udf", _SYMBOL_ORACLE, "scalar", "udf")
def q_symbol_normalize_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _symbol_frame(spark)
    return df.select(
        "exchange",
        "sym",
        normalize_symbol_udf(F.col("exchange"), F.col("sym")).alias("norm"),
    )


# ---------------------------------------------------------------------------
# Joins (J1/J2 + inner/semi/anti/broadcast extensions)
# ---------------------------------------------------------------------------


@register(
    "q_join_left_composite",
    """
WITH base AS (
  SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
), f_ret AS (
  SELECT l_orderkey, l_linenumber,
         l_extendedprice * (1 - l_discount) AS ret_revenue
  FROM lineitem WHERE l_returnflag = 'R'
), f_tax AS (
  SELECT l_orderkey, l_linenumber,
         l_extendedprice * (1 + l_tax) AS taxed_price
  FROM lineitem WHERE l_tax > 0.04
), f_big AS (
  SELECT l_orderkey, l_linenumber, l_quantity AS big_qty
  FROM lineitem WHERE l_quantity >= 30
)
SELECT l_orderkey, l_linenumber, l_quantity,
       CAST(ret_revenue AS REAL) AS ret_revenue,
       CAST(taxed_price AS REAL) AS taxed_price,
       big_qty
FROM base
LEFT JOIN f_ret USING (l_orderkey, l_linenumber)
LEFT JOIN f_tax USING (l_orderkey, l_linenumber)
LEFT JOIN f_big USING (l_orderkey, l_linenumber)
""",
    "join",
)
def q_join_left_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's alerts-assembly shape: three derived frames
    left-joined back to base on a composite key (analysis.ipynb cell 4)."""
    li = load_table(spark, sf_dir, "lineitem")
    keys = ["l_orderkey", "l_linenumber"]
    base = li.select(*keys, "l_quantity")
    f_ret = li.where(F.col("l_returnflag") == "R").select(
        *keys,
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("ret_revenue"),
    )
    f_tax = li.where(F.col("l_tax") > 0.04).select(
        *keys, (F.col("l_extendedprice") * (1 + F.col("l_tax"))).alias("taxed_price")
    )
    f_big = li.where(F.col("l_quantity") >= 30).select(
        *keys, F.col("l_quantity").alias("big_qty")
    )
    return (
        base.join(f_ret, keys, "left")
        .join(f_tax, keys, "left")
        .join(f_big, keys, "left")
        .select(
            *keys,
            "l_quantity",
            r6("ret_revenue", "ret_revenue"),
            r6("taxed_price", "taxed_price"),
            "big_qty",
        )
    )


@register(
    "q_join_left_projected",
    """
SELECT o_orderkey, o_totalprice, c_mktsegment
FROM orders LEFT JOIN (SELECT c_custkey, c_mktsegment FROM customer) c
  ON o_custkey = c.c_custkey
""",
    "join",
)
def q_join_left_projected(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return o.join(c, o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey", "o_totalprice", "c_mktsegment"
    )


@register(
    "q_join_inner",
    """
SELECT o_orderkey, c_name, o_totalprice, c_acctbal
FROM orders JOIN customer ON o_custkey = c_custkey
""",
    "join",
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", "o_totalprice", "c_acctbal"
    )


@register(
    "q_join_semi",
    """
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    "join",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi")


@register(
    "q_join_anti",
    """
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
)
""",
    "join",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    c = load_table(spark, sf_dir, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti")


@register(
    "q_join_broadcast",
    """
SELECT c_custkey, n_name, r_name
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
""",
    "join",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension joins with explicit broadcast — the 100 TB plan: fact table
    never shuffles for small-dim joins."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )


# ---------------------------------------------------------------------------
# Dedup (A9) + row_number equivalence
# ---------------------------------------------------------------------------

_DOUBLED_CTE = (
    TRADES_CTE
    + """
, doubled AS (
  SELECT * FROM trades
  UNION ALL SELECT * FROM trades WHERE price > 150
)
"""
)


def _doubled(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = events_as_trades(spark, sf_dir)
    return t.unionAll(t.where(F.col("price") > 150))


@register(
    "q_drop_duplicates",
    _DOUBLED_CTE
    + "SELECT DISTINCT symbol, event_time, price, size, side FROM doubled",
    "dedup",
)
def q_drop_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch 5-key dedup over a frame with injected exact duplicates
    (bronze_to_silver_trades.py:82-84 semantics)."""
    return _doubled(spark, sf_dir).dropDuplicates(DEDUP_KEY).select(*DEDUP_KEY)


@register(
    "q_row_number_dedup",
    _DOUBLED_CTE
    + """
SELECT symbol, event_time, price, size, side, event_id
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY symbol, event_time, price, size, side ORDER BY event_id) AS rn
  FROM doubled
) WHERE rn = 1
""",
    "dedup",
    "window",
)
def q_row_number_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number spelling of A9's dedup — proves oracle equivalence."""
    w = Window.partitionBy(*DEDUP_KEY).orderBy("event_id")
    return (
        _doubled(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(*DEDUP_KEY, "event_id")
    )


# ---------------------------------------------------------------------------
# Window-function analysis layer (W1–W6)
# ---------------------------------------------------------------------------


@register(
    "q_lag_lead_returns",
    SIGNALS_CTE
    + """
SELECT symbol, bar_start, "close", prev_close,
       CAST(ret AS REAL) AS ret, CAST(logret AS REAL) AS logret
FROM g2
""",
    "window",
)
def q_lag_lead_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    g1 = A.returns(_bars(spark, sf_dir))
    return g1.select(
        "symbol",
        "bar_start",
        "close",
        "prev_close",
        r6("ret", "ret"),
        r6("logret", "logret"),
    )


@register(
    "q_gap_pct",
    SIGNALS_CTE
    + """
SELECT symbol, bar_start, next_open, CAST(gap_pct AS REAL) AS gap_pct FROM sig
""",
    "window",
)
def q_gap_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    g1 = A.with_ts_s(_bars(spark, sf_dir))
    return A.gap_signal(g1).select(
        "symbol", "bar_start", "next_open", r6("gap_pct", "gap_pct")
    )


@register(
    "q_rolling_mean_std",
    SIGNALS_CTE
    + """
SELECT symbol, bar_start,
       CAST(CASE WHEN abs(ret_mu) < 1e-6 THEN 0 ELSE ret_mu END AS REAL) AS ret_mu,
       CAST(ret_sd AS REAL) AS ret_sd,
       CAST(vol_mu AS REAL) AS vol_mu, CAST(vol_sd AS REAL) AS vol_sd
FROM g3
""",
    "window",
)
def q_rolling_mean_std(spark: SparkSession, sf_dir: str) -> DataFrame:
    g1 = A.returns(_bars(spark, sf_dir))
    df = A.rolling_stats(g1, "logret", prefix="ret_")
    df = A.rolling_stats(df, "volume", prefix="vol_")
    return df.select(
        "symbol",
        "bar_start",
        r6z("ret_mu", "ret_mu"),
        r6("ret_sd", "ret_sd"),
        r6("vol_mu", "vol_mu"),
        r6("vol_sd", "vol_sd"),
    )


@register(
    "q_zscore_anomaly",
    SIGNALS_CTE
    + """
SELECT symbol, bar_start,
       CAST(CASE WHEN abs(z_ret) < 1e-6 THEN 0 ELSE z_ret END AS REAL) AS z_ret,
       CAST(CASE WHEN abs(z_vol) < 1e-6 THEN 0 ELSE z_vol END AS REAL) AS z_vol,
       CAST(gap_pct AS REAL) AS gap_pct,
       abs(z_ret) > 3.0 AS is_return_anom,
       z_vol > 3.0 AS is_volume_anom
FROM sig
""",
    "window",
)
def q_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    alerts = A.anomaly_signals(_bars(spark, sf_dir))
    return alerts.select(
        "symbol",
        "bar_start",
        r6z("z_ret", "z_ret"),
        r6z("z_vol", "z_vol"),
        r6("gap_pct", "gap_pct"),
        "is_return_anom",
        "is_volume_anom",
    )


@register(
    "q_topk_recent",
    SIGNALS_CTE
    + """
SELECT symbol, bar_start, "close", CAST(vwap AS REAL) AS vwap, volume,
       CAST(CASE WHEN abs(z_ret) < 1e-6 THEN 0 ELSE z_ret END AS REAL) AS z_ret,
       CAST(CASE WHEN abs(z_vol) < 1e-6 THEN 0 ELSE z_vol END AS REAL) AS z_vol,
       CAST(gap_pct AS REAL) AS gap_pct
FROM sig WHERE symbol = 'purchase'
ORDER BY bar_start DESC LIMIT 180
""",
    "window",
    "topk",
)
def q_topk_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    alerts = A.anomaly_signals(_bars(spark, sf_dir)).where(
        F.col("symbol") == "purchase"
    )
    return A.top_k_recent(alerts, 180).select(
        "symbol",
        "bar_start",
        "close",
        r6("vwap", "vwap"),
        "volume",
        r6z("z_ret", "z_ret"),
        r6z("z_vol", "z_vol"),
        r6("gap_pct", "gap_pct"),
    )


@register(
    "q_sort_desc",
    "SELECT event_id, value, user_id FROM events ORDER BY value DESC, event_id LIMIT 50",
    "sort",
    "topk",
)
def q_sort_desc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .orderBy(F.col("value").desc(), F.col("event_id"))
        .limit(50)
        .select("event_id", "value", "user_id")
    )
