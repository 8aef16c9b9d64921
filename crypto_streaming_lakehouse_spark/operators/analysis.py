"""Batch analysis layer: returns, rolling z-scores, gaps, anomaly flags,
top-K (SURVEY.md §2.5 W1–W6).

Parity: /root/reference/notebooks/analysis.ipynb cells 3–5 — the reference's
most sophisticated query. Exact frame semantics preserved:

- lag/lead over ``Window.partitionBy(symbol).orderBy(ts_s)`` where ``ts_s``
  is epoch seconds of bar_start;
- rolling mean/stddev over a TIME-RANGE frame ``rangeBetween(-60*N, -1)``
  — trailing N minutes, current row EXCLUDED;
- z-score guarded by ``sd > eps``; return anomalies two-sided
  (``abs(z) > Z``), volume anomalies one-sided (``z > Z``);
- assembly via chained left equi-joins on (symbol, bar_start);
- top-K most-recent bars re-sorted chronological.

Scale notes: all signal frames derive from one pass over the bars table and
share the (symbol) hash partitioning — Catalyst collapses the chained
left-joins on the same key into sort-merge joins that reuse one exchange.
Window functions shuffle once on symbol; state per partition is O(frame),
bounded by the range frame. No Python, no collect.

One deliberate deviation: Spark's ``stddev_samp`` returns NaN for a
single-element frame where DuckDB/ANSI return NULL; we normalize NaN→NULL so
downstream ``when`` guards behave identically (documented oracle parity fix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EPS = 1e-9  # sd guard; reference uses 1e-12 (analysis.ipynb cell 4)


def _nan_to_null(c):
    return F.when(~F.isnan(c), c)


def with_ts_s(bars: DataFrame, time_col: str = "bar_start") -> DataFrame:
    """Epoch-seconds ordering column for time-range window frames."""
    return bars.withColumn("ts_s", F.unix_timestamp(time_col))


def order_window(symbol_col: str = "symbol"):
    return Window.partitionBy(symbol_col).orderBy(F.col("ts_s"))


def returns(bars: DataFrame) -> DataFrame:
    """prev_close, pct return, log return per (symbol, bar)."""
    w = order_window()
    g = with_ts_s(bars)
    return (
        g.withColumn("prev_close", F.lag("close").over(w))
        .withColumn(
            "ret",
            F.when(
                F.col("prev_close").isNotNull() & (F.col("prev_close") != 0),
                (F.col("close") / F.col("prev_close")) - 1,
            ),
        )
        .withColumn(
            # Zero/negative prices have no log return; the explicit guard
            # also keeps ANSI mode (Spark 4 default) from raising on x/0
            # and ln(0) — and matches the oracle's CASE guards exactly.
            "logret",
            F.when(
                (F.col("prev_close") > 0) & (F.col("close") > 0),
                F.log(F.col("close") / F.col("prev_close")),
            ),
        )
    )


def rolling_stats(
    g1: DataFrame, value_col: str, *, minutes: int = 30, prefix: str = ""
) -> DataFrame:
    """Trailing-N-minute mean/stddev of ``value_col``, current row excluded."""
    w_time = order_window().rangeBetween(-60 * minutes, -1)
    mu, sd = f"{prefix}mu", f"{prefix}sd"
    return g1.withColumn(mu, F.avg(value_col).over(w_time)).withColumn(
        sd, _nan_to_null(F.stddev_samp(value_col).over(w_time))
    )


def zscore(df: DataFrame, value_col: str, mu: str, sd: str, out: str) -> DataFrame:
    """z = (x - mu) / sd, NULL unless sd is present and > EPS."""
    return df.withColumn(
        out,
        F.when(
            F.col(sd).isNotNull() & (F.col(sd) > EPS),
            (F.col(value_col) - F.col(mu)) / F.col(sd),
        ),
    )


def gap_signal(g1: DataFrame) -> DataFrame:
    """Close→next-open gap percentage."""
    w = order_window()
    return g1.withColumn("next_open", F.lead("open").over(w)).withColumn(
        "gap_pct",
        F.when(
            F.col("next_open").isNotNull() & (F.col("close") != 0),
            (F.col("next_open") - F.col("close")) / F.col("close"),
        ),
    )


def anomaly_signals(
    bars: DataFrame, *, minutes: int = 30, z_threshold: float = 3.0
) -> DataFrame:
    """Full alerts assembly: returns → rolling z-scores → gaps → flags.

    Semantics mirror analysis.ipynb cell 4, which builds three signal
    frames and left-joins them back onto the base on (symbol, bar_start).
    Those joins are 1:1 on the key, so the fused plan — every signal as a
    window column over the SAME partitioning — is row-for-row identical
    while shuffling the bars once and never recomputing them. (Spark does
    not dedupe common subplans: the literal 3-join translation recomputes
    the OHLCV aggregation four times and adds three sort-merge joins. The
    reference's join SHAPE is exercised by q_join_left_composite.)
    """
    key = ["symbol", "bar_start"]
    g1 = returns(bars)
    g1 = zscore(
        rolling_stats(g1, "logret", minutes=minutes, prefix="ret_"),
        "logret",
        "ret_mu",
        "ret_sd",
        "z_ret",
    )
    g1 = zscore(
        rolling_stats(g1, "volume", minutes=minutes, prefix="vol_"),
        "volume",
        "vol_mu",
        "vol_sd",
        "z_vol",
    )
    g1 = gap_signal(g1)
    return g1.select(
        *key,
        "close",
        "vwap",
        "volume",
        "z_ret",
        "z_vol",
        "gap_pct",
        (F.abs(F.col("z_ret")) > z_threshold).alias("is_return_anom"),
        (F.col("z_vol") > z_threshold).alias("is_volume_anom"),
    )


def top_k_recent(df: DataFrame, k: int, time_col: str = "bar_start") -> DataFrame:
    """K most-recent rows, returned in chronological order.

    ``orderBy(desc).limit(k)`` compiles to TakeOrderedAndProject — each
    partition keeps a k-row heap, only k rows reach the driver-side merge;
    no full sort at any scale (analysis.ipynb cell 5).
    """
    return df.orderBy(F.col(time_col).desc()).limit(k).orderBy(time_col)
