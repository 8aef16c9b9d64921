"""OHLCV + VWAP bar aggregation (SURVEY.md §2.4 A1–A6, §2.6 T2).

Parity: /root/reference/spark/jobs/silver_to_gold_bars.py:34-66 — a single
grouped aggregation per (symbol, tumbling event-time window) computing
open/high/low/close/volume/vwap/trades, with open/close taken from the
earliest/latest trade in the window.

Spark-first design notes:
- ``F.window`` works identically in batch and streaming, so one plan builder
  serves both (the EP2 pattern: pure DataFrame→DataFrame transforms bound to
  sources at the edges).
- open/close use ``min_by/max_by`` (Spark ≥3.3) — a single hash-aggregate
  pass, no self-join, no window-function sort. The reference's
  ``min(struct(ts, price))`` trick is kept as an option for engines/tests
  that need field-by-field tie-breaking.
- At scale: this is one shuffle on (symbol, window); partial aggregation
  (two-phase HashAggregate) means executors pre-combine before the exchange,
  so skew on hot symbols is bounded by #windows, and AQE handles residual
  skew. No collect, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ohlcv_bars(
    trades: DataFrame,
    *,
    symbol_col: str = "symbol",
    time_col: str = "event_time",
    price_col: str = "price",
    size_col: str = "size",
    bar: str = "1 minute",
    struct_argminmax: bool = False,
) -> DataFrame:
    """Aggregate trade rows into OHLCV+VWAP bars.

    Returns the gold schema: symbol, bar_start, bar_end, open, high, low,
    close, volume, vwap, trades, bar_date.
    """
    price = F.col(price_col)
    size = F.col(size_col)
    if struct_argminmax:
        # Struct ordering: compares event_time first, ties broken by price,
        # NULL time sorts first into min (SURVEY.md §7 hard parts).
        open_ = F.min(F.struct(F.col(time_col), price)).getField(price_col)
        close = F.max(F.struct(F.col(time_col), price)).getField(price_col)
    else:
        open_ = F.min_by(price, F.col(time_col))
        close = F.max_by(price, F.col(time_col))

    agg = (
        trades.groupBy(
            F.col(symbol_col).alias("symbol"),
            F.window(F.col(time_col), bar).alias("w"),
        )
        .agg(
            open_.alias("open"),
            F.max(price).alias("high"),
            F.min(price).alias("low"),
            close.alias("close"),
            F.sum(size).alias("volume"),
            F.sum(price * size).alias("notional"),
            F.count("*").alias("trades"),
        )
    )
    return agg.select(
        "symbol",
        F.col("w.start").alias("bar_start"),
        F.col("w.end").alias("bar_end"),
        "open",
        "high",
        "low",
        "close",
        "volume",
        # Guard keeps ANSI mode from raising when a window's total size is 0.
        F.when(F.col("volume") != 0, F.col("notional") / F.col("volume")).alias(
            "vwap"
        ),
        "trades",
        F.to_date("w.start").alias("bar_date"),
    )


def gold_bars_cut(spark, sf_dir: str) -> DataFrame:
    """The memoized 1-minute gold bars table for a fixture dir.

    Parity: the reference materializes gold bars ONCE
    (silver_to_gold_bars.py writes the gold parquet) and every
    downstream consumer (analysis.ipynb cells 3-5) reads that table —
    it never re-derives bars per query. Re-deriving the identical
    aggregation in every bars-consuming registry query was the
    in-session equivalent of skipping the gold layer, so this wraps the
    derivation in the same (session, sf_dir)-keyed memo the graph
    family uses: first caller pays one events scan + one (symbol,
    window) shuffle, later callers reuse the checkpointed blocks.

    The cut hash-partitions on ``symbol`` — the partitioning every
    downstream window function (returns, rolling stats, z-scores,
    gaps) runs over — so those windows plan with ZERO exchange on the
    bars side: only the in-partition sort on bar time remains.
    """
    from ..extensions.dedup import memo_materialize
    from ..sources.tables import events_as_trades

    return memo_materialize(
        spark,
        f"gold_bars:{sf_dir}",
        lambda: ohlcv_bars(events_as_trades(spark, sf_dir)),
        partition_by=("symbol",),
    )
