"""Custom stateful streaming operators via applyInPandasWithState —
the surface for semantics no built-in aggregation/window can express
(recursive per-event state machines).

``ewma_trades``: per-symbol exponentially weighted moving average of price.
EWMA is recursive (each output depends on the previous output), so neither
groupBy().agg() nor a window frame can express it incrementally; the state
store carries exactly one double per symbol — O(#symbols) state, the
smallest possible footprint, evaluated in Arrow batches.

Ordering semantics (documented contract): the fold follows event-time
order WITHIN each micro-batch (rows are sorted before folding — the
group-by shuffle destroys arrival order) and batch order ACROSS batches.
Feed time-ordered batches (e.g. time-partitioned files, Kafka per-key
ordering) for a globally event-time-ordered fold; out-of-order data across
batches folds in arrival order, like any arrival-order state machine. An
event-time-buffered variant would add a pending buffer keyed on the
watermark — same API, more state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

OUT_SCHEMA = "symbol string, event_time timestamp, price double, ewma double"
STATE_SCHEMA = "ewma double"


def ewma_trades(trades: DataFrame, *, alpha: float = 0.2) -> DataFrame:
    """Streaming per-symbol EWMA: ewma_i = α·price_i + (1−α)·ewma_{i−1},
    seeded with the first price. Works on a streaming OR batch frame (the
    batch twin is the test oracle)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fold(key, pdfs, state):
        import pandas as pd

        (symbol,) = key
        prev = state.get[0] if state.exists else None
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            return
        rows = pd.concat(frames).sort_values("event_time")
        out = []
        for price in rows["price"]:
            prev = price if prev is None else alpha * price + (1 - alpha) * prev
            out.append(prev)
        state.update((float(prev),))
        yield pd.DataFrame(
            {
                "symbol": symbol,
                "event_time": rows["event_time"],
                "price": rows["price"],
                "ewma": out,
            }
        )

    return (
        trades.select("symbol", "event_time", "price")
        .groupBy("symbol")
        .applyInPandasWithState(
            fold, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )
    )
