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


RUNNING_SCHEMA = "symbol string, n bigint, total double, vmax double"


def running_totals_tws(trades: DataFrame) -> DataFrame:
    """Per-symbol running (count, sum, max) via transformWithStateInPandas
    — the Spark 4 arbitrary-state API (StatefulProcessor + typed state
    variables) that supersedes applyInPandasWithState: named ValueState
    lives in the state store per key, with timers/TTL available for
    eviction. Emits one updated summary row per key per microbatch.

    State is three scalars per symbol — O(#symbols) — and the operator
    works identically on a batch frame (the test oracle)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("total", DoubleType()),
            StructField("vmax", DoubleType()),
        ]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, total, vmax = 0, 0.0, None
            if self._state.exists():
                n, total, vmax = self._state.get()
            for pdf in rows:
                if not len(pdf):
                    continue
                n += len(pdf)
                total += float(pdf["price"].sum())
                m = float(pdf["price"].max())
                vmax = m if vmax is None else max(vmax, m)
            self._state.update((n, total, vmax))
            yield pd.DataFrame(
                {"symbol": [key[0]], "n": [n], "total": [total], "vmax": [vmax]}
            )

        def close(self) -> None:
            pass

    return (
        trades.select("symbol", "price")
        .groupBy("symbol")
        .transformWithStateInPandas(
            RunningTotals(),
            outputStructType=RUNNING_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
