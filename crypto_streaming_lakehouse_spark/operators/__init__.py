from .bars import ohlcv_bars
from .analysis import anomaly_signals, gap_signal, returns, rolling_stats, top_k_recent

__all__ = [
    "ohlcv_bars",
    "returns",
    "rolling_stats",
    "anomaly_signals",
    "gap_signal",
    "top_k_recent",
]
