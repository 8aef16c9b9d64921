"""Exchange symbol normalization (SURVEY.md §2.7 / P12).

Parity: /root/reference/common/symbols.py:14-39 — canonicalize
exchange-specific pair symbols to ``BASE_QUOTE``:

- Kraken ``XBT/USDT`` → split on first ``/``;
- Coinbase-family ``BTC-USD`` → split on first ``-``;
- Binance-style ``BTCUSDT`` → first matching quote suffix from
  ``COMMON_QUOTES`` (list order is the tie-break: USDT before USD);
- base aliases applied after the split (XBT→BTC, XETH→ETH);
- if no quote found, fall back to ``upper(original)`` unchanged.

Three implementations of the same semantics:
``normalize_symbol_expr`` (native Column expressions — Catalyst-optimizable,
the hot-path choice), ``normalize_symbol_udf`` (row-at-a-time Python UDF —
exercises the UDF surface, deliberately the slow path), and
``normalize_symbol_sql`` (DuckDB SQL generator for the oracle, derived from
the same quote list so the three can't drift).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

COMMON_QUOTES = [
    "USDT",
    "USD",
    "USDC",
    "EUR",
    "GBP",
    "JPY",
    "BTC",
    "ETH",
    "AUD",
    "CAD",
    "CHF",
    "KRW",
    "TRY",
    "BRL",
    "MXN",
    "ARS",
    "NGN",
]

BASE_ALIASES = {"XBT": "BTC", "XETH": "ETH"}

_COINBASE_EXCHANGES = ("coinbase", "coinbasepro", "coinbase-advanced")


def normalize_symbol_py(exchange: str | None, sym: str) -> str:
    """Plain-Python reference implementation (shared by the UDF and tests)."""
    s = sym.strip().upper()
    ex = (exchange or "").strip().lower()
    base: str
    quote: str | None
    if ex == "kraken" and "/" in s:
        base, quote = s.split("/", 1)
    elif ex in _COINBASE_EXCHANGES and "-" in s:
        base, quote = s.split("-", 1)
    else:
        quote = next((q for q in COMMON_QUOTES if s.endswith(q)), None)
        base = s[: -len(quote)] if quote else s
    base = BASE_ALIASES.get(base, base)
    return f"{base}_{quote}" if quote else sym.upper()


def normalize_symbol_expr(exchange: Column, sym: Column) -> Column:
    """Native-expression twin: pure Column ops, fully codegen'd JVM-side."""
    s = F.upper(F.trim(sym))
    ex = F.lower(F.trim(F.coalesce(exchange, F.lit(""))))

    kraken = (ex == "kraken") & s.contains("/")
    coinbase = ex.isin(*_COINBASE_EXCHANGES) & s.contains("-")
    slash = F.split(s, "/", 2)
    dash = F.split(s, "-", 2)

    # One anchored regex instead of a 17-branch when-chain: the chain gets
    # inlined into base/quote/alias subtrees and blows the expression tree
    # up multiplicatively (~2.7 s of analysis time per query). List order
    # and regex alternation agree because no quote is a suffix of another.
    sq = F.regexp_extract(s, "(" + "|".join(COMMON_QUOTES) + ")$", 1)
    suffix_quote = F.when(sq != "", sq)

    base = (
        F.when(kraken, slash.getItem(0))
        .when(coinbase, dash.getItem(0))
        .otherwise(
            F.when(
                suffix_quote.isNotNull(),
                F.substr(s, F.lit(1), F.length(s) - F.length(suffix_quote)),
            ).otherwise(s)
        )
    )
    quote = (
        F.when(kraken, slash.getItem(1))
        .when(coinbase, dash.getItem(1))
        .otherwise(suffix_quote)
    )

    aliased = base
    for k, v in BASE_ALIASES.items():
        aliased = F.when(base == k, F.lit(v)).otherwise(aliased)

    return F.when(quote.isNotNull(), F.concat_ws("_", aliased, quote)).otherwise(
        F.upper(sym)
    )


@F.udf(T.StringType())
def normalize_symbol_udf(exchange: str | None, sym: str) -> str:
    return normalize_symbol_py(exchange, sym)


def normalize_symbol_sql(exchange_col: str, sym_col: str) -> str:
    """DuckDB SQL scalar expression computing the same normalization."""
    suffix_when = " ".join(
        f"WHEN s LIKE '%{q}' THEN '{q}'" for q in COMMON_QUOTES
    )
    alias_when = " ".join(
        f"WHEN base = '{k}' THEN '{v}'" for k, v in BASE_ALIASES.items()
    )
    return f"""(
      SELECT CASE WHEN quote IS NOT NULL
                  THEN (CASE {alias_when} ELSE base END) || '_' || quote
                  ELSE upper({sym_col}) END
      FROM (
        SELECT
          CASE WHEN ex = 'kraken' AND strpos(s, '/') > 0
                 THEN substr(s, 1, strpos(s, '/') - 1)
               WHEN ex IN ('coinbase','coinbasepro','coinbase-advanced')
                    AND strpos(s, '-') > 0
                 THEN substr(s, 1, strpos(s, '-') - 1)
               WHEN sq IS NOT NULL THEN substr(s, 1, len(s) - len(sq))
               ELSE s END AS base,
          CASE WHEN ex = 'kraken' AND strpos(s, '/') > 0
                 THEN substr(s, strpos(s, '/') + 1)
               WHEN ex IN ('coinbase','coinbasepro','coinbase-advanced')
                    AND strpos(s, '-') > 0
                 THEN substr(s, strpos(s, '-') + 1)
               ELSE sq END AS quote
        FROM (
          SELECT s, ex, CASE {suffix_when} END AS sq
          FROM (SELECT upper(trim({sym_col})) AS s,
                       lower(trim(coalesce({exchange_col}, ''))) AS ex)
        )
      )
    )"""


def normalize_symbol_pandas_udf():
    """Arrow-vectorized twin of ``normalize_symbol_udf``: same semantics,
    but the executor ships whole Arrow batches to one Python worker call
    instead of a round-trip per row — the ~10-100× faster Python path
    when native Column expressions genuinely can't express the logic.
    Built lazily (a @pandas_udf decorator at import time would bind to
    whatever SparkSession exists first)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _norm(exchange, sym):
        return pd.Series(
            [
                normalize_symbol_py(e, s)
                for e, s in zip(exchange, sym)
            ]
        )

    # The module's `from __future__ import annotations` stringifies
    # inline hints, which PySpark's type-hint inference can't resolve
    # for a locally-imported pandas — attach real objects instead.
    _norm.__annotations__ = {
        "exchange": pd.Series,
        "sym": pd.Series,
        "return": pd.Series,
    }
    return pandas_udf(T.StringType())(_norm)
