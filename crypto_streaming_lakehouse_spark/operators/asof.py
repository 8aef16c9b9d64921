"""As-of (backward) join — the canonical time-series operator Spark lacks
as a built-in, expressed as union + ordered window (SURVEY.md §4's
custom-operator candidate; the reference itself never needs it, but any
user joining trades to quotes/bars does).

For each left row, attach the latest right row whose time is at-or-before
the left row's time, within the same key group.

Why union+window instead of a range join: a range-predicate join explodes
to O(|L|·|R|) candidate pairs per key before filtering, and Spark plans it
as a broadcast-nested-loop. The union form is one shuffle on the key, one
sort, one window pass — O((|L|+|R|) log) per key and no pair blowup; this
is the classic scalable as-of formulation.

Tie semantics: right rows sort BEFORE left rows at equal times (marker
column), so "at-or-before" is inclusive — matching DuckDB's
``ASOF LEFT JOIN ... ON l.k = r.k AND l.t >= r.t`` oracle. Right rows must
be unique per (key, time); pre-aggregate the right side if not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    time_col: str,
    right_value_cols: list[str],
) -> DataFrame:
    """Left as-of join: every left row + last-known right values.

    ``left`` and ``right`` must both carry ``on`` + ``time_col``; right
    rows contribute ``right_value_cols``, which come back null when no
    right row precedes the left row in its group.
    """
    left_payload = [
        c for c in left.columns if c not in (*on, time_col)
    ]
    l = left.select(
        *on,
        time_col,
        F.lit(1).alias(_SIDE),
        *left_payload,
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_value_cols],
    )
    r = right.select(
        *on,
        time_col,
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        *right_value_cols,
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(time_col), F.col(_SIDE))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r).select(
        *on,
        time_col,
        F.col(_SIDE),
        *left_payload,
        *[
            F.last(c, ignorenulls=True).over(w).alias(c)
            for c in right_value_cols
        ],
    )
    return filled.where(F.col(_SIDE) == 1).drop(_SIDE)
