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
from pyspark.sql.types import StructField, StructType

_SIDE = "__asof_side"
_VALS = "__asof_vals"


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
    # All right value columns travel in ONE struct carrier so the matched
    # right row is picked atomically: filling each column independently
    # with last(col, ignorenulls=True) would stitch values from DIFFERENT
    # right rows whenever a right row carries NULL in one value column
    # (and would skip a legitimately-NULL latest match) — diverging from
    # ASOF JOIN semantics. The carrier is NULL on left rows (skipped by
    # ignorenulls) and a non-null struct on right rows even when every
    # field inside is NULL.
    vals_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in right_value_cols]
    )
    l = left.select(
        *on,
        time_col,
        F.lit(1).alias(_SIDE),
        *left_payload,
        F.lit(None).cast(vals_type).alias(_VALS),
    )
    r = right.select(
        *on,
        time_col,
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        F.struct(*right_value_cols).alias(_VALS),
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
        F.last(_VALS, ignorenulls=True).over(w).alias(_VALS),
    )
    return filled.where(F.col(_SIDE) == 1).select(
        *on,
        time_col,
        *left_payload,
        *[F.col(f"{_VALS}.{c}").alias(c) for c in right_value_cols],
    )



def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    time_col: str,
    right_value_cols: list[str],
) -> DataFrame:
    """Left as-of FORWARD join: every left row + the EARLIEST right row
    at-or-after its time (the mirror of backward; "next quote" joins).

    Same union+window plan as backward with the window ordered by
    descending time — one shuffle on the key, no pair blowup. Right rows
    still sort before left rows at equal times, keeping "at-or-after"
    inclusive (DuckDB oracle: ``ASOF LEFT JOIN ... ON l.t <= r.t``).
    """
    left_payload = [c for c in left.columns if c not in (*on, time_col)]
    vals_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in right_value_cols]
    )
    l = left.select(
        *on,
        time_col,
        F.lit(1).alias(_SIDE),
        *left_payload,
        F.lit(None).cast(vals_type).alias(_VALS),
    )
    r = right.select(
        *on,
        time_col,
        F.lit(0).alias(_SIDE),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_payload
        ],
        F.struct(*right_value_cols).alias(_VALS),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(time_col).desc(), F.col(_SIDE))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r).select(
        *on,
        time_col,
        F.col(_SIDE),
        *left_payload,
        F.last(_VALS, ignorenulls=True).over(w).alias(_VALS),
    )
    return filled.where(F.col(_SIDE) == 1).select(
        *on,
        time_col,
        *left_payload,
        *[F.col(f"{_VALS}.{c}").alias(c) for c in right_value_cols],
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    time_col: str,
    right_time_out: str,
    right_value_cols: list[str],
) -> DataFrame:
    """Left as-of NEAREST join: every left row + the right row closest in
    time in EITHER direction; ties (equidistant past and future rows)
    resolve to the backward match, matching the two-ASOF-join + CASE
    oracle exactly.

    One union, ONE shuffle on the key, one sort, and two window passes
    over the SAME (key, time)-sorted partitioning (Spark reuses the sort
    for the descending frame — no second exchange). The matched right
    row's time comes back as ``right_time_out`` so callers (and the
    tie-break) see which side won; the right time travels inside the
    struct carrier, picked atomically with the values.
    """
    left_payload = [c for c in left.columns if c not in (*on, time_col)]
    t_field = "__asof_t"
    vals_type = StructType(
        [StructField(t_field, right.schema[time_col].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in right_value_cols]
    )
    l = left.select(
        *on,
        time_col,
        F.lit(1).alias(_SIDE),
        *left_payload,
        F.lit(None).cast(vals_type).alias(_VALS),
    )
    r = right.select(
        *on,
        time_col,
        F.lit(0).alias(_SIDE),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_payload
        ],
        F.struct(
            F.col(time_col).alias(t_field), *right_value_cols
        ).alias(_VALS),
    )
    u = l.unionByName(r)
    wb = (
        Window.partitionBy(*on)
        .orderBy(F.col(time_col), F.col(_SIDE))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*on)
        .orderBy(F.col(time_col).desc(), F.col(_SIDE))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bw = F.last(_VALS, ignorenulls=True).over(wb)
    fw = F.last(_VALS, ignorenulls=True).over(wf)
    t = F.col(time_col)
    pick = (
        F.when(bw.isNull(), fw)
        .when(fw.isNull(), bw)
        .when(
            (t - bw.getField(t_field)) <= (fw.getField(t_field) - t), bw
        )
        .otherwise(fw)
    )
    filled = u.select(
        *on,
        time_col,
        F.col(_SIDE),
        *left_payload,
        pick.alias(_VALS),
    )
    return filled.where(F.col(_SIDE) == 1).select(
        *on,
        time_col,
        *left_payload,
        F.col(f"{_VALS}.{t_field}").alias(right_time_out),
        *[F.col(f"{_VALS}.{c}").alias(c) for c in right_value_cols],
    )
