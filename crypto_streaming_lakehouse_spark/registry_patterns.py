"""Composite lakehouse / warehouse patterns: MERGE-style upsert, SCD2
dimension versioning, time-grid densification with gap fill, per-group
regression (native and applyInPandas, cross-checked against the same
closed form), and the end-to-end corpus preparation pipeline.

These are the multi-operator shapes users actually run; each is one
registry query with a DuckDB oracle so the composition — not just the
pieces — is verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import BARS_CTE, r6, register
from .operators.bars import gold_bars_cut
from .sources.tables import events_as_trades, load_table


# ---------------------------------------------------------------------------
# MERGE-style upsert (batch expression of MERGE INTO)
# ---------------------------------------------------------------------------


@register(
    "q_merge_upsert",
    """
WITH target AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n, CAST(sum(value) AS REAL) AS total
  FROM events WHERE event_id < 5000 GROUP BY user_id
), source AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n, CAST(sum(value) AS REAL) AS total
  FROM events WHERE event_id >= 5000 GROUP BY user_id
)
SELECT coalesce(t.user_id, s.user_id) AS user_id,
       coalesce(s.n, t.n) AS n,
       coalesce(s.total, t.total) AS total,
       CASE WHEN s.user_id IS NULL THEN 'kept'
            WHEN t.user_id IS NULL THEN 'inserted'
            ELSE 'updated' END AS merge_action
FROM target t FULL OUTER JOIN source s ON t.user_id = s.user_id
""",
    "pattern",
    "merge",
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics as a batch plan: full-outer join target with
    source on the key; matched rows take the source version, unmatched
    target rows are kept, unmatched source rows are inserted — with the
    action labeled per row. This is exactly what Delta's MERGE compiles
    to under the hood (join + per-row action), expressed engine-neutrally.
    One shuffle per side + the join."""
    ev = load_table(spark, sf_dir, "events")

    def agg(side):
        return side.groupBy("user_id").agg(
            F.count("*").cast("long").alias("n"),
            r6(F.sum("value"), "total"),
        )

    t = agg(ev.where(F.col("event_id") < 5000)).alias("t")
    s = agg(ev.where(F.col("event_id") >= 5000)).alias("s")
    return t.join(s, F.col("t.user_id") == F.col("s.user_id"), "full").select(
        F.coalesce(F.col("t.user_id"), F.col("s.user_id")).alias("user_id"),
        F.coalesce(F.col("s.n"), F.col("t.n")).alias("n"),
        F.coalesce(F.col("s.total"), F.col("t.total")).alias("total"),
        F.when(F.col("s.user_id").isNull(), "kept")
        .when(F.col("t.user_id").isNull(), "inserted")
        .otherwise("updated")
        .alias("merge_action"),
    )


# ---------------------------------------------------------------------------
# SCD Type-2 dimension versioning
# ---------------------------------------------------------------------------


@register(
    "q_scd2_versions",
    """
WITH changes AS (
  SELECT user_id, ts, event_type
  FROM (
    SELECT user_id, ts, event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_type
    FROM events
  ) WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type AS state, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
       CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         AS BOOLEAN) AS is_current
FROM changes
""",
    "pattern",
    "scd2",
)
def q_scd2_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2: collapse each user's event stream
    into state VERSIONS — a new row only when the state changes (lag
    filter), valid_from/valid_to interval from lead, open interval =
    current. Both window passes share the user_id partitioning: one
    shuffle."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select(
            "user_id",
            "ts",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .where(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("ts")
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Time-grid densification + gap fill
# ---------------------------------------------------------------------------


@register(
    "q_densify_ffill",
    BARS_CTE
    + """
, bounds AS (
  SELECT symbol, min(bar_start) AS lo, max(bar_start) AS hi FROM bars
  GROUP BY symbol
), grid AS (
  SELECT symbol, unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS bar_start
  FROM bounds
)
SELECT g.symbol, g.bar_start,
       CAST(coalesce(b.volume, 0) AS REAL) AS volume,
       CAST(b.bar_start IS NOT NULL AS BOOLEAN) AS observed,
       CAST(last_value(b."close" IGNORE NULLS) OVER (
         PARTITION BY g.symbol ORDER BY g.bar_start
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS REAL)
         AS close_ffill
FROM grid g LEFT JOIN bars b
  ON b.symbol = g.symbol AND b.bar_start = g.bar_start
""",
    "pattern",
    "densify",
)
def q_densify_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense minute grid per symbol (sequence + explode between each
    symbol's min and max bar) left-joined to observed bars: missing
    minutes get volume 0 and a forward-filled close via
    last(ignorenulls) — the standard gap-fill for downstream models that
    need a complete time index. Grid size is time-range × symbols,
    independent of trade count; the join is keyed on (symbol, minute)."""
    bars = gold_bars_cut(spark, sf_dir)
    bounds = bars.groupBy("symbol").agg(
        F.min("bar_start").alias("lo"), F.max("bar_start").alias("hi")
    )
    grid = bounds.select(
        "symbol",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 MINUTE"))
        ).alias("bar_start"),
    )
    b = bars.select(
        F.col("symbol").alias("b_symbol"),
        F.col("bar_start").alias("b_start"),
        "volume",
        "close",
    )
    w = (
        Window.partitionBy("symbol")
        .orderBy("bar_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(
            b,
            (F.col("symbol") == F.col("b_symbol"))
            & (F.col("bar_start") == F.col("b_start")),
            "left",
        )
        .select(
            "symbol",
            "bar_start",
            r6(F.coalesce(F.col("volume"), F.lit(0.0)), "volume"),
            F.col("b_start").isNotNull().alias("observed"),
            r6(
                F.last("close", ignorenulls=True).over(w),
                "close_ffill",
            ),
        )
    )


# ---------------------------------------------------------------------------
# Per-group linear regression — native aggregates and applyInPandas twin
# ---------------------------------------------------------------------------

_REGR_SQL = """
SELECT event_type,
       CAST(regr_slope(value, epoch(ts)) AS REAL) AS slope,
       CAST(regr_intercept(value, epoch(ts)) AS REAL) AS intercept,
       CAST(regr_count(value, epoch(ts)) AS BIGINT) AS n
FROM events GROUP BY event_type
"""


@register("q_regression", _REGR_SQL, "agg", "regression")
def q_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS (value ~ time) with the native regr_* aggregates —
    one pass, map-side combinable, the trend-extraction primitive."""
    ev = load_table(spark, sf_dir, "events")
    x = F.col("ts").cast("double")
    return ev.groupBy("event_type").agg(
        r6(F.regr_slope(F.col("value"), x), "slope"),
        r6(F.regr_intercept(F.col("value"), x), "intercept"),
        F.regr_count(F.col("value"), x).cast("long").alias("n"),
    )


@register("q_regression_pandas", _REGR_SQL, "agg", "pandas-udf")
def q_regression_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The applyInPandas (grouped-map) twin of q_regression: each group's
    rows land in one pandas DataFrame and numpy computes the same
    covariance-form OLS. Exercises the grouped-map API surface against
    the SAME closed-form oracle the native version uses — the two
    formulations must agree bit-for-bit after float32 canonicalization.
    The shuffle is the groupBy key; per-group state must fit one
    executor (fine for bounded group counts; the native version is the
    scale path)."""
    import numpy as np
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("double").alias("x"), "value"
    )

    def ols(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["x"].to_numpy(dtype=np.float64)
        y = pdf["value"].to_numpy(dtype=np.float64)
        mx, my = x.mean(), y.mean()
        cov = ((x - mx) * (y - my)).sum() / len(x)
        var = ((x - mx) ** 2).sum() / len(x)
        slope = cov / var
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "slope": [np.float32(slope)],
                "intercept": [np.float32(my - slope * mx)],
                "n": [len(x)],
            }
        )

    return ev.groupBy("event_type").applyInPandas(
        ols, "event_type string, slope float, intercept float, n long"
    )


# ---------------------------------------------------------------------------
# End-to-end corpus preparation pipeline
# ---------------------------------------------------------------------------

PIPE_MIN_WORDS = 40
PIPE_TRUNC = 48


@register(
    "q_corpus_pipeline",
    rf"""
WITH sized AS (
  SELECT doc_id, text,
         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_words
  FROM documents
), filtered AS (
  SELECT * FROM sized WHERE n_words >= {PIPE_MIN_WORDS}
), deduped AS (
  SELECT min(doc_id) AS doc_id, min(text) AS text, min(n_words) AS n_words
  FROM filtered GROUP BY md5(text)
), split AS (
  SELECT doc_id, n_words,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
           % 100 AS bucket,
         array_to_string(string_split_regex(trim(text), '\s+')[1:{PIPE_TRUNC}],
                         ' ') AS trunc_text
  FROM deduped
)
SELECT doc_id, n_words,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
       CAST(length(trunc_text) AS BIGINT) AS trunc_chars
FROM split
""",
    "llm",
    "pipeline",
)
def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus-preparation job: length filter → exact dedup
    (keep min doc per content hash) → deterministic hash split →
    token-budget truncation. One aggregation shuffle (the content-hash
    dedup); every other stage fuses into a scan or projection. This is
    the end-to-end shape a training-data run executes — verified as a
    whole, not just per stage."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    sized = docs.select(
        "doc_id", "text", F.size(words).cast("long").alias("n_words")
    ).where(F.col("n_words") >= PIPE_MIN_WORDS)
    deduped = sized.groupBy(F.md5(F.col("text").cast("binary"))).agg(
        F.min("doc_id").alias("doc_id"),
        F.min("text").alias("text"),
        F.min("n_words").alias("n_words"),
    )
    trunc = F.array_join(
        F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, PIPE_TRUNC), " "
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    return deduped.select(
        "doc_id",
        "n_words",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
        F.length(trunc).cast("long").alias("trunc_chars"),
    )
