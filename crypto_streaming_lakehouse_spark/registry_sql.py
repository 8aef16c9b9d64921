"""SQL-surface breadth queries: analytic patterns every warehouse user
reaches for that the core registry doesn't already pin — top-k per group,
statistical aggregates, string function battery, GROUPING SETS, FILTERed
aggregates, null-safe joins, correlated subqueries, batch sessionization,
EWMA folds, and bounded range joins.

Oracle parity notes are inline per query; float outputs are canonicalized
with r6/r6z (float32 cast on both sides) per the registry convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import BARS_CTE, r6, register
from .operators.bars import gold_bars_cut
from .sources.tables import events_as_trades, load_table


# ---------------------------------------------------------------------------
# Top-k per group (the row_number pattern)
# ---------------------------------------------------------------------------


@register(
    "q_topk_per_group",
    """
SELECT event_type, event_id, CAST(value AS REAL) AS value,
       CAST(rn AS BIGINT) AS rn
FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rn
  FROM events
) WHERE rn <= 3
""",
    "window",
    "topk",
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 rows per group via row_number — the canonical per-group top-k.
    At scale this is one shuffle on the group key and a per-partition
    heap-free sort; ties broken by event_id for determinism."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), "event_id"
    )
    return (
        ev.select(
            "event_type",
            "event_id",
            "value",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .where(F.col("rn") <= 3)
        .select(
            "event_type", "event_id", r6(F.col("value"), "value"), "rn"
        )
    )


# ---------------------------------------------------------------------------
# Statistical aggregates
# ---------------------------------------------------------------------------


@register(
    "q_stats_agg",
    """
SELECT event_type,
       CAST(stddev_samp(value) AS REAL) AS sd,
       CAST(var_samp(value) AS REAL) AS var,
       CAST(corr(value, CAST(user_id AS DOUBLE)) AS REAL) AS corr_vu,
       CAST(covar_samp(value, CAST(user_id AS DOUBLE)) AS REAL) AS covar_vu
FROM events GROUP BY event_type
""",
    "agg",
    "stats",
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment aggregate family (stddev/variance/correlation/
    covariance). Both engines use single-pass update formulas that differ
    in last ulps — float32 canonicalization per r6."""
    ev = load_table(spark, sf_dir, "events")
    u = F.col("user_id").cast("double")
    return ev.groupBy("event_type").agg(
        r6(F.stddev_samp("value"), "sd"),
        r6(F.var_samp("value"), "var"),
        r6(F.corr(F.col("value"), u), "corr_vu"),
        r6(F.covar_samp(F.col("value"), u), "covar_vu"),
    )


# ---------------------------------------------------------------------------
# String function battery
# ---------------------------------------------------------------------------


@register(
    "q_string_funcs",
    r"""
SELECT doc_id,
       upper(substr(text, 1, 12)) AS head_upper,
       lpad(CAST(doc_id AS VARCHAR), 8, '0') AS id_padded,
       regexp_extract(text, '[a-z]+', 0) AS first_word,
       replace(substr(text, 1, 40), ' ', '_') AS head_snake,
       CAST(strpos(text, 'spark') AS BIGINT) AS spark_pos,
       reverse(substr(text, 1, 10)) AS head_rev,
       split_part(text, ' ', 2) AS second_token,
       CAST(length(trim(text)) AS BIGINT) AS trimmed_len
FROM documents
""",
    "project",
    "strings",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar battery: case, pad, regex extract, replace, find,
    reverse, split_part, trim+length — all codegen'd JVM expressions
    (instr≡strpos, substring≡substr are 1-based on both engines)."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.upper(F.substring(t, 1, 12)).alias("head_upper"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("id_padded"),
        F.regexp_extract(t, "[a-z]+", 0).alias("first_word"),
        F.replace(F.substring(t, 1, 40), F.lit(" "), F.lit("_")).alias(
            "head_snake"
        ),
        F.instr(t, "spark").cast("long").alias("spark_pos"),
        F.reverse(F.substring(t, 1, 10)).alias("head_rev"),
        F.split_part(t, F.lit(" "), F.lit(2)).alias("second_token"),
        F.length(F.trim(t)).cast("long").alias("trimmed_len"),
    )


# ---------------------------------------------------------------------------
# GROUPING SETS (beyond the existing rollup/cube)
# ---------------------------------------------------------------------------

_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(l_quantity) AS REAL) AS sum_qty,
       CAST(count(*) AS BIGINT) AS n,
       CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
       CAST(grouping(l_linestatus) AS BIGINT) AS g_status
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@register("q_grouping_sets", _GROUPING_SETS_SQL, "agg", "grouping-sets")
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping() markers — the general form
    rollup/cube specialize. Executed through spark.sql over a temp view:
    one expand + one aggregate, same shuffle count as a plain groupBy."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_GROUPING_SETS_SQL)


# ---------------------------------------------------------------------------
# FILTERed / conditional aggregates
# ---------------------------------------------------------------------------


@register(
    "q_conditional_agg",
    """
SELECT event_type,
       CAST(count(*) FILTER (WHERE value > 50) AS BIGINT) AS n_high,
       CAST(sum(value) FILTER (WHERE value > 50) AS REAL) AS sum_high,
       CAST(count(*) FILTER (WHERE value > 50) AS DOUBLE) / count(*)
         AS frac_high
FROM events GROUP BY event_type
""",
    "agg",
    "conditional",
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (count_if / conditional sum / fraction) —
    one pass, no self-join; frac uses exact integer counts so no float
    canonicalization is needed on it."""
    ev = load_table(spark, sf_dir, "events")
    high = F.col("value") > 50
    n_high = F.count_if(high).cast("long")
    return ev.groupBy("event_type").agg(
        n_high.alias("n_high"),
        r6(F.sum(F.when(high, F.col("value"))), "sum_high"),
        (n_high.cast("double") / F.count("*")).alias("frac_high"),
    )


# ---------------------------------------------------------------------------
# Null-safe join
# ---------------------------------------------------------------------------

_NULLKEY = "CASE WHEN event_id % 5 = 0 THEN NULL ELSE event_type END"


@register(
    "q_nullsafe_join",
    f"""
WITH keyed AS (SELECT event_id, {_NULLKEY} AS k FROM events),
counts AS (SELECT k, CAST(count(*) AS BIGINT) AS group_n
           FROM keyed GROUP BY k)
SELECT e.event_id, e.k, c.group_n
FROM keyed e JOIN counts c ON e.k IS NOT DISTINCT FROM c.k
""",
    "join",
    "null-safe",
)
def q_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> ≡ IS NOT DISTINCT FROM): NULL keys match
    each other, so the null group joins to its own count instead of
    dropping out — still a hash-partitionable equi-join (NULLs co-locate
    on one key), unlike a non-equi fallback."""
    ev = load_table(spark, sf_dir, "events")
    k = F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(
        F.col("event_type")
    )
    keyed = ev.select("event_id", k.alias("k"))
    counts = keyed.groupBy("k").agg(F.count("*").cast("long").alias("group_n"))
    return keyed.alias("e").join(
        counts.alias("c"), F.col("e.k").eqNullSafe(F.col("c.k"))
    ).select("e.event_id", "e.k", "c.group_n")


# ---------------------------------------------------------------------------
# Correlated subqueries (EXISTS + scalar)
# ---------------------------------------------------------------------------

_SUBQUERY_SQL = """
SELECT o.o_orderkey, CAST(o.o_totalprice AS REAL) AS total_price,
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey) AS n_items
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
"""


@register("q_exists_subquery", _SUBQUERY_SQL, "join", "subquery")
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + correlated scalar subquery. Catalyst decorrelates
    both into joins (EXISTS → left-semi, scalar count → aggregate + left
    join), so the executed plan is shuffle-joins on l_orderkey, not a
    per-row probe."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_SUBQUERY_SQL)


# ---------------------------------------------------------------------------
# Batch sessionization (gap-based session ids without streaming state)
# ---------------------------------------------------------------------------

SESSION_GAP_MIN = 30


@register(
    "q_session_ids_batch",
    f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER w <= INTERVAL {SESSION_GAP_MIN} MINUTE
              THEN 0 ELSE 1 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, event_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM numbered GROUP BY user_id, session_seq
""",
    "window",
    "session",
)
def q_session_ids_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization in batch: flag rows starting a session
    (gap > 30 min via lag), running-sum the flags into session ids,
    aggregate per session. The batch twin of the streaming session_window
    — ONE shuffle on user_id reused by both window passes and a partial
    final aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ok = (
        F.col("ts").cast("long")
        - F.lag(F.col("ts").cast("long")).over(w)
    ) <= SESSION_GAP_MIN * 60
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap_ok, 0).otherwise(1).alias("new_session"),
    )
    numbered = flagged.select(
        "user_id",
        "ts",
        "event_id",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("session_seq"),
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.count("*").cast("long").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# ---------------------------------------------------------------------------
# EWMA (sequential fold without a UDF)
# ---------------------------------------------------------------------------

EWMA_ALPHA = 0.2


@register(
    "q_ewma_batch",
    BARS_CTE
    + f"""
, per_sym AS (
  SELECT symbol, count(*) AS n_bars,
         list("close" ORDER BY bar_start) AS closes
  FROM bars GROUP BY symbol
)
SELECT symbol, CAST(n_bars AS BIGINT) AS n_bars,
       CAST(list_reduce(closes,
            (acc, x) -> {EWMA_ALPHA} * x + {1 - EWMA_ALPHA} * acc)
         AS REAL) AS ewma_close
FROM per_sym
""",
    "agg",
    "ewma",
)
def q_ewma_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol EWMA of bar closes as a sequential fold — no UDF:
    collect the ordered close list per symbol (bar_start is unique per
    symbol so the order is total) and fold with aggregate(). Spark's
    NULL-init fold with f(NULL,x)=x equals DuckDB's list_reduce seeding
    with the first element. One shuffle; the per-key list is bounded by
    bars-per-symbol (time-bounded), not corpus size."""
    bars = gold_bars_cut(spark, sf_dir)
    arr = F.array_sort(F.collect_list(F.struct("bar_start", "close")))
    closes = F.transform(arr, lambda s: s.getField("close"))
    fold = F.aggregate(
        closes,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(
            EWMA_ALPHA * x + (1 - EWMA_ALPHA) * acc
        ),
    )
    return bars.groupBy("symbol").agg(
        F.count("*").cast("long").alias("n_bars"),
        r6(fold, "ewma_close"),
    )


# ---------------------------------------------------------------------------
# Bounded range join (time-windowed behavioral join)
# ---------------------------------------------------------------------------


@register(
    "q_range_join",
    """
SELECT p.event_id, CAST(count(c.event_id) AS BIGINT) AS n_clicks_1h
FROM events p
LEFT JOIN events c
  ON c.user_id = p.user_id AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id
""",
    "join",
    "range",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded range join: clicks in the hour preceding each purchase,
    per user. The user_id equality makes this a hash-partitionable
    equi-join with the time range as a post-join filter — per-key work is
    O(purchases × clicks) within a user, bounded by per-user activity,
    never a global cross join."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    joined = p.join(
        c,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "left",
    )
    return joined.groupBy(F.col("p_id").alias("event_id")).agg(
        F.count("c_id").cast("long").alias("n_clicks_1h")
    )


# ---------------------------------------------------------------------------
# Histogram (fixed-width bucketing)
# ---------------------------------------------------------------------------

HIST_WIDTH = 25.0


@register(
    "q_histogram_fixed_width",
    f"""
SELECT CAST(floor(value / {HIST_WIDTH}) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(value) AS REAL) AS lo,
       CAST(max(value) AS REAL) AS hi
FROM events GROUP BY 1
""",
    "agg",
    "histogram",
)
def q_histogram_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via arithmetic bucketing — the portable
    width_bucket. Bucket count is value-range/width, independent of row
    count: the aggregation output stays tiny at any scale."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.floor(F.col("value") / HIST_WIDTH).cast("long").alias("bucket")
    ).agg(
        F.count("*").cast("long").alias("n"),
        r6(F.min("value"), "lo"),
        r6(F.max("value"), "hi"),
    )


# ---------------------------------------------------------------------------
# Extended date/time scalar functions
# ---------------------------------------------------------------------------


@register(
    "q_date_funcs_ext",
    """
SELECT event_id,
       CAST(ts AS DATE) AS d,
       CAST(quarter(ts) AS INT) AS q,
       last_day(CAST(ts AS DATE)) AS month_end,
       CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week_start,
       CAST(isodow(ts) - 1 AS INT) AS weekday,
       CAST(ts AS DATE) + 30 AS plus_30d,
       CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT)
         AS days_since_jan1
FROM events
""",
    "project",
    "datetime",
)
def q_date_funcs_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar scalar battery: quarter, last_day, ISO week start,
    Monday-0 weekday, date arithmetic, day diffs. weekday() is Spark's
    Monday-0 convention ≡ DuckDB isodow-1; date_trunc('week') is
    ISO-Monday on both engines."""
    ev = load_table(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    return ev.select(
        "event_id",
        d.alias("d"),
        F.quarter("ts").cast("int").alias("q"),
        F.last_day(d).alias("month_end"),
        F.date_trunc("week", d).cast("date").alias("week_start"),
        F.weekday("ts").cast("int").alias("weekday"),
        F.date_add(d, 30).alias("plus_30d"),
        F.datediff(d, F.lit("2024-01-01").cast("date"))
        .cast("int")
        .alias("days_since_jan1"),
    )


# ---------------------------------------------------------------------------
# Map construction and access
# ---------------------------------------------------------------------------


@register(
    "q_map_funcs",
    """
SELECT event_id,
       CAST(len(map_keys(m)) AS INT) AS n_keys,
       (m['type'])[1] AS type_val,
       (m['bucket'])[1] AS bucket_val
FROM (
  SELECT event_id,
         MAP {'type': event_type,
              'bucket': CAST(CAST(floor(value / 100) AS BIGINT) AS VARCHAR)}
           AS m
  FROM events
)
""",
    "project",
    "map",
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map column construction + key access (create_map / map_keys /
    bracket extraction). Output flattened to scalars — map/array cells
    don't canonicalize. DuckDB's m[k] yields a 1-element list, hence the
    [1] on the oracle side; Spark's yields the scalar directly."""
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"),
        F.col("event_type"),
        F.lit("bucket"),
        (F.col("value") / 100).cast("long").cast("string"),
    )
    return ev.select(
        "event_id",
        F.size(F.map_keys(m)).cast("int").alias("n_keys"),
        m.getItem("type").alias("type_val"),
        m.getItem("bucket").alias("bucket_val"),
    )


# ---------------------------------------------------------------------------
# posexplode (index-aware array flattening)
# ---------------------------------------------------------------------------


@register(
    "q_posexplode",
    """
SELECT pos, CAST(count(*) AS BIGINT) AS n,
       CAST(avg(val) AS REAL) AS mean_val,
       CAST(min(val) AS REAL) AS min_val,
       CAST(max(val) AS REAL) AS max_val
FROM (
  SELECT CAST(i - 1 AS INT) AS pos, CAST(embedding[i] AS DOUBLE) AS val
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
)
GROUP BY pos
""",
    "project",
    "posexplode",
)
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: per-dimension statistics over the embedding corpus —
    the index-aware explode (Spark pos is 0-based; the oracle derives the
    same index from generate_series). One explode + one aggregation keyed
    by dimension: output rows = dims, independent of corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(F.posexplode("embedding").alias("pos", "v"))
        .select("pos", F.col("v").cast("double").alias("val"))
        .groupBy(F.col("pos").cast("int").alias("pos"))
        .agg(
            F.count("*").cast("long").alias("n"),
            r6(F.avg("val"), "mean_val"),
            r6(F.min("val"), "min_val"),
            r6(F.max("val"), "max_val"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding centroids (mean-pooling per label — the IVF training step)
# ---------------------------------------------------------------------------


@register(
    "q_embedding_centroids",
    """
SELECT label, CAST(i - 1 AS INT) AS pos,
       CAST(avg(CAST(embedding[i] AS DOUBLE)) AS REAL) AS centroid
FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
GROUP BY label, i
""",
    "llm",
    "centroids",
)
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid (element-wise mean) of the embedding corpus —
    mean-pooling, and exactly the update step of IVF/k-means training.
    posexplode + groupBy(label, pos): one shuffle whose key space is
    labels × dims regardless of corpus size; the alternative (zip_with
    fold in a reduce) can't map-side combine. Output flattened to
    (label, pos, value) rows — no array cells."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", F.col("pos").cast("int").alias("pos"))
        .agg(r6(F.avg(F.col("v").cast("double")), "centroid"))
    )


# ---------------------------------------------------------------------------
# Sorted list aggregation (deterministic collect)
# ---------------------------------------------------------------------------


@register(
    "q_listagg_sorted",
    """
SELECT event_type,
       array_to_string(list_sort(list_distinct(
         list(CAST(user_id % 50 AS VARCHAR)))), ',') AS users_csv,
       CAST(len(list_distinct(list(user_id % 50))) AS INT) AS n_distinct
FROM events GROUP BY event_type
""",
    "agg",
    "listagg",
)
def q_listagg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic string aggregation: collect_set → sort → join. Raw
    collect_list order is partition-dependent on any engine; sorting
    before joining is what makes list aggregation comparable and
    reproducible. Emitted as one CSV string, not an array cell."""
    ev = load_table(spark, sf_dir, "events")
    ids = (F.col("user_id") % 50).cast("string")
    return ev.groupBy("event_type").agg(
        F.array_join(F.array_sort(F.collect_set(ids)), ",").alias(
            "users_csv"
        ),
        F.size(F.collect_set(F.col("user_id") % 50))
        .cast("int")
        .alias("n_distinct"),
    )


# ---------------------------------------------------------------------------
# Bitwise aggregates
# ---------------------------------------------------------------------------


@register(
    "q_bitwise_agg",
    """
SELECT event_type,
       bit_and(user_id % 256) AS band,
       bit_or(user_id % 256) AS bor,
       bit_xor(user_id % 256) AS bxor
FROM events GROUP BY event_type
""",
    "agg",
    "bitwise",
)
def q_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR aggregates (feature-flag folding). Order- and
    partition-insensitive (commutative, associative) so they map-side
    combine and compare exactly across engines."""
    ev = load_table(spark, sf_dir, "events")
    b = F.col("user_id") % 256
    return ev.groupBy("event_type").agg(
        F.bit_and(b).alias("band"),
        F.bit_or(b).alias("bor"),
        F.bit_xor(b).alias("bxor"),
    )


# ---------------------------------------------------------------------------
# Union by name (schema-aligned union)
# ---------------------------------------------------------------------------


@register(
    "q_union_by_name",
    """
SELECT src, CAST(count(*) AS BIGINT) AS n, CAST(sum(amount) AS REAL) AS total
FROM (
  SELECT 'purchases' AS src, value AS amount, event_id FROM events
  WHERE event_type = 'purchase'
  UNION ALL BY NAME
  SELECT event_id, value * 0.5 AS amount, 'views' AS src FROM events
  WHERE event_type = 'view'
)
GROUP BY src
""",
    "set",
    "union-by-name",
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName: the two inputs present columns in different ORDER and
    the union aligns them by name (positional UNION would silently mix
    event ids into amounts). Spark unionByName ≡ DuckDB UNION ALL BY
    NAME."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "purchase").select(
        F.lit("purchases").alias("src"),
        F.col("value").alias("amount"),
        "event_id",
    )
    b = ev.where(F.col("event_type") == "view").select(
        "event_id",
        (F.col("value") * 0.5).alias("amount"),
        F.lit("views").alias("src"),
    )
    return (
        a.unionByName(b)
        .groupBy("src")
        .agg(
            F.count("*").cast("long").alias("n"),
            r6(F.sum("amount"), "total"),
        )
    )


# ---------------------------------------------------------------------------
# Rolling median (exact percentile as a window aggregate)
# ---------------------------------------------------------------------------


@register(
    "q_rolling_median",
    BARS_CTE
    + """
SELECT symbol, bar_start,
       CAST(quantile_cont("close", 0.5) OVER (
         PARTITION BY symbol ORDER BY bar_start
         ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS REAL) AS med_close_10
FROM bars
""",
    "window",
    "median",
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exact median of the last 10 closes per symbol — an exact
    percentile as a WINDOW aggregate (Spark percentile ≡ DuckDB
    quantile_cont, both linear-interpolated over the identical frame
    contents). The robust-trend primitive that mean-based rolling stats
    can't provide. Same single symbol-keyed shuffle as the other window
    queries; per-row work is O(frame)."""
    bars = gold_bars_cut(spark, sf_dir)
    w = (
        Window.partitionBy("symbol")
        .orderBy("bar_start")
        .rowsBetween(-9, Window.currentRow)
    )
    return bars.select(
        "symbol",
        "bar_start",
        r6(F.percentile("close", 0.5).over(w), "med_close_10"),
    )


# ---------------------------------------------------------------------------
# Robust z-score (median / MAD anomaly scoring)
# ---------------------------------------------------------------------------


@register(
    "q_robust_zscore",
    BARS_CTE
    + """
, med AS (
  SELECT symbol, quantile_cont("close", 0.5) AS med_close FROM bars
  GROUP BY symbol
), mad AS (
  SELECT b.symbol, m.med_close,
         quantile_cont(abs(b."close" - m.med_close), 0.5) AS mad_close
  FROM bars b JOIN med m ON b.symbol = m.symbol
  GROUP BY b.symbol, m.med_close
)
SELECT b.symbol, b.bar_start,
       CAST(b."close" AS REAL) AS close,
       CAST(CASE WHEN d.mad_close > 0
            THEN 0.6744897501960817 * (b."close" - d.med_close) / d.mad_close
       END AS REAL) AS robust_z,
       CAST(CASE WHEN d.mad_close > 0
            AND abs(0.6744897501960817 * (b."close" - d.med_close)
                    / d.mad_close) > 3.5
            THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
FROM bars b JOIN mad d ON b.symbol = d.symbol
""",
    "agg",
    "robust",
)
def q_robust_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust z-score per bar (the outlier detector that mean/
    stddev z-scores can't provide — one fat-finger trade inflates the
    stddev and hides itself; the median absolute deviation doesn't move).
    0.6745·(x−med)/MAD with the |z|>3.5 Iglewicz–Hoaglin cutoff. Two
    exact-percentile aggregations per symbol + a broadcast-sized
    per-symbol stats join back onto the bars — key space = symbols."""
    bars = gold_bars_cut(spark, sf_dir)
    K = 0.6744897501960817
    med = bars.groupBy("symbol").agg(
        F.percentile("close", 0.5).alias("med_close")
    )
    mad = (
        bars.join(med, "symbol")
        .groupBy("symbol", "med_close")
        .agg(
            F.percentile(F.abs(F.col("close") - F.col("med_close")), 0.5)
            .alias("mad_close")
        )
    )
    z = F.when(
        F.col("mad_close") > 0,
        K * (F.col("close") - F.col("med_close")) / F.col("mad_close"),
    )
    return bars.join(mad, "symbol").select(
        "symbol",
        "bar_start",
        r6(F.col("close"), "close"),
        r6(z, "robust_z"),
        F.when(F.abs(z) > 3.5, 1).otherwise(0).cast("long").alias("is_outlier"),
    )


# ---------------------------------------------------------------------------
# Two-phase salted aggregation (hot-key skew)
# ---------------------------------------------------------------------------

N_AGG_SALTS = 8


@register(
    "q_salted_agg",
    """
SELECT event_type, CAST(n AS BIGINT) AS n, CAST(total AS REAL) AS total,
       CAST(vmax AS REAL) AS vmax
FROM (
  SELECT event_type, count(*) AS n, sum(value) AS total, max(value) AS vmax
  FROM events GROUP BY event_type
)
""",
    "agg",
    "skew",
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation: phase 1 groups by (key, salt) so a
    hot key's rows spread over N_AGG_SALTS reducers; phase 2 merges the
    per-salt partials. Numerically identical to the direct groupBy for
    algebraic aggregates (count/sum/max re-associate exactly — the oracle
    IS the plain aggregation), at the cost of a second tiny shuffle.
    For when one key dominates and map-side combine alone can't save the
    single reducer — the aggregation twin of q_join_salted_skew. (The
    float sum's association order changes; float32 canonicalization
    absorbs the last-ulp drift, as everywhere else.)"""
    ev = load_table(spark, sf_dir, "events")
    salt = (F.col("event_id") % N_AGG_SALTS).alias("_salt")
    partial = ev.groupBy("event_type", salt).agg(
        F.count("*").alias("pn"),
        F.sum("value").alias("ptotal"),
        F.max("value").alias("pmax"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").cast("long").alias("n"),
        r6(F.sum("ptotal"), "total"),
        r6(F.max("pmax"), "vmax"),
    )


# ---------------------------------------------------------------------------
# Keyless time-range join via bucket expansion (the no-equi-key scale path)
# ---------------------------------------------------------------------------

RANGE_BUCKET_S = 60  # bucket width == range half-span


@register(
    "q_range_join_bucketed",
    """
SELECT v.event_id AS v_id, c.event_id AS c_id,
       CAST(epoch_us(c.ts) - epoch_us(v.ts) AS BIGINT) AS delta_us
FROM (SELECT event_id, ts FROM events WHERE event_type = 'view') v
JOIN (SELECT event_id, ts FROM events WHERE event_type = 'click') c
  ON c.ts >= v.ts - INTERVAL 1 MINUTE
 AND c.ts <= v.ts + INTERVAL 1 MINUTE
""",
    "join",
    "range",
)
def q_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range join with NO equi key (every view × every click within
    ±60 s): the naive spelling is a cartesian filter — O(n·m) at any
    scale. The scalable plan manufactures an equi key: each left row
    explodes to the ~3 minute-buckets its range can touch, the right
    side keys by its own bucket, and the join becomes a bucket equi-join
    + exact-predicate filter (each right row lives in exactly one
    bucket, so no pair dedup is needed). Work becomes O(pairs-per-
    bucket) — the manual form of the range-join optimization;
    DuckDB's IEJoin reaches the same answer from the naive predicate.
    Deltas are integer microseconds (exact)."""
    ev = load_table(spark, sf_dir, "events")
    half = RANGE_BUCKET_S
    v = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("v_id"),
        F.col("ts").alias("v_ts"),
    )
    v_bk = v.select(
        "v_id",
        "v_ts",
        F.explode(
            F.sequence(
                F.floor((F.unix_timestamp("v_ts") - half) / half),
                F.floor((F.unix_timestamp("v_ts") + half) / half),
                F.lit(1).cast("long"),
            )
        ).alias("bkt"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("ts").alias("c_ts"),
        F.floor(F.unix_timestamp("ts") / half).alias("bkt"),
    )
    joined = v_bk.join(c, "bkt").where(
        (F.col("c_ts") >= F.col("v_ts") - F.expr("INTERVAL 1 MINUTE"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 MINUTE"))
    )
    return joined.select(
        "v_id",
        "c_id",
        (F.unix_micros("c_ts") - F.unix_micros("v_ts")).alias("delta_us"),
    )


# ---------------------------------------------------------------------------
# Join-key skew diagnostics
# ---------------------------------------------------------------------------


@register(
    "q_key_skew_profile",
    """
WITH k AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(max(cnt) AS BIGINT) AS max_key_rows,
       CAST(quantile_cont(cnt, 0.5) AS REAL) AS median_key_rows,
       CAST(max(cnt) / quantile_cont(cnt, 0.5) AS REAL) AS skew_ratio,
       CAST(max(cnt) * 1.0 / sum(cnt) AS REAL) AS top_key_share
FROM k
""",
    "quality",
    "agg",
)
def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics — the measurement that decides between
    a plain shuffle join, AQE skew splitting, and manual salting
    (operators/skew.py): per-key row counts reduced to max/median
    (skew_ratio) and the hottest key's share of all rows. Two cheap
    aggregations (key counts, then a 1-row reduction over #keys rows);
    at 100 TB the first agg is the same shuffle the join itself would
    do, so profiling costs one pass — run it BEFORE committing to a join
    strategy, not after the 4-hour job dies."""
    ev = load_table(spark, sf_dir, "events")
    k = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    med = F.percentile("cnt", F.lit(0.5))
    return k.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.max("cnt").alias("max_key_rows"),
        r6(med, "median_key_rows"),
        r6(F.max("cnt") / med, "skew_ratio"),
        r6(F.max("cnt") * F.lit(1.0) / F.sum("cnt"), "top_key_share"),
    )
