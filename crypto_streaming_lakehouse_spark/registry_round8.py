"""Round-8: oracle-backed queries over the SNAPSHOT TABLE LAYER
(sources/snapshots.py) — the versioned-manifest lakehouse format gets
driver-verifiable correctness rows instead of pytest-only evidence.

Both queries materialize a deterministic snapshot table from the
``orders`` fixture (three appended commits banded by order year, plus a
derived ``order_year`` partition-style column so manifest min/max stats
are discriminative), then read THROUGH ``snapshot_read`` — one with
manifest file-skipping, one with time travel to version 1 — and
aggregate. The DuckDB oracle expresses the same logical content as a
plain filter over ``orders``, which is exactly the equivalence the
snapshot layer must preserve: versioned reads are just filters the
metadata resolved for free.

Reference parity: the reference has no table format at all — its bronze
→ silver hop rewrites plain parquet dirs (bronze_to_silver_trades.py:
85-87), so versioned reads are the capability gap the north star calls
out; there is no reference file to cite line-for-line.

The build is memoized per (application, sf_dir) AND on disk (the table
content is a pure function of the immutable fixture, so a completed
build from an earlier session is reusable; a ``_BUILD_OK`` marker
distinguishes complete builds from crashed ones). Scratch lives under
the gitignored ``.tmp/`` (override: $SPARK_GRAFT_SNAPSHOT_TMP).
"""

from __future__ import annotations

import hashlib
import os
import pathlib
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.hashing import md5_int32, md5_int32_sql
from .operators.bars import gold_bars_cut
from .registry import BARS_CTE, r6, r6z, register
from .sources.snapshots import snapshot_read, snapshot_write
from .sources.tables import load_table

#: Yearly commit bands (complete partition of any year value, so every
#: fixture row lands in exactly one commit at any scale factor).
_BANDS_DESC = "v1: year<=1997; v2: 1998-1999; v3: year>=2000"

_SNAP_MEMO: dict[tuple[str, str], str] = {}


def _scratch_base() -> pathlib.Path:
    return pathlib.Path(
        os.environ.get(
            "SPARK_GRAFT_SNAPSHOT_TMP", "/root/repo/.tmp/snapshot_tables"
        )
    )


def orders_snapshot_table(spark: SparkSession, sf_dir: str) -> str:
    """Build (or reuse) the three-commit snapshot table over ``orders``.

    Commit 1 = orders with order_year <= 1997, commit 2 = 1998-1999,
    commit 3 = >= 2000 — so per-file ``order_year`` min/max bounds in
    the manifest are disjoint across commits and file-skipping has real
    work to do. Each commit is written as 2 files (repartition(2)) so a
    commit is never a single-file degenerate case.

    At 100 TB this build step IS the ingestion pipeline (periodic
    appends of new time bands); the queries below only ever read
    manifests + surviving files, so their cost is independent of how
    many historical commits exist.
    """
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _SNAP_MEMO.get(key)
    if hit is not None:
        return hit
    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    table = _scratch_base() / f"orders_{digest}"
    ok = table / "_BUILD_OK"
    if ok.is_file() and ok.read_text().strip() == _BANDS_DESC:
        _SNAP_MEMO[key] = str(table)
        return str(table)
    # Incomplete/stale build (crashed session, changed band spec):
    # rebuild from scratch — the fixture is immutable, so a completed
    # rebuild is byte-equivalent in content.
    shutil.rmtree(table, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    y = F.col("order_year")
    for band in (y <= 1997, (y >= 1998) & (y <= 1999), y >= 2000):
        snapshot_write(orders.where(band).repartition(2), str(table))
    ok.write_text(_BANDS_DESC)
    _SNAP_MEMO[key] = str(table)
    return str(table)


# ---------------------------------------------------------------------------
# Snapshot read with manifest file-skipping
# ---------------------------------------------------------------------------


@register(
    "q_snapshot_prune_read",
    """
SELECT CAST(month(o_orderdate) AS INTEGER) AS month,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(o_totalprice) AS REAL) AS sum_price,
       CAST(avg(o_totalprice) AS REAL) AS avg_price
FROM orders
WHERE year(o_orderdate) = 1998
GROUP BY 1
""",
    "snapshot",
    "lakehouse",
)
def q_snapshot_prune_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order totals for 1998, read through ``snapshot_read``
    with manifest-statistics pruning on the ``order_year`` band column:
    only commit 2's files (1998-1999) survive the manifest check — the
    other two commits are dropped before Spark ever lists them. Pruning
    is a superset guarantee, so the actual year filter still applies.

    Oracle equivalence: the snapshot table's latest version holds
    exactly the ``orders`` content (three appends partition the table),
    so the result must equal the same aggregate over the raw fixture.

    Scale: the read lists O(surviving files), not O(table files) — the
    same math as Delta/Iceberg data skipping; the aggregate is one
    map-side-combined shuffle over one year of data.
    """
    table = orders_snapshot_table(spark, sf_dir)
    df = snapshot_read(spark, table, prune=("order_year", 1998, 1998))
    return (
        df.where(F.col("order_year") == 1998)
        .groupBy(F.month("o_orderdate").alias("month"))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            r6(F.sum("o_totalprice"), "sum_price"),
            r6(F.avg("o_totalprice"), "avg_price"),
        )
    )


# ---------------------------------------------------------------------------
# Snapshot time travel
# ---------------------------------------------------------------------------


@register(
    "q_snapshot_time_travel",
    """
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
       CAST(sum(o_totalprice) AS REAL) AS sum_price
FROM orders
WHERE year(o_orderdate) <= 1997
GROUP BY 1
""",
    "snapshot",
    "lakehouse",
)
def q_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly order rollup AT TABLE VERSION 1 — the snapshot table after
    its first commit only (years <= 1997), read while the head is at
    version 3. Time travel must serve exactly the version-1 file set
    regardless of later appends; the oracle is the equivalent year
    filter over the raw fixture.

    Scale: resolving a version is one manifest read; the scan touches
    only that version's files. History depth never enters the plan.
    """
    table = orders_snapshot_table(spark, sf_dir)
    df = snapshot_read(spark, table, version=1)
    return df.groupBy(
        F.col("order_year").cast("int").alias("order_year")
    ).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.countDistinct("o_custkey").cast("long").alias("n_custs"),
        r6(F.sum("o_totalprice"), "sum_price"),
    )


# ---------------------------------------------------------------------------
# Snapshot growth audit (every version, one read each)
# ---------------------------------------------------------------------------


@register(
    "q_snapshot_growth",
    """
SELECT 1 AS version,
       CAST(count(*) FILTER (WHERE year(o_orderdate) <= 1997) AS BIGINT)
         AS n_orders,
       CAST(sum(o_totalprice) FILTER (WHERE year(o_orderdate) <= 1997)
            AS REAL) AS sum_price
FROM orders
UNION ALL
SELECT 2,
       CAST(count(*) FILTER (WHERE year(o_orderdate) <= 1999) AS BIGINT),
       CAST(sum(o_totalprice) FILTER (WHERE year(o_orderdate) <= 1999)
            AS REAL)
FROM orders
UNION ALL
SELECT 3, CAST(count(*) AS BIGINT), CAST(sum(o_totalprice) AS REAL)
FROM orders
""",
    "snapshot",
    "lakehouse",
)
def q_snapshot_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-growth audit across ALL snapshot versions: read each
    committed version through ``snapshot_read`` and report its row count
    and price total — the history health check an ingestion pipeline
    runs after a backfill ("did every append land, and how much did each
    add?"). The three appends are cumulative year bands, so version v's
    content equals the oracle's year(o_orderdate) <= band(v) filter.

    Scale: one manifest read + one bounded scan per version; versions
    are a handful, and each scan lists only that version's files. The
    per-version aggregates union into one plan, so Spark schedules them
    as independent stages of a single job.
    """
    table = orders_snapshot_table(spark, sf_dir)
    parts = [
        snapshot_read(spark, table, version=v).agg(
            F.lit(v).alias("version"),
            F.count("*").cast("long").alias("n_orders"),
            r6(F.sum("o_totalprice"), "sum_price"),
        )
        for v in (1, 2, 3)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.select("version", "n_orders", "sum_price")


# ---------------------------------------------------------------------------
# Value-at-Risk / expected shortfall per symbol
# ---------------------------------------------------------------------------

VAR_ALPHA = 0.05


@register(
    "q_var_es",
    BARS_CTE
    + f"""
, lagged AS (
  SELECT symbol, "close",
         lag("close") OVER (
           PARTITION BY symbol ORDER BY bar_start) AS prev
  FROM bars
), rets AS (
  SELECT symbol,
         CASE WHEN prev IS NOT NULL AND prev <> 0
              THEN "close" / prev - 1 END AS ret
  FROM lagged
), v AS (
  SELECT symbol, count(*) AS n, quantile_cont(ret, {VAR_ALPHA}) AS var95
  FROM rets WHERE ret IS NOT NULL GROUP BY symbol
)
SELECT v.symbol,
       CAST(v.n AS BIGINT) AS n,
       CAST(v.var95 AS REAL) AS var95,
       CAST(avg(r.ret) AS REAL) AS es95,
       CAST(count(*) AS BIGINT) AS n_tail
FROM v JOIN rets r ON r.symbol = v.symbol AND r.ret <= v.var95
GROUP BY v.symbol, v.n, v.var95
""",
    "quant",
    "risk",
)
def q_var_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical 95% Value-at-Risk and expected shortfall of 1-minute
    simple returns per symbol: VaR is the interpolated 5th percentile
    (``F.percentile`` ≡ DuckDB ``quantile_cont``, bit-identical — the
    q_percentile parity), ES the mean of returns at or below it — the
    two tail-risk numbers every market-risk report leads with.

    The tail membership test compares doubles both engines computed
    through the identical interpolation formula on identical sorted
    input, so the boundary is deterministic.

    Scale: one symbol-keyed window for returns (exchange-free over the
    memoized bars layout), one percentile aggregate, then the
    symbol-count-sized VaR table broadcasts back onto returns for the
    tail mean — no second fact-sized shuffle.
    """
    bars = gold_bars_cut(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("bar_start")
    prev = F.lag("close").over(w)
    # Zero-guard (SIGNALS_CTE convention): sf0.1 contains zero closes,
    # and an unguarded division is an ANSI DIVIDE_BY_ZERO at bench scale.
    rets = bars.select(
        "symbol",
        F.when(
            prev.isNotNull() & (prev != 0), F.col("close") / prev - 1
        ).alias("ret"),
    ).where(F.col("ret").isNotNull())
    v = rets.groupBy("symbol").agg(
        F.count("*").alias("n"),
        F.percentile("ret", F.lit(VAR_ALPHA)).alias("var95"),
    )
    tail = rets.join(
        F.broadcast(v), (rets["symbol"] == v["symbol"]) & (
            F.col("ret") <= F.col("var95")
        )
    ).drop(rets["symbol"])
    return tail.groupBy("symbol", "n", "var95").agg(
        r6(F.avg("ret"), "es95"),
        F.count("*").cast("long").alias("n_tail"),
    ).select(
        "symbol",
        F.col("n").cast("long").alias("n"),
        r6("var95", "var95"),
        "es95",
        "n_tail",
    )


# ---------------------------------------------------------------------------
# CAPM beta/alpha vs the equal-weight market return
# ---------------------------------------------------------------------------


@register(
    "q_capm_beta",
    BARS_CTE
    + """
, lagged AS (
  SELECT symbol, bar_start, "close",
         lag("close") OVER (
           PARTITION BY symbol ORDER BY bar_start) AS prev
  FROM bars
), rets AS (
  SELECT symbol, bar_start,
         CASE WHEN prev IS NOT NULL AND prev <> 0
              THEN "close" / prev - 1 END AS ret
  FROM lagged
), r2 AS (SELECT * FROM rets WHERE ret IS NOT NULL),
mkt AS (
  SELECT bar_start, avg(ret) AS mret FROM r2 GROUP BY bar_start
)
SELECT r.symbol,
       CAST(count(*) AS BIGINT) AS n,
       CAST(CASE WHEN var_pop(m.mret) > 0
                 THEN covar_pop(r.ret, m.mret) / var_pop(m.mret)
            END AS REAL) AS beta,
       CAST(CASE WHEN abs(avg(r.ret)
                 - covar_pop(r.ret, m.mret) / var_pop(m.mret) * avg(m.mret))
                 < 1e-6 THEN 0
                 ELSE avg(r.ret)
                 - covar_pop(r.ret, m.mret) / var_pop(m.mret) * avg(m.mret)
            END AS REAL) AS alpha
FROM r2 r JOIN mkt m ON r.bar_start = m.bar_start
GROUP BY r.symbol
""",
    "quant",
    "regression",
)
def q_capm_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol CAPM regression against the equal-weight market
    return: beta = cov(ret, mkt)/var(mkt), alpha = mean(ret) − beta ·
    mean(mkt), over minutes where the symbol traded — the systematic-
    vs-idiosyncratic decomposition behind hedging and factor models.

    Scale: returns are one exchange-free window over the bars layout;
    the market series is minutes-sized (a time-dimension table, small at
    any data volume), so it BROADCASTS back onto returns; one
    symbol-keyed aggregate computes the moments. Alpha is
    cancellation-prone near 0 → r6z snap on both engines.
    """
    bars = gold_bars_cut(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("bar_start")
    prev = F.lag("close").over(w)
    # Zero-guard — see q_var_es.
    rets = bars.select(
        "symbol",
        "bar_start",
        F.when(
            prev.isNotNull() & (prev != 0), F.col("close") / prev - 1
        ).alias("ret"),
    ).where(F.col("ret").isNotNull())
    mkt = rets.groupBy("bar_start").agg(F.avg("ret").alias("mret"))
    j = rets.join(F.broadcast(mkt), "bar_start")
    # Moments first, ratios in a scalar select: ANSI mode evaluates
    # every aggregate regardless of when() branches, so the zero-
    # variance guard must wrap the DIVISION, not the aggregates.
    m = j.groupBy("symbol").agg(
        F.count("*").alias("n"),
        F.covar_pop("ret", "mret").alias("cov_rm"),
        F.var_pop("mret").alias("var_m"),
        F.avg("ret").alias("mean_r"),
        F.avg("mret").alias("mean_m"),
    )
    beta = F.when(
        F.col("var_m") > 0, F.col("cov_rm") / F.col("var_m")
    )
    return m.select(
        "symbol",
        "n",
        r6(beta, "beta"),
        r6z(F.col("mean_r") - beta * F.col("mean_m"), "alpha"),
    )


# ---------------------------------------------------------------------------
# One-way ANOVA across event types
# ---------------------------------------------------------------------------


@register(
    "q_anova_oneway",
    """
WITH g AS (
  SELECT event_type,
         count(*) AS nj,
         avg(value) AS mj,
         (count(*) - 1) * var_samp(value) AS ssw_j
  FROM events WHERE value IS NOT NULL GROUP BY event_type
), tot AS (
  SELECT sum(nj) AS n, count(*) AS k,
         sum(nj * mj) / sum(nj) AS grand
  FROM g
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(n AS BIGINT) AS n,
       CAST(sum(nj * (mj - grand) * (mj - grand)) AS REAL) AS ss_between,
       CAST(sum(ssw_j) AS REAL) AS ss_within,
       CAST((sum(nj * (mj - grand) * (mj - grand)) / (k - 1))
            / (sum(ssw_j) / (n - k)) AS REAL) AS f_stat
FROM g CROSS JOIN tot
GROUP BY k, n, grand
""",
    "stats",
    "hypothesis-test",
)
def q_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event values across event types: between-group
    and within-group sums of squares and the F statistic — the k-group
    generalization of q_welch_ttest ("does ANY event type differ in mean
    value?"), the gatekeeper test before pairwise comparisons.

    Scale: one keyed aggregate collapses the fact table to k group
    moments; everything after is a k-row fold with a broadcast scalar.
    Sum order differs between engines → float32 canon on the squares.
    """
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("nj"),
        F.avg("value").alias("mj"),
        ((F.count("*") - 1) * F.var_samp("value")).alias("ssw_j"),
    )
    tot = g.agg(
        F.sum("nj").alias("n"),
        F.count("*").alias("k"),
        (F.sum(F.col("nj") * F.col("mj")) / F.sum("nj")).alias("grand"),
    )
    ssb = F.sum(
        F.col("nj") * (F.col("mj") - F.col("grand")) * (
            F.col("mj") - F.col("grand")
        )
    )
    return (
        g.crossJoin(F.broadcast(tot))
        .groupBy("k", "n", "grand")
        .agg(
            r6(ssb, "ss_between"),
            r6(F.sum("ssw_j"), "ss_within"),
            r6(
                (ssb / (F.col("k") - 1))
                / (F.sum("ssw_j") / (F.col("n") - F.col("k"))),
                "f_stat",
            ),
        )
        .select(
            F.col("k").cast("long").alias("k"),
            F.col("n").cast("long").alias("n"),
            "ss_between",
            "ss_within",
            "f_stat",
        )
    )


# ---------------------------------------------------------------------------
# Benjamini–Hochberg FDR step-up over per-group tests
# ---------------------------------------------------------------------------

BH_Q = 0.10


@register(
    "q_benjamini_hochberg",
    f"""
WITH g AS (
  SELECT event_type,
         count(*) AS nj,
         avg(value) AS mj,
         var_samp(value) AS vj
  FROM events WHERE value IS NOT NULL GROUP BY event_type
), tot AS (
  SELECT sum(nj * mj) / sum(nj) AS grand, count(*) AS m FROM g
), z AS (
  SELECT event_type, nj, m,
         (mj - grand) / sqrt(vj / nj) AS zj,
         1.0 / (1.0 + ((mj - grand) / sqrt(vj / nj))
                      * ((mj - grand) / sqrt(vj / nj))) AS p
  FROM g CROSS JOIN tot
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY p, event_type) AS rnk FROM z
), kmax AS (
  SELECT max(CASE WHEN p <= rnk * {BH_Q} / m THEN rnk END) AS kstar
  FROM ranked
)
SELECT event_type,
       CAST(nj AS BIGINT) AS n,
       CAST(CASE WHEN abs(zj) < 1e-6 THEN 0 ELSE zj END AS REAL) AS z,
       CAST(p AS REAL) AS p_surrogate,
       CAST(rnk AS BIGINT) AS rnk,
       rnk <= coalesce(kstar, 0) AS rejected
FROM ranked CROSS JOIN kmax
""",
    "stats",
    "hypothesis-test",
)
def q_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR step-up across the per-event-type location
    tests: each group gets a z-like deviation statistic against the
    grand mean and a RATIONAL p-surrogate 1/(1+z²) (monotone in |z|;
    rational so both engines compute bit-identical values — a normal CDF
    would route through different libm erf implementations), then the
    classic step-up: sort ascending, find the largest rank k with
    p_(k) ≤ k·q/m, reject ranks ≤ k — the multiple-testing control every
    metrics pipeline needs once it tests many segments at once.

    Scale: the fact table collapses to m group moments in one keyed agg;
    the step-up runs entirely on the m-row table (two tiny windows).
    The BH decision itself is integer/rank-exact.
    """
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("nj"),
        F.avg("value").alias("mj"),
        F.var_samp("value").alias("vj"),
    )
    tot = g.agg(
        (F.sum(F.col("nj") * F.col("mj")) / F.sum("nj")).alias("grand"),
        F.count("*").alias("m"),
    )
    zj = (F.col("mj") - F.col("grand")) / F.sqrt(F.col("vj") / F.col("nj"))
    z = g.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "nj",
        "m",
        zj.alias("zj"),
        (F.lit(1.0) / (F.lit(1.0) + zj * zj)).alias("p"),
    )
    ranked = z.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy("p", "event_type")),
    )
    kstar = F.max(
        F.when(
            F.col("p") <= F.col("rnk") * BH_Q / F.col("m"), F.col("rnk")
        )
    ).over(Window.partitionBy())
    return ranked.select(
        "event_type",
        F.col("nj").cast("long").alias("n"),
        r6z("zj", "z"),
        r6("p", "p_surrogate"),
        F.col("rnk").cast("long").alias("rnk"),
        (F.col("rnk") <= F.coalesce(kstar, F.lit(0))).alias("rejected"),
    )


# ---------------------------------------------------------------------------
# Jensen–Shannon divergence between two corpus halves
# ---------------------------------------------------------------------------

_JS_HALF_SQL = f"({md5_int32_sql('CAST(doc_id AS VARCHAR)')} % 2)"


@register(
    "q_jensen_shannon",
    rf"""
WITH tk AS (
  SELECT {_JS_HALF_SQL} AS half, t FROM (
    SELECT doc_id,
           unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
    FROM documents
  ) WHERE t <> ''
), c AS (
  SELECT t,
         CAST(count(*) FILTER (WHERE half = 0) AS DOUBLE) AS ca,
         CAST(count(*) FILTER (WHERE half = 1) AS DOUBLE) AS cb
  FROM tk GROUP BY t
), tot AS (
  SELECT sum(ca) AS na, sum(cb) AS nb, count(*) AS vocab FROM c
), terms AS (
  SELECT vocab, na, nb,
         ca / na AS p, cb / nb AS q,
         (ca / na + cb / nb) / 2 AS mid
  FROM c CROSS JOIN tot
)
SELECT CAST(vocab AS BIGINT) AS vocab,
       CAST(na AS BIGINT) AS n_tokens_a,
       CAST(nb AS BIGINT) AS n_tokens_b,
       CAST((0.5 * sum(CASE WHEN p > 0 THEN p * ln(p / mid) ELSE 0 END)
           + 0.5 * sum(CASE WHEN q > 0 THEN q * ln(q / mid) ELSE 0 END))
           / ln(2) AS REAL) AS js_bits
FROM terms GROUP BY vocab, na, nb
""",
    "llm",
    "distribution-shift",
)
def q_jensen_shannon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence between the unigram distributions of
    two deterministic corpus halves (md5 coin on doc_id): the symmetric,
    bounded [0,1]-bits distribution-shift measure — what a data pipeline
    computes between a new crawl snapshot and the previous one before
    mixing ("has the token distribution moved?"). Complements
    q_psi_drift (PSI is per-bucket on a numeric feature; JS is over the
    full vocabulary).

    Scale: one tokenize scan → one (token) aggregate with conditional
    sums (map-side combined, vocab-sized result) → one scalar fold. The
    vocab table never joins back to the corpus. ln is guarded (terms
    with zero mass contribute exactly 0 on both engines); the final sum
    is float32-canonicalized.
    """
    docs = load_table(spark, sf_dir, "documents")
    half = md5_int32(F.col("doc_id").cast("string")) % 2
    tk = docs.select(
        half.alias("half"),
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("t"),
    ).where(F.col("t") != "")
    c = tk.groupBy("t").agg(
        F.sum((F.col("half") == 0).cast("double")).alias("ca"),
        F.sum((F.col("half") == 1).cast("double")).alias("cb"),
    )
    tot = c.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.count("*").alias("vocab"),
    )
    terms = c.crossJoin(F.broadcast(tot)).select(
        "vocab",
        "na",
        "nb",
        (F.col("ca") / F.col("na")).alias("p"),
        (F.col("cb") / F.col("nb")).alias("q"),
        ((F.col("ca") / F.col("na") + F.col("cb") / F.col("nb")) / 2).alias(
            "mid"
        ),
    )
    kl = lambda x: F.sum(  # noqa: E731 — local expression builder
        F.when(F.col(x) > 0, F.col(x) * F.log(F.col(x) / F.col("mid")))
        .otherwise(F.lit(0.0))
    )
    import math

    return terms.groupBy("vocab", "na", "nb").agg(
        r6((0.5 * kl("p") + 0.5 * kl("q")) / math.log(2.0), "js_bits")
    ).select(
        F.col("vocab").cast("long").alias("vocab"),
        F.col("na").cast("long").alias("n_tokens_a"),
        F.col("nb").cast("long").alias("n_tokens_b"),
        "js_bits",
    )


# ---------------------------------------------------------------------------
# Last-touch attribution over the event stream
# ---------------------------------------------------------------------------


@register(
    "q_attribution_last_touch",
    """
WITH attributed AS (
  SELECT event_type, value,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS channel
  FROM events
)
SELECT coalesce(channel, '(direct)') AS channel,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(value) AS REAL) AS revenue
FROM attributed WHERE event_type = 'purchase'
GROUP BY 1
""",
    "pattern",
    "attribution",
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch channel attribution: every purchase is credited to the
    user's most recent PRIOR non-purchase event type (ties broken by
    event_id — fully deterministic), '(direct)' when none exists —
    the standard marketing-attribution rollup, and the same
    carry-last-non-null window shape as q_densify_ffill applied to a
    funnel question.

    Scale: one user-keyed ordered window (the sessionization
    partitioning) and one small aggregate — no self-join of purchases
    against history, which is the naive O(events × purchases) spelling.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    channel = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.select("event_type", "value", channel.alias("channel"))
        .where(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce(F.col("channel"), F.lit("(direct)")).alias("channel")
        )
        .agg(
            F.count("*").alias("n_purchases"),
            r6(F.sum("value"), "revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Kendall rank agreement between two top-k rankings
# ---------------------------------------------------------------------------

KT_K = 100


@register(
    "q_kendall_tau_topk",
    f"""
WITH p AS (
  SELECT l_partkey,
         sum(l_quantity) AS qty,
         count(*) AS n_lines
  FROM lineitem GROUP BY l_partkey
), top AS (
  SELECT l_partkey, qty, n_lines FROM p
  ORDER BY qty DESC, l_partkey LIMIT {KT_K}
), rk AS (
  SELECT l_partkey,
         row_number() OVER (ORDER BY qty DESC, l_partkey) AS r_qty,
         row_number() OVER (ORDER BY n_lines DESC, l_partkey) AS r_pop
  FROM top
), pairs AS (
  SELECT CASE WHEN (a.r_qty - b.r_qty) * (a.r_pop - b.r_pop) > 0
              THEN 1 ELSE 0 END AS conc
  FROM rk a JOIN rk b ON a.l_partkey < b.l_partkey
)
SELECT CAST({KT_K} AS BIGINT) AS k,
       CAST(sum(conc) AS BIGINT) AS concordant,
       CAST(count(*) - sum(conc) AS BIGINT) AS discordant,
       CAST(CASE WHEN abs((2.0 * sum(conc) - count(*)) / count(*)) < 1e-6
                 THEN 0
                 ELSE (2.0 * sum(conc) - count(*)) / count(*)
            END AS REAL) AS tau
FROM pairs
""",
    "stats",
    "rank-correlation",
)
def q_kendall_tau_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall rank agreement between two orderings of the top-{KT_K}
    parts by shipped quantity: quantity rank vs line-count (popularity)
    rank WITHIN that set — the ranking-stability metric used to compare
    retrieval or recommendation orderings (complements q_spearman_corr,
    which correlates values; Kendall counts pairwise inversions). Both
    ranking keys are integer-exact (quantities are integral doubles —
    exact under any summation order — and counts are longs), so top-k
    membership and all ranks are engine-deterministic; ties broken by
    part key.

    Scale: one map-side-combined aggregate over the fact table, then
    top-k via orderBy+limit — Spark plans TakeOrderedAndProject, the
    distributed partial top-k, NOT a single-task global sort. Ranks and
    the K² pair join run on a K-row table bounded by the CONSTANT
    {KT_K}, independent of data volume.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = li.groupBy("l_partkey").agg(
        F.sum("l_quantity").alias("qty"),
        F.count("*").alias("n_lines"),
    )
    top = p.orderBy(F.col("qty").desc(), F.col("l_partkey")).limit(KT_K)
    w_qty = Window.orderBy(F.col("qty").desc(), F.col("l_partkey"))
    w_pop = Window.orderBy(F.col("n_lines").desc(), F.col("l_partkey"))
    rk = top.select(
        "l_partkey",
        F.row_number().over(w_qty).alias("r_qty"),
        F.row_number().over(w_pop).alias("r_pop"),
    )
    a = rk.select(
        F.col("l_partkey").alias("ka"),
        F.col("r_qty").alias("qa"),
        F.col("r_pop").alias("pa"),
    )
    b = rk.select(
        F.col("l_partkey").alias("kb"),
        F.col("r_qty").alias("qb"),
        F.col("r_pop").alias("pb"),
    )
    conc = (
        ((F.col("qa") - F.col("qb")) * (F.col("pa") - F.col("pb")) > 0)
        .cast("long")
    )
    pairs = a.join(F.broadcast(b), F.col("ka") < F.col("kb")).select(
        conc.alias("conc")
    )
    tau = (2.0 * F.sum("conc") - F.count("*")) / F.count("*")
    return pairs.agg(
        F.lit(KT_K).cast("long").alias("k"),
        F.sum("conc").cast("long").alias("concordant"),
        (F.count("*") - F.sum("conc")).cast("long").alias("discordant"),
        r6z(tau, "tau"),
    )


# ---------------------------------------------------------------------------
# Jarque-Bera normality test of returns
# ---------------------------------------------------------------------------


@register(
    "q_jarque_bera",
    BARS_CTE
    + """
, lagged AS (
  SELECT symbol, "close",
         lag("close") OVER (
           PARTITION BY symbol ORDER BY bar_start) AS prev
  FROM bars
), rets AS (
  SELECT symbol,
         CASE WHEN prev IS NOT NULL AND prev <> 0
              THEN "close" / prev - 1 END AS x
  FROM lagged
), s AS (
  SELECT symbol, count(*) AS n,
         sum(x) AS s1, sum(x*x) AS s2, sum(x*x*x) AS s3,
         sum(x*x*x*x) AS s4
  FROM rets WHERE x IS NOT NULL GROUP BY symbol
), m AS (
  SELECT symbol, n,
         (s2 - s1*s1/n) / n AS m2,
         (s3 - 3*(s1/n)*s2 + 2*n*(s1/n)*(s1/n)*(s1/n)) / n AS m3,
         (s4 - 4*(s1/n)*s3 + 6*(s1/n)*(s1/n)*s2
             - 3*n*(s1/n)*(s1/n)*(s1/n)*(s1/n)) / n AS m4
  FROM s
)
SELECT symbol, CAST(n AS BIGINT) AS n,
       CAST(CASE WHEN m2 > 0 AND abs(m3 / (m2*sqrt(m2))) >= 1e-6
                 THEN m3 / (m2*sqrt(m2)) ELSE 0 END AS REAL) AS skewness,
       CAST(CASE WHEN m2 > 0 THEN m4 / (m2*m2) END AS REAL) AS kurtosis,
       CAST(CASE WHEN m2 > 0 THEN n / 6.0 * (
              (m3/(m2*sqrt(m2))) * (m3/(m2*sqrt(m2)))
              + (m4/(m2*m2) - 3) * (m4/(m2*m2) - 3) / 4.0
            ) END AS REAL) AS jb_stat
FROM m
""",
    "stats",
    "hypothesis-test",
)
def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test of 1-minute returns per symbol:
    skewness, (raw) kurtosis, and JB = n/6 (S^2 + (K-3)^2/4) — the
    standard pre-model check on return distributions (fat tails reject
    Gaussian risk models). Moments are computed from RAW power sums
    identically on both engines rather than via the built-in
    skewness()/kurtosis() aggregates, whose bias-correction conventions
    differ between Spark and DuckDB.

    Scale: one returns window over the bars layout + one symbol-keyed
    partial agg of four power sums — the shuffle carries one row of
    sums per symbol. Zero-variance series yield NULL (guarded ratio);
    skewness is cancellation-prone near 0 -> r6z-style snap on both.
    """
    bars = gold_bars_cut(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("bar_start")
    prev = F.lag("close").over(w)
    rets = bars.select(
        "symbol",
        F.when(
            prev.isNotNull() & (prev != 0), F.col("close") / prev - 1
        ).alias("x"),
    ).where(F.col("x").isNotNull())
    x = F.col("x")
    s = rets.groupBy("symbol").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
        F.sum(x * x * x * x).alias("s4"),
    )
    mu = F.col("s1") / F.col("n")
    m = s.select(
        "symbol",
        "n",
        ((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / F.col("n"))
        .alias("m2"),
        ((F.col("s3") - 3 * mu * F.col("s2") + 2 * F.col("n") * mu * mu * mu)
         / F.col("n")).alias("m3"),
        ((F.col("s4") - 4 * mu * F.col("s3") + 6 * mu * mu * F.col("s2")
          - 3 * F.col("n") * mu * mu * mu * mu) / F.col("n")).alias("m4"),
    )
    m2, m3, m4 = F.col("m2"), F.col("m3"), F.col("m4")
    skew = m3 / (m2 * F.sqrt(m2))
    kurt = m4 / (m2 * m2)
    return m.select(
        "symbol",
        F.col("n").cast("long").alias("n"),
        r6z(F.when(m2 > 0, skew).otherwise(F.lit(0.0)), "skewness"),
        r6(F.when(m2 > 0, kurt), "kurtosis"),
        r6(
            F.when(
                m2 > 0,
                F.col("n") / 6.0
                * (skew * skew + (kurt - 3) * (kurt - 3) / 4.0),
            ),
            "jb_stat",
        ),
    )


# ---------------------------------------------------------------------------
# Ljung-Box portmanteau autocorrelation test
# ---------------------------------------------------------------------------

LB_LAGS = (1, 2, 3)


def _lb_rho_sql(k: int) -> str:
    return f"""
  (CASE WHEN (sum(CASE WHEN g{k} IS NOT NULL THEN 1 ELSE 0 END)
              * sum(CASE WHEN g{k} IS NOT NULL THEN c*c END)
              - sum(CASE WHEN g{k} IS NOT NULL THEN c END)
                * sum(CASE WHEN g{k} IS NOT NULL THEN c END))
            * (sum(CASE WHEN g{k} IS NOT NULL THEN 1 ELSE 0 END)
               * sum(g{k}*g{k}) - sum(g{k}) * sum(g{k})) > 0
        THEN (sum(CASE WHEN g{k} IS NOT NULL THEN 1 ELSE 0 END)
              * sum(c*g{k})
              - sum(CASE WHEN g{k} IS NOT NULL THEN c END) * sum(g{k}))
             / sqrt((sum(CASE WHEN g{k} IS NOT NULL THEN 1 ELSE 0 END)
                     * sum(CASE WHEN g{k} IS NOT NULL THEN c*c END)
                     - sum(CASE WHEN g{k} IS NOT NULL THEN c END)
                       * sum(CASE WHEN g{k} IS NOT NULL THEN c END))
                    * (sum(CASE WHEN g{k} IS NOT NULL THEN 1 ELSE 0 END)
                       * sum(g{k}*g{k}) - sum(g{k}) * sum(g{k})))
        END)"""


@register(
    "q_ljung_box",
    BARS_CTE
    + """
, l AS (
  SELECT symbol, "close" AS c,
"""
    + ",\n".join(
        f'         lag("close", {k}) OVER w AS g{k}' for k in LB_LAGS
    )
    + """
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY bar_start)
), rho AS (
  SELECT symbol, count(*) AS n,
"""
    + ",\n".join(f"{_lb_rho_sql(k)} AS rho{k}" for k in LB_LAGS)
    + """
  FROM l GROUP BY symbol
)
SELECT symbol, CAST(n AS BIGINT) AS n,
"""
    + ",\n".join(
        f"       CAST(CASE WHEN abs(rho{k}) < 1e-6 THEN 0 ELSE rho{k} END"
        f" AS REAL) AS rho_{k}" for k in LB_LAGS
    )
    + f"""
,      CAST(n * (n + 2.0) * ({' + '.join(
        f'coalesce(rho{k}*rho{k}, 0) / (n - {k})' for k in LB_LAGS
    )}) AS REAL) AS lb_stat
FROM rho
""",
    "quant",
    "timeseries",
)
def q_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test on the per-symbol close series at lags
    {LB_LAGS}: LB = n(n+2) sum rho_k^2/(n-k), with rho_k the aligned-pair
    Pearson autocorrelation (exactly q_acf's moment-sum convention, so
    both engines compute identical rho inputs) — the "is there ANY
    serial correlation" gate before fitting AR models, complementing
    q_acf's per-lag view with one test statistic.

    Scale: identical shape to q_acf — one lag-alignment window over the
    bars layout plus one symbol-keyed moment agg; the LB fold is a
    scalar expression over the per-symbol sums.
    """
    bars = gold_bars_cut(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("bar_start")
    l = bars.select(
        "symbol",
        F.col("close").alias("c"),
        *[F.lag("close", k).over(w).alias(f"g{k}") for k in LB_LAGS],
    )
    aggs = [F.count("*").alias("n")]
    for k in LB_LAGS:
        ok = F.col(f"g{k}").isNotNull()
        g, c = F.col(f"g{k}"), F.col("c")
        n = F.sum(F.when(ok, 1).otherwise(0)).cast("double")
        sx = F.sum(F.when(ok, c))
        sy = F.sum(g)
        sxx = F.sum(F.when(ok, c * c))
        syy = F.sum(g * g)
        sxy = F.sum(c * g)
        num = n * sxy - sx * sy
        den2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
        aggs.append(
            F.when(den2 > 0, num / F.sqrt(den2)).alias(f"rho{k}")
        )
    rho = l.groupBy("symbol").agg(*aggs)
    nn = F.col("n").cast("double")
    lb = nn * (nn + 2.0) * sum(
        (F.coalesce(F.col(f"rho{k}") * F.col(f"rho{k}"), F.lit(0.0))
         / (nn - k))
        for k in LB_LAGS
    )
    return rho.select(
        "symbol",
        F.col("n").cast("long").alias("n"),
        *[r6z(F.col(f"rho{k}"), f"rho_{k}") for k in LB_LAGS],
        r6(lb, "lb_stat"),
    )


# ---------------------------------------------------------------------------
# Revenue concentration: Lorenz-style value-decile table
# ---------------------------------------------------------------------------


@register(
    "q_revenue_deciles",
    """
WITH rev AS (
  SELECT o_custkey,
         CAST(CAST(sum(o_totalprice) AS REAL) AS DOUBLE) AS r
  FROM orders GROUP BY o_custkey
), thr AS (
  SELECT [quantile_cont(r, 0.1), quantile_cont(r, 0.2),
          quantile_cont(r, 0.3), quantile_cont(r, 0.4),
          quantile_cont(r, 0.5), quantile_cont(r, 0.6),
          quantile_cont(r, 0.7), quantile_cont(r, 0.8),
          quantile_cont(r, 0.9)] AS t
  FROM rev
), bucketed AS (
  SELECT 1 + CAST((r > t[1]) AS INT) + CAST((r > t[2]) AS INT)
           + CAST((r > t[3]) AS INT) + CAST((r > t[4]) AS INT)
           + CAST((r > t[5]) AS INT) + CAST((r > t[6]) AS INT)
           + CAST((r > t[7]) AS INT) + CAST((r > t[8]) AS INT)
           + CAST((r > t[9]) AS INT) AS decile,
         r
  FROM rev CROSS JOIN thr
), d AS (
  SELECT decile, count(*) AS n_customers, sum(r) AS rev
  FROM bucketed GROUP BY decile
)
SELECT CAST(decile AS INTEGER) AS decile,
       CAST(n_customers AS BIGINT) AS n_customers,
       CAST(rev / sum(rev) OVER () AS REAL) AS rev_share,
       CAST(sum(rev) OVER (ORDER BY decile) / sum(rev) OVER ()
            AS REAL) AS cum_share
FROM d
""",
    "warehouse",
    "concentration",
)
def q_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz-style revenue-concentration table: customers bucketed into
    VALUE deciles of per-customer revenue (interpolated quantile
    thresholds — the scale-safe bucketing: a 1-row threshold agg
    broadcasts onto the scan, no global sort/ntile over the customer
    dimension), each decile's revenue share and the cumulative share —
    the "top decile holds X% of revenue" curve behind Gini/80-20
    reporting (q_gini computes the scalar; this is the curve).

    Per-customer revenue is float32-collapsed BEFORE thresholding on
    both engines, so bucket-boundary comparisons see bit-identical
    values despite each engine's different summation order.

    Scale: one customer-keyed agg, a 1-row quantile agg broadcast back,
    one 10-row rollup; the two windows run over 10 rows.
    """
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum("o_totalprice").cast("float").cast("double").alias("r")
    )
    qs = [i / 10.0 for i in range(1, 10)]
    thr = rev.agg(F.percentile("r", F.lit(qs)).alias("t"))
    bucket = F.lit(1)
    for i in range(1, 10):
        bucket = bucket + (
            F.col("r") > F.element_at("t", i)
        ).cast("int")
    d = (
        rev.crossJoin(F.broadcast(thr))
        .select(bucket.alias("decile"), "r")
        .groupBy("decile")
        .agg(F.count("*").alias("n_customers"), F.sum("r").alias("rev"))
    )
    w_all = Window.partitionBy()
    w_cum = Window.orderBy("decile")
    return d.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("n_customers").cast("long").alias("n_customers"),
        r6(F.col("rev") / F.sum("rev").over(w_all), "rev_share"),
        r6(
            F.sum("rev").over(w_cum) / F.sum("rev").over(w_all),
            "cum_share",
        ),
    )


# ---------------------------------------------------------------------------
# Duplicate-cluster size distribution
# ---------------------------------------------------------------------------


@register(
    "q_dup_cluster_hist",
    """
WITH c AS (
  SELECT count(*) AS cluster_size FROM documents GROUP BY text
)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
       CAST(CAST(cluster_size * count(*) AS DOUBLE)
            / sum(cluster_size * count(*)) OVER () AS REAL) AS doc_share
FROM c GROUP BY cluster_size
""",
    "llm",
    "dedup",
)
def q_dup_cluster_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate cluster-size histogram: how many text clusters
    exist at each multiplicity and what share of the corpus sits in
    them — the first diagnostic read off a dedup pass (a heavy tail
    here is what MinHash/SimHash then chase). Complements q_dedup_exact
    (which picks winners) and q_dataset_card (which reports the scalar
    dup rate) with the full distribution.

    Scale: one content-keyed agg (hash-partitioned on text — at real
    scale the key would be the content hash, same plan) and one tiny
    size-keyed rollup; integer-exact except the share.
    """
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("text").agg(F.count("*").alias("cluster_size"))
    h = c.groupBy("cluster_size").agg(F.count("*").alias("n_clusters"))
    w_all = Window.partitionBy()
    n_docs = F.col("cluster_size") * F.col("n_clusters")
    return h.select(
        F.col("cluster_size").cast("long").alias("cluster_size"),
        F.col("n_clusters").cast("long").alias("n_clusters"),
        n_docs.cast("long").alias("n_docs"),
        r6(
            n_docs.cast("double") / F.sum(n_docs).over(w_all),
            "doc_share",
        ),
    )


# ---------------------------------------------------------------------------
# Rolling 7-day distinct users (exact, explode-to-window spelling)
# ---------------------------------------------------------------------------

RDU_DAYS = 7


@register(
    "q_rolling_distinct_users",
    f"""
WITH daily AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
  FROM events
), days AS (SELECT DISTINCT day FROM daily),
contrib AS (
  SELECT CAST(w AS DATE) AS window_day, user_id
  FROM daily, unnest(generate_series(
         CAST(day AS TIMESTAMP),
         CAST(day AS TIMESTAMP) + INTERVAL {RDU_DAYS - 1} DAY,
         INTERVAL 1 DAY)) AS t(w)
)
SELECT c.window_day,
       CAST(count(DISTINCT c.user_id) AS BIGINT) AS n_users
FROM contrib c JOIN days d ON c.window_day = d.day
GROUP BY c.window_day
""",
    "pattern",
    "rolling-distinct",
)
def q_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-{RDU_DAYS}-day distinct active users per day — the
    rolling-MAU/WAU family, which has NO direct window spelling because
    COUNT(DISTINCT) OVER a moving frame isn't supported by either
    engine. The scalable exact spelling: reduce to distinct (day, user)
    pairs, replicate each pair to the {RDU_DAYS} window-days it
    contributes to (a bounded x{RDU_DAYS} multiplier on the DAILY
    distinct table, not the event stream), and count distinct per
    window key. Windows are restricted to days present in the data.

    Scale: the event stream collapses to daily pairs in one
    map-side-combined agg; the replicate+distinct works on
    days x users x {RDU_DAYS} rows. At extreme user counts the
    documented approximate swap is per-day HLL sketches merged across
    the window (q_hll_sketch_union machinery).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    days = daily.select("day").distinct()
    contrib = daily.select(
        F.explode(
            F.sequence(
                F.col("day"), F.date_add(F.col("day"), RDU_DAYS - 1)
            )
        ).alias("window_day"),
        "user_id",
    )
    return (
        contrib.join(F.broadcast(days), contrib["window_day"] == days["day"])
        .groupBy("window_day")
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Cohort lifetime value (cumulative revenue by cohort age)
# ---------------------------------------------------------------------------


@register(
    "q_cohort_ltv",
    """
WITH first_seen AS (
  SELECT user_id, min(CAST(date_trunc('week', ts) AS DATE)) AS cohort
  FROM events GROUP BY user_id
), purchases AS (
  SELECT e.user_id,
         CAST(date_trunc('week', e.ts) AS DATE) AS w,
         e.value
  FROM events e WHERE e.event_type = 'purchase' AND e.value IS NOT NULL
), aged AS (
  SELECT f.cohort,
         date_diff('day', f.cohort, p.w) // 7 AS age_weeks,
         p.value
  FROM purchases p JOIN first_seen f ON p.user_id = f.user_id
), g AS (
  SELECT cohort, age_weeks,
         count(*) AS n_purchases, sum(value) AS revenue
  FROM aged GROUP BY cohort, age_weeks
)
SELECT cohort,
       CAST(age_weeks AS BIGINT) AS age_weeks,
       CAST(n_purchases AS BIGINT) AS n_purchases,
       CAST(revenue AS REAL) AS revenue,
       CAST(sum(revenue) OVER (PARTITION BY cohort ORDER BY age_weeks)
            AS REAL) AS cum_ltv
FROM g
""",
    "pattern",
    "cohort",
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: users cohorted by first-seen WEEK
    (the fixture spans ~a month, so weekly cohorts give a real grid),
    purchase revenue rolled up by (cohort, weeks-since-cohort), with
    the running cumulative LTV per cohort — the revenue companion to
    q_retention_cohorts (which counts active users). Week age is exact
    integer arithmetic on day differences of week-truncated dates
    (Spark's months_between is fractional and DuckDB's month
    date_diff counts boundary crossings — both avoided).

    Scale: one user-keyed first-seen agg, one user-keyed join of
    purchases against it (both sides shuffle on user_id once), one
    (cohort, age) rollup; the cumulative window runs over the tiny
    cohort x age grid.
    """
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.trunc("ts", "week")).alias("cohort")
    )
    purchases = ev.where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select("user_id", F.trunc("ts", "week").alias("w"), "value")
    aged = purchases.join(first_seen, "user_id").select(
        "cohort",
        (F.datediff("w", "cohort") / 7).cast("long").alias("age_weeks"),
        "value",
    )
    g = aged.groupBy("cohort", "age_weeks").agg(
        F.count("*").alias("n_purchases"),
        F.sum("value").alias("revenue"),
    )
    w = Window.partitionBy("cohort").orderBy("age_weeks")
    return g.select(
        "cohort",
        F.col("age_weeks").cast("long").alias("age_weeks"),
        F.col("n_purchases").cast("long").alias("n_purchases"),
        r6("revenue", "revenue"),
        r6(F.sum("revenue").over(w), "cum_ltv"),
    )


# ---------------------------------------------------------------------------
# Language-ID confusion matrix (classifier eval vs labeled truth)
# ---------------------------------------------------------------------------


def _langid_confusion_sql() -> str:
    from .registry_ext import _lang_id_sql

    return f"""
WITH pred AS ({_lang_id_sql()}),
cells AS (
  SELECT d.lang AS lang_true, p.lang_pred, count(*) AS n
  FROM documents d JOIN pred p ON d.doc_id = p.doc_id
  GROUP BY 1, 2
)
SELECT lang_true, lang_pred,
       CAST(n AS BIGINT) AS n,
       CAST(CAST(n AS DOUBLE)
            / sum(n) OVER (PARTITION BY lang_true) AS REAL) AS recall_share
FROM cells
"""


@register(
    "q_langid_confusion",
    _langid_confusion_sql(),
    "llm",
    "classifier-eval",
)
def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the marker-word language classifier
    (q_lang_id) against the corpus's labeled ``lang`` column: per
    (true, predicted) cell count and its share of the true language —
    the per-class recall view a pipeline checks before trusting lang-ID
    gates for corpus routing. Complements q_lang_id (which emits
    predictions) with the evaluation.

    Scale: predictions are scan-fused expressions; the matrix is one
    (true, pred) agg over languages² cells, and the recall window runs
    over those cells, not documents.
    """
    from .extensions.text import with_lang_id

    docs = load_table(spark, sf_dir, "documents")
    cells = (
        with_lang_id(docs)
        .groupBy(
            F.col("lang").alias("lang_true"), F.col("lang_pred")
        )
        .agg(F.count("*").alias("n"))
    )
    w_true = Window.partitionBy("lang_true")
    return cells.select(
        "lang_true",
        "lang_pred",
        F.col("n").cast("long").alias("n"),
        r6(
            F.col("n").cast("double") / F.sum("n").over(w_true),
            "recall_share",
        ),
    )


# ---------------------------------------------------------------------------
# Per-user activity entropy distribution
# ---------------------------------------------------------------------------

UAE_BIN = 0.25


@register(
    "q_user_activity_entropy",
    f"""
WITH c AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT user_id, sum(n) AS tn FROM c GROUP BY 1
), uh AS (
  SELECT c.user_id,
         -sum((CAST(n AS DOUBLE) / tn) * ln(CAST(n AS DOUBLE) / tn)) AS h
  FROM c JOIN tot USING (user_id) GROUP BY c.user_id
)
SELECT CAST(floor(h / {UAE_BIN}) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(avg(h) AS REAL) AS avg_entropy
FROM uh GROUP BY 1
""",
    "pattern",
    "behavior",
)
def q_user_activity_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of per-user behavioral diversity: each user's
    Shannon entropy over their event-type mix, bucketed into
    {UAE_BIN}-nat bins — the "bot or human" behavioral-diversity signal
    (single-event-type users land in bin 0; diverse users near
    ln(5) ≈ 1.61). Entropy terms are p·ln p over exact count ratios,
    identical on both engines.

    Scale: one (user, type) agg collapses the stream, one user-keyed
    fold computes H (type cardinality is a small constant), one tiny
    bin rollup.
    """
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    tot = Window.partitionBy("user_id")
    p = F.col("n").cast("double") / F.sum("n").over(tot)
    uh = (
        c.select("user_id", (-p * F.log(p)).alias("term"))
        .groupBy("user_id")
        .agg(F.sum("term").alias("h"))
    )
    return uh.groupBy(
        F.floor(F.col("h") / UAE_BIN).cast("long").alias("bin")
    ).agg(
        F.count("*").cast("long").alias("n_users"),
        r6(F.avg("h"), "avg_entropy"),
    )


# ---------------------------------------------------------------------------
# Order-to-ship lead time by priority (fact-fact join)
# ---------------------------------------------------------------------------


@register(
    "q_ship_leadtime",
    """
SELECT o.o_orderpriority AS priority,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(avg(date_diff('day', o.o_orderdate, l.l_shipdate))
            AS REAL) AS avg_days,
       CAST(quantile_cont(date_diff('day', o.o_orderdate, l.l_shipdate),
                          0.95) AS REAL) AS p95_days
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
""",
    "warehouse",
    "join",
)
def q_ship_leadtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lead time per order priority: day gap between the
    order date and each line's ship date, with mean and p95 — the
    fulfillment-SLA report, and the one headline shape that joins the
    TWO fact tables on the order key (lineitem ⋈ orders), not a
    fact-dim broadcast.

    Scale: a genuine co-keyed fact-fact equi join — both sides shuffle
    once on l_orderkey/o_orderkey (or zero times if both are bucketed
    on it at ingestion, the layout SCALE.md prescribes); the rollup is
    5 priority groups with percentile state per group.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    days = F.datediff("l_shipdate", "o_orderdate")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            r6(F.avg(days), "avg_days"),
            r6(F.percentile(days, F.lit(0.95)), "p95_days"),
        )
    )


# ---------------------------------------------------------------------------
# Moving-average crossover signals
# ---------------------------------------------------------------------------

MA_FAST, MA_SLOW = 5, 20


@register(
    "q_ma_crossover",
    BARS_CTE
    + f"""
, sig AS (
  SELECT symbol, bar_start,
         row_number() OVER w AS rn,
         CAST(avg("close") OVER (PARTITION BY symbol ORDER BY bar_start
              ROWS BETWEEN {MA_FAST - 1} PRECEDING AND CURRENT ROW)
              AS REAL)
           > CAST(avg("close") OVER (PARTITION BY symbol ORDER BY bar_start
                ROWS BETWEEN {MA_SLOW - 1} PRECEDING AND CURRENT ROW)
                AS REAL) AS above
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY bar_start)
), x AS (
  SELECT symbol, above,
         lag(above) OVER (PARTITION BY symbol ORDER BY bar_start) AS prev,
         rn
  FROM sig
)
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_bars,
       CAST(count(*) FILTER (WHERE rn > {MA_SLOW} AND above AND NOT prev)
            AS BIGINT) AS golden_crosses,
       CAST(count(*) FILTER (WHERE rn > {MA_SLOW} AND NOT above AND prev)
            AS BIGINT) AS death_crosses
FROM x GROUP BY symbol
""",
    "quant",
    "signal",
)
def q_ma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average crossover signal counter per symbol: golden
    crosses (SMA{MA_FAST} crossing above SMA{MA_SLOW}) and death
    crosses, counted only once both windows are fully populated — the
    classic trend-following trigger, exercising STACKED sliding frames
    of different widths in one window pass. The SMA comparison is made
    on float32-collapsed values on both engines: Spark's sliding-frame
    aggregation updates incrementally while DuckDB recomputes per
    frame, so raw doubles can differ in final ulps exactly at the
    crossover boundary this query detects.

    Scale: one symbol-partitioned ordered window evaluates both SMAs
    and the lag; one keyed rollup. Bounded per-row window state.
    """
    bars = gold_bars_cut(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("bar_start")
    fast = (
        F.avg("close")
        .over(w.rowsBetween(-(MA_FAST - 1), 0))
        .cast("float")
    )
    slow = (
        F.avg("close")
        .over(w.rowsBetween(-(MA_SLOW - 1), 0))
        .cast("float")
    )
    sig = bars.select(
        "symbol",
        "bar_start",
        F.row_number().over(w).alias("rn"),
        (fast > slow).alias("above"),
    )
    x = sig.select(
        "symbol",
        "above",
        F.lag("above").over(w).alias("prev"),
        "rn",
    )
    full = F.col("rn") > MA_SLOW
    return x.groupBy("symbol").agg(
        F.count("*").cast("long").alias("n_bars"),
        F.sum(
            (full & F.col("above") & ~F.coalesce(F.col("prev"), F.lit(True)))
            .cast("long")
        ).alias("golden_crosses"),
        F.sum(
            (full & ~F.col("above") & F.coalesce(F.col("prev"), F.lit(False)))
            .cast("long")
        ).alias("death_crosses"),
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation (tercile buckets)
# ---------------------------------------------------------------------------


@register(
    "q_rfm_segments",
    """
WITH m AS (
  SELECT o_custkey,
         date_diff('day', max(o_orderdate),
                   (SELECT max(o_orderdate) FROM orders)) AS recency_d,
         count(*) AS freq,
         CAST(CAST(sum(o_totalprice) AS REAL) AS DOUBLE) AS monetary
  FROM orders GROUP BY o_custkey
), thr AS (
  SELECT quantile_cont(recency_d, 1.0/3) AS r1,
         quantile_cont(recency_d, 2.0/3) AS r2,
         quantile_cont(freq, 1.0/3) AS f1, quantile_cont(freq, 2.0/3) AS f2,
         quantile_cont(monetary, 1.0/3) AS m1,
         quantile_cont(monetary, 2.0/3) AS m2
  FROM m
), seg AS (
  SELECT 1 + CAST((recency_d > r1) AS INT) + CAST((recency_d > r2) AS INT)
           AS r_bucket,
         1 + CAST((freq > f1) AS INT) + CAST((freq > f2) AS INT) AS f_bucket,
         1 + CAST((monetary > m1) AS INT) + CAST((monetary > m2) AS INT)
           AS m_bucket,
         monetary
  FROM m CROSS JOIN thr
)
SELECT CAST(r_bucket AS INTEGER) AS r_bucket,
       CAST(f_bucket AS INTEGER) AS f_bucket,
       CAST(m_bucket AS INTEGER) AS m_bucket,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(avg(monetary) AS REAL) AS avg_monetary
FROM seg GROUP BY 1, 2, 3
""",
    "warehouse",
    "segmentation",
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-customer recency (days since last
    order vs the corpus end), frequency (order count), and monetary
    (float32-collapsed revenue, so threshold comparisons are
    engine-deterministic), each bucketed into terciles by interpolated
    quantile thresholds — the classic 27-cell marketing segmentation,
    built with the same scale-safe value-threshold bucketing as
    q_revenue_deciles (1-row quantile agg broadcast; no global sort).

    Scale: one customer-keyed agg, one 1-row threshold agg broadcast
    back, one 27-cell rollup.
    """
    orders = load_table(spark, sf_dir, "orders")
    end = orders.agg(F.max("o_orderdate").alias("corpus_end"))
    m = (
        orders.crossJoin(F.broadcast(end))
        .groupBy("o_custkey")
        .agg(
            F.datediff(
                F.first("corpus_end"), F.max("o_orderdate")
            ).alias("recency_d"),
            F.count("*").alias("freq"),
            F.sum("o_totalprice").cast("float").cast("double").alias(
                "monetary"
            ),
        )
    )
    thr = m.agg(
        F.percentile("recency_d", F.lit(1.0 / 3)).alias("r1"),
        F.percentile("recency_d", F.lit(2.0 / 3)).alias("r2"),
        F.percentile("freq", F.lit(1.0 / 3)).alias("f1"),
        F.percentile("freq", F.lit(2.0 / 3)).alias("f2"),
        F.percentile("monetary", F.lit(1.0 / 3)).alias("m1"),
        F.percentile("monetary", F.lit(2.0 / 3)).alias("m2"),
    )

    def bucket(col, t1, t2):
        return (
            F.lit(1)
            + (F.col(col) > F.col(t1)).cast("int")
            + (F.col(col) > F.col(t2)).cast("int")
        )

    seg = m.crossJoin(F.broadcast(thr)).select(
        bucket("recency_d", "r1", "r2").alias("r_bucket"),
        bucket("freq", "f1", "f2").alias("f_bucket"),
        bucket("monetary", "m1", "m2").alias("m_bucket"),
        "monetary",
    )
    return seg.groupBy("r_bucket", "f_bucket", "m_bucket").agg(
        F.count("*").cast("long").alias("n_customers"),
        r6(F.avg("monetary"), "avg_monetary"),
    )


# ---------------------------------------------------------------------------
# Inter-purchase time distribution
# ---------------------------------------------------------------------------


@register(
    "q_inter_purchase_time",
    """
WITH p AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t
  FROM events WHERE event_type = 'purchase'
), g AS (
  SELECT t - lag(t) OVER (PARTITION BY user_id ORDER BY t) AS gap_s
  FROM p
)
SELECT CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(avg(gap_s) AS REAL) AS avg_gap_s,
       CAST(quantile_cont(gap_s, 0.5) AS REAL) AS p50_gap_s,
       CAST(quantile_cont(gap_s, 0.9) AS REAL) AS p90_gap_s
FROM g WHERE gap_s IS NOT NULL
""",
    "pattern",
    "behavior",
)
def q_inter_purchase_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of the time between consecutive purchases of the
    same user (whole-second gaps — the cross-engine timestamp
    convention): count, mean, median, p90 — the repeat-purchase cadence
    behind CRM timing and churn-definition choices; the purchase-only
    sibling of q_burstiness's per-type gap statistics.

    Scale: one user-keyed ordered window over the purchase subset
    (filter pushed to the scan), one global percentile agg.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").cast("long").alias("t")
    )
    w = Window.partitionBy("user_id").orderBy("t")
    g = p.select((F.col("t") - F.lag("t").over(w)).alias("gap_s")).where(
        F.col("gap_s").isNotNull()
    )
    return g.agg(
        F.count("*").cast("long").alias("n_gaps"),
        r6(F.avg("gap_s"), "avg_gap_s"),
        r6(F.percentile("gap_s", F.lit(0.5)), "p50_gap_s"),
        r6(F.percentile("gap_s", F.lit(0.9)), "p90_gap_s"),
    )


# ---------------------------------------------------------------------------
# Basket-size histogram
# ---------------------------------------------------------------------------


@register(
    "q_basket_size_hist",
    """
WITH b AS (
  SELECT l_orderkey, count(*) AS basket_size
  FROM lineitem GROUP BY l_orderkey
)
SELECT CAST(basket_size AS BIGINT) AS basket_size,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(CAST(count(*) AS DOUBLE) / sum(count(*)) OVER ()
            AS REAL) AS order_share
FROM b GROUP BY basket_size
""",
    "warehouse",
    "distribution",
)
def q_basket_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order basket-size distribution: how many line items per order,
    as a histogram with order shares — the input-shape diagnostic for
    every per-order pair-explode operator (q_basket_lift, the
    co-purchase edge builds), whose C(k,2) cost this table bounds.

    Scale: one order-keyed count (map-side combined) and a tiny
    size-keyed rollup; the share window runs over ~dozens of cells.
    """
    li = load_table(spark, sf_dir, "lineitem")
    b = li.groupBy("l_orderkey").agg(F.count("*").alias("basket_size"))
    h = b.groupBy("basket_size").agg(F.count("*").alias("n_orders"))
    w_all = Window.partitionBy()
    return h.select(
        F.col("basket_size").cast("long").alias("basket_size"),
        F.col("n_orders").cast("long").alias("n_orders"),
        r6(
            F.col("n_orders").cast("double")
            / F.sum("n_orders").over(w_all),
            "order_share",
        ),
    )


# ---------------------------------------------------------------------------
# Day-of-week x hour activity heatmap
# ---------------------------------------------------------------------------


@register(
    "q_activity_heatmap",
    """
SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
       CAST(hour(ts) AS INTEGER) AS hour,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(avg(value) AS REAL) AS avg_value,
       CAST(CAST(count(*) AS DOUBLE) / sum(count(*)) OVER ()
            AS REAL) AS share
FROM events GROUP BY 1, 2
""",
    "pattern",
    "seasonality",
)
def q_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity heatmap over the event stream
    (counts, mean value, traffic share) — the load-shape table behind
    capacity planning and anomaly baselines; the 2-D companion of
    q_seasonal_dow (which models the weekday effect on daily means).
    Spark's 1=Sunday dayofweek convention; DuckDB's 0=Sunday is
    shifted in the oracle.

    Scale: one scan-fused keyed agg into a fixed 7×24 grid; the share
    window runs over those 168 cells.
    """
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy(
        F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hour")
    ).agg(
        F.count("*").alias("n_events"),
        F.avg("value").alias("avg_value"),
    )
    w_all = Window.partitionBy()
    return g.select(
        F.col("dow").cast("int").alias("dow"),
        F.col("hour").cast("int").alias("hour"),
        F.col("n_events").cast("long").alias("n_events"),
        r6("avg_value", "avg_value"),
        r6(
            F.col("n_events").cast("double")
            / F.sum("n_events").over(w_all),
            "share",
        ),
    )


# ---------------------------------------------------------------------------
# Cross-line unit-price dispersion per part
# ---------------------------------------------------------------------------

PD_BIN = 0.02


@register(
    "q_price_dispersion",
    f"""
WITH u AS (
  SELECT l_partkey, l_extendedprice / l_quantity AS up
  FROM lineitem WHERE l_quantity > 0
), s AS (
  SELECT l_partkey, count(*) AS n, sum(up) AS s1, sum(up * up) AS s2
  FROM u GROUP BY l_partkey HAVING count(*) >= 2
), cv AS (
  SELECT l_partkey, n,
         CASE WHEN s1 > 0 AND s2 - s1 * s1 / n > 0
              THEN sqrt((s2 - s1 * s1 / n) / n) / (s1 / n) END AS cv
  FROM s
)
SELECT CAST(floor(CAST(cv AS REAL) / {PD_BIN}) AS BIGINT) AS cv_bin,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(avg(cv) AS REAL) AS avg_cv
FROM cv WHERE cv IS NOT NULL GROUP BY 1
""",
    "warehouse",
    "distribution",
)
def q_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-price dispersion per part: coefficient of variation of
    extendedprice/quantity across a part's line items (parts sold at
    least twice), bucketed into {PD_BIN}-wide CV bins — the price-
    consistency audit that flags data-quality or discount anomalies.
    Variance comes from raw power sums (the q_jarque_bera convention)
    and the CV is float32-collapsed BEFORE binning so both engines
    place every part in the same bin.

    Scale: one part-keyed agg of three sums; everything after is
    parts-dimension-sized, ending in a tiny bin rollup.
    """
    li = load_table(spark, sf_dir, "lineitem")
    u = li.where(F.col("l_quantity") > 0).select(
        "l_partkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("up"),
    )
    s = (
        u.groupBy("l_partkey")
        .agg(
            F.count("*").alias("n"),
            F.sum("up").alias("s1"),
            F.sum(F.col("up") * F.col("up")).alias("s2"),
        )
        .where(F.col("n") >= 2)
    )
    mean = F.col("s1") / F.col("n")
    # Power-sum variance can round to a tiny negative for near-constant
    # unit prices; sqrt(NaN) would diverge from the oracle (DuckDB errors
    # on CAST(floor(NaN)), Spark bins it at 0), so guard the variance
    # itself, not just s1 > 0 — constant-price parts yield NULL on both.
    ssq = F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")
    var = ssq / F.col("n")
    cv = s.select(
        F.when((F.col("s1") > 0) & (ssq > 0), F.sqrt(var) / mean).alias("cv")
    ).where(F.col("cv").isNotNull())
    return cv.groupBy(
        F.floor(F.col("cv").cast("float") / PD_BIN)
        .cast("long")
        .alias("cv_bin")
    ).agg(
        F.count("*").cast("long").alias("n_parts"),
        r6(F.avg("cv"), "avg_cv"),
    )


# ---------------------------------------------------------------------------
# Sessions-per-user histogram
# ---------------------------------------------------------------------------


@register(
    "q_session_count_hist",
    """
WITH flagged AS (
  SELECT user_id,
         CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE
              THEN 0 ELSE 1 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), per_user AS (
  SELECT user_id, sum(new_session) AS n_sessions
  FROM flagged GROUP BY user_id
)
SELECT CAST(n_sessions AS BIGINT) AS n_sessions,
       CAST(count(*) AS BIGINT) AS n_users
FROM per_user GROUP BY n_sessions
""",
    "window",
    "session",
)
def q_session_count_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessions-per-user histogram under the 30-minute-gap convention
    (exactly q_session_ids_batch's flags, folded per user instead of
    per session) — the engagement-frequency distribution that retention
    models bin users by. Integer-exact.

    Scale: one user-keyed ordered window for the gap flags, one
    user-keyed sum, one tiny histogram rollup — the first two share the
    same user_id exchange.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ok = (
        F.col("ts").cast("long")
        - F.lag(F.col("ts").cast("long")).over(w)
    ) <= 30 * 60
    per_user = (
        ev.select(
            "user_id",
            F.when(gap_ok, 0).otherwise(1).alias("new_session"),
        )
        .groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"))
    )
    return per_user.groupBy(
        F.col("n_sessions").cast("long").alias("n_sessions")
    ).agg(F.count("*").cast("long").alias("n_users"))


# ---------------------------------------------------------------------------
# Repeat-engagement rate per event type
# ---------------------------------------------------------------------------


@register(
    "q_repeat_rate",
    """
WITH per_user AS (
  SELECT event_type, user_id, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(count(*) FILTER (WHERE n >= 2) AS BIGINT) AS n_repeat,
       CAST(CAST(count(*) FILTER (WHERE n >= 2) AS DOUBLE) / count(*)
            AS REAL) AS repeat_rate
FROM per_user GROUP BY event_type
""",
    "pattern",
    "behavior",
)
def q_repeat_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-engagement rate per event type: of the users who did the
    action at all, what share did it at least twice — the simplest
    retention-quality signal (one-shot vs habitual behavior), feeding
    the same dashboards as q_retention_cohorts at a fraction of the
    cost. Integer-exact except the rate.

    Scale: one (type, user) agg collapses the stream, one type-keyed
    conditional rollup.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count("*").alias("n")
    )
    return per_user.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum((F.col("n") >= 2).cast("long")).alias("n_repeat"),
        r6(
            F.sum((F.col("n") >= 2).cast("int")).cast("double")
            / F.count("*"),
            "repeat_rate",
        ),
    )
