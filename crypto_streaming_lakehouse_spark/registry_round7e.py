"""Round-7 batch 4: causal-inference estimators over the event stream —

- **IPW / stratified treatment effect** (inverse-propensity-weighted
  Hajek means per stratum with estimated propensities — the workhorse
  observational-data estimator),
- **difference-in-differences** (2×2 pre/post × treat/control design
  with the interaction contrast — the canonical natural-experiment
  estimator).

Treatment assignment is a deterministic md5 coin on user_id (the
portable-hash convention of functions.hashing), so both engines analyze
the identical "experiment"; the ENGINE-side machinery — stratified
weighted means, cell contrasts, one keyed agg each — is exactly what a
production experimentation pipeline runs on logged data.

Registry conventions as everywhere (see registry.py): (Spark builder,
DuckDB oracle) pairs via ``@register``; float outputs are
float32-canonicalized (r6/r6z) at the output boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.hashing import md5_int32, md5_int32_sql
from .operators.bars import gold_bars_cut
from .registry import BARS_CTE, r6, r6z, register
from .sources.tables import load_table

_TREAT_SQL = f"({md5_int32_sql('CAST(user_id AS VARCHAR)')} % 2)"


def _treat_col():
    return md5_int32(F.col("user_id").cast("string")) % 2


# ---------------------------------------------------------------------------
# IPW stratified treatment effect
# ---------------------------------------------------------------------------


@register(
    "q_ipw_ate",
    f"""
WITH base AS (
  SELECT event_type, value AS y,
         CAST({_TREAT_SQL} AS INTEGER) AS t
  FROM events WHERE value IS NOT NULL
), strata AS (
  SELECT event_type,
         count(*) AS n,
         sum(t) AS n_treat,
         CAST(sum(t) AS DOUBLE) / count(*) AS p_hat,
         sum(CASE WHEN t = 1 THEN y END) / sum(t) AS mu_treat,
         sum(CASE WHEN t = 0 THEN y END) / (count(*) - sum(t)) AS mu_ctrl
  FROM base GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(n_treat AS BIGINT) AS n_treat,
       CAST(p_hat AS REAL) AS p_hat,
       CAST(mu_treat AS REAL) AS mu_treat,
       CAST(mu_ctrl AS REAL) AS mu_ctrl,
       CAST(CASE WHEN abs(mu_treat - mu_ctrl) < 1e-6 THEN 0
                 ELSE mu_treat - mu_ctrl END AS REAL) AS ate_stratum
FROM strata
""",
    "causal",
    "experiment",
)
def q_ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified treatment-effect estimate over the event stream: a
    deterministic md5 coin on user_id assigns treatment, event_type is
    the stratum, and each stratum reports its estimated propensity and
    the treated/control outcome means whose difference is the
    within-stratum effect. Within a stratum the IPW/Hajek weights are
    constant (p̂ is stratum-level), so the weighted means reduce to the
    cell means — the estimator a logging pipeline actually materializes
    before any downstream pooling.

    Scale: one scan with per-row hash + one stratum-keyed partial agg
    (|event_type| groups) — every statistic is a conditional sum, so the
    whole estimator is a single map-side-combinable aggregation.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    base = ev.select(
        "event_type", F.col("value").alias("y"), _treat_col().alias("t")
    )
    n = F.count("*")
    nt = F.sum("t")
    mu_t = F.sum(F.when(F.col("t") == 1, F.col("y"))) / nt
    mu_c = F.sum(F.when(F.col("t") == 0, F.col("y"))) / (n - nt)
    return base.groupBy("event_type").agg(
        n.alias("n"),
        nt.cast("long").alias("n_treat"),
        r6(nt.cast("double") / n, "p_hat"),
        r6(mu_t, "mu_treat"),
        r6(mu_c, "mu_ctrl"),
        r6z(mu_t - mu_c, "ate_stratum"),
    )


# ---------------------------------------------------------------------------
# Difference-in-differences
# ---------------------------------------------------------------------------

#: Pre/post cut at the fixture month's midpoint (events span 2024-01).
DID_CUT = "2024-01-16 00:00:00"


@register(
    "q_did_estimate",
    f"""
WITH base AS (
  SELECT value AS y,
         CAST({_TREAT_SQL} AS INTEGER) AS t,
         CASE WHEN ts >= TIMESTAMP '{DID_CUT}' THEN 1 ELSE 0 END AS post
  FROM events WHERE value IS NOT NULL
), cells AS (
  SELECT t, post, count(*) AS n, avg(y) AS mu
  FROM base GROUP BY t, post
)
SELECT CAST(sum(n) AS BIGINT) AS n_obs,
       CAST(min(CASE WHEN t = 0 AND post = 0 THEN mu END) AS REAL) AS mu_ctrl_pre,
       CAST(min(CASE WHEN t = 0 AND post = 1 THEN mu END) AS REAL) AS mu_ctrl_post,
       CAST(min(CASE WHEN t = 1 AND post = 0 THEN mu END) AS REAL) AS mu_treat_pre,
       CAST(min(CASE WHEN t = 1 AND post = 1 THEN mu END) AS REAL) AS mu_treat_post,
       CAST(CASE WHEN abs(
           (min(CASE WHEN t = 1 AND post = 1 THEN mu END)
            - min(CASE WHEN t = 1 AND post = 0 THEN mu END))
           - (min(CASE WHEN t = 0 AND post = 1 THEN mu END)
              - min(CASE WHEN t = 0 AND post = 0 THEN mu END))) < 1e-6
           THEN 0 ELSE
           (min(CASE WHEN t = 1 AND post = 1 THEN mu END)
            - min(CASE WHEN t = 1 AND post = 0 THEN mu END))
           - (min(CASE WHEN t = 0 AND post = 1 THEN mu END)
              - min(CASE WHEN t = 0 AND post = 0 THEN mu END))
       END AS REAL) AS did
FROM cells
""",
    "causal",
    "experiment",
)
def q_did_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences over the event stream: the md5 coin on
    user_id defines treat/control, the fixture month's midpoint defines
    pre/post, and the estimate is the interaction contrast
    (ΔTreat − ΔControl) of the four cell means — the canonical
    natural-experiment estimator, with all four cell means reported so
    the parallel-trends eyeball check is one SELECT away.

    Scale: one scan + a 4-group agg, then a 4-row pivot-by-CASE into the
    single result row. Entirely map-side-combinable; the contrast of
    near-equal means gets the r6z zero snap (cancellation-prone output).
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    base = ev.select(
        F.col("value").alias("y"),
        _treat_col().alias("t"),
        (F.col("ts") >= F.lit(DID_CUT).cast("timestamp"))
        .cast("int")
        .alias("post"),
    )
    cells = base.groupBy("t", "post").agg(
        F.count("*").alias("n"), F.avg("y").alias("mu")
    )

    def cell(t: int, post: int):
        return F.min(
            F.when((F.col("t") == t) & (F.col("post") == post), F.col("mu"))
        )

    did = (cell(1, 1) - cell(1, 0)) - (cell(0, 1) - cell(0, 0))
    return cells.agg(
        F.sum("n").cast("long").alias("n_obs"),
        r6(cell(0, 0), "mu_ctrl_pre"),
        r6(cell(0, 1), "mu_ctrl_post"),
        r6(cell(1, 0), "mu_treat_pre"),
        r6(cell(1, 1), "mu_treat_post"),
        r6z(did, "did"),
    )


# ---------------------------------------------------------------------------
# Time-chunked rolling window (halo replication)
# ---------------------------------------------------------------------------

ROLL_S = 1800  # trailing window seconds (same 30-min frame as W3)
CHUNK_S = 7200  # time-chunk width for the distributed window


@register(
    "q_rolling_stats_chunked",
    BARS_CTE
    + """
, g AS (
  SELECT symbol, bar_start, "close", volume,
         CAST(epoch(bar_start) AS BIGINT) AS ts_s
  FROM bars
)
SELECT symbol, bar_start,
       CAST(avg("close") OVER wt AS REAL) AS close_mu,
       CAST(stddev_samp("close") OVER wt AS REAL) AS close_sd,
       CAST(avg(volume) OVER wt AS REAL) AS vol_mu,
       CAST(stddev_samp(volume) OVER wt AS REAL) AS vol_sd
FROM g
WINDOW wt AS (PARTITION BY symbol ORDER BY ts_s
              RANGE BETWEEN 1800 PRECEDING AND 1 PRECEDING)
""",
    "window",
    "chunked",
)
def q_rolling_stats_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-minute mean/stddev of close and volume per symbol —
    the SAME frame semantics as W3 (q_rolling_mean_std), computed with
    the TIME-CHUNKED window pattern: rows are bucketed into 2-hour
    chunks, every row within 30 minutes of a chunk's end is replicated
    as a read-only halo row into the next chunk, and the range window
    runs per (symbol, chunk) — so a symbol's history parallelizes
    across chunks instead of funneling through one partition.

    Why this exists: a plain PARTITION BY symbol window puts a symbol's
    ENTIRE history in one task — with a handful of symbols the whole
    fact table serializes through that many tasks at any cluster size.
    Chunking bounds per-task data at chunk+halo width; the halo
    replication factor is ROLL_S/CHUNK_S (25% here, tunable). Every
    row's trailing frame is fully contained in its chunk∪halo, so the
    results are row-identical to the unchunked spelling — the oracle IS
    the plain per-symbol window, which is the equivalence proof.

    (Frames needing unbounded history — lag, cumulative sums — chunk
    differently: a per-chunk boundary exchange, see q_weighted_median's
    distributed prefix sum. This query demonstrates the bounded-range
    case on purpose.)
    """
    bars = gold_bars_cut(spark, sf_dir)
    g = bars.select(
        "symbol",
        "bar_start",
        "close",
        "volume",
        F.unix_timestamp("bar_start").alias("ts_s"),
    )
    chunk = F.expr(f"ts_s div {CHUNK_S}")
    owned = g.select(
        "*", chunk.alias("chunk"), F.lit(0).alias("is_halo")
    )
    halo = g.where(F.col("ts_s") % CHUNK_S >= CHUNK_S - ROLL_S).select(
        "*", (chunk + 1).alias("chunk"), F.lit(1).alias("is_halo")
    )
    u = owned.unionByName(halo)
    wt = (
        Window.partitionBy("symbol", "chunk")
        .orderBy("ts_s")
        .rangeBetween(-ROLL_S, -1)
    )

    def nn(c):  # Spark stddev yields NaN on 1-element frames; oracle NULL
        return F.when(~F.isnan(c), c)

    out = (
        u.withColumn("close_mu", F.avg("close").over(wt))
        .withColumn("close_sd", nn(F.stddev_samp("close").over(wt)))
        .withColumn("vol_mu", F.avg("volume").over(wt))
        .withColumn("vol_sd", nn(F.stddev_samp("volume").over(wt)))
        .where(F.col("is_halo") == 0)
    )
    return out.select(
        "symbol",
        "bar_start",
        r6("close_mu", "close_mu"),
        r6("close_sd", "close_sd"),
        r6("vol_mu", "vol_mu"),
        r6("vol_sd", "vol_sd"),
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation
# ---------------------------------------------------------------------------


@register(
    "q_spearman_corr",
    BARS_CTE
    + """
, rk AS (
  SELECT symbol,
         rank() OVER (PARTITION BY symbol ORDER BY "close")
           + (count(*) OVER (PARTITION BY symbol, "close") - 1) / 2.0 AS rx,
         rank() OVER (PARTITION BY symbol ORDER BY volume)
           + (count(*) OVER (PARTITION BY symbol, volume) - 1) / 2.0 AS ry
  FROM bars
)
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_bars,
       CAST(CASE WHEN stddev_samp(rx) > 1e-12 AND stddev_samp(ry) > 1e-12
                 THEN CASE WHEN abs(covar_samp(rx, ry)
                                    / (stddev_samp(rx) * stddev_samp(ry)))
                                < 1e-6 THEN 0
                           ELSE covar_samp(rx, ry)
                                / (stddev_samp(rx) * stddev_samp(ry)) END
            END AS REAL) AS spearman_rho
FROM rk GROUP BY symbol
""",
    "stats",
    "correlation",
)
def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between close price and volume per
    symbol: tie-averaged ranks (min-rank + (ties−1)/2 — exact
    half-integers on both engines), then Pearson correlation of the
    ranks. The robust, monotonic-relationship complement to the Pearson
    return correlation (q_return_correlation).

    Scale: two rank windows over the symbol partitioning the bars table
    already carries, then one per-symbol correlation agg — no extra
    exchange; ranks are exact, so only the final correlation needs
    float canonicalization (r6z — near-zero correlations are
    cancellation-prone).
    """
    bars = gold_bars_cut(spark, sf_dir)

    def tie_avg_rank(col: str):
        mn = F.rank().over(Window.partitionBy("symbol").orderBy(col))
        ties = F.count("*").over(Window.partitionBy("symbol", col))
        return mn + (ties - 1) / 2.0

    rk = bars.select(
        "symbol",
        tie_avg_rank("close").alias("rx"),
        tie_avg_rank("volume").alias("ry"),
    )
    # Zero-variance guard (a symbol whose ranks are all tied — constant
    # volume at tiny SFs): the correlation is undefined, NULL on both
    # engines. Spelled from the moment aggregates rather than corr()
    # because Spark evaluates every aggregate regardless of the when()
    # branch, and ANSI-mode corr() raises on the internal 0/0.
    sx, sy = F.stddev_samp("rx"), F.stddev_samp("ry")
    rho = F.when(
        (sx > 1e-12) & (sy > 1e-12),
        F.covar_samp("rx", "ry") / (sx * sy),
    )
    return rk.groupBy("symbol").agg(
        F.count("*").alias("n_bars"),
        r6z(rho, "spearman_rho"),
    )


# ---------------------------------------------------------------------------
# Generalized ESD outlier test (3 unrolled rounds)
# ---------------------------------------------------------------------------

ESD_ROUNDS = 3


def _esd_sql() -> str:
    sql = BARS_CTE + """
, cur1 AS (SELECT symbol, bar_start, "close" FROM bars)"""
    for r in range(1, ESD_ROUNDS + 1):
        sql += f"""
, s{r} AS (
  SELECT symbol, avg("close") AS mu, stddev_samp("close") AS sd
  FROM cur{r} GROUP BY symbol
), p{r} AS (
  SELECT c.symbol, c.bar_start,
         abs((c."close" - s.mu) / s.sd) AS z,
         row_number() OVER (PARTITION BY c.symbol
                            ORDER BY abs((c."close" - s.mu) / s.sd) DESC,
                                     c.bar_start) AS rn
  FROM cur{r} c JOIN s{r} s ON c.symbol = s.symbol
  WHERE s.sd > 1e-9
), k{r} AS (SELECT symbol, bar_start, z FROM p{r} WHERE rn = 1)
, cur{r + 1} AS (
  SELECT c.* FROM cur{r} c
  LEFT JOIN k{r} k ON c.symbol = k.symbol AND c.bar_start = k.bar_start
  WHERE k.symbol IS NULL
)"""
    picks = " UNION ALL ".join(
        f"SELECT symbol, {r} AS round, bar_start, z FROM k{r}"
        for r in range(1, ESD_ROUNDS + 1)
    )
    return sql + f"""
SELECT symbol, CAST(round AS BIGINT) AS round, bar_start,
       CAST(z AS REAL) AS z
FROM ({picks})
"""


@register("q_esd_outliers", _esd_sql(), "stats", "outliers")
def q_esd_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized ESD outlier test (Rosner) over the per-symbol bar
    closes, 3 unrolled rounds: each round computes mean/stddev of the
    REMAINING series, extracts the most extreme |z| observation
    (earliest bar breaks ties), and removes it before the next round —
    the masking-proof way to find multiple outliers, vs one-shot
    z-scoring (q_zscore_anomaly) which a big outlier can mask.

    Scale: per round, one symbol-keyed moment agg (broadcast back), one
    window top-1, one anti-join removal — rounds are a fixed constant,
    each a bounded shuffle over the bars table; the oracle unrolls the
    identical rounds as chained CTEs.

    Each round's pick (ONE row per surviving symbol) is eagerly
    materialized (localCheckpoint — per-call, never memoized): lazily
    chained, round r's plan re-embedded every prior round's whole
    stats+window+anti chain TWICE (once under its stats agg, once under
    its scored join), so the unrolled plan grew ~2^r subtree copies —
    1621 formatted-plan lines / 98 Exchanges / 52 aggregates at r=3 for
    what is 3 aggs + 3 windows of real work (guide §1.2: don't compute
    things twice; §3.3: materialize to truncate pathological plans).
    With the cut, each round's chain executes exactly once. ABBA
    min-of-3 at sf0.1: 1.29 → 1.13 s — modest at fixture scale, where
    the duplicate subtrees ran on otherwise-idle cores; at corpus scale
    each duplicate is a full re-aggregation of the bars table, so the
    ~15× plan blow-up is the thing that does not survive scale-out."""
    bars = gold_bars_cut(spark, sf_dir)
    cur = bars.select("symbol", "bar_start", "close")
    picks = []
    for r in range(1, ESD_ROUNDS + 1):
        stats = cur.groupBy("symbol").agg(
            F.avg("close").alias("mu"),
            F.stddev_samp("close").alias("sd"),
        )
        z = F.abs((F.col("close") - F.col("mu")) / F.col("sd"))
        scored = (
            cur.join(F.broadcast(stats), "symbol")
            .where(F.col("sd") > 1e-9)
            .select("symbol", "bar_start", z.alias("z"))
        )
        rn = F.row_number().over(
            Window.partitionBy("symbol").orderBy(
                F.col("z").desc(), "bar_start"
            )
        )
        pick = (
            scored.withColumn("rn", rn)
            .where(F.col("rn") == 1)
            .select(
                "symbol",
                F.lit(r).cast("long").alias("round"),
                "bar_start",
                "z",
            )
            .localCheckpoint()
        )
        picks.append(pick)
        cur = cur.join(
            pick.select("symbol", "bar_start"), ["symbol", "bar_start"], "anti"
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out.select("symbol", "round", "bar_start", r6("z", "z"))


# ---------------------------------------------------------------------------
# Quantile normalization (rank -> normal scores)
# ---------------------------------------------------------------------------

QN_PARTS = 8  # range partitions for the distributed rank prefix sum

#: Acklam's rational approximation of the inverse normal CDF (|rel err|
#: < 1.15e-9 — far below the float32 output canonicalization). ONE text
#: template generates the expression for BOTH engines (F.expr on the
#: Spark side, spliced into the oracle SQL), so parity holds by
#: construction: identical expression tree, identical literals.
_ACK_A = (-3.969683028665376e+01, 2.209460984245205e+02,
          -2.759285104469687e+02, 1.383577518672690e+02,
          -3.066479806614716e+01, 2.506628277459239e+00)
_ACK_B = (-5.447609879822406e+01, 1.615858368580409e+02,
          -1.556989798598866e+02, 6.680131188771972e+01,
          -1.328068155288572e+01)
_ACK_C = (-7.784894002430293e-03, -3.223964580411365e-01,
          -2.400758277161838e+00, -2.549732539343734e+00,
          4.374664141464968e+00, 2.938163982698783e+00)
_ACK_D = (7.784695709041462e-03, 3.224671290700398e-01,
          2.445134137142996e+00, 3.754408661907416e+00)
_ACK_PLOW = 0.02425


def _horner(coeffs, x: str) -> str:
    expr = repr(coeffs[0])
    for c in coeffs[1:]:
        expr = f"({expr} * {x} + {c!r})"
    return expr


def probit_sql(p: str) -> str:
    """Inverse normal CDF of ``p`` as engine-portable SQL text."""
    qlo = f"sqrt(-2.0 * ln({p}))"
    qhi = f"sqrt(-2.0 * ln(1.0 - ({p})))"
    qc = f"(({p}) - 0.5)"
    rc = f"({qc} * {qc})"
    tail = lambda q: (  # noqa: E731 — local template helper
        f"({_horner(_ACK_C, q)}) / ({_horner(_ACK_D, q)} * {q} + 1.0)"
    )
    central = (
        f"({_horner(_ACK_A, rc)}) * {qc}"
        f" / ({_horner(_ACK_B, rc)} * {rc} + 1.0)"
    )
    return (
        f"CASE WHEN ({p}) < {_ACK_PLOW!r} THEN {tail(qlo)}"
        f" WHEN ({p}) > {1 - _ACK_PLOW!r} THEN -({tail(qhi)})"
        f" ELSE {central} END"
    )


@register(
    "q_quantile_normalize",
    rf"""
WITH s AS (
  SELECT doc_id,
         ln(1 + len(string_split_regex(trim(text), '\s+'))) AS v
  FROM documents
), n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM s),
rk AS (
  SELECT doc_id, v, rank() OVER (ORDER BY v) AS r FROM s
), p AS (
  SELECT doc_id, v, (r - 0.5) / n.n AS p FROM rk CROSS JOIN n
)
SELECT doc_id,
       CAST(p AS REAL) AS pctile,
       CAST({probit_sql('p')} AS REAL) AS normal_score
FROM p
""",
    "llm",
    "normalize",
)
def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile (rank-based) normalization of a document signal — here
    log word count — onto the standard normal: p = (rank − ½)/n (ties
    share the min rank; the ±½ continuity correction keeps p inside
    (0,1)), then z = Φ⁻¹(p) via Acklam's rational approximation. The
    standard way to make heterogeneous quality signals comparable
    before mixing them into a corpus-selection score.

    Scale: the rank comes from per-VALUE counts + the DISTRIBUTED
    PREFIX SUM (same machinery as q_mann_whitney / q_weighted_median) —
    no global single-partition sort; the probit is a branchy rational
    expression generated from ONE text template for both engines
    (identical tree, identical literals), fused into the final
    projection. n arrives as a 1-row broadcast.
    """
    from .extensions.dedup import _cut_lineage
    from .extensions.text import words

    docs = load_table(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id", F.log(1 + F.size(words(F.col("text")))).alias("v")
    )
    vals = _cut_lineage(
        s.groupBy("v")
        .agg(F.count("*").alias("cnt"))
        .repartitionByRange(QN_PARTS, "v")
        .withColumn("pid", F.spark_partition_id())
    )
    wp = Window.partitionBy("pid").orderBy("v")
    local = vals.withColumn("local_end", F.sum("cnt").over(wp))
    totals = vals.groupBy("pid").agg(F.sum("cnt").alias("ptot"))
    wo = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "pid", F.coalesce(F.sum("ptot").over(wo), F.lit(0)).alias("poff")
    )
    ranked = local.join(F.broadcast(offsets), "pid").select(
        "v",
        (F.col("poff") + F.col("local_end") - F.col("cnt") + 1).alias("r"),
    )
    n = s.agg(F.count("*").cast("double").alias("n"))
    out = (
        s.join(ranked, "v")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", ((F.col("r") - 0.5) / F.col("n")).alias("p")
        )
    )
    return out.select(
        "doc_id",
        r6("p", "pctile"),
        r6(F.expr(probit_sql("p")), "normal_score"),
    )
