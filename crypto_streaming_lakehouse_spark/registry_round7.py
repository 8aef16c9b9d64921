"""Round-7 additions: training-data-pipeline and analytics operators the
earlier registries did not cover —

- a **k-anonymity audit** over quasi-identifier columns (equivalence-class
  size profile + violating-row counts — the privacy gate a pipeline runs
  before releasing joined user data),
- **PSI distribution drift** (population stability index of the event
  value distribution between two deterministic corpus halves — the
  standard production data-drift monitor),
- **embedding effective rank** (exp-entropy of the per-dimension variance
  spectrum + participation ratio — the embedding-collapse diagnostic run
  before trusting a similarity index),
- a **fasttext-style linear quality classifier** (hash-bucketed word
  weights → integer-exact sign decision + logistic score — the cheap
  model-based corpus filter, with the weight table hash-derived so both
  engines share it without a side channel),
- **BPE merge-pair counting** (corpus-wide adjacent character-pair
  frequencies — the inner statistic of byte-pair-encoding tokenizer
  training),
- **MACD** (truncated-window exponential moving averages on the gold
  bars, signal line and integer-exact crossover counts via bit-identical
  sequential folds),
- **simplified silhouette** (per-label centroid cohesion/separation score
  over the embeddings table — the clustering-quality twin of
  q_nearest_centroid),
- **k-core decomposition** (unrolled degree-peeling rounds on the
  co-purchase graph, survivor curve per round),
- **Adamic-Adar link prediction** (common-neighbor scores for a
  hash-sampled query-node set, top-20 candidate links),
- **CCNet-style boilerplate segment dedup** (fixed-width word segments
  hashed corpus-wide; per-stratum boilerplate fraction — line-level dedup
  re-expressed for the newline-free synthetic corpus),
- **ACF** (per-symbol autocorrelation of the bar-close series at fixed
  lags from one-pass moment sums),
- **chi-square independence** (event type × day-of-week contingency with
  dof and Cramér's V — integer-exact counts, broadcast marginals),
- **Mann-Whitney U** (tie-averaged rank-sum test with integer-exact 2·U
  and tie-corrected z, ranks via the distributed prefix sum).

Registry conventions as everywhere: each query is a (Spark builder,
DuckDB oracle) pair via ``@register(name, sql, *tags)``; hashing is
md5-derived (functions.hashing) so both engines compute bit-identical
buckets; float outputs are float32-canonicalized (r6/r6z) at the output
boundary only; sequential folds (aggregate ≡ list_reduce) are relied on
for bit-identical doubles exactly as in q_ewma_batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .extensions.text import words
from .functions.hashing import md5_int32, md5_int32_sql
from .registry import BARS_CTE, r6, r6z, register
from .operators.bars import gold_bars_cut
from .sources.tables import load_table

# ---------------------------------------------------------------------------
# k-anonymity audit
# ---------------------------------------------------------------------------

#: A row is k-anonymous iff its quasi-identifier equivalence class has at
#: least K members. 6 sits just under the fixture's mean class size
#: (1500 rows / 125 classes), so both compliant and violating classes
#: exist at every scale factor.
KANON_K = 6


@register(
    "q_k_anonymity",
    f"""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment, count(*) AS sz
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(min(sz) AS BIGINT) AS k_min,
       CAST(sum(sz) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE sz < {KANON_K}) AS BIGINT)
           AS n_violating_classes,
       CAST(coalesce(sum(sz) FILTER (WHERE sz < {KANON_K}), 0) AS BIGINT)
           AS n_violating_rows
FROM classes GROUP BY c_mktsegment
""",
    "privacy",
    "audit",
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the customer table under the
    (c_nationkey, c_mktsegment) quasi-identifier: per segment, the
    equivalence-class count, the smallest class (the table's k), and how
    many classes/rows fall below K — the privacy gate a pipeline runs
    before releasing quasi-identified data (companion to q_pii_scrub,
    which handles direct identifiers).

    Scale: one keyed partial agg whose key space is the quasi-identifier
    domain (|nations| × |segments|, corpus-independent), then a
    segment-keyed rollup over that tiny table. Integer-exact throughout.
    """
    cust = load_table(spark, sf_dir, "customer")
    classes = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("sz")
    )
    viol = F.col("sz") < KANON_K
    return classes.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_classes"),
        F.min("sz").cast("long").alias("k_min"),
        F.sum("sz").cast("long").alias("n_rows"),
        F.sum(viol.cast("long")).alias("n_violating_classes"),
        F.coalesce(
            F.sum(F.when(viol, F.col("sz")).otherwise(F.lit(0))), F.lit(0)
        )
        .cast("long")
        .alias("n_violating_rows"),
    )


# ---------------------------------------------------------------------------
# PSI distribution drift
# ---------------------------------------------------------------------------

PSI_BINS = 10
#: Laplace smoothing: one pseudo-count per bin keeps empty bins finite and
#: makes PSI well-defined for sparse strata.
_PSI_HALF = md5_int32_sql("CAST(event_id AS VARCHAR) || ':psi'") + " % 2"


@register(
    "q_psi_drift",
    f"""
WITH ev AS (
  SELECT event_type, value, {_PSI_HALF} AS half
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
),
rng AS (SELECT min(value) AS mn, max(value) AS mx FROM ev),
binned AS (
  SELECT event_type, half,
         CASE WHEN mx = mn THEN 0
              ELSE least(CAST(floor((value - mn) * {PSI_BINS} / (mx - mn))
                              AS INTEGER), {PSI_BINS - 1}) END AS bin
  FROM ev, rng
),
grid AS (
  SELECT DISTINCT event_type, g.bin
  FROM binned, generate_series(0, {PSI_BINS - 1}) AS g(bin)
),
cnt AS (
  SELECT g.event_type, g.bin,
         coalesce(sum(CASE WHEN b.half = 0 THEN 1 END), 0) AS ca,
         coalesce(sum(CASE WHEN b.half = 1 THEN 1 END), 0) AS cb
  FROM grid g
  LEFT JOIN binned b ON b.event_type = g.event_type AND b.bin = g.bin
  GROUP BY g.event_type, g.bin
),
tot AS (
  SELECT event_type, sum(ca) AS na, sum(cb) AS nb
  FROM cnt GROUP BY event_type
)
SELECT c.event_type,
       CAST(t.na AS BIGINT) AS n_a,
       CAST(t.nb AS BIGINT) AS n_b,
       CAST(sum(
         ((c.ca + 1.0) / (t.na + {PSI_BINS}) - (c.cb + 1.0) / (t.nb + {PSI_BINS}))
         * ln(((c.ca + 1.0) / (t.na + {PSI_BINS}))
              / ((c.cb + 1.0) / (t.nb + {PSI_BINS})))
       ) AS REAL) AS psi
FROM cnt c JOIN tot t USING (event_type)
GROUP BY c.event_type, t.na, t.nb
""",
    "drift",
    "monitor",
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift between two deterministic halves
    of the events table (md5 of the event id picks the half, so the
    split is reproducible on every engine and executor): per event type,
    the value distribution is histogrammed into a shared fixed grid and
    PSI = Σ (p−q)·ln(p/q) with one pseudo-count per bin. PSI < 0.1 is
    the conventional "stable" threshold; the hash split makes the
    fixture's expected PSI ≈ 0 (both halves sample the same
    distribution), which the oracle verifies exactly rather than
    assuming.

    Scale: one scan + a (type, bin, half) partial agg whose key space is
    |types| × bins × 2 — corpus-independent; the min/max range scalar is
    a broadcast one-row join. No per-row Python, no quantile sort.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull() & F.col("event_type").isNotNull())
        .select(
            "event_type",
            "value",
            (
                md5_int32(F.concat(F.col("event_id").cast("string"), F.lit(":psi")))
                % 2
            ).alias("half"),
        )
    )
    rng = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    binned = ev.crossJoin(F.broadcast(rng)).select(
        "event_type",
        "half",
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("value") - F.col("mn"))
                    * PSI_BINS
                    / (F.col("mx") - F.col("mn"))
                ).cast("int"),
                F.lit(PSI_BINS - 1),
            )
        )
        .alias("bin"),
    )
    cnt = (
        binned.groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("na"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("nb"),
            *[
                F.sum(
                    F.when((F.col("half") == 0) & (F.col("bin") == b), 1).otherwise(0)
                ).alias(f"ca{b}")
                for b in range(PSI_BINS)
            ],
            *[
                F.sum(
                    F.when((F.col("half") == 1) & (F.col("bin") == b), 1).otherwise(0)
                ).alias(f"cb{b}")
                for b in range(PSI_BINS)
            ],
        )
    )
    term = None
    for b in range(PSI_BINS):
        p = (F.col(f"ca{b}") + 1.0) / (F.col("na") + PSI_BINS)
        q = (F.col(f"cb{b}") + 1.0) / (F.col("nb") + PSI_BINS)
        t = (p - q) * F.log(p / q)
        term = t if term is None else term + t
    return cnt.select(
        "event_type",
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        r6(term, "psi"),
    )


# ---------------------------------------------------------------------------
# Embedding effective rank
# ---------------------------------------------------------------------------

EMB_DIM = 64


@register(
    "q_embedding_effective_rank",
    f"""
WITH dims AS (
  SELECT g.pos,
         CAST(var_pop(CAST(embedding[g.pos] AS DOUBLE)) AS REAL) AS v
  FROM embeddings CROSS JOIN generate_series(1, {EMB_DIM}) AS g(pos)
  GROUP BY g.pos
),
tot AS (SELECT sum(CAST(v AS DOUBLE)) AS sv,
               sum(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)) AS sv2,
               max(CAST(v AS DOUBLE)) AS vmax,
               count(*) AS d
        FROM dims)
SELECT CAST(d AS BIGINT) AS n_dims,
       CAST(sv AS REAL) AS total_var,
       CAST(exp(-(SELECT sum((CAST(v AS DOUBLE) / sv)
                              * ln(CAST(v AS DOUBLE) / sv))
                  FROM dims WHERE v > 0)) AS REAL) AS effective_rank,
       CAST(sv * sv / sv2 AS REAL) AS participation_ratio,
       CAST(vmax / sv AS REAL) AS top_var_share
FROM tot
""",
    "embedding",
    "diagnostic",
)
def q_embedding_effective_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-collapse diagnostic over the embeddings table: the
    per-dimension variance spectrum summarized as effective rank
    (exp of the entropy of the normalized spectrum — Roy & Vetterli
    2007), participation ratio (Σv)²/Σv², and the largest single
    dimension's variance share. An embedding column whose effective rank
    is far below its width is collapsed and will defeat cosine dedup and
    ANN recall — this is the check a pipeline runs before building the
    similarity index.

    Oracle-exact: per-dimension variances are float32-canonicalized
    before the spectrum statistics (the q_nearest_centroid contract), so
    Welford-vs-two-pass variance ulps never reach the entropy.

    Scale: one scan with posexplode → a (dim)-keyed partial agg whose
    key space is the embedding width, then arithmetic over that
    64-row table. No shuffle grows with corpus size.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    dims = (
        emb.select(F.posexplode("v").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.var_pop("val").cast("float").cast("double").alias("v"))
    )
    tot = dims.agg(
        F.sum("v").alias("sv"),
        F.sum(F.col("v") * F.col("v")).alias("sv2"),
        F.max("v").alias("vmax"),
        F.count("*").alias("d"),
        # Guard v > 0 so zero-variance dims contribute exactly 0 on both
        # engines (DuckDB's 0*ln(0) would yield NaN; Spark's log(0) NULL).
        F.sum(F.when(F.col("v") > 0, F.col("v") * F.log("v"))).alias(
            "svlogv"
        ),
    )
    # entropy of p_i = v_i / sv:  -Σ p ln p = ln(sv) - (Σ v ln v)/sv
    ent = F.log("sv") - F.col("svlogv") / F.col("sv")
    return tot.select(
        F.col("d").cast("long").alias("n_dims"),
        r6("sv", "total_var"),
        r6(F.exp(ent), "effective_rank"),
        r6(F.col("sv") * F.col("sv") / F.col("sv2"), "participation_ratio"),
        r6(F.col("vmax") / F.col("sv"), "top_var_share"),
    )


# ---------------------------------------------------------------------------
# Fasttext-style linear quality classifier
# ---------------------------------------------------------------------------

#: Per-word weights live in [-1, 1] in steps of 1e-3, derived from the
#: word's md5 so both engines share the "model" without a weight-table
#: side channel. The class decision uses the INTEGER weight sum (scaled
#: by 1000), so good/bad is exact — no float sign boundary.
QC_GAIN = 4.0

_QC_W_HASH = md5_int32_sql("'qw:' || w")
_QC_W_INT = f"({_QC_W_HASH} % 2001 - 1000)"


@register(
    "q_quality_classifier",
    f"""
WITH scored AS (
  SELECT lang, source,
         list_sum(list_transform(string_split_regex(trim(text), '\\s+'),
                                 w -> {_QC_W_INT})) AS wsum,
         len(string_split_regex(trim(text), '\\s+')) AS n_words
  FROM documents
)
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE wsum > 0) AS BIGINT) AS n_good,
       CAST(avg(1.0 / (1.0 + exp(-{QC_GAIN} * wsum / (1000.0 * n_words))))
            AS REAL) AS avg_prob
FROM scored
GROUP BY lang, source
""",
    "llm",
    "quality",
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fasttext-style linear quality classifier over the corpus: each
    word maps to a hash-bucketed weight in [-1, 1] (md5-derived, so the
    weight table needs no side channel), a document's raw score is the
    mean word weight, and the label is the sign of the INTEGER weight
    sum — exact on both engines, no float decision boundary. The
    logistic probability (gain {QC_GAIN}) is reported as the per-stratum
    average, float32-canonicalized. This is the shape of every cheap
    model-based corpus filter (fasttext quality/lang models): broadcast
    weights, map-side scoring, one stratum agg.

    Scale: the word→weight transform runs inside the scan stage
    (list_transform, no explode, no shuffle); the only shuffle key is
    (lang, source). Real model weights would replace the hash expression
    with a broadcast map lookup — identical plan shape.
    """
    docs = load_table(spark, sf_dir, "documents")
    ws = words(F.col("text"))
    weighted = docs.select(
        "lang",
        "source",
        F.aggregate(
            ws,
            F.lit(0).cast("long"),
            lambda acc, w: acc
            + (md5_int32(F.concat(F.lit("qw:"), w)) % 2001 - 1000),
        ).alias("wsum"),
        F.size(ws).alias("n_words"),
    )
    prob = 1.0 / (
        1.0
        + F.exp(-QC_GAIN * F.col("wsum") / (1000.0 * F.col("n_words")))
    )
    return weighted.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("wsum") > 0).cast("long")).alias("n_good"),
        r6(F.avg(prob), "avg_prob"),
    )


# ---------------------------------------------------------------------------
# BPE merge-pair counting
# ---------------------------------------------------------------------------

BPE_TOP = 20


@register(
    "q_bpe_merge_pairs",
    f"""
WITH pairs AS (
  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                               i -> substr(w, CAST(i AS INTEGER), 2))) AS pair
  FROM (
    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
    FROM documents
  ) WHERE len(w) >= 2
)
SELECT pair, CAST(count(*) AS BIGINT) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair
LIMIT {BPE_TOP}
""",
    "llm",
    "tokenizer",
)
def q_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding merge-candidate counting: corpus-wide
    frequencies of adjacent character pairs inside words — the statistic
    a BPE tokenizer trainer recomputes at every merge step (Sennrich et
    al. 2016). Top-{BPE_TOP} pairs by count with the pair string as the
    deterministic tie-break; integer-exact.

    Scale: words and their char pairs are generated inside the scan
    stage (two nested explodes, no join); the only shuffle is the
    pair-keyed partial agg whose key space is bounded by the alphabet
    squared, then a TakeOrdered top-k — no global sort.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = F.explode(words(F.col("text"))).alias("w")
    pairs = (
        docs.select(w)
        .where(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, char_length(w) - 1),"
                    " i -> substr(w, i, 2))"
                )
            ).alias("pair")
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(BPE_TOP)
    )


# ---------------------------------------------------------------------------
# MACD (truncated-window EMAs + signal line + crossover counts)
# ---------------------------------------------------------------------------

#: Truncation widths: the EMA at row t folds the last MACD_W closes
#: (chronological seeded fold, q_ewma_batch contract), the signal line
#: the last MACD_SIG_W macd values. Truncation IS the operator's
#: definition — identical on both engines, so every intermediate double
#: is bit-identical and crossover counts are exact (no epsilon).
MACD_W = 64
MACD_SIG_W = 32
MACD_A_FAST = 2.0 / 13.0   # span-12 EMA
MACD_A_SLOW = 2.0 / 27.0   # span-26 EMA
MACD_A_SIG = 2.0 / 10.0    # span-9 signal


def _ema_fold_sql(lst: str, alpha: float) -> str:
    return (
        f"list_reduce({lst}, (acc, x) -> {alpha!r} * x + {1.0 - alpha!r} * acc)"
    )


@register(
    "q_macd",
    BARS_CTE
    + f"""
, m1 AS (
  SELECT symbol, bar_start,
         {_ema_fold_sql('list("close") OVER wb', MACD_A_FAST)} AS ema_fast,
         {_ema_fold_sql('list("close") OVER wb', MACD_A_SLOW)} AS ema_slow
  FROM bars
  WINDOW wb AS (PARTITION BY symbol ORDER BY bar_start
                ROWS BETWEEN {MACD_W - 1} PRECEDING AND CURRENT ROW)
),
m2 AS (SELECT symbol, bar_start, ema_fast - ema_slow AS macd FROM m1),
m3 AS (
  SELECT symbol, bar_start, macd,
         {_ema_fold_sql('list(macd) OVER ws', MACD_A_SIG)} AS sig
  FROM m2
  WINDOW ws AS (PARTITION BY symbol ORDER BY bar_start
                ROWS BETWEEN {MACD_SIG_W - 1} PRECEDING AND CURRENT ROW)
),
m4 AS (SELECT symbol, bar_start, macd, sig, macd - sig AS hist FROM m3),
nz AS (
  SELECT symbol, bar_start,
         CASE WHEN hist > 0 THEN 1 ELSE -1 END AS sgn
  FROM m4 WHERE hist <> 0
),
xing AS (
  SELECT symbol, coalesce(sum(CASE WHEN sgn <> prev THEN 1 END), 0) AS n_cross
  FROM (
    SELECT symbol, sgn,
           lag(sgn) OVER (PARTITION BY symbol ORDER BY bar_start) AS prev
    FROM nz
  ) GROUP BY symbol
)
SELECT m.symbol,
       CAST(count(*) AS BIGINT) AS n_bars,
       CAST(CASE WHEN abs(arg_max(m.macd, m.bar_start)) < 1e-6 THEN 0
                 ELSE arg_max(m.macd, m.bar_start) END AS REAL) AS last_macd,
       CAST(CASE WHEN abs(arg_max(m.sig, m.bar_start)) < 1e-6 THEN 0
                 ELSE arg_max(m.sig, m.bar_start) END AS REAL) AS last_signal,
       CAST(coalesce(any_value(x.n_cross), 0) AS BIGINT) AS n_crossovers
FROM m4 m LEFT JOIN xing x ON m.symbol = x.symbol
GROUP BY m.symbol
""",
    "quant",
    "indicator",
)
def q_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD over the gold minute bars: truncated-window span-12/26 EMAs
    of the close (chronological seeded folds over a per-row window list
    — the q_ewma_batch contract, so both engines produce bit-identical
    doubles), a span-9 signal line folded over the macd series, and the
    integer-exact count of signal-line crossovers (sign flips of the
    histogram between consecutive nonzero rows). Reported per symbol
    with the latest macd/signal values.

    Scale: two window passes partitioned by symbol — per-row state is a
    bounded {MACD_W}/{MACD_SIG_W}-element list, so memory per task is
    O(window), and the only shuffle is the symbol-range exchange the
    bars table already carries. Iteration-free: the truncated fold makes
    the recursive EMA a per-row expression.
    """
    bars = gold_bars_cut(spark, sf_dir)

    def ema_fold(lst, alpha: float):
        return F.aggregate(
            lst,
            F.lit(None).cast("double"),
            lambda acc, x: F.when(acc.isNull(), x).otherwise(
                alpha * x + (1.0 - alpha) * acc
            ),
        )

    # (A fused two-EMA struct-accumulator fold was measured here and
    # REJECTED: the per-step struct allocation in interpreted lambda
    # eval doubled the query — 1.76 s → 3.54 s — vs the two plain
    # double folds, which share the one deduplicated collect_list.)
    wb = (
        Window.partitionBy("symbol")
        .orderBy("bar_start")
        .rowsBetween(-(MACD_W - 1), 0)
    )
    closes = F.collect_list("close").over(wb)
    m1 = bars.select(
        "symbol",
        "bar_start",
        (ema_fold(closes, MACD_A_FAST) - ema_fold(closes, MACD_A_SLOW)).alias(
            "macd"
        ),
    )
    ws = (
        Window.partitionBy("symbol")
        .orderBy("bar_start")
        .rowsBetween(-(MACD_SIG_W - 1), 0)
    )
    m3 = m1.select(
        "symbol",
        "bar_start",
        "macd",
        ema_fold(F.collect_list("macd").over(ws), MACD_A_SIG).alias("sig"),
    )
    m4 = m3.withColumn("hist", F.col("macd") - F.col("sig"))

    # Crossover detection fused into the SAME window chain: the previous
    # branch filtered nonzero rows, lagged, aggregated and joined back —
    # which re-executed the whole collect_list + EMA-fold chain (the
    # query's wall) a second time, since the two consumers only share
    # the exchange below the first window. A running
    # last(sign, ignorenulls) over rows(-∞, -1) IS the lag over the
    # nonzero subsequence (NULL sign on hist=0 rows is skipped), so one
    # groupBy yields bars/argmax/crossings in a single pass over a
    # single fold-chain execution. Counted crossings are identical: a
    # nonzero row counts iff the latest earlier nonzero sign differs.
    # Measured min-of-3 at sf0.1/local[32]: 2.42 s → 1.76 s.
    runw = (
        Window.partitionBy("symbol")
        .orderBy("bar_start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sgn = F.when(
        F.col("hist") != 0,
        F.when(F.col("hist") > 0, 1).otherwise(-1),
    )
    m5 = m4.select(
        "symbol",
        "bar_start",
        "macd",
        "sig",
        sgn.alias("sgn"),
        F.last(sgn, ignorenulls=True).over(runw).alias("prev"),
    )
    return (
        m5.groupBy("symbol")
        .agg(
            F.count("*").alias("n_bars"),
            F.max(F.struct("bar_start", "macd"))["macd"].alias("last_macd_raw"),
            F.max(F.struct("bar_start", "sig"))["sig"].alias("last_sig_raw"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("sgn").isNotNull()
                        & F.col("prev").isNotNull()
                        & (F.col("sgn") != F.col("prev")),
                        1,
                    )
                ),
                F.lit(0),
            ).alias("n_cross"),
        )
        .select(
            "symbol",
            "n_bars",
            r6z("last_macd_raw", "last_macd"),
            r6z("last_sig_raw", "last_signal"),
            F.col("n_cross").cast("long").alias("n_crossovers"),
        )
    )


# ---------------------------------------------------------------------------
# Simplified silhouette (per-label centroid cohesion vs separation)
# ---------------------------------------------------------------------------

SIL_DIM = 64

_SIL_D2 = (
    "list_reduce(list_transform(generate_series(1, {dim}), "
    "i -> (CAST(v[i] AS DOUBLE) - CAST(c[i] AS DOUBLE))"
    " * (CAST(v[i] AS DOUBLE) - CAST(c[i] AS DOUBLE))), "
    "(acc, x) -> acc + x)"
).format(dim=SIL_DIM)


@register(
    "q_silhouette",
    f"""
WITH emb AS (SELECT vec_id, label, embedding AS v FROM embeddings),
cent AS (
  SELECT label AS cid, list(CAST(mf AS DOUBLE) ORDER BY pos) AS c
  FROM (
    SELECT e.label, g.pos,
           CAST(avg(CAST(e.v[g.pos] AS DOUBLE)) AS REAL) AS mf
    FROM emb e CROSS JOIN generate_series(1, {SIL_DIM}) AS g(pos)
    GROUP BY e.label, g.pos
  ) GROUP BY label
),
dists AS (
  SELECT e.vec_id, e.label,
         min(CASE WHEN c.cid = e.label THEN sqrt({_SIL_D2}) END) AS a,
         min(CASE WHEN c.cid <> e.label THEN sqrt({_SIL_D2}) END) AS b
  FROM emb e CROSS JOIN cent c
  GROUP BY e.vec_id, e.label
),
sil AS (
  SELECT label,
         CASE WHEN greatest(a, b) > 0 THEN (b - a) / greatest(a, b)
              ELSE 0.0 END AS s, a, b
  FROM dists
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n,
       CAST(CASE WHEN abs(avg(s)) < 1e-6 THEN 0 ELSE avg(s) END AS REAL)
           AS mean_silhouette,
       CAST(avg(a) AS REAL) AS mean_intra,
       CAST(avg(b) AS REAL) AS mean_nearest_other
FROM sil GROUP BY label
""",
    "ml",
    "cluster-eval",
)
def q_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette of the labeled embeddings:
    a(i) = distance to the own-label centroid, b(i) = distance to the
    nearest other centroid, s(i) = (b−a)/max(a,b) — the O(n·K)
    clustering-quality score that replaces the O(n²) pairwise silhouette
    at corpus scale, reported per label. Negative means the label's
    points sit closer to another centroid than their own: labels are not
    separable and a nearest-centroid filter built on them would be noise.

    Oracle-exact via the q_nearest_centroid contract: centroid means are
    float32-canonicalized before use, distance folds are identical-order
    sequential sums (bit-identical doubles), sqrt is IEEE-exact, and the
    min-over-centroids is order-free.

    Scale: the centroid build is one (label, pos) partial agg
    (|labels| × dim key space); scoring folds the centroid table into
    one broadcast row and evaluates per-vector array expressions in the
    scan stage — no shuffle of the vectors; the final agg keys on
    |labels|.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = (
        emb.select("label", F.posexplode("v").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.avg("val").cast("float").alias("mf"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "mf"))).alias("s"))
        .select(
            F.col("label").alias("cid"),
            F.transform("s", lambda x: x["mf"].cast("double")).alias("c"),
        )
    )

    def d2(v, c):
        return F.aggregate(
            F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    cents = cent.agg(F.collect_list(F.struct("cid", "c")).alias("cents"))
    ds = F.transform(
        F.col("cents"),
        lambda ct: F.struct(
            ct["cid"].alias("cid"), F.sqrt(d2(F.col("v"), ct["c"])).alias("dist")
        ),
    )
    a = F.element_at(
        F.filter(ds, lambda x: x["cid"] == F.col("label")), 1
    )["dist"]
    b = F.array_min(
        F.transform(
            F.filter(ds, lambda x: x["cid"] != F.col("label")),
            lambda x: x["dist"],
        )
    )
    scored = (
        emb.crossJoin(F.broadcast(cents))
        .select(
            "label",
            a.alias("a"),
            b.alias("b"),
        )
        .withColumn(
            "s",
            F.when(
                F.greatest("a", "b") > 0,
                (F.col("b") - F.col("a")) / F.greatest("a", "b"),
            ).otherwise(F.lit(0.0)),
        )
    )
    return scored.groupBy(F.col("label").cast("long").alias("label")).agg(
        F.count("*").alias("n"),
        r6z(F.avg("s"), "mean_silhouette"),
        r6(F.avg("a"), "mean_intra"),
        r6(F.avg("b"), "mean_nearest_other"),
    )


# ---------------------------------------------------------------------------
# k-core decomposition (unrolled degree peeling)
# ---------------------------------------------------------------------------

#: Peel threshold K = ceil(KCORE_MULT × average degree), derived from the
#: graph itself so the operator stays meaningful at every scale factor
#: (the co-purchase graph is near-regular: a fixed K would be all-or-
#: nothing). KCORE_ROUNDS unrolled peels; on the fixtures the cascade
#: reaches its fixpoint (often the empty core — supercritical peeling)
#: within them, and the survivor CURVE is the reported result.
KCORE_MULT = 0.95
KCORE_ROUNDS = 4

_KCORE_EDGES_SQL = """
edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a
  JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT node, count(*) AS d FROM (
    SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
  ) GROUP BY node
)
"""


def _kcore_sql() -> str:
    # AS MATERIALIZED on every loop CTE: DuckDB 1.0 INLINES plain CTEs,
    # and core{p} is referenced 3× per round (twice in deg{r}, once in
    # core{r}), so inlining re-evaluates the C(k,2) edge build 3^rounds
    # times — measured: the plain spelling runs >60 s at sf0.01 where
    # the materialized one takes 0.1 s, identical results. This is the
    # oracle-side twin of the Spark plan's per-round lineage cut.
    ctes = [
        _KCORE_EDGES_SQL.strip().rstrip(),
        f"kp AS MATERIALIZED (SELECT CAST(ceil(CAST({KCORE_MULT!r} AS"
        " DOUBLE) * sum(d) / count(*)) AS BIGINT) AS k FROM deg)",
        "core0 AS MATERIALIZED (SELECT u, v FROM edges)",
    ]
    for r in range(1, KCORE_ROUNDS + 1):
        p = r - 1
        ctes.append(
            f"deg{r} AS MATERIALIZED (SELECT node, count(*) AS d FROM ("
            f"SELECT u AS node FROM core{p} UNION ALL SELECT v FROM core{p}"
            f") GROUP BY node)"
        )
        ctes.append(
            f"alive{r} AS MATERIALIZED "
            f"(SELECT node FROM deg{r}, kp WHERE d >= k)"
        )
        ctes.append(
            f"core{r} AS MATERIALIZED (SELECT e.u, e.v FROM core{p} e "
            f"JOIN alive{r} a ON e.u = a.node "
            f"JOIN alive{r} b ON e.v = b.node)"
        )
    rows = [
        "SELECT CAST(0 AS BIGINT) AS round,"
        " CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,"
        " CAST((SELECT count(*) FROM core0) AS BIGINT) AS n_edges"
    ]
    for r in range(1, KCORE_ROUNDS + 1):
        rows.append(
            f"SELECT CAST({r} AS BIGINT),"
            f" CAST((SELECT count(*) FROM alive{r}) AS BIGINT),"
            f" CAST((SELECT count(*) FROM core{r}) AS BIGINT)"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(rows)


def _kcore_bcast_nodes(spark: SparkSession, sf_dir: str) -> bool:
    """Size dispatch for the peel loop's survivor broadcasts: true when
    the node set fits the same cap label-prop's layout dispatch uses."""
    import os as _os

    from .extensions.dedup import memo_scalar
    from .registry_round3 import copurchase_deg_cut

    n = memo_scalar(
        spark,
        f"copurchase_n_nodes:{sf_dir}",
        lambda: copurchase_deg_cut(spark, sf_dir).count(),
    )
    return n <= int(
        _os.environ.get("SPARK_GRAFT_LPA_BROADCAST_MAX_NODES", 10**7)
    )


@register("q_kcore_decompose", _kcore_sql(), "graph", "iterative")
def q_kcore_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition of the part co-purchase graph by iterative
    degree peeling: with K = ceil({mult} × average degree), each round
    drops every node whose degree within the surviving subgraph is
    below K, and the query reports the survivor curve — (round,
    n_nodes, n_edges) for round 0 (full graph) through {rounds} peels.
    On a near-regular graph the cascade is supercritical (the core
    collapses within a few rounds); on a skewed graph it isolates the
    dense core — either way the curve is the density diagnostic used
    before running community/triangle analytics.

    Scale: each peel is one degree aggregation plus two semi-joins
    against the node survivor set — bounded shuffles keyed on node ids,
    the same per-round shape as BFS/label propagation; rounds are a
    fixed constant. Each round's edge table is lineage-cut at the
    narrowed iteration width (iter_shuffle_scope) so the unrolled plan
    never re-executes earlier rounds, and the K threshold stays a
    1-row broadcast table — no driver-side collect.
    """
    from .extensions.dedup import _cut_lineage
    from .registry_round3 import copurchase_deg_cut, copurchase_edges_cut
    from .session import iter_shuffle_scope

    edges = copurchase_edges_cut(spark, sf_dir)
    deg0 = copurchase_deg_cut(spark, sf_dir)
    k_tab = deg0.agg(
        F.ceil(
            F.lit(KCORE_MULT).cast("double") * F.sum("d") / F.count("*")
        )
        .cast("long")
        .alias("k")
    )

    summaries = [
        deg0.agg(F.count("*").alias("n_nodes"))
        .crossJoin(edges.agg(F.count("*").alias("n_edges")))
        .select(
            F.lit(0).cast("long").alias("round"),
            F.col("n_nodes").cast("long"),
            F.col("n_edges").cast("long"),
        )
    ]
    cur = edges
    for r in range(1, KCORE_ROUNDS + 1):
        deg_r = (
            cur.select(F.col("u").alias("node"))
            .unionAll(cur.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("d"))
        )
        alive = (
            deg_r.crossJoin(F.broadcast(k_tab))
            .where(F.col("d") >= F.col("k"))
            .select("node")
        )
        # Survivor set is node-sized; broadcast it into both semi-joins
        # (size-dispatched on the memoized node count — label-prop's
        # rule) so a peel round shuffles NOTHING edge-sized: the two
        # exchanges of the surviving edge table per round become
        # map-side hash probes. Interleaved A/B at sf0.1/local[32] is a
        # wash (2.14 s vs 2.11 s — fixture shuffles are too small to
        # matter); the change is kept for the shuffle-bytes ledger: two
        # edge-sized exchanges per round become zero whenever the node
        # set fits the cap, and past the cap the SMJ plan returns.
        au = alive.select(F.col("node").alias("u"))
        av = alive.select(F.col("node").alias("v"))
        if _kcore_bcast_nodes(spark, sf_dir):
            au, av = F.broadcast(au), F.broadcast(av)
        nxt = cur.join(au, "u", "semi").join(av, "v", "semi")
        with iter_shuffle_scope(spark):
            cur = _cut_lineage(nxt.select("u", "v"))
        summaries.append(
            alive.agg(F.count("*").alias("n_nodes"))
            .crossJoin(cur.agg(F.count("*").alias("n_edges")))
            .select(
                F.lit(r).cast("long").alias("round"),
                F.col("n_nodes").cast("long"),
                F.col("n_edges").cast("long"),
            )
        )
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionAll(s)
    return out


# ---------------------------------------------------------------------------
# Adamic-Adar link prediction
# ---------------------------------------------------------------------------

#: Query-node sample: nodes whose salted md5 is 0 mod AA_SAMPLE_MOD —
#: the deterministic "candidate generation for a query batch" shape;
#: wedge volume per query node is Σ_{w∈N(u)} d(w), bounded by the
#: 2-hop neighborhood, never all-pairs.
AA_SAMPLE_MOD = 50
AA_TOP = 20

_AA_NODE_HASH = md5_int32_sql("'aa:' || CAST(node AS VARCHAR)")


@register(
    "q_adamic_adar",
    "WITH "
    + _KCORE_EDGES_SQL.strip()
    + f""",
und AS (
  SELECT u AS src, v AS dst FROM edges
  UNION ALL SELECT v AS src, u AS dst FROM edges
),
qs AS (SELECT node AS u FROM deg WHERE {_AA_NODE_HASH} % {AA_SAMPLE_MOD} = 0),
cand AS (
  SELECT q.u, e2.dst AS v, e1.dst AS w
  FROM qs q
  JOIN und e1 ON e1.src = q.u
  JOIN und e2 ON e2.src = e1.dst
  WHERE e2.dst <> q.u
),
nonadj AS (
  SELECT c.u, c.v, c.w FROM cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM edges x
    WHERE x.u = least(c.u, c.v) AND x.v = greatest(c.u, c.v)
  )
),
scored AS (
  SELECT n.u, n.v,
         sum(1.0 / ln(d.d)) AS score,
         count(*) AS n_common
  FROM nonadj n JOIN deg d ON d.node = n.w
  GROUP BY n.u, n.v
)
SELECT u, v, CAST(score AS REAL) AS aa_score,
       CAST(n_common AS BIGINT) AS n_common
FROM scored
ORDER BY CAST(score AS REAL) DESC, u, v
LIMIT {AA_TOP}
""",
    "graph",
    "link-prediction",
)
def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction on the co-purchase graph for a
    deterministic hash-sampled query-node batch: candidate pairs (u, v)
    are non-adjacent nodes two hops apart, scored Σ_w 1/ln(deg w) over
    common neighbors w (Adamic & Adar 2003), top-{top} reported with a
    float32-collapsed score ordering and (u, v) tie-break so the cut is
    engine-stable.

    Scale: the query-batch shape is how link prediction actually runs
    in production (score candidates for a user/item batch, not
    all-pairs): wedge volume is |sample| × Σ d(w) over sampled
    neighborhoods — linear in the sample, never quadratic in the graph.
    The two hop joins are node-keyed bounded shuffles against the
    memoized edge table; the adjacency exclusion is one anti-join; the
    TakeOrdered top-k avoids a global sort.
    """
    from .registry_round3 import (
        copurchase_deg_cut,
        copurchase_edges_cut,
        copurchase_undirected_cut,
    )

    edges = copurchase_edges_cut(spark, sf_dir)
    deg = copurchase_deg_cut(spark, sf_dir)
    und = copurchase_undirected_cut(spark, sf_dir)

    qs = deg.where(
        md5_int32(F.concat(F.lit("aa:"), F.col("node").cast("string")))
        % AA_SAMPLE_MOD
        == 0
    ).select(F.col("node").alias("qu"))
    hop1 = qs.join(und, qs["qu"] == und["src"]).select(
        F.col("qu").alias("u"), F.col("dst").alias("w")
    )
    hop2 = hop1.join(und, hop1["w"] == und["src"]).select(
        "u", "w", F.col("dst").alias("v")
    ).where(F.col("v") != F.col("u"))
    nonadj = hop2.join(
        edges.select(
            F.col("u").alias("xu"), F.col("v").alias("xv")
        ),
        (F.least("u", "v") == F.col("xu"))
        & (F.greatest("u", "v") == F.col("xv")),
        "anti",
    )
    scored = (
        nonadj.join(deg.select(F.col("node").alias("w"), "d"), "w")
        .groupBy("u", "v")
        .agg(
            F.sum(1.0 / F.log("d")).alias("score"),
            F.count("*").alias("n_common"),
        )
    )
    return (
        scored.select(
            "u",
            "v",
            F.col("score").cast("float").alias("aa_score"),
            F.col("n_common").cast("long").alias("n_common"),
        )
        .orderBy(F.desc("aa_score"), F.asc("u"), F.asc("v"))
        .limit(AA_TOP)
    )


# ---------------------------------------------------------------------------
# CCNet-style boilerplate segment dedup
# ---------------------------------------------------------------------------

#: Segment width in words (non-overlapping) and the document-frequency
#: threshold above which a segment counts as boilerplate. CCNet dedups
#: at the line level; the synthetic corpus has no newlines, so fixed
#: 8-word segments are the equivalent unit.
BOIL_W = 8
BOIL_MIN_DOCS = 3

_BOIL_SEG_H = md5_int32_sql(
    f"'seg:' || array_to_string(wrds[(i-1)*{BOIL_W}+1 : i*{BOIL_W}], ' ')"
)


@register(
    "q_boilerplate_segments",
    f"""
WITH w AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS wrds
  FROM documents
),
iw AS (
  SELECT doc_id, lang, wrds,
         unnest(generate_series(1, len(wrds) // {BOIL_W})) AS i
  FROM w
),
segs AS (SELECT doc_id, lang, {_BOIL_SEG_H} AS h FROM iw),
seg_df AS (SELECT h, count(DISTINCT doc_id) AS df FROM segs GROUP BY h)
SELECT s.lang,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(count(DISTINCT s.h) AS BIGINT) AS n_distinct_segments,
       CAST(count(*) FILTER (WHERE d.df >= {BOIL_MIN_DOCS}) AS BIGINT)
           AS n_boilerplate,
       CAST(count(*) FILTER (WHERE d.df >= {BOIL_MIN_DOCS})
            / CAST(count(*) AS DOUBLE) AS REAL) AS boiler_frac
FROM segs s JOIN seg_df d ON s.h = d.h
GROUP BY s.lang
""",
    "llm",
    "dedup",
)
def q_boilerplate_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate detection (Wenzek et al. 2020 dedup at
    the line level, re-expressed as fixed {BOIL_W}-word segments for the
    newline-free synthetic corpus): every non-overlapping segment is
    hashed corpus-wide, a segment is boilerplate when it occurs in at
    least {BOIL_MIN_DOCS} distinct documents, and the per-language
    report gives segment counts and the boilerplate occurrence fraction
    — the statistic CCNet thresholds to strip headers/footers before
    language modeling.

    Scale: segments are generated inside the scan stage (one explode,
    no join); the document-frequency table is one hash-keyed partial
    agg, and the occurrence↔df lookup is an equi-join on the 32-bit
    segment hash — the same bounded-shuffle shape as the MinHash bucket
    join. Grouping on the hash (not the segment string) keeps shuffle
    rows narrow at corpus scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    segs = (
        docs.select("doc_id", "lang", words(F.col("text")).alias("ws"))
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    f"CASE WHEN size(ws) >= {BOIL_W} THEN "
                    f"transform(sequence(1, size(ws) DIV {BOIL_W}),"
                    f" i -> array_join(slice(ws, (i-1)*{BOIL_W}+1, {BOIL_W}),"
                    f" ' ')) ELSE CAST(array() AS ARRAY<STRING>) END"
                )
            ).alias("seg"),
        )
        .select(
            "doc_id",
            "lang",
            md5_int32(F.concat(F.lit("seg:"), F.col("seg"))).alias("h"),
        )
    )
    seg_df = segs.groupBy("h").agg(F.countDistinct("doc_id").alias("df"))
    boiler = F.sum(
        F.when(F.col("df") >= BOIL_MIN_DOCS, 1).otherwise(0)
    )
    return (
        segs.join(seg_df, "h")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_segments"),
            F.countDistinct("h").alias("n_distinct_segments"),
            boiler.cast("long").alias("n_boilerplate"),
            r6(
                boiler / F.count("*").cast("double"),
                "boiler_frac",
            ),
        )
        .select(
            "lang",
            F.col("n_segments").cast("long").alias("n_segments"),
            F.col("n_distinct_segments").cast("long").alias(
                "n_distinct_segments"
            ),
            "n_boilerplate",
            "boiler_frac",
        )
    )



# ---------------------------------------------------------------------------
# Autocorrelation function (ACF) of the bar-close series
# ---------------------------------------------------------------------------

ACF_LAGS = (1, 2, 3)


def _acf_sql_col(k: int) -> str:
    n = f"count(*) FILTER (WHERE g{k} IS NOT NULL)"
    sx = f"sum(c) FILTER (WHERE g{k} IS NOT NULL)"
    sy = f"sum(g{k})"
    sxx = f"sum(c*c) FILTER (WHERE g{k} IS NOT NULL)"
    syy = f"sum(g{k}*g{k})"
    sxy = f"sum(c*g{k})"
    num = f"({n}*{sxy} - {sx}*{sy})"
    den = f"sqrt(({n}*{sxx} - {sx}*{sx}) * ({n}*{syy} - {sy}*{sy}))"
    return (
        f"CAST(CASE WHEN {den} > 0 THEN {num}/{den} END AS REAL) AS acf_{k}"
    )


@register(
    "q_acf",
    BARS_CTE
    + """
, l AS (
  SELECT symbol, "close" AS c,
"""
    + ",\n".join(
        f'         lag("close", {k}) OVER w AS g{k}' for k in ACF_LAGS
    )
    + """
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY bar_start)
)
SELECT symbol, CAST(count(*) AS BIGINT) AS n_bars,
"""
    + ",\n".join("       " + _acf_sql_col(k) for k in ACF_LAGS)
    + "\nFROM l GROUP BY symbol",
    "quant",
    "timeseries",
)
def q_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the per-symbol minute-bar close
    series at lags {lags}: Pearson correlation between the series and
    its k-bar-lagged self over the aligned pairs, computed from one-pass
    moment sums (n, Σx, Σy, Σx², Σy², Σxy) identically on both engines
    and float32-collapsed at the output — the stationarity/memory
    diagnostic run before fitting any AR-family forecaster.

    Scale: one window pass partitioned by symbol to align the lags
    (bounded per-row state), then a single symbol-keyed partial agg —
    the moments fold map-side, so the shuffle carries one row of sums
    per symbol regardless of corpus size. Zero-variance series yield
    NULL rather than a division error.
    """
    bars = gold_bars_cut(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("bar_start")
    l = bars.select(
        "symbol",
        F.col("close").alias("c"),
        *[F.lag("close", k).over(w).alias(f"g{k}") for k in ACF_LAGS],
    )
    aggs = [F.count("*").cast("long").alias("n_bars")]
    for k in ACF_LAGS:
        ok = F.col(f"g{k}").isNotNull()
        g = F.col(f"g{k}")
        c = F.col("c")
        n = F.sum(F.when(ok, 1).otherwise(0)).cast("double")
        sx = F.sum(F.when(ok, c))
        sy = F.sum(g)
        sxx = F.sum(F.when(ok, c * c))
        syy = F.sum(g * g)
        sxy = F.sum(c * g)
        num = n * sxy - sx * sy
        den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        aggs.append(r6(F.when(den > 0, num / den), f"acf_{k}"))
    return l.groupBy("symbol").agg(*aggs)


# ---------------------------------------------------------------------------
# Chi-square independence test (event_type × day-of-week)
# ---------------------------------------------------------------------------


@register(
    "q_chi_square",
    """
WITH ev AS (
  SELECT event_type, date_part('dow', ts) AS dow
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
),
cells AS (SELECT event_type, dow, count(*) AS o FROM ev
          GROUP BY event_type, dow),
rowt AS (SELECT event_type, sum(o) AS rt FROM cells GROUP BY event_type),
colt AS (SELECT dow, sum(o) AS ct FROM cells GROUP BY dow),
tot AS (SELECT sum(o) AS n FROM cells),
terms AS (
  SELECT c.o, r.rt * col.ct / CAST(t.n AS DOUBLE) AS e
  FROM cells c
  JOIN rowt r ON c.event_type = r.event_type
  JOIN colt col ON c.dow = col.dow
  CROSS JOIN tot t
)
SELECT CAST(t.n AS BIGINT) AS n,
       CAST((SELECT count(*) FROM rowt) AS BIGINT) AS n_types,
       CAST((SELECT count(*) FROM colt) AS BIGINT) AS n_dows,
       CAST(((SELECT count(*) FROM rowt) - 1)
            * ((SELECT count(*) FROM colt) - 1) AS BIGINT) AS dof,
       CAST((SELECT sum((o - e) * (o - e) / e) FROM terms) AS REAL)
           AS chi2,
       CAST(sqrt((SELECT sum((o - e) * (o - e) / e) FROM terms)
                 / (t.n * least((SELECT count(*) FROM rowt) - 1,
                                (SELECT count(*) FROM colt) - 1)))
            AS REAL) AS cramers_v
FROM tot t
""",
    "stats",
    "test",
)
def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test between event type and
    day-of-week of the event timestamp: observed contingency counts vs
    the marginal-product expectation, χ² = Σ (O−E)²/E with degrees of
    freedom (r−1)(c−1) and Cramér's V effect size — the categorical
    drift/association check a feature pipeline runs before trusting a
    type×time interaction feature. Counts and dof are integer-exact;
    χ²/V are float32-collapsed.

    Scale: one scan + a (type, dow) partial agg whose key space is
    |types|×7; both marginal tables and the 1-row total are broadcast
    back onto the cells — no shuffle larger than the cell table, which
    is corpus-size-independent.
    """
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    )
    cells = ev.groupBy(
        "event_type", (F.dayofweek("ts") - 1).alias("dow")
    ).agg(F.count("*").alias("o"))
    rowt = cells.groupBy("event_type").agg(F.sum("o").alias("rt"))
    colt = cells.groupBy("dow").agg(F.sum("o").alias("ct"))
    tot = cells.agg(F.sum("o").alias("n"))
    nr = rowt.agg(F.count("*").alias("n_types"))
    nc = colt.agg(F.count("*").alias("n_dows"))
    terms = (
        cells.join(F.broadcast(rowt), "event_type")
        .join(F.broadcast(colt), "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            (
                (F.col("o") - F.col("rt") * F.col("ct") / F.col("n").cast("double"))
                ** 2
                / (F.col("rt") * F.col("ct") / F.col("n").cast("double"))
            ).alias("term")
        )
        .agg(F.sum("term").alias("chi2"))
    )
    return (
        tot.crossJoin(F.broadcast(nr))
        .crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(terms))
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("n_types").cast("long").alias("n_types"),
            F.col("n_dows").cast("long").alias("n_dows"),
            ((F.col("n_types") - 1) * (F.col("n_dows") - 1))
            .cast("long")
            .alias("dof"),
            r6(F.col("chi2"), "chi2"),
            r6(
                F.sqrt(
                    F.col("chi2")
                    / (
                        F.col("n")
                        * F.least(F.col("n_types") - 1, F.col("n_dows") - 1)
                    )
                ),
                "cramers_v",
            ),
        )
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U rank-sum test
# ---------------------------------------------------------------------------

MW_A = "1-URGENT"
MW_B = "5-LOW"
MW_PARTS = 8  # range partitions for the distributed rank prefix sum


@register(
    "q_mann_whitney",
    f"""
WITH sub AS (
  SELECT o_totalprice AS v,
         CASE WHEN o_orderpriority = '{MW_A}' THEN 1 ELSE 0 END AS is_a
  FROM orders WHERE o_orderpriority IN ('{MW_A}', '{MW_B}')
),
vals AS (SELECT v, sum(is_a) AS cnt_a, count(*) AS cnt FROM sub GROUP BY v),
rk AS (
  SELECT cnt_a, cnt,
         sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - cnt
             AS cum_before
  FROM vals
),
agg AS (
  SELECT sum(cnt_a) AS n_a, sum(cnt) AS n,
         sum(cnt_a * (2*cum_before + cnt + 1)) AS r2,
         sum(cnt*cnt*cnt - cnt) AS ties
  FROM rk
)
SELECT CAST(n_a AS BIGINT) AS n_a,
       CAST(n - n_a AS BIGINT) AS n_b,
       CAST(r2 - n_a*(n_a+1) AS BIGINT) AS u2_exact,
       CAST(CASE WHEN abs(
           ((r2 - n_a*(n_a+1)) / 2.0 - n_a*(n - n_a) / 2.0)
           / sqrt(n_a*(n - n_a) / 12.0
                  * ((n + 1) - ties / (CAST(n AS DOUBLE) * (n - 1))))
         ) < 1e-6 THEN 0 ELSE
           ((r2 - n_a*(n_a+1)) / 2.0 - n_a*(n - n_a) / 2.0)
           / sqrt(n_a*(n - n_a) / 12.0
                  * ((n + 1) - ties / (CAST(n AS DOUBLE) * (n - 1))))
         END AS REAL) AS z
FROM agg
""",
    "stats",
    "test",
)
def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test comparing order total price between
    the '{a}' and '{b}' priority groups: tie-averaged ranks over the
    combined sample, U from the group-A rank sum, and the tie-corrected
    normal-approximation z statistic. 2·U is reported as an integer-exact
    BIGINT (tie-averaged ranks are half-integers, so doubling restores
    exactness); z is float32-collapsed with a zero snap.

    Scale: ranks come from per-VALUE counts (one keyed agg), and the
    cumulative count over the value order is the same DISTRIBUTED PREFIX
    SUM as q_pack_sequences — range-partition by value, intra-partition
    cumsum, {parts}-row offset table broadcast back — so no global
    single-partition sort touches the data. Overflow bound: r2 and
    n_a(n_a+1) stay in int64 up to ~3e9 rows per side, after which the
    statistic should move to decimal accumulation.
    """
    orders = load_table(spark, sf_dir, "orders")
    sub = orders.where(F.col("o_orderpriority").isin(MW_A, MW_B)).select(
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderpriority") == MW_A, 1).otherwise(0).alias("is_a"),
    )
    from .extensions.dedup import _cut_lineage

    # Lineage cut is CORRECTNESS here, not a perf memo: vals descends
    # from a shuffle whose output order is nondeterministic, so each
    # re-execution of repartitionByRange may sample different range
    # boundaries — the window pass and the totals pass would then see
    # INCONSISTENT pid assignments. Materializing once pins one
    # boundary set for every consumer. (q_pack_sequences doesn't need
    # this only because its input is a deterministic file scan.)
    vals = _cut_lineage(
        sub.groupBy("v")
        .agg(F.sum("is_a").alias("cnt_a"), F.count("*").alias("cnt"))
        .repartitionByRange(MW_PARTS, "v")
        .withColumn("pid", F.spark_partition_id())
    )
    wp = Window.partitionBy("pid").orderBy("v")
    local = vals.withColumn("local_end", F.sum("cnt").over(wp))
    totals = vals.groupBy("pid").agg(F.sum("cnt").alias("ptot"))
    wo = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "pid", F.coalesce(F.sum("ptot").over(wo), F.lit(0)).alias("poff")
    )
    rk = local.join(F.broadcast(offsets), "pid").select(
        "cnt_a",
        "cnt",
        (F.col("poff") + F.col("local_end") - F.col("cnt")).alias("cum_before"),
    )
    agg = rk.agg(
        F.sum("cnt_a").alias("n_a"),
        F.sum("cnt").alias("n"),
        F.sum(
            F.col("cnt_a") * (2 * F.col("cum_before") + F.col("cnt") + 1)
        ).alias("r2"),
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).alias("ties"),
    )
    u = (F.col("r2") - F.col("n_a") * (F.col("n_a") + 1)) / 2.0
    n_b = F.col("n") - F.col("n_a")
    mu = F.col("n_a") * n_b / 2.0
    var = (
        F.col("n_a")
        * n_b
        / 12.0
        * (
            (F.col("n") + 1)
            - F.col("ties") / (F.col("n").cast("double") * (F.col("n") - 1))
        )
    )
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        n_b.cast("long").alias("n_b"),
        (F.col("r2") - F.col("n_a") * (F.col("n_a") + 1))
        .cast("long")
        .alias("u2_exact"),
        r6z((u - mu) / F.sqrt(var), "z"),
    )

# ---------------------------------------------------------------------------
# Skip-gram training-pair generation
# ---------------------------------------------------------------------------

#: Context window (positions ahead of the center word) and the reported
#: top-K. Forward-only ordered pairs: the symmetric set is the same
#: multiset with roles swapped, so forward counting loses nothing.
SG_WIN = 2
SG_TOP = 30


@register(
    "q_skipgram_pairs",
    f"""
WITH w AS (
  SELECT string_split_regex(trim(text), '\\s+') AS wrds FROM documents
),
iw AS (
  SELECT wrds, unnest(generate_series(1, len(wrds) - 1)) AS i FROM w
),
pairs AS (
  SELECT wrds[i] AS center, wrds[i + o] AS context
  FROM (
    SELECT wrds, i,
           unnest(generate_series(1, least({SG_WIN}, len(wrds) - i))) AS o
    FROM iw
  )
)
SELECT center, context, CAST(count(*) AS BIGINT) AS n
FROM pairs
GROUP BY center, context
ORDER BY n DESC, center, context
LIMIT {SG_TOP}
""",
    "llm",
    "embedding-training",
)
def q_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram (center, context) training-pair counting with a
    ±{win}-position window (forward-only ordered pairs — the exact
    multiset word2vec's sampler draws from, Mikolov et al. 2013):
    corpus-wide pair frequencies, top-{top} with deterministic
    (center, context) tie-breaks. Integer-exact. Complements
    q_pmi_collocations (adjacent-bigram PMI): this is the *training
    data generator*, not the association score.

    Scale: pair generation is a nested array transform inside the scan
    stage — no join, no intermediate materialization; the only shuffle
    is the pair-keyed partial agg (map-side combine collapses repeats),
    then a TakeOrdered top-k. Pair-key cardinality is bounded by
    vocab², in practice by observed co-occurrences.
    """
    docs = load_table(spark, sf_dir, "documents")
    # The size>=2 pre-filter (not a NULL-context post-filter) keeps every
    # element_at in bounds — NULL-on-miss is not portable under ANSI mode.
    pairs = (
        docs.select(words(F.col("text")).alias("ws"))
        .where(F.size("ws") >= 2)
        .select(
            F.explode(
                F.expr(
                    f"""
                    flatten(transform(
                      sequence(1, size(ws) - 1),
                      i -> transform(
                        sequence(1, least({SG_WIN}, size(ws) - i)),
                        o -> struct(element_at(ws, i) AS center,
                                    element_at(ws, i + o) AS context))))
                    """
                )
            ).alias("p")
        )
    )
    return (
        pairs.groupBy(
            F.col("p.center").alias("center"),
            F.col("p.context").alias("context"),
        )
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("center"), F.asc("context"))
        .limit(SG_TOP)
    )


# ---------------------------------------------------------------------------
# Stochastic oscillator (%K / %D)
# ---------------------------------------------------------------------------

STO_W = 14   # lookback bars for the %K range
STO_D = 3    # SMA width for the %D signal


@register(
    "q_stochastic_osc",
    BARS_CTE
    + f"""
, k AS (
  SELECT symbol, bar_start,
         CASE WHEN max(high) OVER wr <> min(low) OVER wr THEN
           100.0 * ("close" - min(low) OVER wr)
                 / (max(high) OVER wr - min(low) OVER wr)
         END AS pct_k
  FROM bars
  WINDOW wr AS (PARTITION BY symbol ORDER BY bar_start
                ROWS BETWEEN {STO_W - 1} PRECEDING AND CURRENT ROW)
)
SELECT symbol, bar_start,
       CAST(pct_k AS REAL) AS pct_k,
       CAST(avg(pct_k) OVER wd AS REAL) AS pct_d
FROM k
WINDOW wd AS (PARTITION BY symbol ORDER BY bar_start
              ROWS BETWEEN {STO_D - 1} PRECEDING AND CURRENT ROW)
""",
    "quant",
    "indicator",
)
def q_stochastic_osc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic oscillator over the gold minute bars: %K = 100 ×
    (close − min low) / (max high − min low) over the trailing {w}-bar
    range, %D = {d}-bar simple moving average of %K (Lane's fast
    stochastic). Flat ranges yield NULL rather than a division error;
    outputs are float32-collapsed.

    Scale: two window passes partitioned by symbol with bounded ROWS
    frames — per-task state is O({w}); the only exchange is the
    symbol-range partitioning the bars table already carries, shared
    with every other indicator in the family via the gold-bars memo.
    """
    bars = gold_bars_cut(spark, sf_dir)
    wr = (
        Window.partitionBy("symbol")
        .orderBy("bar_start")
        .rowsBetween(-(STO_W - 1), 0)
    )
    hi = F.max("high").over(wr)
    lo = F.min("low").over(wr)
    k = bars.select(
        "symbol",
        "bar_start",
        F.when(hi != lo, 100.0 * (F.col("close") - lo) / (hi - lo)).alias(
            "pct_k"
        ),
    )
    wd = (
        Window.partitionBy("symbol")
        .orderBy("bar_start")
        .rowsBetween(-(STO_D - 1), 0)
    )
    return k.select(
        "symbol",
        "bar_start",
        r6(F.col("pct_k"), "pct_k"),
        r6(F.avg("pct_k").over(wd), "pct_d"),
    )

# ---------------------------------------------------------------------------
# On-balance volume (OBV)
# ---------------------------------------------------------------------------


@register(
    "q_obv",
    BARS_CTE
    + """
, s AS (
  SELECT symbol, bar_start, volume,
         CASE WHEN "close" > lag("close") OVER w THEN volume
              WHEN "close" < lag("close") OVER w THEN -volume
              ELSE 0.0 END AS signed_vol
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY bar_start)
)
SELECT symbol, bar_start,
       CAST(sum(signed_vol) OVER wc AS REAL) AS obv
FROM s
WINDOW wc AS (PARTITION BY symbol ORDER BY bar_start
              ROWS UNBOUNDED PRECEDING)
""",
    "quant",
    "indicator",
)
def q_obv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-balance volume over the gold minute bars (Granville): each
    bar's volume is added when the close rose vs the previous bar,
    subtracted when it fell, ignored when flat or first — OBV is the
    running total, the classic volume-flow confirmation indicator.
    The first bar contributes 0 (lag is NULL, neither branch matches),
    identically on both engines.

    Scale: two ordered window passes per symbol (one lag, one prefix
    sum) — sequential per-partition state, no extra shuffle beyond the
    symbol-range exchange the bars table carries.
    """
    bars = gold_bars_cut(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("bar_start")
    prev = F.lag("close").over(w)
    s = bars.select(
        "symbol",
        "bar_start",
        F.when(F.col("close") > prev, F.col("volume"))
        .when(F.col("close") < prev, -F.col("volume"))
        .otherwise(F.lit(0.0))
        .alias("signed_vol"),
    )
    wc = (
        Window.partitionBy("symbol")
        .orderBy("bar_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return s.select(
        "symbol",
        "bar_start",
        r6(F.sum("signed_vol").over(wc), "obv"),
    )


# ---------------------------------------------------------------------------
# Hurst exponent (rescaled-range analysis)
# ---------------------------------------------------------------------------

#: Chunk sizes for the R/S regression. Three octave-spaced points give a
#: stable OLS slope while every fixture scale still has >=1 complete
#: chunk at the largest size.
HURST_SIZES = (8, 32, 128)


def _hurst_sql() -> str:
    import math

    size_ctes = []
    for s in HURST_SIZES:
        size_ctes.append(
            f"""
c{s} AS (
  SELECT symbol,
         CAST((row_number() OVER (PARTITION BY symbol ORDER BY bar_start)
               - 1) // {s} AS BIGINT) AS chunk,
         row_number() OVER (PARTITION BY symbol ORDER BY bar_start) - 1
             AS rn,
         "close" AS x,
         bar_start
  FROM bars
),
z{s} AS (
  SELECT symbol, chunk, x,
         sum(x) OVER (PARTITION BY symbol, chunk ORDER BY bar_start
                      ROWS UNBOUNDED PRECEDING)
         - (rn % {s} + 1)
           * (avg(x) OVER (PARTITION BY symbol, chunk)) AS z
  FROM c{s}
),
rs{s} AS (
  SELECT symbol,
         avg(rng / sd) AS rs
  FROM (
    SELECT symbol, chunk,
           max(z) - min(z) AS rng,
           sqrt(greatest(avg(x * x) - avg(x) * avg(x), 0)) AS sd,
           count(*) AS n
    FROM z{s} GROUP BY symbol, chunk
  ) WHERE n = {s} AND sd > 0
  GROUP BY symbol
)"""
        )
    lx = [math.log(s) for s in HURST_SIZES]
    n = len(HURST_SIZES)
    sx = sum(lx)
    sxx = sum(v * v for v in lx)
    ly = " + ".join(f"ln(rs{s}.rs)" for s in HURST_SIZES)
    sxy = " + ".join(
        f"{math.log(s)!r} * ln(rs{s}.rs)" for s in HURST_SIZES
    )
    joins = f"rs{HURST_SIZES[0]}"
    for s in HURST_SIZES[1:]:
        joins += f" JOIN rs{s} USING (symbol)"
    sel_rs = ",\n       ".join(
        f"CAST(rs{s}.rs AS REAL) AS rs_{s}" for s in HURST_SIZES
    )
    # Returned as a continuation of BARS_CTE's WITH-list (leading comma).
    return (
        ","
        + ",".join(size_ctes)
        + f"""
SELECT symbol,
       {sel_rs},
       CAST(({n} * ({sxy}) - {sx!r} * ({ly}))
            / ({n} * {sxx!r} - {sx * sx!r}) AS REAL) AS hurst
FROM {joins}
"""
    )


@register("q_hurst", BARS_CTE + _hurst_sql(), "quant", "timeseries")
def q_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of the per-symbol bar-close series by classical
    rescaled-range analysis (Hurst 1951; Mandelbrot & Wallis 1969): the
    series is cut into complete chunks of {sizes} bars; per chunk,
    R = range of the cumulative mean-deviation profile and S = the
    population std; H is the OLS slope of ln(mean R/S) against
    ln(chunk size). H≈0.5 is memoryless, >0.5 persistent, <0.5
    mean-reverting — the long-memory companion to q_acf's short-lag
    view. Per-size mean R/S values are reported beside the exponent.

    Scale: per size, one ordered window pass (the cumulative profile)
    plus one (symbol, chunk)-keyed agg — chunk keys are corpus-linear
    but the per-chunk state is O(1); the three per-size tables then
    join on the symbol key (symbol-count-sized). The OLS slope is a
    closed form over {n} points with constant abscissae — no iteration.
    """
    bars = gold_bars_cut(spark, sf_dir)
    import math

    per_size = []
    for s in HURST_SIZES:
        w = Window.partitionBy("symbol").orderBy("bar_start")
        c = bars.select(
            "symbol",
            "bar_start",
            F.col("close").alias("x"),
            (F.row_number().over(w) - 1).alias("rn"),
        ).select(
            "symbol",
            "bar_start",
            "x",
            "rn",
            F.expr(f"rn DIV {s}").cast("long").alias("chunk"),
        )
        wz = (
            Window.partitionBy("symbol", "chunk")
            .orderBy("bar_start")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wc = Window.partitionBy("symbol", "chunk")
        z = c.select(
            "symbol",
            "chunk",
            "x",
            (
                F.sum("x").over(wz)
                - (F.col("rn") % s + 1) * F.avg("x").over(wc)
            ).alias("z"),
        )
        per_chunk = z.groupBy("symbol", "chunk").agg(
            (F.max("z") - F.min("z")).alias("rng"),
            F.sqrt(
                F.greatest(
                    F.avg(F.col("x") * F.col("x"))
                    - F.avg("x") * F.avg("x"),
                    F.lit(0.0),
                )
            ).alias("sd"),
            F.count("*").alias("n"),
        )
        rs = (
            per_chunk.where((F.col("n") == s) & (F.col("sd") > 0))
            .groupBy("symbol")
            .agg(F.avg(F.col("rng") / F.col("sd")).alias(f"rs_{s}d"))
        )
        per_size.append(rs)
    joined = per_size[0]
    for rs in per_size[1:]:
        joined = joined.join(rs, "symbol")
    lx = [math.log(s) for s in HURST_SIZES]
    n = len(HURST_SIZES)
    sx = sum(lx)
    sxx = sum(v * v for v in lx)
    ly = None
    sxy = None
    for s, l in zip(HURST_SIZES, lx):
        t = F.log(F.col(f"rs_{s}d"))
        ly = t if ly is None else ly + t
        tx = l * F.log(F.col(f"rs_{s}d"))
        sxy = tx if sxy is None else sxy + tx
    slope = (n * sxy - sx * ly) / (n * sxx - sx * sx)
    return joined.select(
        "symbol",
        *[r6(F.col(f"rs_{s}d"), f"rs_{s}") for s in HURST_SIZES],
        r6(slope, "hurst"),
    )

# ---------------------------------------------------------------------------
# Degree-distribution power-law tail (Hill MLE)
# ---------------------------------------------------------------------------

#: Tail threshold for the Hill estimator: degrees >= DMIN are treated as
#: the power-law tail. Fixed (not data-derived) so the estimate is a
#: stable diagnostic across scale factors.
PL_DMIN = 5


@register(
    "q_degree_powerlaw",
    "WITH "
    + _KCORE_EDGES_SQL.strip()
    + f"""
SELECT CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(count(*) FILTER (WHERE d >= {PL_DMIN}) AS BIGINT) AS n_tail,
       CAST(max(d) AS BIGINT) AS d_max,
       CAST(avg(d) AS REAL) AS mean_degree,
       CAST(1.0 + count(*) FILTER (WHERE d >= {PL_DMIN})
            / sum(CASE WHEN d >= {PL_DMIN}
                       THEN ln(d / CAST({PL_DMIN} AS DOUBLE)) END)
            AS REAL) AS alpha_hill
FROM deg
""",
    "graph",
    "diagnostic",
)
def q_degree_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law tail diagnostic of the co-purchase degree distribution:
    the Hill maximum-likelihood exponent α = 1 + n_tail / Σ ln(d/dmin)
    over nodes with degree ≥ {dmin} (Clauset, Shalizi & Newman 2009,
    eq. 3.1 in its discrete-approximation form), beside the node count,
    tail size, max and mean degree. α ≈ 2–3 signals a scale-free hub
    structure (salting/skew handling needed downstream); a near-regular
    graph pushes α high — the skew early-warning the join planner wants
    before choosing a strategy for graph workloads.

    Scale: one aggregation over the memoized degree table — the
    ln-fold happens map-side; output is a single row. No extra shuffle
    beyond the degree build shared by the graph family.
    """
    from .registry_round3 import copurchase_deg_cut

    deg = copurchase_deg_cut(spark, sf_dir)
    tail = F.col("d") >= PL_DMIN
    return deg.agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.sum(tail.cast("long")).alias("n_tail"),
        F.max("d").cast("long").alias("d_max"),
        r6(F.avg("d"), "mean_degree"),
        r6(
            1.0
            + F.sum(tail.cast("long"))
            / F.sum(
                F.when(tail, F.log(F.col("d") / float(PL_DMIN)))
            ),
            "alpha_hill",
        ),
    )


# ---------------------------------------------------------------------------
# SAX symbolization + motif counting
# ---------------------------------------------------------------------------

SAX_SEG = 8    # bars per PAA segment
SAX_WORD = 4   # segments per SAX word (a word spans 32 bars)
#: N(0,1) quartile breakpoints for a 4-letter alphabet (a<b<c<d).
SAX_BREAKS = (-0.6745, 0.0, 0.6745)


@register(
    "q_sax_motifs",
    BARS_CTE
    + f"""
, st AS (
  SELECT symbol, avg("close") AS mu,
         sqrt(greatest(avg("close" * "close") - avg("close") * avg("close"),
                       0)) AS sd,
         count(*) AS n
  FROM bars GROUP BY symbol
),
seg AS (
  SELECT symbol, seg_id, avg(c) AS m, count(*) AS seg_n
  FROM (
    SELECT symbol, "close" AS c,
           CAST((row_number() OVER (PARTITION BY symbol ORDER BY bar_start)
                 - 1) // {SAX_SEG} AS BIGINT) AS seg_id
    FROM bars
  ) GROUP BY symbol, seg_id
),
lett AS (
  SELECT s.symbol, s.seg_id,
         CASE
           WHEN CAST((s.m - t.mu) / t.sd AS REAL) < {SAX_BREAKS[0]} THEN 'a'
           WHEN CAST((s.m - t.mu) / t.sd AS REAL) < {SAX_BREAKS[1]} THEN 'b'
           WHEN CAST((s.m - t.mu) / t.sd AS REAL) < {SAX_BREAKS[2]} THEN 'c'
           ELSE 'd'
         END AS letter
  FROM seg s JOIN st t USING (symbol)
  WHERE s.seg_n = {SAX_SEG} AND t.sd > 0
),
wrd AS (
  SELECT symbol, seg_id // {SAX_WORD} AS word_id,
         string_agg(letter, '' ORDER BY seg_id) AS word,
         count(*) AS wn
  FROM lett GROUP BY symbol, seg_id // {SAX_WORD}
),
cw AS (
  SELECT symbol, word, count(*) AS n
  FROM wrd WHERE wn = {SAX_WORD}
  GROUP BY symbol, word
)
SELECT symbol,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_distinct_motifs AS BIGINT) AS n_distinct_motifs,
       word AS top_motif,
       CAST(n AS BIGINT) AS top_count
FROM (
  SELECT symbol, word, n,
         row_number() OVER (PARTITION BY symbol
                            ORDER BY n DESC, word DESC) AS rk,
         sum(n) OVER (PARTITION BY symbol) AS n_words,
         count(*) OVER (PARTITION BY symbol) AS n_distinct_motifs
  FROM cw
) WHERE rk = 1
""",
    "quant",
    "timeseries",
)
def q_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization of the per-symbol close series (Lin, Keogh et
    al. 2003): {seg}-bar PAA segment means, z-scored against the
    symbol's global mean/std and mapped to a 4-letter alphabet by the
    N(0,1) quartile breakpoints, concatenated into {word}-letter words —
    then motif counting: words per symbol, distinct motifs, and the most
    frequent motif (count-desc, max-word tie-break — identical struct
    comparison on both engines). The z-value is
    float32-collapsed BEFORE bucketing so the letter boundaries are
    engine-stable. Trailing partial segments/words are dropped.

    Scale: one window pass to index segments, a (symbol, segment) agg,
    a broadcast join of per-symbol moments, a (symbol, word) agg — all
    keyed shuffles bounded by series length / segment width; per-task
    state is O(1). This is the standard pre-index step for time-series
    motif/discord mining at scale.
    """
    bars = gold_bars_cut(spark, sf_dir)
    st = bars.groupBy("symbol").agg(
        F.avg("close").alias("mu"),
        F.sqrt(
            F.greatest(
                F.avg(F.col("close") * F.col("close"))
                - F.avg("close") * F.avg("close"),
                F.lit(0.0),
            )
        ).alias("sd"),
    )
    w = Window.partitionBy("symbol").orderBy("bar_start")
    seg = (
        bars.select(
            "symbol",
            "close",
            F.expr(f"(row_number() OVER (PARTITION BY symbol ORDER BY bar_start) - 1) DIV {SAX_SEG}")
            .cast("long")
            .alias("seg_id"),
        )
        .groupBy("symbol", "seg_id")
        .agg(F.avg("close").alias("m"), F.count("*").alias("seg_n"))
    )
    z = (F.col("m") - F.col("mu")) / F.col("sd")
    zf = z.cast("float")
    letter = (
        F.when(zf < SAX_BREAKS[0], F.lit("a"))
        .when(zf < SAX_BREAKS[1], F.lit("b"))
        .when(zf < SAX_BREAKS[2], F.lit("c"))
        .otherwise(F.lit("d"))
    )
    lett = (
        seg.join(F.broadcast(st), "symbol")
        .where((F.col("seg_n") == SAX_SEG) & (F.col("sd") > 0))
        .select("symbol", "seg_id", letter.alias("letter"))
    )
    wrd = (
        lett.groupBy(
            "symbol",
            F.expr(f"seg_id DIV {SAX_WORD}").alias("word_id"),
        )
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("seg_id", "letter"))
                    ),
                    lambda s: s.getField("letter"),
                ),
            ).alias("word"),
            F.count("*").alias("wn"),
        )
    )
    cw = (
        wrd.where(F.col("wn") == SAX_WORD)
        .groupBy("symbol", "word")
        .agg(F.count("*").alias("n"))
    )
    top = F.max_by(F.col("word"), F.struct(F.col("n"), F.col("word")))
    return cw.groupBy("symbol").agg(
        F.sum("n").cast("long").alias("n_words"),
        F.count("*").cast("long").alias("n_distinct_motifs"),
        top.alias("top_motif"),
        F.max("n").cast("long").alias("top_count"),
    )


# ---------------------------------------------------------------------------
# Snapshot diff (table-version reconciliation)
# ---------------------------------------------------------------------------

#: Deterministic synthetic snapshots of the orders table: A drops keys
#: where md5(key:'snapA') % 20 == 0, B drops md5(key:'snapB') % 20 == 0,
#: and B adds an exact 1000.00 to o_totalprice where md5(key:'bump') % 7 == 0 — so
#: added / removed / changed / unchanged classes all exist at any scale.
SNAP_DROP_MOD = 20
SNAP_BUMP_MOD = 7

_SNAP_KA = md5_int32_sql("CAST(o_orderkey AS VARCHAR) || ':snapA'")
_SNAP_KB = md5_int32_sql("CAST(o_orderkey AS VARCHAR) || ':snapB'")
_SNAP_BU = md5_int32_sql("CAST(o_orderkey AS VARCHAR) || ':bump'")


@register(
    "q_snapshot_diff",
    f"""
WITH a AS (
  SELECT o_orderkey AS k, o_totalprice AS price
  FROM orders WHERE {_SNAP_KA} % {SNAP_DROP_MOD} <> 0
),
b AS (
  SELECT o_orderkey AS k,
         CASE WHEN {_SNAP_BU} % {SNAP_BUMP_MOD} = 0
              THEN o_totalprice + 1000.0
              ELSE o_totalprice END AS price
  FROM orders WHERE {_SNAP_KB} % {SNAP_DROP_MOD} <> 0
),
j AS (
  SELECT coalesce(a.k, b.k) AS k, a.price AS pa, b.price AS pb
  FROM a FULL OUTER JOIN b ON a.k = b.k
)
SELECT
  CAST(count(*) FILTER (WHERE pa IS NULL) AS BIGINT) AS n_added,
  CAST(count(*) FILTER (WHERE pb IS NULL) AS BIGINT) AS n_removed,
  CAST(count(*) FILTER (WHERE pa IS NOT NULL AND pb IS NOT NULL
                        AND pa <> pb) AS BIGINT) AS n_changed,
  CAST(count(*) FILTER (WHERE pa = pb) AS BIGINT) AS n_unchanged,
  CAST(sum(CASE WHEN pa IS NOT NULL AND pb IS NOT NULL AND pa <> pb
                THEN pb - pa END) AS REAL) AS changed_price_delta
FROM j
""",
    "warehouse",
    "reconciliation",
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation between two deterministic versions of the
    orders table (hash-dropped keys on each side + an exact
    hash-selected +1000.00 price bump on B): a full outer join on the key classifies every row
    as added / removed / changed / unchanged and totals the changed
    price delta — the table-diff audit a lakehouse runs between
    ingestion versions before publishing (the summary companion to
    q_cdc_apply / q_merge_upsert, which *produce* new versions).

    Scale: one key-keyed full outer join (sort-merge on the shuffle
    key) + a single rollup — no skew risk on a unique key; counts are
    integer-exact, the delta float32-collapsed; the additive bump is
    exact in binary doubles, so the changed-row predicate cannot be
    perturbed by engine rounding conventions.
    """
    orders = load_table(spark, sf_dir, "orders")
    ka = md5_int32(
        F.concat(F.col("o_orderkey").cast("string"), F.lit(":snapA"))
    )
    kb = md5_int32(
        F.concat(F.col("o_orderkey").cast("string"), F.lit(":snapB"))
    )
    bu = md5_int32(
        F.concat(F.col("o_orderkey").cast("string"), F.lit(":bump"))
    )
    a = orders.where(ka % SNAP_DROP_MOD != 0).select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("pa")
    )
    b = orders.where(kb % SNAP_DROP_MOD != 0).select(
        F.col("o_orderkey").alias("k"),
        F.when(
            bu % SNAP_BUMP_MOD == 0,
            F.col("o_totalprice") + 1000.0,
        )
        .otherwise(F.col("o_totalprice"))
        .alias("pb"),
    )
    j = a.join(b, "k", "full_outer")
    changed = F.col("pa").isNotNull() & F.col("pb").isNotNull() & (
        F.col("pa") != F.col("pb")
    )
    return j.agg(
        F.sum(F.col("pa").isNull().cast("long")).alias("n_added"),
        F.sum(F.col("pb").isNull().cast("long")).alias("n_removed"),
        F.sum(changed.cast("long")).alias("n_changed"),
        F.sum((F.col("pa") == F.col("pb")).cast("long")).alias(
            "n_unchanged"
        ),
        r6(
            F.sum(F.when(changed, F.col("pb") - F.col("pa"))),
            "changed_price_delta",
        ),
    )

# ---------------------------------------------------------------------------
# Cross-symbol lead-lag correlation
# ---------------------------------------------------------------------------

XC_A = "purchase"
XC_B = "view"
XC_LAGS = (-2, -1, 0, 1, 2)


def _xc_sql_col(k: int) -> str:
    col = f"b_{'m' if k < 0 else 'p'}{abs(k)}"
    n = f"count(*) FILTER (WHERE {col} IS NOT NULL)"
    sx = f"sum(a) FILTER (WHERE {col} IS NOT NULL)"
    sy = f"sum({col})"
    sxx = f"sum(a*a) FILTER (WHERE {col} IS NOT NULL)"
    syy = f"sum({col}*{col})"
    sxy = f"sum(a*{col})"
    num = f"({n}*{sxy} - {sx}*{sy})"
    den = f"sqrt(({n}*{sxx} - {sx}*{sx}) * ({n}*{syy} - {sy}*{sy}))"
    a = f"xcorr_{'m' if k < 0 else 'p'}{abs(k)}"
    return f"CAST(CASE WHEN {den} > 0 THEN {num}/{den} END AS REAL) AS {a}"


@register(
    "q_lead_lag_xcorr",
    BARS_CTE
    + f"""
, hc AS (
  SELECT symbol, date_trunc('hour', event_time) AS hb,
         arg_max(price, event_time) AS hclose
  FROM trades WHERE symbol IN ('{XC_A}', '{XC_B}')
  GROUP BY symbol, date_trunc('hour', event_time)
),
ra AS (
  SELECT hb, hclose / lag(hclose) OVER (ORDER BY hb) - 1 AS a
  FROM hc WHERE symbol = '{XC_A}'
),
rb AS (
  SELECT hb, hclose / lag(hclose) OVER (ORDER BY hb) - 1 AS b
  FROM hc WHERE symbol = '{XC_B}'
),
j AS (
  SELECT hb AS bar_start, ra.a, rb.b FROM ra JOIN rb USING (hb)
  WHERE ra.a IS NOT NULL AND rb.b IS NOT NULL
),
l AS (
  SELECT a,
"""
    + ",\n".join(
        f"         {'lag' if k > 0 else 'lead'}(b, {abs(k)})"
        f" OVER (ORDER BY bar_start)"
        f" AS b_{'m' if k < 0 else 'p'}{abs(k)}"
        if k != 0
        else "         b AS b_p0"
        for k in XC_LAGS
    )
    + """
  FROM j
)
SELECT CAST(count(*) AS BIGINT) AS n,
"""
    + ",\n".join("       " + _xc_sql_col(k) for k in XC_LAGS)
    + "\nFROM l",
    "quant",
    "timeseries",
)
def q_lead_lag_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between the '{a}' and '{b}' HOURLY
    return series at joined-row lags {lags}: hourly closes (last trade
    per hour) are aligned on shared hours, and xcorr at lag k correlates a_t with b shifted k
    joined rows — positive-lag peaks mean '{a}' leads. Moment-sum
    Pearson formula identical on both engines, float32-collapsed; the
    lag unit is joined rows (shared bars), documented rather than
    calendar-gap-filled, so both engines shift the identical sequence.

    Scale: per-series returns are symbol-filtered window passes; the
    alignment is one equi-join on bar_start; the shifts and moment sums
    run over the joined series (single partition by construction — the
    pair series is symbol-bounded, not corpus-bounded; for thousands of
    pairs the same plan parameterizes per pair-key and stays
    partitioned). One output row.
    """
    from .extensions.dedup import _cut_lineage
    from .sources.tables import events_as_trades

    # The hourly-close table feeds BOTH return-series branches; lazily
    # each branch re-executed the trades scan + hourly aggregation
    # (two full scans in the plan, zero ReusedExchange). The cut
    # computes the tiny (hours × 2 symbols)-row table once per call
    # (guide §1.2).
    hc = _cut_lineage(
        events_as_trades(spark, sf_dir)
        .where(F.col("symbol").isin(XC_A, XC_B))
        .groupBy(
            "symbol", F.date_trunc("hour", "event_time").alias("hb")
        )
        .agg(F.max_by("price", "event_time").alias("hclose"))
    )

    def rets(sym: str, alias: str):
        w = Window.orderBy("hb")
        return (
            hc.where(F.col("symbol") == sym)
            .select(
                F.col("hb").alias("bar_start"),
                (F.col("hclose") / F.lag("hclose").over(w) - 1).alias(
                    alias
                ),
            )
            .where(F.col(alias).isNotNull())
        )

    # No orderBy on the joined series: the lag/lead window's own sort
    # (single partition, ORDER BY bar_start) fully determines the shift
    # order, so a pre-sort was a wasted global range-exchange + sort
    # (guide §2.4 — an orderBy used only for determinism the window
    # already provides).
    j = rets(XC_A, "a").join(rets(XC_B, "b"), "bar_start")
    w = Window.orderBy("bar_start")
    cols = []
    for k in XC_LAGS:
        name = f"b_{'m' if k < 0 else 'p'}{abs(k)}"
        if k == 0:
            cols.append(F.col("b").alias(name))
        elif k > 0:
            cols.append(F.lag("b", k).over(w).alias(name))
        else:
            cols.append(F.lead("b", -k).over(w).alias(name))
    l = j.select("a", "bar_start", *cols)
    aggs = [F.count("*").cast("long").alias("n")]
    for k in XC_LAGS:
        name = f"b_{'m' if k < 0 else 'p'}{abs(k)}"
        ok = F.col(name).isNotNull()
        a = F.col("a")
        b = F.col(name)
        n = F.sum(F.when(ok, 1).otherwise(0)).cast("double")
        sx = F.sum(F.when(ok, a))
        sy = F.sum(b)
        sxx = F.sum(F.when(ok, a * a))
        syy = F.sum(b * b)
        sxy = F.sum(a * b)
        num = n * sxy - sx * sy
        den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        aggs.append(
            r6(F.when(den > 0, num / den), f"xcorr_{'m' if k < 0 else 'p'}{abs(k)}")
        )
    return l.agg(*aggs)


# ---------------------------------------------------------------------------
# Volume profile (price-bucket volume histogram + point of control)
# ---------------------------------------------------------------------------

VP_BUCKETS = 20


@register(
    "q_volume_profile",
    BARS_CTE
    + f"""
, rng AS (
  SELECT symbol, min("close") AS mn, max("close") AS mx
  FROM bars GROUP BY symbol
),
bk AS (
  SELECT b.symbol,
         CASE WHEN r.mx = r.mn THEN 0
              ELSE least(CAST(floor(CAST(("close" - r.mn) / (r.mx - r.mn)
                                         AS REAL) * {VP_BUCKETS}) AS INTEGER),
                         {VP_BUCKETS - 1}) END AS bucket,
         b.volume
  FROM bars b JOIN rng r USING (symbol)
),
vol AS (
  SELECT symbol, bucket, sum(volume) AS v
  FROM bk GROUP BY symbol, bucket
),
tot AS (SELECT symbol, sum(v) AS tv, count(*) AS nb FROM vol GROUP BY symbol),
poc AS (
  SELECT symbol, bucket AS poc_bucket, v AS poc_vol
  FROM (
    SELECT symbol, bucket, v,
           row_number() OVER (PARTITION BY symbol
                              ORDER BY v DESC, bucket) AS rk
    FROM vol
  ) WHERE rk = 1
)
SELECT t.symbol,
       CAST(t.nb AS BIGINT) AS n_buckets,
       CAST(p.poc_bucket AS BIGINT) AS poc_bucket,
       CAST(p.poc_vol AS REAL) AS poc_volume,
       CAST((SELECT sum(v.v) FROM vol v
             WHERE v.symbol = t.symbol
               AND abs(v.bucket - p.poc_bucket) <= 2) / t.tv AS REAL)
           AS value_area_frac
FROM tot t JOIN poc p USING (symbol)
""",
    "quant",
    "profile",
)
def q_volume_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume profile of each symbol: bar volume histogrammed into
    {n} equal-width close-price buckets over the symbol's observed
    range, the point of control (highest-volume bucket, lowest-bucket
    tie-break), and the value-area fraction (share of volume within
    ±2 buckets of the POC) — the market-structure summary behind
    support/resistance heuristics. The bucket ratio is
    float32-collapsed before flooring so bucket edges are
    engine-stable.

    Scale: per-symbol min/max is a broadcast join back onto the scan;
    the histogram is a (symbol, bucket) agg with a fixed key space;
    POC and value area are windows/joins over that tiny table.
    """
    bars = gold_bars_cut(spark, sf_dir)
    rng = bars.groupBy("symbol").agg(
        F.min("close").alias("mn"), F.max("close").alias("mx")
    )
    bucket = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.least(
            F.floor(
                (
                    (F.col("close") - F.col("mn"))
                    / (F.col("mx") - F.col("mn"))
                ).cast("float")
                * VP_BUCKETS
            ).cast("int"),
            F.lit(VP_BUCKETS - 1),
        )
    )
    vol = (
        bars.join(F.broadcast(rng), "symbol")
        .select("symbol", bucket.alias("bucket"), "volume")
        .groupBy("symbol", "bucket")
        .agg(F.sum("volume").alias("v"))
    )
    tot = vol.groupBy("symbol").agg(
        F.sum("v").alias("tv"), F.count("*").alias("nb")
    )
    wp = Window.partitionBy("symbol").orderBy(F.desc("v"), F.asc("bucket"))
    poc = (
        vol.withColumn("rk", F.row_number().over(wp))
        .where(F.col("rk") == 1)
        .select(
            "symbol",
            F.col("bucket").alias("poc_bucket"),
            F.col("v").alias("poc_vol"),
        )
    )
    va = (
        vol.join(F.broadcast(poc), "symbol")
        .where(F.abs(F.col("bucket") - F.col("poc_bucket")) <= 2)
        .groupBy("symbol")
        .agg(F.sum("v").alias("va"))
    )
    return (
        tot.join(poc, "symbol")
        .join(va, "symbol")
        .select(
            "symbol",
            F.col("nb").cast("long").alias("n_buckets"),
            F.col("poc_bucket").cast("long").alias("poc_bucket"),
            r6(F.col("poc_vol"), "poc_volume"),
            r6(F.col("va") / F.col("tv"), "value_area_frac"),
        )
    )

# ---------------------------------------------------------------------------
# Item-item collaborative filtering (cosine on co-occurrence)
# ---------------------------------------------------------------------------

CF_TOP = 25
#: Support floor: pairs must co-occur in at least this many orders —
#: the standard CF noise gate, and it bounds the reported candidate set.
CF_MIN_COOC = 2


@register(
    "q_item_cf",
    f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
df AS (SELECT l_partkey AS item, count(*) AS n FROM li GROUP BY l_partkey),
cooc AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v, count(*) AS c
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
)
SELECT u, v,
       CAST(c AS BIGINT) AS n_cooc,
       CAST(c / sqrt(du.n * CAST(dv.n AS DOUBLE)) AS REAL) AS cosine
FROM cooc
JOIN df du ON du.item = u
JOIN df dv ON dv.item = v
WHERE c >= {CF_MIN_COOC}
ORDER BY CAST(c / sqrt(du.n * CAST(dv.n AS DOUBLE)) AS REAL) DESC, u, v
LIMIT {CF_TOP}
""",
    "recommender",
    "similarity",
)
def q_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering over order baskets: parts are
    binary order-occurrence vectors, pair similarity is co-occurrence
    cosine c(u,v)/√(n(u)·n(v)) (Sarwar et al. 2001), support-floored at
    {min_cooc} shared orders, top-{top} by float32-collapsed cosine
    with (u, v) tie-breaks — the classic "customers also bought"
    candidate generator.

    Scale: the basket self-join is keyed on the order id, so pair work
    is Σ basket_size² — bounded by the max basket, never corpus².
    Co-occurrence counts fold map-side; the two df lookups are
    item-keyed joins against a dimension-sized table; TakeOrdered
    avoids a global sort. The support floor keeps the candidate table
    sparse at any scale.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    df = li.groupBy(F.col("l_partkey").alias("item")).agg(
        F.count("*").alias("n")
    )
    # Pair generation via per-order sorted part arrays — the
    # _copurchase_edges shape (one groupBy(order) + JVM ordered-pair
    # explode) instead of the textbook self-join, which shuffles the
    # (order, part) table twice and sort-merges it against itself.
    # Identical (u, v, count) output; measured interleaved min-of-3 at
    # sf0.1/local[32]: 1.02 s → 0.89 s, and one fact-table shuffle
    # fewer at any scale.
    parts = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    raw = parts.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) ->"
                " transform(slice(ps, i + 2, size(ps)),"
                " y -> struct(x AS u, y AS v))))"
            )
        ).alias("p")
    ).select("p.u", "p.v")
    cooc = (
        raw.groupBy("u", "v")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= CF_MIN_COOC)
    )
    # The df lookup table is item-dimension-sized; broadcast it into
    # both lookups when it fits (memoized count, the label-prop cap) —
    # the aggregate behind it has no stats, so auto-broadcast never
    # fires on its own.
    from .extensions.dedup import memo_scalar

    du = df.select(F.col("item").alias("u"), F.col("n").alias("nu"))
    dv = df.select(F.col("item").alias("v"), F.col("n").alias("nv"))
    n_items = memo_scalar(
        spark, f"item_cf_n_items:{sf_dir}", df.count
    )
    if n_items <= int(
        os.environ.get("SPARK_GRAFT_LPA_BROADCAST_MAX_NODES", 10**7)
    ):
        du, dv = F.broadcast(du), F.broadcast(dv)
    return (
        cooc.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            F.col("c").cast("long").alias("n_cooc"),
            (
                F.col("c")
                / F.sqrt(F.col("nu") * F.col("nv").cast("double"))
            )
            .cast("float")
            .alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("u"), F.asc("v"))
        .limit(CF_TOP)
    )


# ---------------------------------------------------------------------------
# Event-stream burstiness (inter-arrival dispersion)
# ---------------------------------------------------------------------------


@register(
    "q_burstiness",
    """
WITH g AS (
  SELECT event_type,
         epoch(ts) - epoch(lag(ts) OVER (PARTITION BY event_type
                                         ORDER BY ts, event_id)) AS gap
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
),
s AS (
  SELECT event_type,
         count(gap) AS n,
         avg(gap) AS mu,
         sqrt(greatest(avg(gap * gap) - avg(gap) * avg(gap), 0)) AS sd
  FROM g GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_gaps,
       CAST(mu AS REAL) AS mean_gap_s,
       CAST(sd AS REAL) AS std_gap_s,
       CAST(CASE WHEN sd + mu > 0 THEN (sd - mu) / (sd + mu) END AS REAL)
           AS burstiness,
       CAST(CASE WHEN mu > 0 THEN sd * sd / mu END AS REAL)
           AS fano_factor
FROM s
""",
    "stats",
    "timeseries",
)
def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival burstiness per event type: gaps between consecutive
    events (ordered by time with the event id as the deterministic
    tie-break), their mean/std from one-pass moments, the burstiness
    coefficient B = (σ−μ)/(σ+μ) of Goh & Barabási 2008 (−1 regular,
    0 Poisson, →1 bursty) and the Fano-style dispersion σ²/μ — the
    arrival-process diagnostic that sizes streaming watermarks and
    state budgets before deployment.

    Scale: one ordered window pass per type (bounded per-row state)
    and a type-keyed moment agg — the shuffle carries one row of sums
    per event type regardless of stream length.
    """
    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    # ts.cast(double) keeps sub-second fractions, matching the oracle's
    # epoch(ts); unix_timestamp would truncate to whole seconds and
    # diverge on microsecond-precision fixtures.
    g = ev.select(
        "event_type",
        (
            F.col("ts").cast("double")
            - F.lag(F.col("ts").cast("double")).over(w)
        ).alias("gap"),
    )
    s = g.groupBy("event_type").agg(
        F.count("gap").alias("n"),
        F.avg("gap").alias("mu"),
        F.sqrt(
            F.greatest(
                F.avg(F.col("gap") * F.col("gap"))
                - F.avg("gap") * F.avg("gap"),
                F.lit(0.0),
            )
        ).alias("sd"),
    )
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n_gaps"),
        r6(F.col("mu"), "mean_gap_s"),
        r6(F.col("sd"), "std_gap_s"),
        r6(
            F.when(
                F.col("sd") + F.col("mu") > 0,
                (F.col("sd") - F.col("mu")) / (F.col("sd") + F.col("mu")),
            ),
            "burstiness",
        ),
        r6(
            F.when(F.col("mu") > 0, F.col("sd") * F.col("sd") / F.col("mu")),
            "fano_factor",
        ),
    )
