"""Round-7 continuation: market-microstructure estimators, concentration
and inequality analytics, and corpus-report operators —

- **Roll effective spread** (Roll 1984: 2·√(−autocov) of bar-close price
  changes — the classic transaction-cost estimate from prices alone),
- **Amihud illiquidity** (mean |log return| per unit of dollar volume —
  the standard price-impact proxy),
- **HHI supplier concentration** (Herfindahl–Hirschman index of supplier
  revenue shares per nation — the market-concentration audit),
- **Theil T index** (per-segment inequality of customer spend — the
  decomposable entropy-based inequality measure),
- **tokenizer fertility** (BPE-ish tokens per whitespace word and chars
  per token, per language — the tokenizer-efficiency report a training
  pipeline runs before committing to a vocabulary),
- **n-gram novelty** (per document: share of its distinct 3-gram
  shingles whose first corpus occurrence is this document — the
  freshness/redundancy score dual to the dedup family),
- **dataset card** (per-source corpus report: docs, token volume, exact
  duplicate-text rate, mean quality, language-mix entropy — the summary
  table a dataset release ships with).

Registry conventions as everywhere (see registry.py): each query is a
(Spark builder, DuckDB oracle) pair via ``@register``; float outputs are
float32-canonicalized (r6) at the output boundary only; shingles reuse
the dedup family's 3-gram word shingling and text stats reuse
extensions.text so the corpus semantics stay aligned across families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .extensions import text as X
from .extensions.dedup import word_ngrams
from .operators.bars import gold_bars_cut
from .registry import BARS_CTE, r6, register
from .sources.tables import load_table

# ---------------------------------------------------------------------------
# Roll effective spread
# ---------------------------------------------------------------------------


@register(
    "q_roll_spread",
    BARS_CTE
    + """
, d0 AS (
  SELECT symbol, bar_start,
         "close" - lag("close") OVER w AS dp
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY bar_start)
), d AS (
  SELECT symbol, dp,
         lag(dp) OVER (PARTITION BY symbol ORDER BY bar_start) AS dp_prev
  FROM d0
)
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_diffs,
       CAST(CASE WHEN abs(covar_samp(dp, dp_prev)) < 1e-6 THEN 0
                 ELSE covar_samp(dp, dp_prev) END AS REAL) AS autocov,
       CAST(CASE WHEN covar_samp(dp, dp_prev) < -1e-6
                 THEN 2 * sqrt(-covar_samp(dp, dp_prev)) END AS REAL)
           AS roll_spread
FROM d
WHERE dp IS NOT NULL AND dp_prev IS NOT NULL
GROUP BY symbol
""",
    "quant",
    "microstructure",
)
def q_roll_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Roll (1984) effective-spread estimator per symbol over the gold
    minute bars: price changes Δp alternate inside the bid-ask bounce, so
    the spread is 2·√(−Cov(Δp_t, Δp_{t−1})); a non-negative autocovariance
    (trending market) yields NULL, the estimator's defined-domain gap.

    Scale: one ordered window pass per symbol (two lags) fused into the
    shared gold-bars layout, then a per-symbol covariance partial-agg —
    no exchange beyond the bars table's own symbol partitioning.
    """
    bars = gold_bars_cut(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("bar_start")
    dp = (F.col("close") - F.lag("close").over(w)).alias("dp")
    d = bars.select("symbol", "bar_start", dp)
    d = d.select("symbol", "dp", F.lag("dp").over(w).alias("dp_prev"))
    d = d.where(F.col("dp").isNotNull() & F.col("dp_prev").isNotNull())
    cov = F.covar_samp("dp", "dp_prev")
    # ±1e-6 dead zone around 0 (r6z convention): a true autocovariance
    # of ~0 lands at different tiny magnitudes on the two engines (sum
    # order), which would otherwise flip the defined/NULL decision for
    # the spread.
    from .registry import r6z

    return d.groupBy("symbol").agg(
        F.count("*").alias("n_diffs"),
        r6z(cov, "autocov"),
        r6(F.when(cov < -1e-6, 2 * F.sqrt(-cov)), "roll_spread"),
    )


# ---------------------------------------------------------------------------
# Amihud illiquidity
# ---------------------------------------------------------------------------


@register(
    "q_amihud_illiquidity",
    BARS_CTE
    + """
, r AS (
  SELECT symbol,
         CASE WHEN "close" > 0 AND lag("close") OVER w > 0
              THEN abs(ln("close" / lag("close") OVER w)) END AS aret,
         vwap * volume AS dollar_vol
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY bar_start)
)
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_bars,
       CAST(1e6 * avg(aret / dollar_vol) AS REAL) AS amihud_illiq
FROM r
WHERE aret IS NOT NULL AND dollar_vol > 0
GROUP BY symbol
""",
    "quant",
    "microstructure",
)
def q_amihud_illiquidity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Amihud (2002) illiquidity per symbol over the gold minute bars:
    mean of |log return| per dollar of volume (×10⁶ for readability) —
    the standard price-impact proxy. First bars (no previous close) and
    zero-dollar-volume bars are outside the estimator's domain on both
    engines.

    Scale: one ordered window pass (lag) fused into the shared gold-bars
    layout, then a per-symbol mean — no extra exchange.
    """
    bars = gold_bars_cut(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("bar_start")
    prev = F.lag("close").over(w)
    # Positive-price guard on BOTH engines: the synthetic stream carries
    # a handful of non-positive prices at sf0.1+, which would make the
    # ratio an ANSI divide-by-zero (Spark) or a log-domain error — the
    # estimator is only defined on positive prices.
    aret = F.when(
        (F.col("close") > 0) & (prev > 0),
        F.abs(F.log(F.col("close") / prev)),
    )
    r = bars.select(
        "symbol",
        aret.alias("aret"),
        (F.col("vwap") * F.col("volume")).alias("dollar_vol"),
    ).where(F.col("aret").isNotNull() & (F.col("dollar_vol") > 0))
    return r.groupBy("symbol").agg(
        F.count("*").alias("n_bars"),
        r6(1e6 * F.avg(F.col("aret") / F.col("dollar_vol")), "amihud_illiq"),
    )


# ---------------------------------------------------------------------------
# HHI supplier-revenue concentration
# ---------------------------------------------------------------------------


@register(
    "q_hhi_concentration",
    """
WITH rev AS (
  SELECT s.s_nationkey, l.l_suppkey,
         sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY s.s_nationkey, l.l_suppkey
), shares AS (
  SELECT s_nationkey, revenue,
         revenue / sum(revenue) OVER (PARTITION BY s_nationkey) AS share
  FROM rev
)
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(10000 * sum(share * share) AS REAL) AS hhi,
       CAST(max(share) AS REAL) AS top_share
FROM shares r JOIN nation n ON r.s_nationkey = n.n_nationkey
GROUP BY n.n_name, r.s_nationkey
""",
    "analytics",
    "concentration",
)
def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman index of supplier revenue concentration per
    nation: HHI = 10000·Σ share², plus the largest single-supplier share
    — the market-concentration audit over the order book.

    Scale: one fact-table keyed agg to (nation, supplier) revenue —
    supplier-count-sized — then a nation-keyed rollup; the supplier dim
    is broadcast into the fact scan, the nation dim into the tiny rollup.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )
    tot = Window.partitionBy("s_nationkey")
    shares = rev.select(
        "s_nationkey",
        "revenue",
        (F.col("revenue") / F.sum("revenue").over(tot)).alias("share"),
    )
    return (
        shares.join(
            F.broadcast(nat), shares["s_nationkey"] == nat["n_nationkey"]
        )
        .groupBy("n_name", "s_nationkey")
        .agg(
            F.count("*").alias("n_suppliers"),
            r6(10000 * F.sum(F.col("share") * F.col("share")), "hhi"),
            r6(F.max("share"), "top_share"),
        )
        .select("n_name", "n_suppliers", "hhi", "top_share")
    )


# ---------------------------------------------------------------------------
# Theil T inequality index
# ---------------------------------------------------------------------------


@register(
    "q_theil_index",
    """
WITH spend AS (
  SELECT c.c_mktsegment, o.o_custkey, sum(o.o_totalprice) AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, o.o_custkey
), terms AS (
  SELECT c_mktsegment, x,
         (x / avg(x) OVER (PARTITION BY c_mktsegment))
           * ln(x / avg(x) OVER (PARTITION BY c_mktsegment)) AS term
  FROM spend
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(avg(x) AS REAL) AS mean_spend,
       CAST(avg(term) AS REAL) AS theil_t
FROM terms
GROUP BY c_mktsegment
""",
    "analytics",
    "inequality",
)
def q_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of customer spend per market segment:
    T = mean((x/μ)·ln(x/μ)) over customers with orders — 0 at perfect
    equality, ln(n) at maximal concentration; the decomposable
    entropy-based inequality measure.

    Scale: one orders-keyed agg to per-customer spend, a window mean per
    segment (segment-keyed exchange over a customer-count-sized table),
    then a segment rollup. Spend is strictly positive (order totals), so
    the log never needs a domain guard.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    spend = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.sum("o_totalprice").alias("x"))
    )
    mu = F.avg("x").over(Window.partitionBy("c_mktsegment"))
    ratio = F.col("x") / mu
    per = spend.select(
        "c_mktsegment", "x", (ratio * F.log(ratio)).alias("term")
    )
    return per.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        r6(F.avg("x"), "mean_spend"),
        r6(F.avg("term"), "theil_t"),
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility
# ---------------------------------------------------------------------------


@register(
    "q_tokenizer_fertility",
    rf"""
WITH t AS (
  SELECT lang,
         len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
         len(regexp_extract_all(text, '{X.BPE_PATTERN}')) AS bpe_tokens,
         len(text) AS n_chars
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(avg(CASE WHEN ws_tokens > 0
                     THEN CAST(bpe_tokens AS DOUBLE) / ws_tokens END) AS REAL)
           AS fertility,
       CAST(avg(CASE WHEN bpe_tokens > 0
                     THEN CAST(n_chars AS DOUBLE) / bpe_tokens END) AS REAL)
           AS chars_per_bpe_token
FROM t
GROUP BY lang
""",
    "text",
    "llm",
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility report per language: mean BPE-ish tokens per
    whitespace word (fertility — how many subwords the tokenizer spends
    per word) and mean chars per BPE token — the per-language efficiency
    table a pipeline inspects before committing to a vocabulary. Reuses
    the exact token definitions of q_token_count (extensions.text).

    Scale: pure per-row expressions fused into the documents scan, then
    one language-keyed partial agg (|langs| groups).
    """
    docs = load_table(spark, sf_dir, "documents")
    t = X.with_token_counts(docs)
    fert = F.when(
        F.col("ws_tokens") > 0,
        F.col("bpe_tokens").cast("double") / F.col("ws_tokens"),
    )
    cpt = F.when(
        F.col("bpe_tokens") > 0,
        F.length("text").cast("double") / F.col("bpe_tokens"),
    )
    return t.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        r6(F.avg(fert), "fertility"),
        r6(F.avg(cpt), "chars_per_bpe_token"),
    )


# ---------------------------------------------------------------------------
# N-gram novelty
# ---------------------------------------------------------------------------


@register(
    "q_ngram_novelty",
    r"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS wrds FROM documents
), gs AS (
  SELECT doc_id,
         CASE WHEN len(wrds) >= 3 THEN
           list_distinct(list_transform(generate_series(1, len(wrds) - 2),
             i -> wrds[i] || ' ' || wrds[i+1] || ' ' || wrds[i+2]))
         ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM w
), posting AS (
  SELECT doc_id, unnest(grams) AS gram FROM gs
), stamped AS (
  SELECT doc_id,
         CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY gram)
              THEN 1 ELSE 0 END AS is_novel
  FROM posting
), novel AS (
  SELECT doc_id, count(*) AS n_grams, sum(is_novel) AS n_novel
  FROM stamped GROUP BY doc_id
)
SELECT g.doc_id,
       CAST(coalesce(n.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(CASE WHEN n.n_grams > 0
                 THEN CAST(n.n_novel AS DOUBLE) / n.n_grams END AS REAL)
           AS novelty
FROM gs g LEFT JOIN novel n ON g.doc_id = n.doc_id
""",
    "llm",
    "dedup",
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the share of a document's distinct
    3-gram word shingles whose FIRST corpus occurrence (minimum doc_id)
    is this document — 1.0 for entirely fresh text, → 0 for text
    assembled from earlier documents. The redundancy-scoring dual of the
    dedup family (same shingling as q_dedup_ngram_jaccard); corpora use
    it to rank sources by marginal contribution.

    Scale: explode shingles to a posting list, one gram-keyed window/agg
    to stamp each posting with the gram's first holder, then a doc-keyed
    rollup — two keyed exchanges over the posting volume, no pairwise
    joins anywhere.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    g = docs.select("doc_id", word_ngrams(F.col("text"), 3).alias("grams"))
    posting = g.select("doc_id", F.explode("grams").alias("gram"))
    first = F.min("doc_id").over(Window.partitionBy("gram"))
    stamped = posting.select(
        "doc_id", (F.col("doc_id") == first).cast("long").alias("is_novel")
    )
    novel = stamped.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"), F.sum("is_novel").alias("n_novel")
    )
    base = g.select("doc_id")
    out = base.join(novel, "doc_id", "left")
    return out.select(
        "doc_id",
        F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
        r6(
            F.when(
                F.col("n_grams") > 0,
                F.col("n_novel").cast("double") / F.col("n_grams"),
            ),
            "novelty",
        ),
    )


# ---------------------------------------------------------------------------
# Dataset card
# ---------------------------------------------------------------------------


@register(
    "q_dataset_card",
    rf"""
WITH s AS (
  SELECT source, lang, text,
         len(string_split_regex(trim(text), '\s+')) AS n_words,
         len(text) AS n_chars,
         CASE WHEN len(text) > 0 THEN
           CAST(len(text) - len(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g'))
                AS DOUBLE) / len(text) END AS punct_ratio,
         CASE WHEN len(string_split_regex(trim(text), '\s+')) > 0 THEN
           CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                w2 -> w2 IN ({", ".join(f"'{m}'" for m in X.LANG_MARKERS["en"])})))
                AS DOUBLE) / len(string_split_regex(trim(text), '\s+')) END
             AS stopword_ratio
  FROM documents
), per_source AS (
  SELECT source,
         count(*) AS n_docs,
         sum(n_words) AS total_words,
         count(DISTINCT text) AS n_distinct_texts,
         avg(ln(1 + n_words) * (1 - punct_ratio) * (0.5 + 0.5 * stopword_ratio))
             AS mean_quality
  FROM s GROUP BY source
), lang_mix AS (
  SELECT source,
         -sum((cnt / tot) * ln(cnt / tot)) AS lang_entropy
  FROM (
    SELECT source, lang, CAST(count(*) AS DOUBLE) AS cnt,
           CAST(sum(count(*)) OVER (PARTITION BY source) AS DOUBLE) AS tot
    FROM s GROUP BY source, lang
  ) GROUP BY source
)
SELECT p.source,
       CAST(p.n_docs AS BIGINT) AS n_docs,
       CAST(p.total_words AS BIGINT) AS total_words,
       CAST(1 - CAST(p.n_distinct_texts AS DOUBLE) / p.n_docs AS REAL)
           AS exact_dup_rate,
       CAST(p.mean_quality AS REAL) AS mean_quality,
       CAST(l.lang_entropy AS REAL) AS lang_entropy
FROM per_source p JOIN lang_mix l ON p.source = l.source
""",
    "llm",
    "report",
)
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card — the summary table a corpus release
    ships with: document count, total whitespace-token volume, exact
    duplicate-text rate (1 − distinct/total), mean quality score (same
    formula as q_text_stats), and language-mix entropy (nats).

    Scale: one documents scan feeding (a) a source-keyed agg with a
    distinct-text count (gram-free exact dedup rate; at 100 TB swap in
    approx_count_distinct with one line) and (b) a (source, lang)-keyed
    count rolled into entropy — both exchanges are keyed aggs over
    scan-fused per-row expressions; the final join is |sources|-sized
    and broadcast.
    """
    docs = load_table(spark, sf_dir, "documents")
    s = X.with_text_stats(docs)
    per_source = s.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.countDistinct("text").alias("n_distinct_texts"),
        F.avg("quality_score").alias("mean_quality"),
    )
    counts = docs.groupBy("source", "lang").agg(
        F.count("*").cast("double").alias("cnt")
    )
    tot = Window.partitionBy("source")
    p = F.col("cnt") / F.sum("cnt").over(tot)
    lang_mix = (
        counts.select("source", (-p * F.log(p)).alias("term"))
        .groupBy("source")
        .agg(F.sum("term").alias("lang_entropy"))
    )
    return (
        per_source.join(F.broadcast(lang_mix), "source")
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            "total_words",
            r6(
                1
                - F.col("n_distinct_texts").cast("double") / F.col("n_docs"),
                "exact_dup_rate",
            ),
            r6("mean_quality", "mean_quality"),
            r6("lang_entropy", "lang_entropy"),
        )
    )
