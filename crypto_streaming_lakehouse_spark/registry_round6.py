"""Round-6 additions: thirteen training-data-pipeline operators the earlier
registries did not cover —

- deterministic hash-based **stratified sampling** (per-stratum rates,
  the reproducible downsampling step of corpus rebalancing),
- **mutual information / chi-squared** between two categorical corpus
  facets (lang × source) — the dependence diagnostic behind mixture
  design,
- **DSIR-style importance weights** (hashed-unigram log-likelihood
  ratio of a target slice vs the full corpus; Xie et al. 2023,
  "Data Selection for Language Models via Importance Resampling" —
  public paper, re-expressed as pure DataFrame ops),
- a **nearest-centroid classifier** over the labeled embeddings table
  (per-label centroids → argmin assignment → confusion counts), the
  evaluation twin of q_kmeans' assign step,
- **nucleus (top-p) corpus selection** per stratum (integer-exact
  cumulative-prefix membership),
- a **Zipf rank–frequency fit** (corpus-health slope over the
  vocabulary-sized count table),
- a **two-sample Kolmogorov–Smirnov drift test** between corpus slices
  (value-domain-bounded ECDF),
- **perceptual-hash (aHash) image dedup** over the real binary PPM
  decode path (integer-exact bits, closed-form oracle),
- **energy-contour audio fingerprint dedup** over the real binary WAV
  decode path (Chromaprint-shaped envelope bits, closed-form oracle),
- **product-quantization encode** (the memory-bound half of IVF-PQ:
  per-subspace argmin against a broadcast codebook, packed codes),
- **reciprocal-rank fusion** of BM25 and cosine retrieval (hybrid
  search; float32-collapsed scores make the integer ranks oracle-exact),
- a **dedup-pipeline evaluation** (MinHash-LSH pair set vs the exact
  df-capped-Jaccard set: recall/precision of the sub-quadratic path),
- an **ANN recall evaluation** (recall@k of the LSH and IVF indexes
  against the brute-force cosine ground truth).

Registry conventions as everywhere: each query is a (Spark builder,
DuckDB oracle) pair via ``@register(name, sql, *tags)``; hashing is
md5-derived (functions.hashing) so both engines compute bit-identical
buckets; float outputs are float32-canonicalized (r6/r6z) at the output
boundary only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extensions.text import words
from .functions.hashing import md5_int32, md5_int32_sql
from .registry import REGISTRY, _sql_z, r6, r6z, register
from .registry_round2 import _BM25_TERMS_SQL as _BM25_TERMS_SQL_R6
from .sources.tables import load_table

# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------

#: Sampling rates are expressed in basis points (out of 10_000) and
#: derived per-stratum from the stratum key's hash, so every stratum has
#: a distinct, reproducible rate in [2000, 8000] without a hand-written
#: rate table on both engines.
STRAT_BP_LO = 2_000
STRAT_BP_SPAN = 6_001

_STRAT_KEY_HASH = md5_int32_sql("lang || '|' || source")
_STRAT_DOC_HASH = md5_int32_sql("CAST(doc_id AS VARCHAR) || ':strat'")
_STRAT_RATE_SQL = f"{STRAT_BP_LO} + {_STRAT_KEY_HASH} % {STRAT_BP_SPAN}"
_STRAT_KEEP_SQL = f"{_STRAT_DOC_HASH} % 10000"


@register(
    "q_stratified_sample_corpus",
    f"""
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(count(*) FILTER (WHERE {_STRAT_KEEP_SQL} < {_STRAT_RATE_SQL})
            AS BIGINT) AS n_sampled,
       CAST(max({_STRAT_RATE_SQL}) AS BIGINT) AS rate_bp
FROM documents
GROUP BY lang, source
""",
    "llm",
    "sampling",
)
def q_stratified_sample_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified corpus sampling (documents-table
    companion to the events-table per-class sampler
    ``q_stratified_sample``): each (lang, source)
    stratum gets its own keep-rate (basis points, hash-derived so the
    rate table needs no side channel), and a document is kept iff the
    md5 of its id falls under the stratum's rate — the standard
    reproducible Bernoulli sampler for corpus rebalancing (every run,
    every engine, every executor picks the same documents).

    Scale: one scan, two map-side md5 expressions, one keyed partial
    agg — no shuffle beyond the (lang, source) aggregation whose key
    space is the stratum count, independent of corpus size. The sample
    DECISION is per-row and embarrassingly parallel; this query reports
    the per-stratum audit (total vs sampled vs configured rate) a
    pipeline would log before materializing the sample.
    """
    docs = load_table(spark, sf_dir, "documents")
    rate_bp = (
        F.lit(STRAT_BP_LO)
        + md5_int32(F.concat_ws("|", F.col("lang"), F.col("source")))
        % STRAT_BP_SPAN
    )
    keep_hash = md5_int32(
        F.concat(F.col("doc_id").cast("string"), F.lit(":strat"))
    ) % 10_000
    return (
        docs.select(
            "lang",
            "source",
            rate_bp.alias("rate_bp"),
            (keep_hash < rate_bp).cast("int").alias("kept"),
        )
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_total"),
            F.sum("kept").cast("long").alias("n_sampled"),
            F.max("rate_bp").alias("rate_bp"),
        )
    )


# ---------------------------------------------------------------------------
# Mutual information / chi-squared between corpus facets
# ---------------------------------------------------------------------------


@register(
    "q_mutual_information",
    """
WITH joint AS (
  SELECT lang, source, CAST(count(*) AS DOUBLE) AS nxy
  FROM documents GROUP BY lang, source
),
tot AS (SELECT sum(nxy) AS n FROM joint),
mx AS (SELECT lang, sum(nxy) AS nx FROM joint GROUP BY lang),
my AS (SELECT source, sum(nxy) AS ny FROM joint GROUP BY source),
terms AS (
  SELECT j.nxy, mx.nx, my.ny, tot.n
  FROM joint j JOIN mx USING (lang) JOIN my USING (source) CROSS JOIN tot
),
hx AS (SELECT -sum(nx / tot.n * ln(nx / tot.n)) AS h FROM mx CROSS JOIN tot),
hy AS (SELECT -sum(ny / tot.n * ln(ny / tot.n)) AS h FROM my CROSS JOIN tot),
mi AS (
  SELECT CAST(count(*) AS BIGINT) AS n_cells,
         CAST(sum(nxy) AS BIGINT) AS n_docs,
         sum(nxy / n * ln(nxy * n / (nx * ny))) AS mi_nats,
         sum((nxy - nx * ny / n) * (nxy - nx * ny / n) / (nx * ny / n))
           AS chi2
  FROM terms
)
SELECT n_cells, n_docs,
       {z_mi} AS mi_nats,
       {z_nmi} AS nmi,
       CAST(chi2 AS REAL) AS chi2
FROM mi CROSS JOIN hx CROSS JOIN hy
""".format(
        z_mi=_sql_z("mi_nats"),
        z_nmi=_sql_z("CASE WHEN hx.h * hy.h > 0 THEN mi_nats / sqrt(hx.h * hy.h) END"),
    ),
    "llm",
    "stats",
)
def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information, normalized MI, and the chi-squared statistic
    between the corpus' two categorical facets (lang × source) — the
    dependence diagnostic a mixture designer checks before treating
    facets as independent sampling axes.

    Scale: the only corpus-sized operation is ONE keyed partial agg to
    the (lang, source) contingency table; everything after runs on a
    table bounded by |langs|×|sources| cells regardless of corpus size
    (the marginal/total joins are broadcasts of sub-kilobyte tables).
    MI sums are order-sensitive in the last double ulps, so outputs are
    float32-canonicalized (r6z for the near-zero-capable MI).
    """
    docs = load_table(spark, sf_dir, "documents")
    joint = docs.groupBy("lang", "source").agg(
        F.count("*").cast("double").alias("nxy")
    )
    tot = joint.agg(F.sum("nxy").alias("n"))
    mx = joint.groupBy("lang").agg(F.sum("nxy").alias("nx"))
    my = joint.groupBy("source").agg(F.sum("nxy").alias("ny"))
    terms = (
        joint.join(F.broadcast(mx), "lang")
        .join(F.broadcast(my), "source")
        .crossJoin(F.broadcast(tot))
    )
    n = F.col("n")
    e = F.col("nx") * F.col("ny") / n
    mi = terms.agg(
        F.count("*").alias("n_cells"),
        F.sum("nxy").cast("long").alias("n_docs"),
        F.sum(F.col("nxy") / n * F.log(F.col("nxy") * n / (F.col("nx") * F.col("ny")))).alias(
            "mi_nats"
        ),
        F.sum((F.col("nxy") - e) * (F.col("nxy") - e) / e).alias("chi2"),
    )
    hx = (
        mx.crossJoin(F.broadcast(tot))
        .agg((-F.sum(F.col("nx") / n * F.log(F.col("nx") / n))).alias("hx"))
    )
    hy = (
        my.crossJoin(F.broadcast(tot))
        .agg((-F.sum(F.col("ny") / n * F.log(F.col("ny") / n))).alias("hy"))
    )
    out = mi.crossJoin(F.broadcast(hx)).crossJoin(F.broadcast(hy))
    return out.select(
        "n_cells",
        "n_docs",
        r6z("mi_nats", "mi_nats"),
        r6z(
            F.when(
                F.col("hx") * F.col("hy") > 0,
                F.col("mi_nats") / F.sqrt(F.col("hx") * F.col("hy")),
            ),
            "nmi",
        ),
        r6("chi2", "chi2"),
    )


# ---------------------------------------------------------------------------
# DSIR-style importance weights (hashed-unigram log-likelihood ratio)
# ---------------------------------------------------------------------------

DSIR_B = 512  # hashed feature buckets
#: Additive smoothing; 0.5 is exactly representable so both engines
#: compute identical smoothed ratios.
DSIR_ALPHA = 0.5
#: The target-domain profile. Production DSIR estimates target bucket
#: counts from a sample of the target corpus (e.g. Wikipedia); the
#: synthetic fixture's language/source strata share ONE vocabulary with
#: near-identical frequencies, so a slice-estimated profile would be
#: statistical noise. A keyword profile is the same math with a
#: deliberately separated target distribution — and it is computable at
#: import time, identically on both engines, because the bucket hash is
#: plain md5.
DSIR_TARGET_WORDS = ("spark", "stream", "window", "join")


def _dsir_target_buckets() -> dict[int, int]:
    import hashlib

    out: dict[int, int] = {}
    for w in DSIR_TARGET_WORDS:
        b = int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % DSIR_B
        out[b] = out.get(b, 0) + 1
    return out


_DSIR_TB = _dsir_target_buckets()
_DSIR_T = float(len(DSIR_TARGET_WORDS))

_DSIR_TB_SQL = "tgt(b, tb) AS (VALUES " + ", ".join(
    f"({b}, CAST({tb} AS DOUBLE))" for b, tb in sorted(_DSIR_TB.items())
) + ")"

_DSIR_TOKS_SQL = f"""
toks AS (
  SELECT doc_id, {md5_int32_sql('w')} % {DSIR_B} AS b
  FROM (SELECT doc_id,
               unnest(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents)
)
"""


@register(
    "q_dsir_weights",
    "WITH "
    + _DSIR_TB_SQL
    + ", "
    + _DSIR_TOKS_SQL
    + f"""
, corpus AS (SELECT b, CAST(count(*) AS DOUBLE) AS cb FROM toks GROUP BY b),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS ctot FROM toks),
lam AS (
  SELECT c.b,
         ln((coalesce(t.tb, 0) + {DSIR_ALPHA}) / ({_DSIR_T} + {DSIR_ALPHA} * {DSIR_B}))
           - ln((c.cb + {DSIR_ALPHA}) / (tot.ctot + {DSIR_ALPHA} * {DSIR_B})) AS lam
  FROM corpus c LEFT JOIN tgt t USING (b) CROSS JOIN tot
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       {_sql_z('avg(lam)')} AS weight
FROM toks JOIN lam USING (b)
GROUP BY doc_id
""",
    "llm",
    "selection",
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data-selection weights (Xie et al. 2023): per-document
    hashed-unigram log-likelihood ratio of a target-domain profile vs
    the corpus distribution, length-normalized — the per-example score
    an importance-resampling pipeline thresholds on. Documents dense in
    the target profile's tokens score highest.

    Scale: token explode → ONE keyed partial agg over a key space of
    {DSIR_B} buckets (constant, corpus-independent); the target profile
    is an import-time literal; the per-bucket log-ratio table is a
    broadcast join back onto the token stream; the per-doc mean is a
    keyed agg whose map-side combine collapses each document inside its
    scan partition (a document's tokens never span partitions). No
    shuffle key ever exceeds the document count; the bucket table is
    kilobytes at any corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(words(F.col("text"))).alias("w")
    ).select("doc_id", (md5_int32(F.col("w")) % DSIR_B).alias("b"))
    corpus = toks.groupBy("b").agg(F.count("*").cast("double").alias("cb"))
    tot = toks.agg(F.count("*").cast("double").alias("ctot"))
    tb = F.lit(None).cast("double")
    for bkt, cnt in sorted(_DSIR_TB.items()):
        tb = F.when(F.col("b") == bkt, F.lit(float(cnt))).otherwise(tb)
    denom = F.lit(DSIR_ALPHA * DSIR_B)
    lam = corpus.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log(
                (F.coalesce(tb, F.lit(0.0)) + DSIR_ALPHA)
                / (_DSIR_T + DSIR_ALPHA * DSIR_B)
            )
            - F.log((F.col("cb") + DSIR_ALPHA) / (F.col("ctot") + denom))
        ).alias("lam"),
    )
    return (
        toks.join(F.broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            r6z(F.avg("lam"), "weight"),
        )
    )


# ---------------------------------------------------------------------------
# Nearest-centroid classifier over labeled embeddings
# ---------------------------------------------------------------------------

NC_DIM = 64

_NC_D2 = (
    "list_reduce(list_transform(generate_series(1, {dim}), "
    "i -> (CAST(v[i] AS DOUBLE) - CAST(c[i] AS DOUBLE))"
    " * (CAST(v[i] AS DOUBLE) - CAST(c[i] AS DOUBLE))), "
    "(acc, x) -> acc + x)"
).format(dim=NC_DIM)


@register(
    "q_nearest_centroid",
    f"""
WITH emb AS (SELECT vec_id, label, embedding AS v FROM embeddings),
cent AS (
  SELECT label AS cid, list(CAST(mf AS DOUBLE) ORDER BY pos) AS c
  FROM (
    SELECT e.label, g.pos,
           CAST(avg(CAST(e.v[g.pos] AS DOUBLE)) AS REAL) AS mf
    FROM emb e CROSS JOIN generate_series(1, {NC_DIM}) AS g(pos)
    GROUP BY e.label, g.pos
  ) GROUP BY label
),
assigned AS (
  SELECT vec_id, label, cid AS pred
  FROM (
    SELECT e.vec_id, e.label, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY CAST({_NC_D2} AS REAL), c.cid) AS rn
    FROM emb e CROSS JOIN cent c
  ) WHERE rn = 1
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(pred AS BIGINT) AS pred,
       CAST(count(*) AS BIGINT) AS n
FROM assigned GROUP BY label, pred
""",
    "ml",
    "classify",
)
def q_nearest_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid (Rocchio) classification of the labeled
    embeddings: per-label mean vectors, then every vector assigned to
    its closest centroid, reported as the (label, pred) confusion
    counts — the quality gate for "do the labels form separable
    clusters", and the evaluation twin of q_kmeans' assignment step.

    Oracle-exact via the q_kmeans contract: squared distances are
    identical-order sequential folds on both engines, centroid means
    are float32-canonicalized before use, and the argmin is pinned by
    the (float32(d2), label) tie-break.

    Scale: the centroid build is one (label, pos) partial agg (key
    space |labels| × dim, corpus-independent); assignment folds the
    centroid table into one broadcast row and array_min's over it in
    the scan stage — no shuffle of the vectors, no K×n row blow-up;
    the confusion agg's key space is |labels|². One corpus scan per
    phase, nothing else grows with data.
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
            F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    cents = cent.agg(F.collect_list(F.struct("cid", "c")).alias("cents"))
    best = F.array_min(
        F.transform(
            F.col("cents"),
            lambda ct: F.struct(
                d2(F.col("v"), ct["c"]).cast("float").alias("d2"),
                ct["cid"].alias("cid"),
            ),
        )
    )
    return (
        emb.crossJoin(F.broadcast(cents))
        .select("label", best.getField("cid").alias("pred"))
        .groupBy(F.col("label").cast("long").alias("label"), F.col("pred").cast("long").alias("pred"))
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# Nucleus (top-p) corpus selection per stratum
# ---------------------------------------------------------------------------

#: Keep the smallest high-weight prefix holding ≥ TOPP_NUM/TOPP_DEN of a
#: stratum's total weight. Expressed as an integer ratio so the keep
#: decision is pure integer arithmetic on both engines (no float
#: boundary can flip membership).
TOPP_NUM = 1
TOPP_DEN = 2


@register(
    "q_topp_filter",
    f"""
WITH ranked AS (
  SELECT lang, source, n_chars,
         sum(n_chars) OVER (PARTITION BY lang, source
                            ORDER BY n_chars DESC, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum,
         sum(n_chars) OVER (PARTITION BY lang, source) AS total
  FROM documents
)
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (
         WHERE (cum - n_chars) * {TOPP_DEN} < total * {TOPP_NUM}
       ) AS BIGINT) AS n_kept,
       CAST(sum(n_chars) FILTER (
         WHERE (cum - n_chars) * {TOPP_DEN} < total * {TOPP_NUM}
       ) AS BIGINT) AS chars_kept,
       CAST(max(total) AS BIGINT) AS chars_total
FROM ranked GROUP BY lang, source
""",
    "llm",
    "selection",
)
def q_topp_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nucleus (top-p) corpus selection: within each (lang, source)
    stratum, keep the smallest set of highest-weight documents whose
    cumulative weight reaches p of the stratum total (weight = n_chars;
    a document is kept iff the cumulative weight BEFORE it is still
    under p·total, the same prefix rule as nucleus sampling). Reported
    as the per-stratum audit counts. Membership is integer-exact: the
    p threshold is applied as cross-multiplied integer comparison.

    Scale: one window sort per stratum — strata are the parallel unit,
    so the plan holds while strata are numerous and individually
    bounded (here |langs|×|sources|). For a corpus where one stratum IS
    the corpus, the exact sort is replaced by a two-pass histogram
    threshold (estimate the weight quantile, then filter map-side);
    this operator keeps the exact form its oracle can verify.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang", "source")
        .orderBy(F.col("n_chars").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("lang", "source")
    ranked = docs.select(
        "lang",
        "source",
        "n_chars",
        F.sum("n_chars").over(w).alias("cum"),
        F.sum("n_chars").over(wt).alias("total"),
    )
    kept = (F.col("cum") - F.col("n_chars")) * TOPP_DEN < F.col(
        "total"
    ) * TOPP_NUM
    return ranked.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(kept.cast("long")).alias("n_kept"),
        F.sum(F.when(kept, F.col("n_chars"))).alias("chars_kept"),
        F.max("total").alias("chars_total"),
    )


# ---------------------------------------------------------------------------
# Zipf rank-frequency fit over the token distribution
# ---------------------------------------------------------------------------


@register(
    "q_zipf_fit",
    r"""
WITH tok AS (
  SELECT unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents
),
freq AS (SELECT w, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY w),
ranked AS (
  SELECT ln(row_number() OVER (ORDER BY c DESC, w)) AS lx, ln(c) AS ly
  FROM freq
)
SELECT CAST(count(*) AS BIGINT) AS n_types,
       CAST((sum(lx * ly) - sum(lx) * sum(ly) / count(*))
            / (sum(lx * lx) - sum(lx) * sum(lx) / count(*)) AS REAL)
         AS slope,
       CAST((sum(ly) - (sum(lx * ly) - sum(lx) * sum(ly) / count(*))
                       / (sum(lx * lx) - sum(lx) * sum(lx) / count(*))
                       * sum(lx)) / count(*) AS REAL) AS intercept
FROM ranked
""",
    "llm",
    "stats",
)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank–frequency diagnostic: OLS fit of ln(frequency) against
    ln(rank) over the corpus token distribution (natural text slopes
    near −1; a far-off slope flags TEMPLATED or machine-generated text
    — a standard corpus-health check before LM training).

    Scale: the token count agg is the only corpus-sized step (keyed
    partial agg, key space = vocabulary). The ranking window runs over
    the VOCABULARY-sized count table — bounded by distinct types, not
    corpus tokens — and the fit is one global aggregate over it. Slope
    and intercept are float32-canonicalized (sum order differs between
    engines); rank ties are pinned by (count DESC, token).
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(words(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("double").alias("c"))
    )
    ranked = freq.select(
        F.log(
            F.row_number()
            .over(Window.orderBy(F.col("c").desc(), "w"))
            .cast("double")
        ).alias("lx"),
        F.log("c").alias("ly"),
    )
    n = F.count("*")
    sxy = F.sum(F.col("lx") * F.col("ly"))
    sx = F.sum("lx")
    sy = F.sum("ly")
    sxx = F.sum(F.col("lx") * F.col("lx"))
    slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    return ranked.agg(
        n.alias("n_types"),
        r6(slope, "slope"),
        r6((sy - slope * sx) / n, "intercept"),
    )


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov–Smirnov drift test between corpus slices
# ---------------------------------------------------------------------------

KS_SLICE_SQL = "lang = 'en'"


@register(
    "q_ks_test",
    f"""
WITH tagged AS (
  SELECT n_chars,
         CASE WHEN {KS_SLICE_SQL} THEN 1 ELSE 0 END AS a,
         CASE WHEN {KS_SLICE_SQL} THEN 0 ELSE 1 END AS b
  FROM documents
),
tot AS (
  SELECT CAST(sum(a) AS DOUBLE) AS na, CAST(sum(b) AS DOUBLE) AS nb
  FROM tagged
),
pts AS (
  SELECT n_chars, sum(a) AS ca, sum(b) AS cb FROM tagged GROUP BY n_chars
),
ecdf AS (
  SELECT sum(ca) OVER (ORDER BY n_chars) AS cum_a,
         sum(cb) OVER (ORDER BY n_chars) AS cum_b
  FROM pts
)
SELECT CAST(tot.na AS BIGINT) AS n_a,
       CAST(tot.nb AS BIGINT) AS n_b,
       CAST((SELECT count(*) FROM pts) AS BIGINT) AS n_points,
       CAST(max(abs(cum_a / tot.na - cum_b / tot.nb)) AS REAL) AS ks_d,
       CAST(max(abs(cum_a / tot.na - cum_b / tot.nb))
            * sqrt(tot.na * tot.nb / (tot.na + tot.nb)) AS REAL) AS ks_stat
FROM ecdf CROSS JOIN tot
GROUP BY tot.na, tot.nb
""",
    "llm",
    "stats",
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the document-
    length distributions of a slice (lang='en') and the rest of the
    corpus — the drift check a pipeline runs when a new crawl snapshot
    or source is merged (distribution shift in length is the cheapest
    early-warning signal).

    Scale: lengths collapse to per-VALUE counts first (keyed partial
    agg, key space = distinct lengths — value-domain-bounded, not
    corpus-sized), the ECDF window runs over that bounded table, and
    the D-statistic is one global max. Per-row ECDF differences are
    exact ratios of integers evaluated identically on both engines;
    max is order-independent, so only the final sqrt scaling needs
    float32 canonicalization.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    is_a = F.expr(KS_SLICE_SQL)  # same predicate text as the oracle
    tagged = docs.select(
        "n_chars",
        F.when(is_a, 1).otherwise(0).alias("a"),
        F.when(is_a, 0).otherwise(1).alias("b"),
    )
    tot = tagged.agg(
        F.sum("a").cast("double").alias("na"),
        F.sum("b").cast("double").alias("nb"),
    )
    pts = tagged.groupBy("n_chars").agg(
        F.sum("a").alias("ca"), F.sum("b").alias("cb")
    )
    w = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ecdf = pts.select(
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    n_points = pts.agg(F.count("*").alias("n_points"))
    d = F.max(F.abs(F.col("cum_a") / F.col("na") - F.col("cum_b") / F.col("nb")))
    return (
        ecdf.crossJoin(F.broadcast(tot))
        .groupBy("na", "nb")
        .agg(d.alias("d"))
        .crossJoin(F.broadcast(n_points))
        .select(
            F.col("na").cast("long").alias("n_a"),
            F.col("nb").cast("long").alias("n_b"),
            "n_points",
            r6("d", "ks_d"),
            r6(
                F.col("d")
                * F.sqrt(
                    F.col("na") * F.col("nb") / (F.col("na") + F.col("nb"))
                ),
                "ks_stat",
            ),
        )
    )


# ---------------------------------------------------------------------------
# Perceptual-hash (aHash) image dedup over real binary PPM decode
# ---------------------------------------------------------------------------

AHASH_GRID = 4  # G×G average-hash grid → G² hash bits


@register(
    "q_image_ahash_dedup",
    f"""
WITH img AS (
  SELECT doc_id AS media_id,
         (doc_id % 8) + 2 AS w,
         ((doc_id * 3) % 8) + 2 AS h
  FROM documents WHERE doc_id % 3 = 0
),
px AS (
  SELECT media_id, w, h,
         unnest(generate_series(0, w * h - 1)) AS p
  FROM img
),
lum AS (
  SELECT media_id,
         ((media_id*7 + (3*p)*13) % 256)
           + ((media_id*7 + (3*p + 1)*13) % 256)
           + ((media_id*7 + (3*p + 2)*13) % 256) AS luma,
         ((p // w) * {AHASH_GRID} // h) * {AHASH_GRID}
           + ((p % w) * {AHASH_GRID} // w) AS cell
  FROM px
),
cells AS (
  SELECT media_id, cell, sum(luma) AS cs, count(*) AS cc
  FROM lum GROUP BY media_id, cell
),
tots AS (
  SELECT media_id, sum(cs) AS ts, sum(cc) AS tc FROM cells GROUP BY media_id
),
hashes AS (
  SELECT c.media_id,
         sum(CASE WHEN c.cs * t.tc > t.ts * c.cc
             THEN CAST(1 AS BIGINT) << CAST(c.cell AS INT)
             ELSE 0 END) AS ahash
  FROM cells c JOIN tots t USING (media_id)
  GROUP BY c.media_id
)
SELECT CAST(ahash AS BIGINT) AS ahash,
       CAST(count(*) AS BIGINT) AS n_images,
       CAST(min(media_id) AS BIGINT) AS min_media_id
FROM hashes GROUP BY ahash
""",
    "multimodal",
    "dedup",
    "pandas-udf",
)
def q_image_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup: decode the binary P6 PPM payloads
    (Arrow-batched mapInPandas, the real parse path), average-pool the
    RGB-sum luma onto a {AHASH_GRID}×{AHASH_GRID} grid, set bit k iff
    cell k is brighter than the image mean (the classic aHash), and
    group identical hashes — the cheap near-dup blocking a multimodal
    corpus pipeline runs before pixel-level verification. Bits are
    decided by cross-multiplied INTEGER comparisons (cell_sum·n >
    total_sum·cell_count), so the hash is bit-exact on any platform;
    the oracle recomputes it from the payload generator's closed-form
    byte function, verifying the decode+pool+threshold path end to end.

    Scale: one mapInPandas pass over the media table (per-image work is
    bounded by pixel count; no Python state across rows) and ONE keyed
    agg on the 2^{AHASH_GRID}² hash space — the same scan-then-bucket
    shape as exact text dedup. Nothing pairwise, nothing quadratic.
    """
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from .extensions.multimodal import _parse_ppm, build_ppm_media

    media = build_ppm_media(load_table(spark, sf_dir, "documents"))
    G = AHASH_GRID

    def ahash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                w, h, _maxval, px = _parse_ppm(bytes(raw))
                arr = np.frombuffer(px, dtype=np.uint8).astype(np.int64)
                luma = arr.reshape(-1, 3).sum(axis=1)  # R+G+B per pixel
                p = np.arange(w * h, dtype=np.int64)
                cell = (p // w) * G // h * G + (p % w) * G // w
                cs = np.bincount(cell, weights=luma, minlength=G * G).astype(
                    np.int64
                )
                cc = np.bincount(cell, minlength=G * G).astype(np.int64)
                ts, tc = int(luma.sum()), int(w * h)
                bits = (cs * tc) > (ts * cc)
                out.append(
                    (int(mid), int((bits << np.arange(G * G)).sum()))
                )
            yield pd.DataFrame(out, columns=["media_id", "ahash"])

    hashed = media.mapInPandas(ahash, "media_id long, ahash long")
    return hashed.groupBy("ahash").agg(
        F.count("*").alias("n_images"),
        F.min("media_id").alias("min_media_id"),
    )


# ---------------------------------------------------------------------------
# Energy-contour audio fingerprint dedup over real binary WAV decode
# ---------------------------------------------------------------------------

AFP_WINDOWS = 16  # equal-split energy windows → W-1 contour bits


@register(
    "q_audio_fingerprint_dedup",
    f"""
WITH aud AS (
  SELECT doc_id AS media_id, doc_id % 200 + 50 AS n
  FROM documents WHERE doc_id % 3 = 1
),
samp AS (
  SELECT media_id, n, unnest(generate_series(0, n - 1)) AS i
  FROM aud
),
win AS (
  SELECT media_id,
         (i * {AFP_WINDOWS}) // n AS w,
         ((media_id*13 + i*7) % 65536 - 32768)
           * ((media_id*13 + i*7) % 65536 - 32768) AS e
  FROM samp
),
energy AS (
  SELECT media_id, w, sum(e) AS ew FROM win GROUP BY media_id, w
),
contour AS (
  SELECT media_id, w, ew,
         lag(ew) OVER (PARTITION BY media_id ORDER BY w) AS prev
  FROM energy
),
fps AS (
  SELECT media_id,
         sum(CASE WHEN prev IS NOT NULL AND ew > prev
             THEN CAST(1 AS BIGINT) << CAST(w - 1 AS INT)
             ELSE 0 END) AS fp
  FROM contour GROUP BY media_id
)
SELECT CAST(fp AS BIGINT) AS fp,
       CAST(count(*) AS BIGINT) AS n_clips,
       CAST(min(media_id) AS BIGINT) AS min_media_id
FROM fps GROUP BY fp
""",
    "multimodal",
    "dedup",
    "pandas-udf",
)
def q_audio_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-contour audio fingerprint dedup: decode the binary RIFF/
    WAV payloads with the stdlib ``wave`` parser inside Arrow-batched
    mapInPandas, split each clip into {AFP_WINDOWS} equal windows, and
    set contour bit w iff window w carries more energy than window w−1
    (the shape of a Chromaprint-style fingerprint, reduced to the
    energy envelope); identical fingerprints bucket together — the
    blocking step before sample-level audio dedup. Energies are INTEGER
    sums of squared 16-bit samples, so every bit is platform-exact, and
    the oracle recomputes the fingerprint from the sample generator's
    closed form — verifying the parse+window+contour path end to end.

    Scale: one mapInPandas decode pass (per-clip work bounded by sample
    count, no cross-row state) and ONE keyed agg on the 2^{AFP_WINDOWS}
    fingerprint space. Same scan-then-bucket shape as exact text dedup;
    nothing pairwise.
    """
    import io
    import wave
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from .extensions.multimodal import build_wav_media

    media = build_wav_media(load_table(spark, sf_dir, "documents"))
    W = AFP_WINDOWS

    def fingerprint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(raw))) as w:
                    if w.getsampwidth() != 2:
                        raise ValueError("expected 16-bit PCM")
                    n = w.getnframes()
                    pcm = np.frombuffer(
                        w.readframes(n), dtype="<i2"
                    ).astype(np.int64)
                win = np.arange(n, dtype=np.int64) * W // n
                energy = np.bincount(win, weights=pcm * pcm, minlength=W).astype(
                    np.int64
                )
                rising = energy[1:] > energy[:-1]
                fp = int((rising << np.arange(W - 1)).sum())
                out.append((int(mid), fp))
            yield pd.DataFrame(out, columns=["media_id", "fp"])

    fps = media.mapInPandas(fingerprint, "media_id long, fp long")
    return fps.groupBy("fp").agg(
        F.count("*").alias("n_clips"),
        F.min("media_id").alias("min_media_id"),
    )


# ---------------------------------------------------------------------------
# Product-quantization encode over the embeddings table
# ---------------------------------------------------------------------------

PQ_SUBS = 8  # subvectors per embedding
PQ_SUBDIM = 8  # dims per subvector (PQ_SUBS * PQ_SUBDIM = 64)
PQ_K = 4  # codebook entries per subspace

_PQ_D2 = (
    "list_reduce(list_transform(generate_series(1, {d}), "
    "i -> (CAST(e.v[g.s*{d} + i] AS DOUBLE) - CAST(c.c[g.s*{d} + i] AS DOUBLE))"
    " * (CAST(e.v[g.s*{d} + i] AS DOUBLE) - CAST(c.c[g.s*{d} + i] AS DOUBLE))), "
    "(acc, x) -> acc + x)"
).format(d=PQ_SUBDIM)


@register(
    "q_pq_encode",
    f"""
WITH emb AS (SELECT vec_id, embedding AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, embedding AS c FROM embeddings
         WHERE vec_id < {PQ_K}),
scored AS (
  SELECT e.vec_id, g.s, c.cid, CAST({_PQ_D2} AS REAL) AS d2
  FROM emb e
  CROSS JOIN generate_series(0, {PQ_SUBS - 1}) AS g(s)
  CROSS JOIN cent c
),
best AS (
  SELECT vec_id, s, cid, d2,
         row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cid) AS rn
  FROM scored
)
SELECT vec_id,
       CAST(sum(CAST(cid AS BIGINT) << CAST(2 * s AS INT)) AS BIGINT)
         AS code,
       CAST(sum(CAST(d2 AS DOUBLE)) AS REAL) AS err
FROM best WHERE rn = 1 GROUP BY vec_id
""",
    "ml",
    "ann",
)
def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encode: split each 64-dim embedding into
    {PQ_SUBS} subvectors of {PQ_SUBDIM} dims, assign each subvector to
    its nearest codebook entry (codebook = the matching subvector
    slices of the first {PQ_K} embeddings — encode-only; codebook
    TRAINING is the per-subspace Lloyd iteration q_kmeans already
    demonstrates), and pack the {PQ_SUBS} two-bit codes into one
    BIGINT alongside the total quantization error. This is the encode
    stage of IVF-PQ, the memory-bound half of large-scale ANN: 64
    float32 dims compress to {PQ_SUBS * 2} bits per vector.

    Oracle-exact via the q_kmeans contract: per-subspace distances are
    identical-order sequential folds, argmin pinned by the
    (float32(d2), cid) tie-break; the packed code is integer-exact and
    the error float32-canonicalized.

    Scale: the codebook is K×S subvector slices (kilobytes) folded into
    one broadcast row; encoding is a single corpus scan with per-row
    array arithmetic — no shuffle, no K×S×n row materialization (the
    scored rows live only inside the per-row array transform).
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = emb.where(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("c")
    )
    cents = cent.agg(F.collect_list(F.struct("cid", "c")).alias("cents"))

    def sub_d2(v, c, s):
        # d2 over subvector s: fold dims s*SUBDIM+1 .. s*SUBDIM+SUBDIM in
        # order (same sequential fold as the oracle's list_reduce).
        return F.aggregate(
            F.zip_with(
                F.slice(v, s * PQ_SUBDIM + 1, PQ_SUBDIM),
                F.slice(c, s * PQ_SUBDIM + 1, PQ_SUBDIM),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    # Per row: for each subspace, argmin over the broadcast codebook via
    # array_min over (float32(d2), cid) structs — the kmeans assignment
    # pattern, once per subvector.
    bests = F.transform(
        F.sequence(F.lit(0), F.lit(PQ_SUBS - 1)),
        lambda s: F.array_min(
            F.transform(
                F.col("cents"),
                lambda ct: F.struct(
                    sub_d2(F.col("v"), ct["c"], s).cast("float").alias("d2"),
                    ct["cid"].alias("cid"),
                ),
            )
        ),
    )
    picked = (
        emb.crossJoin(F.broadcast(cents))
        .select("vec_id", bests.alias("b"))
    )
    code = F.aggregate(
        F.zip_with(
            F.col("b"),
            F.sequence(F.lit(0), F.lit(PQ_SUBS - 1)),
            # cid << 2s, spelled as cid·4^s (shiftleft needs a literal
            # bit count; 4^s is exact in double far beyond S=8)
            lambda b, s: b["cid"].cast("long")
            * F.pow(F.lit(4.0), s.cast("double")).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    err = F.aggregate(
        F.transform(F.col("b"), lambda b: b["d2"].cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return picked.select(
        "vec_id", code.alias("code"), err.cast("float").alias("err")
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion of lexical (BM25) and vector (cosine) retrieval
# ---------------------------------------------------------------------------

RRF_K = 60  # standard RRF dampening constant
RRF_TOPN = 50  # per-list depth entering the fusion

_RRF_DOT = (
    "list_reduce(list_transform(generate_series(1, 64), "
    "i -> CAST(e.v[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)), "
    "(acc, x) -> acc + x)"
)
_RRF_NORM = (
    "sqrt(list_reduce(list_transform(generate_series(1, 64), "
    "i -> CAST({c}[i] AS DOUBLE) * CAST({c}[i] AS DOUBLE)), "
    "(acc, x) -> acc + x))"
)


@register(
    "q_rrf_fusion",
    rf"""
WITH docs_len AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS dl,
         string_split_regex(trim(text), '\s+') AS w
  FROM documents
),
stats AS (
  SELECT avg(dl) AS avgdl, CAST(count(*) AS DOUBLE) AS n FROM docs_len
),
tf AS (
  SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
  FROM (SELECT doc_id, unnest(w) AS tok FROM docs_len)
  WHERE tok IN ({_BM25_TERMS_SQL_R6})
  GROUP BY doc_id, tok
),
dfreq AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
bm25 AS (
  SELECT tf.doc_id,
         CAST(sum(
           ln(1 + (n - df + 0.5) / (df + 0.5))
           * tf * ({{k1}} + 1)
           / (tf + {{k1}} * (1 - {{b}} + {{b}} * dl / avgdl))
         ) AS REAL) AS s
  FROM tf JOIN dfreq USING (tok) JOIN docs_len USING (doc_id)
  CROSS JOIN stats GROUP BY tf.doc_id
),
lex AS (
  SELECT doc_id AS id,
         row_number() OVER (ORDER BY s DESC, doc_id) AS r
  FROM bm25 QUALIFY r <= {RRF_TOPN}
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
cos AS (
  SELECT e.vec_id AS id,
         CAST({_RRF_DOT}
              / ({_RRF_NORM.format(c='e.v')} * {_RRF_NORM.format(c='q.qv')})
              AS REAL) AS s
  FROM (SELECT vec_id, embedding AS v FROM embeddings) e CROSS JOIN q
),
vec AS (
  SELECT id, row_number() OVER (ORDER BY s DESC, id) AS r
  FROM cos QUALIFY r <= {RRF_TOPN}
),
fused AS (
  SELECT coalesce(lex.id, vec.id) AS id,
         lex.r AS lex_rank, vec.r AS vec_rank,
         coalesce(1.0 / ({RRF_K} + lex.r), 0)
           + coalesce(1.0 / ({RRF_K} + vec.r), 0) AS rrf
  FROM lex FULL OUTER JOIN vec ON lex.id = vec.id
)
SELECT CAST(id AS BIGINT) AS id,
       CAST(lex_rank AS BIGINT) AS lex_rank,
       CAST(vec_rank AS BIGINT) AS vec_rank,
       CAST(rrf AS REAL) AS rrf
FROM fused
""".replace("{k1}", "1.2").replace("{b}", "0.75"),
    "llm",
    "retrieval",
)
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval fusion: BM25 ranks documents against the fixed
    lexical query, cosine similarity ranks embeddings against a fixed
    query vector, and reciprocal-rank fusion (1/(k+rank) summed across
    lists, Cormack et al.'s k=60) merges the two top-{RRF_TOPN} lists —
    the standard hybrid-search merge of a RAG / curation stack.

    Cross-engine rank stability: both scores are float32-collapsed
    BEFORE ranking and tie-broken by id (the kmeans argmin contract
    applied to ordering), and both sides' dot products/norms are
    identical-order sequential folds — so the integer ranks, not just
    the scores, are oracle-exact.

    Scale: the BM25 side is the q_bm25 plan (term filter before the tf
    shuffle, broadcast df/stats); the vector side is one corpus scan
    against a broadcast query vector; ranking happens on the two
    TOP-{RRF_TOPN} lists via TakeOrdered-style windows over
    score-filtered tables, and the fusion join is {RRF_TOPN}×2 rows.
    """
    from pyspark.sql import Window

    # --- lexical list: reuse the registered BM25 builder ---------------
    bm25 = REGISTRY["q_bm25"].fn(spark, sf_dir)
    lex = (
        bm25.select(
            F.col("doc_id").alias("id"),
            F.row_number()
            .over(Window.orderBy(F.col("bm25").desc(), "doc_id"))
            .alias("r"),
        )
        .where(F.col("r") <= RRF_TOPN)
    )
    # --- vector list: cosine vs the fixed query embedding --------------
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qv = emb.where(F.col("vec_id") == 0).select(F.col("v").alias("qv"))

    # Shared sequential fold (see extensions/similarity.py; the unrolled
    # expression-chain variant was measured and rejected — interpreted
    # deep trees behind BroadcastNestedLoopJoin lose to the fold's loop).
    from .extensions.similarity import _dot as fold_dot

    cos = (
        emb.crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("id"),
            (
                fold_dot(F.col("v"), F.col("qv"))
                / (
                    F.sqrt(fold_dot(F.col("v"), F.col("v")))
                    * F.sqrt(fold_dot(F.col("qv"), F.col("qv")))
                )
            )
            .cast("float")
            .alias("s"),
        )
    )
    vec = (
        cos.select(
            "id",
            F.row_number()
            .over(Window.orderBy(F.col("s").desc(), "id"))
            .alias("r"),
        )
        .where(F.col("r") <= RRF_TOPN)
    )
    fused = lex.withColumnRenamed("r", "lex_rank").join(
        vec.withColumnRenamed("r", "vec_rank"), "id", "full_outer"
    )
    rrf = F.coalesce(
        F.lit(1.0) / (RRF_K + F.col("lex_rank")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (RRF_K + F.col("vec_rank")), F.lit(0.0))
    return fused.select(
        "id",
        F.col("lex_rank").cast("long").alias("lex_rank"),
        F.col("vec_rank").cast("long").alias("vec_rank"),
        rrf.cast("float").alias("rrf"),
    )


# ---------------------------------------------------------------------------
# Dedup-pipeline evaluation: MinHash-LSH vs exact-Jaccard ground truth
# ---------------------------------------------------------------------------


def _dedup_eval_sql() -> str:
    # Compose the two registered oracles as nested-WITH sub-CTEs: the
    # eval must measure the SAME pair sets the production queries emit.
    truth_sql = REGISTRY["q_dedup_ngram_jaccard"].sql
    lsh_sql = REGISTRY["q_dedup_minhash_lsh"].sql
    return f"""
WITH truth AS ({truth_sql}),
lsh AS ({lsh_sql}),
m AS (
  SELECT coalesce(t.id_a, l.id_a) AS id_a,
         coalesce(t.id_b, l.id_b) AS id_b,
         CASE WHEN t.id_a IS NOT NULL THEN 1 ELSE 0 END AS in_t,
         CASE WHEN l.id_a IS NOT NULL THEN 1 ELSE 0 END AS in_l
  FROM truth t FULL OUTER JOIN lsh l
    ON t.id_a = l.id_a AND t.id_b = l.id_b
)
SELECT CAST(sum(in_t) AS BIGINT) AS n_truth,
       CAST(sum(in_l) AS BIGINT) AS n_lsh,
       CAST(sum(in_t * in_l) AS BIGINT) AS n_common,
       CAST(CAST(sum(in_t * in_l) AS DOUBLE)
            / greatest(sum(in_t), 1) AS REAL) AS recall,
       CAST(CAST(sum(in_t * in_l) AS DOUBLE)
            / greatest(sum(in_l), 1) AS REAL) AS precision
FROM m
"""


@register("q_dedup_lsh_eval", _dedup_eval_sql(), "llm", "dedup", "eval")
def q_dedup_lsh_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-pipeline quality evaluation: compare the MinHash-LSH
    near-dup pair set against the exact df-capped-Jaccard pair set and
    report recall/precision — the audit a pipeline owner runs before
    trusting the sub-quadratic path over the exact one (the two differ
    by banding misses AND by the df-cap's gram-universe difference, so
    neither is a subset of the other; this query quantifies exactly
    that gap). Composes the two REGISTERED queries — the eval measures
    the very pair sets production emits, not a re-derivation.

    Scale: both inputs are the already-bounded dedup plans (banded
    bucket join / df-capped posting join); the eval adds one
    pair-keyed full-outer join and a global count — pair sets are
    orders of magnitude smaller than the corpus.
    """
    truth = (
        REGISTRY["q_dedup_ngram_jaccard"]
        .fn(spark, sf_dir)
        .select("id_a", "id_b", F.lit(1).alias("in_t"))
    )
    lsh = (
        REGISTRY["q_dedup_minhash_lsh"]
        .fn(spark, sf_dir)
        .select("id_a", "id_b", F.lit(1).alias("in_l"))
    )
    m = truth.join(lsh, ["id_a", "id_b"], "full_outer").select(
        F.coalesce(F.col("in_t"), F.lit(0)).alias("in_t"),
        F.coalesce(F.col("in_l"), F.lit(0)).alias("in_l"),
    )
    common = F.sum(F.col("in_t") * F.col("in_l"))
    return m.agg(
        F.sum("in_t").cast("long").alias("n_truth"),
        F.sum("in_l").cast("long").alias("n_lsh"),
        common.cast("long").alias("n_common"),
        (common.cast("double") / F.greatest(F.sum("in_t"), F.lit(1)))
        .cast("float")
        .alias("recall"),
        (common.cast("double") / F.greatest(F.sum("in_l"), F.lit(1)))
        .cast("float")
        .alias("precision"),
    )


# ---------------------------------------------------------------------------
# ANN recall evaluation: LSH / IVF top-k vs brute-force ground truth
# ---------------------------------------------------------------------------


def _ann_recall_sql() -> str:
    truth_sql = REGISTRY["q_ann_cosine_topk"].sql
    ivf_sql = REGISTRY["q_ann_ivf_topk"].sql
    lsh_sql = REGISTRY["q_ann_lsh_topk"].sql
    return f"""
WITH truth AS ({truth_sql}),
ivf AS ({ivf_sql}),
lsh AS ({lsh_sql}),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
hits AS (
  SELECT 'ivf' AS method, CAST(count(*) AS BIGINT) AS n_hit
  FROM truth t JOIN ivf a ON t.q_id = a.q_id AND t.vec_id = a.vec_id
  UNION ALL
  SELECT 'lsh' AS method, CAST(count(*) AS BIGINT) AS n_hit
  FROM truth t JOIN lsh a ON t.q_id = a.q_id AND t.vec_id = a.vec_id
)
SELECT method, tot.n_truth, n_hit,
       CAST(CAST(n_hit AS DOUBLE) / greatest(tot.n_truth, 1) AS REAL)
         AS recall_at_k
FROM hits CROSS JOIN tot
"""


@register("q_ann_recall_eval", _ann_recall_sql(), "llm", "ann", "eval")
def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index-quality evaluation: recall@k of the two approximate
    paths (hyperplane-LSH and IVF) against the brute-force cosine
    top-k ground truth — THE standard ANN metric, computed over the
    very result sets the registered queries emit (same composition
    discipline as q_dedup_lsh_eval).

    Scale: ground truth is the query-set-bounded brute-force scan the
    baseline already pays; the evaluation itself is two joins on
    (q_id, vec_id) over top-k-sized lists (n_queries × k rows) — the
    eval cost is microscopic next to the retrieval it audits.
    """
    truth = REGISTRY["q_ann_cosine_topk"].fn(spark, sf_dir).select(
        "q_id", "vec_id"
    )
    tot = truth.agg(F.count("*").cast("long").alias("n_truth"))
    parts = []
    for method, qname in (("ivf", "q_ann_ivf_topk"), ("lsh", "q_ann_lsh_topk")):
        approx = REGISTRY[qname].fn(spark, sf_dir).select("q_id", "vec_id")
        parts.append(
            truth.join(approx, ["q_id", "vec_id"])
            .agg(F.count("*").cast("long").alias("n_hit"))
            .select(F.lit(method).alias("method"), "n_hit")
        )
    hits = parts[0].unionAll(parts[1])
    return hits.crossJoin(F.broadcast(tot)).select(
        "method",
        "n_truth",
        "n_hit",
        (F.col("n_hit").cast("double") / F.greatest(F.col("n_truth"), F.lit(1)))
        .cast("float")
        .alias("recall_at_k"),
    )
