"""Round-6 additions: four training-data-pipeline operators the earlier
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
  evaluation twin of q_kmeans' assign step.

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
from .registry import _sql_z, r6, r6z, register
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
