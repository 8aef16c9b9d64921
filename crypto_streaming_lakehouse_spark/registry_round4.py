"""Round-4 additions: the standard pretraining-data filters the corpus
surface did not yet cover — Gopher-style rule-based quality gate and
top-n-gram repetition mass (Rae et al. 2021, §A1.1 heuristics),
CCNet-style perplexity bucketing (Wenzek et al. 2020), and an
embedding-space outlier filter (distance-to-centroid z-score).

Registry conventions as everywhere: (Spark builder, DuckDB oracle)
pairs generated from the same constants; float outputs are
float32-canonicalized; tie-breaks deterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import r6, register
from .sources.tables import load_table

# Gopher-rule bounds (Rae et al. 2021, adapted to the whitespace
# tokenization both engines share).
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3.0
GOPHER_MAX_MEAN_LEN = 10.0
GOPHER_MIN_ALPHA_FRAC = 0.80
GOPHER_STOPWORDS = ("the", "a", "of", "to", "and", "in")
GOPHER_MIN_STOP_HITS = 2

_STOP_SQL = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)


@register(
    "q_gopher_quality",
    rf"""
SELECT doc_id, n_words,
       CAST(mean_word_len_raw AS REAL) AS mean_word_len,
       CAST(alpha_frac_raw AS REAL) AS alpha_frac,
       stop_hits,
       (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
        AND mean_word_len_raw
            BETWEEN {GOPHER_MIN_MEAN_LEN} AND {GOPHER_MAX_MEAN_LEN}
        AND alpha_frac_raw >= {GOPHER_MIN_ALPHA_FRAC}
        AND stop_hits >= {GOPHER_MIN_STOP_HITS}) AS passes
FROM (
  SELECT doc_id,
         CAST(len(wrds) AS BIGINT) AS n_words,
         CASE WHEN len(wrds) > 0 THEN
           list_reduce(list_transform(wrds, w -> CAST(len(w) AS DOUBLE)),
                       (x, y) -> x + y) / len(wrds) END
           AS mean_word_len_raw,
         CASE WHEN len(wrds) > 0 THEN
           CAST(len(list_filter(wrds,
                w -> regexp_full_match(w, '[A-Za-z]+'))) AS DOUBLE)
             / len(wrds) END AS alpha_frac_raw,
         CAST(len(list_filter([{_STOP_SQL}],
              s -> list_contains(wrds, s))) AS BIGINT) AS stop_hits
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS wrds
        FROM documents)
)
""",
    "quality",
    "gopher",
)
def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality gate: word count bounds, mean word
    length window, alphabetic-word fraction, and minimum stopword
    diversity, plus the conjunction as a ``passes`` flag. This is the
    cheap first-pass filter a pretraining pipeline runs BEFORE any
    model-based scoring — at 100 TB it matters that it is a zero-shuffle
    scan+project (all four signals are per-row array folds that fuse
    into the parquet scan; nothing leaves the row).

    Metric floats are float32-canonicalized for the hash compare; the
    pass flag is computed from the PRE-CAST raw doubles on both engines
    (the oracle derives ``passes`` from the double-typed subquery
    columns, not the REAL-cast outputs — ADVICE r04), so the decision
    logic is genuinely equivalent, not just equal on current data."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), r"\s+")
    n_words = F.size(w)
    sum_len = F.aggregate(
        F.transform(w, lambda x: F.length(x).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    mean_len = F.when(n_words > 0, sum_len / n_words)
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(w, lambda x: x.rlike(r"^[A-Za-z]+$"))).cast("double")
        / n_words,
    )
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(w, s),
        )
    ).cast("long")
    passes = (
        n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & mean_len.between(GOPHER_MIN_MEAN_LEN, GOPHER_MAX_MEAN_LEN)
        & (alpha_frac >= GOPHER_MIN_ALPHA_FRAC)
        & (stop_hits >= GOPHER_MIN_STOP_HITS)
    )
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        r6(mean_len, "mean_word_len"),
        r6(alpha_frac, "alpha_frac"),
        stop_hits.alias("stop_hits"),
        passes.alias("passes"),
    )


@register(
    "q_top_bigram_fraction",
    r"""
SELECT doc_id, top_bigram, CAST(cnt AS BIGINT) AS cnt,
       CAST(cnt * len(top_bigram) AS DOUBLE) / n_chars AS _raw_frac,
       CAST(CAST(cnt * len(top_bigram) AS DOUBLE) / n_chars AS REAL)
         AS char_frac
FROM (
  SELECT doc_id, gram AS top_bigram, cnt, n_chars,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY cnt DESC, gram) AS rn
  FROM (
    SELECT doc_id, gram, count(*) AS cnt, any_value(n_chars) AS n_chars
    FROM (
      SELECT doc_id, len(text) AS n_chars,
             unnest(list_transform(generate_series(1, len(wrds) - 1),
                    i -> wrds[i] || ' ' || wrds[i+1])) AS gram
      FROM (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS wrds
            FROM documents)
      WHERE len(wrds) >= 2
    ) GROUP BY doc_id, gram
  )
) WHERE rn = 1
""",
    "quality",
    "gopher",
)
def q_top_bigram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition signal: the fraction of the document's
    characters covered by occurrences of its MOST FREQUENT word bigram
    (count × bigram length / text length). Templated or degenerate docs
    score high while q_repetition_ratio stays low when the repetition is
    one dominant phrase rather than broad gram reuse — the two signals
    are complementary and both are standard Gopher cuts.

    Plan: positional (non-distinct) bigrams explode to a (doc, gram)
    count shuffle, then ONE per-doc window picks the argmax with a
    deterministic (count desc, gram asc) tie-break that both engines
    apply identically. Per-doc state is bounded by that doc's distinct
    bigrams — no skew key, since doc_id rides every gram row.

    The raw double fraction is emitted alongside the float32 canon so
    the oracle pins full precision where the engines agree bit-for-bit
    (pure integer ratios)."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), r"\s+")
    n_out = F.greatest(F.size(w) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(w, 1, n_out),
        F.slice(w, 2, n_out),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    g = (
        docs.where(F.size(w) >= 2)
        .select(
            "doc_id",
            F.length("text").alias("n_chars"),
            F.explode(bigrams).alias("gram"),
        )
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"), F.any_value("n_chars").alias("n_chars"))
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("cnt").desc(), "gram")
    )
    frac = F.col("cnt") * F.length("gram") / F.col("n_chars")
    return (
        g.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("gram").alias("top_bigram"),
            F.col("cnt").cast("long").alias("cnt"),
            frac.alias("_raw_frac"),
            r6(frac, "char_frac"),
        )
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing (head / middle / tail)
# ---------------------------------------------------------------------------


@register(
    "q_ccnet_buckets",
    r"""
WITH tk AS (
  SELECT doc_id, t FROM (
    SELECT doc_id,
           unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
    FROM documents
  ) WHERE t <> ''
),
vocab AS (SELECT t, count(*) AS cnt FROM tk GROUP BY t),
tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM vocab),
nll AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tok,
         CAST(sum(-ln(CAST(cnt AS DOUBLE) / (SELECT n FROM tot))) / count(*)
              AS REAL) AS avg_nll
  FROM tk JOIN vocab USING (t)
  GROUP BY doc_id
),
th AS (
  SELECT CAST(quantile_cont(CAST(avg_nll AS DOUBLE), 1.0/3) AS REAL) AS t1,
         CAST(quantile_cont(CAST(avg_nll AS DOUBLE), 2.0/3) AS REAL) AS t2
  FROM nll
)
SELECT doc_id, n_tok, avg_nll,
       CASE WHEN avg_nll <= t1 THEN 'head'
            WHEN avg_nll <= t2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM nll CROSS JOIN th
""",
    "quality",
    "ccnet",
)
def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality bucketing: every document is assigned to the
    head / middle / tail TERCILE of the corpus unigram-LM cross-entropy
    distribution (Wenzek et al. 2020 — CCNet buckets by LM perplexity
    and trains on the head). Reuses q_doc_cross_entropy's LM exactly,
    then one 1-row tercile aggregate is broadcast back onto the docs.

    Determinism across engines: the per-doc NLL is float32-canonicalized
    FIRST, and the tercile thresholds are computed FROM those float32
    values (then float32'd themselves) — both engines interpolate
    identical inputs, so the <= bucket decisions cannot straddle a
    summation-order ulp.

    Scale: the LM join is the same vocabulary-sized shuffle as
    q_doc_cross_entropy; bucketing adds one single-pass percentile
    aggregate (exact here for oracle parity — at 100 TB swap in
    percentile_approx, the documented sketch path, since exact global
    percentile must gather all values) and a scalar broadcast. No
    global sort, no per-doc state beyond the aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("t"),
    ).where(F.col("t") != "")
    vocab = tk.groupBy("t").agg(F.count("*").alias("cnt"))
    tot = vocab.agg(F.sum("cnt").cast("double").alias("n"))
    nll = (
        tk.join(vocab, "t")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            r6(
                F.sum(-F.log(F.col("cnt").cast("double") / F.col("n")))
                / F.count("*"),
                "avg_nll",
            ),
        )
    )
    p = F.percentile(F.col("avg_nll").cast("double"), F.lit([1.0 / 3, 2.0 / 3]))
    th = nll.agg(
        F.element_at(p, 1).cast("float").alias("t1"),
        F.element_at(p, 2).cast("float").alias("t2"),
    )
    return nll.crossJoin(F.broadcast(th)).select(
        "doc_id",
        "n_tok",
        "avg_nll",
        F.when(F.col("avg_nll") <= F.col("t1"), "head")
        .when(F.col("avg_nll") <= F.col("t2"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


# ---------------------------------------------------------------------------
# Embedding-space outlier filter (distance-to-centroid z-score)
# ---------------------------------------------------------------------------

EMB_DIM = 64  # fixture embedding dimensionality (constant; see FIXTURES.md)
OUTLIER_Z = 2.0


@register(
    "q_embedding_outliers",
    f"""
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
cpos AS (
  SELECT label, i, CAST(avg(v[i]) AS REAL) AS c
  FROM e, unnest(generate_series(1, {EMB_DIM})) AS t(i)
  GROUP BY label, i
),
cent AS (
  SELECT label, list(CAST(c AS DOUBLE) ORDER BY i) AS c FROM cpos GROUP BY label
),
d AS (
  SELECT vec_id, e.label,
         sqrt(list_reduce(
           list_transform(generate_series(1, {EMB_DIM}),
                          i -> (v[i] - c[i]) * (v[i] - c[i])),
           (x, y) -> x + y)) AS dist
  FROM e JOIN cent ON e.label = cent.label
),
z AS (
  SELECT vec_id, label, dist,
         avg(dist) OVER (PARTITION BY label) AS mu,
         stddev_samp(dist) OVER (PARTITION BY label) AS sd
  FROM d
),
zz AS (
  SELECT vec_id, label, CAST(dist AS REAL) AS dist,
         CAST(CASE WHEN sd IS NOT NULL AND sd > 0 THEN
           CASE WHEN abs((dist - mu) / sd) < 1e-6 THEN 0
                ELSE (dist - mu) / sd END
         END AS REAL) AS z
  FROM z
)
SELECT vec_id, label, dist, z, (z > {OUTLIER_Z}) AS is_outlier FROM zz
""",
    "vector",
    "quality",
)
def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier filter: each vector's Euclidean distance to
    its label centroid, z-scored within the label, flagged when z > 2 —
    the standard curation pass for dropping mislabeled / off-distribution
    points before contrastive training (and the quality-filter sibling of
    SemDeDup's cluster step, which drops the points that are too CLOSE).

    Engine determinism is layered: centroids are float32-canonicalized
    BEFORE the distance fold, so both engines fold bit-identical inputs
    in the same left-to-right order; the z-score (whose mean/std DO
    differ in summation order) is float32+zero-snapped, and the flag is
    computed from that canonicalized z — same decision on both engines.

    Plan: one (label, pos) centroid shuffle (key space = labels × dims,
    corpus-independent), centroid arrays broadcast back (labels-sized),
    one label-partitioned window for the moments. Vectors shuffle once
    for the window; at scale swap the window for a labels-sized moment
    aggregate + broadcast join — same two-pass shape k-means uses."""
    from .registry import r6z

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = (
        e.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").cast("float").cast("double").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "c"))),
                lambda s: s.getField("c"),
            ).alias("c")
        )
    )
    d = e.join(F.broadcast(cent), "label").select(
        "vec_id",
        "label",
        F.sqrt(
            F.aggregate(
                F.zip_with("v", "c", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("dist"),
    )
    w = Window.partitionBy("label")
    mu, sd = F.avg("dist").over(w), F.stddev_samp("dist").over(w)
    zz = d.select(
        "vec_id",
        "label",
        F.col("dist").cast("float").alias("dist32"),
        r6z(
            F.when(sd.isNotNull() & (sd > 0), (F.col("dist") - mu) / sd), "z"
        ),
    ).select(
        "vec_id",
        "label",
        F.col("dist32").alias("dist"),
        "z",
        (F.col("z") > OUTLIER_Z).alias("is_outlier"),
    )
    return zz
