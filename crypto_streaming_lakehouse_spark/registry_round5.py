"""Round-5 additions: bloom-filter membership pruning and URL
canonicalization — two corpus-pipeline operators the earlier registries
did not cover.

Registry conventions as everywhere: each query is a (Spark builder,
DuckDB oracle) pair registered via ``@register(name, sql, *tags)``;
hashing is md5-derived (functions.hashing) so the oracle computes
bit-identical values, and every output column is integer/bool/string
exact — no float canonicalization needed in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extensions.dedup import MAX_GRAM_DF as _MAX_GRAM_DF
from .functions.hashing import MINHASH_P, affine_family, md5_int32, md5_int32_sql
from .registry import register
from .sources.tables import load_table

# ---------------------------------------------------------------------------
# Bloom-filter membership (runtime-filter pruning, made portable)
# ---------------------------------------------------------------------------

BLOOM_M = 16_384  # filter bits
BLOOM_K = 4  # hash probes per element
_BLOOM_FAM = affine_family(BLOOM_K)
#: 63-bit words keep ``1::BIGINT << bit`` positive on both engines
#: (a 64-bit word would need bit 63, which flips the sign of a signed
#: BIGINT and diverges between engines' shift semantics).
BLOOM_WORD = 63

_BLOOM_FAM_SQL = "fam(a, b) AS (VALUES " + ", ".join(
    f"({a}, {b})" for a, b in _BLOOM_FAM
) + ")"


@register(
    "q_bloom_membership",
    f"""
WITH {_BLOOM_FAM_SQL},
pos AS (
  SELECT DISTINCT
         (((a * {md5_int32_sql('text')} + b) % {MINHASH_P}) % {BLOOM_M})
           // {BLOOM_WORD} AS w,
         CAST(1 AS BIGINT) << CAST(
           (((a * {md5_int32_sql('text')} + b) % {MINHASH_P}) % {BLOOM_M})
             % {BLOOM_WORD} AS INT) AS bit
  FROM documents, fam WHERE doc_id % 10 = 0
),
bloom AS (SELECT w, bit_or(bit) AS bits FROM pos GROUP BY w),
probe AS (
  SELECT d.doc_id, a, b,
         (((a * {md5_int32_sql('text')} + b) % {MINHASH_P}) % {BLOOM_M})
           // {BLOOM_WORD} AS w,
         CAST(1 AS BIGINT) << CAST(
           (((a * {md5_int32_sql('text')} + b) % {MINHASH_P}) % {BLOOM_M})
             % {BLOOM_WORD} AS INT) AS bit
  FROM documents d, fam
),
hits AS (
  SELECT doc_id,
         count(*) FILTER (WHERE (bloom.bits & probe.bit) != 0)
           = {BLOOM_K} AS bloom_hit
  FROM probe LEFT JOIN bloom USING (w)
  GROUP BY doc_id
),
member AS (
  SELECT d.doc_id,
         d.text IN (SELECT text FROM documents WHERE doc_id % 10 = 0)
           AS is_member
  FROM documents d
)
SELECT h.doc_id, h.bloom_hit, m.is_member
FROM hits h JOIN member m ON h.doc_id = m.doc_id
""",
    "llm",
    "bloom",
    "filter",
)
def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership pruning: build a {BLOOM_M}-bit, {BLOOM_K}-hash
    bloom filter over the benchmark partition's texts (doc_id % 10 == 0 —
    the same split q_decontaminate uses) and probe EVERY document against
    it. Output per doc: the bloom verdict and exact membership — the
    bloom guarantee (no false negatives) is checkable row-by-row, and
    the measured false-positive rows are deterministic given the fixed
    hash family.

    This is the portable spelling of Spark's runtime bloom-filter join
    pruning (spark.sql.optimizer.runtime.bloomFilter.*): at 100 TB the
    filter is ~{BLOOM_M // BLOOM_WORD + 1} longs built in one aggregation
    over the SMALL side and broadcast to every probe task, so the big
    side is pruned scan-side without any shuffle — the same dataflow as
    here, where the word table is a broadcast join. Hashes are the md5
    affine family, so the DuckDB oracle reproduces the filter
    bit-for-bit.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = md5_int32(F.col("text"))
    fam = _BLOOM_FAM

    def positions(df: DataFrame) -> DataFrame:
        pos_cols = F.array(
            *[
                ((F.lit(a) * h + F.lit(b)) % MINHASH_P % BLOOM_M).alias(
                    f"p{i}"
                )
                for i, (a, b) in enumerate(fam)
            ]
        )
        return df.select("doc_id", F.explode(pos_cols).alias("pos")).select(
            "doc_id",
            (F.col("pos") / BLOOM_WORD).cast("long").alias("w"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {BLOOM_WORD} AS INT))"
            ).alias("bit"),
        )

    bench = docs.where(F.col("doc_id") % 10 == 0)
    bloom = (
        positions(bench)
        .select("w", "bit")
        .distinct()
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
    )
    probe = positions(docs)
    hits = (
        probe.join(F.broadcast(bloom), "w", "left")
        .groupBy("doc_id")
        .agg(
            (
                F.count(
                    F.when(
                        F.col("bits").bitwiseAND(F.col("bit")) != 0, F.lit(1)
                    )
                )
                == BLOOM_K
            ).alias("bloom_hit")
        )
    )
    member = docs.join(
        bench.select("text").distinct(), "text", "left_semi"
    ).select("doc_id", F.lit(True).alias("is_member"))
    return (
        hits.join(member, "doc_id", "left")
        .select(
            "doc_id",
            "bloom_hit",
            F.coalesce(F.col("is_member"), F.lit(False)).alias("is_member"),
        )
    )


# ---------------------------------------------------------------------------
# URL canonicalization (crawl-dedup normalization)
# ---------------------------------------------------------------------------

#: Deterministic synthetic raw URL per event row: three surface variants
#: (case, default port, tracking params, trailing slash) that all
#: canonicalize to the same URL per (event_type, user_id % 50) — the
#: fixture tables carry no URL column, so the query manufactures the
#: crawl-log shape from events the same way the range-join queries
#: manufacture intervals.
_RAW_URL_SQL = """
raw AS (
  SELECT event_id,
         CASE CAST(event_id % 3 AS INT)
           WHEN 0 THEN 'https://Example.COM:443/t/' || event_type
                || '?utm_source=feed&id=' || CAST(user_id % 50 AS VARCHAR)
           WHEN 1 THEN 'HTTPS://example.com/t/' || event_type
                || '/?id=' || CAST(user_id % 50 AS VARCHAR) || '&ref=abc'
           ELSE 'https://example.com/t/' || event_type
                || '?id=' || CAST(user_id % 50 AS VARCHAR)
         END AS url
  FROM events
)
"""


@register(
    "q_url_normalize",
    "WITH "
    + _RAW_URL_SQL
    + """
, canon AS (
  SELECT event_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(lower(url), ':443/', '/'),
               '(utm_[a-z]+|ref)=[^&]*&?', '', 'g'),
             '[?&]$', ''),
           '/\\?', '?') AS c0
  FROM raw
),
c2 AS (
  SELECT event_id,
         CASE WHEN c0 LIKE '%/' THEN substr(c0, 1, len(c0) - 1) ELSE c0 END
           AS canonical_url
  FROM (SELECT event_id,
               CASE WHEN c0 LIKE '%/?%'
                    THEN replace(c0, '/?', '?') ELSE c0 END AS c0
        FROM canon)
)
SELECT canonical_url,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct_events
FROM c2 GROUP BY canonical_url
""",
    "llm",
    "url",
    "dedup",
)
def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-style URL canonicalization + dedup: lowercase the
    scheme/host, drop the default port, strip tracking parameters
    (utm_*, ref), normalize trailing '/' and dangling separators, then
    group by the canonical URL. The three synthetic surface variants
    per logical URL collapse to one group — the normalization a web
    corpus pipeline runs before exact URL dedup.

    Pure string expressions over one scan + one grouped count: no UDF,
    no extra shuffle beyond the final aggregation; at 100 TB this is a
    map-side transform feeding a keyed agg, the cheapest possible
    dedup-prep shape. Regex semantics are pinned to the subset both
    engines implement identically (character classes, alternation,
    greedy [^&]*).
    """
    ev = load_table(spark, sf_dir, "events")
    uid = (F.col("user_id") % 50).cast("long").cast("string")
    raw = ev.select(
        "event_id",
        F.when(
            (F.col("event_id") % 3).cast("int") == 0,
            F.concat(
                F.lit("https://Example.COM:443/t/"),
                F.col("event_type"),
                F.lit("?utm_source=feed&id="),
                uid,
            ),
        )
        .when(
            (F.col("event_id") % 3).cast("int") == 1,
            F.concat(
                F.lit("HTTPS://example.com/t/"),
                F.col("event_type"),
                F.lit("/?id="),
                uid,
                F.lit("&ref=abc"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://example.com/t/"),
                F.col("event_type"),
                F.lit("?id="),
                uid,
            )
        )
        .alias("url"),
    )
    c0 = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("url")), ":443/", "/"),
                "(utm_[a-z]+|ref)=[^&]*&?",
                "",
            ),
            "[?&]$",
            "",
        ),
        "/\\?",
        "?",
    )
    c1 = F.when(
        c0.contains("/?"), F.regexp_replace(c0, "/\\?", "?")
    ).otherwise(c0)
    c1c = F.col("c1")
    canonical = F.when(
        c1c.endswith("/"), F.expr("substring(c1, 1, length(c1) - 1)")
    ).otherwise(c1c)
    return (
        raw.select("event_id", c1.alias("c1"))
        .select("event_id", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct(F.col("event_id")).alias("n_distinct_events"),
        )
    )


# ---------------------------------------------------------------------------
# Asymmetric containment dedup (doc-inside-doc near-dup)
# ---------------------------------------------------------------------------

CONT_TAU = 0.5  # overlap-coefficient threshold
CONT_N = 3  # word-shingle width


@register(
    "q_dedup_containment",
    # Same synthetic corpus / gram / df-capped posting universe as the
    # jaccard family (registry_ext CTEs are module constants there;
    # inlined here to keep this module self-contained; the df-cap is
    # the SAME constant the Spark side uses, not a copy).
    """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 25 = 0
)
, w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS wrds FROM corpus)
, gs AS (
  SELECT doc_id, grams, len(grams) AS n_grams FROM (
    SELECT doc_id,
           CASE WHEN len(wrds) >= 3 THEN
             list_distinct(list_transform(generate_series(1, len(wrds) - 2),
               i -> wrds[i] || ' ' || wrds[i+1] || ' ' || wrds[i+2]))
           ELSE CAST([] AS VARCHAR[]) END AS grams
    FROM w)
)
, posting AS (
  SELECT doc_id, gram FROM (SELECT doc_id, unnest(grams) AS gram FROM gs)
  QUALIFY count(*) OVER (PARTITION BY gram) <= {MAX_GRAM_DF}
)
, nk AS (SELECT doc_id, count(*) AS n_grams FROM posting GROUP BY doc_id)
, inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM posting a JOIN posting b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, cont_a, cont_b FROM (
  SELECT id_a, id_b,
         CAST(CAST(inter AS DOUBLE) / ka.n_grams AS REAL) AS cont_a,
         CAST(CAST(inter AS DOUBLE) / kb.n_grams AS REAL) AS cont_b
  FROM inter JOIN nk ka ON ka.doc_id = id_a JOIN nk kb ON kb.doc_id = id_b
) WHERE greatest(cont_a, cont_b) >= CAST({CONT_TAU} AS REAL)
""".format(MAX_GRAM_DF=_MAX_GRAM_DF, CONT_TAU=CONT_TAU),
    "dedup",
    "containment",
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup: per candidate pair, the CONTAINMENT of each
    doc's shingle set in the other (inter/|A|, inter/|B|), thresholded
    on the overlap coefficient inter/min(|A|,|B|) = max(cont_a, cont_b).
    Jaccard misses doc-inside-doc duplication (a page embedded in a
    larger page scores inter/(|A|+|B|-inter) ≈ |A|/|B| → low); the
    overlap coefficient is the standard fix in corpus dedup.

    Same scale shape as q_dedup_ngram_jaccard: df-capped inverted-index
    equi-join (worst key bounded at max_df² pair rows), merge-hinted
    self-join sharing one exchange, never all-pairs. Thresholding
    happens on float32-canonicalized values on BOTH engines so the pair
    SET is engine-exact."""
    from .extensions import dedup as D
    from .registry_ext import _corpus

    docs = _corpus(spark, sf_dir)
    g = D._with_grams(docs, "text", CONT_N)
    posting0 = g.select("doc_id", F.explode("grams").alias("gram"))
    stop_arr = (
        posting0.groupBy("gram")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") > D.MAX_GRAM_DF)
        .agg(F.collect_list("gram").alias("stop_grams"))
    )
    g = (
        g.crossJoin(F.broadcast(stop_arr))
        .select("doc_id", F.array_except("grams", "stop_grams").alias("grams"))
        .withColumn("n_grams", F.size("grams"))
    )
    posting = g.select("doc_id", "n_grams", F.explode("grams").alias("gram"))
    a, b = posting.alias("a"), posting.hint("merge").alias("b")
    joined = a.join(
        b,
        (F.col("a.gram") == F.col("b.gram"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    inter = joined.groupBy(
        F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
    ).agg(
        F.count("*").alias("inter"),
        F.min("a.n_grams").alias("na"),
        F.min("b.n_grams").alias("nb"),
    )
    cont_a = (F.col("inter").cast("double") / F.col("na")).cast("float")
    cont_b = (F.col("inter").cast("double") / F.col("nb")).cast("float")
    return (
        inter.select(
            "id_a",
            "id_b",
            cont_a.alias("cont_a"),
            cont_b.alias("cont_b"),
        )
        .where(
            F.greatest("cont_a", "cont_b")
            >= F.lit(CONT_TAU).cast("float")
        )
    )


# ---------------------------------------------------------------------------
# Cross-document repeated substrings (memorization-risk detection)
# ---------------------------------------------------------------------------

REP_N = 8  # shingle width (words)
REP_MIN_DF = 3  # repeated across at least this many docs


@register(
    "q_repeated_substrings",
    f"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS wrds FROM documents
),
sh AS (
  SELECT doc_id, unnest(
    CASE WHEN len(wrds) >= {REP_N} THEN
      list_distinct(list_transform(generate_series(1, len(wrds) - {REP_N - 1}),
        i -> array_to_string(wrds[i:i+{REP_N - 1}], ' ')))
    ELSE CAST([] AS VARCHAR[]) END) AS shingle
  FROM w
)
SELECT shingle,
       CAST(count(*) AS BIGINT) AS df,
       CAST(min(doc_id) AS BIGINT) AS first_doc
FROM sh GROUP BY shingle HAVING count(*) >= {REP_MIN_DF}
""",
    "llm",
    "dedup",
    "substring",
)
def q_repeated_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated {REP_N}-word substrings: distinct shingles
    per doc, grouped by shingle, kept where document frequency ≥
    {REP_MIN_DF}. This is the k-gram approximation of exact-substring
    train-set dedup (suffix-array ExactSubstr): any substring of ≥
    {REP_N} words duplicated across ≥ {REP_MIN_DF} docs contains one of
    these shingles, so the result is a superset anchor for span removal
    — the memorization-risk pass an LLM corpus runs after document-level
    dedup.

    One scan → shingle explode → keyed count: map-side partial
    aggregation bounds the shuffle at distinct-shingle volume, and no
    pair join exists anywhere (df counting, not pair generation —
    scale-safe at any corpus size; the downstream span-removal join is
    shingle-keyed too)."""
    docs = load_table(spark, sf_dir, "documents")
    from .extensions.dedup import word_ngrams

    sh = docs.select(
        "doc_id",
        F.explode(word_ngrams(F.col("text"), REP_N)).alias("shingle"),
    )
    return (
        sh.groupBy("shingle")
        .agg(
            F.count("*").alias("df"),
            F.min("doc_id").alias("first_doc"),
        )
        .where(F.col("df") >= REP_MIN_DF)
    )
