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
