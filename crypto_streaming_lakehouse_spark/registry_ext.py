"""Extension queries: training-data pipeline operators with DuckDB oracles.

Dedup (exact / n-gram Jaccard / MinHash-LSH / SimHash / embedding-cosine),
similarity search (brute-force + hyperplane-LSH ANN), text analysis, and
multimodal plumbing. All oracle SQL here is GENERATED from the same
constants (seeds, marker lists, hyperplanes) the Spark operators use, so
the two sides cannot drift.

Dedup corpora are the documents table with ~4% injected exact duplicates
(doc_id+1000000) so the queries demonstrably find something at every sf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extensions import dedup as D
from .extensions import multimodal as M
from .extensions import similarity as S
from .extensions import text as X
from .functions.hashing import (
    MINHASH_P,
    affine_family,
    md5_int32_sql,
    md5_int60_sql,
    rolling_hash_sql,
)
from .registry import r6, register
from .sources.tables import load_table

# ---------------------------------------------------------------------------
# Shared SQL fragments
# ---------------------------------------------------------------------------

CORPUS_CTE = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 25 = 0
)
"""

GRAMS_CTE = r"""
, w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS wrds FROM corpus)
, gs AS (
  SELECT doc_id, grams, len(grams) AS n_grams FROM (
    SELECT doc_id,
           CASE WHEN len(wrds) >= 3 THEN
             list_distinct(list_transform(generate_series(1, len(wrds) - 2),
               i -> wrds[i] || ' ' || wrds[i+1] || ' ' || wrds[i+2]))
           ELSE CAST([] AS VARCHAR[]) END AS grams
    FROM w)
)
"""

#: Document-frequency-capped posting list (mirrors dedup.MAX_GRAM_DF): grams
#: above the cap are dropped before the self-join and the per-doc gram
#: counts are recomputed over the kept grams, exactly as the Spark side.
CAPPED_POSTING_CTE = f"""
, posting AS (
  SELECT doc_id, gram FROM (SELECT doc_id, unnest(grams) AS gram FROM gs)
  QUALIFY count(*) OVER (PARTITION BY gram) <= {D.MAX_GRAM_DF}
)
, nk AS (SELECT doc_id, count(*) AS n_grams FROM posting GROUP BY doc_id)
"""

_JACCARD_TAIL = """
SELECT id_a, id_b, jaccard FROM (
  SELECT id_a, id_b,
         CAST(inter AS DOUBLE) / (ka.n_grams + kb.n_grams - inter) AS jaccard
  FROM {pairs} JOIN nk ka ON ka.doc_id = id_a JOIN nk kb ON kb.doc_id = id_b
) WHERE jaccard >= {tau}
"""


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, len({a})),"
        f" i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
    )


EMB_CTE = f"""
WITH n AS (
  SELECT vec_id, v,
         sqrt({_dot_sql('v', 'v')}) AS nrm
  FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings)
)
"""


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = d.where(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return d.unionAll(dups)


def _jaccard_pairs_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs at tau=0.8, materialized once per (session, sf_dir):
    q_dedup_ngram_jaccard RETURNS them, and q_dedup_components /
    q_dedup_apply / q_dedup_keep_best consume the identical pair set —
    without the memo each re-runs the full posting self-join.

    Deliberately NOT built from a pre-materialized gram table: measured at
    sf0.1, checkpointing the fat gram arrays and re-reading them for the
    df-cap and self-join branches costs 1.7 s + 4.4 s vs 3.3 s for the
    pipelined two-pass plan, whose posting self-join already shares one
    shuffle via ReusedExchange. The memo point is the PAIR table — tiny,
    and consumed by three downstream queries."""
    from .extensions.dedup import memo_materialize

    return memo_materialize(
        spark,
        f"jaccard_pairs:{sf_dir}",
        lambda: D.ngram_jaccard_pairs(_corpus(spark, sf_dir), threshold=0.8),
    )


def _components_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, component) closure of the near-dup pairs, materialized
    once per (session, sf_dir): q_dedup_components returns it and
    q_dedup_apply / q_dedup_keep_best build their keep policies on the
    identical labels — the iterative propagation is the expensive step."""
    from .extensions.dedup import memo_materialize

    return memo_materialize(
        spark,
        f"jaccard_components:{sf_dir}",
        lambda: D.dup_components(
            _jaccard_pairs_cut(spark, sf_dir),
            _corpus(spark, sf_dir).select("doc_id"),
        ),
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

_EN = ", ".join(f"'{m}'" for m in X.LANG_MARKERS["en"])

_TEXT_STATS_SQL = rf"""
WITH s AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS wrds FROM documents
), s2 AS (
  SELECT doc_id,
         CAST(len(text) AS BIGINT) AS n_chars_actual,
         CAST(len(wrds) AS BIGINT) AS n_words,
         CASE WHEN len(text) > 0 THEN
           CAST(len(text) - len(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
             / len(text) END AS punct_ratio,
         CASE WHEN len(wrds) > 0 THEN
           CAST(len(list_filter(wrds, w2 -> w2 IN ({_EN}))) AS DOUBLE)
             / len(wrds) END AS stopword_ratio
  FROM s
)
SELECT doc_id, n_chars_actual, n_words, punct_ratio, stopword_ratio,
       CAST(ln(1 + n_words) * (1 - punct_ratio) * (0.5 + 0.5 * stopword_ratio)
            AS REAL) AS quality_score
FROM s2
"""


@register("q_text_stats", _TEXT_STATS_SQL, "text")
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = X.with_text_stats(docs)
    return out.select(
        "doc_id",
        "n_chars_actual",
        "n_words",
        "punct_ratio",
        "stopword_ratio",
        r6("quality_score", "quality_score"),
    )


_TOKEN_SQL = rf"""
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '{X.BPE_PATTERN}')) AS BIGINT) AS bpe_tokens,
       CASE WHEN len(string_split_regex(trim(text), '\s+')) > 0 THEN
         CAST(len(text) AS DOUBLE)
           / len(string_split_regex(trim(text), '\s+')) END AS chars_per_token
FROM documents
"""


@register("q_token_count", _TOKEN_SQL, "text")
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return X.with_token_counts(docs).select(
        "doc_id", "ws_tokens", "bpe_tokens", "chars_per_token"
    )


def _lang_id_sql() -> str:
    langs = list(X.LANG_MARKERS)
    hit_cols = ",\n         ".join(
        "CAST(len(list_filter(wrds, w2 -> w2 IN ({}))) AS BIGINT) AS h_{}".format(
            ", ".join(f"'{m}'" for m in ms), lang
        )
        for lang, ms in X.LANG_MARKERS.items()
    )
    sql = rf"""
WITH s AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS wrds FROM documents
), h AS (
  SELECT doc_id,
         {hit_cols}
  FROM s
)"""
    prev_h, prev_l, prev_cte = f"h_{langs[0]}", f"'{langs[0]}'", "h"
    for i, lang in enumerate(langs[1:], start=1):
        sql += f"""
, f{i} AS (
  SELECT *,
         CASE WHEN h_{lang} > {prev_h} THEN h_{lang} ELSE {prev_h} END AS bh{i},
         CASE WHEN h_{lang} > {prev_h} THEN '{lang}' ELSE {prev_l} END AS bl{i}
  FROM {prev_cte}
)"""
        prev_h, prev_l, prev_cte = f"bh{i}", f"bl{i}", f"f{i}"
    sql += f"""
SELECT doc_id,
       CASE WHEN {prev_h} > 0 THEN {prev_l} ELSE 'und' END AS lang_pred,
       {prev_h} AS lang_hits
FROM {prev_cte}
"""
    return sql


@register("q_lang_id", _lang_id_sql(), "text")
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return X.with_lang_id(docs).select("doc_id", "lang_pred", "lang_hits")


@register(
    "q_fingerprint",
    f"""
SELECT doc_id,
       {md5_int32_sql('text')} AS fp_md5,
       {rolling_hash_sql('text')} AS fp_roll
FROM documents
""",
    "text",
    "hash",
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return X.with_fingerprints(docs).select("doc_id", "fp_md5", "fp_roll")


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------


@register(
    "q_dedup_exact",
    CORPUS_CTE
    + """
SELECT md5(text) AS text_hash, count(*) AS n_copies, min(doc_id) AS keep_doc_id
FROM corpus GROUP BY md5(text)
""",
    "dedup",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dup_groups(_corpus(spark, sf_dir))


@register(
    "q_dedup_ngram_jaccard",
    CORPUS_CTE
    + GRAMS_CTE
    + CAPPED_POSTING_CTE
    + """
, inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM posting a JOIN posting b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
"""
    + _JACCARD_TAIL.format(pairs="inter", tau=0.8),
    "dedup",
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _jaccard_pairs_cut(spark, sf_dir)


def _minhash_lsh_sql() -> str:
    r = D.N_HASHES // D.N_BANDS
    fam = affine_family(D.N_HASHES)
    mh = ",\n         ".join(
        f"min(({a} * h + {b}) % {MINHASH_P}) AS mh{i}"
        for i, (a, b) in enumerate(fam)
    )
    band_keys = ", ".join(
        "concat_ws('_', '{}', {})".format(
            b, ", ".join(f"mh{b * r + j}" for j in range(r))
        )
        for b in range(D.N_BANDS)
    )
    inter = "len(list_intersect(ga.grams, gb.grams))"
    return (
        CORPUS_CTE
        + GRAMS_CTE
        + f"""
, posting AS (SELECT doc_id, unnest(grams) AS gram FROM gs WHERE n_grams > 0)
, ph AS (SELECT doc_id, {md5_int32_sql('gram')} AS h FROM posting)
, sig AS (
  SELECT doc_id,
         {mh}
  FROM ph GROUP BY doc_id
)
, bands AS (SELECT doc_id, unnest([{band_keys}]) AS band_key FROM sig)
, cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, jaccard FROM (
  SELECT id_a, id_b,
         CAST({inter} AS DOUBLE) / (ga.n_grams + gb.n_grams - {inter}) AS jaccard
  FROM cand JOIN gs ga ON ga.doc_id = id_a JOIN gs gb ON gb.doc_id = id_b
) WHERE jaccard >= 0.8
"""
    )


def _components_sql() -> str:
    pairs_select = _JACCARD_TAIL.format(pairs="inter", tau=0.8)
    return (
        CORPUS_CTE.replace("WITH corpus", "WITH RECURSIVE corpus", 1)
        + GRAMS_CTE
        + CAPPED_POSTING_CTE
        + """
, inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM posting a JOIN posting b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
, jp AS ("""
        + pairs_select
        + """)
, und AS (SELECT id_a AS a, id_b AS b FROM jp
          UNION ALL SELECT id_b, id_a FROM jp)
, reach AS (
  SELECT doc_id AS id, doc_id AS lbl FROM corpus
  UNION
  SELECT u.a AS id, r.lbl FROM und u JOIN reach r ON u.b = r.id
)
SELECT id AS doc_id, min(lbl) AS component FROM reach GROUP BY id
"""
    )


@register("q_dedup_components", _components_sql(), "dedup", "iterative")
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → connected components (the keep/drop closure).
    Spark side is iterative min-label propagation; the oracle computes the
    same min-reachable-id labels with a recursive CTE."""
    return _components_cut(spark, sf_dir)


@register("q_dedup_minhash_lsh", _minhash_lsh_sql(), "dedup", "lsh")
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_pairs(_corpus(spark, sf_dir), threshold=0.8)


def _dedup_apply_sql() -> str:
    # keep exactly one doc per component: the component representative
    # (min reachable id == the doc's own id)
    return (
        _components_sql().replace(
            "SELECT id AS doc_id, min(lbl) AS component FROM reach GROUP BY id",
            """, comp AS (
  SELECT id AS doc_id, min(lbl) AS component FROM reach GROUP BY id
)
SELECT c.doc_id, CAST(length(co.text) AS BIGINT) AS text_len
FROM comp c JOIN corpus co ON co.doc_id = c.doc_id
WHERE c.doc_id = c.component""",
            1,
        )
    )


@register("q_dedup_apply", _dedup_apply_sql(), "dedup", "apply")
def q_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup APPLICATION: pairs → components → keep ONE doc per
    component (the min-id representative) → filtered corpus. This is the
    actual output a training pipeline consumes; pairs/components alone
    are intermediates. The keep-filter is a semi-join-free predicate
    (doc_id == component) so applying dedup adds no extra shuffle over
    the closure itself."""
    corpus = _corpus(spark, sf_dir)
    comps = _components_cut(spark, sf_dir)
    keep = comps.where(F.col("doc_id") == F.col("component")).select("doc_id")
    return keep.join(corpus, "doc_id").select(
        "doc_id", F.length("text").cast("long").alias("text_len")
    )


def _simhash_sql(max_hamming: int = 3) -> str:
    counts = ",\n                ".join(
        f"sum(CASE WHEN (h & {1 << j}) <> 0 THEN 1 ELSE 0 END) AS c{j}"
        for j in range(D.SIMHASH_BITS)
    )
    bits = "\n           + ".join(
        f"CASE WHEN 2 * c{j} > n THEN {1 << j} ELSE 0 END"
        for j in range(D.SIMHASH_BITS)
    )
    width = D.SIMHASH_BITS // D.SIMHASH_BANDS
    band_keys = ", ".join(
        f"concat_ws('_', '{b}', (simhash >> {b * width}) & {(1 << width) - 1})"
        for b in range(D.SIMHASH_BANDS)
    )
    return (
        CORPUS_CTE
        + rf"""
, tok AS (SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS t
          FROM corpus)
, th AS (SELECT doc_id, {md5_int60_sql('t')} AS h FROM tok)
, cnt AS (SELECT doc_id, count(*) AS n,
                {counts}
          FROM th GROUP BY doc_id)
, sh AS (SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM cnt)
, sbands AS (SELECT doc_id, simhash, unnest([{band_keys}]) AS band_key FROM sh)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sbands a JOIN sbands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""
    )


@register("q_dedup_simhash", _simhash_sql(), "dedup", "lsh")
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_pairs(_corpus(spark, sf_dir), max_hamming=3)


# ---------------------------------------------------------------------------
# Embeddings: near-dup + similarity search
# ---------------------------------------------------------------------------


@register(
    "q_dedup_embedding_cosine",
    EMB_CTE
    + f"""
SELECT id_a, id_b, CAST(cosine AS REAL) AS cosine FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         {_dot_sql('a.v', 'b.v')} / (a.nrm * b.nrm) AS cosine
  FROM n a JOIN n b ON a.vec_id < b.vec_id
) WHERE CAST(cosine AS REAL) >= CAST(0.4 AS REAL)
""",
    "dedup",
    "vector",
)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = S.embedding_cosine_pairs(emb, threshold=0.4)
    # einsum's sum order differs from the oracle's sequential fold in the
    # last ulps → float32-canonicalize the compared value (threshold is
    # applied to each engine's own double upstream).
    return out.select("id_a", "id_b", r6("cosine", "cosine"))


@register(
    "q_ann_cosine_topk",
    EMB_CTE
    + f"""
, q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 10)
, scored AS (
  SELECT q.q_id, n.vec_id,
         {_dot_sql('q.qv', 'n.v')} / (q.qn * n.nrm) AS cosine
  FROM q JOIN n ON n.vec_id <> q.q_id
)
SELECT q_id, vec_id, cosine, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= 5
""",
    "vector",
    "topk",
)
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .extensions.dedup import memo_scalar

    emb = load_table(spark, sf_dir, "embeddings")
    n = memo_scalar(spark, f"emb_count:{sf_dir}", emb.count)
    out = S.cosine_topk(emb, n_queries=10, k=5, n_corpus=n)
    return out.withColumn("rank", F.col("rank").cast("long"))


def _ann_lsh_sql() -> str:
    planes = ", ".join(
        "({}, [{}])".format(
            p, ", ".join(repr(S.plane_component(p, d)) for d in range(64))
        )
        for p in range(S.N_PLANES)
    )
    return (
        EMB_CTE
        + f"""
, planes AS (SELECT * FROM (VALUES {planes}) AS p(p, pv))
, bk AS (
  SELECT n.vec_id,
         CAST(sum(CASE WHEN {_dot_sql('n.v', 'p.pv')} >= 0
                       THEN (1 << p.p) ELSE 0 END) AS BIGINT) AS bucket
  FROM n CROSS JOIN planes p GROUP BY n.vec_id
)
, nb AS (SELECT n.*, bk.bucket FROM n JOIN bk USING (vec_id))
, q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, bucket AS q_bucket
        FROM nb WHERE vec_id < 10)
, scored AS (
  SELECT q.q_id, nb.vec_id,
         {_dot_sql('q.qv', 'nb.v')} / (q.qn * nb.nrm) AS cosine
  FROM q JOIN nb ON nb.bucket = q.q_bucket AND nb.vec_id <> q.q_id
)
SELECT q_id, vec_id, cosine, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= 5
"""
    )


@register("q_ann_lsh_topk", _ann_lsh_sql(), "vector", "lsh", "topk")
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = S.lsh_cosine_topk(emb, dims=64, n_queries=10, k=5)
    return out.withColumn("rank", F.col("rank").cast("long"))


def _ann_ivf_sql() -> str:
    cents = ", ".join(
        "({}, [{}])".format(
            c, ", ".join(repr(S.centroid_component(c, d)) for d in range(64))
        )
        for c in range(S.N_CELLS)
    )
    return (
        EMB_CTE
        + f"""
, cents AS (SELECT * FROM (VALUES {cents}) AS c(cell, cv))
, ranked AS (
  SELECT n.vec_id, n.v, n.nrm, c.cell,
         row_number() OVER (PARTITION BY n.vec_id
                            ORDER BY {_dot_sql('n.v', 'c.cv')} DESC, c.cell)
           AS cell_rank
  FROM n CROSS JOIN cents c
)
, assignment AS (SELECT vec_id, v, nrm, cell FROM ranked WHERE cell_rank = 1)
, probes AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qn, cell AS q_cell
  FROM ranked WHERE vec_id < 10 AND cell_rank <= {S.N_PROBE}
)
, scored AS (
  SELECT p.q_id, a.vec_id,
         {_dot_sql('p.qv', 'a.v')} / (p.qn * a.nrm) AS cosine
  FROM probes p JOIN assignment a
    ON a.cell = p.q_cell AND a.vec_id <> p.q_id
)
SELECT q_id, vec_id, cosine, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= 5
"""
    )


@register("q_ann_ivf_topk", _ann_ivf_sql(), "vector", "ivf", "topk")
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = S.ivf_cosine_topk(emb, dims=64, n_queries=10, k=5)
    return out.withColumn("rank", F.col("rank").cast("long"))


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------

_MEDIA_CTE = """
WITH m AS (
  SELECT doc_id AS media_id,
         ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
         text, n_chars
  FROM documents
)
"""


@register(
    "q_multimodal_features",
    _MEDIA_CTE
    + """
, b AS (
  SELECT media_id, kind,
         CAST(len(text) AS BIGINT) AS n_bytes,
         CAST(list_reduce(list_transform(string_split(text, ''),
                c -> CAST(ascii(c) AS BIGINT)), (a, b2) -> a + b2) AS BIGINT) AS byte_sum
  FROM m
)
SELECT media_id, kind, n_bytes, byte_sum,
       CAST(byte_sum AS DOUBLE) / n_bytes AS byte_mean
FROM b
""",
    "multimodal",
    "pandas-udf",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction over binary payloads.

    The oracle recomputes byte stats from the (ASCII) source text — utf-8
    bytes of ASCII text are the character codes.
    """
    media = M.build_media(load_table(spark, sf_dir, "documents"))
    return M.extract_features(media)


@register(
    "q_multimodal_resize",
    _MEDIA_CTE
    + """
SELECT media_id,
       CAST((n_chars % 64) + 1 AS INT) AS width,
       CAST(((n_chars * 7) % 64) + 1 AS INT) AS height,
       CAST(least(len(text), ((n_chars % 64) + 1) * (((n_chars * 7) % 64) + 1))
            AS BIGINT) AS n_bytes_resized,
       CAST(list_reduce(list_transform(
              string_split(substr(text, 1,
                ((n_chars % 64) + 1) * (((n_chars * 7) % 64) + 1)), ''),
              c -> CAST(ascii(c) AS BIGINT)), (a, b2) -> a + b2)
            AS BIGINT) AS byte_sum_resized
FROM m WHERE kind = 'image'
""",
    "multimodal",
    "pandas-udf",
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing over image payloads (deterministic truncation stand-in
    for pixel interpolation; oracle recomputes byte stats of the clipped
    ASCII payload)."""
    media = M.build_media(load_table(spark, sf_dir, "documents"))
    return M.resize(media)


_DECODE_SQL = """
WITH img AS (
  SELECT doc_id AS media_id,
         (doc_id % 8) + 2 AS w,
         ((doc_id * 3) % 8) + 2 AS h
  FROM documents WHERE doc_id % 3 = 0
), sums AS (
  SELECT media_id, w, h,
         list_aggregate(list_transform(generate_series(0, 3*w*h - 1),
           i -> (media_id*7 + i*13) % 256), 'sum') AS pixel_sum,
         list_aggregate(list_transform(generate_series(0, w*h - 1),
           p -> (media_id*7 + (3*p)*13) % 256), 'sum') AS r_sum,
         list_aggregate(list_transform(generate_series(0, w*h - 1),
           p -> (media_id*7 + (3*p + 1)*13) % 256), 'sum') AS g_sum,
         list_aggregate(list_transform(generate_series(0, w*h - 1),
           p -> (media_id*7 + (3*p + 2)*13) % 256), 'sum') AS b_sum
  FROM img
)
SELECT media_id,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(255 AS INT) AS maxval,
       CAST(w * h AS BIGINT) AS n_pixels,
       CAST(pixel_sum AS BIGINT) AS pixel_sum,
       CAST(pixel_sum AS DOUBLE) / (3 * w * h) AS pixel_mean,
       CAST(r_sum AS BIGINT) AS r_sum,
       CAST(g_sum AS BIGINT) AS g_sum,
       CAST(b_sum AS BIGINT) AS b_sum
FROM sums
"""


@register("q_multimodal_decode", _DECODE_SQL, "multimodal", "pandas-udf")
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real P6 PPM decode: generate deterministic binary payloads, parse
    them back with the pure-numpy decoder, and emit per-image pixel stats.
    The oracle recomputes every statistic from the generator's closed-form
    byte function — the decode path is verified end-to-end on real binary
    data, not stubbed."""
    media = M.build_ppm_media(load_table(spark, sf_dir, "documents"))
    return M.decode(media)


_AUDIO_DECODE_SQL = f"""
WITH aud AS (
  SELECT doc_id AS media_id, doc_id % 200 + 50 AS n
  FROM documents WHERE doc_id % 3 = 1
), s AS (
  SELECT media_id, n,
         list_transform(generate_series(0, n - 1),
           i -> CAST((media_id*13 + i*7) % 65536 - 32768 AS DOUBLE)) AS pcm
  FROM aud
)
SELECT media_id,
       CAST(1 AS INT) AS n_channels,
       CAST({M.WAV_RATE} AS INT) AS sample_rate,
       CAST(n AS BIGINT) AS n_samples,
       CAST(list_max(list_transform(pcm, x -> CAST(abs(x) AS BIGINT)))
         AS BIGINT) AS peak,
       CAST(list_aggregate(pcm, 'sum') / n AS REAL) AS dc_mean,
       CAST(sqrt(list_aggregate(list_transform(pcm, x -> x * x), 'sum') / n)
         AS REAL) AS rms
FROM s
"""


@register("q_multimodal_audio_decode", _AUDIO_DECODE_SQL, "multimodal", "pandas-udf")
def q_multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real WAV/PCM audio decode: deterministic RIFF payloads parsed back
    with the stdlib wave module inside mapInPandas, emitting per-clip
    peak/DC/RMS. The oracle recomputes each statistic from the sample
    generator's closed form — the parse path is verified end-to-end on
    real binary audio."""
    media = M.build_wav_media(load_table(spark, sf_dir, "documents"))
    out = M.decode_audio(media)
    return out.select(
        "media_id",
        "n_channels",
        "sample_rate",
        "n_samples",
        "peak",
        F.col("dc_mean").cast("float").alias("dc_mean"),
        F.col("rms").cast("float").alias("rms"),
    )


@register(
    "q_multimodal_frame_sample",
    _MEDIA_CTE
    + """
SELECT media_id, unnest(generate_series(0, (n_chars % 24), 4)) AS frame_idx
FROM m WHERE kind = 'video'
""",
    "multimodal",
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.build_media(load_table(spark, sf_dir, "documents"))
    out = M.sample_frames(media, stride=4)
    return out.withColumn("frame_idx", F.col("frame_idx").cast("long"))


_PATCH_SQL = """
WITH imgs AS (
  SELECT doc_id AS media_id, doc_id % 8 + 2 AS w, (doc_id * 3) % 8 + 2 AS h
  FROM documents WHERE doc_id % 3 = 0
),
cells AS (
  SELECT media_id, w, h, px, py,
         CASE WHEN px = 0 THEN 0 ELSE w // 2 END AS x0,
         CASE WHEN px = 0 THEN w // 2 ELSE w END AS x1,
         CASE WHEN py = 0 THEN 0 ELSE h // 2 END AS y0,
         CASE WHEN py = 0 THEN h // 2 ELSE h END AS y1
  FROM imgs
  CROSS JOIN (SELECT unnest([0, 1]) AS px)
  CROSS JOIN (SELECT unnest([0, 1]) AS py)
)
SELECT media_id, CAST(px AS INT) AS px, CAST(py AS INT) AS py,
       CAST(x1 - x0 AS INT) AS patch_w,
       CAST(y1 - y0 AS INT) AS patch_h,
       CAST(patch_sum AS BIGINT) AS patch_sum,
       CAST(CASE WHEN (x1 - x0) * (y1 - y0) > 0
            THEN CAST(patch_sum AS DOUBLE) / ((x1 - x0) * (y1 - y0) * 3)
            END AS REAL) AS patch_mean
FROM (
  SELECT media_id, px, py, x0, x1, y0, y1,
         list_sum(flatten(
           list_transform(generate_series(y0, y1 - 1), y ->
             list_transform(generate_series(x0, x1 - 1), x ->
                 (media_id * 7 + (3 * (y * w + x)) * 13) % 256
               + (media_id * 7 + (3 * (y * w + x) + 1) * 13) % 256
               + (media_id * 7 + (3 * (y * w + x) + 2) * 13) % 256))
         )) AS patch_sum
  FROM cells
)
"""


@register("q_multimodal_patches", _PATCH_SQL, "multimodal", "pandas-udf")
def q_multimodal_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style 2×2 patchification of REAL decoded PPM rasters
    (decode → reshape → quadrant slice → per-patch stats in one
    mapInPandas stage). The oracle recomputes every patch sum from the
    payload generator's closed-form byte function — the whole
    binary-decode-to-patch-tensor path is verified, not stubbed.

    Float note: patch_mean is emitted as float32 on both sides; the
    Spark side divides the integer sum by patch.size in float64 first,
    exactly like the oracle's DOUBLE division."""
    media = M.build_ppm_media(load_table(spark, sf_dir, "documents"))
    out = M.extract_patches(media)
    return out.select(
        "media_id", "px", "py", "patch_w", "patch_h", "patch_sum",
        F.col("patch_mean").cast("float").alias("patch_mean"),
    )


def _dedup_keep_best_sql() -> str:
    # keep the HIGHEST-QUALITY doc per near-dup component (smallest id on
    # float32-quality ties); quality = the q_text_stats score over the
    # corpus. Membership decisions use float32 quality on both engines.
    return _components_sql().replace(
        "SELECT id AS doc_id, min(lbl) AS component FROM reach GROUP BY id",
        r""", comp AS (
  SELECT id AS doc_id, min(lbl) AS component FROM reach GROUP BY id
), quality AS (
  SELECT doc_id,
         CAST(ln(1 + len(string_split_regex(trim(text), '\s+')))
              * (1 - CAST(len(text) - len(regexp_replace(text,
                     '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE) / len(text))
              * (0.5 + 0.5 * CAST(len(list_filter(
                     string_split_regex(trim(text), '\s+'),
                     w2 -> w2 IN (__EN__))) AS DOUBLE)
                   / len(string_split_regex(trim(text), '\s+')))
           AS REAL) AS q
  FROM corpus WHERE len(text) > 0
)
SELECT component,
       doc_id AS keep_doc_id,
       q AS keep_quality,
       CAST(n_members AS BIGINT) AS n_members
FROM (
  SELECT c.component, c.doc_id, q.q,
         count(*) OVER (PARTITION BY c.component) AS n_members,
         row_number() OVER (PARTITION BY c.component
                            ORDER BY q.q DESC, c.doc_id) AS rn
  FROM comp c JOIN quality q USING (doc_id)
) WHERE rn = 1
""",
        1,
    ).replace("__EN__", _EN)


@register("q_dedup_keep_best", _dedup_keep_best_sql(), "dedup", "curation")
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup keep policy: near-dup components keep their
    HIGHEST-quality member (q_text_stats score, float32-decided, doc_id
    tie-break) instead of the arbitrary min-id representative — what a
    training-data curation pipeline actually wants when near-duplicates
    differ in cleanliness. Component closure reuses dup_components; the
    quality join and per-component argmax add one broadcast-joinable
    (component, quality) pass."""
    corpus = _corpus(spark, sf_dir)
    comp = _components_cut(spark, sf_dir)
    quality = (
        X.with_text_stats(corpus.where(F.length("text") > 0))
        .select("doc_id", F.col("quality_score").cast("float").alias("q"))
    )
    from pyspark.sql import Window

    joined = comp.join(quality, "doc_id")
    w = Window.partitionBy("component")
    wr = Window.partitionBy("component").orderBy(F.col("q").desc(), "doc_id")
    return (
        joined.select(
            "component",
            "doc_id",
            "q",
            F.count("*").over(w).alias("n_members"),
            F.row_number().over(wr).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("keep_doc_id"),
            F.col("q").alias("keep_quality"),
            F.col("n_members").cast("long").alias("n_members"),
        )
    )
