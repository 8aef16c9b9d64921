"""Round-12: the PQ production knobs the round-11 recall data demanded,
plus a 100×-safe sibling for the quadratic-output edit-distance join.

VERDICT r11 item 3 — the round-11 recall table showed ADC→re-rank
recall@5 DECAYING with corpus size at fixed parameters (0.56 → 0.32 from
sf0.001 to sf0.1 at R=20, K=16), and named the two production knobs
every PQ deployment turns:

- **R ∝ corpus** (`q_ann_pq_rerank_rscaled`): the re-rank shortlist must
  grow with the corpus or the ADC stage's fixed-size shortlist captures
  a shrinking fraction of the true neighborhood. R =
  max({PQ_RERANK_R}, corpus // {RSCALE_DIV}) — computed FROM THE DATA on
  both engines (a scalar aggregate folded into the rank filter; no
  per-scale constants), so one query text serves every scale.
- **8-bit codebook** (`q_ann_pq8_rerank`): K=256 entries per subspace —
  FAISS's IndexPQ default — through the same Arrow encode kernel (it
  vectorizes over K, row-chunked so the diff tensor stays ~64 MB
  regardless of K) and the same positional-LUT ADC. Codes are S×8 bits
  = 64 bits/vector: still a 32× read-volume cut vs raw float32, with
  16× finer cell resolution than the 4-bit search codebook.
- **Recall trade study** (`q_ann_pq_knobs_recall`): recall@5 of the
  baseline (R=20, K=16), the R-scaled, and the 8-bit variants against
  the exact squared-L2 ground truth, composed from the REGISTERED
  queries — the measured evidence that the knobs hold recall at growing
  corpus size (SCALE.md round-12 records the per-scale values).

VERDICT r11 item 4 — `q_edit_distance_topk`: q_edit_distance_join's
output grows QUADRATICALLY in sf (10.7k → 1.08M → 109M rows across the
three scales) because brand-block sizes scale linearly with the corpus.
This sibling is the production record-linkage shape: per-left-row top-k
with a capped, length-bucketed candidate index, so candidate volume AND
output grow ~linearly. See the query's docstring for the exact recall
trade-off.

Registry conventions as everywhere (registry.py): every query is a
(Spark builder, DuckDB oracle) pair via ``@register``; PQ arithmetic is
bit-identical across engines (sequential folds, float32 collapses —
see registry_round11).

Reference parity note: the reference has no vector or fuzzy-join
operators (SURVEY.md §2); this family is part of the
training-data-pipeline extension surface the brief mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import registry_round11 as R11
from .registry import register
from .registry_round3b import EDIT_MAX, LEN_DIFF_MAX
from .sources.tables import load_table

# R-scaling: R = max(PQ_RERANK_R, corpus // RSCALE_DIV) — 4% of the
# corpus, floored at the round-11 fixed R. 20/20/80/800 at the four
# fixture scales.
RSCALE_DIV = 25
# 8-bit product-quantization codebook (FAISS IndexPQ default): 256
# entries per subspace, codes = 8×8 bits = 64 bits per vector.
PQ8_K = 256

_RSCALE_SQL = (
    f"greatest({R11.PQ_RERANK_R}, (SELECT count(*) FROM embeddings)"
    f" // {RSCALE_DIV})"
)


def _pq_rerank_spark(
    spark: SparkSession,
    sf_dir: str,
    k_cb: int = R11.PQ_SEARCH_K,
    r_scaled: bool = False,
) -> DataFrame:
    """Two-stage PQ retrieval with parameterized codebook size and
    shortlist policy — the generalization of round-11's q_ann_pq_rerank
    (same plan shape: broadcast LUTs over the memoized code scan, ADC
    rank window, R×n_queries exact re-rank)."""
    codes_df, q_df = R11._pq_enc(spark, sf_dir, k_cb)
    pairs = codes_df.join(F.broadcast(q_df), F.col("vec_id") != F.col("q_id"))
    w = Window.partitionBy("q_id").orderBy(F.col("adc"), F.col("vec_id"))
    ranked = pairs.select(
        "q_id", "vec_id", R11._adc_expr(k_cb).alias("adc")
    ).withColumn("rank", F.row_number().over(w))
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    if r_scaled:
        # R from the data: one count aggregate broadcast into the rank
        # filter — the plan stays fully declarative (no driver action),
        # and the same query text serves every corpus size.
        tot = emb.agg(F.count("*").alias("n_corpus"))
        keep = F.col("rank") <= F.greatest(
            F.lit(R11.PQ_RERANK_R),
            F.floor(F.col("n_corpus") / F.lit(RSCALE_DIV)),
        )
        shortlist = (
            ranked.crossJoin(F.broadcast(tot)).where(keep).select("q_id", "vec_id")
        )
    else:
        shortlist = (
            ranked.where(F.col("rank") <= R11.PQ_RERANK_R)
            .select("q_id", "vec_id")
        )
    q = emb.where(F.col("vec_id") < R11.PQ_ADC_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w2 = Window.partitionBy("q_id").orderBy(F.col("d2"), F.col("vec_id"))
    return (
        shortlist.join(emb, "vec_id")
        .join(F.broadcast(q), "q_id")
        .select("q_id", "vec_id", d2.alias("d2"))
        .withColumn("rank", F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= R11.PQ_ADC_K)
        .select("q_id", "vec_id", "d2", "rank")
    )


@register(
    "q_ann_pq_rerank_rscaled",
    R11._pq_rerank_sql(r=_RSCALE_SQL),
    "vector",
    "pq",
    "topk",
)
def q_ann_pq_rerank_rscaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage PQ retrieval with the shortlist R SCALED TO THE CORPUS:
    R = max({PQ_RERANK_R}, corpus // {RSCALE_DIV}). Round-11's recall
    table showed why a fixed R cannot ship: at constant R=20 the
    ADC-stage shortlist covers a shrinking corpus fraction, and
    rerank recall@5 decayed 0.56 → 0.32 from sf0.001 to sf0.1. Scaling
    R restores the covered fraction; the re-rank stage stays
    R×n_queries raw-vector reads — still corpus-fraction-tiny
    (RSCALE_DIV=25 ⇒ 4%), and in production the divisor is the
    recall-vs-latency dial.

    Scale: identical plan to q_ann_pq_rerank plus one count() aggregate
    broadcast into the rank filter (a scalar, not a shuffle); the exact
    stage grows linearly in corpus/RSCALE_DIV."""
    return _pq_rerank_spark(spark, sf_dir, r_scaled=True)


@register(
    "q_ann_pq8_rerank",
    R11._pq_rerank_sql(k_cb=PQ8_K),
    "vector",
    "pq",
    "topk",
)
def q_ann_pq8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage PQ retrieval with an 8-BIT codebook (K={PQ8_K} entries
    per subspace — FAISS's IndexPQ default; the 4-bit search codebook is
    the small end). 64-bit codes instead of 32-bit: half the compression
    (still 32× vs raw float32), 16× finer quantization cells, so the ADC
    stage ranks with far less distortion and the SAME R=20 shortlist
    captures more of the true neighborhood — the accuracy-side knob,
    complementary to R-scaling's coverage-side knob.

    Scale: same plan as q_ann_pq_rerank — the codebook broadcast grows
    to K×S×D doubles (~1 MB, still a broadcast constant), the per-query
    LUT to S×K floats (8 KB), and the Arrow encode kernel row-chunks so
    its diff tensor stays ~64 MB per task regardless of K."""
    return _pq_rerank_spark(spark, sf_dir, k_cb=PQ8_K)


@register(
    "q_ann_pq8_rerank_rscaled",
    R11._pq_rerank_sql(r=_RSCALE_SQL, k_cb=PQ8_K),
    "vector",
    "pq",
    "topk",
)
def q_ann_pq8_rerank_rscaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both knobs together — the production configuration: 8-bit
    codebook (accuracy-side: 16× finer quantization cells) AND
    R ∝ corpus (coverage-side: the shortlist tracks the corpus). The
    measured recall@5 story (SCALE.md round-12): each knob alone decays
    or barely holds as the corpus grows; together they hold the highest
    recall at every scale. Plan properties are the union of the two
    single-knob docstrings."""
    return _pq_rerank_spark(spark, sf_dir, k_cb=PQ8_K, r_scaled=True)


def _knobs_recall_sql() -> str:
    from .registry import REGISTRY

    baseline = REGISTRY["q_ann_pq_rerank"].sql
    rscaled = R11._pq_rerank_sql(r=_RSCALE_SQL)
    pq8 = R11._pq_rerank_sql(k_cb=PQ8_K)
    pq8_rscaled = R11._pq_rerank_sql(r=_RSCALE_SQL, k_cb=PQ8_K)
    return f"""
WITH base_hits AS ({baseline}),
rscaled_hits AS ({rscaled}),
pq8_hits AS ({pq8}),
pq8_rscaled_hits AS ({pq8_rscaled}),
nd AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       FROM embeddings),
qv AS (SELECT vec_id AS q_id, v AS qv FROM nd
       WHERE vec_id < {R11.PQ_ADC_QUERIES}),
truth AS (
  SELECT q_id, vec_id FROM (
    SELECT q.q_id, e.vec_id,
           row_number() OVER (PARTITION BY q.q_id
                              ORDER BY {R11._d2_sql('q.qv', 'e.v')}, e.vec_id)
             AS rank
    FROM qv q JOIN nd e ON e.vec_id <> q.q_id
  ) WHERE rank <= {R11.PQ_ADC_K}
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
hits AS (
  SELECT 'pq_rerank_r20_k16' AS method, CAST(count(*) AS BIGINT) AS n_hit
  FROM truth t JOIN base_hits a ON t.q_id = a.q_id AND t.vec_id = a.vec_id
  UNION ALL
  SELECT 'pq_rerank_rscaled' AS method, CAST(count(*) AS BIGINT) AS n_hit
  FROM truth t JOIN rscaled_hits a ON t.q_id = a.q_id AND t.vec_id = a.vec_id
  UNION ALL
  SELECT 'pq8_rerank_r20' AS method, CAST(count(*) AS BIGINT) AS n_hit
  FROM truth t JOIN pq8_hits a ON t.q_id = a.q_id AND t.vec_id = a.vec_id
  UNION ALL
  SELECT 'pq8_rerank_rscaled' AS method, CAST(count(*) AS BIGINT) AS n_hit
  FROM truth t JOIN pq8_rscaled_hits a
    ON t.q_id = a.q_id AND t.vec_id = a.vec_id
)
SELECT method, tot.n_truth, n_hit,
       CAST(CAST(n_hit AS DOUBLE) / greatest(tot.n_truth, 1) AS REAL)
         AS recall_at_k
FROM hits CROSS JOIN tot
"""


@register(
    "q_ann_pq_knobs_recall",
    _knobs_recall_sql(),
    "llm",
    "ann",
    "eval",
    "pq",
)
def q_ann_pq_knobs_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the two PQ production knobs vs the round-11 baseline,
    against the exact squared-L2 ground truth — the measured answer to
    "does R∝corpus and/or an 8-bit codebook hold recall as the corpus
    grows?" (VERDICT r11 item 3; per-scale values in SCALE.md round-12).
    Composes the REGISTERED queries, like q_ann_pq_recall.

    Scale: ground truth is the query-set-bounded brute-force scan; the
    eval joins (n_queries × k)-row lists."""
    from .registry import REGISTRY

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.where(F.col("vec_id") < R11.PQ_ADC_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("q_id").orderBy(d2, F.col("vec_id"))
    truth = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= R11.PQ_ADC_K)
        .select("q_id", "vec_id")
    )
    tot = truth.agg(F.count("*").cast("long").alias("n_truth"))
    parts = []
    for method, qname in (
        ("pq_rerank_r20_k16", "q_ann_pq_rerank"),
        ("pq_rerank_rscaled", "q_ann_pq_rerank_rscaled"),
        ("pq8_rerank_r20", "q_ann_pq8_rerank"),
        ("pq8_rerank_rscaled", "q_ann_pq8_rerank_rscaled"),
    ):
        approx = REGISTRY[qname].fn(spark, sf_dir).select("q_id", "vec_id")
        parts.append(
            truth.join(approx, ["q_id", "vec_id"])
            .agg(F.count("*").cast("long").alias("n_hit"))
            .select(F.lit(method).alias("method"), "n_hit")
        )
    hits = parts[0]
    for pp in parts[1:]:
        hits = hits.unionAll(pp)
    return hits.crossJoin(F.broadcast(tot)).select(
        "method",
        "n_truth",
        "n_hit",
        (F.col("n_hit").cast("double") / F.greatest(F.col("n_truth"), F.lit(1)))
        .cast("float")
        .alias("recall_at_k"),
    )


# ---------------------------------------------------------------------------
# Capped top-k edit-distance join: the ~linear-output record-linkage shape
# ---------------------------------------------------------------------------

# Length-bucket width for the candidate index. A left row probes its ONE
# bucket floor(len/W); the index replicates each right row into every
# bucket any length within ±LEN_DIFF_MAX of it maps to (≤2 buckets at
# W=4), so bucketing alone loses NO pairs vs the |Δlen| filter.
ED_BUCKET_W = 4
# Deterministic per-(brand, bucket) index cap: only the ED_BLOCK_CAP
# lowest-partkey rows of a block are indexed. THIS is the knob that makes
# candidate volume linear — and the recall trade-off (see docstring).
ED_BLOCK_CAP = 50
ED_TOPK = 5


@register(
    "q_edit_distance_topk",
    f"""
WITH p AS (
  SELECT p_partkey AS id, p_brand AS brand, p_name AS name,
         length(p_name) AS len
  FROM part
),
idx AS (
  SELECT id, brand, name, len, bucket,
         row_number() OVER (PARTITION BY brand, bucket ORDER BY id) AS rn
  FROM (
    SELECT id, brand, name, len,
           unnest(generate_series(
             CAST(floor((len - {LEN_DIFF_MAX}) / {ED_BUCKET_W}) AS BIGINT),
             CAST(floor((len + {LEN_DIFF_MAX}) / {ED_BUCKET_W}) AS BIGINT)
           )) AS bucket
    FROM p
  )
),
cand AS (
  SELECT a.id AS id_a, i.id AS id_b, a.brand,
         levenshtein(a.name, i.name) AS dist
  FROM p a JOIN idx i
    ON i.brand = a.brand
   AND i.bucket = CAST(floor(a.len / {ED_BUCKET_W}) AS BIGINT)
   AND i.rn <= {ED_BLOCK_CAP}
   AND i.id <> a.id
  WHERE abs(a.len - i.len) <= {LEN_DIFF_MAX}
    AND levenshtein(a.name, i.name) <= {EDIT_MAX}
)
SELECT id_a, id_b, brand, CAST(dist AS BIGINT) AS dist,
       CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY id_a ORDER BY dist, id_b)
            AS rank
  FROM cand
)
WHERE rank <= {ED_TOPK}
""",
    "dedup",
    "string",
    "topk",
)
def q_edit_distance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-left-row top-k fuzzy matches with a CAPPED candidate index —
    the 100×-safe sibling of q_edit_distance_join (VERDICT r11 item 4:
    that query's OUTPUT grows quadratically in sf because brand-block
    sizes scale linearly with the corpus; at 100× the result set itself
    is the bottleneck, whatever the plan does).

    Three stacked bounds make both candidate volume and output ~linear:
    (1) a (brand, length-bucket) index — each right row is replicated
    into the ≤2 width-{ED_BUCKET_W} buckets covering its ±{LEN_DIFF_MAX}
    length window, so bucketing loses nothing vs the |Δlen| filter;
    (2) a deterministic per-block cap (the {ED_BLOCK_CAP} lowest-partkey
    rows per (brand, bucket)) bounding candidates per left row at
    {ED_BLOCK_CAP}; (3) per-left-row top-{ED_TOPK} by (dist, id_b).
    Recall trade-off, stated honestly: a true match ranked past the
    block cap by partkey order is missed — the production dial is CAP
    (raise it) or a finer blocking key (q-gram prefix); the UNCAPPED
    exhaustive pair set remains available as q_edit_distance_join.

    Scale: the index is an equi-join key (brand, bucket) with ≤CAP rows
    per key — the shuffle is corpus-linear and skew-proof by
    construction; the DP work is ≤CAP×n levenshteins; the top-k window
    partitions by id_a with ≤CAP rows each. Output ≤ {ED_TOPK}×n rows
    (measured growth table in SCALE.md round-12)."""
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("id"),
        F.col("p_brand").alias("brand"),
        F.col("p_name").alias("name"),
        F.length("p_name").alias("len"),
    )
    lo = F.floor((F.col("len") - LEN_DIFF_MAX) / ED_BUCKET_W)
    hi = F.floor((F.col("len") + LEN_DIFF_MAX) / ED_BUCKET_W)
    w_idx = Window.partitionBy("brand", "bucket").orderBy("id_b")
    idx = (
        part.select(
            F.col("id").alias("id_b"),
            "brand",
            F.col("name").alias("name_b"),
            F.col("len").alias("len_b"),
            F.explode(F.sequence(lo, hi)).alias("bucket"),
        )
        .withColumn("rn", F.row_number().over(w_idx))
        .where(F.col("rn") <= ED_BLOCK_CAP)
    )
    probe = part.select(
        F.col("id").alias("id_a"),
        "brand",
        F.col("name").alias("name_a"),
        F.col("len").alias("len_a"),
        F.floor(F.col("len") / ED_BUCKET_W).alias("bucket"),
    )
    cand = (
        probe.join(idx, ["brand", "bucket"])
        .where(F.col("id_a") != F.col("id_b"))
        .where(F.abs(F.col("len_a") - F.col("len_b")) <= LEN_DIFF_MAX)
        # Thresholded levenshtein (early-exits past EDIT_MAX, returns -1)
        # computed once in the projection, as in q_edit_distance_join.
        .withColumn(
            "dist", F.levenshtein("name_a", "name_b", EDIT_MAX).cast("long")
        )
        .where(F.col("dist") >= 0)
    )
    w_k = Window.partitionBy("id_a").orderBy(F.col("dist"), F.col("id_b"))
    return (
        cand.select("id_a", "id_b", "brand", "dist")
        .withColumn("rank", F.row_number().over(w_k).cast("long"))
        .where(F.col("rank") <= ED_TOPK)
    )
