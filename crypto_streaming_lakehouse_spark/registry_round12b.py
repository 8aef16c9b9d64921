"""Round-12 (continuation): retrieval-training data mining on top of the
ANN stack — the three operators an embedding-training pipeline runs
after the index exists.

- **Hard-negative mining** (`q_hard_negative_mining`): for each query,
  the candidates just OUTSIDE its positive set whose similarity is
  within a margin of the weakest positive — the contrastive-training
  staple (triplet/InfoNCE negatives are mined exactly this way: "close
  enough to be confusing, not close enough to be positives"). Positives
  = exact top-POS_K by cosine; negatives = rank in (POS_K, MAX_RANK]
  with cosine ≥ s_POS_K − MARGIN, where s_POS_K is that query's own
  weakest-positive score — a per-query ADAPTIVE threshold, not a global
  constant. The MAX_RANK cap bounds output at (MAX_RANK−POS_K)×queries
  rows regardless of corpus size; in production the candidate band
  comes from the IVF/ADC shortlist (registry_round11) instead of the
  exact ranking, so the mine piggybacks on the index the trainer
  already built.
- **MMR diversified re-rank** (`q_mmr_rerank`): maximal marginal
  relevance (Carbonell & Goldstein) — greedily pick PICKS results per
  query maximizing λ·rel(d) − (1−λ)·max_{s∈picked} sim(d, s) over a
  top-CAND candidate shortlist. The deduplicating re-rank every
  retrieval/curation stack runs after candidate generation (RRF fusion
  itself is already registered as q_rrf_fusion, round 6 — MMR is the
  step AFTER it). The greedy loop unrolls to PICKS fixed stages over
  per-query tables bounded at CAND rows, so every stage is a bounded
  window + broadcast join no matter the corpus size; both engines
  spell the stage score with the same literals (0.7·rel − 0.3·maxsim)
  over bit-identical cosines, so the argmax tie-break is deterministic
  across engines.
- **BPE merge induction, round 1** (`q_bpe_merge_induction`): the
  pair-counting step of byte-pair-encoding vocabulary learning — count
  adjacent character pairs inside every corpus word, emit the top
  merges. This is THE canonical map-side-combinable aggregation: the
  key domain is bounded (alphabet²) no matter the corpus size, so at
  100 TB it is one scan + a tiny combine tree. Full BPE iterates with
  re-segmentation after each merge; this registers the corpus-scale
  round-1 statistics (the part that touches all the data — subsequent
  rounds work on the shrinking merged-symbol stream).

Reference parity note: the reference has no retrieval or tokenizer
operators (SURVEY.md §2 — its surface is the crypto OHLCV pipeline,
reference/spark/jobs/*.py); these extend the LLM-training-data family
the build mandate adds on top (SURVEY §6), alongside extensions/
similarity.py and registry_llm.py.

Registry conventions as everywhere (registry.py): dot products fold
sequentially in index order on both engines; compared floats are
float32-canonicalized via r6; window tie-breaks are total orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .extensions import similarity as S
from .registry import r6, register
from .registry_ext import EMB_CTE, _dot_sql
from .sources.tables import load_table

HN_N_QUERIES = 10  # same query set as the whole ANN family (vec_id < 10)
HN_POS_K = 5  # positives = exact top-5 (the q_ann_cosine_topk contract)
HN_MARGIN = 0.05  # semi-hard band: within 0.05 cosine of the weakest positive
HN_MAX_RANK = 50  # candidate band bound — output ≤ 45×queries at ANY corpus

MMR_N_QUERIES = 10  # same query set as the ANN family
MMR_CAND = 20  # candidate shortlist per query (top-CAND by cosine)
MMR_PICKS = 3  # greedy picks per query (stages are unrolled PICKS deep)
# λ and (1−λ) are written as the SAME literals in both engines so the
# stage scores are bit-identical (never compute 1−λ at runtime).
MMR_LAMBDA_SQL = "0.7"
MMR_ONE_MINUS_LAMBDA_SQL = "0.3"

BPE_TOP = 20


# ---------------------------------------------------------------------------
# Hard-negative mining
# ---------------------------------------------------------------------------


def _hard_negative_sql() -> str:
    return (
        EMB_CTE
        + f"""
, q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n
        WHERE vec_id < {HN_N_QUERIES})
, scored AS (
  SELECT q.q_id, n.vec_id,
         {_dot_sql('q.qv', 'n.v')} / (q.qn * n.nrm) AS cosine
  FROM q JOIN n ON n.vec_id <> q.q_id
)
, ranked AS (
  SELECT *, row_number() OVER
    (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
)
, weakest AS (SELECT q_id, cosine AS s_pos FROM ranked WHERE rank = {HN_POS_K})
SELECT r.q_id, r.vec_id, CAST(r.cosine AS REAL) AS cosine,
       CAST(r.rank AS BIGINT) AS rank,
       CAST(w.s_pos - r.cosine AS REAL) AS margin_gap
FROM ranked r JOIN weakest w USING (q_id)
WHERE r.rank > {HN_POS_K} AND r.rank <= {HN_MAX_RANK}
  AND CAST(r.cosine AS REAL) >= CAST(w.s_pos - {HN_MARGIN} AS REAL)
"""
    )


def _band_from_queries(e: DataFrame, q: DataFrame) -> DataFrame:
    """The mining core given a query table ``q`` (q_id, qv, qn) and a
    normed corpus ``e`` (vec_id, v, norm): exact cosine rank window +
    per-query adaptive margin band. Factored out so the band is
    re-minable PER MICRO-BATCH over a static index — each query's band
    depends only on its own scores, so mining a query subset and
    unioning equals mining all queries at once
    (tests/test_streaming.py::test_streaming_hard_negative_mining)."""
    scored = (
        F.broadcast(q)
        .join(e, F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            (
                S._dot(F.col("qv"), F.col("v"))
                / (F.col("qn") * F.col("norm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), "vec_id")
    ranked = scored.withColumn("rank", F.row_number().over(w))
    weakest = ranked.where(F.col("rank") == HN_POS_K).select(
        "q_id", F.col("cosine").alias("s_pos")
    )
    return (
        ranked.join(F.broadcast(weakest), "q_id")
        .where(
            (F.col("rank") > HN_POS_K)
            & (F.col("rank") <= HN_MAX_RANK)
            & (
                F.col("cosine").cast("float")
                >= (F.col("s_pos") - F.lit(HN_MARGIN)).cast("float")
            )
        )
        .select(
            "q_id",
            "vec_id",
            r6("cosine", "cosine"),
            F.col("rank").cast("long").alias("rank"),
            r6(F.col("s_pos") - F.col("cosine"), "margin_gap"),
        )
    )


@register("q_hard_negative_mining", _hard_negative_sql(), "llm", "ann", "mining")
def q_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-hard negatives per query: candidates ranked (POS_K, MAX_RANK]
    whose cosine is within HN_MARGIN of that query's weakest positive.

    Plan: one broadcast of the query rows against the corpus scan (the
    exact q_ann_cosine_topk shape), one rank window partitioned by
    q_id, and a POS_K-row broadcast join for the per-query threshold —
    no shuffle grows with corpus size except the bounded top-MAX_RANK
    window. The margin compare happens on float32-canonicalized values
    on BOTH engines so the band edge cannot flap on last-ulp noise."""
    e = S.with_norm(load_table(spark, sf_dir, "embeddings"))
    q = e.where(F.col("vec_id") < HN_N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
    )
    return _band_from_queries(e, q)


# ---------------------------------------------------------------------------
# MMR diversified re-rank
# ---------------------------------------------------------------------------


def _mmr_sql(
    n_queries: int = MMR_N_QUERIES,
    cand: int = MMR_CAND,
    picks: int = MMR_PICKS,
) -> str:
    """Unrolled greedy-MMR oracle, parameterized over (n_queries, CAND,
    PICKS) so the round-13 production-parameter variant
    (q_mmr_rerank_wide, CAND=100/PICKS=10) shares one spelling with the
    fixture-sized default.

    Deep unrolls (picks > 3) spell the shared CTEs ``MATERIALIZED``:
    stage t references cand/sim and every earlier pick, so with DuckDB's
    default CTE inlining the plan subtrees (and parquet scans) replicate
    ~2^t-fold — at PICKS=10 the inlined plan exhausted the fd limit
    before it could run. Materializing is the oracle-side twin of the
    Spark builder's cut=True lineage cuts and changes no values."""
    mat = "MATERIALIZED " if picks > 3 else ""
    lam, oml = MMR_LAMBDA_SQL, MMR_ONE_MINUS_LAMBDA_SQL
    head = (
        EMB_CTE
        + f"""
, q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n
        WHERE vec_id < {n_queries})
, scored AS (
  SELECT q.q_id, n.vec_id,
         {_dot_sql('q.qv', 'n.v')} / (q.qn * n.nrm) AS rel
  FROM q JOIN n ON n.vec_id <> q.q_id
)
, cand AS {mat}(
  SELECT q_id, vec_id, rel FROM (
    SELECT *, row_number() OVER
      (PARTITION BY q_id ORDER BY rel DESC, vec_id) AS rnk
    FROM scored
  ) WHERE rnk <= {cand}
)
, sim AS {mat}(
  SELECT a.q_id, a.vec_id AS da, b.vec_id AS db,
         {_dot_sql('na.v', 'nb.v')} / (na.nrm * nb.nrm) AS s
  FROM cand a JOIN cand b ON a.q_id = b.q_id AND a.vec_id <> b.vec_id
  JOIN n na ON na.vec_id = a.vec_id
  JOIN n nb ON nb.vec_id = b.vec_id
)
, p1 AS {mat}(
  SELECT q_id, vec_id, {lam} * rel AS score FROM (
    SELECT *, row_number() OVER
      (PARTITION BY q_id ORDER BY rel DESC, vec_id) AS rnk
    FROM cand
  ) WHERE rnk = 1
)
"""
    )
    stages = []
    for t in range(2, picks + 1):
        prev = " UNION ALL ".join(
            f"SELECT q_id, vec_id FROM p{i}" for i in range(1, t)
        )
        stages.append(
            f"""
, picked{t} AS {mat}({prev})
, m{t} AS {mat}(
  SELECT c.q_id, c.vec_id, c.rel, max(s.s) AS msim
  FROM cand c
  JOIN sim s ON s.q_id = c.q_id AND s.da = c.vec_id
  JOIN picked{t} p ON p.q_id = s.q_id AND p.vec_id = s.db
  WHERE NOT EXISTS (SELECT 1 FROM picked{t} x
                    WHERE x.q_id = c.q_id AND x.vec_id = c.vec_id)
  GROUP BY c.q_id, c.vec_id, c.rel
)
, p{t} AS {mat}(
  SELECT q_id, vec_id, score FROM (
    SELECT q_id, vec_id, {lam} * rel - {oml} * msim AS score,
           row_number() OVER (PARTITION BY q_id
             ORDER BY {lam} * rel - {oml} * msim DESC, vec_id) AS rnk
    FROM m{t}
  ) WHERE rnk = 1
)
"""
        )
    tail = " UNION ALL ".join(
        f"SELECT q_id, vec_id, CAST({t} AS BIGINT) AS pick_rank,"
        f" CAST(score AS REAL) AS mmr FROM p{t}"
        for t in range(1, picks + 1)
    )
    return head + "".join(stages) + tail


def _mmr_spark(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = MMR_N_QUERIES,
    cand_n: int = MMR_CAND,
    picks_n: int = MMR_PICKS,
    cut: bool = False,
) -> DataFrame:
    """Greedy MMR unrolled to ``picks_n`` stages (shared by q_mmr_rerank
    and the round-13 q_mmr_rerank_wide). ``cut=True`` materializes the
    candidate/sim tables and every stage's 1-row-per-query pick behind a
    lineage cut (memo_materialize): stage t's plan references every
    earlier pick, so WITHOUT a cut the logical-plan subtrees replicate
    ~2^t-fold — fine at PICKS=3, pathological at PICKS=10. All cut
    tables are CAND- or n_queries-bounded (kilobytes at any corpus)."""
    from .extensions.dedup import memo_materialize

    memo_key = f"mmr:{sf_dir}:q{n_queries}:c{cand_n}:p{picks_n}"

    def _cut(key: str, df: DataFrame) -> DataFrame:
        if not cut:
            return df
        return memo_materialize(spark, f"{memo_key}:{key}", lambda: df)

    e = S.with_norm(load_table(spark, sf_dir, "embeddings"))
    q = e.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
    )
    scored = (
        F.broadcast(q)
        .join(e, F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            (
                S._dot(F.col("qv"), F.col("v"))
                / (F.col("qn") * F.col("norm"))
            ).alias("rel"),
        )
    )
    w_rel = Window.partitionBy("q_id").orderBy(F.col("rel").desc(), "vec_id")
    cand = _cut(
        "cand",
        scored.withColumn("rnk", F.row_number().over(w_rel))
        .where(F.col("rnk") <= cand_n)
        .select("q_id", "vec_id", "rel"),
    )
    vecs = e.select("vec_id", "v", "norm")
    ca = cand.select("q_id", F.col("vec_id").alias("da"))
    cb = cand.select("q_id", F.col("vec_id").alias("db"))
    sim = (
        ca.join(cb, "q_id")
        .where(F.col("da") != F.col("db"))
        .join(vecs.select(F.col("vec_id").alias("da"), F.col("v").alias("va"), F.col("norm").alias("na")), "da")
        .join(vecs.select(F.col("vec_id").alias("db"), F.col("v").alias("vb"), F.col("norm").alias("nb")), "db")
        .select(
            "q_id",
            "da",
            "db",
            (S._dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("s"),
        )
    )
    sim = _cut("sim", sim)
    lam, oml = float(MMR_LAMBDA_SQL), float(MMR_ONE_MINUS_LAMBDA_SQL)
    p1 = _cut(
        "p1",
        cand.withColumn("rnk", F.row_number().over(w_rel))
        .where(F.col("rnk") == 1)
        .select("q_id", "vec_id", (F.lit(lam) * F.col("rel")).alias("score")),
    )
    picks = [p1]
    for _t in range(2, picks_n + 1):
        picked = picks[0].select("q_id", "vec_id")
        for p in picks[1:]:
            picked = picked.unionAll(p.select("q_id", "vec_id"))
        rem = cand.join(picked, ["q_id", "vec_id"], "left_anti")
        msim = (
            rem.join(
                sim.withColumnRenamed("da", "vec_id"), ["q_id", "vec_id"]
            )
            .join(
                F.broadcast(picked.withColumnRenamed("vec_id", "db")),
                ["q_id", "db"],
            )
            .groupBy("q_id", "vec_id", "rel")
            .agg(F.max("s").alias("msim"))
        )
        stage_score = F.lit(lam) * F.col("rel") - F.lit(oml) * F.col("msim")
        w_mmr = Window.partitionBy("q_id").orderBy(
            stage_score.desc(), "vec_id"
        )
        picks.append(
            _cut(
                f"p{_t}",
                msim.withColumn("rnk", F.row_number().over(w_mmr))
                .where(F.col("rnk") == 1)
                .select("q_id", "vec_id", stage_score.alias("score")),
            )
        )
    out = None
    for t, p in enumerate(picks, start=1):
        part = p.select(
            "q_id",
            "vec_id",
            F.lit(t).cast("long").alias("pick_rank"),
            r6("score", "mmr"),
        )
        out = part if out is None else out.unionAll(part)
    return out


@register("q_mmr_rerank", _mmr_sql(), "llm", "retrieval")
def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance re-rank: greedily pick MMR_PICKS
    results per query maximizing 0.7·rel − 0.3·max-sim-to-picked over
    the top-MMR_CAND cosine shortlist (pick 1 maximizes bare 0.7·rel,
    the empty-picked-set case of the same objective).

    Plan: candidate generation is the q_ann_cosine_topk shape (bounded
    query broadcast × corpus scan + one top-CAND window). Everything
    after operates on per-query tables bounded at CAND rows — the
    candidate-pair sim table is ≤ CAND²×queries rows and each unrolled
    greedy stage is one aggregate + one 1-row-per-query window, all
    independent of corpus size. The greedy loop is PICKS fixed stages,
    so the plan depth is a compile-time constant, not data-driven.
    Production parameters (CAND=100, PICKS=10) run as the round-13
    q_mmr_rerank_wide through this same builder."""
    return _mmr_spark(spark, sf_dir)


# ---------------------------------------------------------------------------
# BPE merge induction (round-1 pair statistics)
# ---------------------------------------------------------------------------

_BPE_SQL = rf"""
WITH words AS (
  SELECT w FROM (
    SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
    FROM documents
  ) WHERE len(w) >= 2
),
pairs AS (
  SELECT substr(w, CAST(i AS INTEGER), 2) AS pair
  FROM words, unnest(generate_series(1, len(w) - 1)) AS t(i)
),
counted AS (
  SELECT pair, CAST(count(*) AS BIGINT) AS cnt FROM pairs GROUP BY pair
)
SELECT pair, cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS BIGINT) AS merge_rank
FROM counted
QUALIFY merge_rank <= {BPE_TOP}
"""


@register("q_bpe_merge_induction", _BPE_SQL, "llm", "tokenize")
def q_bpe_merge_induction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-BPE_TOP adjacent character-pair counts inside corpus words —
    the first merge round of BPE vocabulary learning.

    Plan: tokenize scan → per-word pair explode → hash agg on a key
    domain bounded by alphabet² (map-side combine collapses each
    partition to at most that many rows before any shuffle) → one
    top-k window over the tiny counted table. Counts are integers:
    exact at every scale. Later BPE rounds re-segment the shrinking
    symbol stream; round 1 is the only full-corpus pass."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w")
    words = docs.select(w).where(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(F.count("*").cast("long").alias("cnt"))
    return (
        counted.withColumn(
            "merge_rank",
            F.row_number().over(Window.orderBy(F.col("cnt").desc(), "pair")),
        )
        .where(F.col("merge_rank") <= BPE_TOP)
        .select("pair", "cnt", F.col("merge_rank").cast("long").alias("merge_rank"))
    )
