"""Round-13: the two remaining prose claims of round 12 become measured
code (VERDICT r12 items 1–2), plus the MMR production-parameter variant
(item 4).

- **Hard-negative mining from the index** (two compositions): round
  12's q_hard_negative_mining docstring claimed "in production the
  candidate band comes from the IVF/ADC shortlist instead of the exact
  ranking, so the mine piggybacks on the index the trainer already
  built" — these register that composition BOTH ways and measure which
  one production should run:
  - `q_hard_negative_mining_ivfpq`: the full IVF-PQ pipeline as the
    candidate source (coarse cells prune to N_PROBE probed cells,
    4-bit PQ-ADC ranks the probed candidates, top-HN_MAX_RANK survive,
    exact cosine re-ranks the shortlist, the semi-hard band is mined
    within it). MEASURED FINDING: with the untrained cells this
    recovers only 0.04–0.08 of the band; the trained-cell variant
    (`q_hard_negative_mining_ivfpq_trained`, added in the same round)
    attributes the loss — k-means cells lift it to 0.58/0.54/0.24,
    so most of the untrained loss is centroid quality, but even good
    cells decay with corpus size while the gate-free code scan holds.
  - `q_hard_negative_mining_adc8`: the production configuration —
    full-corpus ADC scan over 8-BIT codes (round 12's PQ8_K codebook)
    with the R∝corpus shortlist (RSCALE_DIV), then the same exact
    cosine re-rank + band tail. Codes are 32×-compressed, so scanning
    ALL of them is cheap (that is the point of PQ), and no cell gate
    excludes band members. Band recall 0.91 / 0.70 / 0.56 across the
    three scales — both round-12 knobs earn their keep again here.
- **Band recall eval** (`q_hard_negative_band_recall`): the fraction of
  the EXACT semi-hard band (q_hard_negative_mining) each index-driven
  miner recovers — the measured recall cost of mining from the index
  instead of the exact ranking, one row per method (SCALE.md round-13
  records per-scale values). Composes the REGISTERED queries, like
  q_ann_pq_recall.
- **BPE merge round 2** (`q_bpe_merge_round2`): apply
  q_bpe_merge_induction's top-1 merge, re-segment every word's symbol
  stream (greedy leftmost non-overlapping — the BPE merge rule), and
  count round-2 adjacent SYMBOL pairs. Proves round 12's "subsequent
  rounds work on the shrinking merged-symbol stream" claim and
  exercises the interesting part of BPE: the re-segmentation. At round
  2 every pre-merge symbol is a single character, so a literal
  string-replace of the merge pair with a reserved sentinel character
  IS the greedy symbol merge (both engines' replace() scans leftmost,
  non-overlapping); symbol pairs are then adjacent sentinel-mapped
  characters. Output is (sym1, sym2) pairs — NOT concatenated — because
  e.g. merge "aa" makes ("a","aa") and ("aa","a") distinct symbol pairs
  with identical concatenations. Pinned by the pure-Python symbol-list
  recount in tests/test_round13.py (which also proves the sentinel
  never collides with corpus text).
- **MMR at production parameters** (`q_mmr_rerank_wide`): the round-12b
  greedy MMR with CAND=100/PICKS=10 (fixture CAND=20/PICKS=3 is toy) —
  same parameterized builder and unrolled oracle, with the candidate /
  sim / per-stage pick tables materialized behind lineage cuts so the
  10-deep greedy unroll keeps a linear-size plan. The CAND²×queries sim
  table is the quadratic-in-CAND piece the SCALE.md round-13 row
  measures; CAND is the quality-vs-cost dial, corpus size is not a
  factor after candidate generation.

Reference parity note: the reference has no retrieval or tokenizer
operators (SURVEY.md §2 — its surface is the crypto OHLCV pipeline,
reference/spark/jobs/*.py); these extend the LLM-training-data family
the build mandate adds (SURVEY §6).

Registry conventions as everywhere (registry.py): dot products fold
sequentially in index order on both engines; compared floats are
float32-canonicalized via r6; window tie-breaks are total orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import registry_round11 as R11
from . import registry_round12 as R12
from . import registry_round12b as R12B
from .extensions import similarity as S
from .registry import r6, register
from .registry_ext import _dot_sql
from .registry_round12b import (
    BPE_TOP,
    HN_MARGIN,
    HN_MAX_RANK,
    HN_N_QUERIES,
    HN_POS_K,
)
from .sources.tables import load_table

# MMR production parameters (VERDICT r12 item 4): candidate shortlist
# and pick depth at retrieval-production scale. CAND drives the sim
# table quadratically (CAND²×queries rows); PICKS drives the unrolled
# stage count linearly.
MMR_WIDE_CAND = 100
MMR_WIDE_PICKS = 10

# Reserved single-character sentinel standing in for the round-1 merged
# symbol during round-2 re-segmentation. Never appears in the corpus
# (asserted by the pure-Python cross-check in tests/test_round13.py);
# both engines use the SAME character, so even a pathological collision
# would be consistent across engines — the test, not the hash, is the
# collision guard.
BPE_SENTINEL = "\x01"


# ---------------------------------------------------------------------------
# Hard-negative mining over the IVF-PQ shortlist
# ---------------------------------------------------------------------------


def _hn_ivfpq_sql() -> str:
    """The q_ann_ivfpq_topk CTE chain (cells → probes → ADC → shortlist)
    with a cosine re-rank and the q_hard_negative_mining band tail."""
    from .registry_round6 import PQ_SUBS

    cents = ", ".join(
        "({}, [{}])".format(
            c, ", ".join(repr(S.centroid_component(c, d)) for d in range(64))
        )
        for c in range(S.N_CELLS)
    )
    return f"""
WITH {R11._pq_code_ctes()},
lut AS (
  SELECT vec_id AS q_id, list(d2 ORDER BY s, cid) AS lut
  FROM scored WHERE vec_id < {HN_N_QUERIES} GROUP BY vec_id
),
ivf_cents AS (SELECT * FROM (VALUES {cents}) AS c(cell, cv)),
nd AS (
  SELECT vec_id, v, sqrt({_dot_sql('v', 'v')}) AS nrm
  FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings)
),
cellranked AS (
  SELECT n.vec_id, c.cell,
         row_number() OVER (PARTITION BY n.vec_id
                            ORDER BY {_dot_sql('n.v', 'c.cv')} DESC, c.cell)
           AS cell_rank
  FROM nd n CROSS JOIN ivf_cents c
),
cell_assign AS (SELECT vec_id, cell FROM cellranked WHERE cell_rank = 1),
qprobes AS (
  SELECT vec_id AS q_id, cell AS q_cell FROM cellranked
  WHERE vec_id < {HN_N_QUERIES} AND cell_rank <= {S.N_PROBE}
),
adc AS (
  SELECT p.q_id, ca.vec_id,
         list_reduce(list_transform(generate_series(1, {PQ_SUBS}),
           s -> CAST(q.lut[(s - 1) * {R11.PQ_SEARCH_K}
                           + CAST(c.codes[s] AS INT) + 1] AS DOUBLE)),
           (acc, x) -> acc + x) AS adc
  FROM qprobes p
  JOIN cell_assign ca ON ca.cell = p.q_cell AND ca.vec_id <> p.q_id
  JOIN codes c ON c.vec_id = ca.vec_id
  JOIN lut q ON q.q_id = p.q_id
),
shortlist AS (
  SELECT q_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id)
              AS srank
    FROM adc
  ) WHERE srank <= {HN_MAX_RANK}
),
qs AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM nd
       WHERE vec_id < {HN_N_QUERIES}),
rr AS (
  SELECT s.q_id, s.vec_id,
         {_dot_sql('q.qv', 'e.v')} / (q.qn * e.nrm) AS cosine
  FROM shortlist s
  JOIN nd e ON e.vec_id = s.vec_id
  JOIN qs q ON q.q_id = s.q_id
),
ranked AS (
  SELECT *, row_number() OVER
    (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
  FROM rr
),
weakest AS (SELECT q_id, cosine AS s_pos FROM ranked WHERE rank = {HN_POS_K})
SELECT r.q_id, r.vec_id, CAST(r.cosine AS REAL) AS cosine,
       CAST(r.rank AS BIGINT) AS rank,
       CAST(w.s_pos - r.cosine AS REAL) AS margin_gap
FROM ranked r JOIN weakest w USING (q_id)
WHERE r.rank > {HN_POS_K} AND r.rank <= {HN_MAX_RANK}
  AND CAST(r.cosine AS REAL) >= CAST(w.s_pos - {HN_MARGIN} AS REAL)
"""


@register(
    "q_hard_negative_mining_ivfpq",
    _hn_ivfpq_sql(),
    "llm",
    "ann",
    "mining",
    "pq",
)
def q_hard_negative_mining_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-hard negative mining where the candidate band comes from the
    full IVF-PQ serving pipeline. Coarse cells prune the corpus to the
    query's probed cells, PQ-ADC ranks those from 4-bit codes, the
    top-HN_MAX_RANK shortlist pays an exact cosine re-rank, and the
    semi-hard band (rank in (POS_K, MAX_RANK], cosine within HN_MARGIN
    of the shortlist's weakest positive) is mined from that re-ranked
    shortlist. A query whose probed cells hold fewer than POS_K
    candidates mines nothing — identically on both engines.

    Scale: the exact miner's brute-force cosine scan (corpus ×
    n_queries) is replaced by the index read path — codes of probed
    cells (~n_probe/n_cells of the corpus, 32 bits each) plus
    HN_MAX_RANK raw rows per query for the re-rank. Everything after
    the shortlist is bounded at MAX_RANK×n_queries rows.

    MEASURED FINDING (q_hard_negative_band_recall): this shape recovers
    only 0.04–0.08 of the exact semi-hard band at every scale. The
    trained-cell variant (q_hard_negative_mining_ivfpq_trained)
    attributes the loss: with k-means cells the same gate recovers
    0.58/0.54/0.24 — so most of THIS composition's loss is the
    untrained quantizer's cell quality — but even good cells decay
    with corpus size (the band spreads across cells as ranks 5–50
    widen in absolute distance), while the gate-free full-code scan
    (q_hard_negative_mining_adc8, 0.56–0.91) holds at every scale.
    Production conclusion: mine from the code scan, serve from the
    cells. This composition stays registered as the measured floor.

    Oracle-exact: cell ranking, ADC sums, and cosine folds are the
    registry's bit-identical spellings (registry_round11); the margin
    compare happens on float32-canonicalized values on BOTH engines."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    scored = emb.withColumn("scores", S._cell_scores("v", 64))
    best_cell = (
        F.array_position(F.col("scores"), F.array_max(F.col("scores"))) - 1
    ).cast("int")
    assignment = scored.select("vec_id", best_cell.alias("cell"))
    probes = (
        scored.where(F.col("vec_id") < HN_N_QUERIES)
        .select(
            F.col("vec_id").alias("q_id"),
            F.explode(
                F.slice(
                    F.array_sort(
                        F.transform(
                            F.col("scores"),
                            lambda s, i: F.struct(
                                (-s).alias("ns"), i.alias("cell")
                            ),
                        )
                    ),
                    1,
                    S.N_PROBE,
                )
            ).alias("p"),
        )
        .select("q_id", F.col("p.cell").alias("q_cell"))
    )
    codes_df, q_df = R11._pq_enc(spark, sf_dir, n_queries=HN_N_QUERIES)
    cand = (
        probes.join(
            assignment,
            (F.col("cell") == F.col("q_cell"))
            & (F.col("vec_id") != F.col("q_id")),
        )
        .select("q_id", "vec_id")
        .join(codes_df, "vec_id")
        .join(F.broadcast(q_df), "q_id")
    )
    w_adc = Window.partitionBy("q_id").orderBy(F.col("adc"), F.col("vec_id"))
    shortlist = (
        cand.select("q_id", "vec_id", R11._adc_expr().alias("adc"))
        .withColumn("srank", F.row_number().over(w_adc))
        .where(F.col("srank") <= HN_MAX_RANK)
        .select("q_id", "vec_id")
    )
    e = S.with_norm(load_table(spark, sf_dir, "embeddings"))
    q = e.where(F.col("vec_id") < HN_N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
    )
    rr = (
        shortlist.join(e, "vec_id")
        .join(F.broadcast(q), "q_id")
        .select(
            "q_id",
            "vec_id",
            (
                S._dot(F.col("qv"), F.col("v"))
                / (F.col("qn") * F.col("norm"))
            ).alias("cosine"),
        )
    )
    w_cos = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), "vec_id")
    ranked = rr.withColumn("rank", F.row_number().over(w_cos))
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


# R-scaled mining shortlist: R = max(HN_MAX_RANK, corpus // RSCALE_DIV)
# — the round-12 coverage knob with the mining band as the floor.
_HN_RSCALE_SQL = (
    f"greatest({HN_MAX_RANK}, (SELECT count(*) FROM embeddings)"
    f" // {R12.RSCALE_DIV})"
)


def _hn_adc8_sql() -> str:
    """Full-corpus 8-bit ADC shortlist (no cell gate) + exact cosine
    re-rank + the q_hard_negative_mining band tail."""
    return f"""
WITH {R11._pq_adc_ctes(HN_N_QUERIES, R12.PQ8_K)},
shortlist AS (
  SELECT q_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id)
              AS srank
    FROM adc
  ) WHERE srank <= {_HN_RSCALE_SQL}
),
nd AS (
  SELECT vec_id, v, sqrt({_dot_sql('v', 'v')}) AS nrm
  FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings)
),
qs AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM nd
       WHERE vec_id < {HN_N_QUERIES}),
rr AS (
  SELECT s.q_id, s.vec_id,
         {_dot_sql('q.qv', 'e.v')} / (q.qn * e.nrm) AS cosine
  FROM shortlist s
  JOIN nd e ON e.vec_id = s.vec_id
  JOIN qs q ON q.q_id = s.q_id
),
ranked AS (
  SELECT *, row_number() OVER
    (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
  FROM rr
),
weakest AS (SELECT q_id, cosine AS s_pos FROM ranked WHERE rank = {HN_POS_K})
SELECT r.q_id, r.vec_id, CAST(r.cosine AS REAL) AS cosine,
       CAST(r.rank AS BIGINT) AS rank,
       CAST(w.s_pos - r.cosine AS REAL) AS margin_gap
FROM ranked r JOIN weakest w USING (q_id)
WHERE r.rank > {HN_POS_K} AND r.rank <= {HN_MAX_RANK}
  AND CAST(r.cosine AS REAL) >= CAST(w.s_pos - {HN_MARGIN} AS REAL)
"""


@register(
    "q_hard_negative_mining_adc8",
    _hn_adc8_sql(),
    "llm",
    "ann",
    "mining",
    "pq",
)
def q_hard_negative_mining_adc8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-hard negative mining from the PRODUCTION index path: a
    full-corpus ADC scan over 8-bit PQ codes (round 12's PQ8_K
    codebook) with the R∝corpus shortlist
    (R = max(HN_MAX_RANK, corpus // RSCALE_DIV)), then the exact cosine
    re-rank and the same adaptive-margin band tail as
    q_hard_negative_mining. No cell gate: PQ codes are 32×-compressed,
    so scanning ALL of them is the cheap part — that is precisely why
    PQ exists — and nothing structurally excludes band members the way
    IVF cell pruning does (the q_hard_negative_mining_ivfpq finding).

    Band recall vs the exact miner (q_hard_negative_band_recall):
    0.91 / 0.70 / 0.56 at sf0.001/0.01/0.1 — both round-12 knobs (8-bit
    codes for ranking fidelity, R-scaling for shortlist coverage)
    transfer from top-k serving to band mining.

    Scale: one code-table scan per query batch (broadcast LUTs, the
    q_ann_pq8_rerank plan) + R×n_queries raw-vector reads for the
    re-rank; the band tail is bounded at MAX_RANK×n_queries rows. The
    R filter folds a 1-row count aggregate into the rank predicate —
    fully declarative, one query text at every corpus size."""
    codes_df, q_df = R11._pq_enc(
        spark, sf_dir, k_cb=R12.PQ8_K, n_queries=HN_N_QUERIES
    )
    pairs = codes_df.join(F.broadcast(q_df), F.col("vec_id") != F.col("q_id"))
    w_adc = Window.partitionBy("q_id").orderBy(F.col("adc"), F.col("vec_id"))
    ranked_adc = pairs.select(
        "q_id", "vec_id", R11._adc_expr(R12.PQ8_K).alias("adc")
    ).withColumn("srank", F.row_number().over(w_adc))
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    tot = emb.agg(F.count("*").alias("n_corpus"))
    keep = F.col("srank") <= F.greatest(
        F.lit(HN_MAX_RANK),
        F.floor(F.col("n_corpus") / F.lit(R12.RSCALE_DIV)),
    )
    shortlist = (
        ranked_adc.crossJoin(F.broadcast(tot))
        .where(keep)
        .select("q_id", "vec_id")
    )
    e = S.with_norm(load_table(spark, sf_dir, "embeddings"))
    q = e.where(F.col("vec_id") < HN_N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
    )
    rr = (
        shortlist.join(e, "vec_id")
        .join(F.broadcast(q), "q_id")
        .select(
            "q_id",
            "vec_id",
            (
                S._dot(F.col("qv"), F.col("v"))
                / (F.col("qn") * F.col("norm"))
            ).alias("cosine"),
        )
    )
    w_cos = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), "vec_id")
    ranked = rr.withColumn("rank", F.row_number().over(w_cos))
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


def _hn_ivfpq_trained_sql() -> str:
    """The trained-cell IVF-PQ chain (q_ann_ivfpq_trained_topk's CTEs)
    with the cosine re-rank + band tail of q_hard_negative_mining."""
    from .registry_round6 import PQ_SUBS
    from .registry_round11 import _kmeans_c1_ctes

    # The kmeans chain already defines the identical ``emb`` CTE, so ask
    # the PQ chain to omit its copy (ADVICE r13: parameter, not string
    # surgery).
    pq = R11._pq_code_ctes(include_emb=False)
    return f"""
WITH {_kmeans_c1_ctes()},
{pq},
lut AS (
  SELECT vec_id AS q_id, list(d2 ORDER BY s, cid) AS lut
  FROM scored WHERE vec_id < {HN_N_QUERIES} GROUP BY vec_id
),
nd AS (
  SELECT vec_id, v2 AS v, sqrt({_dot_sql('v2', 'v2')}) AS nrm
  FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v2
        FROM embeddings)
),
cellranked AS (
  SELECT n.vec_id, c.cid AS cell,
         row_number() OVER (PARTITION BY n.vec_id
                            ORDER BY {_dot_sql('n.v', 'c.c')} DESC, c.cid)
           AS cell_rank
  FROM nd n CROSS JOIN c1 c
),
cell_assign AS (SELECT vec_id, cell FROM cellranked WHERE cell_rank = 1),
qprobes AS (
  SELECT vec_id AS q_id, cell AS q_cell FROM cellranked
  WHERE vec_id < {HN_N_QUERIES} AND cell_rank <= {S.N_PROBE}
),
adc AS (
  SELECT p.q_id, ca.vec_id,
         list_reduce(list_transform(generate_series(1, {PQ_SUBS}),
           s -> CAST(q.lut[(s - 1) * {R11.PQ_SEARCH_K}
                           + CAST(c.codes[s] AS INT) + 1] AS DOUBLE)),
           (acc, x) -> acc + x) AS adc
  FROM qprobes p
  JOIN cell_assign ca ON ca.cell = p.q_cell AND ca.vec_id <> p.q_id
  JOIN codes c ON c.vec_id = ca.vec_id
  JOIN lut q ON q.q_id = p.q_id
),
shortlist AS (
  SELECT q_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id)
              AS srank
    FROM adc
  ) WHERE srank <= {HN_MAX_RANK}
),
qs AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM nd
       WHERE vec_id < {HN_N_QUERIES}),
rr AS (
  SELECT s.q_id, s.vec_id,
         {_dot_sql('q.qv', 'e.v')} / (q.qn * e.nrm) AS cosine
  FROM shortlist s
  JOIN nd e ON e.vec_id = s.vec_id
  JOIN qs q ON q.q_id = s.q_id
),
ranked AS (
  SELECT *, row_number() OVER
    (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
  FROM rr
),
weakest AS (SELECT q_id, cosine AS s_pos FROM ranked WHERE rank = {HN_POS_K})
SELECT r.q_id, r.vec_id, CAST(r.cosine AS REAL) AS cosine,
       CAST(r.rank AS BIGINT) AS rank,
       CAST(w.s_pos - r.cosine AS REAL) AS margin_gap
FROM ranked r JOIN weakest w USING (q_id)
WHERE r.rank > {HN_POS_K} AND r.rank <= {HN_MAX_RANK}
  AND CAST(r.cosine AS REAL) >= CAST(w.s_pos - {HN_MARGIN} AS REAL)
"""


def _band_recall_sql() -> str:
    from .registry import REGISTRY

    exact = REGISTRY["q_hard_negative_mining"].sql
    return f"""
WITH exact_band AS ({exact}),
ivf_band AS ({_hn_ivfpq_sql()}),
ivft_band AS ({_hn_ivfpq_trained_sql()}),
adc8_band AS ({_hn_adc8_sql()}),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM exact_band),
stats AS (
  SELECT 'ivfpq' AS method,
         (SELECT CAST(count(*) AS BIGINT) FROM ivf_band) AS n_mined,
         (SELECT CAST(count(*) AS BIGINT) FROM exact_band e
          JOIN ivf_band a ON e.q_id = a.q_id AND e.vec_id = a.vec_id)
           AS n_recovered
  UNION ALL
  SELECT 'ivfpq_trained' AS method,
         (SELECT CAST(count(*) AS BIGINT) FROM ivft_band) AS n_mined,
         (SELECT CAST(count(*) AS BIGINT) FROM exact_band e
          JOIN ivft_band a ON e.q_id = a.q_id AND e.vec_id = a.vec_id)
           AS n_recovered
  UNION ALL
  SELECT 'adc8_rscaled' AS method,
         (SELECT CAST(count(*) AS BIGINT) FROM adc8_band) AS n_mined,
         (SELECT CAST(count(*) AS BIGINT) FROM exact_band e
          JOIN adc8_band a ON e.q_id = a.q_id AND e.vec_id = a.vec_id)
           AS n_recovered
)
SELECT method, tot.n_exact, n_mined, n_recovered,
       CAST(CAST(n_recovered AS DOUBLE)
            / greatest(tot.n_exact, 1) AS REAL) AS band_recall
FROM stats CROSS JOIN tot
"""


@register(
    "q_hard_negative_band_recall",
    _band_recall_sql(),
    "llm",
    "ann",
    "eval",
    "mining",
)
def q_hard_negative_band_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of the EXACT semi-hard band (q_hard_negative_mining)
    each index-driven miner recovers — the trade study that picks the
    production mining path (VERDICT r12 item 1's "band-recall ≥ a
    stated bar"; the bar is adc8_rscaled ≥ 0.5 at sf0.1, measured 0.56,
    pinned in tests/test_round13.py; per-scale values in SCALE.md
    round-13). Composes the REGISTERED queries, like q_ann_pq_recall,
    so the eval measures the very result sets production emits.

    Scale: all bands are (≤45×n_queries)-row lists; the eval is two
    equi-joins + counts over them."""
    from .registry import REGISTRY

    exact = (
        REGISTRY["q_hard_negative_mining"].fn(spark, sf_dir)
        .select("q_id", "vec_id")
    )
    tot = exact.agg(F.count("*").cast("long").alias("n_exact"))
    parts = []
    for method, qname in (
        ("ivfpq", "q_hard_negative_mining_ivfpq"),
        ("ivfpq_trained", "q_hard_negative_mining_ivfpq_trained"),
        ("adc8_rscaled", "q_hard_negative_mining_adc8"),
    ):
        band = REGISTRY[qname].fn(spark, sf_dir).select("q_id", "vec_id")
        mined = band.agg(F.count("*").cast("long").alias("n_mined"))
        hit = exact.join(band, ["q_id", "vec_id"]).agg(
            F.count("*").cast("long").alias("n_recovered")
        )
        parts.append(
            mined.crossJoin(F.broadcast(hit)).select(
                F.lit(method).alias("method"), "n_mined", "n_recovered"
            )
        )
    stats = parts[0]
    for p in parts[1:]:
        stats = stats.unionAll(p)
    return stats.crossJoin(F.broadcast(tot)).select(
        "method",
        "n_exact",
        "n_mined",
        "n_recovered",
        (
            F.col("n_recovered").cast("double")
            / F.greatest(F.col("n_exact"), F.lit(1))
        )
        .cast("float")
        .alias("band_recall"),
    )


# ---------------------------------------------------------------------------
# BPE merge round 2: re-segment on the top-1 merge, count symbol pairs
# ---------------------------------------------------------------------------

_BPE2_SQL = rf"""
WITH words AS (
  SELECT w FROM (
    SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
    FROM documents
  ) WHERE len(w) >= 2
),
r1 AS (
  SELECT substr(w, CAST(i AS INTEGER), 2) AS pair
  FROM words, unnest(generate_series(1, len(w) - 1)) AS t(i)
),
c1 AS (SELECT pair, count(*) AS cnt FROM r1 GROUP BY pair),
m AS (SELECT pair AS mp FROM c1 ORDER BY cnt DESC, pair LIMIT 1),
merged AS (
  SELECT replace(w, (SELECT mp FROM m), chr(1)) AS w2 FROM words
),
syms AS (
  SELECT substr(w2, CAST(i AS INTEGER), 1) AS a,
         substr(w2, CAST(i AS INTEGER) + 1, 1) AS b
  FROM merged, unnest(generate_series(1, len(w2) - 1)) AS t(i)
  WHERE len(w2) >= 2
),
mapped AS (
  SELECT CASE WHEN a = chr(1) THEN (SELECT mp FROM m) ELSE a END AS sym1,
         CASE WHEN b = chr(1) THEN (SELECT mp FROM m) ELSE b END AS sym2
  FROM syms
),
c2 AS (
  SELECT sym1, sym2, CAST(count(*) AS BIGINT) AS cnt
  FROM mapped GROUP BY sym1, sym2
)
SELECT sym1, sym2, cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, sym1, sym2) AS BIGINT)
         AS merge_rank
FROM c2
QUALIFY merge_rank <= {BPE_TOP}
"""


@register("q_bpe_merge_round2", _BPE2_SQL, "llm", "tokenize")
def q_bpe_merge_round2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE round 2: apply round 1's top-1 merge (highest pair count,
    (cnt DESC, pair) tie-break — q_bpe_merge_induction's merge_rank=1),
    re-segment every word, and emit the top-BPE_TOP adjacent SYMBOL
    pairs of the merged stream. This is the re-segmentation step round
    12 deferred — the part of BPE where the symbol stream shrinks.

    Re-segmentation without a per-row loop: at round 2 every pre-merge
    symbol is one character, so greedy leftmost non-overlapping symbol
    merging IS a literal string replace of the 2-char merge pair with a
    reserved 1-char sentinel (both engines' replace() scans leftmost;
    e.g. merge "aa" turns "aaa" into [aa, a], exactly the BPE rule).
    Symbols of the merged stream are then single characters again, and
    a pair is two adjacent characters mapped back through the sentinel.
    Output keeps (sym1, sym2) SEPARATE — merge "aa" makes ("a","aa")
    and ("aa","a") distinct pairs with equal concatenations. The
    pure-Python symbol-list recount in tests/test_round13.py pins the
    sentinel trick against a direct implementation of the merge rule.

    Scale: two corpus scans (round-1 counts; re-segment + round-2
    counts) with ONE driver-free top-1 join between them — the merge
    pair is a 1-row broadcast, the round-2 agg domain is bounded by
    (alphabet ∪ {{merge}})², so map-side combine collapses each
    partition before any shuffle, exactly like round 1. Later rounds
    repeat this stage shape with one more sentinel per learned merge."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w")
    words = docs.select(w).where(F.length("w") >= 2)
    pairs1 = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    c1 = pairs1.groupBy("pair").agg(F.count("*").alias("cnt"))
    # Top-1 merge: a 1-row table (TakeOrdered), broadcast into the
    # re-segmentation scan — no driver action, same merge on any corpus.
    m = (
        c1.orderBy(F.col("cnt").desc(), "pair")
        .limit(1)
        .select(F.col("pair").alias("mp"))
    )
    merged = (
        words.crossJoin(F.broadcast(m))
        .select(
            F.replace(F.col("w"), F.col("mp"), F.lit(BPE_SENTINEL)).alias("w2"),
            "mp",
        )
        .where(F.length("w2") >= 2)
    )
    syms = merged.select(
        "mp",
        F.explode(
            F.expr(
                "transform(sequence(1, length(w2) - 1), i -> "
                "struct(substring(w2, i, 1) AS a, substring(w2, i + 1, 1) AS b))"
            )
        ).alias("p"),
    )
    sentinel = F.lit(BPE_SENTINEL)
    mapped = syms.select(
        F.when(F.col("p.a") == sentinel, F.col("mp"))
        .otherwise(F.col("p.a"))
        .alias("sym1"),
        F.when(F.col("p.b") == sentinel, F.col("mp"))
        .otherwise(F.col("p.b"))
        .alias("sym2"),
    )
    c2 = mapped.groupBy("sym1", "sym2").agg(
        F.count("*").cast("long").alias("cnt")
    )
    return (
        c2.withColumn(
            "merge_rank",
            F.row_number().over(
                Window.orderBy(F.col("cnt").desc(), "sym1", "sym2")
            ),
        )
        .where(F.col("merge_rank") <= BPE_TOP)
        .select(
            "sym1",
            "sym2",
            "cnt",
            F.col("merge_rank").cast("long").alias("merge_rank"),
        )
    )


# ---------------------------------------------------------------------------
# MMR at production parameters
# ---------------------------------------------------------------------------


@register(
    "q_mmr_rerank_wide",
    R12B._mmr_sql(cand=MMR_WIDE_CAND, picks=MMR_WIDE_PICKS),
    "llm",
    "retrieval",
)
def q_mmr_rerank_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy MMR at production parameters — CAND={MMR_WIDE_CAND},
    PICKS={MMR_WIDE_PICKS} (the fixture-sized q_mmr_rerank runs 20/3) —
    through the SAME parameterized builder and unrolled oracle
    (registry_round12b._mmr_spark / _mmr_sql), answering VERDICT r12
    item 4: the CAND²×queries sim table is the quadratic-in-CAND piece,
    and this row measures it at the real dial setting.

    Scale: candidate generation is unchanged (bounded query broadcast ×
    corpus scan + one top-CAND window); after it, every table is CAND-
    or n_queries-bounded — corpus size is not a factor. The 10 unrolled
    stages materialize their 1-row-per-query picks behind lineage cuts
    (cut=True) because stage t's plan references every earlier pick:
    without the cut the LOGICAL PLAN (not the data) would replicate
    subtrees ~2^t-fold. Each cut table is kilobytes at any corpus."""
    return R12B._mmr_spark(
        spark,
        sf_dir,
        cand_n=MMR_WIDE_CAND,
        picks_n=MMR_WIDE_PICKS,
        cut=True,
    )


# ---------------------------------------------------------------------------
# Multi-round BPE learner: 3 merges with re-segmentation between rounds
# ---------------------------------------------------------------------------

BPE_LEARN_ROUNDS = 3
# One reserved sentinel character per learned merge (chr(1)..chr(3));
# collision with corpus text is asserted by tests/test_round13.py.
_BPE_S1, _BPE_S2, _BPE_S3 = "\x01", "\x02", "\x03"

# Shared CTE chain: words → (c1, m1, w1) → (c2, m2, w2) → (c3, m3, w3).
# q_bpe_learn3 reads the merge CTEs; q_bpe_compression reads the stream
# CTEs (w3 = the stream after applying all three merges).
_BPE_CHAIN_SQL = r"""words AS (
  SELECT w FROM (
    SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
    FROM documents
  ) WHERE len(w) >= 2
),
r1 AS (
  SELECT substr(w, CAST(i AS INTEGER), 2) AS pair
  FROM words, unnest(generate_series(1, len(w) - 1)) AS t(i)
),
c1 AS (SELECT pair, count(*) AS cnt FROM r1 GROUP BY pair),
m1 AS MATERIALIZED (SELECT pair, cnt FROM c1 ORDER BY cnt DESC, pair LIMIT 1),
w1 AS MATERIALIZED (SELECT replace(w, (SELECT pair FROM m1), chr(1)) AS w FROM words),
r2 AS (
  SELECT substr(w, CAST(i AS INTEGER), 1) AS a,
         substr(w, CAST(i AS INTEGER) + 1, 1) AS b
  FROM w1, unnest(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
),
e2 AS (
  SELECT a, b,
         CASE WHEN a = chr(1) THEN (SELECT pair FROM m1) ELSE a END AS sym1,
         CASE WHEN b = chr(1) THEN (SELECT pair FROM m1) ELSE b END AS sym2
  FROM r2
),
c2 AS (SELECT a, b, sym1, sym2, count(*) AS cnt
       FROM e2 GROUP BY a, b, sym1, sym2),
m2 AS MATERIALIZED (SELECT * FROM c2 ORDER BY cnt DESC, sym1, sym2, a, b LIMIT 1),
w2 AS MATERIALIZED (SELECT replace(w, (SELECT a || b FROM m2), chr(2)) AS w FROM w1),
r3 AS (
  SELECT substr(w, CAST(i AS INTEGER), 1) AS a,
         substr(w, CAST(i AS INTEGER) + 1, 1) AS b
  FROM w2, unnest(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
),
e3 AS (
  SELECT a, b,
         CASE WHEN a = chr(1) THEN (SELECT pair FROM m1)
              WHEN a = chr(2) THEN (SELECT sym1 || sym2 FROM m2)
              ELSE a END AS sym1,
         CASE WHEN b = chr(1) THEN (SELECT pair FROM m1)
              WHEN b = chr(2) THEN (SELECT sym1 || sym2 FROM m2)
              ELSE b END AS sym2
  FROM r3
),
c3 AS (SELECT a, b, sym1, sym2, count(*) AS cnt
       FROM e3 GROUP BY a, b, sym1, sym2),
m3 AS MATERIALIZED (SELECT * FROM c3 ORDER BY cnt DESC, sym1, sym2, a, b LIMIT 1),
w3 AS MATERIALIZED (SELECT replace(w, (SELECT a || b FROM m3), chr(3)) AS w FROM w2)"""

_BPE_LEARN3_SQL = f"""
WITH {_BPE_CHAIN_SQL}
SELECT CAST(1 AS BIGINT) AS round,
       (SELECT substr(pair, 1, 1) FROM m1) AS sym1,
       (SELECT substr(pair, 2, 1) FROM m1) AS sym2,
       (SELECT CAST(cnt AS BIGINT) FROM m1) AS cnt
UNION ALL
SELECT CAST(2 AS BIGINT), (SELECT sym1 FROM m2), (SELECT sym2 FROM m2),
       (SELECT CAST(cnt AS BIGINT) FROM m2)
UNION ALL
SELECT CAST(3 AS BIGINT), (SELECT sym1 FROM m3), (SELECT sym2 FROM m3),
       (SELECT CAST(cnt AS BIGINT) FROM m3)
"""


def _bpe_streams(spark: SparkSession, sf_dir: str):
    """The 3-round BPE learning chain as DataFrames: returns
    (streams, merges) where streams = [words, w1, w2, w3] (the symbol
    stream after 0..3 merges, sentinel chars standing for merged
    symbols) and merges = [m1, m2, m3] (1-row frames carrying the
    learned merge, its expansion, and its pre-merge pair count).
    Shared by q_bpe_learn3 (reads the merges) and q_bpe_compression
    (reads the stream lengths)."""
    docs = load_table(spark, sf_dir, "documents")
    w0 = F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w")
    words = docs.select(w0).where(F.length("w") >= 2)

    pairs1 = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    c1 = pairs1.groupBy("pair").agg(F.count("*").alias("cnt"))
    m1 = (
        c1.orderBy(F.col("cnt").desc(), "pair")
        .limit(1)
        .select(F.col("pair").alias("mp1"), F.col("cnt").alias("cnt1"))
    )

    def _char_pairs(df: DataFrame, extra: list[str]) -> DataFrame:
        """Adjacent raw 1-char pairs of column w, carrying ``extra``."""
        return df.where(F.length("w") >= 2).select(
            *extra,
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1), i -> "
                    "struct(substring(w, i, 1) AS a, substring(w, i + 1, 1) AS b))"
                )
            ).alias("p"),
        ).select(*extra, F.col("p.a").alias("a"), F.col("p.b").alias("b"))

    w1 = words.crossJoin(F.broadcast(m1)).select(
        F.replace(F.col("w"), F.col("mp1"), F.lit(_BPE_S1)).alias("w"), "mp1"
    )
    exp1 = lambda c: F.when(c == F.lit(_BPE_S1), F.col("mp1")).otherwise(c)  # noqa: E731
    e2 = _char_pairs(w1, ["mp1"]).select(
        "a", "b", exp1(F.col("a")).alias("sym1"), exp1(F.col("b")).alias("sym2")
    )
    c2 = e2.groupBy("a", "b", "sym1", "sym2").agg(F.count("*").alias("cnt"))
    m2 = (
        c2.orderBy(F.col("cnt").desc(), "sym1", "sym2", "a", "b")
        .limit(1)
        .select(
            F.concat("a", "b").alias("m2raw"),
            F.col("sym1").alias("m2s1"),
            F.col("sym2").alias("m2s2"),
            F.col("cnt").alias("cnt2"),
        )
    )

    w2 = w1.crossJoin(F.broadcast(m2)).select(
        F.replace(F.col("w"), F.col("m2raw"), F.lit(_BPE_S2)).alias("w"),
        "mp1",
        F.concat("m2s1", "m2s2").alias("m2exp"),
    )
    exp2 = lambda c: (  # noqa: E731
        F.when(c == F.lit(_BPE_S1), F.col("mp1"))
        .when(c == F.lit(_BPE_S2), F.col("m2exp"))
        .otherwise(c)
    )
    e3 = _char_pairs(w2, ["mp1", "m2exp"]).select(
        "a", "b", exp2(F.col("a")).alias("sym1"), exp2(F.col("b")).alias("sym2")
    )
    c3 = e3.groupBy("a", "b", "sym1", "sym2").agg(F.count("*").alias("cnt"))
    m3 = (
        c3.orderBy(F.col("cnt").desc(), "sym1", "sym2", "a", "b")
        .limit(1)
        .select(
            F.concat("a", "b").alias("m3raw"),
            F.col("sym1").alias("m3s1"),
            F.col("sym2").alias("m3s2"),
            F.col("cnt").alias("cnt3"),
        )
    )
    w3 = w2.crossJoin(F.broadcast(m3)).select(
        F.replace(F.col("w"), F.col("m3raw"), F.lit(_BPE_S3)).alias("w")
    )
    return [words, w1, w2, w3], [m1, m2, m3]


@register("q_bpe_learn3", _BPE_LEARN3_SQL, "llm", "tokenize")
def q_bpe_learn3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE vocabulary LEARNER, three rounds end-to-end: learn the
    top merge, re-segment the whole symbol stream, learn the next merge
    on the merged stream, repeat — the iterative loop
    q_bpe_merge_induction (round-1 statistics) and q_bpe_merge_round2
    (one re-segmentation) built toward. Emits the three learned merges
    as (round, sym1, sym2, cnt), sym strings fully expanded (merge 3
    can combine merge 1's or merge 2's output symbol — the whole point
    of BPE's vocabulary growth).

    Mechanics: each learned merge is assigned a reserved sentinel
    character, so after every round the stream is single-character
    symbols again and the next round's greedy leftmost symbol merge is
    a literal string replace (see q_bpe_merge_round2's argument); the
    CASE mapping expands sentinels back to real symbol strings before
    ranking, and the rank tie-break includes the raw sentinel pair so
    it is total even if two raw pairs expanded identically. Pinned by a
    pure-Python TRUE symbol-list 3-round learner in
    tests/test_round13.py.

    Scale: ROUNDS+1 corpus scans chained by 1-row top-merge broadcasts
    (TakeOrdered each — no driver action); every round's agg domain is
    bounded by (alphabet + learned merges)², so map-side combine
    collapses each scan before its shuffle. This is the canonical BPE
    cost model: learning V merges = V linear passes, each cheaper than
    the last as the stream shrinks."""
    _, (m1, m2, m3) = _bpe_streams(spark, sf_dir)
    row1 = m1.select(
        F.lit(1).cast("long").alias("round"),
        F.substring("mp1", 1, 1).alias("sym1"),
        F.substring("mp1", 2, 1).alias("sym2"),
        F.col("cnt1").cast("long").alias("cnt"),
    )
    row2 = m2.select(
        F.lit(2).cast("long").alias("round"),
        F.col("m2s1").alias("sym1"),
        F.col("m2s2").alias("sym2"),
        F.col("cnt2").cast("long").alias("cnt"),
    )
    row3 = m3.select(
        F.lit(3).cast("long").alias("round"),
        F.col("m3s1").alias("sym1"),
        F.col("m3s2").alias("sym2"),
        F.col("cnt3").cast("long").alias("cnt"),
    )
    return row1.unionAll(row2).unionAll(row3)


# ---------------------------------------------------------------------------
# Retrieval rank metrics: MRR + nDCG@k for the cosine ANN family
# ---------------------------------------------------------------------------

# Binary-relevance nDCG@5 discount weights 1/log2(rank+1), spelled as
# the SAME shortest-roundtrip literals in both engines so no log()
# implementation difference can leak into the hash. IDCG@5 is their sum.
_NDCG_W = {
    1: 1.0,
    2: 0.6309297535714575,
    3: 0.5,
    4: 0.43067655807339306,
    5: 0.38685280723454163,
}
_IDCG5 = 2.9484591188793923
_RANK_METHODS = (
    ("lsh", "q_ann_lsh_topk"),
    ("ivf", "q_ann_ivf_topk"),
    ("ivf_trained", "q_ann_ivf_trained_topk"),
)


def _rank_metrics_sql() -> str:
    from .registry import REGISTRY

    truth = REGISTRY["q_ann_cosine_topk"].sql
    wt = " ".join(
        f"WHEN {r} THEN {_NDCG_W[r]!r}" for r in sorted(_NDCG_W)
    )
    parts = []
    for method, qname in _RANK_METHODS:
        parts.append(
            f"SELECT '{method}' AS method, q_id, vec_id, rank "
            f"FROM ({REGISTRY[qname].sql})"
        )
    union = " UNION ALL ".join(parts)
    return f"""
WITH truth AS ({truth}),
results AS ({union}),
hits AS (
  SELECT r.method, r.q_id, r.rank,
         CASE r.rank {wt} END AS wt
  FROM results r JOIN truth t ON t.q_id = r.q_id AND t.vec_id = r.vec_id
),
per_q AS (
  SELECT method, q_id, max(1.0 / rank) AS rr, sum(wt) AS dcg
  FROM hits GROUP BY method, q_id
)
SELECT method,
       CAST(sum(rr) / {HN_N_QUERIES} AS REAL) AS mrr,
       CAST(sum(dcg) / ({HN_N_QUERIES} * {_IDCG5!r}) AS REAL) AS ndcg_at_k
FROM per_q GROUP BY method
"""


@register(
    "q_retrieval_rank_metrics",
    _rank_metrics_sql(),
    "llm",
    "ann",
    "eval",
)
def q_retrieval_rank_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR and binary-relevance nDCG@5 of the cosine ANN family (LSH,
    untrained IVF, trained IVF) against the exact brute-force top-5 —
    the POSITION-AWARE companions to the recall@k evals already
    registered: recall says how many truth rows an index returns, these
    say WHERE it puts them. Composes the REGISTERED queries, like
    q_ann_recall_eval; queries an index returns nothing for contribute
    0 (division is by the constant query count, not by rows present).

    Oracle-exact: the nDCG discounts 1/log2(rank+1) are spelled as the
    same five shortest-roundtrip literals in both engines (no runtime
    log() whose last ulp could differ); per-query sums of ≤k doubles
    collapse to float32 after aggregation (r6 discipline), so partial-
    aggregation order cannot flap the hash.

    Scale: every input is a (k×n_queries)-row top-k list; the eval is
    one equi-join + two grouped aggregations over them."""
    from .registry import REGISTRY

    truth = (
        REGISTRY["q_ann_cosine_topk"].fn(spark, sf_dir)
        .select("q_id", "vec_id")
    )
    wt = F.when(F.lit(False), F.lit(0.0))
    for r, w in sorted(_NDCG_W.items()):
        wt = wt.when(F.col("rank") == r, F.lit(w))
    parts = []
    for method, qname in _RANK_METHODS:
        res = REGISTRY[qname].fn(spark, sf_dir).select(
            F.lit(method).alias("method"), "q_id", "vec_id", "rank"
        )
        parts.append(res)
    results = parts[0]
    for p in parts[1:]:
        results = results.unionAll(p)
    hits = results.join(truth, ["q_id", "vec_id"]).select(
        "method", "q_id", "rank", wt.alias("wt")
    )
    per_q = hits.groupBy("method", "q_id").agg(
        F.max(F.lit(1.0) / F.col("rank")).alias("rr"),
        F.sum("wt").alias("dcg"),
    )
    return per_q.groupBy("method").agg(
        r6(F.sum("rr") / F.lit(HN_N_QUERIES), "mrr"),
        r6(
            F.sum("dcg") / F.lit(HN_N_QUERIES * _IDCG5),
            "ndcg_at_k",
        ),
    )


# ---------------------------------------------------------------------------
# Contrastive training-batch assembly: positives + mined hard negatives
# ---------------------------------------------------------------------------

CB_NEG_K = 10  # hard negatives kept per query (strongest-first)


def _contrastive_sql() -> str:
    from .registry import REGISTRY

    pos = REGISTRY["q_ann_cosine_topk"].sql
    return f"""
WITH pos AS ({pos}),
band AS ({_hn_adc8_sql()}),
neg AS (
  SELECT q_id, vec_id, slot FROM (
    SELECT q_id, vec_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY cosine DESC, vec_id) AS slot
    FROM band
  ) WHERE slot <= {CB_NEG_K}
)
SELECT q_id, 'pos' AS role, CAST(rank AS BIGINT) AS slot, vec_id FROM pos
UNION ALL
SELECT q_id, 'neg' AS role, CAST(slot AS BIGINT) AS slot, vec_id FROM neg
"""


@register(
    "q_contrastive_batches",
    _contrastive_sql(),
    "llm",
    "ann",
    "mining",
)
def q_contrastive_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assemble contrastive training examples — the last step of the
    mining pipeline: per query, the exact top-POS_K positives
    (q_ann_cosine_topk) plus the CB_NEG_K strongest semi-hard negatives
    from the production index miner (q_hard_negative_mining_adc8),
    slot-numbered strongest-first. One row per (q_id, role, slot) —
    the flattened (anchor, positives[], negatives[]) layout an InfoNCE
    dataloader reads back with a single groupBy, kept flat here so the
    driver's row-hash compare stays list-free.

    Scale: composes two already-bounded result sets (k×queries and
    ≤45×queries rows); the slot window partitions by q_id over ≤45
    rows. At 100 TB the cost lives entirely in the upstream miner
    (one compressed-code scan), not in the assembly."""
    from .registry import REGISTRY

    pos = REGISTRY["q_ann_cosine_topk"].fn(spark, sf_dir).select(
        "q_id",
        F.lit("pos").alias("role"),
        F.col("rank").cast("long").alias("slot"),
        "vec_id",
    )
    band = REGISTRY["q_hard_negative_mining_adc8"].fn(spark, sf_dir)
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), "vec_id")
    neg = (
        band.withColumn("slot", F.row_number().over(w))
        .where(F.col("slot") <= CB_NEG_K)
        .select(
            "q_id",
            F.lit("neg").alias("role"),
            F.col("slot").cast("long").alias("slot"),
            "vec_id",
        )
    )
    return pos.unionAll(neg)


# ---------------------------------------------------------------------------
# BPE compression curve: the stream SHRINKS as merges are learned
# ---------------------------------------------------------------------------

_BPE_COMPRESSION_SQL = f"""
WITH {_BPE_CHAIN_SQL},
l0 AS (SELECT CAST(sum(len(w)) AS BIGINT) AS total,
              CAST(count(*) AS BIGINT) AS n_words FROM words),
l1 AS (SELECT CAST(sum(len(w)) AS BIGINT) AS total FROM w1),
l2 AS (SELECT CAST(sum(len(w)) AS BIGINT) AS total FROM w2),
l3 AS (SELECT CAST(sum(len(w)) AS BIGINT) AS total FROM w3)
SELECT round, total_symbols,
       CAST(CAST(total_symbols AS DOUBLE) / n_words AS REAL)
         AS avg_symbols_per_word,
       CAST(CAST(chars AS DOUBLE) / total_symbols AS REAL)
         AS chars_per_symbol
FROM (
  SELECT CAST(0 AS BIGINT) AS round, l0.total AS total_symbols,
         l0.n_words, l0.total AS chars FROM l0
  UNION ALL
  SELECT CAST(1 AS BIGINT), l1.total, l0.n_words, l0.total
  FROM l1 CROSS JOIN l0
  UNION ALL
  SELECT CAST(2 AS BIGINT), l2.total, l0.n_words, l0.total
  FROM l2 CROSS JOIN l0
  UNION ALL
  SELECT CAST(3 AS BIGINT), l3.total, l0.n_words, l0.total
  FROM l3 CROSS JOIN l0
)
"""


@register("q_bpe_compression", _BPE_COMPRESSION_SQL, "llm", "tokenize")
def q_bpe_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compression curve of the 3-round BPE learner: total symbol
    count, symbols per word, and chars-per-symbol after 0..3 learned
    merges — the MEASURED form of "subsequent rounds work on the
    shrinking merged-symbol stream". Exact integers for the symbol
    counts (each sentinel character is one symbol), so the curve is
    hash-stable at every scale; greedy non-overlap means the shrink per
    round is the REPLACEMENT count, not the (larger) pre-merge pair
    count — deriving it from q_bpe_learn3's cnt would overstate it,
    which is why this measures the streams directly.

    Scale: the same chained linear passes as q_bpe_learn3 plus four
    1-row length aggregates — nothing new shuffles."""
    (words, w1, w2, w3), _ = _bpe_streams(spark, sf_dir)
    l0 = words.agg(
        F.sum(F.length("w")).cast("long").alias("total"),
        F.count("*").cast("long").alias("n_words"),
    )
    parts = []
    for rnd, df in ((0, words), (1, w1), (2, w2), (3, w3)):
        lr = (
            df.agg(F.sum(F.length("w")).cast("long").alias("total_symbols"))
            if rnd
            else l0.select(F.col("total").alias("total_symbols"))
        )
        parts.append(
            lr.crossJoin(F.broadcast(l0)).select(
                F.lit(rnd).cast("long").alias("round"),
                "total_symbols",
                r6(
                    F.col("total_symbols").cast("double") / F.col("n_words"),
                    "avg_symbols_per_word",
                ),
                r6(
                    F.col("total").cast("double") / F.col("total_symbols"),
                    "chars_per_symbol",
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# ---------------------------------------------------------------------------
# IVF cell occupancy: the skew diagnostic for the coarse quantizer
# ---------------------------------------------------------------------------


def _cell_occupancy_sql() -> str:
    from .registry_round11 import _kmeans_c1_ctes

    cents = ", ".join(
        "({}, [{}])".format(
            c, ", ".join(repr(S.centroid_component(c, d)) for d in range(64))
        )
        for c in range(S.N_CELLS)
    )
    return f"""
WITH {_kmeans_c1_ctes()},
nd AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       FROM embeddings),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nd),
ivf_cents AS (SELECT * FROM (VALUES {cents}) AS c(cell, cv)),
u_assign AS (
  SELECT vec_id, cell FROM (
    SELECT n.vec_id, c.cell,
           row_number() OVER (PARTITION BY n.vec_id
                              ORDER BY {_dot_sql('n.v', 'c.cv')} DESC, c.cell)
             AS rn
    FROM nd n CROSS JOIN ivf_cents c
  ) WHERE rn = 1
),
t_assign AS (
  SELECT vec_id, cell FROM (
    SELECT n.vec_id, c.cid AS cell,
           row_number() OVER (PARTITION BY n.vec_id
                              ORDER BY {_dot_sql('n.v', 'c.c')} DESC, c.cid)
             AS rn
    FROM nd n CROSS JOIN c1 c
  ) WHERE rn = 1
),
occ AS (
  SELECT 'untrained' AS method, CAST(cell AS BIGINT) AS cell,
         CAST(count(*) AS BIGINT) AS occupancy
  FROM u_assign GROUP BY cell
  UNION ALL
  SELECT 'kmeans_trained' AS method, CAST(cell AS BIGINT) AS cell,
         CAST(count(*) AS BIGINT) AS occupancy
  FROM t_assign GROUP BY cell
)
SELECT method, cell, occupancy,
       CAST(CAST(occupancy AS DOUBLE) / tot.n AS REAL) AS share
FROM occ CROSS JOIN tot
"""


@register(
    "q_ivf_cell_occupancy",
    _cell_occupancy_sql(),
    "vector",
    "ivf",
    "eval",
)
def q_ivf_cell_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows per coarse-quantizer cell for the untrained (deterministic
    pseudo-random) and k-means-trained IVF indexes — the SKEW diagnostic
    every IVF deployment monitors: at 100 TB a hot cell IS a hot
    partition (probe cost is proportional to probed-cell occupancy, and
    one oversized cell defeats the n_probe/n_cells pruning story that
    justifies the index). Training exists precisely to balance this
    histogram; the trade study quantifies it next to the recall gain
    q_ann_recall_trained already measures.

    Scale: one corpus scan per method with the centroid set folded into
    a broadcast (the q_kmeans zero-shuffle argmin shape); the output is
    ≤2×N_CELLS rows. Empty trained cells simply emit no row — same on
    both engines.

    Oracle-exact: assignments use the sequential-fold dot with the
    (DESC, cell) tie-break, identical to every IVF query; counts are
    integers; the share divides by a broadcast 1-row corpus count."""
    from .registry_round2 import KMEANS_K

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    tot = emb.agg(F.count("*").cast("long").alias("n"))
    scored = emb.withColumn("scores", S._cell_scores("v", 64))
    u_cell = (
        F.array_position(F.col("scores"), F.array_max(F.col("scores"))) - 1
    ).cast("long")
    u_occ = (
        scored.select(u_cell.alias("cell"))
        .groupBy("cell")
        .agg(F.count("*").cast("long").alias("occupancy"))
        .select(F.lit("untrained").alias("method"), "cell", "occupancy")
    )
    cents = R11._lloyd_cents_memo(spark, sf_dir, k=KMEANS_K)
    cent_row = cents.agg(F.collect_list(F.struct("cid", "c")).alias("cents"))
    t_cell = F.array_min(
        F.transform(
            F.col("cents"),
            lambda ct: F.struct(
                (-S._dot(F.col("v"), ct["c"])).alias("ns"),
                ct["cid"].alias("cell"),
            ),
        )
    )["cell"].cast("long")
    t_occ = (
        emb.crossJoin(F.broadcast(cent_row))
        .select(t_cell.alias("cell"))
        .groupBy("cell")
        .agg(F.count("*").cast("long").alias("occupancy"))
        .select(F.lit("kmeans_trained").alias("method"), "cell", "occupancy")
    )
    return (
        u_occ.unionAll(t_occ)
        .crossJoin(F.broadcast(tot))
        .select(
            "method",
            "cell",
            "occupancy",
            r6(F.col("occupancy").cast("double") / F.col("n"), "share"),
        )
    )


# ---------------------------------------------------------------------------
# PQ quantization distortion: the error-side metric of the codebook knob
# ---------------------------------------------------------------------------


def _pq_distortion_sql() -> str:
    parts = []
    for k_cb in (R11.PQ_SEARCH_K, R12.PQ8_K):
        parts.append(
            f"""
SELECT CAST({k_cb} AS BIGINT) AS k_cb, CAST(s AS BIGINT) AS subspace,
       CAST(avg(md) AS REAL) AS mse
FROM (
  WITH {R11._pq_code_ctes(k_cb)}
  SELECT vec_id, s, min(d2) AS md FROM scored GROUP BY vec_id, s
) GROUP BY s"""
        )
    return " UNION ALL ".join(parts)


@register(
    "q_pq_distortion",
    _pq_distortion_sql(),
    "vector",
    "pq",
    "eval",
)
def q_pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean squared quantization error per subspace for the 4-bit
    (K=16) and 8-bit (K=256) PQ codebooks — the ERROR-side metric of
    the codebook knob (q_ann_pq_knobs_recall measures the retrieval
    side; this is the reconstruction distortion a PQ deployment
    monitors to size K before any query runs). The assigned-entry d2
    equals min-over-entries d2 (the cid tie-break only picks among
    equal minima), so the metric needs no join back to the code table.

    Scale: one corpus scan per codebook with the codebook folded into
    the scan (broadcast-sized); output is 2×PQ_SUBS rows. The min is
    over float32 per-entry d2s (bit-identical to the encode stage);
    the mean collapses to float32 after aggregation, so partial-agg
    order cannot flap the hash."""
    from .registry_round6 import PQ_SUBS

    out = None
    for k_cb in (R11.PQ_SEARCH_K, R12.PQ8_K):
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        # Per (row, subspace) min-d2 from the Arrow kernel
        # (_pq_min_d2_arrow): dim-order double accumulation + float32
        # collapse + order-free min, element-for-element identical to
        # the interpreted array_min(transform(...)) spelling it
        # replaces — which evaluated n×k_cb×PQ_SUBS lambda folds
        # outside codegen and made the K=256 pass this query's wall
        # (guide §4.2: batch the kernel, not the rows). Measured
        # min-of-3 at sf0.1/local[32]: 2.54 s → 1.36 s, hashes unchanged.
        per_sub = (
            R11._pq_min_d2_arrow(spark, emb, k_cb)
            .select(F.posexplode("mind2").alias("s", "md"))
            .select(F.col("s").cast("long").alias("subspace"), "md")
            .groupBy("subspace")
            .agg(r6(F.avg("md"), "mse"))
            .select(
                F.lit(k_cb).cast("long").alias("k_cb"), "subspace", "mse"
            )
        )
        out = per_sub if out is None else out.unionAll(per_sub)
    assert PQ_SUBS  # geometry shared with the oracle via _pq_code_ctes
    return out


# ---------------------------------------------------------------------------
# IVF-PQ with TRAINED coarse cells: the full production index, end-to-end
# ---------------------------------------------------------------------------


def _ivfpq_trained_sql(
    n_queries: int = R11.PQ_ADC_QUERIES,
    r: int = R11.PQ_RERANK_R,
    k: int = R11.PQ_ADC_K,
) -> str:
    from .registry_round6 import PQ_SUBS
    from .registry_round11 import _kmeans_c1_ctes

    # Both fragments define the IDENTICAL ``emb`` CTE; DuckDB rejects
    # duplicate CTE names at one level, so ask the PQ chain to omit its
    # copy (ADVICE r13: parameter, not string surgery).
    pq = R11._pq_code_ctes(include_emb=False)
    return f"""
WITH {_kmeans_c1_ctes()},
{pq},
lut AS (
  SELECT vec_id AS q_id, list(d2 ORDER BY s, cid) AS lut
  FROM scored WHERE vec_id < {n_queries} GROUP BY vec_id
),
nd AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       FROM embeddings),
cellranked AS (
  SELECT n.vec_id, c.cid AS cell,
         row_number() OVER (PARTITION BY n.vec_id
                            ORDER BY {_dot_sql('n.v', 'c.c')} DESC, c.cid)
           AS cell_rank
  FROM nd n CROSS JOIN c1 c
),
cell_assign AS (SELECT vec_id, cell FROM cellranked WHERE cell_rank = 1),
qprobes AS (
  SELECT vec_id AS q_id, cell AS q_cell FROM cellranked
  WHERE vec_id < {n_queries} AND cell_rank <= {S.N_PROBE}
),
adc AS (
  SELECT p.q_id, ca.vec_id,
         list_reduce(list_transform(generate_series(1, {PQ_SUBS}),
           s -> CAST(q.lut[(s - 1) * {R11.PQ_SEARCH_K}
                           + CAST(c.codes[s] AS INT) + 1] AS DOUBLE)),
           (acc, x) -> acc + x) AS adc
  FROM qprobes p
  JOIN cell_assign ca ON ca.cell = p.q_cell AND ca.vec_id <> p.q_id
  JOIN codes c ON c.vec_id = ca.vec_id
  JOIN lut q ON q.q_id = p.q_id
),
shortlist AS (
  SELECT q_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id)
              AS rank
    FROM adc
  ) WHERE rank <= {r}
),
qs AS (SELECT vec_id AS q_id, v AS qv FROM nd WHERE vec_id < {n_queries}),
rr AS (
  SELECT s.q_id, s.vec_id, {R11._d2_sql('q.qv', 'e.v')} AS d2
  FROM shortlist s
  JOIN nd e ON e.vec_id = s.vec_id
  JOIN qs q ON q.q_id = s.q_id
)
SELECT q_id, vec_id, d2, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id)
            AS rank
  FROM rr
) WHERE rank <= {k}
"""


@register(
    "q_ann_ivfpq_trained_topk",
    _ivfpq_trained_sql(),
    "vector",
    "ivf",
    "pq",
    "topk",
    "trained",
)
def q_ann_ivfpq_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ end-to-end with the k-means-TRAINED coarse quantizer —
    the full production index: trained cells prune (q_ann_ivf_trained's
    quantizer), 4-bit PQ-ADC scores the probed candidates from codes,
    the top-R shortlist pays the exact squared-L2 re-rank. Identical
    budget to q_ann_ivfpq_topk (same N_CELLS/N_PROBE/K/R) with ONLY the
    quantizer swapped, so q_ann_ivfpq_trained_recall isolates what
    centroid training buys the composed pipeline (the occupancy story:
    q_ivf_cell_occupancy shows trained cells balance the scan load too).

    Scale: index build = the k-means training scans + one assignment
    scan + the Arrow PQ encode, all one-time broadcast-argmin shapes;
    per query the read path is codes-of-probed-cells + R raw rows —
    the q_ann_ivfpq_topk profile with better-balanced cells."""
    from .registry_round2 import KMEANS_K

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = R11._lloyd_cents_memo(spark, sf_dir, k=KMEANS_K)
    cent_row = cents.agg(F.collect_list(F.struct("cid", "c")).alias("cents"))
    sc = F.transform(
        F.col("cents"),
        lambda ct: F.struct(
            (-S._dot(F.col("v"), ct["c"])).alias("ns"),
            ct["cid"].alias("cell"),
        ),
    )
    ec = emb.crossJoin(F.broadcast(cent_row)).select(
        "vec_id", "v", sc.alias("sc")
    )
    assignment = ec.select(
        "vec_id", F.array_min(F.col("sc"))["cell"].alias("cell")
    )
    probes = (
        ec.where(F.col("vec_id") < R11.PQ_ADC_QUERIES)
        .select(
            F.col("vec_id").alias("q_id"),
            F.explode(F.slice(F.array_sort(F.col("sc")), 1, S.N_PROBE)).alias(
                "p"
            ),
        )
        .select("q_id", F.col("p.cell").alias("q_cell"))
    )
    codes_df, q_df = R11._pq_enc(spark, sf_dir)
    cand = (
        probes.join(
            assignment,
            (F.col("cell") == F.col("q_cell"))
            & (F.col("vec_id") != F.col("q_id")),
        )
        .select("q_id", "vec_id")
        .join(codes_df, "vec_id")
        .join(F.broadcast(q_df), "q_id")
    )
    w_adc = Window.partitionBy("q_id").orderBy(F.col("adc"), F.col("vec_id"))
    shortlist = (
        cand.select("q_id", "vec_id", R11._adc_expr().alias("adc"))
        .withColumn("srank", F.row_number().over(w_adc))
        .where(F.col("srank") <= R11.PQ_RERANK_R)
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


def _ivfpq_trained_recall_sql() -> str:
    from .registry import REGISTRY

    untrained = REGISTRY["q_ann_ivfpq_topk"].sql
    trained = _ivfpq_trained_sql()
    return f"""
WITH u_hits AS ({untrained}),
t_hits AS ({trained}),
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
  SELECT 'ivfpq_untrained' AS method, CAST(count(*) AS BIGINT) AS n_hit
  FROM truth t JOIN u_hits a ON t.q_id = a.q_id AND t.vec_id = a.vec_id
  UNION ALL
  SELECT 'ivfpq_trained' AS method, CAST(count(*) AS BIGINT) AS n_hit
  FROM truth t JOIN t_hits a ON t.q_id = a.q_id AND t.vec_id = a.vec_id
)
SELECT method, tot.n_truth, n_hit,
       CAST(CAST(n_hit AS DOUBLE) / greatest(tot.n_truth, 1) AS REAL)
         AS recall_at_k
FROM hits CROSS JOIN tot
"""


@register(
    "q_ann_ivfpq_trained_recall",
    _ivfpq_trained_recall_sql(),
    "llm",
    "ann",
    "eval",
    "pq",
)
def q_ann_ivfpq_trained_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the composed IVF-PQ pipeline with trained vs
    untrained coarse cells against the exact squared-L2 ground truth —
    what centroid training buys the END-TO-END index (the cell-level
    answer is q_ann_recall_trained; this measures it after the ADC and
    re-rank stages stack their own losses on top). Composes the
    REGISTERED queries, like q_ann_pq_recall.

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
        ("ivfpq_untrained", "q_ann_ivfpq_topk"),
        ("ivfpq_trained", "q_ann_ivfpq_trained_topk"),
    ):
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


# ---------------------------------------------------------------------------
# Hard-negative mining over the TRAINED-cell IVF-PQ shortlist
# ---------------------------------------------------------------------------


@register(
    "q_hard_negative_mining_ivfpq_trained",
    _hn_ivfpq_trained_sql(),
    "llm",
    "ann",
    "mining",
    "pq",
    "trained",
)
def q_hard_negative_mining_ivfpq_trained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Semi-hard negative mining from the TRAINED-cell IVF-PQ shortlist
    — the third point of the band-recall trade study, isolating how
    much of the cell-pruned miner's loss is QUANTIZER QUALITY vs the
    cell gate itself. Measured band recall: 0.58 / 0.54 / 0.24 across
    sf0.001/0.01/0.1 — an order of magnitude above the untrained cells
    (0.05/0.08/0.04), so most of the untrained loss was centroid
    quality; but it still decays with corpus size (the band spreads
    across more cells as ranks 5–50 widen in absolute distance) while
    the gate-free full-code scan holds 0.56+ at every scale. Production
    conclusion unchanged: mine from the code scan, serve from the
    cells.

    Plan: q_ann_ivfpq_trained_topk's index path with the band tail —
    trained-cell assignment (broadcast argmin), codes of probed cells,
    top-MAX_RANK ADC shortlist, exact cosine re-rank, adaptive-margin
    band. Same bounded read profile as the untrained miner."""
    from .registry_round2 import KMEANS_K

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = R11._lloyd_cents_memo(spark, sf_dir, k=KMEANS_K)
    cent_row = cents.agg(F.collect_list(F.struct("cid", "c")).alias("cents"))
    sc = F.transform(
        F.col("cents"),
        lambda ct: F.struct(
            (-S._dot(F.col("v"), ct["c"])).alias("ns"),
            ct["cid"].alias("cell"),
        ),
    )
    ec = emb.crossJoin(F.broadcast(cent_row)).select(
        "vec_id", "v", sc.alias("sc")
    )
    assignment = ec.select(
        "vec_id", F.array_min(F.col("sc"))["cell"].alias("cell")
    )
    probes = (
        ec.where(F.col("vec_id") < HN_N_QUERIES)
        .select(
            F.col("vec_id").alias("q_id"),
            F.explode(F.slice(F.array_sort(F.col("sc")), 1, S.N_PROBE)).alias(
                "p"
            ),
        )
        .select("q_id", F.col("p.cell").alias("q_cell"))
    )
    codes_df, q_df = R11._pq_enc(spark, sf_dir, n_queries=HN_N_QUERIES)
    cand = (
        probes.join(
            assignment,
            (F.col("cell") == F.col("q_cell"))
            & (F.col("vec_id") != F.col("q_id")),
        )
        .select("q_id", "vec_id")
        .join(codes_df, "vec_id")
        .join(F.broadcast(q_df), "q_id")
    )
    w_adc = Window.partitionBy("q_id").orderBy(F.col("adc"), F.col("vec_id"))
    shortlist = (
        cand.select("q_id", "vec_id", R11._adc_expr().alias("adc"))
        .withColumn("srank", F.row_number().over(w_adc))
        .where(F.col("srank") <= HN_MAX_RANK)
        .select("q_id", "vec_id")
    )
    e = S.with_norm(load_table(spark, sf_dir, "embeddings"))
    q = e.where(F.col("vec_id") < HN_N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
    )
    rr = (
        shortlist.join(e, "vec_id")
        .join(F.broadcast(q), "q_id")
        .select(
            "q_id",
            "vec_id",
            (
                S._dot(F.col("qv"), F.col("v"))
                / (F.col("qn") * F.col("norm"))
            ).alias("cosine"),
        )
    )
    w_cos = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), "vec_id")
    ranked = rr.withColumn("rank", F.row_number().over(w_cos))
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
