"""Round-11: the IVF coarse quantizer gets TRAINED centroids (VERDICT
r10 item 3 — "recall at scale wants k-means-trained centroids wired in").

- **Trained-IVF top-k** (`q_ann_ivf_trained_topk`): the same IVF
  dataflow as `q_ann_ivf_topk` — assign each corpus vector to its best
  coarse cell, probe the query's N_PROBE best cells, exact cosine only
  inside them — but the cells come from `similarity.lloyd_centroids`,
  the q_kmeans Lloyd recipe (seed = first K vectors, one
  float32-canonicalized mean update), instead of deterministic
  pseudo-random hyperplane points. Training is a one-time index-build
  cost: two corpus scans with a K-row broadcast, amortized over every
  query the index serves.
- **Recall comparison** (`q_ann_recall_trained`): recall@k of the
  trained index vs the untrained one against the brute-force ground
  truth, composed from the REGISTERED queries (same discipline as
  q_ann_recall_eval) — the measured justification for paying the
  training cost.

Registry conventions as everywhere (see registry.py): each query is a
(Spark builder, DuckDB oracle) pair via ``@register``; dot products and
squared distances fold sequentially in index order on both engines, so
scores are bit-identical; centroid means are float32-canonicalized
between iterations exactly like q_kmeans, so the trained centroids match
across engines bit for bit.

Reference parity note: the reference has no vector operators (SURVEY.md
§2 stops at relational + streaming); this family is part of the
training-data-pipeline extension surface the brief mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extensions import similarity as S
from .registry import register
from .registry_ext import _dot_sql
from .sources.tables import load_table

# Trained quantizer geometry: K cells = KMEANS_K (8) so the trained and
# untrained indexes have the SAME cell count and probe budget — recall
# differences are attributable to centroid quality alone.
IVF_TRAINED_QUERIES = 10
IVF_TRAINED_K = 5


def _kmeans_c1_ctes() -> str:
    """The q_kmeans oracle's training CTEs, verbatim spelling
    (registry_round2._KM_SQL): c1 = centroids after one Lloyd update
    from the first-K seed, per-dimension means REAL-canonicalized then
    widened back to DOUBLE lists."""
    from .registry_round2 import KMEANS_DIM, KMEANS_K, _km_assign_sql

    return f"""
emb AS (SELECT vec_id, embedding AS v FROM embeddings),
c0 AS (SELECT vec_id AS cid, embedding AS c FROM embeddings
       WHERE vec_id < {KMEANS_K}),
{_km_assign_sql("c0", "a1")},
c1 AS (
  SELECT cluster AS cid, list(CAST(mf AS DOUBLE) ORDER BY pos) AS c
  FROM (
    SELECT a1.cluster, g.pos,
           CAST(avg(CAST(a1.v[g.pos] AS DOUBLE)) AS REAL) AS mf
    FROM a1 CROSS JOIN generate_series(1, {KMEANS_DIM}) AS g(pos)
    GROUP BY a1.cluster, g.pos
  ) GROUP BY cluster
)"""


def _trained_ivf_sql(
    n_queries: int = IVF_TRAINED_QUERIES, k: int = IVF_TRAINED_K
) -> str:
    return f"""
WITH {_kmeans_c1_ctes()},
n AS (
  SELECT vec_id, v, sqrt({_dot_sql('v', 'v')}) AS nrm
  FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings)
),
ranked AS (
  SELECT n.vec_id, n.v, n.nrm, c.cid AS cell,
         row_number() OVER (PARTITION BY n.vec_id
                            ORDER BY {_dot_sql('n.v', 'c.c')} DESC, c.cid)
           AS cell_rank
  FROM n CROSS JOIN c1 c
),
assignment AS (SELECT vec_id, v, nrm, cell FROM ranked WHERE cell_rank = 1),
probes AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qn, cell AS q_cell
  FROM ranked WHERE vec_id < {n_queries} AND cell_rank <= {S.N_PROBE}
),
scored AS (
  SELECT p.q_id, a.vec_id,
         {_dot_sql('p.qv', 'a.v')} / (p.qn * a.nrm) AS cosine
  FROM probes p JOIN assignment a
    ON a.cell = p.q_cell AND a.vec_id <> p.q_id
)
SELECT q_id, vec_id, cosine, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= {k}
"""


@register(
    "q_ann_ivf_trained_topk",
    _trained_ivf_sql(),
    "vector",
    "ivf",
    "topk",
    "trained",
)
def q_ann_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k with k-means-TRAINED coarse-quantizer
    centroids — the production index-build path (train quantizer once,
    assign corpus once, probe per query). Same N_CELLS/N_PROBE budget as
    the untrained q_ann_ivf_topk, so q_ann_recall_trained isolates the
    effect of centroid quality on recall.

    Scale: training is two corpus scans with the K-centroid table folded
    into one broadcast row (q_kmeans's zero-shuffle argmin); the index
    scan assigns cells fused into the corpus scan; per-query candidate
    volume is ~n_probe/n_cells of the corpus (probed-cell occupancy),
    identical to the untrained plan."""
    from .registry_round2 import KMEANS_K

    emb = load_table(spark, sf_dir, "embeddings")
    cents = S.lloyd_centroids(emb, k=KMEANS_K, updates=1)
    out = S.ivf_cosine_topk_trained(
        emb, cents, n_queries=IVF_TRAINED_QUERIES, k=IVF_TRAINED_K
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


def _recall_trained_sql() -> str:
    from .registry import REGISTRY

    truth_sql = REGISTRY["q_ann_cosine_topk"].sql
    untrained_sql = REGISTRY["q_ann_ivf_topk"].sql
    trained_sql = _trained_ivf_sql()
    return f"""
WITH truth AS ({truth_sql}),
untrained AS ({untrained_sql}),
trained AS ({trained_sql}),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
hits AS (
  SELECT 'ivf_trained' AS method, CAST(count(*) AS BIGINT) AS n_hit
  FROM truth t JOIN trained a ON t.q_id = a.q_id AND t.vec_id = a.vec_id
  UNION ALL
  SELECT 'ivf_untrained' AS method, CAST(count(*) AS BIGINT) AS n_hit
  FROM truth t JOIN untrained a ON t.q_id = a.q_id AND t.vec_id = a.vec_id
)
SELECT method, tot.n_truth, n_hit,
       CAST(CAST(n_hit AS DOUBLE) / greatest(tot.n_truth, 1) AS REAL)
         AS recall_at_k
FROM hits CROSS JOIN tot
"""


@register("q_ann_recall_trained", _recall_trained_sql(), "llm", "ann", "eval")
def q_ann_recall_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the trained vs untrained IVF index against the
    brute-force cosine ground truth — the index-build trade study:
    does paying the k-means training actually buy recall at the same
    probe budget? Composes the REGISTERED queries (the eval measures
    the very result sets production emits), like q_ann_recall_eval.

    Scale: ground truth is the query-set-bounded brute-force scan; the
    eval itself joins two top-k-sized lists (n_queries × k rows)."""
    from .registry import REGISTRY

    truth = (
        REGISTRY["q_ann_cosine_topk"].fn(spark, sf_dir).select("q_id", "vec_id")
    )
    tot = truth.agg(F.count("*").cast("long").alias("n_truth"))
    parts = []
    for method, qname in (
        ("ivf_trained", "q_ann_ivf_trained_topk"),
        ("ivf_untrained", "q_ann_ivf_topk"),
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
