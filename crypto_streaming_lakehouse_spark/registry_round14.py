"""Round-14: incremental IVF-PQ index maintenance (VERDICT r13 item 1)
plus the two sanctioned breadth extensions (item 8).

- **Incremental index upsert** (`q_ivfpq_index_upsert`): the last
  unbuilt step of the production retrieval path rounds 11-13 composed.
  A 100 TB pipeline ingests embeddings continuously; rebuilding the
  trained IVF-PQ index per batch is a non-starter, and the actual
  production pattern is: train ONCE on a snapshot, then stream new
  vectors through cell-assignment + PQ-encode over the STATIC trained
  codebooks (FAISS `add` after `train`). The two-snapshot fixture is
  carved from the embeddings table itself — base = the low-vec_id 7/8
  of the corpus (vec_id is ingestion order), delta = the newest 1/8 —
  so the oracle sees the same split at every scale. The coarse
  quantizer (one Lloyd update, q_kmeans's exact recipe) and the PQ
  codebook (first PQ_SEARCH_K vectors) are trained on BASE ONLY; both
  base and delta rows are then assigned + encoded against those static
  codebooks. Encoding is stateless given the codebooks, so the
  incremental index is EXACTLY the index a from-scratch build with the
  same codebooks would produce — the stream≡batch pytest
  (tests/test_round14.py) proves the streaming form equals this batch
  twin micro-batch-for-micro-batch.
- **Upsert monitoring** (`q_ivfpq_upsert_occupancy`,
  `q_ivfpq_upsert_distortion`): the two dashboards a production index
  watches while absorbing a stream. Occupancy: per-cell base/delta row
  counts and the delta fraction — does the incoming stream skew the
  scan-load balance the trained cells bought (q_ivf_cell_occupancy)?
  Distortion: mean PQ quantization error of delta rows vs base rows
  under the base-trained codebook — the staleness signal that triggers
  a retrain when the corpus drifts away from the training snapshot.
- **Learned-sparse retrieval scoring** (`q_splade_topk`): SPLADE-shape
  scoring — every document carries a sparse term→weight map (here the
  deterministic stand-in w = float32(ln(1+tf)); a learned model would
  supply its own weights through the identical dataflow), and
  query-document score is the sparse dot product over shared terms.
  The plan is the production one: the tiny query-side weight table
  broadcasts, the corpus-side posting list is scanned ONCE, and the
  score aggregation shuffles only matched (q_id, doc_id) pairs.
- **OPQ-style rotation** (`q_opq_rotation_distortion`): product
  quantization distortion depends on how the rotation distributes
  variance across subspaces; OPQ picks the orthogonal transform that
  minimizes it. This registers the eval harness with the simplest
  orthogonal transform — a fixed dimension PERMUTATION
  (i -> 37*i mod 64, bijective since gcd(37,64)=1) — and measures
  per-subspace MSE for the identity vs the permuted layout, codebooks
  rebuilt per variant. The measured object is the eval itself: the
  same harness scores any candidate rotation.

Reference parity note: the reference has no vector or sparse-retrieval
operators (SURVEY.md §2 — its surface is the crypto OHLCV pipeline,
reference/spark/jobs/*.py); this module extends the LLM-training-data
family the build mandate adds (SURVEY §6).

Registry conventions as everywhere (registry.py): squared distances and
dot products fold sequentially in index order on both engines; compared
floats are float32-canonicalized via r6 / CAST(.. AS REAL); window and
argmin tie-breaks are total orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import registry_round11 as R11
from .extensions import similarity as S
from .registry import register
from .sources.tables import load_table

# The two-snapshot split: delta = the top 1/(UPSERT_DIV) of vec_ids
# (ingestion order), base = the rest. 8 keeps the base's first
# PQ_SEARCH_K (16) and KMEANS_K (8) vec_ids — the codebook seeds — in
# base at every fixture scale (cutoff = n - n//8 >= 17 for any n >= 19).
UPSERT_DIV = 8

# SPLADE-shape scoring: queries = the first SPLADE_NQ documents' own
# term-weight maps; top SPLADE_K matches per query.
SPLADE_NQ = 8
SPLADE_K = 10

# OPQ permutation: i -> (OPQ_MULT * i) mod 64. 37 is coprime to 64, so
# the map is a bijection (an orthogonal permutation matrix).
OPQ_MULT = 37


# ---------------------------------------------------------------------------
# Shared SQL fragments
# ---------------------------------------------------------------------------


def _cutoff_sql() -> str:
    """The base/delta boundary as an expression over the ``nrow`` CTE."""
    return f"nrow.n - nrow.n // {UPSERT_DIV}"


def _upsert_cells_ctes() -> str:
    """nrow/emb/base + the BASE-trained coarse quantizer (q_kmeans's
    exact one-Lloyd-update recipe, registry_round2 spelling, restricted
    to base rows) + ``cells`` = every vector's nearest trained centroid
    (float32 d2, cid tie-break)."""
    from .registry_round2 import KMEANS_DIM, KMEANS_K, _KM_D2

    return f"""
nrow AS (SELECT max(vec_id) + 1 AS n FROM embeddings),
emb AS (SELECT vec_id, embedding AS v FROM embeddings),
base AS (
  SELECT e.vec_id, e.v FROM emb e CROSS JOIN nrow
  WHERE e.vec_id < {_cutoff_sql()}
),
c0 AS (SELECT vec_id AS cid, v AS c FROM base WHERE vec_id < {KMEANS_K}),
a1 AS (
  SELECT vec_id, v, cid AS cluster
  FROM (
    SELECT e.vec_id, e.v, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY CAST({_KM_D2} AS REAL), c.cid) AS rn
    FROM base e CROSS JOIN c0 c
  ) WHERE rn = 1
),
c1 AS (
  SELECT cluster AS cid, list(CAST(mf AS DOUBLE) ORDER BY pos) AS c
  FROM (
    SELECT a1.cluster, g.pos,
           CAST(avg(CAST(a1.v[g.pos] AS DOUBLE)) AS REAL) AS mf
    FROM a1 CROSS JOIN generate_series(1, {KMEANS_DIM}) AS g(pos)
    GROUP BY a1.cluster, g.pos
  ) GROUP BY cluster
),
cells AS (
  SELECT vec_id, cid AS cell
  FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY CAST({_KM_D2} AS REAL), c.cid) AS rn
    FROM emb e CROSS JOIN c1 c
  ) WHERE rn = 1
)"""


def _upsert_sql() -> str:
    # The PQ chain's ``cent`` CTE selects vec_id < PQ_SEARCH_K from
    # embeddings — a subset of base by the UPSERT_DIV constant's design
    # — so the codebook is base-trained even though the CTE spells the
    # full table.
    #
    # ``codes`` is emitted as a comma-delimited string (not the raw
    # list): the grading driver's pandas canonicalizer sorts every
    # output column and cannot factorize list cells
    # (CORRECTNESS_r14: `unhashable type: 'list'`). The Spark twin
    # serializes identically (array_join over the bigint codes); the
    # memoized index table keeps the array form for the occupancy/
    # distortion consumers and the stream≡batch test.
    return f"""
WITH {_upsert_cells_ctes()},
{R11._pq_code_ctes(include_emb=False)}
SELECT e.vec_id, CAST(cl.cell AS BIGINT) AS cell,
       array_to_string(co.codes, ',') AS codes,
       CASE WHEN e.vec_id < {_cutoff_sql()} THEN 'base' ELSE 'delta' END
         AS snapshot
FROM emb e
CROSS JOIN nrow
JOIN cells cl ON cl.vec_id = e.vec_id
JOIN codes co ON co.vec_id = e.vec_id
"""


def _occupancy_sql() -> str:
    return f"""
WITH {_upsert_cells_ctes()},
tagged AS (
  SELECT c.cell,
         CASE WHEN c.vec_id < {_cutoff_sql()} THEN 0 ELSE 1 END AS is_delta
  FROM cells c CROSS JOIN nrow
)
SELECT CAST(cell AS BIGINT) AS cell,
       CAST(sum(1 - is_delta) AS BIGINT) AS base_rows,
       CAST(sum(is_delta) AS BIGINT) AS delta_rows,
       CAST(count(*) AS BIGINT) AS total_rows,
       CAST(CAST(sum(is_delta) AS DOUBLE) / count(*) AS REAL)
         AS delta_frac
FROM tagged GROUP BY cell
"""


def _distortion_sql() -> str:
    return f"""
WITH nrow AS (SELECT max(vec_id) + 1 AS n FROM embeddings),
{R11._pq_code_ctes()},
md AS (SELECT vec_id, s, min(d2) AS mind2 FROM scored GROUP BY vec_id, s)
SELECT CASE WHEN md.vec_id < {_cutoff_sql()} THEN 'base' ELSE 'delta' END
         AS snapshot,
       CAST(avg(mind2) AS REAL) AS mse
FROM md CROSS JOIN nrow
GROUP BY 1
"""


def _splade_sql() -> str:
    return rf"""
WITH words AS (
  SELECT doc_id, w FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
    FROM documents
  ) WHERE len(w) >= 2
),
tw AS (
  SELECT doc_id, w, CAST(ln(1 + count(*)) AS REAL) AS wt
  FROM words GROUP BY doc_id, w
),
qw AS (
  SELECT doc_id AS q_id, w, CAST(wt AS DOUBLE) AS qwt
  FROM tw WHERE doc_id < {SPLADE_NQ}
),
scores AS (
  SELECT q.q_id, d.doc_id,
         CAST(sum(q.qwt * CAST(d.wt AS DOUBLE)) AS REAL) AS score
  FROM qw q JOIN tw d ON d.w = q.w AND d.doc_id <> q.q_id
  GROUP BY q.q_id, d.doc_id
)
SELECT q_id, doc_id, score, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY score DESC, doc_id) AS rank
  FROM scores
) WHERE rank <= {SPLADE_K}
"""


def _opq_variant_sql(variant: str, vexpr: str) -> str:
    from .registry_round6 import PQ_SUBS, _PQ_D2

    return f"""
SELECT '{variant}' AS variant, CAST(s AS BIGINT) AS subspace,
       CAST(avg(mind2) AS REAL) AS mse
FROM (
  WITH emb AS (SELECT vec_id, {vexpr} AS v FROM embeddings),
  cent AS (SELECT vec_id AS cid, v AS c FROM emb
           WHERE vec_id < {R11.PQ_SEARCH_K}),
  scored AS (
    SELECT e.vec_id, g.s, c.cid, CAST({_PQ_D2} AS REAL) AS d2
    FROM emb e
    CROSS JOIN generate_series(0, {PQ_SUBS - 1}) AS g(s)
    CROSS JOIN cent c
  )
  SELECT vec_id, s, min(d2) AS mind2 FROM scored GROUP BY vec_id, s
) GROUP BY s"""


def _opq_sql() -> str:
    perm = (
        f"list_transform(generate_series(0, 63), "
        f"i -> embedding[({OPQ_MULT} * i) % 64 + 1])"
    )
    return (
        _opq_variant_sql("identity", "embedding")
        + " UNION ALL "
        + _opq_variant_sql("perm37", perm)
    )


# ---------------------------------------------------------------------------
# Shared Spark helpers
# ---------------------------------------------------------------------------


def _d2_fold(v, c):
    """Sequential-fold squared L2 — bit-identical to _KM_D2's
    list_reduce (and to lloyd_centroids' assignment arithmetic)."""
    return F.aggregate(
        F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _emb_and_cutoff(spark: SparkSession, sf_dir: str):
    """(emb(vec_id, v double[]), one-row cutoff frame)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cut = emb.agg(
        (
            (F.max("vec_id") + 1)
            - F.floor((F.max("vec_id") + 1) / UPSERT_DIV).cast("long")
        ).alias("cutoff")
    )
    return emb, cut


def _cell_assign(emb: DataFrame, cent_row: DataFrame) -> DataFrame:
    """(vec_id, cell): nearest trained centroid by float32 squared L2
    with cid tie-break — one broadcast-argmin corpus scan, the
    q_kmeans/_km_assign_sql shape. ``cent_row`` is a ONE-row frame with
    a ``cents`` array of (cid, c) structs (broadcast-sized: k entries).
    Works unmodified on a streaming micro-batch — the round-14
    incremental-maintenance path streams new vectors through exactly
    this function over the static trained centroids."""
    best = F.array_min(
        F.transform(
            F.col("cents"),
            lambda ct: F.struct(
                _d2_fold(F.col("v"), ct["c"]).cast("float").alias("d2"),
                ct["cid"].alias("cid"),
            ),
        )
    )
    return emb.crossJoin(F.broadcast(cent_row)).select(
        "vec_id", best["cid"].cast("long").alias("cell")
    )


def _trained_cent_row(base: DataFrame) -> DataFrame:
    """One-row (cents) frame: base-trained coarse centroids (one Lloyd
    update from the first-KMEANS_K seed — q_kmeans's oracle recipe)."""
    from .registry_round2 import KMEANS_K

    cents = S.lloyd_centroids(
        base.select("vec_id", F.col("v").alias("embedding")),
        k=KMEANS_K,
        updates=1,
    )
    return cents.agg(F.collect_list(F.struct("cid", "c")).alias("cents"))


def frozen_cent_row(base: DataFrame) -> DataFrame:
    """The one-row trained-centroid table MATERIALIZED for streaming
    consumers. A foreachBatch upsert plan referencing the lazy
    _trained_cent_row re-executes the whole Lloyd training subtree in
    EVERY micro-batch (measured 0.53 vs 0.35 s/batch at sf0.1 —
    bench_artifacts/r15/streaming_upsert_profile.json); freezing the
    K-row table once before the stream starts is the static-codebook
    contract the incremental index is built on (guide §1.2 — the
    training cost is index-build, not per-batch work)."""
    return _trained_cent_row(base).localCheckpoint()


def _upsert_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cell, codes, snapshot) — the incrementally-maintained
    IVF-PQ index table. Memoized per (session, sf_dir): three registry
    queries and the stream≡batch test all read it (same policy as
    _pq_enc's codes memo; bench protocols memo_clear() around timed
    passes)."""
    from .extensions.dedup import memo_materialize

    def build() -> DataFrame:
        emb, cut = _emb_and_cutoff(spark, sf_dir)
        base = (
            emb.crossJoin(F.broadcast(cut))
            .where(F.col("vec_id") < F.col("cutoff"))
            .select("vec_id", "v")
        )
        cent_row = _trained_cent_row(base)
        cells = _cell_assign(emb, cent_row)
        # PQ codebook = first PQ_SEARCH_K vectors by vec_id — a subset
        # of base by UPSERT_DIV's design, so deriving it from the full
        # emb IS the base-trained codebook (documented invariant; the
        # stream test injects the same codebook explicitly).
        codes = R11._pq_codes_arrow(spark, emb)
        return (
            emb.crossJoin(F.broadcast(cut))
            .join(cells, "vec_id")
            .join(codes, "vec_id")
            .select(
                "vec_id",
                "cell",
                "codes",
                F.when(F.col("vec_id") < F.col("cutoff"), F.lit("base"))
                .otherwise(F.lit("delta"))
                .alias("snapshot"),
            )
        )

    return memo_materialize(spark, f"ivfpq_upsert:{sf_dir}", build)


# ---------------------------------------------------------------------------
# Incremental IVF-PQ index maintenance
# ---------------------------------------------------------------------------


@register(
    "q_ivfpq_index_upsert",
    _upsert_sql(),
    "vector",
    "ivf",
    "pq",
    "incremental",
)
def q_ivfpq_index_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incrementally-maintained trained IVF-PQ index: coarse
    centroids (one Lloyd update) and PQ codebook trained on the BASE
    snapshot only; every vector — base and the newest-1/8 delta — is
    cell-assigned and PQ-encoded against those STATIC codebooks. Encode
    is stateless given the codebooks, so this batch table is exactly
    what the streaming path (tests/test_round14.py: delta rows arriving
    as micro-batches through the same _cell_assign + _pq_codes_arrow
    over the frozen codebooks) accumulates — upsert ≡ rebuild, proven
    stream≡batch.

    Scale: index build on base = the Lloyd training scans + one
    assignment scan + the Arrow PQ encode (all broadcast-argmin, no
    corpus shuffle); the delta absorbs at stream rate with the SAME
    per-row cost and zero retraining. Output is corpus-sized by design
    (it IS the index table a 100 TB deployment persists, partitioned by
    cell).

    The declared output serializes ``codes`` as a comma-delimited
    string (mirrored in the oracle SQL): the grading driver's pandas
    canonicalizer cannot sort list-typed cells (CORRECTNESS_r14 —
    `unhashable type: 'list'`). Internal consumers (occupancy /
    distortion / the stream≡batch test) read the memoized array form
    via _upsert_index directly."""
    return _upsert_index(spark, sf_dir).withColumn(
        "codes", F.array_join(F.col("codes").cast("array<string>"), ",")
    )


@register(
    "q_ivfpq_upsert_occupancy",
    _occupancy_sql(),
    "vector",
    "ivf",
    "incremental",
    "eval",
)
def q_ivfpq_upsert_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell occupancy of the upserted index, split base/delta — the
    skew dashboard: if the delta fraction concentrates in few cells, the
    incoming stream is drifting from the training snapshot and probe
    cost degrades (q_ivf_cell_occupancy's balance story, now monitored
    ACROSS snapshots). One pass over the memoized index table; output
    is k cells rows."""
    idx = _upsert_index(spark, sf_dir).select(
        "cell", (F.col("snapshot") == "delta").cast("int").alias("is_delta")
    )
    return idx.groupBy("cell").agg(
        F.sum(1 - F.col("is_delta")).cast("long").alias("base_rows"),
        F.sum("is_delta").cast("long").alias("delta_rows"),
        F.count(F.lit(1)).alias("total_rows"),
        (F.sum("is_delta").cast("double") / F.count(F.lit(1)))
        .cast("float")
        .alias("delta_frac"),
    )


@register(
    "q_ivfpq_upsert_distortion",
    _distortion_sql(),
    "vector",
    "pq",
    "incremental",
    "eval",
)
def q_ivfpq_upsert_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean PQ quantization error (per-(row, subspace) min d2, averaged)
    of base vs delta rows under the base-trained codebook — the
    STALENESS signal: delta mse drifting above base mse means the
    frozen codebook no longer fits the incoming distribution and a
    retrain (then re-encode) is due. The retrain-trigger metric every
    production PQ deployment monitors.

    Scale: one corpus scan with the broadcast codebook folded in (the
    q_pq_distortion shape) + a 2-row aggregate."""
    from .registry_round6 import PQ_SUBS

    emb, cut = _emb_and_cutoff(spark, sf_dir)
    cent = emb.where(F.col("vec_id") < R11.PQ_SEARCH_K).select(
        F.col("vec_id").alias("cid"),
        R11._subvectors(F.col("v")).alias("csub"),
    )
    cents = cent.agg(
        F.array_sort(F.collect_list(F.struct("cid", "csub"))).alias("cents")
    )
    md = F.transform(
        R11._subvectors(F.col("v")),
        lambda sub, s: F.array_min(
            F.transform(
                F.col("cents"),
                lambda ct: R11._sub_d2(
                    sub, F.element_at(ct["csub"], s + 1)
                ).cast("float"),
            )
        ),
    )
    assert PQ_SUBS  # geometry shared with the oracle via _pq_code_ctes
    return (
        emb.crossJoin(F.broadcast(cents))
        .crossJoin(F.broadcast(cut))
        .select(
            F.when(F.col("vec_id") < F.col("cutoff"), F.lit("base"))
            .otherwise(F.lit("delta"))
            .alias("snapshot"),
            F.explode(md).alias("mind2"),
        )
        .groupBy("snapshot")
        .agg(F.avg("mind2").cast("float").alias("mse"))
    )


# ---------------------------------------------------------------------------
# Learned-sparse (SPLADE-shape) retrieval scoring
# ---------------------------------------------------------------------------


@register(
    "q_splade_topk",
    _splade_sql(),
    "retrieval",
    "sparse",
    "topk",
)
def q_splade_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLADE-shape learned-sparse retrieval: docs carry sparse
    term→weight maps (deterministic stand-in w = float32(ln(1+tf)); a
    learned expansion model feeds the identical dataflow), score =
    sparse dot product over shared terms, top-SPLADE_K per query with
    (score DESC, doc_id) total order. Ranks are assigned AFTER the
    float32 score collapse, so last-ulp double noise cannot flip them.

    Scale: the production plan — the SPLADE_NQ-query weight table
    broadcasts (queries ≪ corpus always), the corpus posting list
    (doc, term, w) is scanned once with the hash join folded in, and
    only matched (q_id, doc_id) partial products shuffle to the score
    aggregation. No corpus self-join, no term-keyed corpus shuffle; at
    1000 executors the posting scan parallelizes by input split. High-df
    terms fan out as q_terms × df candidate rows — the same bounded
    expansion an inverted index serves, and a df cap (q_decontaminate's
    pattern) is the documented dial if a stopword-heavy corpus ever
    needs one."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            "doc_id",
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("w"),
        )
        .where(F.length("w") >= 2)
    )
    tw = words.groupBy("doc_id", "w").agg(
        F.log(F.lit(1) + F.count(F.lit(1))).cast("float").alias("wt")
    )
    qw = tw.where(F.col("doc_id") < SPLADE_NQ).select(
        F.col("doc_id").alias("q_id"),
        "w",
        F.col("wt").cast("double").alias("qwt"),
    )
    scores = (
        tw.join(F.broadcast(qw), "w")
        .where(F.col("doc_id") != F.col("q_id"))
        .groupBy("q_id", "doc_id")
        .agg(
            F.sum(F.col("qwt") * F.col("wt").cast("double"))
            .cast("float")
            .alias("score")
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= SPLADE_K)
        .select(
            "q_id", "doc_id", "score", F.col("rank").cast("long").alias("rank")
        )
    )


# ---------------------------------------------------------------------------
# OPQ-style rotation eval
# ---------------------------------------------------------------------------


@register(
    "q_opq_rotation_distortion",
    _opq_sql(),
    "vector",
    "pq",
    "eval",
)
def q_opq_rotation_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-subspace PQ distortion for the identity layout vs a fixed
    orthogonal rotation (the permutation i -> 37i mod 64), codebook
    rebuilt per variant — the OPQ eval harness: OPQ chooses the
    orthogonal transform minimizing exactly this objective, and a
    candidate rotation drops into ``variants`` unchanged. A permutation
    is the cheapest orthogonal matrix (zero FLOPs, pure relayout), which
    makes it the right first probe of how much subspace composition
    alone moves distortion.

    Scale: one corpus scan per variant with the 16-entry codebook folded
    in (the q_pq_distortion plan); output 2×PQ_SUBS rows."""
    from .registry_round6 import PQ_SUBS

    variants = [
        ("identity", lambda v: v),
        (
            "perm37",
            lambda v: F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: F.element_at(v, (F.lit(OPQ_MULT) * i) % 64 + 1),
            ),
        ),
    ]
    out = None
    for name, vmap in variants:
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id",
            vmap(F.col("embedding").cast("array<double>")).alias("v"),
        )
        cent = emb.where(F.col("vec_id") < R11.PQ_SEARCH_K).select(
            F.col("vec_id").alias("cid"),
            R11._subvectors(F.col("v")).alias("csub"),
        )
        cents = cent.agg(
            F.array_sort(F.collect_list(F.struct("cid", "csub"))).alias(
                "cents"
            )
        )
        md = F.transform(
            R11._subvectors(F.col("v")),
            lambda sub, s: F.struct(
                s.cast("long").alias("s"),
                F.array_min(
                    F.transform(
                        F.col("cents"),
                        lambda ct: R11._sub_d2(
                            sub, F.element_at(ct["csub"], s + 1)
                        ).cast("float"),
                    )
                ).alias("mind2"),
            ),
        )
        per_sub = (
            emb.crossJoin(F.broadcast(cents))
            .select(F.explode(md).alias("e"))
            .select(
                F.col("e.s").alias("subspace"), F.col("e.mind2").alias("mind2")
            )
            .groupBy("subspace")
            .agg(F.avg("mind2").cast("float").alias("mse"))
            .select(F.lit(name).alias("variant"), "subspace", "mse")
        )
        out = per_sub if out is None else out.unionAll(per_sub)
    assert PQ_SUBS
    return out


# ---------------------------------------------------------------------------
# Round-14 continuation: operational metrics for the three new families
# ---------------------------------------------------------------------------

# Posting-list df histogram buckets by binary magnitude (length of the
# binary representation = floor(log2(df)) + 1) — pure integer
# arithmetic on both engines, no floating log whose last-ulp could
# straddle a bucket boundary.


def _full_cells_ctes() -> str:
    """Like _upsert_cells_ctes' chain but trained on the FULL corpus
    (same first-KMEANS_K seed — a subset of base, so the two trainings
    share a seed and differ only in the update's row set). CTEs are
    suffixed ``f`` to coexist with the base-trained chain."""
    from .registry_round2 import KMEANS_DIM, KMEANS_K, _KM_D2

    return f"""
c0f AS (SELECT vec_id AS cid, v AS c FROM emb WHERE vec_id < {KMEANS_K}),
a1f AS (
  SELECT vec_id, v, cid AS cluster
  FROM (
    SELECT e.vec_id, e.v, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY CAST({_KM_D2} AS REAL), c.cid) AS rn
    FROM emb e CROSS JOIN c0f c
  ) WHERE rn = 1
),
c1f AS (
  SELECT cluster AS cid, list(CAST(mf AS DOUBLE) ORDER BY pos) AS c
  FROM (
    SELECT a1f.cluster, g.pos,
           CAST(avg(CAST(a1f.v[g.pos] AS DOUBLE)) AS REAL) AS mf
    FROM a1f CROSS JOIN generate_series(1, {KMEANS_DIM}) AS g(pos)
    GROUP BY a1f.cluster, g.pos
  ) GROUP BY cluster
),
cellsf AS (
  SELECT vec_id, cid AS cell
  FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY CAST({_KM_D2} AS REAL), c.cid) AS rn
    FROM emb e CROSS JOIN c1f c
  ) WHERE rn = 1
)"""


def _churn_sql() -> str:
    return f"""
WITH {_upsert_cells_ctes()},
{_full_cells_ctes()},
j AS (
  SELECT b.vec_id,
         CASE WHEN b.vec_id < {_cutoff_sql()} THEN 'base' ELSE 'delta' END
           AS snapshot,
         CASE WHEN b.cell <> f.cell THEN 1 ELSE 0 END AS moved
  FROM cells b JOIN cellsf f ON f.vec_id = b.vec_id CROSS JOIN nrow
)
SELECT snapshot, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(moved) AS BIGINT) AS n_moved,
       CAST(CAST(sum(moved) AS DOUBLE) / count(*) AS REAL) AS churn_frac
FROM j GROUP BY snapshot
"""


def _posting_stats_sql() -> str:
    return rf"""
WITH words AS (
  SELECT doc_id, w FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
    FROM documents
  ) WHERE len(w) >= 2
),
df AS (SELECT w, count(DISTINCT doc_id) AS df FROM words GROUP BY w)
SELECT CAST(length(bin(CAST(df AS BIGINT))) AS BIGINT) AS df_bits,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(df) AS BIGINT) AS total_postings
FROM df GROUP BY df_bits
"""


def _subspace_var_variant_sql(variant: str, vexpr: str) -> str:
    from .registry_round6 import PQ_SUBDIM, PQ_SUBS

    return f"""
SELECT '{variant}' AS variant,
       CAST((g.pos - 1) // {PQ_SUBDIM} AS BIGINT) AS subspace,
       CAST(sum(m2 / n - (m1 / n) * (m1 / n)) AS REAL) AS variance
FROM (
  SELECT pos, sum(x) AS m1, sum(x * x) AS m2, count(*) AS n
  FROM (
    SELECT g.pos AS pos, CAST(v[g.pos] AS DOUBLE) AS x
    FROM (SELECT {vexpr} AS v FROM embeddings) e
    CROSS JOIN generate_series(1, {PQ_SUBS * PQ_SUBDIM}) AS g(pos)
  ) GROUP BY pos
) AS g(pos, m1, m2, n)
GROUP BY subspace"""


def _subspace_var_sql() -> str:
    perm = (
        f"list_transform(generate_series(0, 63), "
        f"i -> embedding[({OPQ_MULT} * i) % 64 + 1])"
    )
    return (
        _subspace_var_variant_sql("identity", "embedding")
        + " UNION ALL "
        + _subspace_var_variant_sql("perm37", perm)
    )


@register(
    "q_ivfpq_assignment_churn",
    _churn_sql(),
    "vector",
    "ivf",
    "incremental",
    "eval",
)
def q_ivfpq_assignment_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-assignment churn of a RETRAIN: fraction of vectors whose
    nearest-centroid cell changes when the coarse quantizer is retrained
    on base+delta vs the frozen base-only training (same first-K seed,
    one Lloyd update each — only the update's row set differs). This is
    the COST side of the staleness dashboard: q_ivfpq_upsert_distortion
    says when a retrain is due; churn measures how much of the index a
    retrain forces you to reassign (and re-shard, if storage is
    cell-partitioned). Split by snapshot — delta rows, absent from the
    frozen training, churn hardest.

    Scale: two bounded Lloyd trainings + two broadcast-argmin assignment
    scans + an equi-join on vec_id; output is 2 rows."""
    from .registry_round2 import KMEANS_K

    emb, cut = _emb_and_cutoff(spark, sf_dir)
    base = (
        emb.crossJoin(F.broadcast(cut))
        .where(F.col("vec_id") < F.col("cutoff"))
        .select("vec_id", "v")
    )
    cells_base = _cell_assign(emb, _trained_cent_row(base))
    cells_full = _cell_assign(emb, _trained_cent_row(emb))
    assert KMEANS_K  # same seed rule on both trainings (oracle parity)
    return (
        cells_base.withColumnRenamed("cell", "cell_b")
        .join(cells_full.withColumnRenamed("cell", "cell_f"), "vec_id")
        .crossJoin(F.broadcast(cut))
        .select(
            F.when(F.col("vec_id") < F.col("cutoff"), F.lit("base"))
            .otherwise(F.lit("delta"))
            .alias("snapshot"),
            (F.col("cell_b") != F.col("cell_f")).cast("int").alias("moved"),
        )
        .groupBy("snapshot")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("moved").cast("long").alias("n_moved"),
            (F.sum("moved").cast("double") / F.count(F.lit(1)))
            .cast("float")
            .alias("churn_frac"),
        )
    )


@register(
    "q_splade_posting_stats",
    _posting_stats_sql(),
    "retrieval",
    "sparse",
    "eval",
)
def q_splade_posting_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list document-frequency histogram, bucketed by binary
    magnitude (df_bits = bit-length of df, pure integer arithmetic — no
    floating log at bucket boundaries): the dial-sizing diagnostic for
    q_splade_topk's documented df cap. The top bucket's total_postings
    is exactly the join fanout a cap at that magnitude would remove.

    Scale: one tokenize scan + a (term) count-distinct + an 8-ish-row
    histogram — the same inverted-index build cost SPLADE scoring
    already pays, aggregated one step further."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            "doc_id",
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("w"),
        )
        .where(F.length("w") >= 2)
    )
    df = words.groupBy("w").agg(
        F.countDistinct("doc_id").alias("df")
    )
    return (
        df.select(
            F.length(F.bin(F.col("df"))).cast("long").alias("df_bits"),
            "df",
        )
        .groupBy("df_bits")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("df").cast("long").alias("total_postings"),
        )
    )


@register(
    "q_opq_subspace_variance",
    _subspace_var_sql(),
    "vector",
    "pq",
    "eval",
)
def q_opq_subspace_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-subspace TOTAL VARIANCE (sum over the subspace's dims of the
    population variance, explicit-moment arithmetic m2/n - (m1/n)² on
    both engines) for the identity vs permuted layouts — the ANALYTIC
    side of the OPQ objective: PQ distortion tracks how evenly variance
    spreads across subspaces, so a candidate rotation is screened here
    (one cheap moment scan) before paying the full distortion eval
    (q_opq_rotation_distortion). The permutation preserves the dim SET,
    so total variance across subspaces is invariant — pinned in
    tests/test_round14.py — while its per-subspace distribution moves.

    Scale: one posexplode scan per variant + a 64-key moment aggregate;
    output 2×PQ_SUBS rows."""
    from .registry_round6 import PQ_SUBDIM, PQ_SUBS

    variants = [
        ("identity", lambda v: v),
        (
            "perm37",
            lambda v: F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: F.element_at(v, (F.lit(OPQ_MULT) * i) % 64 + 1),
            ),
        ),
    ]
    out = None
    for name, vmap in variants:
        emb = load_table(spark, sf_dir, "embeddings").select(
            vmap(F.col("embedding").cast("array<double>")).alias("v")
        )
        per_dim = (
            emb.select(F.posexplode("v").alias("pos", "x"))
            .groupBy("pos")
            .agg(
                F.sum("x").alias("m1"),
                F.sum(F.col("x") * F.col("x")).alias("m2"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        per_sub = (
            per_dim.select(
                (F.col("pos") / PQ_SUBDIM).cast("long").alias("subspace"),
                (
                    F.col("m2") / F.col("n")
                    - (F.col("m1") / F.col("n")) * (F.col("m1") / F.col("n"))
                ).alias("var_dim"),
            )
            .groupBy("subspace")
            .agg(F.sum("var_dim").cast("float").alias("variance"))
            .select(F.lit(name).alias("variant"), "subspace", "variance")
        )
        out = per_sub if out is None else out.unionAll(per_sub)
    assert PQ_SUBS
    return out
