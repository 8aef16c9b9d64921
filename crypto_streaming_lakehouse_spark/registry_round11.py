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

Second batch (same round, continuation session) — the PQ family gets its
SEARCH half, and the log-diameter components path earns driver evidence:

- **PQ-ADC top-k** (`q_ann_pq_adc_topk`): q_pq_encode compressed the
  corpus to PQ codes but nothing ever SEARCHED them. This is the
  asymmetric-distance-computation stage of IVF-PQ (Jégou et al., the
  memory-bound half of billion-scale ANN): per query, precompute the
  subspace×codebook distance lookup table once (S×K floats), then score
  every encoded vector with S table lookups + adds instead of a
  64-dim float product against the raw corpus. The search codebook is
  4-bit (16 entries/subspace → 32-bit vectors, 64× compression) — the
  2-bit encode-stage codebook measured recall@5 ≈ 0.1, quantified and
  rejected.
- **PQ re-rank** (`q_ann_pq_rerank`): the production two-stage shape —
  ADC shortlists R=20 candidates from codes alone, then only the
  shortlist pays an exact raw-vector re-rank; raw-vector reads drop
  from corpus-sized to R×n_queries.
- **PQ recall eval** (`q_ann_pq_recall`): recall@k of BOTH PQ stages
  against the exact squared-L2 ground truth — the compression-vs-
  accuracy trade study that justifies (or rejects) shipping 16-bit
  codes instead of 256-byte raw vectors, and measures how much the
  re-rank stage buys back.
- **IVF-PQ end-to-end** (`q_ann_ivfpq_topk`): the capstone — coarse
  cells prune to ~n_probe/n_cells of the corpus, ADC scores the probed
  candidates from codes alone, the top-R shortlist pays the exact
  re-rank; the canonical FAISS-IVFPQ pipeline composed from the
  registry's own stages.
- **Pointer-doubling components** (`q_dedup_components_shortcut`): the
  O(log diameter) convergence mode of ``dup_components`` (label
  shortcutting, lbl(u) ← lbl(lbl(u))) run against the SAME recursive-CTE
  oracle as q_dedup_components — the mode a chain-of-similarity graph
  needs at scale was previously exercised only by a unit fixture, never
  driver-hash-verified on real pair data.

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


def _lloyd_cents_memo(
    spark: SparkSession, sf_dir: str, *, k: int, updates: int = 1
) -> DataFrame:
    """Session-memoized k-means-TRAINED coarse centroids over the full
    embeddings corpus — the quantizer-training step shared by the whole
    trained-index family (q_ann_ivf_trained_topk, q_ivf_cell_occupancy,
    q_ann_ivfpq_trained_topk, q_hard_negative_mining_ivfpq_trained and
    every recall composite built from them).

    Why memoize (guide §1.2/§2.4): training is an index-BUILD cost — a
    production deployment trains the quantizer once and serves every
    query from the stored centroids, but the lazy lloyd_centroids chain
    re-embedded the 5-job training scan into every consumer's plan (and
    the recall composites execute it once per composed variant:
    measured 0.7-1.2 s per execution at sf0.1). Same memo policy as the
    pq_codes index memo (_pq_enc): keyed per (session, sf_dir, k,
    updates), K-row output behind a lineage cut, bench/probe protocols
    memo_clear() around timed passes so cold-build cost stays measured
    (scripts/time_one.py)."""
    from .extensions.dedup import memo_materialize

    def build() -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        return S.lloyd_centroids(emb, k=k, updates=updates)

    return memo_materialize(
        spark, f"lloyd_cents:{sf_dir}:k{k}:u{updates}", build
    )


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
    into one broadcast row (q_kmeans's zero-shuffle argmin), memoized
    per session like any stored index; the index scan assigns cells
    fused into the corpus scan; per-query candidate volume is
    ~n_probe/n_cells of the corpus (probed-cell occupancy), identical
    to the untrained plan."""
    from .registry_round2 import KMEANS_K

    emb = load_table(spark, sf_dir, "embeddings")
    cents = _lloyd_cents_memo(spark, sf_dir, k=KMEANS_K)
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


# ---------------------------------------------------------------------------
# PQ-ADC search: the query half of product quantization
# ---------------------------------------------------------------------------

PQ_ADC_QUERIES = 10
PQ_ADC_K = 5
# Two-stage retrieval shortlist: ADC ranks the whole corpus cheaply, the
# top R survivors get exact re-ranking against raw vectors.
PQ_RERANK_R = 20
# The SEARCH family's codebook is 16 entries per subspace (4-bit codes,
# 8 subspaces → 32-bit vectors, a 64× compression of 64×float32).
# q_pq_encode's 2-bit K=4 codebook demonstrates the encode stage at
# maximum compression; searching it measured recall@5 of 0.10/0.22
# (adc/rerank) at sf0.001 — too lossy to ship, exactly what the trade
# study is for. 4 bits is the small end of production PQ (FAISS default
# is 8-bit); same geometry, one constant.
PQ_SEARCH_K = 16


def _pq_code_ctes(k_cb: int = PQ_SEARCH_K, *, include_emb: bool = True) -> str:
    """q_pq_encode's codebook/assignment CTEs (registry_round6 spelling,
    same subspace geometry, a ``k_cb``-entry codebook — the search
    family's {PQ_SEARCH_K} by default, 256 for the round-12 8-bit knob)
    ending in ``codes`` = (vec_id, [code per subspace, subspace order])
    plus ``scored`` kept visible for the LUT.

    ``include_emb=False`` omits the leading ``emb`` CTE for callers whose
    WITH chain already defines an identical ``emb`` (DuckDB rejects
    duplicate CTE names at one level) — the registry_round13 trained-IVF
    oracles, which previously stripped it by exact-string replace
    (ADVICE r13: brittle coupling to this module's SQL spelling)."""
    from .registry_round6 import PQ_SUBS, _PQ_D2

    emb = "emb AS (SELECT vec_id, embedding AS v FROM embeddings),"
    return f"""
{emb if include_emb else ""}
cent AS (SELECT vec_id AS cid, embedding AS c FROM embeddings
         WHERE vec_id < {k_cb}),
scored AS (
  SELECT e.vec_id, g.s, c.cid, CAST({_PQ_D2} AS REAL) AS d2
  FROM emb e
  CROSS JOIN generate_series(0, {PQ_SUBS - 1}) AS g(s)
  CROSS JOIN cent c
),
best AS (
  SELECT vec_id, s, cid,
         row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cid) AS rn
  FROM scored
),
codes AS (
  SELECT vec_id, list(cid ORDER BY s) AS codes
  FROM best WHERE rn = 1 GROUP BY vec_id
)"""


def _pq_adc_ctes(
    n_queries: int = PQ_ADC_QUERIES, k_cb: int = PQ_SEARCH_K
) -> str:
    """codes + per-query LUT + ADC-scored pairs — the shared CTE chain
    every PQ search/eval oracle composes."""
    from .registry_round6 import PQ_SUBS

    return f"""{_pq_code_ctes(k_cb)},
lut AS (
  SELECT vec_id AS q_id, list(d2 ORDER BY s, cid) AS lut
  FROM scored WHERE vec_id < {n_queries} GROUP BY vec_id
),
adc AS (
  SELECT q.q_id, c.vec_id,
         list_reduce(list_transform(generate_series(1, {PQ_SUBS}),
           s -> CAST(q.lut[(s - 1) * {k_cb}
                           + CAST(c.codes[s] AS INT) + 1] AS DOUBLE)),
           (acc, x) -> acc + x) AS adc
  FROM lut q JOIN codes c ON c.vec_id <> q.q_id
)"""


def _pq_adc_sql(n_queries: int = PQ_ADC_QUERIES, k: int = PQ_ADC_K) -> str:
    return f"""
WITH {_pq_adc_ctes(n_queries)}
SELECT q_id, vec_id, adc, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id)
            AS rank
  FROM adc
) WHERE rank <= {k}
"""


def _sub_d2(a, b):
    """Squared L2 between two PRE-SLICED subvectors: sequential fold in
    dim order, identical to the oracle's list_reduce and to
    q_pq_encode's assignment arithmetic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _subvectors(v):
    """Split a vector column into its PQ_SUBS subvector slices ONCE
    (used for the query-side LUTs; the corpus encode is the Arrow
    kernel — the measured history of the interpreted spellings lives in
    _pq_enc's call-site comment)."""
    from .registry_round6 import PQ_SUBDIM, PQ_SUBS

    return F.transform(
        F.sequence(F.lit(0), F.lit(PQ_SUBS - 1)),
        lambda s: F.slice(v, s * PQ_SUBDIM + 1, PQ_SUBDIM),
    )


def _pq_min_d2_arrow(
    spark: SparkSession,
    emb: DataFrame,
    k_cb: int = PQ_SEARCH_K,
) -> DataFrame:
    """(vec_id, mind2: array<float>): per-subspace MINIMUM float32
    subvector d2 against the first-k_cb codebook — the VALUE twin of
    _pq_codes_arrow's argmin, for distortion metrics. Same kernel, same
    dim-order double accumulation, same float32 collapse, so each
    element is bit-identical to
    array_min(transform(cents, ct -> float32(_sub_d2(sub, ct)))) — the
    interpreted higher-order-function spelling this replaces evaluated
    n x k_cb x PQ_SUBS lambda folds outside whole-stage codegen
    (q_pq_distortion's 256-entry pass alone: 2.5 s -> 0.9 s at sf0.1)."""
    import numpy as np
    import pandas as pd

    from .registry_round6 import PQ_SUBDIM, PQ_SUBS

    cb_rows = emb.orderBy("vec_id").limit(k_cb).select("v").collect()
    cb = np.array([r.v for r in cb_rows], dtype=np.float64).reshape(
        k_cb, PQ_SUBS, PQ_SUBDIM
    )
    chunk = max(1, 8_000_000 // (k_cb * PQ_SUBS * PQ_SUBDIM))

    def min_d2(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.stack(pdf["v"].to_numpy())
            parts = []
            for i0 in range(0, len(pdf), chunk):
                vs = vm[i0 : i0 + chunk].reshape(-1, 1, PQ_SUBS, PQ_SUBDIM)
                diff = vs - cb[None]
                d2 = np.zeros(diff.shape[:3], dtype=np.float64)
                for i in range(PQ_SUBDIM):
                    d2 += diff[..., i] * diff[..., i]
                parts.append(d2.astype(np.float32).min(axis=1))
            md = np.concatenate(parts)  # (n, S) float32
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "mind2": list(md)}
            )

    return emb.select("vec_id", "v").mapInPandas(
        min_d2, "vec_id long, mind2 array<float>"
    )


def _pq_codes_arrow(
    spark: SparkSession,
    emb: DataFrame,
    k_cb: int = PQ_SEARCH_K,
    *,
    codebook=None,
) -> DataFrame:
    """(vec_id, codes): per-subspace nearest-codebook-entry assignment,
    vectorized across (rows × centroids) in one Arrow-batched numpy
    kernel (see the call-site comment in _pq_enc for the measured
    interpreted-HOF alternatives it replaces).

    ``codebook`` (a (k_cb, dims) array-like) injects a PRE-TRAINED static
    codebook so a STREAM of new vectors can be encoded against the index
    built on an earlier snapshot (round-14 incremental index
    maintenance) — deriving the codebook from the micro-batch itself
    would be wrong there. Default (None) derives it from ``emb``."""
    import numpy as np
    import pandas as pd

    from .registry_round6 import PQ_SUBDIM, PQ_SUBS

    if codebook is None:
        # Codebook = the k_cb lowest-vec_id vectors, POSITIONALLY
        # indexed: the kernel's argmin emits positions 0..k_cb-1 into
        # this sorted fetch, so nothing here assumes vec_ids are dense
        # (VERDICT r13 item 6 — the previous vec_id < k_cb filter +
        # density assert tied the LUT layout to fixture numbering; on
        # the dense fixtures both spellings select identical rows, so
        # hashes are unchanged). The TakeOrdered limit is a bounded
        # k_cb-row driver fetch feeding a broadcast LUT — not a hot-path
        # collect.
        cb_rows = emb.orderBy("vec_id").limit(k_cb).select("v").collect()
        codebook = [r.v for r in cb_rows]
    # (K, S, D) float64 — the subvector slices of the first K embeddings,
    # exactly the cent CTE's codebook.
    cb = np.array(codebook, dtype=np.float64).reshape(
        k_cb, PQ_SUBS, PQ_SUBDIM
    )

    # Row-chunk so peak kernel memory is bounded regardless of Arrow
    # batch size or codebook size: the diff tensor is chunk×K×S×D
    # doubles (~64 MB at this budget). Matters for the 256-entry
    # round-12 codebook, where a 10k-row Arrow batch would otherwise
    # materialize >1.3 GB per task (×32 concurrent tasks).
    chunk = max(1, 8_000_000 // (k_cb * PQ_SUBS * PQ_SUBDIM))

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.stack(pdf["v"].to_numpy())  # (n, 64)
            parts = []
            for i0 in range(0, len(pdf), chunk):
                vs = vm[i0 : i0 + chunk].reshape(-1, 1, PQ_SUBS, PQ_SUBDIM)
                diff = vs - cb[None]  # (chunk, K, S, D)
                # Accumulate the squared diffs in DIM ORDER: bit-identical
                # to the sequential fold / list_reduce on both engines.
                d2 = np.zeros(diff.shape[:3], dtype=np.float64)
                for i in range(PQ_SUBDIM):
                    d2 += diff[..., i] * diff[..., i]
                # float32 collapse = cast("float"); argmin over axis 1
                # (cid order) returns the FIRST minimum = the lowest-cid
                # tie-break.
                parts.append(d2.astype(np.float32).argmin(axis=1))
            codes = np.concatenate(parts)  # (n, S)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "codes": list(codes.astype(np.int64))}
            )

    return emb.select("vec_id", "v").mapInPandas(
        encode, "vec_id long, codes array<long>"
    )


def _pq_enc(
    spark: SparkSession,
    sf_dir: str,
    k_cb: int = PQ_SEARCH_K,
    n_queries: int = PQ_ADC_QUERIES,
):
    """(codes_df, queries_df): the encoded corpus (Arrow numpy kernel)
    and the per-query ADC lookup tables (in-row folds over ONE broadcast
    codebook row whose entries are PRE-SLICED into subvectors — see
    _subvectors)."""
    from .registry_round6 import PQ_SUBS

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = emb.where(F.col("vec_id") < k_cb).select(
        F.col("vec_id").alias("cid"),
        _subvectors(F.col("v")).alias("csub"),
    )
    # array_sort on (cid, csub) structs = cid order (cid is unique), so
    # LUT position s*K + cid is positional by construction.
    cents = cent.agg(
        F.array_sort(F.collect_list(F.struct("cid", "csub"))).alias("cents")
    )
    enc = emb.crossJoin(F.broadcast(cents))
    # Corpus encode: Arrow-batched numpy kernel (mapInPandas). The
    # interpreted higher-order-fold spellings were measured at sf1.0
    # (min-of-3 noop writes): slice-inside-d2 5.15 s, element_at index
    # fold 6.55 s, a named subvector projection 16.9 s (CollapseProject
    # inlines it into every reference), lambda-bound pre-sliced
    # subvectors 4.16 s — the encode scan dominates the whole ADC query
    # in every variant because 16 centroids × 8 subspaces of ArrayAggregate
    # steps per row evaluate interpreted (HOFs are CodegenFallback).
    # The numpy kernel vectorizes across (rows × centroids) and keeps
    # the EXACT arithmetic: the dim loop accumulates in index order
    # (bit-identical to the sequential fold), d2 collapses to float32
    # exactly like cast("float"), and np.argmin's first-minimum equals
    # the (d2, cid) struct-min tie-break because the codebook is scanned
    # in cid order. Codebook shipping is a K-row bounded collect — the
    # same index-build constant every PQ system stores offline.
    #
    # The encoded corpus is memoized per (session, sf_dir, K) behind a
    # lineage cut: a PQ INDEX is built once and served to every search —
    # q_ann_pq_recall alone composes three searches that would otherwise
    # re-collect the codebook and re-encode the corpus 3x (ADVICE r11).
    # bench/probe protocols memo_clear() around timed passes, so cold
    # numbers stay honest.
    from .extensions.dedup import memo_materialize

    codes_df = memo_materialize(
        spark,
        f"pq_codes:{sf_dir}:k{k_cb}",
        lambda: _pq_codes_arrow(spark, emb, k_cb),
    )
    # LUT: float32 d2 from the query subvector to EVERY codebook entry,
    # flattened in (subspace, cid) order — S×K floats per query.
    lut_arr = F.flatten(
        F.transform(
            _subvectors(F.col("v")),
            lambda sub, s: F.transform(
                F.col("cents"),
                lambda ct: _sub_d2(
                    sub, F.element_at(ct["csub"], s + 1)
                ).cast("float"),
            ),
        )
    )
    q_df = (
        enc.where(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("q_id"), lut_arr.alias("lut"))
    )
    return codes_df, q_df


def _adc_expr(k_cb: int = PQ_SEARCH_K):
    """ADC score column: S table lookups + adds per candidate, folded
    sequentially in subspace order (each addend is a float32-exact
    double, so the sum is bit-identical to the oracle's list_reduce).
    Expects ``lut`` (flattened (subspace, cid)-ordered d2s) and ``codes``
    columns in scope."""
    from .registry_round6 import PQ_SUBS

    return F.aggregate(
        F.sequence(F.lit(0), F.lit(PQ_SUBS - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.col("lut"),
            (s * k_cb + F.element_at(F.col("codes"), s + 1).cast("int"))
            + 1,
        ).cast("double"),
    )


def _pq_adc_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = PQ_ADC_K,
    k_cb: int = PQ_SEARCH_K,
) -> DataFrame:
    from pyspark.sql import Window

    codes_df, q_df = _pq_enc(spark, sf_dir, k_cb)
    pairs = codes_df.join(
        F.broadcast(q_df), F.col("vec_id") != F.col("q_id")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adc"), F.col("vec_id"))
    return (
        pairs.select("q_id", "vec_id", _adc_expr(k_cb).alias("adc"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "adc", "rank")
    )


@register("q_ann_pq_adc_topk", _pq_adc_sql(), "vector", "pq", "topk")
def q_ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-k: encode the corpus with q_pq_encode's
    subspace geometry and a 4-bit codebook (32-bit codes), precompute
    each query's subspace×codebook distance table ONCE, then rank
    candidates by the sum of S table lookups — never touching raw
    candidate vectors at query time.

    This is the search half of IVF-PQ (the memory-bound regime of
    billion-scale ANN): the scanned index is PQ_SUBS×4 bits per vector
    instead of 64 float32s, a 64× read-volume cut, at the recall cost
    q_ann_pq_recall measures.

    Scale: codebook folds into one broadcast row (K×S subvector slices,
    kilobytes); encoding and LUT construction are single scans with
    in-row array math; scoring streams the code table past the broadcast
    query LUTs (tiny side) — no shuffle until the per-query top-k window,
    whose input is bounded by candidates × n_queries.

    Oracle-exact: per-(subspace, centroid) d2 is the sequential fold
    float32-canonicalized exactly as q_pq_encode; the ADC sum adds those
    float32-exact doubles in subspace order on both engines.
    """
    return _pq_adc_topk(spark, sf_dir)


def _d2_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, len({a})),"
        f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (x, y) -> x + y)"
    )


def _pq_rerank_sql(
    n_queries: int = PQ_ADC_QUERIES,
    r: int | str = PQ_RERANK_R,
    k: int = PQ_ADC_K,
    k_cb: int = PQ_SEARCH_K,
) -> str:
    # ``r`` may be a SQL expression string (the round-12 R-proportional-
    # to-corpus knob passes a scalar subquery over the corpus count).
    return f"""
WITH {_pq_adc_ctes(n_queries, k_cb)},
shortlist AS (
  SELECT q_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id)
              AS rank
    FROM adc
  ) WHERE rank <= {r}
),
nd AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       FROM embeddings),
qs AS (SELECT vec_id AS q_id, v AS qv FROM nd WHERE vec_id < {n_queries}),
rr AS (
  SELECT s.q_id, s.vec_id, {_d2_sql('q.qv', 'e.v')} AS d2
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


@register("q_ann_pq_rerank", _pq_rerank_sql(), "vector", "pq", "topk")
def q_ann_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage PQ retrieval — the production deployment shape: ADC
    scores the WHOLE corpus from 16-bit codes (cheap, memory-bound),
    keeps a shortlist of {PQ_RERANK_R} per query, and only those rows
    pay an exact squared-L2 re-rank against raw vectors. Raw-vector
    reads drop from corpus-sized to R×n_queries — the reason PQ systems
    can keep raw vectors on slow storage.

    Scale: stage 1 is q_ann_pq_adc_topk's plan (broadcast LUTs over the
    code scan); stage 2 joins the (R × n_queries)-row shortlist back to
    the corpus on vec_id — a semi-join-sized probe, broadcastable at any
    corpus size.

    Oracle-exact: ADC floats as in q_ann_pq_adc_topk; the re-rank d2 is
    the full-vector sequential fold in double (identical addition order
    both engines); ties break on vec_id."""
    from pyspark.sql import Window

    shortlist = _pq_adc_topk(spark, sf_dir, k=PQ_RERANK_R).select(
        "q_id", "vec_id"
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.where(F.col("vec_id") < PQ_ADC_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    cand = shortlist.join(emb, "vec_id").join(F.broadcast(q), "q_id")
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("q_id").orderBy(F.col("d2"), F.col("vec_id"))
    return (
        cand.select("q_id", "vec_id", d2.alias("d2"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= PQ_ADC_K)
        .select("q_id", "vec_id", "d2", "rank")
    )


def _ivfpq_sql(
    n_queries: int = PQ_ADC_QUERIES,
    r: int = PQ_RERANK_R,
    k: int = PQ_ADC_K,
) -> str:
    from .registry_round6 import PQ_SUBS

    cents = ", ".join(
        "({}, [{}])".format(
            c, ", ".join(repr(S.centroid_component(c, d)) for d in range(64))
        )
        for c in range(S.N_CELLS)
    )
    return f"""
WITH {_pq_code_ctes()},
lut AS (
  SELECT vec_id AS q_id, list(d2 ORDER BY s, cid) AS lut
  FROM scored WHERE vec_id < {n_queries} GROUP BY vec_id
),
ivf_cents AS (SELECT * FROM (VALUES {cents}) AS c(cell, cv)),
nd AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       FROM embeddings),
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
  WHERE vec_id < {n_queries} AND cell_rank <= {S.N_PROBE}
),
adc AS (
  SELECT p.q_id, ca.vec_id,
         list_reduce(list_transform(generate_series(1, {PQ_SUBS}),
           s -> CAST(q.lut[(s - 1) * {PQ_SEARCH_K}
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
  SELECT s.q_id, s.vec_id, {_d2_sql('q.qv', 'e.v')} AS d2
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


def _pq_recall_sql() -> str:
    adc_topk = _pq_adc_sql()
    rerank = _pq_rerank_sql()
    ivfpq = _ivfpq_sql()
    return f"""
WITH adc_hits AS ({adc_topk}),
rr_hits AS ({rerank}),
ivfpq_hits AS ({ivfpq}),
nd AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       FROM embeddings),
qv AS (SELECT vec_id AS q_id, v AS qv FROM nd WHERE vec_id < {PQ_ADC_QUERIES}),
truth AS (
  SELECT q_id, vec_id FROM (
    SELECT q.q_id, e.vec_id,
           row_number() OVER (PARTITION BY q.q_id
                              ORDER BY {_d2_sql('q.qv', 'e.v')}, e.vec_id)
             AS rank
    FROM qv q JOIN nd e ON e.vec_id <> q.q_id
  ) WHERE rank <= {PQ_ADC_K}
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
hits AS (
  SELECT 'pq_adc' AS method, CAST(count(*) AS BIGINT) AS n_hit
  FROM truth t JOIN adc_hits a ON t.q_id = a.q_id AND t.vec_id = a.vec_id
  UNION ALL
  SELECT 'pq_rerank' AS method, CAST(count(*) AS BIGINT) AS n_hit
  FROM truth t JOIN rr_hits a ON t.q_id = a.q_id AND t.vec_id = a.vec_id
  UNION ALL
  SELECT 'ivfpq' AS method, CAST(count(*) AS BIGINT) AS n_hit
  FROM truth t JOIN ivfpq_hits a ON t.q_id = a.q_id AND t.vec_id = a.vec_id
)
SELECT method, tot.n_truth, n_hit,
       CAST(CAST(n_hit AS DOUBLE) / greatest(tot.n_truth, 1) AS REAL)
         AS recall_at_k
FROM hits CROSS JOIN tot
"""


@register("q_ann_pq_recall", _pq_recall_sql(), "llm", "ann", "eval", "pq")
def q_ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the PQ searches against the exact squared-L2 ground
    truth over raw vectors — the compression trade study: what accuracy
    do 32-bit codes give up vs 256-byte vectors at the same k, how much
    of it does the exact re-rank stage buy back, and what does adding
    the IVF cell-probe front (ivfpq) cost on top for its
    ~n_probe/n_cells candidate-volume cut? (ADC approximates L2, so L2
    — not cosine — is the honest yardstick.) Composes the REGISTERED
    queries, like q_ann_recall_trained.

    Scale: ground truth is the query-set-bounded brute-force scan (the
    accuracy yardstick, same role as q_ann_cosine_topk for IVF); the
    eval joins (n_queries × k)-row lists."""
    from pyspark.sql import Window

    from .registry import REGISTRY

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.where(F.col("vec_id") < PQ_ADC_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("qv"), F.col("v"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("q_id").orderBy(d2, F.col("vec_id"))
    truth = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= PQ_ADC_K)
        .select("q_id", "vec_id")
    )
    tot = truth.agg(F.count("*").cast("long").alias("n_truth"))
    parts = []
    for method, qname in (
        ("pq_adc", "q_ann_pq_adc_topk"),
        ("pq_rerank", "q_ann_pq_rerank"),
        ("ivfpq", "q_ann_ivfpq_topk"),
    ):
        approx = (
            REGISTRY[qname].fn(spark, sf_dir).select("q_id", "vec_id")
        )
        parts.append(
            truth.join(approx, ["q_id", "vec_id"])
            .agg(F.count("*").cast("long").alias("n_hit"))
            .select(F.lit(method).alias("method"), "n_hit")
        )
    hits = parts[0].unionAll(parts[1]).unionAll(parts[2])
    return hits.crossJoin(F.broadcast(tot)).select(
        "method",
        "n_truth",
        "n_hit",
        (F.col("n_hit").cast("double") / F.greatest(F.col("n_truth"), F.lit(1)))
        .cast("float")
        .alias("recall_at_k"),
    )


# ---------------------------------------------------------------------------
# Pointer-doubling connected components on the real near-dup pair data
# ---------------------------------------------------------------------------


def _components_shortcut_sql() -> str:
    from .registry import REGISTRY

    return REGISTRY["q_dedup_components"].sql


@register(
    "q_dedup_components_shortcut",
    _components_shortcut_sql(),
    "dedup",
    "iterative",
)
def q_dedup_components_shortcut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dup_components with pointer doubling (lbl(u) ← lbl(lbl(u)), the
    star-contraction shortcut): O(log diameter) propagation rounds
    instead of O(diameter) — the mode a chain-of-similarity graph needs
    at 100 TB, where a 30-hop chain costs ~6 rounds instead of 30+.
    Previously exercised only by a synthetic deep-chain unit fixture
    (tests/test_edge_cases.py); this row hash-verifies it against the
    SAME recursive-CTE oracle as q_dedup_components on the real jaccard
    pair set, pinning that both modes reach the identical fixed point.

    Scale: each round adds one node-sized self-join to the bounded
    per-round shuffle; the memoized pair table is shared with the
    q_dedup_components family (pair generation runs once per session)."""
    from .extensions import dedup as D
    from .registry_ext import _corpus, _jaccard_pairs_cut

    return D.dup_components(
        _jaccard_pairs_cut(spark, sf_dir),
        _corpus(spark, sf_dir).select("doc_id"),
        shortcut=True,
    )


# ---------------------------------------------------------------------------
# IVF-PQ end-to-end: coarse cells prune, PQ codes score, raw vectors re-rank
# ---------------------------------------------------------------------------


@register("q_ann_ivfpq_topk", _ivfpq_sql(), "vector", "ivf", "pq", "topk")
def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ end-to-end — the canonical billion-scale ANN pipeline
    (Jégou et al.; FAISS IVFPQ): the coarse quantizer prunes the corpus
    to the query's probed cells (~n_probe/n_cells of it), PQ-ADC scores
    those candidates from 32-bit codes alone (S lookups each), and only
    the top-R shortlist pays an exact squared-L2 re-rank against raw
    vectors. Composes the registry's own stages: q_ann_ivf_topk's cell
    assignment/probes, q_ann_pq_adc_topk's codes+LUT, q_ann_pq_rerank's
    exact stage.

    Scale: the three read volumes are corpus-scan (assign+encode, once
    per index build), codes-of-probed-cells per query (bits), and
    R×n_queries raw rows (re-rank) — each stage touches strictly less
    data than the previous. All joins are equi (cell, vec_id, q_id)
    with the LUT/centroid sides broadcast; no shuffle grows with the
    corpus except the bounded per-query top-k windows.

    Oracle-exact: cell ranking is the sequential-fold dot with
    (DESC, cell) tie-break; ADC floats as in q_ann_pq_adc_topk; re-rank
    d2 the full-vector double fold; all ties break on vec_id."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    scored = emb.withColumn("scores", S._cell_scores("v", 64))
    best_cell = (
        F.array_position(F.col("scores"), F.array_max(F.col("scores"))) - 1
    ).cast("int")
    assignment = scored.select("vec_id", best_cell.alias("cell"))
    probes = (
        scored.where(F.col("vec_id") < PQ_ADC_QUERIES)
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
    codes_df, q_df = _pq_enc(spark, sf_dir)
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
        cand.select("q_id", "vec_id", _adc_expr().alias("adc"))
        .withColumn("srank", F.row_number().over(w_adc))
        .where(F.col("srank") <= PQ_RERANK_R)
        .select("q_id", "vec_id")
    )
    q = emb.where(F.col("vec_id") < PQ_ADC_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("q_id").orderBy(F.col("d2"), F.col("vec_id"))
    return (
        shortlist.join(emb, "vec_id")
        .join(F.broadcast(q), "q_id")
        .select("q_id", "vec_id", d2.alias("d2"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= PQ_ADC_K)
        .select("q_id", "vec_id", "d2", "rank")
    )
