"""Round-3 breadth: graph triangle counting, Count-Min frequency
sketch, Wilder RSI, Bollinger bands, vocabulary coverage, and weighted
sampling — the remaining operators a reference user (or a training-data
pipeline on top of it) reaches for that no earlier registry covers.

Registry conventions as everywhere: each query is a (Spark builder,
DuckDB oracle) pair registered via ``@register(name, sql, *tags)``;
float outputs are float32-canonicalized (r6/r6z), membership / ordering
decisions are made on integer-exact or float32-canonicalized values on
BOTH engines, and every hash is md5-derived (functions.hashing) so the
oracle computes bit-identical values.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.hashing import affine_family, md5_int32, md5_int32_sql
from .operators.bars import gold_bars_cut
from .registry import BARS_CTE, r6, register
from .sources.tables import events_as_trades, load_table

# ---------------------------------------------------------------------------
# Triangle counting (degree-ordered wedge enumeration)
# ---------------------------------------------------------------------------

_TRI_EDGES_SQL = """
edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a
  JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT node, count(*) AS d FROM (
    SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
  ) GROUP BY node
)
"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected part co-purchase edges (u < v) from lineitem:
    two parts are adjacent iff some order contains both.

    Built as ONE groupBy(order) + JVM-side ordered-pair generation over
    the per-order part array, then a distinct — instead of the textbook
    self-join on l_orderkey, which shuffles the fact table TWICE and
    materializes the same pairs through a join. Measured 1.75× faster at
    sf0.1 (2.4 s → 1.4 s); per-key state is the order's part set, bounded
    by order size — safe at any corpus scale (pair count per order is
    C(k,2), inherent to the edge definition, not the plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    parts = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    raw = parts.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) ->"
                " transform(slice(ps, i + 2, size(ps)),"
                " y -> struct(x AS u, y AS v))))"
            )
        ).alias("p")
    ).select("p.u", "p.v")
    # Dedup INSIDE the layout shuffle: hash-partitioning on u alone
    # clusters every (u, v) instance together, so dropDuplicates after
    # repartition(u) runs exchange-free and its output already carries
    # the (u)-layout the memo wants (pre_partitioned=True below) — one
    # exchange instead of distinct-then-repartition's two.
    return raw.repartition(
        int(spark.conf.get("spark.sql.shuffle.partitions")), "u"
    ).dropDuplicates(["u", "v"])


def copurchase_edges_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineage-cut co-purchase edge table, materialized once per
    (session, sf_dir) and shared by every graph query (triangle count,
    BFS, label propagation, assortativity) — see
    extensions.dedup.memo_materialize."""
    from .extensions.dedup import memo_materialize
    from .session import wide_build_scope

    # The pair-explode reduce stage does C(k,2) row work per input byte;
    # keep it at full width for the one eager build (see wide_build_scope).
    with wide_build_scope(spark):
        return memo_materialize(
            spark,
            f"copurchase_edges:{sf_dir}",
            lambda: _copurchase_edges(spark, sf_dir),
            partition_by=("u",),
            pre_partitioned=True,
        )


def copurchase_deg_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineage-cut degree table (node, d) of the co-purchase graph,
    memoized alongside the edges (triangle count + assortativity both
    need it)."""
    from .extensions.dedup import memo_materialize

    edges = copurchase_edges_cut(spark, sf_dir)
    return memo_materialize(
        spark,
        f"copurchase_deg:{sf_dir}",
        lambda: edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d")),
    )


def copurchase_undirected_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineage-cut both-orientations edge list (src, dst), memoized —
    the frontier-expansion input for BFS, Adamic-Adar and assortativity.

    Partitioned+sorted on src (the Pregel/GraphX edge-layout pattern,
    guide §2.4): every consumer equi-joins this table on src — BFS once
    per hop, Adamic-Adar twice, assortativity once — so the captured
    layout removes an EDGE-sized exchange+sort from each of those joins.
    Round 5 had measured the layout a net loss when the memo was rebuilt
    per run (cold BFS 2.4 s → 4.3 s); under the round-12+ warm-memo
    protocol (build once per session, serve every consumer — the
    production shape) the ledger flips: BFS 2.9 s → 1.4 s warm at
    sf0.1/local[32] (r14 opt round, identical output), and the one-time
    build cost is the same single repartition+sort any index-like table
    pays. Width = iter_parts so the BFS loop (which runs under
    iter_shuffle_scope at exactly that width) co-partitions with zero
    exchange on either side."""
    from .extensions.dedup import memo_materialize
    from .session import iter_parts

    edges = copurchase_edges_cut(spark, sf_dir)
    return memo_materialize(
        spark,
        f"copurchase_undirected:{sf_dir}",
        lambda: edges.select(
            F.col("u").alias("src"), F.col("v").alias("dst")
        ).unionAll(edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))),
        partition_by=("src",),
        nparts=iter_parts(spark),
    )


@register(
    "q_triangle_count",
    "WITH "
    + _TRI_EDGES_SQL
    + """
, tri AS (
  SELECT count(*) AS n_tri
  FROM edges e1
  JOIN edges e2 ON e2.u = e1.v
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
       CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
       CAST((SELECT sum(d * (d - 1) / 2) FROM deg) AS BIGINT) AS n_wedges,
       CAST(n_tri AS BIGINT) AS n_triangles,
       CAST(CASE WHEN (SELECT sum(d * (d - 1) / 2) FROM deg) > 0
            THEN 3.0 * n_tri / (SELECT sum(d * (d - 1) / 2) FROM deg)
            END AS REAL) AS transitivity
FROM tri
""",
    "graph",
    "agg",
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count + global transitivity of the part
    co-purchase graph (parts are adjacent iff some order contains both).

    The Spark plan is degree-ordered edge-iterator counting: every edge
    is oriented from its lower-(degree, id) endpoint to the higher, and
    each directed edge (u, v) counts |N⁺(u) ∩ N⁺(v)| via a sorted-array
    intersection — each triangle is counted exactly once (the directed
    u→v→w path pivots on edge u→v). Out-degree is bounded by sqrt(2m)
    under the orientation, so total intersection work is O(m^1.5) and no
    per-key output exceeds 2·sqrt(2m) elements: the standard remedy for
    power-law degree skew at 100 TB (wedge ENUMERATION has the same
    total bound but funnels up to m materialized wedge rows through a
    single hub key). The oracle reaches the identical count from the
    simpler id-ordered u<v<w 3-way self-join, which is fine at oracle
    scale but hub-quadratic. Everything is integer-exact except the
    final transitivity ratio.
    """
    # The co-purchase self-join is the expensive input and it feeds SIX
    # consumers (deg twice, orientation, two summary aggs) — Spark
    # re-executes shared subplans per consumer, so materialize it once
    # behind a lineage cut (13.7 s → ~3 s at sf0.1), memoized across the
    # graph-query family. Same for deg (3 consumers) and the oriented
    # edge list (3 consumers).
    from .extensions.dedup import _cut_lineage

    edges = copurchase_edges_cut(spark, sf_dir)
    deg = copurchase_deg_cut(spark, sf_dir)
    # Orient each edge from the lower (degree, id) endpoint to the higher.
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    # The degree table is node-sized (two longs/row) while the edge side
    # is m-sized: broadcast it into both orientation joins when it fits
    # (size-dispatched on the memoized node count, the exact rule and
    # threshold of q_label_prop_communities' layout dispatch) instead of
    # letting the stats-less LogicalRDD default to two edge-sized
    # sort-merge joins. The checkpointed memo has no catalog statistics,
    # so auto-broadcast never fires on its own. Measured min-of-3 at
    # sf0.1/local[32]: 1.44 s → 1.23 s, output identical; past the node
    # cap the plan falls back to the join the planner picks (SMJ).
    from .extensions.dedup import memo_scalar

    max_nodes = int(
        os.environ.get("SPARK_GRAFT_LPA_BROADCAST_MAX_NODES", 10**7)
    )
    n_nodes_stat = memo_scalar(
        spark,
        f"copurchase_n_nodes:{sf_dir}",
        lambda: copurchase_deg_cut(spark, sf_dir).count(),
    )
    if n_nodes_stat <= max_nodes:
        du, dv = F.broadcast(du), F.broadcast(dv)
    withdeg = edges.join(du, "u").join(dv, "v")
    uk = F.struct(F.col("du"), F.col("u"))
    vk = F.struct(F.col("dv"), F.col("v"))
    directed = withdeg.select(
        F.when(uk < vk, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(uk < vk, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    # Partitioned+sorted on src: the adjacency groupBy(src) then runs
    # exchange-free, adj inherits the src layout, and the first
    # wedge-join (directed.src = adj.src) is co-partitioned — the only
    # remaining exchange in the counting phase is the dst-side join.
    directed = _cut_lineage(directed, partition_by=("src",))
    # Edge-iterator triangle counting: per directed edge (u, v), count
    # |N⁺(u) ∩ N⁺(v)| — every triangle has exactly one such "pivot" edge
    # under the acyclic degree orientation, so the sum IS the triangle
    # count. Total intersection work is Σ_(u,v)∈E (d⁺u + d⁺v) = O(m^1.5)
    # like wedge enumeration, but it never MATERIALIZES the wedge stream:
    # the hot-apex skew (one √(2m)-outdeg hub → up to m wedge rows from a
    # single key) becomes a per-row array intersection bounded by
    # 2·√(2m) elements instead. Adjacency rows are bounded by √(2m)
    # longs under the orientation — executor-memory-safe at any m.
    adj = directed.groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("nbrs")
    )
    au = adj.select(F.col("src").alias("a_u"), F.col("nbrs").alias("nu"))
    av = adj.select(F.col("src").alias("a_v"), F.col("nbrs").alias("nv"))
    tri = (
        directed.join(au, directed["src"] == au["a_u"])
        .join(av, directed["dst"] == av["a_v"])
        .select(F.size(F.array_intersect("nu", "nv")).alias("c"))
        # coalesce: on a triangle-free graph the joins yield zero rows and
        # sum() is NULL, while the oracle's count(*) is 0.
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_triangles"))
    )
    # One pass over the memoized degree table yields both node count and
    # wedge count (one fewer scalar-agg job + cross join than computing
    # them separately).
    deg_stats = deg.agg(
        F.count("*").alias("n_nodes"),
        F.sum((F.col("d") * (F.col("d") - 1) / 2).cast("long")).alias("n_wedges"),
    )
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    out = deg_stats.crossJoin(n_edges).crossJoin(tri)
    return out.select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        r6(
            F.when(
                F.col("n_wedges") > 0,
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"),
            ),
            "transitivity",
        ),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (mergeable frequency estimation)
# ---------------------------------------------------------------------------

CMS_DEPTH = 4  # hash rows
CMS_WIDTH = 512  # buckets per row
CMS_PROBES = 20  # most-frequent tokens probed against the sketch
_CMS_FAM = affine_family(CMS_DEPTH)
_CMS_P = 2_147_483_647

_CMS_FAM_SQL = "fam(j, a, b) AS (VALUES " + ", ".join(
    f"({j}, {a}, {b})" for j, (a, b) in enumerate(_CMS_FAM)
) + ")"


@register(
    "q_countmin_freq",
    f"""
WITH tok AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t
  FROM documents
),
th AS (
  SELECT t, {md5_int32_sql('t')} AS h FROM tok WHERE t <> ''
),
{_CMS_FAM_SQL},
counters AS (
  SELECT j, (a * h + b) % {_CMS_P} % {CMS_WIDTH} AS bkt, count(*) AS c
  FROM th CROSS JOIN fam GROUP BY j, bkt
),
exact AS (
  SELECT t, any_value(h) AS h, count(*) AS cnt FROM th GROUP BY t
  ORDER BY cnt DESC, t LIMIT {CMS_PROBES}
),
probe AS (
  SELECT t, cnt, j, (a * h + b) % {_CMS_P} % {CMS_WIDTH} AS bkt
  FROM exact CROSS JOIN fam
)
SELECT p.t AS token,
       CAST(p.cnt AS BIGINT) AS exact_cnt,
       CAST(min(c.c) AS BIGINT) AS cms_est,
       CAST(min(c.c) - p.cnt AS BIGINT) AS overestimate
FROM probe p JOIN counters c ON p.j = c.j AND p.bkt = c.bkt
GROUP BY p.t, p.cnt
""",
    "sketch",
    "text",
)
def q_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over the corpus token stream: {CMS_DEPTH}×{CMS_WIDTH}
    counter matrix built in ONE hash-aggregate, probed with the corpus's
    20 most frequent tokens; est = min over rows of the hit counters, so
    overestimate >= 0 always (one-sided error — integer-exact oracle).

    All {CMS_DEPTH} row-hashes derive from ONE md5 per token via the
    affine family (same trick as MinHash), kept JVM-side. The counter
    table is the whole sketch state: {CMS_DEPTH}*{CMS_WIDTH} cells
    regardless of corpus size, built by a single count shuffle on
    (row, bucket) with map-side partial aggregation — and because
    counters are sums, per-partition / per-day sketches merge by cell-
    wise addition, the same mergeability contract as the HLL surface
    (registry_round2). At 100 TB this is the canonical heavy-hitter
    pre-pass: the sketch costs O(1) memory while an exact top-k
    needs the full token dictionary.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("t")
    ).where(F.col("t") != "")
    th = tok.select("t", md5_int32(F.col("t")).alias("h"))
    bucket_cols = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                ((F.lit(a) * F.col("h") + F.lit(b)) % _CMS_P % CMS_WIDTH).alias(
                    "bkt"
                ),
            )
            for j, (a, b) in enumerate(_CMS_FAM)
        ]
    )
    counters = (
        th.select(F.explode(bucket_cols).alias("jb"))
        .groupBy(F.col("jb.j").alias("j"), F.col("jb.bkt").alias("bkt"))
        .agg(F.count("*").alias("c"))
    )
    exact = (
        th.groupBy("t")
        .agg(F.any_value("h").alias("h"), F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "t")
        .limit(CMS_PROBES)
    )
    probe = exact.select(
        "t", "cnt", F.explode(bucket_cols).alias("jb")
    ).select("t", "cnt", F.col("jb.j").alias("j"), F.col("jb.bkt").alias("bkt"))
    return (
        probe.join(F.broadcast(counters), ["j", "bkt"])
        .groupBy(F.col("t").alias("token"), F.col("cnt"))
        .agg(F.min("c").alias("cms_est"))
        .select(
            "token",
            F.col("cnt").alias("exact_cnt"),
            "cms_est",
            (F.col("cms_est") - F.col("cnt")).alias("overestimate"),
        )
    )


# ---------------------------------------------------------------------------
# RSI (Wilder's smoothing as a sequential fold)
# ---------------------------------------------------------------------------

RSI_N = 14


@register(
    "q_rsi_wilder",
    BARS_CTE
    + f"""
, d AS (
  SELECT symbol, bar_start,
         "close" - lag("close") OVER (PARTITION BY symbol ORDER BY bar_start)
           AS delta
  FROM bars
), gl AS (
  SELECT symbol,
         count(*) AS n_deltas,
         list(greatest(delta, 0) ORDER BY bar_start) AS gains,
         list(greatest(-delta, 0) ORDER BY bar_start) AS losses
  FROM d WHERE delta IS NOT NULL GROUP BY symbol
), sm AS (
  SELECT symbol, n_deltas,
         list_reduce(gains,  (acc, x) -> (acc * {RSI_N - 1} + x) / {RSI_N})
           AS avg_gain,
         list_reduce(losses, (acc, x) -> (acc * {RSI_N - 1} + x) / {RSI_N})
           AS avg_loss
  FROM gl
)
SELECT symbol, CAST(n_deltas AS BIGINT) AS n_deltas,
       CAST(avg_gain AS REAL) AS avg_gain,
       CAST(avg_loss AS REAL) AS avg_loss,
       CAST(CASE WHEN avg_loss > 0
            THEN 100 - 100 / (1 + avg_gain / avg_loss)
            ELSE 100 END AS REAL) AS rsi
FROM sm
""",
    "quant",
    "ewma",
)
def q_rsi_wilder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol RSI({RSI_N}) with Wilder's recursive smoothing
    avg' = (avg*{RSI_N - 1} + x)/{RSI_N}, seeded with the first delta
    (the textbook {RSI_N}-SMA warmup differs only in a geometrically
    decaying prefix). Gains and losses fold separately as sequential
    aggregate() folds over the ordered delta list — bit-identical to
    DuckDB's list_reduce because f(NULL, x) = x matches its first-
    element seeding — so only the final REAL casts canonicalize.
    Plan: one lag window + one collect aggregate, both on symbol —
    a single shuffle; per-key state is bars-per-symbol (time-bounded,
    not corpus-bounded)."""
    bars = gold_bars_cut(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("bar_start")
    d = bars.select(
        "symbol",
        "bar_start",
        (F.col("close") - F.lag("close").over(w)).alias("delta"),
    ).where(F.col("delta").isNotNull())
    arr = F.array_sort(F.collect_list(F.struct("bar_start", "delta")))
    gains = F.transform(arr, lambda s: F.greatest(s.getField("delta"), F.lit(0.0)))
    losses = F.transform(
        arr, lambda s: F.greatest(-s.getField("delta"), F.lit(0.0))
    )

    def _wilder(xs):
        return F.aggregate(
            xs,
            F.lit(None).cast("double"),
            lambda acc, x: F.when(acc.isNull(), x).otherwise(
                (acc * (RSI_N - 1) + x) / RSI_N
            ),
        )

    gl = d.groupBy("symbol").agg(
        F.count("*").alias("n_deltas"),
        _wilder(gains).alias("avg_gain"),
        _wilder(losses).alias("avg_loss"),
    )
    return gl.select(
        "symbol",
        "n_deltas",
        r6("avg_gain", "avg_gain"),
        r6("avg_loss", "avg_loss"),
        r6(
            F.when(
                F.col("avg_loss") > 0,
                100 - 100 / (1 + F.col("avg_gain") / F.col("avg_loss")),
            ).otherwise(F.lit(100.0)),
            "rsi",
        ),
    )


# ---------------------------------------------------------------------------
# Bollinger bands
# ---------------------------------------------------------------------------

BOLL_N = 20  # bars per band window
BOLL_K = 2.0  # band half-width in stddevs
_EPS = 1e-9


@register(
    "q_bollinger_bands",
    BARS_CTE
    + f"""
, b AS (
  SELECT symbol, bar_start, "close",
         count(*) OVER w AS n_win,
         avg("close") OVER w AS sma,
         stddev_samp("close") OVER w AS sd
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY bar_start
               ROWS BETWEEN {BOLL_N - 1} PRECEDING AND CURRENT ROW)
)
SELECT symbol, bar_start,
       CAST(n_win AS BIGINT) AS n_win,
       CAST("close" AS REAL) AS close,
       CAST(sma AS REAL) AS sma,
       CAST(sd AS REAL) AS sd,
       CAST(sma + {BOLL_K} * sd AS REAL) AS upper_band,
       CAST(sma - {BOLL_K} * sd AS REAL) AS lower_band,
       CAST(CASE WHEN sd IS NOT NULL AND sd > {_EPS}
            THEN ("close" - (sma - {BOLL_K} * sd)) / (2 * {BOLL_K} * sd)
            END AS REAL) AS pct_b
FROM b
""",
    "quant",
    "window",
)
def q_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands per bar: {BOLL_N}-bar rolling SMA ± {BOLL_K}σ and
    %B = (close − lower) / (upper − lower), guarded NULL when σ is
    missing (1-bar frame) or ≤ 1e-9 (flat window) — the same sd guard as
    the z-score stack, with Spark's NaN-for-n=1 stddev_samp normalized
    to NULL to match ANSI. One ROWS-frame window over the (symbol)
    partitioning — a single shuffle, state bounded by {BOLL_N} rows per
    key at any scale."""
    bars = gold_bars_cut(spark, sf_dir)
    w = (
        Window.partitionBy("symbol")
        .orderBy("bar_start")
        .rowsBetween(-(BOLL_N - 1), 0)
    )
    sd_raw = F.stddev_samp("close").over(w)
    b = bars.select(
        "symbol",
        "bar_start",
        "close",
        F.count("*").over(w).alias("n_win"),
        F.avg("close").over(w).alias("sma"),
        F.when(~F.isnan(sd_raw), sd_raw).alias("sd"),
    )
    guarded = F.col("sd").isNotNull() & (F.col("sd") > _EPS)
    return b.select(
        "symbol",
        "bar_start",
        "n_win",
        r6("close", "close"),
        r6("sma", "sma"),
        r6("sd", "sd"),
        r6(F.col("sma") + BOLL_K * F.col("sd"), "upper_band"),
        r6(F.col("sma") - BOLL_K * F.col("sd"), "lower_band"),
        r6(
            F.when(
                guarded,
                (F.col("close") - (F.col("sma") - BOLL_K * F.col("sd")))
                / (2 * BOLL_K * F.col("sd")),
            ),
            "pct_b",
        ),
    )


# ---------------------------------------------------------------------------
# Vocabulary construction + coverage
# ---------------------------------------------------------------------------

VOCAB_TOP = 30


@register(
    "q_vocab_coverage",
    f"""
WITH tok AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t
  FROM documents
),
cnts AS (SELECT t, count(*) AS cnt FROM tok WHERE t <> '' GROUP BY t),
tot AS (SELECT sum(cnt) AS n FROM cnts),
top AS (SELECT t, cnt FROM cnts ORDER BY cnt DESC, t LIMIT {VOCAB_TOP})
SELECT CAST(row_number() OVER w AS BIGINT) AS rnk,
       t AS token,
       CAST(cnt AS BIGINT) AS cnt,
       CAST(sum(cnt) OVER w * 1.0 / (SELECT n FROM tot) AS REAL) AS cum_share
FROM top
WINDOW w AS (ORDER BY cnt DESC, t ROWS UNBOUNDED PRECEDING)
""",
    "text",
    "vocab",
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary construction: the {VOCAB_TOP} most frequent corpus
    tokens with their cumulative coverage share — the curve that decides
    a tokenizer's vocab size / UNK rate. Plan: explode → one count
    shuffle on token → TakeOrderedAndProject for the top-{VOCAB_TOP}
    (per-partition top-k + merge, never a global sort) → the rank/cum
    window runs over only the {VOCAB_TOP} selected rows, and the corpus
    total is a separate 1-row aggregate crossJoined in. The only
    full-vocab ordering work is the TakeOrdered heap — scale-safe where
    a naive global window over the vocabulary would single-partition."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("t")
    ).where(F.col("t") != "")
    cnts = tok.groupBy("t").agg(F.count("*").alias("cnt"))
    tot = cnts.agg(F.sum("cnt").alias("n"))
    top = cnts.orderBy(F.desc("cnt"), "t").limit(VOCAB_TOP)
    w = (
        Window.orderBy(F.desc("cnt"), "t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return top.crossJoin(F.broadcast(tot)).select(
        F.row_number()
        .over(Window.orderBy(F.desc("cnt"), "t"))
        .cast("long")
        .alias("rnk"),
        F.col("t").alias("token"),
        "cnt",
        r6(F.sum("cnt").over(w) * 1.0 / F.col("n"), "cum_share"),
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis)
# ---------------------------------------------------------------------------

SAMPLE_K = 50


@register(
    "q_weighted_sample",
    f"""
WITH cand AS (
  SELECT doc_id, n_chars AS weight,
         ({md5_int32_sql('CAST(doc_id AS VARCHAR)')} + 0.5) / 4294967296.0 AS u
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, CAST(weight AS BIGINT) AS weight,
       CAST(-ln(u) / weight AS REAL) AS sample_key
FROM cand
ORDER BY CAST(-ln(u) / weight AS REAL), doc_id
LIMIT {SAMPLE_K}
""",
    "sampling",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis via
    exponential race): each doc draws key = −ln(u)/w with u a
    deterministic md5-derived uniform in (0,1) and w = n_chars; the
    {SAMPLE_K} smallest keys are an exact weighted sample. Selection
    order is the float32-CANONICALIZED key (ties → doc_id) on BOTH
    engines, so membership can't flip on libm ulps. Plan: one scan +
    TakeOrderedAndProject — a per-partition top-k heap and a merge, no
    shuffle of the data itself; this is the one-pass distributed
    weighted sampler (the A-ES reservoir) at any scale."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    u = (md5_int32(F.col("doc_id").cast("string")) + 0.5) / F.lit(4294967296.0)
    cand = docs.select(
        "doc_id",
        F.col("n_chars").alias("weight"),
        r6(-F.log(u) / F.col("n_chars"), "sample_key"),
    )
    return cand.orderBy("sample_key", "doc_id").limit(SAMPLE_K)


# ---------------------------------------------------------------------------
# Equi-width histogram
# ---------------------------------------------------------------------------

HIST_BINS = 20


@register(
    "q_histogram",
    f"""
WITH v AS (SELECT value FROM events WHERE value IS NOT NULL),
ext AS (SELECT min(value) AS vmin, max(value) AS vmax FROM v),
binned AS (
  SELECT least({HIST_BINS - 1},
               CAST(floor((value - vmin) / ((vmax - vmin) / {HIST_BINS}))
                    AS BIGINT)) AS bin,
         vmin, vmax
  FROM v CROSS JOIN ext
)
SELECT bin,
       CAST(vmin + bin * (vmax - vmin) / {HIST_BINS} AS REAL) AS lo,
       CAST(vmin + (bin + 1) * (vmax - vmin) / {HIST_BINS} AS REAL) AS hi,
       CAST(count(*) AS BIGINT) AS cnt
FROM binned GROUP BY bin, vmin, vmax
""",
    "agg",
    "histogram",
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of event values: global min/max as a 1-row
    aggregate broadcast onto the scan, then one count shuffle on the bin
    id. Bin membership is decided by IEEE double arithmetic that both
    engines evaluate bit-identically ((v−min)/width, floor), so counts
    are integer-exact; the max value folds into the last bin via least().
    Two scans + one small shuffle ({HIST_BINS} groups) at any scale —
    the min/max pass is the unavoidable price of data-dependent bounds
    (fixed-bound histograms fuse into a single scan)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    ext = ev.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    width = (F.col("vmax") - F.col("vmin")) / HIST_BINS
    binned = ev.crossJoin(F.broadcast(ext)).select(
        F.least(
            F.lit(HIST_BINS - 1),
            F.floor((F.col("value") - F.col("vmin")) / width).cast("long"),
        ).alias("bin"),
        "vmin",
        "vmax",
    )
    return binned.groupBy("bin", "vmin", "vmax").agg(
        F.count("*").alias("cnt")
    ).select(
        "bin",
        r6(F.col("vmin") + F.col("bin") * (F.col("vmax") - F.col("vmin")) / HIST_BINS, "lo"),
        r6(F.col("vmin") + (F.col("bin") + 1) * (F.col("vmax") - F.col("vmin")) / HIST_BINS, "hi"),
        "cnt",
    )


# ---------------------------------------------------------------------------
# Linear-regression aggregates
# ---------------------------------------------------------------------------


@register(
    "q_regression_aggs",
    """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       CAST(regr_slope(l_extendedprice, l_quantity) AS REAL) AS slope,
       CAST(regr_intercept(l_extendedprice, l_quantity) AS REAL) AS intercept,
       CAST(regr_r2(l_extendedprice, l_quantity) AS REAL) AS r2,
       CAST(corr(l_extendedprice, l_quantity) AS REAL) AS correlation,
       CAST(covar_samp(l_extendedprice, l_quantity) AS REAL) AS covariance
FROM lineitem
GROUP BY l_returnflag
""",
    "agg",
    "stats",
)
def q_regression_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS regression aggregates (price ~ quantity per return flag):
    slope / intercept / R² / correlation / sample covariance — the
    ANSI regr_* family, all computed in ONE grouped hash aggregate pass
    (each is a moment combination, so partial aggregation applies and
    the shuffle carries 3-group moment tuples, not rows). Float results
    are float32-canonicalized: the two engines sum in different orders."""
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        r6(F.regr_slope(y, x), "slope"),
        r6(F.regr_intercept(y, x), "intercept"),
        r6(F.regr_r2(y, x), "r2"),
        r6(F.corr(y, x), "correlation"),
        r6(F.covar_samp(y, x), "covariance"),
    )


# ---------------------------------------------------------------------------
# Robust outliers via median absolute deviation
# ---------------------------------------------------------------------------

MAD_C = 0.6745  # Φ⁻¹(0.75): scales MAD to σ-equivalent units
MAD_CUT = 3.5


@register(
    "q_mad_outliers",
    BARS_CTE
    + f"""
, med AS (
  SELECT symbol, quantile_cont("close", 0.5) AS med FROM bars GROUP BY symbol
), mad AS (
  SELECT b.symbol, quantile_cont(abs(b."close" - m.med), 0.5) AS mad
  FROM bars b JOIN med m USING (symbol) GROUP BY b.symbol
)
SELECT b.symbol, b.bar_start,
       CAST(b."close" AS REAL) AS close,
       CAST(CASE WHEN abs(CASE WHEN d.mad > 0
              THEN {MAD_C} * (b."close" - m.med) / d.mad END) < 1e-6 THEN 0
            ELSE CASE WHEN d.mad > 0
              THEN {MAD_C} * (b."close" - m.med) / d.mad END END AS REAL)
         AS robust_z,
       coalesce(abs(CASE WHEN d.mad > 0
              THEN {MAD_C} * (b."close" - m.med) / d.mad END) > {MAD_CUT},
              FALSE) AS is_outlier
FROM bars b JOIN med m USING (symbol) JOIN mad d USING (symbol)
""",
    "quality",
    "stats",
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: per-symbol median and median-absolute-
    deviation (two exact-percentile aggregates), robust z =
    {MAD_C}·(x−med)/MAD, flagged beyond {MAD_CUT} — immune to the
    outliers themselves, unlike the stddev z-score stack. Exact
    percentiles interpolate identically on both engines and the flag
    arithmetic is deterministic IEEE, so even the boolean is bit-exact.
    Plan: two symbol-keyed aggregates whose tiny results broadcast back
    onto the bar stream — per-key state is the sorted close list
    (time-bounded per symbol), the same cost class as any exact
    median at scale."""
    bars = gold_bars_cut(spark, sf_dir)
    med = bars.groupBy("symbol").agg(
        F.percentile("close", F.lit(0.5)).alias("med")
    )
    b1 = bars.join(F.broadcast(med), "symbol")
    mad = b1.groupBy("symbol").agg(
        F.percentile(F.abs(F.col("close") - F.col("med")), F.lit(0.5)).alias(
            "mad"
        )
    )
    z = F.when(
        F.col("mad") > 0,
        MAD_C * (F.col("close") - F.col("med")) / F.col("mad"),
    )
    from .registry import r6z

    return (
        b1.join(F.broadcast(mad), "symbol")
        .select(
            "symbol",
            "bar_start",
            r6("close", "close"),
            r6z(z, "robust_z"),
            F.coalesce(F.abs(z) > MAD_CUT, F.lit(False)).alias("is_outlier"),
        )
    )


# ---------------------------------------------------------------------------
# k-hop BFS (bounded-iteration shortest distance from a seed set)
# ---------------------------------------------------------------------------

BFS_HOPS = 3
BFS_SEED_BRAND = "Brand#11"

_BFS_GRAPH_SQL = (
    _TRI_EDGES_SQL
    + f"""
, eu AS (
  SELECT u AS src, v AS dst FROM edges
  UNION ALL SELECT v AS src, u AS dst FROM edges
),
d0 AS (
  SELECT DISTINCT p_partkey AS id, 0 AS dist FROM part
  WHERE p_brand = '{BFS_SEED_BRAND}'
)
"""
)


def _bfs_iter_sql(prev: str, cur: str) -> str:
    return f"""
{cur} AS (
  SELECT id, min(dist) AS dist FROM (
    SELECT id, dist FROM {prev}
    UNION ALL
    SELECT e.dst AS id, d.dist + 1 AS dist
    FROM eu e JOIN {prev} d ON e.src = d.id
  ) GROUP BY id
)"""


_BFS_SQL = (
    "WITH "
    + _BFS_GRAPH_SQL
    + ","
    + ",".join(_bfs_iter_sql(f"d{i}", f"d{i + 1}") for i in range(BFS_HOPS))
    + f"""
SELECT CAST(dist AS BIGINT) AS dist, CAST(count(*) AS BIGINT) AS n_nodes
FROM d{BFS_HOPS} GROUP BY dist
"""
)


@register("q_bfs_khop", _BFS_SQL, "graph", "iterative")
def q_bfs_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{BFS_HOPS}-hop BFS over the part co-purchase graph from the
    '{BFS_SEED_BRAND}' seed set: per round, every frontier node offers
    dist+1 to its neighbors and a min-aggregate keeps the best known
    distance — bounded-iteration label propagation, the same dataflow
    family as PageRank/components, and like PageRank fully oracle-
    checkable as chained CTEs because the hop count is a constant.
    Output is the distance histogram (integer-exact).

    Plan: the undirected edge list is materialized ONCE behind a lineage
    cut, then each round is one equi-join (edges ⋈ frontier) + one min
    shuffle on node id; frontier size is monotone non-decreasing but
    bounded by reachable nodes, and rounds are a constant — at 100 TB
    this is {BFS_HOPS} bounded shuffles, never a transitive closure.
    The distance table is node-sized, so the loop materializes eagerly
    under iter_shuffle_scope (narrow iteration shuffles — see
    q_pagerank)."""
    from .extensions.dedup import _cut_lineage
    from .session import iter_shuffle_scope

    eu = copurchase_undirected_cut(spark, sf_dir)
    part = load_table(spark, sf_dir, "part")
    d = (
        part.where(F.col("p_brand") == BFS_SEED_BRAND)
        .select(F.col("p_partkey").alias("id"))
        .distinct()
        .select("id", F.lit(0).alias("dist"))
    )
    for _ in range(BFS_HOPS):
        # merge hint: the planner otherwise auto-broadcasts the frontier
        # every hop — sequential collect+build barriers (2.5 s → 2.0 s at
        # sf0.1), and at scale the frontier is reachable-node-sized,
        # never broadcastable (same reasoning as q_pagerank's rank table).
        dk = d.hint("merge")
        offers = eu.join(dk, eu["src"] == dk["id"]).select(
            F.col("dst").alias("id"), (F.col("dist") + 1).alias("dist")
        )
        d = (
            d.unionAll(offers)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
        )
    # Iteration width: per-hop work is edge-sized, but at iteration
    # scale the per-task shuffle-file and scheduling overhead dominates
    # wide stages — re-measured round 5 with the parallel scan layout:
    # 4.0 s at the full session width vs 2.1 s at iter_parts (min-of-2
    # interleaved), reversing the earlier keep-full-width call. A
    # cluster session's iter_parts scales with its shuffle sizing, so
    # the fraction rule stays the right default there too.
    with iter_shuffle_scope(spark):
        d = _cut_lineage(d)
    return d.groupBy(F.col("dist").cast("long").alias("dist")).agg(
        F.count("*").alias("n_nodes")
    )


# ---------------------------------------------------------------------------
# Sequence packing (concat-then-chunk with a distributed prefix sum)
# ---------------------------------------------------------------------------

PACK_LEN = 512  # tokens per training sequence
PACK_PARTS = 8  # range partitions for the distributed prefix sum


@register(
    "q_pack_sequences",
    f"""
WITH d AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok
  FROM documents
), pos AS (
  SELECT doc_id, n_tok,
         CAST(sum(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
              - n_tok AS BIGINT) AS tok_start
  FROM d
), spans AS (
  SELECT doc_id, n_tok, tok_start,
         unnest(generate_series(tok_start // {PACK_LEN},
                                (tok_start + n_tok - 1) // {PACK_LEN})) AS seq_id
  FROM pos
), seg AS (
  SELECT seq_id, doc_id,
         least(tok_start + n_tok, (seq_id + 1) * {PACK_LEN})
           - greatest(tok_start, seq_id * {PACK_LEN}) AS tok_in_seq
  FROM spans
)
SELECT CAST(seq_id AS BIGINT) AS seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(tok_in_seq) AS BIGINT) AS n_tokens,
       CAST(min(doc_id) AS BIGINT) AS first_doc,
       CAST(max(doc_id) AS BIGINT) AS last_doc
FROM seg GROUP BY seq_id
""",
    "llm",
    "packing",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing, concat-then-chunk: documents are laid
    end-to-end in doc_id order and the token stream is cut into fixed
    {PACK_LEN}-token sequences (docs straddle boundaries — exactly what
    LLM pretraining loaders do); output maps each sequence to its doc
    count, token count (={PACK_LEN} except the tail), and doc-id span.

    The global token offset is the interesting part at 100 TB: the naive
    spelling is a cumulative window ordered by doc_id with NO partition
    key — a single-partition sort of the corpus. This plan computes it as
    a real DISTRIBUTED PREFIX SUM: range-partition by doc_id, cumsum
    within each partition (parallel windows), aggregate {PACK_PARTS}
    per-partition totals, turn those into partition offsets with a
    window over {PACK_PARTS} rows (driver-scale), and broadcast the
    offsets back. The only non-parallel structure is the
    {PACK_PARTS}-row offsets table. Offsets/lengths are BIGINTs and the
    chunk math is integer DIV, so every output cell is integer-exact.
    (AQE only ever coalesces CONTIGUOUS shuffle partitions, so the
    pid-increases-with-doc_id invariant survives runtime re-planning.)
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tok"),
    ).repartitionByRange(PACK_PARTS, "doc_id")
    dp = d.withColumn("pid", F.spark_partition_id())
    wp = Window.partitionBy("pid").orderBy("doc_id")
    local = dp.withColumn("local_end", F.sum("n_tok").over(wp))
    totals = dp.groupBy("pid").agg(F.sum("n_tok").alias("ptot"))
    wo = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "pid", F.coalesce(F.sum("ptot").over(wo), F.lit(0)).alias("poff")
    )
    pos = local.join(F.broadcast(offsets), "pid").select(
        "doc_id",
        "n_tok",
        (F.col("poff") + F.col("local_end") - F.col("n_tok")).alias("tok_start"),
    )
    spans = pos.select(
        "doc_id",
        "n_tok",
        "tok_start",
        F.explode(
            F.sequence(
                F.expr(f"tok_start DIV {PACK_LEN}"),
                F.expr(f"(tok_start + n_tok - 1) DIV {PACK_LEN}"),
            )
        ).alias("seq_id"),
    )
    seg = spans.select(
        "seq_id",
        "doc_id",
        (
            F.least(
                F.col("tok_start") + F.col("n_tok"),
                (F.col("seq_id") + 1) * PACK_LEN,
            )
            - F.greatest(F.col("tok_start"), F.col("seq_id") * PACK_LEN)
        ).alias("tok_in_seq"),
    )
    return seg.groupBy("seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("tok_in_seq").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# ---------------------------------------------------------------------------
# Mergeable aggregate state: OHLCV bars rebuilt from partial aggregates
# ---------------------------------------------------------------------------


@register(
    "q_bars_merge_partials",
    BARS_CTE
    + """
SELECT symbol, bar_start,
       CAST("open" AS REAL) AS open,
       CAST(high AS REAL) AS high,
       CAST(low AS REAL) AS low,
       CAST("close" AS REAL) AS close,
       CAST(volume AS REAL) AS volume,
       CAST(vwap AS REAL) AS vwap,
       CAST(trades AS BIGINT) AS trades
FROM bars
""",
    "agg",
    "incremental",
)
def q_bars_merge_partials(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLCV bars computed as a MERGE of independent partial aggregates:
    the stream is split into two deterministic halves (event_id parity),
    each half builds per-bar partial state, and the partials merge into
    the final bars — proving the aggregation state is a commutative
    monoid (min/max for extremes, (time, price)-struct min/max for
    open/close so merging picks the globally earliest/latest trade,
    sums for volume/notional/count; vwap derived only after the merge).
    The oracle recomputes the bars directly in one pass — equality IS
    the mergeability proof. This algebra is what makes map-side
    combine, per-day incremental rollups, and the streaming gold
    cascade (registry_round2) correct at 100 TB: partials from any
    partitioning of the input merge to the same answer. Floats are
    float32-canonicalized (two-level summation rounds differently)."""
    trades = events_as_trades(spark, sf_dir)
    half = (F.col("event_id") % 2).alias("half")
    partials = trades.groupBy(
        F.col("symbol"),
        F.window("event_time", "1 minute").alias("w"),
        half,
    ).agg(
        F.min(F.struct("event_time", "price")).alias("o_s"),
        F.max("price").alias("high"),
        F.min("price").alias("low"),
        F.max(F.struct("event_time", "price")).alias("c_s"),
        F.sum("size").alias("volume"),
        F.sum(F.col("price") * F.col("size")).alias("notional"),
        F.count("*").alias("trades"),
    )
    merged = partials.groupBy("symbol", "w").agg(
        F.min("o_s").alias("o_s"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max("c_s").alias("c_s"),
        F.sum("volume").alias("volume"),
        F.sum("notional").alias("notional"),
        F.sum("trades").alias("trades"),
    )
    return merged.select(
        "symbol",
        F.col("w.start").alias("bar_start"),
        r6(F.col("o_s.price"), "open"),
        r6("high", "high"),
        r6("low", "low"),
        r6(F.col("c_s.price"), "close"),
        r6("volume", "volume"),
        r6(
            F.when(
                F.col("volume") != 0, F.col("notional") / F.col("volume")
            ),
            "vwap",
        ),
        "trades",
    )
