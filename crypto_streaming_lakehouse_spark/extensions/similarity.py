"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline. One
  equi-free join of queries × candidates; fine for broadcastable query sets
  (the common case: few queries, huge corpus) since Catalyst broadcasts the
  small side and the corpus is scanned once with no shuffle.
- ``lsh_cosine_topk``: random-hyperplane LSH scale path — each vector maps
  to a small bucket id; the join is bucket-equi, so candidate count is
  corpus/2^planes per query instead of the whole corpus. The hyperplanes
  are derived deterministically from md5 so the DuckDB oracle reproduces
  the exact same buckets (approximate ANN, exact oracle).

All arithmetic folds sequentially in index order (F.aggregate ≡ DuckDB
list_reduce), so cosines are bit-identical across engines and need no
rounding for the oracle hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8


def _to_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(v: Column) -> Column:
    return F.sqrt(_dot(v, v))


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _to_double(F.col(vec_col))
    return emb.select(
        "vec_id", v.alias("v"), _norm(v).alias("norm")
    )


def cosine_topk(
    emb: DataFrame, *, n_queries: int = 10, k: int = 5
) -> DataFrame:
    """Exact top-k nearest (cosine) for each of the first n_queries vectors.

    Deterministic rank tie-break on candidate vec_id.
    """
    e = with_norm(emb)
    q = (
        e.where(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            F.col("norm").alias("qn"),
        )
    )
    pairs = q.join(e, F.col("vec_id") != F.col("q_id"))
    scored = pairs.select(
        "q_id",
        "vec_id",
        (_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "cosine", "rank")
    )


def plane_component(p: int, d: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1), derived
    from md5 so any engine can recompute it."""
    import hashlib

    h = int(hashlib.md5(f"{p},{d}".encode()).hexdigest()[:8], 16)
    return h / 2147483647.5 - 1.0


def _plane_lit(p: int, dims: int) -> Column:
    return F.array(*[F.lit(plane_component(p, d)) for d in range(dims)])


def bucket_column(v: Column, dims: int, n_planes: int = N_PLANES) -> Column:
    """Sign pattern of v against n_planes hyperplanes → integer bucket id."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        dot = _dot(v, _plane_lit(p, dims))
        bucket = bucket + F.when(dot >= 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def lsh_cosine_topk(
    emb: DataFrame,
    *,
    dims: int = 64,
    n_queries: int = 10,
    k: int = 5,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket."""
    e = with_norm(emb).withColumn(
        "bucket", bucket_column(F.col("v"), dims, n_planes)
    )
    q = (
        e.where(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            F.col("norm").alias("qn"),
            F.col("bucket").alias("q_bucket"),
        )
    )
    pairs = q.join(
        e,
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("q_id")),
    )
    scored = pairs.select(
        "q_id",
        "vec_id",
        (_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "cosine", "rank")
    )


def _pair_dot_udf():
    """Arrow-batched row-wise dot product: one einsum per ~10k-row batch
    instead of an interpreted fold per element (~20× at sf0.1). Sum order
    differs from a sequential fold in the last ulps, so compared outputs go
    through float32 canonicalization (r6) on both engines.

    Built lazily — pandas_udf parses its DDL type against the active
    SparkSession, so decorating at import time fails before a session
    exists (e.g. under the driver's own session factory).
    """
    from pyspark.sql.types import DoubleType

    def _pair_dot(a, b):
        import numpy as np
        import pandas as pd

        A = np.vstack(a.to_numpy())
        B = np.vstack(b.to_numpy())
        return pd.Series(np.einsum("ij,ij->i", A, B))

    return F.pandas_udf(_pair_dot, DoubleType())


def embedding_cosine_pairs(
    emb: DataFrame, *, threshold: float = 0.4
) -> DataFrame:
    """Near-duplicate vector pairs by cosine ≥ threshold (brute-force
    baseline; LSH-bucketed variant composes bucket_column the same way).

    The O(n²) pair join is the algorithmic cost; per-pair arithmetic is the
    vectorized Pandas UDF, with norms precomputed per side (exact sequential
    fold — bit-identical to the oracle's list_reduce)."""
    e = with_norm(emb)
    a = e.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("norm").alias("na")
    )
    b = e.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("norm").alias("nb")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (
                _pair_dot_udf()(F.col("va"), F.col("vb"))
                / (F.col("na") * F.col("nb"))
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
