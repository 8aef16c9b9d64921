"""Round-14 invariants beyond the oracle hash.

The headline is the stream≡batch proof for incremental IVF-PQ index
maintenance (VERDICT r13 item 1): delta vectors arriving as a
multi-micro-batch stream, cell-assigned and PQ-encoded against the
STATIC base-trained codebooks, must accumulate EXACTLY the delta rows of
the batch twin ``q_ivfpq_index_upsert`` — encode is stateless given the
codebooks, so upsert ≡ rebuild, micro-batch for micro-batch.

Plus: a pure-Python third implementation of the SPLADE sparse dot
product, the identity-variant cross-check between
``q_opq_rotation_distortion`` and ``q_pq_distortion``, and the
occupancy/partition accounting of the upsert split.
"""

from __future__ import annotations

import collections
import math
import re

import duckdb
from pyspark.sql import functions as F

from crypto_streaming_lakehouse_spark import registry_round11 as R11
from crypto_streaming_lakehouse_spark.registry import REGISTRY
from crypto_streaming_lakehouse_spark.registry_round14 import (
    SPLADE_K,
    SPLADE_NQ,
    UPSERT_DIV,
    _cell_assign,
    _emb_and_cutoff,
    frozen_cent_row,
)

from .conftest import SF_DIR


def _delta_cutoff(spark) -> int:
    n = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .agg(F.max("vec_id"))
        .collect()[0][0]
        + 1
    )
    return n - n // UPSERT_DIV


def test_streaming_ivfpq_index_upsert(spark, tmp_path):
    """Incremental index maintenance as a STREAM over static codebooks:
    the trained coarse centroids and the PQ codebook are built ONCE from
    the base snapshot; delta vectors arrive as a file-source stream
    (forced into multiple micro-batches) and each micro-batch runs the
    same _cell_assign + _pq_codes_arrow the batch path uses — with the
    codebook INJECTED, not re-derived from the micro-batch. Per-row
    independence (assignment and encode depend only on the row and the
    frozen codebooks) makes the union of per-batch outputs equal the
    batch twin's delta partition EXACTLY."""
    emb, cut = _emb_and_cutoff(spark, SF_DIR)
    cutoff = _delta_cutoff(spark)
    base = emb.where(F.col("vec_id") < cutoff)
    # Freeze the trained centroids ONCE before the stream starts: a
    # lazy cent_row re-executes the Lloyd training subtree per
    # micro-batch (profiled in bench_artifacts/r15).
    cent_row = frozen_cent_row(base)

    # The static PQ codebook, explicitly from the BASE snapshot (the
    # batch path derives the identical one from the full table because
    # the first PQ_SEARCH_K vec_ids are in base by UPSERT_DIV's design).
    cb = [
        r.v
        for r in base.orderBy("vec_id")
        .limit(R11.PQ_SEARCH_K)
        .select("v")
        .collect()
    ]

    delta = emb.where(F.col("vec_id") >= cutoff)
    qdir = tmp_path / "delta"
    delta.where(F.col("vec_id") % 2 == 0).coalesce(1).write.parquet(
        str(qdir / "f0")
    )
    delta.where(F.col("vec_id") % 2 == 1).coalesce(1).write.parquet(
        str(qdir / "f1")
    )
    stream = (
        spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(qdir / "f*"))
    )

    mined: dict[int, tuple] = {}
    batch_count = [0]

    def absorb(batch_df, _bid):
        if batch_df.isEmpty():
            return
        batch_count[0] += 1
        cells = _cell_assign(batch_df.select("vec_id", "v"), cent_row)
        codes = R11._pq_codes_arrow(
            batch_df.sparkSession, batch_df, codebook=cb
        )
        for r in cells.join(codes, "vec_id").collect():
            assert r["vec_id"] not in mined, "vector streamed twice"
            mined[r["vec_id"]] = (r["cell"], tuple(r["codes"]))

    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_upsert"))
        .foreachBatch(absorb)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    assert batch_count[0] >= 2, "delta stream must span multiple batches"

    # The declared query serializes codes as a comma-delimited string
    # (driver canonicalization — registry_round14.q_ivfpq_index_upsert);
    # parse it back for the tuple comparison against the streamed arrays.
    want = {
        r["vec_id"]: (r["cell"], tuple(int(c) for c in r["codes"].split(",")))
        for r in REGISTRY["q_ivfpq_index_upsert"]
        .fn(spark, SF_DIR)
        .where(F.col("snapshot") == "delta")
        .collect()
    }
    assert mined == want


def test_upsert_split_accounting(spark):
    """The snapshot split is exact: delta = n // UPSERT_DIV newest rows,
    base = the rest; every vector appears exactly once."""
    rows = REGISTRY["q_ivfpq_index_upsert"].fn(spark, SF_DIR).collect()
    n = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    cutoff = _delta_cutoff(spark)
    by_snap = collections.Counter(r["snapshot"] for r in rows)
    assert len(rows) == n
    assert len({r["vec_id"] for r in rows}) == n
    assert by_snap == {"base": cutoff, "delta": n - cutoff}
    for r in rows:
        assert (r["vec_id"] >= cutoff) == (r["snapshot"] == "delta")


def test_upsert_occupancy_sums_to_corpus(spark):
    """Occupancy partitions the corpus: totals sum to n, the delta
    column sums to the delta partition, and delta_frac is consistent."""
    rows = REGISTRY["q_ivfpq_upsert_occupancy"].fn(spark, SF_DIR).collect()
    n = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    cutoff = _delta_cutoff(spark)
    assert sum(r["total_rows"] for r in rows) == n
    assert sum(r["delta_rows"] for r in rows) == n - cutoff
    assert sum(r["base_rows"] for r in rows) == cutoff
    for r in rows:
        assert r["base_rows"] + r["delta_rows"] == r["total_rows"]
        assert math.isclose(
            r["delta_frac"], r["delta_rows"] / r["total_rows"], rel_tol=1e-6
        )


def test_opq_identity_variant_equals_pq_distortion(spark):
    """q_opq_rotation_distortion's identity variant computes exactly
    q_pq_distortion's K=16 rows (same codebook, same min-d2, same
    float32 collapse) — the cross-query pin that the OPQ harness's
    baseline is the already-verified distortion metric."""
    opq = {
        r["subspace"]: r["mse"]
        for r in REGISTRY["q_opq_rotation_distortion"]
        .fn(spark, SF_DIR)
        .collect()
        if r["variant"] == "identity"
    }
    pq = {
        r["subspace"]: r["mse"]
        for r in REGISTRY["q_pq_distortion"].fn(spark, SF_DIR).collect()
        if r["k_cb"] == R11.PQ_SEARCH_K
    }
    assert opq == pq


def test_opq_permutation_is_a_bijection():
    perm = [(37 * i) % 64 for i in range(64)]
    assert sorted(perm) == list(range(64))


def test_splade_scores_match_pure_python(spark):
    """Third implementation: per-doc term-frequency maps in pure Python,
    sparse dot products against query q_id=0, float32-collapsed exactly
    like both engines; the engine's top-k for that query must match."""
    texts = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    import numpy as np

    weights: dict[int, dict[str, float]] = {}
    for doc_id, text in texts:
        toks = [
            w
            for w in re.split(r"\s+", text.strip().lower())
            if len(w) >= 2
        ]
        tf = collections.Counter(toks)
        weights[doc_id] = {
            w: float(np.float32(math.log(1 + c))) for w, c in tf.items()
        }
    q = weights[0]
    scored = []
    for doc_id, wmap in weights.items():
        if doc_id == 0:
            continue
        s = 0.0
        for w, qwt in q.items():
            if w in wmap:
                s += qwt * wmap[w]
        if s > 0:
            scored.append((float(np.float32(s)), doc_id))
    scored.sort(key=lambda t: (-t[0], t[1]))
    want = [(doc_id, s) for s, doc_id in scored[:SPLADE_K]]

    got = sorted(
        (
            (r["doc_id"], r["score"], r["rank"])
            for r in REGISTRY["q_splade_topk"].fn(spark, SF_DIR).collect()
            if r["q_id"] == 0
        ),
        key=lambda t: t[2],
    )
    assert [(d, s) for d, s, _ in got] == [
        (d, float(np.float32(s))) for d, s in want
    ]
    assert SPLADE_NQ >= 1

def test_churn_accounting(spark):
    """Churn rows partition the corpus and the fraction is consistent;
    both snapshots present."""
    rows = REGISTRY["q_ivfpq_assignment_churn"].fn(spark, SF_DIR).collect()
    n = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    cutoff = _delta_cutoff(spark)
    by = {r["snapshot"]: r for r in rows}
    assert set(by) == {"base", "delta"}
    assert by["base"]["n_rows"] == cutoff
    assert by["delta"]["n_rows"] == n - cutoff
    for r in rows:
        assert 0 <= r["n_moved"] <= r["n_rows"]
        assert math.isclose(
            r["churn_frac"], r["n_moved"] / r["n_rows"], rel_tol=1e-6
        )


def test_posting_stats_consistency(spark):
    """df histogram covers every distinct term exactly once and bucket
    bounds hold (2^(bits-1) <= df < 2^bits ⇒ postings bounded)."""
    rows = REGISTRY["q_splade_posting_stats"].fn(spark, SF_DIR).collect()
    texts = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    terms = {}
    for doc_id, text in texts:
        for w in set(
            t for t in re.split(r"\s+", text.strip().lower()) if len(t) >= 2
        ):
            terms[w] = terms.get(w, 0) + 1
    assert sum(r["n_terms"] for r in rows) == len(terms)
    assert sum(r["total_postings"] for r in rows) == sum(terms.values())
    for r in rows:
        lo, hi = 2 ** (r["df_bits"] - 1), 2 ** r["df_bits"]
        assert lo * r["n_terms"] <= r["total_postings"] < hi * r["n_terms"]


def test_opq_variance_total_is_rotation_invariant(spark):
    """The permutation relabels dims, so the SUM of per-subspace
    variances is identical across variants (same dim set) — the analytic
    invariant the OPQ screen rests on; only the per-subspace SPLIT may
    move."""
    rows = REGISTRY["q_opq_subspace_variance"].fn(spark, SF_DIR).collect()
    tot = {}
    for r in rows:
        tot[r["variant"]] = tot.get(r["variant"], 0.0) + r["variance"]
    assert set(tot) == {"identity", "perm37"}
    assert math.isclose(tot["identity"], tot["perm37"], rel_tol=1e-5)
