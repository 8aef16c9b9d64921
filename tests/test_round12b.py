"""Invariants for the round-12b retrieval-mining operators beyond the
oracle hash: hard-negative band membership and positives-disjointness,
and pure-Python THIRD implementations (independent of both the Spark
and DuckDB spellings) of the greedy MMR pick sequence and the BPE pair
counts.
"""

from __future__ import annotations

import collections
import math
import re

import duckdb

from crypto_streaming_lakehouse_spark.registry import REGISTRY
from crypto_streaming_lakehouse_spark.registry_round12b import (
    BPE_TOP,
    HN_MARGIN,
    HN_MAX_RANK,
    HN_N_QUERIES,
    HN_POS_K,
    MMR_CAND,
    MMR_N_QUERIES,
    MMR_PICKS,
)

from .conftest import SF_DIR


def test_hard_negatives_band_and_disjoint_from_positives(spark):
    rows = REGISTRY["q_hard_negative_mining"].fn(spark, SF_DIR).collect()
    assert rows, "fixture corpus must produce a non-empty semi-hard band"
    positives = {
        (r.q_id, r.vec_id)
        for r in REGISTRY["q_ann_cosine_topk"].fn(spark, SF_DIR).collect()
    }
    for r in rows:
        assert 0 <= r.q_id < HN_N_QUERIES
        assert HN_POS_K < r.rank <= HN_MAX_RANK
        # within the margin band of that query's weakest positive, and
        # never ABOVE it (rank > POS_K guarantees it up to float32
        # canonicalization of the reported gap)
        assert -1e-6 <= r.margin_gap <= HN_MARGIN + 1e-6
        assert (r.q_id, r.vec_id) not in positives, (
            "a mined negative duplicates a positive"
        )


def test_mmr_matches_pure_python_greedy(spark):
    """Third implementation: run the greedy MMR loop in plain Python
    over vectors read straight from the parquet and compare the full
    (q_id, pick_rank) -> vec_id pick sequence."""
    vecs = {
        vid: [float(x) for x in emb]
        for vid, emb in duckdb.sql(
            f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet'"
        ).fetchall()
    }

    def cos(a, b):
        dot = sum(x * y for x, y in zip(vecs[a], vecs[b]))
        na = math.sqrt(sum(x * x for x in vecs[a]))
        nb = math.sqrt(sum(x * x for x in vecs[b]))
        return dot / (na * nb)

    want = {}
    for q in range(MMR_N_QUERIES):
        rel = {c: cos(q, c) for c in vecs if c != q}
        cand = sorted(rel, key=lambda c: (-rel[c], c))[:MMR_CAND]
        picked: list[int] = []
        for t in range(1, MMR_PICKS + 1):
            best = max(
                (c for c in cand if c not in picked),
                key=lambda c: (
                    0.7 * rel[c]
                    - (
                        0.3 * max(cos(c, p) for p in picked)
                        if picked
                        else 0.0
                    ),
                    -c,
                ),
            )
            picked.append(best)
            want[(q, t)] = best

    got = {
        (r.q_id, r.pick_rank): r.vec_id
        for r in REGISTRY["q_mmr_rerank"].fn(spark, SF_DIR).collect()
    }
    assert got == want


def test_bpe_counts_match_pure_python(spark):
    """Third implementation: recount the adjacent-pair frequencies in
    plain Python over the same parquet and compare the top-BPE_TOP set
    (same (cnt DESC, pair ASC) tie-break) — independent of both engines'
    split/substr semantics."""
    texts = [
        t[0]
        for t in duckdb.sql(
            f"SELECT text FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    ]
    counts: collections.Counter[str] = collections.Counter()
    for text in texts:
        # ASCII whitespace class, NOT r"\s+": Python re's \s is
        # Unicode-aware while Spark (Java regex) and DuckDB (RE2) treat
        # \s as ASCII-only by default — NBSP in a fixture would make
        # this third implementation diverge from both engines.
        for w in re.split(r"[ \t\n\r\f\v]+", text.strip().lower()):
            for i in range(len(w) - 1):
                counts[w[i : i + 2]] += 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOP]
    got = [
        (r.pair, r.cnt)
        for r in sorted(
            REGISTRY["q_bpe_merge_induction"].fn(spark, SF_DIR).collect(),
            key=lambda r: r.merge_rank,
        )
    ]
    assert got == want
