"""Property-based invariants (hypothesis): random inputs, algebraic laws.

Each example round-trips through a real Spark plan, so examples are capped
low — the point is laws the oracle fixtures can't probe (arbitrary
groupings, adversarial float values, random graph shapes)."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from crypto_streaming_lakehouse_spark.extensions import dedup as D
from crypto_streaming_lakehouse_spark.operators.bars import ohlcv_bars

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_BASE = datetime.datetime(2024, 1, 1, 0, 0, 0)

trade = st.tuples(
    st.sampled_from(["BTC", "ETH", "SOL"]),
    st.integers(min_value=0, max_value=600),  # seconds → spans 10 minutes
    st.floats(min_value=0.01, max_value=1e6, allow_nan=False),
    st.floats(min_value=0.01, max_value=1e3, allow_nan=False),
)


@given(st.lists(trade, min_size=1, max_size=60))
@_SETTINGS
def test_ohlcv_invariants(spark, rows):
    df = spark.createDataFrame(
        [
            (s, _BASE + datetime.timedelta(seconds=sec), float(p), float(z))
            for s, sec, p, z in rows
        ],
        "symbol string, event_time timestamp, price double, size double",
    )
    bars = ohlcv_bars(df).collect()
    assert sum(b.trades for b in bars) == len(rows)
    for b in bars:
        assert b.low <= min(b.open, b.close) <= max(b.open, b.close) <= b.high
        # all sizes positive → vwap is a convex combination of prices
        assert b.low <= b.vwap * (1 + 1e-12) and b.vwap <= b.high * (1 + 1e-12)
        assert b.bar_start <= b.bar_end


@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.sampled_from(["aa bb cc", "dd ee", "x"])),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
@_SETTINGS
def test_exact_dedup_partition_law(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    groups = D.exact_dup_groups(docs).collect()
    # dup groups PARTITION the corpus: copies sum to row count, keepers are
    # group minima, one group per distinct text
    assert sum(g.n_copies for g in groups) == len(rows)
    assert len(groups) == len({t for _, t in rows})
    by_text = {}
    for i, t in rows:
        by_text.setdefault(t, []).append(i)
    keep = {min(v) for v in by_text.values()}
    assert {g.keep_doc_id for g in groups} == keep


@given(
    st.lists(
        st.tuples(st.integers(1, 12), st.integers(1, 12)),
        max_size=15,
    )
)
@_SETTINGS
def test_components_is_valid_partition(spark, edge_list):
    edges = [(min(a, b), max(a, b), 1.0) for a, b in edge_list if a != b]
    verts = spark.createDataFrame([(i,) for i in range(1, 13)], "doc_id long")
    pairs = spark.createDataFrame(
        edges or [], "id_a long, id_b long, jaccard double"
    )
    got = {r.doc_id: r.component for r in D.dup_components(pairs, verts).collect()}
    assert set(got) == set(range(1, 13))
    # endpoints of every edge share a component, and each component's
    # label is its smallest member (canonical form)
    for a, b, _ in edges:
        assert got[a] == got[b]
    for v, c in got.items():
        assert c <= v
        assert got[c] == c


def test_sequence_packing_invariants(spark):
    from crypto_streaming_lakehouse_spark.registry import REGISTRY
    from crypto_streaming_lakehouse_spark.registry_llm import PACK_BUDGET

    from .conftest import SF_DIR

    rows = REGISTRY["q_sequence_packing"].fn(spark, SF_DIR).collect()
    rows.sort(key=lambda r: r.doc_id)
    # offsets live inside the budget, packs are non-decreasing in stream
    # order, and each doc starts exactly where the previous one ended
    # (contiguous layout, no token lost or duplicated)
    stream_pos = 0
    for r in rows:
        assert 0 <= r.pack_offset < PACK_BUDGET
        assert r.pack_id == stream_pos // PACK_BUDGET
        assert r.pack_offset == stream_pos % PACK_BUDGET
        stream_pos += r.n_tokens


def test_scd2_intervals_partition_history(spark):
    from crypto_streaming_lakehouse_spark.registry import REGISTRY

    from .conftest import SF_DIR

    rows = REGISTRY["q_scd2_versions"].fn(spark, SF_DIR).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, versions in by_user.items():
        versions.sort(key=lambda r: r.valid_from)
        # exactly one open (current) version, and it is the last one
        assert sum(1 for v in versions if v.is_current) == 1
        assert versions[-1].is_current
        # intervals chain without gaps or overlaps; state actually changes
        for a, b in zip(versions, versions[1:]):
            assert a.valid_to == b.valid_from
            assert a.state != b.state


def test_hash_split_is_stable_and_partitions(spark):
    from crypto_streaming_lakehouse_spark.registry import REGISTRY

    from .conftest import SF_DIR

    out1 = {r.doc_id: r.split for r in REGISTRY["q_hash_split"].fn(spark, SF_DIR).collect()}
    out2 = {r.doc_id: r.split for r in REGISTRY["q_hash_split"].fn(spark, SF_DIR).collect()}
    assert out1 == out2  # reproducible assignment
    assert set(out1.values()) <= {"train", "val", "test"}
    n = len(out1)
    n_train = sum(1 for s in out1.values() if s == "train")
    assert 0.6 * n < n_train < 0.95 * n  # roughly the 80% target


_vec64 = st.lists(
    st.floats(
        min_value=-1e3,
        max_value=1e3,
        allow_nan=False,
        width=32,  # fixture embeddings are float32
    ),
    min_size=64,
    max_size=64,
)


@given(_vec64, _vec64)
@_SETTINGS
def test_dot_fold_is_bit_identical_to_python_sequential_sum(spark, a, b):
    """extensions.similarity._dot (the sequential aggregate/zip_with
    fold) must sum in EXACT left-to-right index order — that identity
    with DuckDB's list_reduce is what keeps every ANN/cosine oracle
    hash-green without float canonicalization. Pinned against a plain
    Python sequential sum (CPython floats are IEEE doubles with the
    same rounding), on adversarial float32-valued vectors including the
    0.0-init edge. (Round 10 also proved an unrolled expression-chain
    spelling bit-identical, then rejected it on performance —
    bench_artifacts/r10/ab_dot_unroll.md.)"""
    import struct

    from pyspark.sql import functions as F

    from crypto_streaming_lakehouse_spark.extensions.similarity import _dot

    df = spark.createDataFrame(
        [(a, b)], "a array<double>, b array<double>"
    )
    row = df.select(
        _dot(F.col("a"), F.col("b")).alias("folded")
    ).collect()[0]
    expected = 0.0
    for x, y in zip(a, b):
        expected = expected + x * y
    bits = lambda v: struct.pack(">d", v)  # noqa: E731 — NaN/-0.0 exact
    assert bits(row.folded) == bits(expected)
