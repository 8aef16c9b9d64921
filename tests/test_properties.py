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
