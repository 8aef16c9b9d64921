"""Invariants for the round-7 graph additions beyond the oracle hash:
the k-core survivor curve must be monotone (peeling never grows the
graph) and anchored at the true round-0 counts, and Adamic-Adar must
score only non-adjacent 2-hop pairs with the information-theoretic
score/common-neighbor consistency bound.
"""

from __future__ import annotations

import math

from crypto_streaming_lakehouse_spark.registry import REGISTRY
from crypto_streaming_lakehouse_spark.registry_round7 import (
    AA_TOP,
    KCORE_ROUNDS,
)

from .conftest import SF_DIR


def test_kcore_curve_monotone_and_anchored(spark):
    from crypto_streaming_lakehouse_spark.registry_round3 import (
        copurchase_deg_cut,
        copurchase_edges_cut,
    )

    rows = sorted(
        REGISTRY["q_kcore_decompose"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.round,
    )
    assert [r.round for r in rows] == list(range(KCORE_ROUNDS + 1))
    # Round 0 is the untouched graph.
    assert rows[0].n_nodes == copurchase_deg_cut(spark, SF_DIR).count()
    assert rows[0].n_edges == copurchase_edges_cut(spark, SF_DIR).count()
    # Peeling is monotone: each round keeps a subgraph of the previous.
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_nodes <= prev.n_nodes
        assert cur.n_edges <= prev.n_edges
    # Edge counts stay consistent with the surviving node set.
    for r in rows:
        assert r.n_edges <= r.n_nodes * (r.n_nodes - 1) // 2


def test_adamic_adar_pairs_nonadjacent_and_bounded(spark):
    from crypto_streaming_lakehouse_spark.registry_round3 import (
        copurchase_edges_cut,
    )

    rows = REGISTRY["q_adamic_adar"].fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= AA_TOP
    edge_set = {
        (r.u, r.v) for r in copurchase_edges_cut(spark, SF_DIR).collect()
    }
    scores = [r.aa_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        # Candidates are genuinely non-adjacent (link *prediction*).
        key = (min(r.u, r.v), max(r.u, r.v))
        assert key not in edge_set, key
        assert r.n_common >= 1
        # Every common neighbor w has deg(w) >= 2 (it touches u and v),
        # so each term 1/ln(deg w) <= 1/ln 2 — the score is bounded by
        # the common-neighbor count scaled by that maximum.
        assert 0.0 < r.aa_score <= r.n_common / math.log(2.0) + 1e-6


def test_boilerplate_fraction_consistent(spark):
    rows = REGISTRY["q_boilerplate_segments"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_distinct_segments <= r.n_segments
        assert 0 <= r.n_boilerplate <= r.n_segments
        assert abs(r.boiler_frac - r.n_boilerplate / r.n_segments) < 1e-6


def test_acf_bounded(spark):
    from crypto_streaming_lakehouse_spark.registry_round7 import ACF_LAGS

    rows = REGISTRY["q_acf"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_bars > max(ACF_LAGS)
        for k in ACF_LAGS:
            v = getattr(r, f"acf_{k}")
            assert v is None or -1.0 - 1e-6 <= v <= 1.0 + 1e-6
    # The estimator must produce a real value on every series (the
    # fixture's closes are near-white-noise, so magnitudes are small but
    # never NULL), and it must discriminate between lags.
    assert all(getattr(r, f"acf_{k}") is not None for r in rows for k in ACF_LAGS)
    assert any(r.acf_1 != r.acf_2 for r in rows)


def test_chi_square_invariants(spark):
    row = REGISTRY["q_chi_square"].fn(spark, SF_DIR).collect()[0]
    assert row.n > 0
    assert row.dof == (row.n_types - 1) * (row.n_dows - 1)
    assert row.chi2 >= 0.0
    assert 0.0 <= row.cramers_v <= 1.0 + 1e-6
    # Definition consistency: V^2 * n * min(r-1, c-1) == chi2.
    expect = row.cramers_v**2 * row.n * min(row.n_types - 1, row.n_dows - 1)
    assert abs(expect - row.chi2) < max(1e-3 * row.chi2, 1e-3)


def test_skipgram_pairs_counts(spark):
    from crypto_streaming_lakehouse_spark.registry_round7 import (
        SG_TOP,
        SG_WIN,
    )

    rows = REGISTRY["q_skipgram_pairs"].fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= SG_TOP
    counts = [r.n for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r.n >= 1 and r.center and r.context for r in rows)
    # Forward-window generation: a doc of W words emits
    # sum_i min(SG_WIN, W-i) pairs; spot-check total volume on one doc.
    from pyspark.sql import functions as F

    from crypto_streaming_lakehouse_spark.sources.tables import load_table

    doc = (
        load_table(spark, SF_DIR, "documents")
        .select(F.size(F.split(F.trim("text"), r"\s+")).alias("w"))
        .where(F.col("w") >= 2)
        .first()
    )
    w = doc.w
    expect = sum(min(SG_WIN, w - i) for i in range(1, w))
    assert expect == (w - 1) + max(w - 2, 0)  # closed form for win=2


def test_stochastic_osc_bounded(spark):
    rows = REGISTRY["q_stochastic_osc"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r.pct_k is not None:
            assert -1e-4 <= r.pct_k <= 100.0 + 1e-4
        if r.pct_d is not None:
            assert -1e-4 <= r.pct_d <= 100.0 + 1e-4
    # The oscillator must actually oscillate on a price series.
    ks = [r.pct_k for r in rows if r.pct_k is not None]
    assert ks and max(ks) > 60.0 and min(ks) < 40.0


def test_obv_anchored_and_bounded(spark):
    rows = REGISTRY["q_obv"].fn(spark, SF_DIR).collect()
    assert rows
    by_sym = {}
    for r in sorted(rows, key=lambda r: (r.symbol, r.bar_start)):
        by_sym.setdefault(r.symbol, []).append(r.obv)
    for sym, seq in by_sym.items():
        # First bar has no previous close: OBV starts at exactly 0.
        assert seq[0] == 0.0, sym
        # The running total must actually move (a broken sign rule would
        # freeze it at 0), and each step is ±(whole-bar volume) — an
        # integer, since the trade size is 1.0/trade.
        assert max(seq) != min(seq), sym
        for a, b in zip(seq, seq[1:]):
            assert abs((b - a) - round(b - a)) < 1e-6, (sym, a, b)


def test_hurst_rs_monotone_and_exponent_sane(spark):
    from crypto_streaming_lakehouse_spark.registry_round7 import HURST_SIZES

    rows = REGISTRY["q_hurst"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        rs = [getattr(r, f"rs_{s}") for s in HURST_SIZES]
        assert all(v > 0 for v in rs)
        # Rescaled range grows with chunk length for any real series.
        assert rs == sorted(rs), r
        # The exponent is a slope of ln(R/S) vs ln(n): physically in
        # (0, 1); the fixture's near-white-noise closes sit near 0.5.
        assert 0.0 < r.hurst < 1.0, r


def test_degree_powerlaw_invariants(spark):
    from crypto_streaming_lakehouse_spark.registry_round7 import PL_DMIN

    row = REGISTRY["q_degree_powerlaw"].fn(spark, SF_DIR).collect()[0]
    assert 0 < row.n_tail <= row.n_nodes
    assert row.d_max >= PL_DMIN
    assert row.mean_degree > 0
    # Hill alpha > 1 by construction (positive log-ratios).
    assert row.alpha_hill > 1.0


def test_sax_motifs_structure(spark):
    from crypto_streaming_lakehouse_spark.registry_round7 import SAX_WORD

    rows = REGISTRY["q_sax_motifs"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert len(r.top_motif) == SAX_WORD
        assert set(r.top_motif) <= set("abcd")
        assert 1 <= r.top_count <= r.n_words
        assert 1 <= r.n_distinct_motifs <= r.n_words
        # Near-white-noise closes hit many distinct words, not one.
        assert r.n_distinct_motifs > 1


def test_snapshot_diff_conserves_keys(spark):
    from pyspark.sql import functions as F

    from crypto_streaming_lakehouse_spark.registry_round7 import (
        SNAP_DROP_MOD,
    )
    from crypto_streaming_lakehouse_spark.sources.tables import load_table

    row = REGISTRY["q_snapshot_diff"].fn(spark, SF_DIR).collect()[0]
    n = load_table(spark, SF_DIR, "orders").count()
    total = row.n_added + row.n_removed + row.n_changed + row.n_unchanged
    # Every key present in at least one snapshot is classified once;
    # keys dropped from BOTH snapshots are the only absentees.
    assert total <= n
    assert total >= n * (1 - 2.0 / SNAP_DROP_MOD)
    assert row.n_added > 0 and row.n_removed > 0 and row.n_changed > 0
    # The additive bump makes the delta exactly 1000 x changed rows.
    assert abs(row.changed_price_delta - 1000.0 * row.n_changed) < 1.0


def test_lead_lag_xcorr_bounded_and_symmetric_lag0(spark):
    from crypto_streaming_lakehouse_spark.registry_round7 import XC_LAGS

    row = REGISTRY["q_lead_lag_xcorr"].fn(spark, SF_DIR).collect()[0]
    assert row.n > max(abs(k) for k in XC_LAGS)
    vals = {}
    for k in XC_LAGS:
        v = getattr(row, f"xcorr_{'m' if k < 0 else 'p'}{abs(k)}")
        assert v is None or -1.0 - 1e-6 <= v <= 1.0 + 1e-6
        vals[k] = v
    # Lag 0 must be computed on the full aligned sample (no NULL shift).
    assert vals[0] is not None
    # Lags must be distinguishable — a shift bug would collapse them.
    assert len({round(v, 5) for v in vals.values() if v is not None}) > 1


def test_volume_profile_invariants(spark):
    from crypto_streaming_lakehouse_spark.registry_round7 import VP_BUCKETS

    rows = REGISTRY["q_volume_profile"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_buckets <= VP_BUCKETS
        assert 0 <= r.poc_bucket < VP_BUCKETS
        assert r.poc_volume > 0
        # The POC bucket is inside the value area, so the fraction is
        # at least poc/total and at most 1.
        assert 0.0 < r.value_area_frac <= 1.0 + 1e-6


def test_mann_whitney_bounds(spark):
    row = REGISTRY["q_mann_whitney"].fn(spark, SF_DIR).collect()[0]
    assert row.n_a > 0 and row.n_b > 0
    # 0 <= U <= n_a*n_b, and 2U parity makes it integer-exact.
    assert 0 <= row.u2_exact <= 2 * row.n_a * row.n_b
    assert math.isfinite(row.z)
