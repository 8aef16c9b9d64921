"""Guard the per-round driver-verification rotation (VERDICT r04 item 5).

The driver caps correctness checks at the first 50 ``queries()`` names,
so ``__spark_entry__._ROUND_HEAD`` must (a) be exactly 50 names, (b) all
exist in the registry with oracles, and (c) spend its slots only on
names that have never been driver-GREEN — except deliberate, documented
re-includes of previously-red entries. The ledger of driver-green names
per round lives in ``tests/driver_verified_ledger.json`` (regenerated
from the CORRECTNESS_r*.json artifacts each round).
"""

from __future__ import annotations

import json
import pathlib

LEDGER = pathlib.Path(__file__).parent / "driver_verified_ledger.json"

# Names the current head deliberately repeats: red/errored in a prior
# driver artifact, since fixed, re-included to earn a green row.
ALLOWED_REINCLUDES = {
    "q_decimal_exact",  # r04 hash-red (driver DECIMAL canonicalization)
    "q_approx_count_distinct",  # r01 'no_oracle' (pre-redesign)
    "q_percentile_approx",  # r01 list-column hash error (pre-redesign)
    "q_hll_sketch_union",  # r06 hash-red (HUGEINT sum in oracle), fixed r07
}


def _load_head():
    import __spark_entry__ as e

    return e._ROUND_HEAD


def _driver_green() -> set[str]:
    ledger = json.loads(LEDGER.read_text())
    out: set[str] = set()
    for names in ledger.values():
        out.update(names)
    return out


def test_round_head_fills_the_50_cap():
    """The head must use every driver slot available: exactly 50 names,
    or — once the never-green pool (plus documented re-includes) is
    smaller than the cap — exactly that pool, so no slot is wasted and
    none is left idle while unverified names remain."""
    from crypto_streaming_lakehouse_spark.registry import REGISTRY

    head = _load_head()
    assert len(set(head)) == len(head), "duplicate names in _ROUND_HEAD"
    green = _driver_green()
    pool = {
        n
        for n, d in REGISTRY.items()
        if d.sql is not None and n not in green
    }
    if len(pool) >= 50:
        assert len(head) == 50, f"head has {len(head)} names, cap is 50"
    else:
        missing = pool - set(head)
        assert not missing, (
            f"never-green names left out of a non-full head: {missing}"
        )


def test_round_head_names_exist_with_oracles():
    from crypto_streaming_lakehouse_spark.registry import REGISTRY

    head = _load_head()
    missing = [n for n in head if n not in REGISTRY]
    assert not missing, f"head names not in registry: {missing}"
    # A head slot without an oracle would burn a driver row on a weaker
    # rows-only check — every rotated-in name must be hash-checkable.
    no_oracle = [n for n in head if REGISTRY[n].sql is None]
    assert not no_oracle, f"head names without oracle SQL: {no_oracle}"


def test_round_head_spends_slots_on_unverified_names():
    head = _load_head()
    green = _driver_green()
    wasted = [n for n in head if n in green and n not in ALLOWED_REINCLUDES]
    assert not wasted, (
        "head repeats already-driver-green names (wasted rotation slots): "
        f"{wasted}"
    )


def test_queries_dict_leads_with_round_head():
    import __spark_entry__ as e

    head = _load_head()
    ordered = list(e.queries().keys())
    assert tuple(ordered[: len(head)]) == head, (
        "queries() dict order does not lead with _ROUND_HEAD — the "
        "driver's 50-cap would verify the wrong set"
    )
