"""Guard against stale full-correctness artifacts (ADVICE r06, medium).

Round 6 shipped two registry additions (q_burstiness, q_item_cf) after
the last ``scripts/full_correctness.py`` run, so the 246-query artifact
silently under-covered the 248-query registry — and the one real oracle
divergence (q_burstiness epoch truncation) sailed through unverified.
This test makes the artifact's query set == the registry's a CI
invariant: add a query, re-run the sweep, or the suite goes red.
"""

from __future__ import annotations

import json
import pathlib

ARTIFACT = (
    pathlib.Path(__file__).parent.parent / "CORRECTNESS_FULL_LOCAL.json"
)


def test_full_correctness_artifact_covers_entire_registry():
    from crypto_streaming_lakehouse_spark.registry import REGISTRY

    data = json.loads(ARTIFACT.read_text())
    artifact_names = {k for k in data if not k.startswith("_")}
    registry_names = set(REGISTRY)
    missing = registry_names - artifact_names
    extra = artifact_names - registry_names
    assert not missing, (
        "registry queries never swept by scripts/full_correctness.py "
        f"(re-run it): {sorted(missing)}"
    )
    assert not extra, (
        f"artifact names no longer in the registry: {sorted(extra)}"
    )


def test_full_correctness_artifact_is_all_green():
    data = json.loads(ARTIFACT.read_text())
    bad = {
        k: v
        for k, v in data.items()
        if not k.startswith("_")
        and not (v.get("hash_match") or v.get("err") == "no_oracle")
    }
    assert not bad, f"non-green entries in the full sweep: {sorted(bad)}"


def test_full_correctness_artifact_pins_oracle_sql(oracle_sha=None):
    """A green row attests a SPECIFIC oracle: if the registry's oracle
    SQL changed after the sweep, the row is stale evidence — re-run the
    sweep (VERDICT r07 next-round item 6)."""
    import hashlib

    from crypto_streaming_lakehouse_spark.registry import REGISTRY

    data = json.loads(ARTIFACT.read_text())
    stale = []
    for name, d in REGISTRY.items():
        rec = data.get(name)
        if rec is None:
            continue  # set-equality test reports missing names
        want = (
            hashlib.sha256(d.sql.encode()).hexdigest()[:16]
            if d.sql is not None
            else None
        )
        if rec.get("oracle_sha", "absent") != want:
            stale.append(name)
    assert not stale, (
        "oracle SQL changed since the last full sweep (or the artifact "
        f"predates oracle_sha) — re-run scripts/full_correctness.py: "
        f"{sorted(stale)[:10]}{'...' if len(stale) > 10 else ''}"
    )
