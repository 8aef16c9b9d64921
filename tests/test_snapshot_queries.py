"""Registry queries over the snapshot table layer (registry_round8):
the oracle rows prove VALUES; these tests pin the metadata behaviors
the oracle cannot see — manifest file-skipping and version isolation.
"""

from __future__ import annotations

import pathlib

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def snap_scratch(tmp_path, monkeypatch):
    """Isolate the memoized build under a per-test scratch dir."""
    from crypto_streaming_lakehouse_spark import registry_round8 as R8

    monkeypatch.setenv("SPARK_GRAFT_SNAPSHOT_TMP", str(tmp_path))
    monkeypatch.setattr(R8, "_SNAP_MEMO", {})
    return tmp_path


def test_prune_read_skips_other_commits(spark, snap_scratch):
    from crypto_streaming_lakehouse_spark.registry_round8 import (
        orders_snapshot_table,
    )
    from crypto_streaming_lakehouse_spark.sources.snapshots import (
        snapshot_history,
        snapshot_read,
    )

    table = orders_snapshot_table(spark, SF_DIR)
    hist = snapshot_history(table)
    assert [m["version"] for m in hist] == [1, 2, 3]
    total_files = len(hist[-1]["files"])
    pruned = snapshot_read(spark, table, prune=("order_year", 1998, 1998))
    # Only commit 2's files survive the manifest min/max check — the
    # scan never lists the other two commits.
    survivors = pruned.inputFiles()
    assert 0 < len(survivors) < total_files
    assert all("commit-" in f for f in survivors)
    # Superset guarantee: the pruned scan still contains ALL 1998 rows.
    full = snapshot_read(spark, table)
    assert (
        pruned.where("order_year = 1998").count()
        == full.where("order_year = 1998").count()
    )


def test_time_travel_reads_version_one_only(spark, snap_scratch):
    from crypto_streaming_lakehouse_spark.registry import REGISTRY
    from crypto_streaming_lakehouse_spark.registry_round8 import (
        orders_snapshot_table,
    )
    from crypto_streaming_lakehouse_spark.sources.snapshots import (
        snapshot_read,
    )

    table = orders_snapshot_table(spark, SF_DIR)
    v1 = snapshot_read(spark, table, version=1)
    # Version 1 is exactly the first band: nothing after 1997.
    assert v1.where("order_year > 1997").count() == 0
    assert v1.count() > 0
    # The registry query returns only band-1 years.
    out = REGISTRY["q_snapshot_time_travel"].fn(spark, SF_DIR)
    years = {r.order_year for r in out.collect()}
    assert years and all(y <= 1997 for y in years)


def test_build_is_memoized_and_reused_across_sessions(spark, snap_scratch):
    from crypto_streaming_lakehouse_spark import registry_round8 as R8

    t1 = R8.orders_snapshot_table(spark, SF_DIR)
    marker = pathlib.Path(t1) / "_BUILD_OK"
    assert marker.is_file()
    stamp = marker.stat().st_mtime_ns
    # Same session: memo hit, no rebuild.
    assert R8.orders_snapshot_table(spark, SF_DIR) == t1
    # "New session" (cleared memo): the on-disk marker short-circuits
    # the rebuild — the table content is a pure function of the
    # immutable fixture.
    R8._SNAP_MEMO.clear()
    assert R8.orders_snapshot_table(spark, SF_DIR) == t1
    assert marker.stat().st_mtime_ns == stamp
    # A stale/incomplete build (marker mismatch) forces a rebuild.
    marker.write_text("other-band-spec")
    R8._SNAP_MEMO.clear()
    assert R8.orders_snapshot_table(spark, SF_DIR) == t1
    assert marker.read_text() == R8._BANDS_DESC
