"""Cross-query memoization (extensions.dedup.memo_materialize) is a
correctness-critical mechanism: a stale or cross-contaminated entry would
silently serve wrong data to every consumer in the family. These tests pin
its isolation properties directly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crypto_streaming_lakehouse_spark.extensions.dedup import (
    _MATERIALIZE_MEMO,
    memo_clear,
    memo_materialize,
)

from .conftest import SF_DIR, SF_DIR_MID


def test_same_key_returns_same_materialization(spark):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(10).select(F.col("id").alias("x"))

    a = memo_materialize(spark, "t:same_key", build)
    b = memo_materialize(spark, "t:same_key", build)
    assert calls["n"] == 1
    assert a is b
    assert a.count() == 10


def test_distinct_keys_do_not_collide(spark):
    a = memo_materialize(spark, "t:k1", lambda: spark.range(3))
    b = memo_materialize(spark, "t:k2", lambda: spark.range(7))
    assert (a.count(), b.count()) == (3, 7)


def test_sf_dirs_do_not_cross_contaminate(spark):
    """The graph/dedup helpers key by sf_dir: the same query run against
    two scale factors in one session must see two different edge tables."""
    from crypto_streaming_lakehouse_spark.registry_round3 import (
        copurchase_edges_cut,
    )

    n_small = copurchase_edges_cut(spark, SF_DIR).count()
    n_mid = copurchase_edges_cut(spark, SF_DIR_MID).count()
    assert n_small != n_mid, "sf0.001 and sf0.01 edge tables collided"
    # second call per sf_dir serves the identical cached frame
    assert copurchase_edges_cut(spark, SF_DIR).count() == n_small


def test_memoized_query_results_are_stable_across_calls(spark):
    """Calling a memoized registry query twice must return identical rows
    (the second call reads the checkpointed blocks)."""
    from crypto_streaming_lakehouse_spark.registry import REGISTRY

    fn = REGISTRY["q_dedup_ngram_jaccard"].fn
    first = sorted(tuple(r) for r in fn(spark, SF_DIR).collect())
    second = sorted(tuple(r) for r in fn(spark, SF_DIR).collect())
    assert first == second


def test_clear_forces_rebuild(spark):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(5)

    memo_materialize(spark, "t:rebuild", build)
    memo_clear()
    df = memo_materialize(spark, "t:rebuild", build)
    assert calls["n"] == 2
    assert df.count() == 5


def test_clear_releases_checkpoint_blocks(spark):
    """memo_clear must UNPERSIST the checkpointed blocks, not just drop
    the dict entries — otherwise every bench/scale_probe memo reset leaks
    executor storage for the session's lifetime (ADVICE r04)."""
    sc = spark.sparkContext

    def n_persistent() -> int:
        return sc._jsc.getPersistentRDDs().size()

    before = n_persistent()
    memo_materialize(spark, "t:blocks", lambda: spark.range(1000))
    assert n_persistent() == before + 1
    memo_clear()
    assert n_persistent() == before


def test_memo_key_is_stable_session_uuid(spark):
    """The memo key must not be id(spark): a GC'd address can be reused
    by a new session object and would serve stale blocks. Pin that the
    key embeds the JVM sessionUUID."""
    from crypto_streaming_lakehouse_spark.extensions.dedup import (
        _session_uuid,
    )

    memo_materialize(spark, "t:uuidkey", lambda: spark.range(2))
    (key,) = [k for k in _MATERIALIZE_MEMO if k[2] == "t:uuidkey"]
    assert key[1] == _session_uuid(spark)
    assert key[1] == str(spark._jsparkSession.sessionUUID())


def test_other_application_entries_evicted(spark):
    """Entries recorded under a different applicationId must be dropped on
    the next call — their executor blocks no longer exist."""
    sentinel = object()
    _MATERIALIZE_MEMO[("dead-app-id", "dead-uuid", "t:ghost")] = sentinel
    memo_materialize(spark, "t:evict_probe", lambda: spark.range(1))
    assert ("dead-app-id", "dead-uuid", "t:ghost") not in _MATERIALIZE_MEMO


@pytest.fixture(autouse=True)
def _clean_memo_around_each_test():
    memo_clear()
    yield
    memo_clear()
