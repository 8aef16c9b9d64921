"""Skew-mitigation operators: salted joins for pathological key skew.

AQE's skew-join splitting (enabled in the session factory) handles most
skew at runtime; explicit salting remains the tool when one key dominates
so badly that even split partitions overwhelm an executor, or when the
skewed side feeds a non-AQE-eligible plan (e.g. a streaming join). The
transform is semantics-preserving: results equal the plain join exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    *,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` is skewed on ``on``: big rows get a
    deterministic per-row salt (hash of the whole row — stable across task
    retries, unlike rand()), ``small`` is replicated once per salt, and the
    join key becomes (on + salt) so one hot key spreads over n_salts
    partitions. Replication costs |small| × n_salts rows — the usual
    trade: small side must stay broadcast-or-near-broadcast sized.
    """
    big_s = big.withColumn(
        SALT, F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(SALT)
    small_s = small.select("*", salts)
    return big_s.join(small_s, [*on, SALT], how).drop(SALT)
