"""Portable deterministic hashing for dedup/similarity operators.

Everything here must be computable bit-identically by the DuckDB oracle, so
we avoid engine-specific hashes (Spark murmur3 vs DuckDB's hash()) and build
on md5 hex (identical everywhere) parsed to an unsigned 32-bit int:

  Spark:  conv(substring(md5(s), 1, 8), 16, 10)::long
  DuckDB: CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)

All expressions are native Column ops (JVM-side, codegen'd) — no Python in
the hot path, so they scale like any built-in function.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD_P = 1_000_000_007  # rolling-hash modulus
MINHASH_P = 2_147_483_647  # 2^31-1; a*h+b < 2^63 since h < 2^32, a < P


def affine_family(n: int, p: int = MINHASH_P) -> list[tuple[int, int]]:
    """n deterministic universal-hash coefficient pairs (a_i, b_i).

    h_i(x) = (a_i * md5_int32(x) + b_i) mod p gives n independent hashes
    from ONE md5 per value — 16× cheaper than hashing per seed, and both
    engines derive identical coefficients from the md5 of the index.
    """
    import hashlib

    def _h(tag: str) -> int:
        return int(hashlib.md5(tag.encode()).hexdigest()[:8], 16)

    return [((_h(f"a{i}") % (p - 1)) + 1, _h(f"b{i}") % p) for i in range(n)]


def md5_int32(c: Column) -> Column:
    """Unsigned 32-bit integer hash of a string column via md5 prefix."""
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, 8), 16, 10).cast("long")


def md5_int32_sql(expr: str) -> str:
    """DuckDB twin of md5_int32."""
    return f"CAST('0x' || substr(md5({expr}), 1, 8) AS BIGINT)"


def md5_int60(c: Column) -> Column:
    """Unsigned 60-bit integer hash via a 15-hex-char md5 prefix.

    60 bits is the widest md5 prefix that stays positive in a signed
    64-bit BIGINT on BOTH engines (16 chars would set the sign bit), which
    keeps shifts/masks portable. Used by simhash, where signature width
    drives banding selectivity."""
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, 15), 16, 10).cast(
        "long"
    )


def md5_int60_sql(expr: str) -> str:
    """DuckDB twin of md5_int60."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def rolling_hash(text: Column) -> Column:
    """Polynomial rolling hash of a string: fold (acc*31 + code(ch)) mod P.

    Sequential fold — Spark's aggregate() and DuckDB's list_reduce produce
    identical values because f(0, x) = x makes the no-init reduce equal to
    the init-0 fold.
    """
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % MOD_P,
    )


def rolling_hash_sql(expr: str) -> str:
    return (
        f"list_reduce(list_transform(string_split({expr}, ''), c -> CAST(ascii(c) AS BIGINT)),"
        f" (acc, c) -> (acc * 31 + c) % {MOD_P})"
    )
