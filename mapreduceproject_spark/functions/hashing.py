"""Portable deterministic hashing, identical in Spark and DuckDB.

The reference shuffles with FNV32a over Go strings
(/root/reference/src/juice_helpers.go:286-293) and places replicas with an
FNV hash ring (src/master_helpers.go:103-139).  Spark's builtin hashes
(murmur3 ``hash``, ``xxhash64``) don't match DuckDB's ``hash``, so for
operators whose *results* depend on hash values (minhash/simhash/LSH) we
derive a 60-bit integer from ``md5`` — both engines produce bit-identical
md5 hex, and 15 hex chars fit a signed 64-bit integer with headroom for the
universal-hash arithmetic below (a*h+b stays < 2^62, no ANSI overflow).

Spark:  conv(substring(md5(s),1,15),16,10)::long
DuckDB: horner sum over the same 15 hex chars (inlined by ``duck_hash60``).
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31 - 1: universal-hash modulus for minhash permutations.
MERSENNE_P = 2_147_483_647


def hash60(col: Column) -> Column:
    """60-bit non-negative integer hash of a string column (md5-derived)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def duck_hash60(expr: str) -> str:
    """DuckDB SQL computing the same value as :func:`hash60`.

    The outer CAST matters: list_aggregate('sum') over BIGINT yields
    HUGEINT, which pandas converts to float64 (precision loss past 2^53)
    — so any oracle surfacing the hash directly would hash-mismatch.
    """
    return (
        "CAST(list_aggregate(list_transform(range(1,16), i -> "
        f"(strpos('0123456789abcdef', substr(substr(md5({expr}),1,15), CAST(i AS INT), 1)) - 1)::BIGINT"
        " << ((15-i)*4)::INT), 'sum') AS BIGINT)"
    )


def minhash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_i(x) = (a*x + b) mod P.

    Inlined as literals into BOTH the Spark plan and the oracle SQL, so the
    two engines run the exact same permutation family.
    """
    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE_P), rng.randrange(0, MERSENNE_P))
        for _ in range(num_hashes)
    ]


def minhash_perm(h60: Column, a: int, b: int) -> Column:
    """One universal-hash permutation applied to a hash60 column."""
    return (h60 % MERSENNE_P) * F.lit(a) % MERSENNE_P + F.lit(b)


def duck_minhash_perm(h60_expr: str, a: int, b: int) -> str:
    return f"((({h60_expr}) % {MERSENNE_P}) * {a} % {MERSENNE_P} + {b})"
