"""Deterministic, engine-portable hashing.

MinHash / SimHash / fingerprint operators need hash functions that (a) are
stable across runs and partitionings, and (b) can be reproduced bit-for-bit
by the DuckDB correctness oracle. Spark's ``xxhash64``/``hash`` have no
DuckDB twin, so we derive a 60-bit integer from ``md5`` (both engines ship
identical md5): take the first 15 hex chars -> unsigned int < 2**60.

Universal-hash family for MinHash: h_i(x) = (a_i * x + b_i) mod P, with P a
Mersenne prime and (a_i, b_i) from a seeded generator — same constants are
emitted into the oracle SQL by ``plans/oracles.py``.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = (1 << 61) - 1


def md5_int60(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative bigint (portable to DuckDB)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Seeded (a, b) pairs for the universal hash family."""
    rng = random.Random(seed)
    return [(rng.randrange(1, MERSENNE_P), rng.randrange(0, MERSENNE_P)) for _ in range(num_hashes)]


def universal_hash(x: Column, a: int, b: int) -> Column:
    """(a*x + b) mod P — via pmod to keep results non-negative.

    Products of two ~60-bit ints overflow bigint, so we reduce ``x`` first to
    32 bits (shift right 28), keeping a*x within 92 bits... which still
    overflows. Instead both engines compute in DOUBLE-safe space: reduce x to
    30 bits and a to 30 bits so a*x < 2**60 < bigint max.
    """
    a30 = (a & ((1 << 30) - 1)) | 1  # keep multiplier non-zero
    b_ = b & ((1 << 30) - 1)
    x30 = F.pmod(x, F.lit(1 << 30))
    return F.pmod(a30 * x30 + F.lit(b_), F.lit(MERSENNE_P))
