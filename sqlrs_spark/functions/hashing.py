"""Cross-engine deterministic hashing fragments.

The driver's correctness gate diffs Spark results against DuckDB, so every
hash used in dedup/fingerprint operators must produce identical values in
both engines. md5 is the common primitive: both engines agree on its hex
output, and a 15-hex-digit prefix fits in a signed 64-bit int.

Validated bit-identical across Spark 4.1 / DuckDB 1.0 (see
tests/test_pipeline.py): md5→int, ' '-tokenization, k-shingles, the
(a*h+b) mod p permutation family, shift/xor/bit_count, and fold-based
polynomial hashing.
"""

from __future__ import annotations

# 31-bit Mersenne prime — keeps a*h+b inside 63 bits for a,h < 2^31
P31 = 2_147_483_647

# Fixed MinHash permutation parameters (a odd, b arbitrary, both < P31).
# Generated once from a fixed seed and frozen here so the Spark and DuckDB
# pipelines share them as literals.
MINHASH_PERMS: list[tuple[int, int]] = [
    (1000003, 12345),
    (999983, 54321),
    (826669, 98765),
    (777767, 13579),
    (611953, 24680),
    (523717, 86420),
    (479001, 97531),
    (393919, 11111),
    (318211, 22222),
    (271829, 33333),
    (199999, 44444),
    (141650963, 55555),
]


def md5int_spark(e: str) -> str:
    """60-bit integer from md5 hex prefix — Spark SQL dialect."""
    return f"cast(conv(substr(md5({e}),1,15),16,10) as bigint)"


def md5int_duck(e: str) -> str:
    """Same value — DuckDB dialect."""
    return f"(('0x'||substr(md5({e}),1,15))::BIGINT)"


def h31_spark(e: str) -> str:
    return f"pmod({md5int_spark(e)}, {P31})"


def h31_duck(e: str) -> str:
    return f"({md5int_duck(e)} % {P31})"
