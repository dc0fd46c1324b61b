"""Cross-engine deterministic hashing (Spark ⇄ DuckDB).

The scale-path sketches (MinHash, SimHash) hash with ``xxhash64`` — fast,
JVM-side, but with no DuckDB equivalent, which made their queries
"rows-only" in the correctness gate. This module provides an alternative
hash family both engines can compute bit-identically, so the SAME sketch
pipeline (signatures → banding → candidate join → verify) can be replicated
in the DuckDB oracle and hash-checked end to end:

- 64-bit token hash: the first 16 hex chars of md5 interpreted as an
  unsigned big-endian integer (Spark ``conv(substr(md5(x),1,16),16,10)``,
  DuckDB ``('0x' || substr(md5(x),1,16))::UBIGINT``), then wrapped to a
  signed i64. Verified bit-equal across engines (tests/test_xhash.py).
- K derived hashes from one md5 via Kirsch–Mitzenmacher double hashing:
  ``h_i = (h1 + i·h2) mod 2^64`` computed in DECIMAL/HUGEINT — the standard
  construction (one md5 per element, any number of hash functions), exact
  in both engines because the arithmetic never leaves integers.

Production paths keep xxhash64 (md5 costs ~3-5× more per token); the md5
family is for oracle-graded query forms and any deployment that needs
engine-portable sketches.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_I64 = 9223372036854775807
TWO64 = 18446744073709551616

def _max_i64_dec() -> Column:
    # built lazily: Column construction needs an active SparkContext
    return F.lit(str(MAX_I64)).cast("decimal(20,0)")


def _two64_dec() -> Column:
    return F.lit(str(TWO64)).cast("decimal(21,0)")


def md5_u64(col: Column, half: int = 1) -> Column:
    """Unsigned 64-bit integer (as DECIMAL(20,0)) from one md5 half.

    ``half=1`` → hex chars 1..16, ``half=2`` → 17..32, both big-endian.
    DECIMAL because Spark has no unsigned 64-bit type; all downstream
    arithmetic (Kirsch–Mitzenmacher, minima) stays in DECIMAL.
    """
    off = 1 if half == 1 else 17
    return F.conv(F.substring(F.md5(col), off, 16), 16, 10).cast(
        "decimal(20,0)"
    )


def md5_long(col: Column) -> Column:
    """Signed i64 from the first md5 half (two's-complement wrap).

    Use when downstream needs bitwise ops (simhash bit votes) — Spark's
    bitwiseAND/shiftright want BIGINT, not DECIMAL.
    """
    u = md5_u64(col, 1)
    return (
        F.when(u > _max_i64_dec(), u - _two64_dec())
        .otherwise(u)
        .cast("bigint")
    )


def km_hash(u1: Column, u2: Column, i: int) -> Column:
    """i-th Kirsch–Mitzenmacher hash: (h1 + i·h2) mod 2^64, DECIMAL-exact."""
    return (u1 + F.lit(i) * u2) % _two64_dec()


# ---------------------------------------------------------------------------
# DuckDB fragment generators (the oracle side of the same functions)
# ---------------------------------------------------------------------------


def duck_md5_u64(expr: str, half: int = 1) -> str:
    """HUGEINT-typed unsigned 64-bit integer from one md5 half of ``expr``."""
    off = 1 if half == 1 else 17
    return f"CAST(('0x' || substr(md5({expr}),{off},16))::UBIGINT AS HUGEINT)"


def duck_md5_long(expr: str) -> str:
    """Signed i64 (BIGINT) matching :func:`md5_long` bit-for-bit."""
    u = f"('0x' || substr(md5({expr}),1,16))::UBIGINT"
    return (
        f"CAST(CAST({u} AS HUGEINT) - CASE WHEN {u} > {MAX_I64} "
        f"THEN CAST({TWO64} AS HUGEINT) ELSE 0 END AS BIGINT)"
    )


def duck_km_hash(u1: str, u2: str, i: str) -> str:
    """DuckDB twin of :func:`km_hash`; ``i`` is an SQL expression."""
    return f"(({u1}) + ({i}) * ({u2})) % CAST({TWO64} AS HUGEINT)"
