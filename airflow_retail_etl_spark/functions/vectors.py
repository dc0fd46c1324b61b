"""Embedding-column vector transforms (normalize / quantize / stats).

Embedding tables at 100 TB are dominated by vector bytes, so the two
transforms every serving/index pipeline runs — L2 normalization (so
cosine becomes a dot product) and int8 quantization (4× smaller, SIMD
dot kernels downstream) — must be pure projections: every function here
is built-in HOF arithmetic (transform / aggregate), zero shuffles, and
deterministic, so the DuckDB oracle replays it bit-for-bit with
list_transform / list_aggregate.

Quantization is per-vector symmetric: q_i = round(127·x_i / max|x|),
scale = max|x|/127 stored alongside for dequantization. round() is
half-away-from-zero in BOTH engines (Spark HALF_UP on doubles, DuckDB
round()) — pinned by tests/test_vectors.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def l2_norm(vec: Column) -> Column:
    """Euclidean norm of an array<numeric> column (DOUBLE)."""
    return F.sqrt(
        F.aggregate(
            vec,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def l2_normalize(vec: Column) -> Column:
    """Unit-length copy of ``vec``; an all-zero vector stays all-zero."""
    n = l2_norm(vec)
    return F.transform(
        vec,
        lambda x: F.when(n == 0.0, F.lit(0.0)).otherwise(
            x.cast("double") / n
        ),
    )


def max_abs(vec: Column) -> Column:
    """max|x_i| over the vector (DOUBLE; 0 for the zero vector)."""
    return F.aggregate(
        vec,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )


def quantize_int8_from(vec: Column, m: Column) -> Column:
    """Symmetric int8 quantization given an ALREADY-MATERIALIZED max|x|.

    ``m`` must be a plain column reference: it is read once per element
    inside the lambda, and Catalyst re-inlines nested expressions per
    element — passing ``max_abs(vec)`` directly turns the O(d) transform
    into an O(d²) fold-per-element (the HOF re-evaluation trap; see
    dedup._with_shingles). Materialize behind an exchange first.
    The zero vector quantizes to zeros (guard against 0/0).
    """
    return F.transform(
        vec,
        lambda x: F.when(m == 0.0, F.lit(0))
        .otherwise(F.round(x.cast("double") * 127.0 / m, 0))
        .cast("tinyint"),
    )


def quantize_int8(vec: Column) -> Column:
    """Convenience form inlining max|x| — row-at-a-time/test use only;
    bulk paths use quantize_int8_from on a materialized max column."""
    return quantize_int8_from(vec, max_abs(vec))


def quant_scale(vec: Column) -> Column:
    """Dequantization scale: x ≈ q · scale."""
    return max_abs(vec) / 127.0


def dequant_error_from(vec: Column, m: Column) -> Column:
    """Max abs reconstruction error given a MATERIALIZED max|x| column
    (same re-evaluation caveat as quantize_int8_from)."""
    s = m / 127.0
    return F.aggregate(
        F.transform(
            vec,
            lambda x: F.abs(
                x.cast("double")
                - F.when(m == 0.0, F.lit(0.0)).otherwise(
                    F.round(x.cast("double") * 127.0 / m, 0) * s
                )
            ),
        ),
        F.lit(0.0),
        lambda acc, e: F.greatest(acc, e),
    )


def dequant_error(vec: Column) -> Column:
    """Convenience form (inlined max) — see dequant_error_from."""
    return dequant_error_from(vec, max_abs(vec))
