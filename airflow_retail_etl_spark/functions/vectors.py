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


def quantize_int8(vec: Column) -> Column:
    """Symmetric int8 quantization: round(127·x / max|x|) per element.

    The zero vector quantizes to zeros (guard against 0/0). Pair with
    :func:`quant_scale` to reconstruct.
    """
    m = max_abs(vec)
    return F.transform(
        vec,
        lambda x: F.when(m == 0.0, F.lit(0))
        .otherwise(F.round(x.cast("double") * 127.0 / m, 0))
        .cast("tinyint"),
    )


def quant_scale(vec: Column) -> Column:
    """Dequantization scale: x ≈ q · scale."""
    return max_abs(vec) / 127.0


def dequant_error(vec: Column) -> Column:
    """Max absolute reconstruction error of int8 quantization (DOUBLE).

    One fused expression (quantize → dequantize → compare) so the oracle
    can grade the whole round trip.
    """
    m = max_abs(vec)
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
