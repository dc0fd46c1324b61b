"""Sign-of-zero publication policy (round-15).

The driver's correctness gate hashes BYTES, and IEEE-754 ``-0.0`` and
``+0.0`` differ in the sign bit while comparing equal under ``==`` — the
class that let round-14's ``embedding_gram`` pass every local check and
fail the driver hash on exactly one covariance value. The policy:

- every face publishing a rounded double that can be zero from below
  (covariances, variances, z-scores, deltas, PSI terms, rel/rank errors,
  cosine sims) publishes via ``functions.columns.pub_round`` (round then
  ``+ 0.0`` — an IEEE no-op except for ``-0.0 → +0.0``);
- every oracle twin applies the same ``ROUND(x, n) + 0``.

These tests pin both halves with NEGATIVE inputs crafted to produce a
``-0.0`` pre-normalization, plus the DuckDB idiom itself.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from airflow_retail_etl_spark.functions.columns import pub_round


def _is_pos(v: float) -> bool:
    """True iff v is not negative zero (sign bit clear for zero)."""
    return math.copysign(1.0, v) == 1.0


def _assert_no_negative_zero(df) -> None:
    """Collect and assert no float column carries a -0.0."""
    rows = df.collect()
    float_cols = [
        f.name for f in df.schema.fields if f.dataType.typeName() == "double"
    ]
    for r in rows:
        for c in float_cols:
            v = r[c]
            if v is not None and v == 0.0:
                assert _is_pos(v), f"-0.0 published in column {c!r}: {r}"


def test_pub_round_normalizes_negative_zero(spark):
    """pub_round publishes +0.0 (Spark's F.round already lands on +0.0
    via BigDecimal, which has no signed zero — pub_round guards the
    non-round paths like raw divisions) with HALF_UP and NULL intact."""
    row = spark.range(1).select(
        pub_round(F.lit(-1e-9), 6).alias("pub"),
        (F.lit(-0.0) + F.lit(0.0)).alias("rawzero"),
        pub_round(F.lit(1.25), 1).alias("half"),
        pub_round(F.lit(None).cast("double"), 6).alias("nul"),
    ).collect()[0]
    assert row["pub"] == 0.0 and _is_pos(row["pub"])
    assert row["rawzero"] == 0.0 and _is_pos(row["rawzero"])
    # HALF_UP semantics untouched, NULL propagates
    assert row["half"] == 1.3
    assert row["nul"] is None


def test_duckdb_round_produces_negative_zero_and_plus_zero_fixes_it():
    """THE round-14 driver failure, reduced: DuckDB's ROUND keeps the
    sign of zero (C-style x·10⁶ rounding), Spark's F.round does not
    (BigDecimal has no -0) — so every oracle twin of a rounded
    publication that can be zero from below MUST carry `+ 0`."""
    import math

    bare, neg, pos, nul = duckdb.sql(
        "SELECT ROUND(-1e-9, 6), ROUND(-1e-9, 6) + 0, "
        "ROUND(CAST(-0.0 AS DOUBLE), 6) + 0, "
        "ROUND(CAST(NULL AS DOUBLE), 6) + 0"
    ).fetchone()
    assert bare == 0.0 and math.copysign(1.0, bare) == -1.0  # the defect
    assert neg == 0.0 and _is_pos(neg)
    assert pos == 0.0 and _is_pos(pos)
    assert nul is None


@given(st.floats(-1e-7, 0.0, allow_nan=False))
@settings(max_examples=20, deadline=None)
def test_engines_agree_on_tiny_negative(x):
    """Spark-policy golden (repr->Decimal HALF_UP + normalize) equals
    DuckDB's ROUND + 0 for tiny negatives across the -0.0 boundary."""
    (o,) = duckdb.sql(f"SELECT ROUND(CAST({x!r} AS DOUBLE), 6) + 0").fetchone()
    import decimal

    d = float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
        )
    )
    d = d + 0.0
    assert o == d and _is_pos(o) == _is_pos(d)


def test_embedding_gram_negative_zero_cov(spark):
    """Crafted vectors whose covariance is a tiny negative: the published
    cov must round to +0.0, not -0.0 (the round-14 driver failure)."""
    from airflow_retail_etl_spark.operators.similarity import (
        embedding_gram,
        embedding_gram_matmul,
    )

    # dim0 constant, dim1 varying: cov(0,1) = 0 exactly but the closed
    # form (n*sxy - sx*sj)/n^2 cancels in doubles and lands on ±0.0 or
    # tiny values; dim0 tiny-negative mean exercises the mean path too.
    rows = [
        (1, [-1e-7, 2.0]),
        (2, [-1e-7, -3.0]),
        (3, [-1e-7, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = embedding_gram(df)
    _assert_no_negative_zero(out)
    out2 = embedding_gram_matmul(df)
    _assert_no_negative_zero(out2)


def test_moment_stats_negative_zero_variance(spark):
    """Constant negative-value data: variance must publish +0.0 and the
    mean of tiny negatives must not publish -0.0 (stddev = sqrt(-0.0)
    is -0.0 — the same class)."""
    from airflow_retail_etl_spark.operators import mart_state

    df = spark.createDataFrame(
        [("2024-01-01", -0.0000001)] * 4 + [("2024-01-02", -4.25)] * 3,
        "event_date string, v double",
    ).withColumn("event_date", F.to_date("event_date"))
    cells = mart_state.moment_cells(df, ["event_date"], "v", dp=7)
    stats = mart_state.moment_read(cells, ["event_date"])
    _assert_no_negative_zero(stats.select("mean", "variance", "stddev"))


def test_cosine_sim_negative_zero(spark):
    """A query/corpus pair with cosine ≈ -2.5e-10 must publish sim +0.0."""
    from airflow_retail_etl_spark.operators.similarity import brute_force_topk

    corpus = spark.createDataFrame(
        [(1, [-1e-9, 1.0]), (2, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(10, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = brute_force_topk(corpus, queries, k=2)
    _assert_no_negative_zero(out.select("sim"))
    # the near-orthogonal vector really did land on zero (the case is live)
    sims = {r["neighbor_id"]: r["sim"] for r in out.collect()}
    assert sims[1] == 0.0


def test_rank_err_and_psi_negative_zero(spark):
    """rank_err (rank_frac - q) and PSI terms are subtraction-shaped;
    crafted inputs that cancel must publish +0.0."""
    row = spark.range(1).select(
        pub_round(F.lit(0.25) - F.lit(0.2500000001), 6).alias("rank_err"),
        pub_round(
            (F.lit(0.2) - F.lit(0.2000000001))
            * F.log(F.lit(0.2) / F.lit(0.2000000001)),
            6,
        ).alias("term"),
    ).collect()[0]
    assert row["rank_err"] == 0.0 and _is_pos(row["rank_err"])
    assert row["term"] == 0.0 and _is_pos(row["term"])
