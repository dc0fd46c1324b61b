from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from airflow_retail_etl_spark.functions import vectors as V


@pytest.fixture(scope="module")
def vec_df(spark):
    rows = [
        (1, [3.0, 4.0]),
        (2, [0.0, 0.0, 0.0]),
        (3, [-1.5, 0.5, 2.5]),
        (4, [1e-8, -1e-8]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "e"])


def _one(vec_df, col):
    return {r.vec_id: r.v for r in vec_df.select("vec_id", col.alias("v")).collect()}


def test_l2_norm_and_normalize(vec_df):
    norms = _one(vec_df, V.l2_norm(F.col("e")))
    assert norms[1] == pytest.approx(5.0)
    assert norms[2] == 0.0
    unit = _one(vec_df, V.l2_normalize(F.col("e")))
    assert unit[1] == pytest.approx([0.6, 0.8])
    assert unit[2] == [0.0, 0.0, 0.0]  # zero vector stays zero
    assert math.isclose(sum(x * x for x in unit[3]), 1.0)


def test_quantize_int8_symmetric(vec_df):
    q = _one(vec_df, V.quantize_int8(F.col("e")))
    assert q[1] == [95, 127]          # round(3/4·127)=95
    assert q[2] == [0, 0, 0]
    assert q[3] == [-76, 25, 127]     # round(-1.5/2.5·127) = -76
    scales = _one(vec_df, V.quant_scale(F.col("e")))
    assert scales[1] == pytest.approx(4.0 / 127.0)


def test_dequant_error_bounded_by_half_step(vec_df):
    errs = _one(vec_df, V.dequant_error(F.col("e")))
    scales = _one(vec_df, V.quant_scale(F.col("e")))
    for vid, err in errs.items():
        assert err <= scales[vid] / 2 + 1e-12, vid
    assert errs[2] == 0.0


def test_round_half_semantics_match_duckdb(spark):
    # the quantizer's only rounding step: both engines away-from-zero
    vals = [0.5, 1.5, 2.5, -0.5, -1.5, 126.5, -126.5]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    got = [r.r for r in df.select(F.round(F.col("x"), 0).alias("r")).orderBy("x").collect()]
    duck = [
        r[0]
        for r in duckdb.sql(
            "SELECT round(x) FROM (SELECT unnest(?::DOUBLE[]) AS x) ORDER BY x",
            params=[vals],
        ).fetchall()
    ]
    assert got == duck
