"""Cross-engine hash parity: Spark expressions vs their DuckDB twins.

These pin the bit-exactness that the oracle-graded LSH/SimHash query forms
depend on (functions.xhash): if either engine's md5 extraction, decimal
arithmetic, or shift semantics drifted, the correctness gate would go red —
these tests localize the break.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from airflow_retail_etl_spark.functions import xhash

TOKENS = [
    "the", "quick", "brown", "fox", "", "a", "ñandú", "123", "x" * 100,
    "word-with-punct!", "ZZZZ", "mixedCase", "\t", "0", "~",
]


@pytest.fixture(scope="module")
def token_df(spark):
    return spark.createDataFrame([(t,) for t in TOKENS], ["t"])


def _duck(sql: str) -> dict:
    con = duckdb.connect()
    con.register("toks", pd.DataFrame({"t": TOKENS}))
    return dict(con.sql(sql).fetchall())


def test_md5_long_matches_duckdb(token_df):
    spark_vals = {
        r["t"]: r["h"]
        for r in token_df.select("t", xhash.md5_long(F.col("t")).alias("h")).collect()
    }
    duck_vals = _duck(
        f"SELECT t, {xhash.duck_md5_long('t')} AS h FROM toks"
    )
    assert spark_vals == duck_vals


def test_md5_u64_halves_match_duckdb(token_df):
    for half in (1, 2):
        spark_vals = {
            r["t"]: int(r["u"])
            for r in token_df.select(
                "t", xhash.md5_u64(F.col("t"), half).alias("u")
            ).collect()
        }
        duck_vals = {
            t: int(u)
            for t, u in _duck(
                f"SELECT t, {xhash.duck_md5_u64('t', half)} AS u FROM toks"
            ).items()
        }
        assert spark_vals == duck_vals


def test_km_hash_matches_duckdb(token_df):
    i = 37  # arbitrary derived-hash index
    sdf = token_df.select(
        "t",
        xhash.km_hash(
            xhash.md5_u64(F.col("t"), 1), xhash.md5_u64(F.col("t"), 2), i
        ).alias("h"),
    )
    spark_vals = {r["t"]: int(r["h"]) for r in sdf.collect()}
    u1 = xhash.duck_md5_u64("t", 1)
    u2 = xhash.duck_md5_u64("t", 2)
    duck_vals = {
        t: int(h)
        for t, h in _duck(
            f"SELECT t, {xhash.duck_km_hash(u1, u2, str(i))} AS h FROM toks"
        ).items()
    }
    assert spark_vals == duck_vals


def test_projection_sign_margin_on_testdata():
    """The ann_lsh oracle inlines the hyperplanes and recomputes dot-product
    SIGNS in DuckDB. Signs agree across engines iff no projection sits
    within float-summation noise (~1e-12) of zero — assert a wide margin on
    the real embeddings for both plane configurations."""
    import numpy as np

    from airflow_retail_etl_spark.operators.similarity import _plane_matrix

    con = duckdb.connect()
    emb = con.sql(
        "SELECT CAST(embedding AS DOUBLE[]) e "
        "FROM '/root/testdata/sf0.001/embeddings.parquet'"
    ).df()
    mat = np.vstack(emb["e"].to_numpy()).astype(np.float64)
    for tables, planes in ((16, 4), (12, 8)):
        proj = mat @ _plane_matrix(tables, planes, 64)
        assert np.abs(proj).min() > 1e-9


def test_long_domain_km_matches_decimal(token_df):
    """The LONG-domain hi/lo KM family (round 15) is bit-identical to the
    DECIMAL(20,0) computation at every exposed grain: mod-m positions,
    biased order image, and the decimal publication round-trip — across
    the full i range the registry uses (0..62) and several widths."""
    u1 = xhash.md5_u64(F.col("t"), 1)
    u2 = xhash.md5_u64(F.col("t"), 2)
    h1, l1 = xhash.md5_u64_hilo(F.col("t"), 1)
    h2, l2 = xhash.md5_u64_hilo(F.col("t"), 2)
    cols = []
    for i in (0, 1, 7, 62):
        for m in (2, 1024, 2048, 99901, 2**31):
            cols.append(
                (
                    (xhash.km_hash(u1, u2, i) % F.lit(m)).cast("long")
                    == xhash.km_hash_mod(h1, l1, h2, l2, i, m)
                ).alias(f"mod_{i}_{m}")
            )
        cols.append(
            (
                xhash.biased_to_u64_dec(
                    xhash.km_hash_biased(h1, l1, h2, l2, i)
                )
                == xhash.km_hash(u1, u2, i).cast("decimal(21,0)")
            ).alias(f"rt_{i}")
        )
    rows = token_df.select(*cols).collect()
    for row in rows:
        assert all(row), row.asDict()


def test_biased_order_matches_unsigned(token_df):
    """min over km_hash_biased picks the same element as min over the
    DECIMAL u64 values (order preservation across the 2^63 boundary)."""
    u1 = xhash.md5_u64(F.col("t"), 1)
    u2 = xhash.md5_u64(F.col("t"), 2)
    h1, l1 = xhash.md5_u64_hilo(F.col("t"), 1)
    h2, l2 = xhash.md5_u64_hilo(F.col("t"), 2)
    for i in (0, 3, 62):
        agg = token_df.agg(
            F.min(xhash.km_hash(u1, u2, i).cast("decimal(21,0)")).alias(
                "dec_min"
            ),
            xhash.biased_to_u64_dec(
                F.min(xhash.km_hash_biased(h1, l1, h2, l2, i))
            ).alias("long_min"),
        ).first()
        assert agg["dec_min"] == agg["long_min"]


def test_u64_double_from_halves_matches_decimal_cast(token_df):
    """The hi/lo double build (round 16: hi·2^32 exact, one rounding on
    the + lo add) equals DECIMAL(20,0)→double — both are
    round-to-nearest of the same integer. Byte-exact equality (==
    on doubles is bitwise here; no NaNs possible)."""
    u = xhash.md5_u64(F.col("t"))
    hi, lo = xhash.md5_u64_hilo(F.col("t"))
    built = hi.cast("double") * F.lit(4294967296.0) + lo.cast("double")
    rows = token_df.select(
        u.cast("double").alias("dec_dbl"), built.alias("long_dbl")
    ).collect()
    import struct

    for r in rows:
        assert struct.pack("<d", r.dec_dbl) == struct.pack(
            "<d", r.long_dbl
        ), (r.dec_dbl, r.long_dbl)


def test_md5_u64_mod_matches_decimal(token_df):
    cols = []
    for m in (3, 9999, 99901, _TRIM := 64, 2**31):
        for half in (1, 2):
            cols.append(
                (
                    (xhash.md5_u64(F.col("t"), half) % F.lit(m)).cast("long")
                    == xhash.md5_u64_mod(F.col("t"), m, half)
                ).alias(f"m_{m}_{half}")
            )
    for row in token_df.select(*cols).collect():
        assert all(row), row.asDict()
