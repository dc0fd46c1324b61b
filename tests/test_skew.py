from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_retail_etl_spark.operators.skew import salted_agg, salted_join
from airflow_retail_etl_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_salted_agg_matches_plain(events):
    plain = {
        r["user_id"]: (r["n"], round(r["revenue"], 6))
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("revenue"))
        .collect()
    }
    salted = {
        r["user_id"]: (r["n"], round(r["revenue"], 6))
        for r in salted_agg(
            events,
            ["user_id"],
            {"n": ("count", F.lit(1)), "revenue": ("sum", F.col("value"))},
            salt_buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, events, sf_dir):
    ev = events.select(
        "event_id",
        F.regexp_extract("props", r'"k": (\d+)', 1)
        .try_cast("bigint")
        .alias("p_partkey"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    plain = ev.join(part, "p_partkey").groupBy("p_brand").count()
    salted = salted_join(ev, part, "p_partkey", salt_buckets=4).groupBy(
        "p_brand"
    ).count()
    assert {tuple(r) for r in plain.collect()} == {
        tuple(r) for r in salted.collect()
    }


def test_salted_agg_rejects_non_algebraic(events):
    with pytest.raises(ValueError):
        salted_agg(events, ["user_id"], {"x": ("avg", F.col("value"))})


def test_salted_join_rejects_small_side_preserving(events, spark, sf_dir):
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    for how in ("right", "full", "full_outer", "rightouter"):
        with pytest.raises(ValueError):
            salted_join(events, part, "p_partkey", how=how)


def test_skew_report_exact_shape(spark):
    """Counts/ratios on a hand-built skewed frame, NULL counted as a
    key, top bound respected, degenerate top rejected."""
    import pytest

    from airflow_retail_etl_spark.operators.skew import skew_report

    rows = [("hot",)] * 6 + [("warm",)] * 3 + [(None,)] * 2 + [("cold",)]
    df = spark.createDataFrame(rows, "k string")
    out = skew_report(df, "k", top=3).collect()
    assert [r["key"] for r in out] == ["hot", "warm", None]
    top = out[0]
    assert (top["n"], top["n_keys"], top["n_rows"], top["max_n"]) == (
        6, 4, 12, 6,
    )
    assert top["avg_n"] == 3.0 and top["skew_factor"] == 2.0
    assert top["share"] == 0.5
    with pytest.raises(ValueError, match="top"):
        skew_report(df, "k", top=0)
