"""Property-based checks (SURVEY §5.2) — invariants under arbitrary data."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from airflow_retail_etl_spark.functions.columns import money_sum, split_hierarchy
from airflow_retail_etl_spark.operators.dedup import jaccard_pairs

cents = st.integers(min_value=0, max_value=10_000_000)

SLOW = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SLOW
@given(st.lists(cents, min_size=1, max_size=50))
def test_money_sum_is_partitioning_invariant(spark, values):
    rows = [(c / 100.0,) for c in values]
    df = spark.createDataFrame(rows, ["v"])
    one = df.coalesce(1).agg(money_sum(F.col("v")).alias("s")).first()["s"]
    many = (
        df.repartition(7).agg(money_sum(F.col("v")).alias("s")).first()["s"]
    )
    exact = sum(values) / 100.0
    assert one == many == exact


@SLOW
@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=4),
        min_size=0,
        max_size=5,
    )
)
def test_split_hierarchy_reconstructs(spark, parts):
    code = ".".join(parts) if parts else None
    df = spark.createDataFrame([(code,)], "category_code string")
    c1, c2, c3 = split_hierarchy(F.col("category_code"))
    got = df.select(c1.alias("a"), c2.alias("b"), c3.alias("c")).first()
    expected = (parts + ["na", "na", "na"])[:3] if parts else ["na"] * 3
    assert [got["a"], got["b"], got["c"]] == expected


@SLOW
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=3, max_size=30),
        min_size=2,
        max_size=6,
        unique=True,
    )
)
def test_jaccard_bounds_and_identity(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts) if t.strip()]
    if len(rows) < 2:
        return
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for r in jaccard_pairs(df, "text", "doc_id").collect():
        assert 0.0 <= r["jaccard"] <= 1.0
        assert r["id_a"] < r["id_b"]
