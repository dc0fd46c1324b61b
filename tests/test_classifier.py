from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from airflow_retail_etl_spark.operators.classifier import (
    DEFAULT_TEXT_BIAS,
    DEFAULT_TEXT_WEIGHTS,
    default_text_features,
    linear_logit,
    logistic_score,
)


@pytest.fixture(scope="module")
def scored(spark):
    df = spark.createDataFrame(
        [(1, 0.25, 2.0), (2, 0.75, 0.0), (3, 0.5, 1.0)], "id long, a double, b double"
    )
    return logistic_score(
        df,
        {"a": F.col("a"), "b": F.col("b")},
        {"a": 2.0, "b": -1.0},
        0.5,
    ).collect()


def test_scores_match_reference_sigmoid(scored):
    # z = 0.5 + 2a - b, DECIMAL-exact; sigmoid rounded to 6dp
    for r in scored:
        z = 0.5 + 2.0 * r["a"] - 1.0 * r["b"]
        assert r["score"] == pytest.approx(
            round(1.0 / (1.0 + math.exp(-z)), 6), abs=1e-9
        )


def test_keep_threshold_on_rounded_score(scored):
    for r in scored:
        assert r["keep"] == (r["score"] >= 0.5)


def test_missing_feature_raises(spark):
    with pytest.raises(ValueError, match="typo"):
        linear_logit({"a": F.lit(1.0)}, {"a": 1.0, "typo": 2.0}, 0.0)


def test_scoring_is_projection_only(spark):
    # zero exchanges: the whole gate fuses into the scan stage
    df = spark.range(10).select(
        F.col("id"), (F.col("id") / 10.0).alias("f")
    )
    plan = logistic_score(
        df, {"f": F.col("f")}, {"f": 1.0}, 0.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_empty_text_scores_null_not_divide_by_zero(spark):
    # ANSI mode is on: an unguarded ttr division would throw DIVIDE_BY_ZERO
    # on empty/whitespace-only docs. The guard (NULLIF on token count)
    # must instead yield NULL features → NULL score → NULL keep, matching
    # the DuckDB oracle's NULLIF(n_tokens, 0) semantics.
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "real words here ok")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in logistic_score(
            df,
            default_text_features(F.col("text")),
            DEFAULT_TEXT_WEIGHTS,
            DEFAULT_TEXT_BIAS,
        ).collect()
    }
    for blank in (1, 2):
        assert rows[blank]["f_ttr"] is None
        assert rows[blank]["score"] is None
        assert rows[blank]["keep"] is None
    assert rows[3]["score"] is not None and rows[3]["f_ttr"] is not None


def test_entry_funnel_stages_partition_corpus(spark):
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    rows = entry.queries()["filter_funnel"](spark, sf).collect()
    n_docs = entry.queries()["doc_stats"](spark, sf).count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4


def test_entry_cluster_split_no_leakage(spark):
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    df = entry.queries()["cluster_split"](spark, sf)
    # every cluster maps to exactly one split: near-dups cannot straddle
    assert (
        df.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
        == 0
    )
    # and the draw actually uses the cluster id: all three splits appear
    assert df.select("split").distinct().count() == 3


# --- ridge_fit: in-engine closed-form training ------------------------------

def test_ridge_fit_partition_independent(spark):
    """XᵀX/Xᵀy accumulate in DECIMAL — the learned model must be
    bit-identical however the input is partitioned."""
    from airflow_retail_etl_spark.functions import text as tf
    from airflow_retail_etl_spark.operators.classifier import (
        default_text_features,
        ridge_fit,
    )
    from airflow_retail_etl_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    label = tf.gopher_flags(F.col("text"))["keep"].cast("int")
    fits = [
        ridge_fit(
            docs.repartition(n), default_text_features(F.col("text")), label
        )
        for n in (1, 7, 32)
    ]
    assert fits[0] == fits[1] == fits[2]


def test_ridge_fit_holdout_accuracy(spark):
    """The distilled linear gate must generalize: ≥80% agreement with the
    Gopher rule on a doc_id-hash holdout it never saw."""
    from airflow_retail_etl_spark.functions import text as tf
    from airflow_retail_etl_spark.operators.classifier import (
        default_text_features,
        ridge_fit,
        ridge_score,
    )
    from airflow_retail_etl_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    train = docs.filter("doc_id % 5 != 0")
    hold = docs.filter("doc_id % 5 = 0")
    label = tf.gopher_flags(F.col("text"))["keep"]
    w, b = ridge_fit(
        train, default_text_features(F.col("text")), label.cast("int")
    )
    scored = ridge_score(hold, default_text_features(F.col("text")), w, b)
    joined = scored.select("doc_id", "keep").join(
        hold.select("doc_id", label.alias("y")), "doc_id"
    )
    n = joined.count()
    acc = (
        joined.filter(F.col("keep") == F.col("y")).count() / n
    )
    assert n >= 50
    assert acc >= 0.8, acc
    # and the holdout isn't one-sided (both classes present)
    assert 0 < joined.filter("y").count() < n


def test_ridge_fit_recovers_exact_linear_relation(spark):
    """On noiseless linear data with tiny l2 the closed form must recover
    the generating weights to ~4 decimals."""
    from airflow_retail_etl_spark.operators.classifier import ridge_fit

    rows = [(i, round(0.1 * i, 6), round(0.05 * (i % 7), 6)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, a double, b double")
    label = F.round(
        F.lit(0.3) + F.lit(2.0) * F.col("a") - F.lit(1.5) * F.col("b"), 6
    )
    w, bias = ridge_fit(
        df,
        {"f_a": F.col("a"), "f_b": F.col("b")},
        label,
        l2=1e-9,
    )
    assert abs(w["f_a"] - 2.0) < 1e-3
    assert abs(w["f_b"] + 1.5) < 1e-3
    assert abs(bias - 0.3) < 1e-3


def test_ridge_fit_excludes_null_label_rows(spark):
    """A NULL-label row must be dropped from BOTH XᵀX and Xᵀy — F.sum's
    null-skipping would otherwise count it in XᵀX only, fitting as if
    y=0. Fit with NULL-y rows present must equal the fit without them."""
    from airflow_retail_etl_spark.operators.classifier import ridge_fit

    rows = [(i, round(0.1 * i, 6), round(0.05 * (i % 7), 6)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, a double, b double")
    label = F.when(
        F.col("id") % 5 != 0,
        F.round(F.lit(0.3) + F.lit(2.0) * F.col("a") - F.lit(1.5) * F.col("b"), 6),
    )  # every 5th row: features present, label NULL
    feats = {"f_a": F.col("a"), "f_b": F.col("b")}
    w_with, b_with = ridge_fit(df, feats, label, l2=1e-9)
    w_ref, b_ref = ridge_fit(df.filter("id % 5 != 0"), feats, label, l2=1e-9)
    assert w_with == w_ref and b_with == b_ref
    # and the clean-subset fit still recovers the generating weights
    assert abs(w_with["f_a"] - 2.0) < 1e-3
    assert abs(w_with["f_b"] + 1.5) < 1e-3


def test_entry_classifier_calibration_partitions_corpus(spark):
    """Calibration bins partition the non-empty corpus; rates and mean
    scores live in the bin's range."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    rows = entry.queries()["classifier_calibration"](spark, sf).collect()
    assert rows
    from airflow_retail_etl_spark.functions.text import token_count
    from airflow_retail_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf, "documents")
    n_nonempty = docs.filter(token_count(F.col("text")) > 0).count()
    assert sum(r["n_docs"] for r in rows) == n_nonempty
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert 0.0 <= r["keep_rate"] <= 1.0
        lo, hi = r["bin"] / 10, (r["bin"] + 1) / 10 + 1e-9
        assert lo - 1e-6 <= r["mean_score"] <= hi + 1e-6
