from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from airflow_retail_etl_spark.operators import selection
from airflow_retail_etl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _scored(spark):
    from airflow_retail_etl_spark.functions import text as tf

    docs = load_table(spark, SF, "documents")
    return docs.select(
        "doc_id",
        tf.token_count(F.col("text")).alias("n_tokens"),
        tf.quality_score(F.col("text")).alias("q"),
    )


def test_two_phase_equals_global_window(spark):
    df = _scored(spark)
    order = [F.col("q").desc(), F.col("doc_id").asc()]
    got = {
        r["doc_id"]: r["cum"]
        for r in selection.global_cumsum(df, order, "n_tokens").collect()
    }
    w = (
        Window.orderBy(F.col("q").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r["doc_id"]: r["cum"]
        for r in df.withColumn("cum", F.sum("n_tokens").over(w)).collect()
    }
    assert got == want


def test_partition_count_invariance(spark):
    df = _scored(spark)
    order = [F.col("q").desc(), F.col("doc_id").asc()]
    a = {
        r["doc_id"]: r["cum"]
        for r in selection.global_cumsum(
            df, order, "n_tokens", num_partitions=2
        ).collect()
    }
    b = {
        r["doc_id"]: r["cum"]
        for r in selection.global_cumsum(
            df, order, "n_tokens", num_partitions=29
        ).collect()
    }
    assert a == b


def test_budget_select_boundary(spark):
    df = _scored(spark)
    order = [F.col("q").desc(), F.col("doc_id").asc()]
    sel = selection.budget_select(df, order, "n_tokens", 1000).collect()
    assert sel, "budget of 1000 tokens admits at least one doc"
    assert max(r["cum"] for r in sel) <= 1000
    # the next doc in order would cross the budget: selection is maximal
    full = selection.global_cumsum(df, order, "n_tokens").collect()
    over = [r for r in full if r["cum"] > 1000]
    assert min(r["cum"] for r in over) > 1000


def test_no_single_partition_window_over_data(spark):
    # the data-scale window must be partitioned by the range id; only the
    # per-partition offset pass (num_partitions rows) may run global
    import re

    df = _scored(spark)
    order = [F.col("q").desc(), F.col("doc_id").asc()]
    plan = (
        selection.global_cumsum(df, order, "n_tokens")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    windows = re.findall(r"Window \[.*", plan)
    assert len(windows) == 2
    data_windows = [w for w in windows if "n_tokens" in w]
    assert data_windows and all("__pid" in w for w in data_windows)


def test_global_quantiles_matches_buffering_percentile(spark, sf_dir):
    """The distributed rank-arithmetic quantiles must equal Spark's own
    buffering F.percentile (same type-7 definition) to 6dp, be
    layout-invariant, exclude NULLs, and reject bad q."""
    import pytest
    from pyspark.sql import functions as F

    from airflow_retail_etl_spark.operators.selection import global_quantiles
    from airflow_retail_etl_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    qs = [0.25, 0.5, 0.9, 0.99]
    got = {r.q: r.quantile for r in global_quantiles(ev, "value", qs).collect()}
    ref = ev.filter(F.col("value").isNotNull()).agg(
        *[
            F.round(F.percentile(F.col("value"), F.lit(q)), 6).alias(str(q))
            for q in qs
        ]
    ).collect()[0]
    for q in qs:
        assert got[q] == ref[str(q)], (q, got[q], ref[str(q)])
    again = {
        r.q: r.quantile
        for r in global_quantiles(ev.repartition(11), "value", qs).collect()
    }
    assert again == got
    with pytest.raises(ValueError):
        global_quantiles(ev, "value", [1.5])


def test_grouped_quantiles_matches_percentile_per_group(spark, sf_dir):
    """The grouped rank-arithmetic path must equal Spark's buffering
    percentile per group (same type-7 definition), and be layout-
    invariant."""
    import pytest

    from airflow_retail_etl_spark.operators.selection import (
        grouped_quantiles,
    )
    from airflow_retail_etl_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    qs = [0.25, 0.5, 0.9]
    got = {
        (r.event_type, r.q): (r.quantile, r.n)
        for r in grouped_quantiles(ev, "event_type", "value", qs).collect()
    }
    ref_rows = (
        ev.filter(
            F.col("value").isNotNull() & F.col("event_type").isNotNull()
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.round(
                    F.percentile(F.col("value"), F.lit(q)), 6
                ).alias(str(q))
                for q in qs
            ],
        )
        .collect()
    )
    assert got and len(got) == len(ref_rows) * len(qs)
    for row in ref_rows:
        for q in qs:
            assert got[(row.event_type, q)] == (row[str(q)], row.n)
    again = {
        (r.event_type, r.q): (r.quantile, r.n)
        for r in grouped_quantiles(
            ev.repartition(11), "event_type", "value", qs
        ).collect()
    }
    assert again == got
    with pytest.raises(ValueError):
        grouped_quantiles(ev, "event_type", "value", [-0.1])


def test_robust_stats_small_frame(spark):
    """median/MAD/trimmed mean agree with hand-computed values and the
    operator rejects degenerate trims."""
    import pytest

    from airflow_retail_etl_spark.operators.selection import robust_stats

    vals = [1.0, 2.0, 3.0, 4.0, 100.0]  # outlier pulls mean, not median
    df = spark.createDataFrame(
        [("a", v) for v in vals] + [("b", 7.0), ("b", 9.0)],
        "g string, v double",
    )
    got = {r["g"]: r for r in robust_stats(df, "g", "v", trim_q=0.2).collect()}
    a = got["a"]
    assert a["n"] == 5 and a["median"] == 3.0
    # deviations |x-3| = [2,1,0,1,97] -> median 1
    assert a["mad"] == 1.0
    # type-7 q20/q80 of [1,2,3,4,100]: h=.2*4+1=1.8 -> 1.8; h=.8*4+1=4.2
    # -> 4+0.2*96=23.2; kept [2,3,4] -> mean 3
    assert a["n_trimmed"] == 3 and a["trimmed_mean"] == 3.0
    # group b trims to EMPTY (bounds 7.4/8.6 exclude both values) —
    # it must survive with n_trimmed=0 and a NULL trimmed mean
    b = got["b"]
    assert b["median"] == 8.0 and b["mad"] == 1.0
    assert b["n_trimmed"] == 0 and b["trimmed_mean"] is None
    with pytest.raises(ValueError, match="trim_q"):
        robust_stats(df, "g", "v", trim_q=0.5)
