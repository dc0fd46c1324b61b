from __future__ import annotations

import pytest

from airflow_retail_etl_spark.operators.mixing import mix_corpus


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(f"a{i}", "web") for i in range(300)] + [
        (f"b{i}", "books") for i in range(100)
    ]
    return spark.createDataFrame(rows, ["key", "source"])


def test_binding_source_kept_whole(spark, corpus):
    out = mix_corpus(corpus, "source", {"web": 1, "books": 1}, "key")
    by = {r.source: r.n for r in out.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    # c = min(300/1, 100/1) = 100 → books kept whole, web thinned to ~100
    assert by["books"] == 100
    assert 70 <= by["web"] <= 130


def test_weights_shift_the_mix(spark, corpus):
    out = mix_corpus(corpus, "source", {"web": 3, "books": 1}, "key")
    by = {r.source: r.n for r in out.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    # c = min(300/3, 100/1) = 100 → web target 300 (whole), books target 100
    assert by == {"web": 300, "books": 100}


def test_unlisted_groups_dropped(spark, corpus):
    out = mix_corpus(corpus, "source", {"books": 1}, "key")
    assert {r.source for r in out.select("source").distinct().collect()} == {
        "books"
    }


def test_deterministic_under_layout(spark, corpus):
    a = {r.key for r in mix_corpus(corpus, "source", {"web": 1, "books": 2}, "key").collect()}
    b = {
        r.key
        for r in mix_corpus(
            corpus.repartition(17), "source", {"web": 1, "books": 2}, "key"
        ).collect()
    }
    assert a == b


def test_invalid_weights_rejected(spark, corpus):
    with pytest.raises(ValueError):
        mix_corpus(corpus, "source", {}, "key")
    with pytest.raises(ValueError):
        mix_corpus(corpus, "source", {"web": 0}, "key")


def test_source_repeat_plan_waterfill_invariants(spark, sf_dir):
    """Allocations sum EXACTLY to min(budget, total capacity), never
    exceed any source's repeat cap, and uncapped sources sit within one
    token of each other (uniform water level). Over-budget: everything
    capped; tiny budget: 0/1 allocations."""
    from pyspark.sql import functions as F

    from airflow_retail_etl_spark.functions import text as tf
    from airflow_retail_etl_spark.operators.mixing import source_repeat_plan
    from airflow_retail_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = tf.token_count(F.col("text"))
    rows = source_repeat_plan(
        docs, "source", toks, 75_000, max_repeat=3
    ).collect()
    caps = {r.source: r.capacity for r in rows}
    alloc = {r.source: r.alloc_tokens for r in rows}
    total_cap = sum(caps.values())
    assert sum(alloc.values()) == min(75_000, total_cap)
    assert all(alloc[s] <= caps[s] for s in caps)
    uncapped = [alloc[s] for s in caps if alloc[s] < caps[s]]
    assert uncapped and max(uncapped) - min(uncapped) <= 1
    # the sf0.01 budget exercises BOTH branches
    assert any(alloc[s] == caps[s] for s in caps)

    # over-budget: every source fully repeated, sum == total capacity
    over = source_repeat_plan(
        docs, "source", toks, 10 * total_cap, max_repeat=3
    ).collect()
    assert all(r.alloc_tokens == r.capacity for r in over)

    # budget smaller than the source count: 0/1 allocations summing to B
    tiny = source_repeat_plan(docs, "source", toks, 7, max_repeat=3).collect()
    assert sum(r.alloc_tokens for r in tiny) == 7
    assert all(r.alloc_tokens in (0, 1) for r in tiny)


def test_temperature_mix_flattens_and_is_deterministic(spark):
    """α=0.5 upweights small groups relative to their natural share:
    the small group's kept FRACTION must exceed the large group's, the
    binding group survives whole, and the mix is layout-invariant."""
    import pytest

    from airflow_retail_etl_spark.operators.mixing import temperature_mix

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, g string")
    out = temperature_mix(df, "g", "k", alpha=0.5)
    kept = {g: c for g, c in out.groupBy("g").count().collect()}
    # q_big ∝ √900 = 30, q_small ∝ √100 = 10 → targets 3:1 from a 9:1
    # corpus: small is binding (kept whole), big thins to ~3× small
    assert kept["small"] == 100
    assert 250 <= kept["big"] <= 350
    again = {
        g: c
        for g, c in temperature_mix(df.repartition(7), "g", "k", alpha=0.5)
        .groupBy("g")
        .count()
        .collect()
    }
    assert again == kept
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix(df, "g", "k", alpha=0.0)


def test_temperature_mix_alpha_one_is_natural_share(spark):
    """α=1 keeps the natural distribution — every group's keep fraction
    equals the binding ratio (here ≈1: all groups equally binding up to
    the 6dp share rounding), so nearly everything survives."""
    from airflow_retail_etl_spark.operators.mixing import temperature_mix

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(400)]
    df = spark.createDataFrame(rows, "k long, g string")
    out = temperature_mix(df, "g", "k", alpha=1.0)
    assert out.count() >= 396  # 6dp rounding can shave a hair
