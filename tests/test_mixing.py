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
