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
