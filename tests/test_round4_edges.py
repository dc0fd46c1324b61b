"""Edge-case hardening for the round-4 operators: empty inputs, single
rows, and degenerate parameters must not throw or mis-shape."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from airflow_retail_etl_spark.operators import dedup, lm, sampling, similarity

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], DOC_SCHEMA)


def test_lm_on_empty_corpus(spark, empty_docs):
    assert lm.unigram_score(empty_docs, "text", "doc_id").count() == 0
    assert lm.bigram_score(empty_docs, "text", "doc_id").count() == 0
    assert lm.tfidf_keywords(empty_docs, "text", "doc_id").count() == 0


def test_lm_single_doc(spark):
    docs = spark.createDataFrame([(1, "hello world")], DOC_SCHEMA)
    row = lm.unigram_score(docs, "text", "doc_id").collect()[0]
    # both tokens hapax: p = 1/2 each
    import math
    assert row["n_tokens"] == 2
    assert row["avg_nll"] == pytest.approx(math.log(2), abs=1e-6)


def test_incremental_dedup_empty_sides(spark, empty_docs):
    docs = spark.createDataFrame([(1, "some words here")], DOC_SCHEMA)
    # empty incoming → nothing admitted
    assert dedup.incremental_dedup(docs, empty_docs, "text", "doc_id").count() == 0
    # empty existing → incoming survives (no within-batch dups)
    out = dedup.incremental_dedup(empty_docs, docs, "text", "doc_id")
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_weighted_sample_k_larger_than_corpus(spark):
    df = spark.createDataFrame([(1, 2.0), (2, 3.0)], ["rid", "w"])
    got = sampling.weighted_sample_k(df, "w", 10, "rid")
    assert sorted(r["rid"] for r in got.collect()) == [1, 2]


def test_pq_topk_k_exceeds_corpus(spark):
    rows = [(i, [float((i * 7 + j) % 5) - 2.0 for j in range(64)])
            for i in range(6)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = similarity.pq_topk(df, df.filter("vec_id = 0"), k=10, shortlist=10)
    # 5 neighbors exist (self excluded)
    assert out.count() == 5
    ranks = sorted(r["rank"] for r in out.collect())
    assert ranks == [1, 2, 3, 4, 5]
