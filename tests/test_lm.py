"""Unigram-LM scoring and TF-IDF keyword extraction (operators/lm.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from airflow_retail_etl_spark.operators import lm


@pytest.fixture(scope="module")
def toy_docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, "  "),          # whitespace-only → 0 tokens
            (4, "zebra zebra"),
        ],
        ["doc_id", "text"],
    )


def test_unigram_model_probabilities(toy_docs):
    m = {r["tok"]: r for r in lm.unigram_model(toy_docs).collect()}
    # 11 tokens total: the×3, sat×2, zebra×2, cat/on/mat/dog×1
    assert m["the"]["n"] == 3 and m["zebra"]["n"] == 2
    total = sum(r["n"] for r in m.values())
    assert total == 11
    assert m["the"]["logp"] == pytest.approx(math.log(3 / 11))


def test_unigram_score_matches_hand_computation(toy_docs):
    out = {
        r["id"]: r for r in lm.unigram_score(toy_docs, "text", "doc_id").collect()
    }
    # doc 4: both tokens are "zebra" (p = 2/11)
    assert out[4]["n_tokens"] == 2
    assert out[4]["avg_nll"] == pytest.approx(-math.log(2 / 11), abs=1e-6)
    # empty doc surfaces with 0 tokens and NULL score
    assert out[3]["n_tokens"] == 0 and out[3]["avg_nll"] is None
    # doc 1: "the"×2 (p=3/11), "sat" (p=2/11), hapax cat/on/mat (p=1/11)
    expected = -(
        2 * round(math.log(3 / 11), 9)
        + round(math.log(2 / 11), 9)
        + 3 * round(math.log(1 / 11), 9)
    ) / 6
    assert out[1]["avg_nll"] == pytest.approx(expected, abs=1e-6)


def test_unigram_score_token_count(toy_docs):
    out = {
        r["id"]: r["n_tokens"]
        for r in lm.unigram_score(toy_docs, "text", "doc_id").collect()
    }
    assert out == {1: 6, 2: 3, 3: 0, 4: 2}


def test_unigram_external_model_and_oov(spark, toy_docs):
    model = lm.unigram_model(toy_docs)
    new = spark.createDataFrame([(9, "the qwertyuiop")], ["doc_id", "text"])
    row = lm.unigram_score(
        new, "text", "doc_id", model=model, unseen_logp=-30.0
    ).collect()[0]
    expected = (round(-math.log(3 / 11), 9) + 30.0) / 2
    assert row["avg_nll"] == pytest.approx(expected, abs=1e-6)


def test_tfidf_ranks_characteristic_terms_first(toy_docs):
    out = lm.tfidf_keywords(toy_docs, "text", "doc_id", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append(r)
    top2 = [r["term"] for r in sorted(by_doc[2], key=lambda r: r["rank"])]
    # "dog" is unique to doc 2 → beats corpus-wide "the"/"sat"
    assert top2[0] == "dog"
    assert "the" not in top2  # df=2 for "the"... appears in 2 docs
    # ranks are 1..k, dense per doc
    for rows in by_doc.values():
        assert sorted(r["rank"] for r in rows) == list(
            range(1, len(rows) + 1)
        )


def test_tfidf_k_bound_and_determinism(toy_docs):
    a = lm.tfidf_keywords(toy_docs, "text", "doc_id", k=3).collect()
    b = lm.tfidf_keywords(toy_docs, "text", "doc_id", k=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_doc = {}
    for r in a:
        per_doc[r["id"]] = per_doc.get(r["id"], 0) + 1
    assert all(n <= 3 for n in per_doc.values())


def test_no_python_udfs_in_lm_plans(toy_docs):
    for df in (
        lm.unigram_score(toy_docs, "text", "doc_id"),
        lm.tfidf_keywords(toy_docs, "text", "doc_id"),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
