from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from airflow_retail_etl_spark.operators.retrieval import bm25_topk

DOCS = [
    (1, "spark spark spark shuffle"),
    (2, "spark join"),
    (3, "join join join join join join join join"),
    (4, "completely unrelated words here"),
    (5, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _reference_bm25(query, k1=1.2, b=0.75):
    """Plain-python BM25 over DOCS with the engine's rounding policy."""
    toks = {i: t.split() for i, t in DOCS if t}
    n_docs = len(DOCS)                      # every doc, even empty
    lens = {i: len(ts) for i, ts in toks.items()}
    avgdl = sum(lens.values()) / n_docs
    out = {}
    for term in query:
        df = sum(1 for ts in toks.values() if term in ts)
        if df == 0:
            continue
        idf = round(math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)), 9)
        for i, ts in toks.items():
            tf = ts.count(term)
            if not tf:
                continue
            denom = tf + k1 * (1 - b + b * lens[i] / avgdl)
            out.setdefault(i, []).append(
                round(idf * (tf * (k1 + 1.0)) / denom, 9)
            )
    return {
        i: (len(cs), round(sum(cs), 6)) for i, cs in out.items()
    }


def test_bm25_matches_reference_formula(spark, docs):
    got = {
        r["doc_id"]: (r["n_terms_hit"], r["score"])
        for r in bm25_topk(docs, ["spark", "join"], k=10).collect()
    }
    assert got == _reference_bm25(["spark", "join"])


def test_bm25_ranking_prefers_rare_term_saturates_tf(spark, docs):
    rows = bm25_topk(docs, ["spark"], k=10).collect()
    # doc 1 (tf=3) outranks doc 2 (tf=1); nothing else matches
    assert [r["doc_id"] for r in rows] == [1, 2]
    assert rows[0]["score"] > rows[1]["score"]


def test_bm25_k_truncates_with_total_order(spark, docs):
    rows = bm25_topk(docs, ["join"], k=1).collect()
    # doc 3 dominates on tf despite length normalization penalty
    assert len(rows) == 1 and rows[0]["doc_id"] == 3


def test_bm25_empty_query_raises(spark, docs):
    with pytest.raises(ValueError):
        bm25_topk(docs, [])


def test_bm25_unknown_terms_yield_empty(spark, docs):
    assert bm25_topk(docs, ["zzzunseen"], k=5).count() == 0


def test_bm25_plan_no_python_udf_and_takeordered(spark, docs):
    plan = (
        bm25_topk(docs, ["spark", "join"], k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
