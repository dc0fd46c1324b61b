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

# ---------------------------------------------------------------------------
# Dirichlet query likelihood (ql_topk)
# ---------------------------------------------------------------------------

from airflow_retail_etl_spark.operators.retrieval import (  # noqa: E402
    ql_topk,
    rrf_fuse,
)


def _reference_ql(query, mu=300.0):
    """Plain-python Dirichlet QL over DOCS with the engine's policy."""
    toks = {i: t.split() for i, t in DOCS if t}
    total = sum(len(ts) for ts in toks.values())
    cf = {t: sum(ts.count(t) for ts in toks.values()) for t in set(query)}
    terms = [t for t in sorted(set(query)) if cf[t] > 0]
    cands = {i for i, ts in toks.items() if any(t in ts for t in terms)}
    out = {}
    for i in cands:
        contribs, hits = [], 0
        for t in terms:
            tf = toks[i].count(t)
            hits += int(tf > 0)
            u = (tf + mu * (cf[t] / total)) / (len(toks[i]) + mu)
            contribs.append(round(math.log(u), 9))
        out[i] = (hits, round(sum(contribs), 6))
    return out


def test_ql_matches_reference_formula(spark, docs):
    got = {
        r["doc_id"]: (r["n_terms_hit"], r["score"])
        for r in ql_topk(docs, ["spark", "join"], k=10).collect()
    }
    assert got == _reference_ql(["spark", "join"])


def test_ql_smoothing_scores_unmatched_terms(spark, docs):
    # doc 1 has no 'join': still a candidate (matched 'spark'), with the
    # tf=0 smoothed contribution in its sum — n_terms_hit says 1 of 2
    rows = {r["doc_id"]: r for r in ql_topk(docs, ["spark", "join"], k=10).collect()}
    assert rows[1]["n_terms_hit"] == 1
    assert rows[2]["n_terms_hit"] == 2
    # corpus-absent query terms are dropped, not scored as -inf
    with_unseen = {
        r["doc_id"]: (r["n_terms_hit"], r["score"])
        for r in ql_topk(docs, ["spark", "join", "zzzunseen"], k=10).collect()
    }
    assert with_unseen == _reference_ql(["spark", "join"])


def test_ql_validation(spark, docs):
    with pytest.raises(ValueError):
        ql_topk(docs, [])
    with pytest.raises(ValueError):
        ql_topk(docs, ["spark"], mu=0.0)


def test_ql_plan_no_python_udf(spark, docs):
    plan = (
        ql_topk(docs, ["spark", "join"], k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# Reciprocal rank fusion (rrf_fuse)
# ---------------------------------------------------------------------------


def test_rrf_matches_manual_fusion(spark, docs):
    n_each, rrf_k = 2, 60
    b = [r["doc_id"] for r in bm25_topk(docs, ["spark", "join"], k=n_each).collect()]
    q = [r["doc_id"] for r in ql_topk(docs, ["spark", "join"], k=n_each).collect()]
    expect = {}
    for ranks, name in ((b, "b"), (q, "q")):
        for pos, d in enumerate(ranks, start=1):
            expect.setdefault(d, {})[name] = pos
    fused = {}
    for d, rs in expect.items():
        score = round(
            sum(round(1.0 / (rrf_k + r), 9) for r in rs.values()), 6
        )
        fused[d] = (rs.get("b"), rs.get("q"), score)
    got = {
        r["doc_id"]: (r["bm25_rank"], r["ql_rank"], r["rrf_score"])
        for r in rrf_fuse(
            docs, ["spark", "join"], n_each=n_each, rrf_k=rrf_k, k=10
        ).collect()
    }
    assert got == fused


def test_rrf_single_list_doc_gets_null_other_rank(spark, docs):
    # with n_each=1 the two rankers may disagree; every fused row must
    # carry at least one rank and rows ordered by (rrf DESC, doc_id ASC)
    rows = rrf_fuse(docs, ["spark", "join"], n_each=1, k=10).collect()
    assert rows, "fusion of two non-empty top-1 lists cannot be empty"
    for r in rows:
        assert r["bm25_rank"] is not None or r["ql_rank"] is not None
    scores = [(-r["rrf_score"], r["doc_id"]) for r in rows]
    assert scores == sorted(scores)


def test_rrf_validation(spark, docs):
    with pytest.raises(ValueError):
        rrf_fuse(docs, ["spark"], n_each=0)
    with pytest.raises(ValueError, match="rrf_k"):
        rrf_fuse(docs, ["spark"], rrf_k=0)
