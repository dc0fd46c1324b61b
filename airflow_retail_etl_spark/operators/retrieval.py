"""BM25 full-text retrieval over the corpus (SURVEY §7.4 extension).

Training-data pipelines retrieve: benchmark-contamination auditing by
query ("which training docs answer this eval question?"), targeted
corpus slicing, and retrieval-augmented dedup all reduce to scoring the
corpus against a short term query. BM25 (Robertson/Spärck Jones; the
Okapi formulation Lucene/Elasticsearch default to) is the standard
lexical ranker:

    score(D,Q) = Σ_t idf(t) · tf(t,D)·(k1+1) / (tf(t,D) + k1·(1−b+b·|D|/avgdl))
    idf(t)     = ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5))

Plan shape (scale-first):

- the term filter lands INSIDE the token explode, so only postings for
  query terms survive the scan — the corpus-wide work is one doc-keyed
  length aggregation (map-side combinable) plus a 1-row (N, avgdl)
  scalar, both one pass;
- df(t) is a |Q|-row aggregate over the surviving postings, broadcast;
- top-k is a global TakeOrderedAndProject (no full sort materializes).

Determinism policy (README "Correctness"): idf is the one
transcendental — evaluated on exact integer inputs (N, df) with a
single division, rounded to 9 dp before use; each per-term
contribution is rounded to 9 dp and accumulated in DECIMAL so the
per-doc sum is partition/row-order independent; the final score rounds
to 6 dp BEFORE ranking, with doc_id as total-order tiebreak. The
tf/length ratio is pure IEEE double arithmetic written with the
identical expression tree in the DuckDB oracle; k1 = 1.2 and b = 0.75
are decimal literals both engines bind to the SAME nearest double (and
k1 + 1 evaluates to the same double as the literal 2.2 binds to), so
with identical operands and operation order both engines agree
bit-for-bit — pinned by the oracle gate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airflow_retail_etl_spark.operators.lm import _ACC, _tokens


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-terms query under BM25.

    ``query_terms`` should be pre-normalized (lowercase) — they are
    matched against the same tokenization the LM/dedup families use.
    Returns (doc_id, n_terms_hit, score), score 6-dp, ranked by
    (score DESC, doc_id ASC).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(query_terms))
    toks = _tokens(docs, text_col, id_col)

    # one corpus pass: per-doc length, then the (N, avgdl) scalar. N counts
    # every doc in the index (empty docs too — they just can't match).
    dl = toks.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    ids = docs.select(F.col(id_col).alias("id")).distinct()
    corpus = ids.join(dl, "id", "left").select(
        "id", F.coalesce("dl", F.lit(0)).alias("dl")
    )
    stats = corpus.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )

    # postings for query terms only — the filter fuses into the explode
    tf = (
        toks.filter(F.col("tok").isin(terms))
        .groupBy("id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        tf.join(F.broadcast(df_t), "tok")
        .join(F.broadcast(stats))
        .join(corpus, "id")
    )
    idf9 = F.round(
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ),
        9,
    )
    avgdl = F.col("sum_dl") / F.col("n_docs")
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / avgdl
    )
    contrib9 = F.round(idf9 * (F.col("tf") * F.lit(k1 + 1.0)) / denom, 9)
    per_doc = scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_terms_hit"),
        F.round(F.sum(contrib9.cast(_ACC)).cast("double"), 6).alias("score"),
    )
    return (
        per_doc.select(
            F.col("id").alias(id_col), "n_terms_hit", "score"
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
