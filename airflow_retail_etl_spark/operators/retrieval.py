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


def ql_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    mu: float = 300.0,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` documents under the Dirichlet-smoothed query-likelihood
    language model (Zhai/Lafferty) — the standard LM-based lexical ranker
    and the natural fusion partner for BM25:

        score(D,Q) = Σ_t ln( (tf(t,D) + μ·cf(t)/|C|) / (|D| + μ) )

    Candidates are documents matching ≥1 query term (the usual posting-
    driven evaluation); the sum runs over ALL corpus-present query terms,
    tf=0 terms contributing their smoothed mass. Query terms absent from
    the corpus are dropped (cf = 0 would force score = −∞ for every
    candidate equally; dropping them is rank-preserving).

    Scale shape: candidate set is postings-bounded (only docs hitting a
    query term), the per-candidate term grid is |cand| × |Q| with the
    |Q|-row term stats broadcast, and the only corpus-wide work is the
    one-pass doc-length aggregation bm25_topk also does.

    Determinism policy (README "Correctness"): the ln input is one pure
    IEEE double expression over exact integer counts, written with the
    identical tree in the DuckDB oracle; ln output rounds to 9 dp,
    accumulates in DECIMAL, final score rounds to 6 dp BEFORE the
    (score DESC, doc_id ASC) top-k.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if not mu > 0:
        raise ValueError(f"mu must be > 0, got {mu}")
    terms = sorted(set(query_terms))
    toks = _tokens(docs, text_col, id_col)

    dl = toks.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    total = toks.agg(F.sum(F.lit(1)).alias("total_cf"))

    # corpus frequency of the query terms (|Q|-row, broadcast); terms
    # with no postings drop out here
    cf = (
        toks.filter(F.col("tok").isin(terms))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cf"))
    )
    # per-(candidate doc, query term) tf — candidates are docs with >=1 hit
    tf = (
        toks.filter(F.col("tok").isin(terms))
        .groupBy("id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    grid = (
        tf.select("id")
        .distinct()
        .crossJoin(F.broadcast(cf))
        .join(tf, ["id", "tok"], "left")
        .select("id", "tok", "cf", F.coalesce("tf", F.lit(0)).alias("tf"))
        .join(dl, "id")
        .join(F.broadcast(total))
    )
    u = (
        F.col("tf").cast("double")
        + F.lit(mu)
        * (F.col("cf").cast("double") / F.col("total_cf").cast("double"))
    ) / (F.col("dl").cast("double") + F.lit(mu))
    contrib9 = F.round(F.log(u), 9)
    per_doc = grid.groupBy("id").agg(
        F.sum(F.when(F.col("tf") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_terms_hit"),
        F.round(F.sum(contrib9.cast(_ACC)).cast("double"), 6).alias("score"),
    )
    return (
        per_doc.select(F.col("id").alias(id_col), "n_terms_hit", "score")
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def rrf_fuse(
    docs: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n_each: int = 50,
    rrf_k: int = 60,
    k: int = 20,
) -> DataFrame:
    """Hybrid retrieval by Reciprocal Rank Fusion (Cormack/Clarke/Büttcher)
    over the BM25 and query-likelihood rankers:

        rrf(D) = Σ_r 1/(rrf_k + rank_r(D))    over rankers r where D ranks

    Each ranker contributes its deterministic top-``n_each`` (ranked by
    score DESC, doc_id ASC — the total order both rankers pin); fusion is
    a full outer join of two ≤n_each-row frames, so everything past the
    two ranker plans is driver-trivial. Ranks are exact integers; each
    reciprocal is one IEEE division rounded to 9 dp, DECIMAL-accumulated,
    and the fused score rounds to 6 dp BEFORE the final
    (rrf_score DESC, doc_id ASC) top-``k``.

    Returns (doc_id, bm25_rank, ql_rank, rrf_score) — a NULL rank means
    the document appeared in only the other ranker's list.
    """
    from pyspark.sql import Window

    if n_each < 1:
        raise ValueError(f"n_each must be >= 1, got {n_each}")
    if rrf_k < 1:
        # rrf_k + rank must stay > 0 for every rank; 0 would make rank 1
        # an ANSI divide-by-zero and negatives invert the rank order
        raise ValueError(f"rrf_k must be >= 1, got {rrf_k}")
    b = bm25_topk(
        docs, query_terms, text_col, id_col, k=n_each
    ).select(id_col, "score")
    q = ql_topk(
        docs, query_terms, text_col, id_col, k=n_each
    ).select(id_col, "score")
    # row_number over a <=n_each-row frame: bounded, not data-sized
    order = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    rb = b.select(
        id_col, F.row_number().over(order).cast("bigint").alias("bm25_rank")
    )
    rq = q.select(
        id_col, F.row_number().over(order).cast("bigint").alias("ql_rank")
    )
    fused = rb.join(rq, id_col, "full_outer")

    def recip(rank: F.Column) -> F.Column:
        return F.coalesce(
            F.round(F.lit(1.0) / (F.lit(rrf_k) + rank.cast("double")), 9),
            F.lit(0.0),
        )

    rrf = F.round(
        (
            recip(F.col("bm25_rank")).cast(_ACC)
            + recip(F.col("ql_rank")).cast(_ACC)
        ).cast("double"),
        6,
    )
    return (
        fused.select(id_col, "bm25_rank", "ql_rank", rrf.alias("rrf_score"))
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(k)
    )
