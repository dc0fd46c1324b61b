"""Intra-document repetition metrics (Gopher repetition rules).

Boilerplate-heavy or loop-generated documents repeat themselves; the
standard filters measure duplicate-line fraction and duplicate /
top-n-gram fractions per document. Line metrics are pure array
expressions (zero shuffles). N-gram frequency metrics need the count of
the most frequent n-gram, which an array-only form computes in O(d²) per
doc — so the scalable path EXPLODES n-grams and aggregates on
(doc, gram): the shuffle key is uniform (docs contribute ~|tokens| rows
each), partial aggregation collapses repeats map-side, and the result
rolls back up to one row per doc. Two shuffles total, both keyed fine at
100 TB.

N-grams here are NOT deduplicated (unlike text.token_shingles_from) —
repetition is precisely the signal dedup throws away. A doc with fewer
than ``n`` tokens has zero n-grams (NULL metrics, fail-open flags);
note Spark's ``sequence(1, 0)`` DESCENDS, so the empty case is guarded
explicitly rather than left to the sequence bounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from airflow_retail_etl_spark.functions.partitioning import _spread_id

from airflow_retail_etl_spark.functions.text import normalize_text, tokens


def ngrams_all(toks: Column, n: int) -> Column:
    """ALL (non-distinct) token n-grams; empty array when len(toks) < n.

    ``toks`` must be a materialized column reference (HOF re-evaluation
    trap — see dedup._with_shingles).
    """
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), k - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.try_element_at(toks, i + j) for j in range(n)]
        ),
    )
    return F.when(k >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def dup_line_frac(text: Column) -> Column:
    """Fraction of lines that are duplicates of an earlier line."""
    lines = F.split(text, "\n")
    return (F.size(lines) - F.size(F.array_distinct(lines))) / F.nullif(
        F.size(lines), F.lit(0)
    )


def repetition_report(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 2,
    max_dup_ngram_frac: float = 0.2,
    max_top_ngram_frac: float = 0.2,
) -> DataFrame:
    """Per-doc repetition metrics + keep flag.

    Output: (id, n_ngrams, dup_ngram_frac, top_ngram_frac, dup_line_frac,
    keep). dup_ngram_frac = 1 − distinct/total; top_ngram_frac = count of
    the modal n-gram / total. Docs with no n-grams have NULL fractions and
    keep=true (nothing to measure — length rules live in gopher_flags).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("text"),
        tokens(normalize_text(F.col(text_col))).alias("toks"),
    ).transform(_spread_id)
    grams = base.select(
        "id", F.explode_outer(ngrams_all(F.col("toks"), n)).alias("g")
    )
    per_gram = grams.groupBy("id", "g").agg(F.count("*").alias("c"))
    per_doc = per_gram.groupBy("id").agg(
        F.sum(F.when(F.col("g").isNotNull(), F.col("c"))).alias("total"),
        F.count(F.when(F.col("g").isNotNull(), True)).alias("n_distinct"),
        F.max(F.when(F.col("g").isNotNull(), F.col("c"))).alias("max_c"),
    )
    lines = base.select("id", dup_line_frac(F.col("text")).alias("dup_line_frac"))
    dup_frac = (F.col("total") - F.col("n_distinct")) / F.nullif(
        F.col("total"), F.lit(0)
    )
    top_frac = F.col("max_c") / F.nullif(F.col("total"), F.lit(0))
    keep = F.coalesce(dup_frac <= max_dup_ngram_frac, F.lit(True)) & F.coalesce(
        top_frac <= max_top_ngram_frac, F.lit(True)
    )
    return (
        per_doc.join(lines, "id")
        .select(
            "id",
            F.coalesce(F.col("total"), F.lit(0)).cast("long").alias("n_ngrams"),
            dup_frac.alias("dup_ngram_frac"),
            top_frac.alias("top_ngram_frac"),
            "dup_line_frac",
            keep.alias("keep"),
        )
    )
