"""Character-n-gram language identification (SURVEY §7.4 text analysis).

Classic Cavnar–Trenkle-style profile matching, fully distributed:

1. ``build_profiles``: from a labeled corpus, the top-K most frequent char
   n-grams per language (explode → count → per-language top-K window).
   Output is tiny (languages × K rows) regardless of corpus size.
2. ``classify``: score every document against every profile (broadcast
   cross join over the handful of languages) by n-gram set overlap; predict
   the argmax with a deterministic tiebreak.

No Python UDFs; scoring is array_intersect over materialized n-gram sets.
At 100 TB the profile build is one shuffle on (lang, ngram) with partial
aggregation, and classification is a broadcast join — no pairwise blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from airflow_retail_etl_spark.functions.partitioning import spread

from airflow_retail_etl_spark.functions.text import (
    char_shingles_from,
    normalize_text,
)


def _doc_ngrams(
    df: DataFrame, text_col: str, id_cols: list[str], *, n: int
) -> DataFrame:
    """(… id cols …, ngrams) with normalization materialized first (see
    dedup._with_shingles for why the two-step + repartition matters)."""
    base = df.select(*id_cols, normalize_text(F.col(text_col)).alias("base"))
    return spread(base, *[F.col(c) for c in id_cols[:1]]).select(
        *id_cols, char_shingles_from(F.col("base"), n).alias("ngrams")
    )


def build_profiles(
    labeled: DataFrame,
    *,
    text_col: str = "text",
    label_col: str = "lang",
    n: int = 2,
    top_k: int = 50,
) -> DataFrame:
    """(lang, profile: array<string>) — top-K char n-grams per language."""
    grams = _doc_ngrams(
        labeled.select(F.col(label_col).alias("lang"), text_col),
        text_col,
        ["lang"],
        n=n,
    )
    counts = (
        grams.select("lang", F.explode_outer("ngrams").alias("g"))
        .groupBy("lang", "g")
        .agg(F.count("*").alias("freq"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("freq").desc(), F.col("g").asc())
    top = counts.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= top_k
    )
    return top.groupBy("lang").agg(
        F.sort_array(F.collect_list("g")).alias("profile")
    )


def classify(
    docs: DataFrame,
    profiles: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """(id, predicted_lang, score) — argmax profile overlap per document.

    Deterministic: ties broken by language name ascending.
    """
    grams = _doc_ngrams(
        docs.select(F.col(id_col).alias("id"), text_col),
        text_col,
        ["id"],
        n=n,
    )
    scored = grams.crossJoin(F.broadcast(profiles)).select(
        "id",
        "lang",
        F.size(F.array_intersect("ngrams", "profile")).alias("score"),
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score").desc(), F.col("lang").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("id", F.col("lang").alias("predicted_lang"), "score")
    )


def lang_id(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "lang",
    n: int = 2,
    top_k: int = 50,
) -> DataFrame:
    """Self-trained lang-id: build profiles from the labeled subset of
    ``docs`` and classify every document. Returns (id, predicted_lang,
    score)."""
    labeled = docs.filter(F.col(label_col).isNotNull())
    profiles = build_profiles(
        labeled, text_col=text_col, label_col=label_col, n=n, top_k=top_k
    )
    return classify(docs, profiles, text_col=text_col, id_col=id_col, n=n)
