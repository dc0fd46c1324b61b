from __future__ import annotations

from pyspark.sql import functions as F

from airflow_retail_etl_spark.functions import text as tf


def _one(spark, text, col):
    return (
        spark.createDataFrame([(text,)], ["text"])
        .select(col.alias("out"))
        .collect()[0]["out"]
    )


def test_token_count_and_edges(spark):
    assert _one(spark, "a b  c", tf.token_count(F.col("text"))) == 3
    assert _one(spark, "   ", tf.token_count(F.col("text"))) == 0
    assert _one(spark, "", tf.token_count(F.col("text"))) == 0


def test_avg_token_len_and_ratios(spark):
    assert _one(spark, "ab cd", tf.avg_token_len(F.col("text"))) == 2.0
    assert _one(spark, "", tf.avg_token_len(F.col("text"))) is None
    assert _one(spark, "hi, there!", tf.punct_ratio(F.col("text"))) == 0.2
    assert _one(spark, "the cat the dog", tf.stopword_ratio(F.col("text"))) == 0.5


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("hello world",), ("different",)], ["text"]
    )
    fps = [r[0] for r in df.select(tf.fingerprint(F.col("text"))).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_char_shingles(spark):
    out = _one(spark, "abcdef", tf.char_shingles(F.col("text"), 5))
    assert out == ["abcde", "bcdef"]
    # shorter than n → whole text as one shingle
    assert _one(spark, "abc", tf.char_shingles(F.col("text"), 5)) == ["abc"]


def test_token_shingles(spark):
    out = _one(spark, "a b c d", tf.token_shingles(F.col("text"), 3))
    assert out == ["a b c", "b c d"]
    # fewer tokens than n → single partial shingle
    assert _one(spark, "a b", tf.token_shingles(F.col("text"), 3)) == ["a b"]


def test_quality_score_band(spark):
    good = _one(spark, "the quick brown fox jumps over the lazy dog", tf.quality_score(F.col("text")))
    bad = _one(spark, "!!! ??? ...", tf.quality_score(F.col("text")))
    assert 0.0 <= bad < good <= 1.0


def test_bpe_token_count_examples(spark):
    from airflow_retail_etl_spark.functions.text import bpe_token_count
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ("hello world",),       # 2 letter runs
            ("it's 2024!",),        # it + ' + s + 2024 + !
            ("",),                  # empty
            ("a1b",),               # a + 1 + b
        ],
        ["text"],
    )
    out = [r["n"] for r in df.select(bpe_token_count(F.col("text")).alias("n")).collect()]
    assert out == [2, 5, 0, 3]
