from __future__ import annotations

from pyspark.sql import functions as F

from airflow_retail_etl_spark.functions import text as tf


def _flags(spark, doc):
    df = spark.createDataFrame([(doc,)], ["text"])
    cols = tf.gopher_flags(F.col("text"))
    return df.select(*[c.alias(k) for k, c in cols.items()]).collect()[0]


def test_good_doc_keeps(spark):
    doc = " ".join(
        ["the quick brown fox jumps over a lazy dog and it runs for fun"] * 5
    )
    r = _flags(spark, doc)
    assert r.keep, r.asDict()


def test_short_doc_fails_word_count_only_rules(spark):
    r = _flags(spark, "too short")
    assert not r.flag_word_count and not r.keep


def test_symbol_heavy_doc_dropped(spark):
    doc = " ".join(["the and of it is for a in an to word more here now"] * 5)
    doc += " " + " ".join(["#"] * 20)
    r = _flags(spark, doc)
    assert not r.flag_symbol_ratio and r.symbol_ratio > 0.1


def test_bullet_list_dropped(spark):
    doc = "\n".join(f"- item {i} of the list and it is for an" for i in range(20))
    r = _flags(spark, doc)
    assert r.bullet_line_frac == 1.0 and not r.flag_bullets


def test_numeric_doc_fails_alpha_rule(spark):
    doc = " ".join(str(i) for i in range(100))
    r = _flags(spark, doc)
    assert r.alpha_word_frac == 0.0 and not r.flag_alpha_words


def test_empty_doc_fails_closed(spark):
    r = _flags(spark, "   ")
    assert r.n_words == 0 and not r.keep
    assert r.mean_word_len is None and r.symbol_ratio is None


def test_stopword_rule_counts_distinct(spark):
    doc = " ".join(["zebra"] * 60) + " the the the"
    r = _flags(spark, doc)
    assert r.n_distinct_stopwords == 1 and not r.flag_stopwords
