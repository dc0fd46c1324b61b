from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_retail_etl_spark.operators.repetition import (
    dup_line_frac,
    ngrams_all,
    repetition_report,
)


def _report(spark, docs, **kw):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return {
        r.id: r
        for r in repetition_report(df, "text", "doc_id", **kw).collect()
    }


def test_repeated_bigrams_measured(spark):
    rows = _report(spark, [(1, "a b a b a b")])
    r = rows[1]
    # bigrams: ab,ba,ab,ba,ab → total 5, distinct 2, max 3
    assert r.n_ngrams == 5
    assert r.dup_ngram_frac == pytest.approx(3 / 5)
    assert r.top_ngram_frac == pytest.approx(3 / 5)
    assert not r.keep


def test_unique_doc_keeps(spark):
    rows = _report(spark, [(1, "one two three four five six")])
    r = rows[1]
    assert r.dup_ngram_frac == 0.0 and r.keep


def test_too_short_doc_is_null_and_kept(spark):
    rows = _report(spark, [(1, "solo")])
    r = rows[1]
    assert r.n_ngrams == 0
    assert r.dup_ngram_frac is None and r.top_ngram_frac is None
    assert r.keep


def test_dup_line_frac(spark):
    df = spark.createDataFrame(
        [("x\ny\nx\nz",), ("a\nb",)], ["text"]
    )
    vals = [
        r.f for r in df.select(dup_line_frac(F.col("text")).alias("f")).collect()
    ]
    assert vals[0] == pytest.approx(1 / 4) and vals[1] == 0.0


def test_ngrams_all_keeps_duplicates_and_guards_short(spark):
    df = spark.createDataFrame([(["a", "b", "a", "b"],), (["a"],)], ["toks"])
    out = df.select(ngrams_all(F.col("toks"), 2).alias("g")).collect()
    assert out[0].g == ["a b", "b a", "a b"]
    assert out[1].g == []
