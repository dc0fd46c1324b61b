from __future__ import annotations

from airflow_retail_etl_spark.operators.decontam import (
    contamination,
    decontaminate,
    eval_ngram_set,
)


def _frames(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated content about spark plans"),
            (3, "quick brown fox somewhere else entirely today"),
        ],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame(
        [(100, "a quick brown fox appears in this benchmark item")],
        ["doc_id", "text"],
    )
    return train, eval_df


def test_contamination_counts_shared_ngrams(spark):
    train, eval_df = _frames(spark)
    rep = {
        r.id: r.n_hit_ngrams
        for r in contamination(train, eval_df, "text", "doc_id", n=3).collect()
    }
    # docs 1 and 3 share the 3-gram "quick brown fox" with the eval item
    assert rep == {1: 1, 3: 1}


def test_decontaminate_drops_hits_keeps_columns(spark):
    train, eval_df = _frames(spark)
    kept = decontaminate(train, eval_df, "text", "doc_id", n=3)
    assert kept.columns == train.columns
    assert [r.doc_id for r in kept.collect()] == [2]


def test_decontaminate_threshold(spark):
    train, eval_df = _frames(spark)
    kept = decontaminate(
        train, eval_df, "text", "doc_id", n=3, max_hit_ngrams=1
    )
    assert {r.doc_id for r in kept.collect()} == {1, 2, 3}


def test_short_doc_whole_text_shingle_matches_exact_copy(spark):
    train = spark.createDataFrame([(1, "tiny doc")], ["doc_id", "text"])
    eval_df = spark.createDataFrame([(9, "tiny doc")], ["doc_id", "text"])
    assert decontaminate(train, eval_df, "text", "doc_id", n=13).count() == 0


def test_eval_ngram_set_distinct(spark):
    eval_df = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b c")], ["doc_id", "text"]
    )
    grams = {r.g for r in eval_ngram_set(eval_df, "text", "doc_id", n=3).collect()}
    assert "a b c" in grams
    assert len(grams) == len(set(grams))
