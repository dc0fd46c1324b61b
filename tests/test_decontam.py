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


# --- span-grain decontamination ---------------------------------------------

LEAK = "the famous benchmark passage everyone quotes in their training data"


def test_shared_span_pairs_cross_exact_and_no_self_pairs(spark):
    from airflow_retail_etl_spark.operators.dedup import (
        shared_span_pairs_cross,
    )

    train = spark.createDataFrame(
        [
            (1, f"intro words. {LEAK} and a tail."),
            (2, f"intro words. {LEAK} and a tail."),  # dup of 1 (train-side)
            (3, "completely unrelated training document text here."),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(1, f"eval question referencing {LEAK} verbatim.")],
        "doc_id long, text string",  # id 1 collides with train id 1: fine
    )
    rows = shared_span_pairs_cross(
        train, ev, "text", "doc_id", k=8, min_len=20
    ).collect()
    # only train x eval pairs; both train dups hit the one eval doc
    assert sorted((r["id_a"], r["id_b"]) for r in rows) == [(1, 1), (2, 1)]
    for r in rows:
        ta = f"intro words. {LEAK} and a tail.".lower()
        tb = f"eval question referencing {LEAK} verbatim.".lower()
        assert (
            ta[r["start_a"] - 1:r["start_a"] - 1 + r["span_len"]]
            == tb[r["start_b"] - 1:r["start_b"] - 1 + r["span_len"]]
        )
        assert r["span_len"] >= len(LEAK)
    # train 1 x train 2 are identical but must NOT appear (cross only)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="detection floor"):
        shared_span_pairs_cross(train, ev, "text", "doc_id", k=16, min_len=8)


def test_decontaminate_spans_excises_only_eval_leaks(spark):
    from airflow_retail_etl_spark.operators.decontam import (
        decontaminate_spans,
    )

    shared_train_only = (
        "this long sentence appears in two training documents but in "
        "no evaluation document at all"
    )
    train = spark.createDataFrame(
        [
            (1, f"clean doc one. {shared_train_only}"),
            (2, f"clean doc two. {shared_train_only}"),
            (3, f"leaky document quoting {LEAK} mid-text."),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, f"benchmark item: {LEAK}!")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate_spans(
            train, ev, "text", "doc_id", k=8, min_len=20
        ).collect()
    }
    # train-internal duplication is NOT decontamination's business
    assert out[1]["n_removed_chars"] == 0
    assert out[2]["n_removed_chars"] == 0
    # the eval leak is surgically excised; the doc survives
    assert out[3]["n_removed_chars"] >= len(LEAK)
    assert LEAK not in out[3]["text_clean"]
    assert "leaky document" in out[3]["text_clean"]


def test_eval_leak_report_counts_overlaps_once(spark):
    """leak_frac uses the UNION of leaked eval intervals (overlapping
    spans from different train docs count once); leaked_chars is the
    exposure sum (double-counted on purpose)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    rep = {r["doc_id"]: r for r in
           entry.queries()["eval_leak_report"](spark, sf).collect()}
    assert rep, "eval slice empty?"
    for r in rep.values():
        # union length can never exceed the doc, nor the exposure sum
        assert 0.0 <= r["leak_frac"] <= 1.0
        assert r["leak_frac"] * r["n_chars"] <= r["leaked_chars"] + 0.5  # 6dp rounding slack
        if r["n_train_docs"] == 0:
            assert r["leaked_chars"] == 0 and r["leak_frac"] == 0.0
    # construct a guaranteed overlap case: two train docs quote the SAME
    # eval passage -> leaked_chars ~ 2x but leak_frac counts it once
    from airflow_retail_etl_spark.operators.dedup import (
        shared_span_pairs_cross,
    )
    passage = "a distinctive benchmark passage that two sources copied"
    train = spark.createDataFrame(
        [(1, f"source one says {passage} end."),
         (2, f"source two also says {passage} closing.")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(9, f"q: {passage}?")], "doc_id long, text string"
    )
    spans = shared_span_pairs_cross(
        train, ev, "text", "doc_id", k=8, min_len=20
    ).collect()
    assert len(spans) == 2  # one per train doc, same eval interval
    (s1, s2) = spans
    assert (s1["start_b"], s1["span_len"]) == (s2["start_b"], s2["span_len"])


def test_contamination_score_grades_overlap(spark):
    """Full-copy train docs score 1.0, partial quotes score strictly
    between 0 and 1, clean docs 0.0 (empty docs shingle to the single
    whole-text gram, so they score 0.0 too — never a divide error);
    every train doc appears exactly once."""
    from airflow_retail_etl_spark.operators.decontam import (
        contamination_score,
    )

    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        ["doc_id", "text"],
    )
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # full copy
            (2, "intro words here alpha beta gamma delta more tail words"),
            (3, "totally unrelated clean document text body"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r.id: r
        for r in contamination_score(
            train, eval_df, "text", "doc_id", n=3
        ).collect()
    }
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1].contamination_frac == 1.0
    assert 0 < rows[2].contamination_frac < 1
    assert rows[3].contamination_frac == 0.0
    assert rows[3].n_hit_ngrams == 0
    # empty text -> one whole-text shingle (token_shingles_from), which
    # the eval set does not contain
    assert rows[4].n_ngrams == 1 and rows[4].contamination_frac == 0.0
