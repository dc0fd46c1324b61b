from __future__ import annotations

import pytest

from airflow_retail_etl_spark.operators.chunking import chunk_documents


def _chunks(spark, text, *, chunk_size, overlap):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = (
        chunk_documents(df, "text", "doc_id", chunk_size=chunk_size, overlap=overlap)
        .orderBy("chunk_id")
        .collect()
    )
    return rows


def test_windows_cover_all_tokens_with_overlap(spark):
    text = " ".join(f"t{i}" for i in range(10))
    rows = _chunks(spark, text, chunk_size=4, overlap=1)
    # stride 3 over 10 tokens -> starts 0,3,6
    assert [(r.chunk_id, r.start_token, r.n_chunk_tokens) for r in rows] == [
        (0, 0, 4),
        (1, 3, 4),
        (2, 6, 4),
    ]
    assert rows[0].chunk_text == "t0 t1 t2 t3"
    assert rows[1].chunk_text == "t3 t4 t5 t6"  # 1-token overlap
    # reassembling starts+lengths covers exactly tokens 0..9
    covered = set()
    for r in rows:
        covered |= set(range(r.start_token, r.start_token + r.n_chunk_tokens))
    assert covered == set(range(10))


def test_short_and_exact_fit_docs_get_one_chunk(spark):
    rows = _chunks(spark, "a b c", chunk_size=8, overlap=2)
    assert len(rows) == 1 and rows[0].n_chunk_tokens == 3
    rows = _chunks(spark, "a b c d", chunk_size=4, overlap=1)
    assert len(rows) == 1 and rows[0].chunk_text == "a b c d"


def test_empty_doc_yields_one_empty_chunk(spark):
    rows = _chunks(spark, "   ", chunk_size=4, overlap=1)
    assert len(rows) == 1
    assert rows[0].n_chunk_tokens == 0 and rows[0].chunk_text == ""


def test_truncated_tail_keeps_remainder(spark):
    rows = _chunks(spark, " ".join(f"t{i}" for i in range(11)), chunk_size=4, overlap=1)
    assert rows[-1].start_token == 9 and rows[-1].n_chunk_tokens == 2


def test_invalid_params_rejected(spark):
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", chunk_size=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", chunk_size=4, overlap=-1)
