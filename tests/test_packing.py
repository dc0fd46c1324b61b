from __future__ import annotations

import pytest

from airflow_retail_etl_spark.operators.packing import pack_chunks, pack_stats


def _chunk_frame(spark, counts, doc_id=1):
    rows = [(doc_id, i, n) for i, n in enumerate(counts)]
    return spark.createDataFrame(rows, ["doc_id", "chunk_id", "n_chunk_tokens"])


def test_chop_packing_addresses(spark):
    df = _chunk_frame(spark, [5, 5, 5])
    out = (
        pack_chunks(df, max_tokens=4, n_buckets=1)
        .orderBy("chunk_id")
        .collect()
    )
    # stream offsets 0,5,10 over max_tokens=4
    assert [(r.seq_id, r.seq_offset, r.spans_boundary) for r in out] == [
        (0, 0, True),   # tokens 0..4 straddle the 4-boundary
        (1, 1, True),   # tokens 5..9 straddle 8
        (2, 2, True),   # tokens 10..14 straddle 12
    ]


def test_exact_fit_does_not_span(spark):
    df = _chunk_frame(spark, [4, 4, 2])
    out = (
        pack_chunks(df, max_tokens=4, n_buckets=1)
        .orderBy("chunk_id")
        .collect()
    )
    assert [(r.seq_id, r.seq_offset, r.spans_boundary) for r in out] == [
        (0, 0, False),
        (1, 0, False),
        (2, 0, False),
    ]


def test_empty_chunk_keeps_offset_and_never_spans(spark):
    df = _chunk_frame(spark, [3, 0, 3])
    out = (
        pack_chunks(df, max_tokens=4, n_buckets=1)
        .orderBy("chunk_id")
        .collect()
    )
    assert [(r.seq_id, r.seq_offset, r.spans_boundary) for r in out] == [
        (0, 0, False),
        (0, 3, False),
        (0, 3, True),
    ]


def test_bucketing_is_deterministic_and_doc_coherent(spark):
    rows = [(d, c, 7) for d in range(40) for c in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "chunk_id", "n_chunk_tokens"])
    a = pack_chunks(df, max_tokens=16, n_buckets=4).collect()
    b = pack_chunks(df.repartition(11), max_tokens=16, n_buckets=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    buckets_per_doc = {}
    for r in a:
        buckets_per_doc.setdefault(r.doc_id, set()).add(r.bucket)
    assert all(len(s) == 1 for s in buckets_per_doc.values())
    assert len({r.bucket for r in a}) > 1  # docs actually spread out


def test_pack_stats_head_fill(spark):
    df = _chunk_frame(spark, [5, 5, 5])
    packed = pack_chunks(df, max_tokens=4, n_buckets=1)
    stats = {
        r.seq_id: (r.n_chunks, r.head_tokens, float(r.head_fill))
        for r in pack_stats(packed, max_tokens=4).collect()
    }
    assert stats == {0: (1, 4, 1.0), 1: (1, 3, 0.75), 2: (1, 2, 0.5)}


def test_invalid_params(spark):
    df = _chunk_frame(spark, [1])
    with pytest.raises(ValueError):
        pack_chunks(df, max_tokens=0)
    with pytest.raises(ValueError):
        pack_chunks(df, n_buckets=0)


def test_packing_report_fill_bounds_and_conservation(spark, sf_dir):
    """Report invariants: token totals conserve the chunk stream, fill
    rate is in (0, 1], and a bucket's waste is bounded by one sequence
    (concat-and-chop: only the last sequence can be underfull)."""
    from airflow_retail_etl_spark.operators import chunking, packing
    from airflow_retail_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunking.chunk_documents(
        docs, "text", "doc_id", chunk_size=32, overlap=8
    )
    packed = packing.pack_chunks(chunks, max_tokens=128, n_buckets=8)
    rep = packing.packing_report(packed, max_tokens=128).collect()
    assert len(rep) == 8
    total = sum(r.total_tokens for r in rep)
    assert total == sum(
        r.n_chunk_tokens for r in chunks.collect()
    )
    for r in rep:
        assert 0 < r.fill_rate <= 1
        # waste < one max_tokens sequence per bucket
        assert r.n_seqs * 128 - r.total_tokens < 128
