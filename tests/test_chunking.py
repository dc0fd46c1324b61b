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


# ---------------------------------------------------------------------------
# fim_transform (fill-in-the-middle / PSM augmentation)
# ---------------------------------------------------------------------------


def test_fim_reconstruction_and_membership(spark):
    """Applied rows reassemble to the normalized text; membership and
    cut points equal the python md5 arithmetic exactly."""
    import hashlib

    from airflow_retail_etl_spark.operators.chunking import fim_transform

    docs = spark.createDataFrame(
        [(i, f"doc {i} " + "lorem ipsum dolor sit amet " * 4)
         for i in range(40)],
        "doc_id long, text string",
    )
    rows = fim_transform(docs, rate=0.5, min_chars=32, seed="fim").collect()
    assert len(rows) == 40

    def u64(tag, i):
        return int(
            hashlib.md5(f"fim:{tag}\x1f{i}".encode()).hexdigest()[:16], 16
        )

    n_applied = 0
    import re

    for r in rows:
        # rebuild the exact normalized text the engine saw
        raw = f"doc {r['doc_id']} " + "lorem ipsum dolor sit amet " * 4
        norm = re.sub(r"\s+", " ", raw).strip().lower()
        ln = len(norm)
        expect_applied = ln >= 32 and u64("apply", r["doc_id"]) < 2**63
        assert r["fim_applied"] == expect_applied
        if not expect_applied:
            assert r["fim_text"] == norm
            assert r["prefix_len"] is None
            continue
        n_applied += 1
        c1 = 1 + u64("p1", r["doc_id"]) % (ln - 1)
        c2 = 1 + u64("p2", r["doc_id"]) % (ln - 1)
        lo, hi = min(c1, c2), max(c1, c2)
        assert (r["prefix_len"], r["middle_len"], r["suffix_len"]) == (
            lo, hi - lo, ln - hi,
        )
        expected = (
            "<pre>" + norm[:lo] + "<suf>" + norm[hi:] + "<mid>" + norm[lo:hi]
        )
        assert r["fim_text"] == expected
        assert r["prefix_len"] >= 1 and r["suffix_len"] >= 1
        assert r["prefix_len"] + r["middle_len"] + r["suffix_len"] == ln
    assert 0 < n_applied < 40  # the draw actually splits the corpus


def test_fim_rate_edges_short_and_null_docs(spark):
    from airflow_retail_etl_spark.operators.chunking import fim_transform

    docs = spark.createDataFrame(
        [(1, "x " * 40), (2, "tiny"), (3, None), (4, "a")],
        "doc_id long, text string",
    )
    none = fim_transform(docs, rate=0.0).collect()
    assert all(not r["fim_applied"] for r in none)
    allr = {r["doc_id"]: r for r in fim_transform(docs, rate=1.0).collect()}
    assert allr[1]["fim_applied"]            # long doc always in at rate 1
    assert not allr[2]["fim_applied"]        # below min_chars
    assert not allr[3]["fim_applied"] and allr[3]["fim_text"] == ""
    assert not allr[4]["fim_applied"]        # ln == 1: NULLIF guard path
    import pytest

    with pytest.raises(ValueError, match="rate"):
        fim_transform(docs, rate=1.5)
    with pytest.raises(ValueError, match="min_chars"):
        fim_transform(docs, min_chars=1)


def test_fim_is_zero_shuffle_projection(spark):
    from airflow_retail_etl_spark.operators.chunking import fim_transform

    docs = spark.createDataFrame(
        [(1, "x " * 40)], "doc_id long, text string"
    )
    plan = (
        fim_transform(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
