"""Exact shared-span detection (dedup.shared_span_pairs)."""

from __future__ import annotations

import re

import pytest

from airflow_retail_etl_spark.operators.dedup import shared_span_pairs


def _norm(t: str) -> str:
    return re.sub(r"\s+", " ", t).strip().lower()


def _reference_spans(docs, k, min_len):
    """Brute-force diagonal method over normalized texts (1-based)."""
    out = set()
    norm = {i: _norm(t) for i, t in docs}
    ids = sorted(norm)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            ta, tb = norm[a], norm[b]
            grams_b = {}
            for p in range(len(tb) - k + 1):
                grams_b.setdefault(tb[p:p + k], []).append(p)
            diag_hits = {}
            for p in range(len(ta) - k + 1):
                for q in grams_b.get(ta[p:p + k], ()):
                    diag_hits.setdefault(p - q, set()).add(p)
            for diag, ps in diag_hits.items():
                ps = sorted(ps)
                run = [ps[0]]
                for p in ps[1:]:
                    if p == run[-1] + 1:
                        run.append(p)
                    else:
                        _emit(out, a, b, diag, run, k, min_len)
                        run = [p]
                _emit(out, a, b, diag, run, k, min_len)
    return out


def _emit(out, a, b, diag, run, k, min_len):
    span = run[-1] - run[0] + k
    if span >= min_len:
        out.add((a, b, run[0] + 1, run[0] - diag + 1, span))


SHARED = "the quick brown fox jumps over the lazy dog while it rains"
DOCS = [
    (1, f"intro text here. {SHARED} and then doc one ends."),
    (2, f"{SHARED} — doc two opens with it and diverges."),
    (3, "totally different content with no long overlap at all here."),
    (4, f"padding padding {SHARED} padding {SHARED} closing words."),
]


@pytest.fixture(scope="module")
def spans(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        (r["id_a"], r["id_b"], r["start_a"], r["start_b"], r["span_len"])
        for r in shared_span_pairs(
            df, "text", "doc_id", k=8, min_len=20
        ).collect()
    }


def test_matches_bruteforce_reference(spark, spans):
    assert spans == _reference_spans(DOCS, k=8, min_len=20)


def test_span_values_are_exact(spark, spans):
    # doc1 vs doc2 share exactly the SHARED sentence
    hits = [s for s in spans if s[0] == 1 and s[1] == 2]
    assert len(hits) == 1
    _, _, sa, sb, ln = hits[0]
    # maximal run = SHARED plus the space BOTH docs continue with
    assert ln == len(SHARED) + 1
    assert (
        _norm(DOCS[0][1])[sa - 1:sa - 1 + ln]
        == _norm(DOCS[1][1])[sb - 1:sb - 1 + ln]
        == SHARED.lower() + " "
    )
    # doc4 contains SHARED twice -> two alignments against doc2's one
    assert len([s for s in spans if s[0] == 2 and s[1] == 4]) == 2
    # doc3 overlaps nothing
    assert not [s for s in spans if 3 in (s[0], s[1])]


def test_min_len_filters(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    long_only = shared_span_pairs(
        df, "text", "doc_id", k=8, min_len=len(SHARED) + 10
    )
    assert long_only.count() == 0


def test_md5_family_matches_xxhash(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    kw = dict(k=8, min_len=20)
    x = {
        tuple(r) for r in shared_span_pairs(
            df, "text", "doc_id", hash_family="xxhash64", **kw
        ).collect()
    }
    m = {
        tuple(r) for r in shared_span_pairs(
            df, "text", "doc_id", hash_family="md5", **kw
        ).collect()
    }
    assert x == m


def test_remove_spans_excises_later_docs_only(spark):
    from airflow_retail_etl_spark.operators.dedup import remove_spans

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    spans = shared_span_pairs(df, "text", "doc_id", k=8, min_len=20)
    out = {
        r["doc_id"]: r
        for r in remove_spans(df, spans, "text", "doc_id").collect()
    }
    # first occurrence (doc 1) untouched; doc 3 never overlapped
    assert out[1]["n_removed_chars"] == 0
    assert out[1]["text_clean"] == _norm(DOCS[0][1])
    assert out[3]["n_removed_chars"] == 0
    # doc 2 loses exactly the shared run (incl the common trailing space)
    assert out[2]["n_removed_chars"] == len(SHARED) + 1
    assert SHARED.lower() not in out[2]["text_clean"]
    # doc 4 held TWO copies; overlapping span reports from both doc 1 and
    # doc 2 merge, both copies excised once each
    assert SHARED.lower() not in out[4]["text_clean"]
    assert out[4]["n_removed_chars"] >= 2 * len(SHARED)


def test_remove_spans_merges_overlapping_intervals(spark):
    from airflow_retail_etl_spark.operators.dedup import remove_spans

    df = spark.createDataFrame(
        [(1, "abcdefghij")], "doc_id long, text string"
    )
    spans = spark.createDataFrame(
        # overlapping [2,6) and [4,9) plus adjacent [9,10) -> merged [2,10)
        [(0, 1, 0, 2, 4), (0, 1, 0, 4, 5), (0, 1, 0, 9, 1)],
        "id_a long, id_b long, start_a int, start_b int, span_len int",
    )
    r = remove_spans(df, spans, "text", "doc_id").first()
    assert r["text_clean"] == "aj"
    assert r["n_removed_chars"] == 8


def test_doc_freq_cap_never_invents_spans(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    uncapped = {
        tuple(r) for r in shared_span_pairs(
            df, "text", "doc_id", k=8, min_len=20
        ).collect()
    }
    capped = shared_span_pairs(
        df, "text", "doc_id", k=8, min_len=20, max_doc_freq=2
    ).collect()
    # every capped span is contained in some uncapped span (caps can
    # split/shrink runs, never fabricate overlap)
    for r in capped:
        ok = any(
            u[0] == r["id_a"] and u[1] == r["id_b"]
            and u[2] <= r["start_a"]
            and r["start_a"] + r["span_len"] <= u[2] + u[4]
            for u in uncapped
        )
        assert ok, r
