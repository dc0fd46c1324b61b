"""Exact shared-span detection (dedup.shared_span_pairs)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

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


def test_min_len_below_k_raises(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="detection floor"):
        shared_span_pairs(df, "text", "doc_id", k=16, min_len=10)


def test_cap_above_safe_max_refused_without_opt_in(spark):
    """Caps past SPAN_CAP_SAFE_MAX (=200) are refused unless
    unsafe_large_cap=True: the sf10 probe measured cap=400 DNF on
    shuffle-disk exhaustion — the guard turns SCALE.md's operational
    rule into code (round-9 verdict item 4). cap=None (exhaustive /
    verification mode) and caps ≤ the ceiling stay unguarded."""
    from airflow_retail_etl_spark.operators.dedup import (
        SPAN_CAP_SAFE_MAX,
        shared_span_pairs_cross,
    )

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="unsafe_large_cap"):
        shared_span_pairs(
            df, "text", "doc_id", k=8, min_len=20,
            max_doc_freq=SPAN_CAP_SAFE_MAX + 1,
        )
    with pytest.raises(ValueError, match="unsafe_large_cap"):
        shared_span_pairs_cross(
            df, df, "text", "doc_id", k=8, min_len=20, max_doc_freq=400
        )
    # opt-in unlocks, ceiling-or-below and None never guard
    for kw in (
        {"max_doc_freq": 400, "unsafe_large_cap": True},
        {"max_doc_freq": SPAN_CAP_SAFE_MAX},
        {"max_doc_freq": None},
    ):
        shared_span_pairs(df, "text", "doc_id", k=8, min_len=20, **kw)


# --- skew guard (SCALE.md): adversarial boilerplate corpus -----------------

HEADER = (
    "copyright acme corporation all rights reserved unauthorized "
    "reproduction of this document is strictly prohibited worldwide"
)


def _header_corpus(spark, n=1000):
    """Every doc opens with the same 120-char license header; exactly one
    pair additionally shares a long RARE paragraph. Uncapped, the header's
    k-grams alone put every doc pair on a shared anchor: ~n²/2 ≈ 500k
    span rows. The doc-frequency cap must keep candidate generation
    linear while reporting the rare pair's span exactly."""
    rare = (
        "the migratory patterns of the arctic tern span both polar "
        "circles covering seventy thousand kilometres each year"
    )
    rows = [(i, f"{HEADER} unique body text number {i}") for i in range(n)]
    rows.append((5000, f"{HEADER} first rare doc. {rare}"))
    rows.append((5001, f"{HEADER} second rare doc! {rare}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_anchor_cap_bounds_matches(spark):
    df = _header_corpus(spark)
    capped = shared_span_pairs(
        df, "text", "doc_id", k=16, min_len=60, max_doc_freq=50
    ).collect()
    # header anchors appear in all 1002 docs -> dropped before the
    # self-join; the 1000 boilerplate-only docs form NO pairs at all
    boiler = [r for r in capped if r["id_a"] < 5000]
    assert boiler == []
    # cross pairs (boilerplate doc x rare doc) only share the header too
    cross = [r for r in capped if r["id_a"] < 5000 or r["id_b"] < 5000]
    assert cross == []
    # the rare paragraph survives with EXACT coordinates: its anchors sit
    # in 2 docs, far under the cap
    hits = [r for r in capped if (r["id_a"], r["id_b"]) == (5000, 5001)]
    assert len(hits) == 1
    r = hits[0]
    na = _norm(f"{HEADER} first rare doc. " )
    nb = _norm(f"{HEADER} second rare doc! ")
    ta = _norm(df.filter("doc_id = 5000").first()["text"])
    tb = _norm(df.filter("doc_id = 5001").first()["text"])
    assert (
        ta[r["start_a"] - 1:r["start_a"] - 1 + r["span_len"]]
        == tb[r["start_b"] - 1:r["start_b"] - 1 + r["span_len"]]
    )
    assert r["span_len"] >= 60


def test_corpus_config_cap_reaches_excision(spark):
    """CorpusConfig.excise_max_doc_freq flows through excise_shared_spans:
    with the default cap, a corpus-wide header is NOT excised (its anchors
    are capped away); exhaustive mode (None) cuts it."""
    from airflow_retail_etl_spark.corpus_pipeline import (
        CorpusConfig,
        excise_shared_spans,
    )

    df = _header_corpus(spark, n=300)
    cfg = CorpusConfig(excise_min_span=60, excise_max_doc_freq=50)
    out = excise_shared_spans(df, cfg)
    # header survives in every later doc: the cap suppressed its anchors
    kept = out.filter(F.col("text").contains("copyright acme")).count()
    assert kept == out.count()
    # exhaustive mode on a SMALL slice does excise the header from later docs
    small = df.filter("doc_id < 5")
    cfg_ex = CorpusConfig(excise_min_span=60, excise_max_doc_freq=None)
    out_ex = {
        r["doc_id"]: r["text"]
        for r in excise_shared_spans(small, cfg_ex).collect()
    }
    assert "copyright acme" in out_ex[0]
    assert all("copyright acme" not in out_ex[i] for i in (1, 2, 3, 4))


def test_excised_text_is_normal_form_for_downstream(spark):
    """Span coordinates live in NORMALIZED text space; remove_spans output
    must be a fixed point of normalize_text so downstream chunk/pack
    stages (which normalize internally) see byte-identical input either
    way. Guards the corpus pipeline's silent coordinate contract."""
    from airflow_retail_etl_spark.operators import chunking
    from airflow_retail_etl_spark.operators.dedup import (
        normalize_text,
        remove_spans,
    )

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    spans = shared_span_pairs(df, "text", "doc_id", k=8, min_len=20)
    cleaned = remove_spans(df, spans, "text", "doc_id")
    # fixed point: normalize(text_clean) == text_clean, every doc
    assert cleaned.filter(
        normalize_text(F.col("text_clean")) != F.col("text_clean")
    ).count() == 0
    # and chunking the excised text directly equals chunking its
    # re-normalized form (byte-identical downstream view)
    a = chunking.chunk_documents(
        cleaned, "text_clean", "doc_id", chunk_size=8, overlap=2
    )
    renorm = cleaned.select(
        "doc_id", normalize_text(F.col("text_clean")).alias("text_clean")
    )
    b = chunking.chunk_documents(
        renorm, "text_clean", "doc_id", chunk_size=8, overlap=2
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
