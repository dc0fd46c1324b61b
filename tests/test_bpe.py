from __future__ import annotations

import re
from collections import Counter

from airflow_retail_etl_spark.operators.bpe import (
    EOW,
    apply_bpe,
    learn_bpe_merges,
    word_shapes,
)


def _ref_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Pure-Python reference BPE (greedy left-to-right merge)."""
    words: Counter = Counter()
    for t in texts:
        norm = re.sub(r"\s+", " ", t.strip().lower())
        if norm:
            words.update(norm.split(" "))
    shapes = {tuple(list(w) + [EOW]): c for w, c in words.items()}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in shapes.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # deterministic: max count, then lexicographically smallest (a, b)
        top_n = max(pairs.values())
        cands = sorted(p for p, n in pairs.items() if n == top_n)
        a, b = cands[0]
        merges.append((a, b))
        new_shapes = {}
        for syms, c in shapes.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            new_shapes[tuple(out)] = new_shapes.get(tuple(out), 0) + c
        shapes = new_shapes
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "wider wide wide widest",
]


def test_word_shapes_chars_plus_eow(spark):
    df = spark.createDataFrame([("ab ab c",)], ["text"])
    rows = {tuple(r.syms): r.weight for r in word_shapes(df, "text").collect()}
    assert rows == {("a", "b", EOW): 2, ("c", EOW): 1}


def test_merges_match_reference_implementation(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    got = learn_bpe_merges(df, "text", n_merges=10)
    assert got == _ref_bpe(TEXTS, 10)


def test_overlapping_pairs_merge_greedily(spark):
    df = spark.createDataFrame([(1, "aaa aaa aaa aaa")], ["doc_id", "text"])
    merges = learn_bpe_merges(df, "text", n_merges=1)
    assert merges == [("a", "a")]
    row = apply_bpe(df, "text", "doc_id", merges).collect()[0]
    # greedy left-to-right: aaa</w> → ["aa", "a", EOW]
    assert row.bpe_tokens[:2] == ["aa", "a"]


def test_apply_bpe_reconstructs_words(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )
    merges = learn_bpe_merges(df, "text", n_merges=8)
    out = {r.id: r for r in apply_bpe(df, "text", "doc_id", merges).collect()}
    for i, t in enumerate(TEXTS):
        norm = re.sub(r"\s+", " ", t.strip().lower())
        joined = "".join(out[i].bpe_tokens).replace(EOW, "")
        assert joined == norm.replace(" ", "")
        assert out[i].n_bpe_tokens == len(out[i].bpe_tokens)
        # merging strictly reduces or preserves token count vs chars
        n_chars = len(norm.replace(" ", "")) + len(norm.split(" "))
        assert out[i].n_bpe_tokens <= n_chars


def test_driver_path_job_count_at_least_8x_fewer(spark):
    """The sufficient-statistic path must run ≤ 8 Spark jobs for 32
    merges (the old loop ran 2 per merge = 64; bar is ≥8× fewer)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS * 10)], ["doc_id", "text"]
    )
    st = spark.sparkContext.statusTracker()
    before = max(st.getJobIdsForGroup() or [0])
    merges = learn_bpe_merges(df, "text", n_merges=32)
    jobs = len([j for j in (st.getJobIdsForGroup() or []) if j > before])
    assert merges  # it actually learned something
    assert jobs <= 8, jobs


def test_distributed_fallback_equals_driver_path(spark, sf_dir):
    """Force the distributed batched loop (max_driver_words=0) and pin
    it merge-for-merge against the driver sufficient-statistic path on
    a real corpus slice — including the regime where naive (cap-free)
    batching is KNOWN to diverge from sequential order (sf0.001
    documents diverge at merge 23 without the _safe_batch cap rule)."""
    from airflow_retail_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    seq = learn_bpe_merges(docs, "text", n_merges=32)
    dist = learn_bpe_merges(
        docs, "text", n_merges=32, max_driver_words=0
    )
    assert dist == seq


MARKER_TEXTS = [
    # corpus text containing every marker char the string-form merge
    # pass uses internally: the symbol wrapper •, the word joiner ‖,
    # and the escape lead-in ␛ (round-8 advice: a literal • corrupted
    # the distributed symbol stream and broke driver≡distributed parity)
    "low• low• lower• •low low",
    "a‖b a‖b a‖b c␛d c␛d",
    "•␛‖ •␛‖ •• ‖‖ ␛␛ ␛b ␛e ␛w",
    "new newer newest new",
]


def test_marker_chars_driver_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in MARKER_TEXTS], ["text"])
    got = learn_bpe_merges(df, "text", n_merges=12)
    assert got == _ref_bpe(MARKER_TEXTS, 12)


def test_marker_chars_distributed_matches_driver(spark):
    """The exact round-8 advice repro: the distributed fallback must
    produce the IDENTICAL merge list on text containing the separator."""
    df = spark.createDataFrame([(t,) for t in MARKER_TEXTS], ["text"])
    seq = learn_bpe_merges(df, "text", n_merges=12)
    dist = learn_bpe_merges(df, "text", n_merges=12, max_driver_words=0)
    assert dist == seq


def test_marker_chars_oracle_matches_spark(spark, tmp_path):
    """Cross-engine certificate ON marker-laden text (round-9 advice):
    the bpe_tokenize / tokenizer_fertility DuckDB oracles must escape
    • / ‖ / ␛ exactly like the Spark side, not merely agree on
    marker-free testdata. Runs both engines over a marker corpus and
    compares the full rows."""
    import duckdb

    import __spark_entry__ as entry

    rows = [
        (i, t, ["en", "de"][i % 2], "web", len(t))
        for i, t in enumerate(MARKER_TEXTS)
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    for name in ("bpe_tokenize", "tokenizer_fertility"):
        got = [
            tuple(r)
            for r in entry.queries()[name](spark, d).collect()
        ]
        want = [
            tuple(r)
            for r in con.sql(entry.oracle_sql()[name]).fetchall()
        ]
        assert got == want, name


def test_marker_chars_apply_bpe_roundtrip(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(MARKER_TEXTS)], ["doc_id", "text"]
    )
    merges = learn_bpe_merges(df, "text", n_merges=8)
    out = {r.id: r for r in apply_bpe(df, "text", "doc_id", merges).collect()}
    for i, t in enumerate(MARKER_TEXTS):
        norm = re.sub(r"\s+", " ", t.strip().lower())
        joined = "".join(out[i].bpe_tokens).replace(EOW, "")
        assert joined == norm.replace(" ", "")
        assert out[i].n_bpe_tokens == len(out[i].bpe_tokens)
