"""Unigram-LM scoring and TF-IDF keyword extraction (operators/lm.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from airflow_retail_etl_spark.operators import lm


@pytest.fixture(scope="module")
def toy_docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, "  "),          # whitespace-only → 0 tokens
            (4, "zebra zebra"),
        ],
        ["doc_id", "text"],
    )


def test_unigram_model_probabilities(toy_docs):
    m = {r["tok"]: r for r in lm.unigram_model(toy_docs).collect()}
    # 11 tokens total: the×3, sat×2, zebra×2, cat/on/mat/dog×1
    assert m["the"]["n"] == 3 and m["zebra"]["n"] == 2
    total = sum(r["n"] for r in m.values())
    assert total == 11
    assert m["the"]["logp"] == pytest.approx(math.log(3 / 11))


def test_unigram_score_matches_hand_computation(toy_docs):
    out = {
        r["id"]: r for r in lm.unigram_score(toy_docs, "text", "doc_id").collect()
    }
    # doc 4: both tokens are "zebra" (p = 2/11)
    assert out[4]["n_tokens"] == 2
    assert out[4]["avg_nll"] == pytest.approx(-math.log(2 / 11), abs=1e-6)
    # empty doc surfaces with 0 tokens and NULL score
    assert out[3]["n_tokens"] == 0 and out[3]["avg_nll"] is None
    # doc 1: "the"×2 (p=3/11), "sat" (p=2/11), hapax cat/on/mat (p=1/11)
    expected = -(
        2 * round(math.log(3 / 11), 9)
        + round(math.log(2 / 11), 9)
        + 3 * round(math.log(1 / 11), 9)
    ) / 6
    assert out[1]["avg_nll"] == pytest.approx(expected, abs=1e-6)


def test_unigram_score_token_count(toy_docs):
    out = {
        r["id"]: r["n_tokens"]
        for r in lm.unigram_score(toy_docs, "text", "doc_id").collect()
    }
    assert out == {1: 6, 2: 3, 3: 0, 4: 2}


def test_unigram_external_model_and_oov(spark, toy_docs):
    model = lm.unigram_model(toy_docs)
    new = spark.createDataFrame([(9, "the qwertyuiop")], ["doc_id", "text"])
    row = lm.unigram_score(
        new, "text", "doc_id", model=model, unseen_logp=-30.0
    ).collect()[0]
    expected = (round(-math.log(3 / 11), 9) + 30.0) / 2
    assert row["avg_nll"] == pytest.approx(expected, abs=1e-6)


def test_tfidf_ranks_characteristic_terms_first(toy_docs):
    out = lm.tfidf_keywords(toy_docs, "text", "doc_id", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append(r)
    top2 = [r["term"] for r in sorted(by_doc[2], key=lambda r: r["rank"])]
    # "dog" is unique to doc 2 → beats corpus-wide "the"/"sat"
    assert top2[0] == "dog"
    assert "the" not in top2  # df=2 for "the"... appears in 2 docs
    # ranks are 1..k, dense per doc
    for rows in by_doc.values():
        assert sorted(r["rank"] for r in rows) == list(
            range(1, len(rows) + 1)
        )


def test_tfidf_k_bound_and_determinism(toy_docs):
    a = lm.tfidf_keywords(toy_docs, "text", "doc_id", k=3).collect()
    b = lm.tfidf_keywords(toy_docs, "text", "doc_id", k=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_doc = {}
    for r in a:
        per_doc[r["id"]] = per_doc.get(r["id"], 0) + 1
    assert all(n <= 3 for n in per_doc.values())


def test_no_python_udfs_in_lm_plans(toy_docs):
    for df in (
        lm.unigram_score(toy_docs, "text", "doc_id"),
        lm.tfidf_keywords(toy_docs, "text", "doc_id"),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_bigram_score_hand_computation(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "x")],
        ["doc_id", "text"],
    )
    out = {r["id"]: r for r in lm.bigram_score(docs, "text", "doc_id").collect()}
    # corpus bigrams: doc1 → (a b), (b a), (a b); doc2 → (a b)
    # c(a b)=3, c(b a)=1, ctx a→3, b→1... ctx(a)=3? "a b" appears 3x and
    # "a ?" only as "a b" → p(b|a) = 3/3 = 1; p(a|b) = 1/1 = 1
    import math
    assert out[1]["n_bigrams"] == 3
    assert out[1]["avg_nll"] == pytest.approx(0.0, abs=1e-9)
    assert out[2]["n_bigrams"] == 1
    # single-token doc: no bigrams
    assert out[3]["n_bigrams"] == 0 and out[3]["avg_nll"] is None


def test_bigram_flags_word_salad(spark):
    # repeated fluent phrase vs a permutation with unseen transitions:
    # unigram model sees identical token bags, bigram nll separates them
    fluent = "the cat sat on the mat"
    rows = [(i, fluent) for i in range(10)] + [(99, "mat the on sat cat the")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    uni = {r["id"]: r["avg_nll"] for r in lm.unigram_score(docs, "text", "doc_id").collect()}
    bi = {r["id"]: r["avg_nll"] for r in lm.bigram_score(docs, "text", "doc_id").collect()}
    assert uni[99] == pytest.approx(uni[0], abs=1e-6)   # unigram can't tell
    assert bi[99] > bi[0] + 1.0                          # bigram can


def test_bigram_min_count_bounds_model(spark):
    # adversarial vocabulary: every document contributes unique bigrams, so
    # the unfloored model grows with the corpus; min_count=2 keeps only the
    # repeated fluent phrase's transitions and scores everything else unseen
    fluent = "the cat sat"
    rows = [(i, fluent) for i in range(5)] + [
        (100 + i, f"tok{i}a tok{i}b tok{i}c") for i in range(20)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["id"]: r
        for r in lm.bigram_score(
            docs, "text", "doc_id", min_count=2
        ).collect()
    }
    # fluent docs: both transitions kept (count 5 ≥ 2), deterministic p=1
    assert out[0]["avg_nll"] == pytest.approx(0.0, abs=1e-9)
    # unique-pair docs: every bigram floored out of the model → unseen
    assert out[100]["avg_nll"] == pytest.approx(30.0, abs=1e-6)
    # and the default floor of 1 is the identity (the oracle relies on it)
    unfloored = {
        r["id"]: r["avg_nll"]
        for r in lm.bigram_score(docs, "text", "doc_id").collect()
    }
    floored1 = {
        r["id"]: r["avg_nll"]
        for r in lm.bigram_score(docs, "text", "doc_id", min_count=1).collect()
    }
    assert unfloored == floored1


def test_scores_invariant_under_partitioning(spark, sf_dir):
    """The DECIMAL-accumulation policy's point: re-partitioning the corpus
    never changes a score bit."""
    from airflow_retail_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    variants = []
    for parts in (1, 7):
        d = docs.repartition(parts)
        uni = sorted(map(tuple, lm.unigram_score(d, "text", "doc_id").collect()))
        bi = sorted(map(tuple, lm.bigram_score(d, "text", "doc_id").collect()))
        tfi = sorted(map(tuple, lm.tfidf_keywords(d, "text", "doc_id").collect()))
        variants.append((uni, bi, tfi))
    assert variants[0] == variants[1]


def test_collocations_lift_hand_computed(spark):
    from airflow_retail_etl_spark.operators.lm import collocations

    # "x y" always adjacent (4×); fillers keep unigrams busy
    rows = [
        (1, "x y a b a b a b"),
        (2, "x y b a b a b a"),
        (3, "x y a a b b a b"),
        (4, "x y b b a a a b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = collocations(df, k=5, min_pair_count=4).collect()
    assert out, "floor=4 must keep the 4x pair"
    top = out[0]
    assert top["bg"] == "x y"
    # T=32 tokens, P=28 pairs, c(xy)=4, c(x)=4, c(y)=4
    assert top["lift"] == round((4 * 32.0 * 32) / (28.0 * 4 * 4), 6)
    assert top["rank"] == 1


def test_collocations_floor_drops_rare_pairs(spark):
    from airflow_retail_etl_spark.operators.lm import collocations

    df = spark.createDataFrame(
        [(1, "p q"), (2, "r s"), (3, "p q")], "doc_id long, text string"
    )
    kept = {r["bg"] for r in collocations(df, min_pair_count=2).collect()}
    assert kept == {"p q"}


def test_minkprob_tail_semantics(spark):
    """Min-K tail = exactly ceil(n/k_divisor) most-surprising tokens;
    memorized-typical docs score lower than outlier-bearing ones."""
    import math

    from airflow_retail_etl_spark.operators.lm import minkprob_score

    docs = spark.createDataFrame(
        [
            (1, "common common common common common"),        # all typical
            (2, "common common common common zzrare"),        # one outlier
            (3, ""),                                          # empty
        ],
        "doc_id long, text string",
    )
    rows = {r["id"]: r for r in minkprob_score(docs).collect()}
    assert rows[1]["n_tokens"] == 5 and rows[1]["n_tail"] == 1
    assert rows[2]["n_tail"] == 1
    # doc 2's tail is its rare token -> strictly higher tail NLL
    assert rows[2]["tail_nll"] > rows[1]["tail_nll"]
    # corpus: 9 'common', 1 'zzrare', N=10
    assert rows[1]["tail_nll"] == round(
        round(-math.log(9 / 10), 9), 6
    )
    assert rows[2]["tail_nll"] == round(
        round(-math.log(1 / 10), 9), 6
    )
    assert rows[3]["n_tokens"] == 0 and rows[3]["tail_nll"] is None


def test_minkprob_tail_is_count_exact_under_ties(spark):
    from airflow_retail_etl_spark.operators.lm import minkprob_score

    # 10 identical tokens: every rank cut is a tie; n_tail must still be
    # exactly ceil(10/5)=2 and the mean equals the single NLL value
    docs = spark.createDataFrame(
        [(1, " ".join(["tok"] * 10))], "doc_id long, text string"
    )
    r = minkprob_score(docs).first()
    assert (r["n_tokens"], r["n_tail"]) == (10, 2)
    assert r["tail_nll"] == 0.0  # p(tok)=1 -> NLL 0


def test_frequency_spectrum_known_corpus(spark):
    from airflow_retail_etl_spark.operators.lm import frequency_spectrum

    # corpus: a a a b b c  -> k=1:{c}, k=2:{b}, k=3:{a}; total 6, vocab 3
    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "b c")], "doc_id long, text string"
    )
    rows = {r["occurrences"]: r for r in frequency_spectrum(docs).collect()}
    assert {k: rows[k]["n_types"] for k in rows} == {1: 1, 2: 1, 3: 1}
    assert rows[1]["type_share"] == round(1 / 3, 6)     # hapax rate
    assert rows[3]["mass_share"] == 0.5                 # 'a' mass 3/6
    assert sum(r["mass_share"] for r in rows.values()) == 1.0


def test_keyword_divergence_chi2_and_direction(spark):
    """Hand-checkable 2x2 chi-square: a token exclusive to A tops the
    ranking with the textbook statistic; shared-rate tokens score 0;
    enriched_in reports the right side; min_count suppresses rare."""
    from airflow_retail_etl_spark.operators.lm import keyword_divergence

    a = spark.createDataFrame(
        [(1, "x x x x x common common common common common")],
        ["doc_id", "text"],
    )
    b = spark.createDataFrame(
        [(2, "y y y y y common common common common common")],
        ["doc_id", "text"],
    )
    rows = {r.tok: r for r in keyword_divergence(a, b, k=10).collect()}
    # x: a=5,b=0, Ta=Tb=10, N=20 -> chi2 = 20*(5*10-0*5)^2/(5*15*10*10)
    assert rows["x"].chi2 == round(20 * (50.0) ** 2 / (5 * 15 * 100), 6)
    assert rows["x"].enriched_in == "a"
    assert rows["y"].enriched_in == "b"
    assert rows["common"].chi2 == 0.0
    assert rows["common"].enriched_in == "equal"
    # min_count: a 1-off token never appears
    a2 = a.union(
        spark.createDataFrame([(3, "rareword")], ["doc_id", "text"])
    )
    toks = {r.tok for r in keyword_divergence(a2, b, k=10).collect()}
    assert "rareword" not in toks
