from __future__ import annotations

import pytest

from airflow_retail_etl_spark.operators import dedup

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of 1
    (3, "The quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 1 (case)
    (4, "completely unrelated text about database query engines and joins"),
    (5, "spark sql catalyst optimizer rewrites logical plans into physical"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_dedup_groups(docs):
    out = {r["keeper_id"]: r["n_copies"] for r in dedup.exact_dedup(docs, "text", "doc_id").collect()}
    assert out[1] == 2  # docs 1+3 collapse
    assert out[2] == 1 and out[4] == 1 and out[5] == 1


def test_jaccard_pairs_exact(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(docs, "text", "doc_id").collect()
    }
    assert pairs[(1, 3)] == 1.0  # exact dup after normalization
    assert 0.5 < pairs[(1, 2)] < 1.0  # near dup
    assert (1, 4) not in pairs or pairs[(1, 4)] < 0.2


def test_minhash_lsh_finds_neardups_verified(docs):
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_pairs(
            docs, "text", "doc_id", min_jaccard=0.5
        ).collect()
    }
    # LSH must catch the exact dup and the near dup; jaccard values are exact
    assert out[(1, 3)] == 1.0
    assert 0.5 < out[(1, 2)] < 1.0
    assert all(j >= 0.5 for j in out.values())


def test_minhash_agrees_with_bruteforce(spark):
    # on a corpus with plenty of near-dups, LSH(τ=0.5) recovers the same
    # pair set as exact jaccard thresholding (high-J pairs ⇒ near-certain
    # LSH collision with 16 bands of 4)
    rows = []
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    for i in range(20):
        words = base.split()
        words[i % 10] = f"w{i}"
        rows.append((i, " ".join(words)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.jaccard_pairs(
            df, "text", "doc_id", min_jaccard=0.6
        ).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(
            df, "text", "doc_id", min_jaccard=0.6
        ).collect()
    }
    assert exact  # sanity: the corpus does contain near-dups
    assert lsh == exact


def test_simhash_properties(docs):
    sigs = {r["id"]: r["simhash"] for r in dedup.simhash(docs, "text", "doc_id").collect()}
    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")
    # identical normalized docs → identical signature
    assert sigs[1] == sigs[3]
    # near-dup → closer than unrelated
    assert hamming(sigs[1], sigs[2]) < hamming(sigs[1], sigs[4])


def test_simhash_pairs_banding(docs):
    sigs = dedup.simhash(docs, "text", "doc_id")
    out = {(r["id_a"], r["id_b"]): r["hamming"] for r in dedup.simhash_pairs(sigs, max_hamming=3).collect()}
    assert out[(1, 3)] == 0
