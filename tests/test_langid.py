from __future__ import annotations

import pytest

from airflow_retail_etl_spark.operators.langid import (
    build_profiles,
    classify,
    lang_id,
)

# three fake "languages" with distinctive character inventories
CORPUS = [
    (1, "aa", "the cat sat on the mat with a hat"),
    (2, "aa", "a rat and a bat chat in the flat"),
    (3, "zz", "zzyx qzz yzzq xzyz zzzy qqzz"),
    (4, "zz", "zyq zzqx yzzy xqzz zqzy"),
    (5, "oo", "ooomph booom looop mooon sooon"),
    (6, "oo", "oodles of moods and floods"),
]

HELDOUT = [
    (10, "that cat has a fat hat"),      # → aa
    (11, "zzqy xzzy zqzz"),               # → zz
    (12, "ooom mooods loooop soooon"),    # → oo
]


@pytest.fixture(scope="module")
def labeled(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "lang", "text"])


def test_profiles_shape(labeled):
    profiles = build_profiles(labeled, top_k=20)
    rows = {r["lang"]: r["profile"] for r in profiles.collect()}
    assert set(rows) == {"aa", "zz", "oo"}
    assert all(0 < len(p) <= 20 for p in rows.values())
    assert any("zz" in g for g in rows["zz"])


def test_classify_heldout(spark, labeled):
    profiles = build_profiles(labeled, top_k=20)
    docs = spark.createDataFrame(HELDOUT, ["doc_id", "text"])
    out = {r["id"]: r["predicted_lang"] for r in classify(docs, profiles).collect()}
    assert out == {10: "aa", 11: "zz", 12: "oo"}


def test_lang_id_self_consistent(labeled):
    out = {r["id"]: r["predicted_lang"] for r in lang_id(labeled).collect()}
    # training docs classify to their own language
    assert out == {1: "aa", 2: "aa", 3: "zz", 4: "zz", 5: "oo", 6: "oo"}
