from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airflow_retail_etl_spark.sources.jsonl import (
    read_jsonl,
    split_valid,
    write_jsonl,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("meta", T.StructType(
            [T.StructField("lang", T.StringType())]
        )),
    ]
)

LINES = [
    '{"doc_id": 1, "text": "hello world", "meta": {"lang": "en"}}',
    '{"doc_id": 2, "text": "bonjour", "meta": {"lang": "fr"}}',
    '{"doc_id": 3, "text": "truncated...',            # torn line
    'not json at all',                                # garbage
    '{"doc_id": 4, "text": null, "meta": null}',      # legit nulls
]


@pytest.fixture(scope="module")
def feed(tmp_path_factory):
    p = tmp_path_factory.mktemp("jsonl") / "corpus.jsonl"
    p.write_text("\n".join(LINES) + "\n")
    return str(p)


def test_corrupt_lines_quarantined_not_fatal(spark, feed):
    clean, bad = split_valid(read_jsonl(spark, feed, SCHEMA))
    assert {r["doc_id"] for r in clean.collect()} == {1, 2, 4}
    assert bad.count() == 2
    raw = {r["_corrupt_record"] for r in bad.collect()}
    assert "not json at all" in raw


def test_nested_schema_lands_typed(spark, feed):
    clean, _ = split_valid(read_jsonl(spark, feed, SCHEMA))
    langs = {
        r["doc_id"]: r["lang"]
        for r in clean.select("doc_id", F.col("meta.lang").alias("lang"))
        .collect()
    }
    assert langs == {1: "en", 2: "fr", 4: None}


def test_round_trip_splittable_codec(spark, feed, tmp_path):
    clean, _ = split_valid(read_jsonl(spark, feed, SCHEMA))
    out = str(tmp_path / "out")
    write_jsonl(clean, out)   # zstd with native hadoop, else bzip2
    import glob
    parts = glob.glob(f"{out}/part-*")
    assert parts and all(
        p.endswith((".zst", ".bz2")) for p in parts
    ), f"splittable codec expected, got {parts}"
    back, bad = split_valid(read_jsonl(spark, out, SCHEMA))
    assert bad.count() == 0
    assert sorted(
        (r["doc_id"], r["text"]) for r in back.collect()
    ) == sorted((r["doc_id"], r["text"]) for r in clean.collect())


def test_no_schema_inference_pass(spark, feed):
    # the reader must take the schema as given — a field absent from the
    # data stays NULL-typed per the contract rather than being dropped
    extra = T.StructType(
        [*SCHEMA.fields, T.StructField("absent", T.DoubleType())]
    )
    clean, _ = split_valid(read_jsonl(spark, feed, extra))
    assert clean.schema["absent"].dataType == T.DoubleType()
    assert clean.filter(F.col("absent").isNotNull()).count() == 0
