from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_retail_etl_spark.multimodal import (
    decode_stub,
    extract_features,
    frame_sample_plan,
    media_from_documents,
)
from airflow_retail_etl_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(30)
    return media_from_documents(docs)


def test_media_schema_shape(media):
    dtypes = dict(media.dtypes)
    assert dtypes["media"] == "binary"
    assert dtypes["media_type"] == "string"
    assert dtypes["meta"].startswith("struct<width:int")


def test_extract_features_roundtrip(spark, media):
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    # checksum computed in the Python batch must equal the JVM-side md5
    jvm = {
        r["asset_id"]: r["c"]
        for r in media.select(
            "asset_id", F.md5(F.col("media")).alias("c")
        ).collect()
    }
    for r in rows:
        assert r["checksum"] == jvm[r["asset_id"]]
        assert len(r["feature"]) == 8
        assert all(0.0 <= x <= 1.0 for x in r["feature"])


def test_decode_stub_real_path_is_gated():
    with pytest.raises(NotImplementedError):
        decode_stub(b"bytes", "image", fake=False)


def test_frame_sample_plan_explodes_jvm_side(media):
    frames = frame_sample_plan(media, every_ms=1000)
    row = frames.groupBy("asset_id").count().orderBy("asset_id").first()
    # duration_ms = 10 * n_bytes → n_frames = duration/1000
    src = media.filter(F.col("media_type") == "video").select(
        "asset_id", F.col("meta.duration_ms").alias("d")
    ).orderBy("asset_id").first()
    assert row["asset_id"] == src["asset_id"]
    assert row["count"] == max(src["d"] // 1000, 1)
    # no Python stage in this plan — it's all Catalyst
    assert "mapInPandas" not in frames._jdf.queryExecution().toString()
