"""Multimodal column plumbing (SURVEY §7.4 / BASELINE north star).

Media (image/audio/video) travels as an opaque ``binary`` column plus typed
metadata (schemas.MEDIA_SCHEMA). The Spark-side plumbing — schema, Arrow
batch shape, partition-parallel decode via ``mapInPandas`` — is real and
tested; the actual codec step is stubbed (no image/audio libraries in this
environment) behind ``decode_stub``:

- ``fake=True`` (default) produces a deterministic fake "decode" (byte stats
  + content hash) so pipelines and tests exercise the full path.
- ``fake=False`` raises NotImplementedError where a real codec (Pillow,
  torchaudio, pyav, …) would plug in.

Scale posture: decode runs per-partition in Arrow batches (one Python worker
round-trip per batch, not per row); metadata-only operations (filtering by
size/type, checksumming) stay JVM-side and never deserialize payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Output schema of extract_features — fixed, so downstream plans are stable.
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("checksum", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_stub(payload: bytes, media_type: str, *, fake: bool = True) -> list[float]:
    """Stand-in for a real media decoder.

    Real implementation would decode image pixels / audio samples / video
    frames here. The deterministic fake derives an 8-dim "feature" from
    byte statistics so the surrounding plumbing is fully testable.
    """
    if not fake:
        raise NotImplementedError(
            f"real {media_type} decoding requires codec libraries not "
            "available in this environment; plug in at decode_stub()"
        )
    if payload is None:
        return []
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:8]]


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a MEDIA_SCHEMA-shaped table from the documents fixture.

    Deterministic: payload = utf-8 bytes of the text, media_type cycles by
    id, metadata derived from byte length. Used by tests and the multimodal
    demo queries until a real binary corpus exists.
    """
    media = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        media.alias("media"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.struct(
            (F.length(media) % 1920).cast("int").alias("width"),
            (F.length(media) % 1080).cast("int").alias("height"),
            (F.length(media).cast("bigint") * 10).alias("duration_ms"),
            F.lit("stub").alias("codec"),
        ).alias("meta"),
    )


def extract_features(media_df: DataFrame, *, fake: bool = True) -> DataFrame:
    """Partition-parallel decode + feature extraction via mapInPandas.

    One Arrow batch in, one out; payload bytes never hit the driver. The
    checksum/byte-count could be computed JVM-side — they're included here
    to validate batch fidelity end-to-end against the JVM-computed values
    (see tests).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decode_stub(payload, mtype, fake=fake)
                for payload, mtype in zip(pdf["media"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [
                        len(p) if p is not None else None for p in pdf["media"]
                    ],
                    "checksum": [
                        hashlib.md5(p).hexdigest() if p is not None else None
                        for p in pdf["media"]
                    ],
                    "feature": feats,
                }
            )

    return media_df.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample_plan(media_df: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands (asset, duration) → frame rows
    JVM-side; the per-frame decode is the stubbed step.

    Demonstrates the scale pattern: the row explosion (cheap metadata) stays
    in Catalyst; only the leaf decode would run in Python batches.
    """
    n_frames = (F.col("meta.duration_ms") / every_ms).cast("int")
    return (
        media_df.filter(F.col("media_type") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
            ).alias("frame_idx"),
        )
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    )
