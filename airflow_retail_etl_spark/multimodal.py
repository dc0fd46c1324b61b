"""Multimodal column plumbing (SURVEY §7.4 / BASELINE north star).

Media (image/audio/video) travels as an opaque ``binary`` column plus typed
metadata (schemas.MEDIA_SCHEMA). The Spark-side plumbing — schema, Arrow
batch shape, partition-parallel decode via ``mapInPandas`` — is real and
tested, and so are three pure-Python codecs that need no external library:

- WAV (RIFF PCM16) via the stdlib ``wave`` module + numpy sample stats;
- PPM (P6 binary) via direct byte parsing;
- "video" as concatenated PPM frames (one decode per frame, frame count and
  per-frame stats extracted).

``decode_stub(fake=True)`` remains the deterministic byte-stats fake for
pipelines whose payloads aren't in one of those formats; ``fake=False`` now
performs a REAL decode of the payload (and raises ValueError for formats it
cannot parse — the plug point for Pillow/torchaudio/pyav codecs).

Scale posture: decode runs per-partition in Arrow batches (one Python worker
round-trip per batch, not per row); metadata-only operations (filtering by
size/type, checksumming) stay JVM-side and never deserialize payloads.
"""

from __future__ import annotations

import functools as _functools
import hashlib
import io
import struct
import wave
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


#: Output schema of decode_media over mapInPandas — unified across media
#: types (inapplicable fields are NULL), so one frame serves mixed corpora.
DECODE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("sample_width", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_ms", T.DoubleType(), True),
        T.StructField("peak", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("maxval", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
    ]
)

_VIDEO_FRAME_MS = 40.0  # 25 fps


def decode_wav(payload: bytes) -> dict:
    """Real RIFF/PCM WAV decode: header via the stdlib ``wave`` parser,
    sample statistics via numpy over the raw frames. 16-bit PCM only (the
    synthesizer's format); wave itself rejects non-PCM."""
    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        n_channels = w.getnchannels()
        sample_width = w.getsampwidth()
        sample_rate = w.getframerate()
        n_frames = w.getnframes()
        raw = w.readframes(n_frames)
    if sample_width != 2:
        raise ValueError(f"only PCM16 supported, got width {sample_width}")
    samples = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "sample_width": sample_width,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000.0 / sample_rate,
        "peak": float(np.max(np.abs(samples))) if samples.size else None,
        "rms": float(np.sqrt(np.mean(samples**2))) if samples.size else None,
    }


def _parse_ppm_header(payload: bytes, off: int) -> tuple[int, int, int, int]:
    """Parse one P6 header starting at ``off``; returns (w, h, maxval,
    pixel_data_offset). Raises ValueError on malformed input."""
    if payload[off : off + 2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    fields: list[int] = []
    i = off + 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment line
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval, then raw pixels
    return fields[0], fields[1], fields[2], i


def decode_ppm(payload: bytes, off: int = 0) -> tuple[dict, int]:
    """Real binary-PPM (P6) decode from ``off``: header + per-channel pixel
    means via numpy. Returns (stats, offset past this image) so video
    payloads (concatenated frames) can be walked frame by frame."""
    import numpy as np

    w, h, maxval, data_off = _parse_ppm_header(payload, off)
    end = data_off + 3 * w * h
    if end > len(payload):
        raise ValueError("truncated PPM pixel data")
    px = np.frombuffer(payload[data_off:end], dtype=np.uint8).reshape(h, w, 3)
    means = px.astype(np.float64).mean(axis=(0, 1))
    stats = {
        "width": w,
        "height": h,
        "maxval": maxval,
        "mean_r": float(means[0]),
        "mean_g": float(means[1]),
        "mean_b": float(means[2]),
    }
    return stats, end


def decode_video_ppm(payload: bytes) -> dict:
    """Decode a concatenated-P6-frames "video": frame count, first-frame
    geometry, per-channel means across ALL frames."""
    frames = []
    off = 0
    while off < len(payload):
        stats, off = decode_ppm(payload, off)
        frames.append(stats)
    n = len(frames)
    return {
        "width": frames[0]["width"],
        "height": frames[0]["height"],
        "maxval": frames[0]["maxval"],
        "n_frames": n,
        "duration_ms": n * _VIDEO_FRAME_MS,
        "mean_r": sum(f["mean_r"] for f in frames) / n,
        "mean_g": sum(f["mean_g"] for f in frames) / n,
        "mean_b": sum(f["mean_b"] for f in frames) / n,
    }


def decode_payload(payload: bytes, media_type: str) -> dict:
    """Dispatch a REAL decode by media type. ValueError for undecodable
    payloads — the honest failure mode (and the plug point for richer
    codecs: Pillow/torchaudio/pyav would slot in here)."""
    if media_type == "audio":
        return decode_wav(payload)
    if media_type == "image":
        return decode_ppm(payload)[0]
    if media_type == "video":
        return decode_video_ppm(payload)
    raise ValueError(f"no decoder for media_type={media_type!r}")


def decode_stub(payload: bytes, media_type: str, *, fake: bool = True) -> list[float]:
    """Feature leaf: deterministic byte-stats fake, or a REAL decode.

    ``fake=True`` derives an 8-dim "feature" from a content hash — for
    payloads in formats we can't parse. ``fake=False`` decodes the payload
    (WAV/PPM/concatenated-PPM) and returns an 8-dim feature of real decoded
    quantities; raises ValueError if the payload isn't parseable.
    """
    if payload is None:
        return []
    if not fake:
        d = decode_payload(bytes(payload), media_type)
        return [
            float(d.get("n_frames") or 0),
            float(d.get("sample_rate") or 0),
            float(d.get("duration_ms") or 0),
            float(d.get("rms") or 0.0),
            float(d.get("width") or 0),
            float(d.get("height") or 0),
            float(d.get("mean_r") or 0.0),
            float(d.get("mean_g") or 0.0),
        ]
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


def synth_payload(doc_id: int, media_type: str) -> bytes:
    """Deterministic real-format payload for ``doc_id`` — the synthesis
    contract the correctness oracle predicts (see __spark_entry__
    multimodal_decode):

    - audio: mono PCM16 WAV, 8000 Hz, n = 100 + 2·(id % 200) frames of an
      alternating ±A square wave with A = 1000 + id % 29000 — so peak = A
      and rms = A exactly (A² is a perfect square in float64), mean = 0.
    - image: binary PPM (P6), w = 8 + id % 32, h = 8 + id % 16, constant
      color (id % 256, 7·id % 256, 13·id % 256) — channel means are exact.
    - video: 2 + id % 4 concatenated PPM frames of that image.
    """
    if media_type == "audio":
        amp = 1000 + doc_id % 29000
        n = 100 + 2 * (doc_id % 200)
        pcm = struct.pack(
            f"<{n}h", *[amp if i % 2 == 0 else -amp for i in range(n)]
        )
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(pcm)
        return buf.getvalue()
    w_, h_ = 8 + doc_id % 32, 8 + doc_id % 16
    rgb = bytes([doc_id % 256, (7 * doc_id) % 256, (13 * doc_id) % 256])
    frame = b"P6\n%d %d\n255\n" % (w_, h_) + rgb * (w_ * h_)
    if media_type == "image":
        return frame
    if media_type == "video":
        return frame * (2 + doc_id % 4)
    raise ValueError(f"no synthesizer for media_type={media_type!r}")


def synth_media_corpus(docs: DataFrame) -> DataFrame:
    """(asset_id, media_type, media) with REAL format bytes per document.

    The synthesis leaf runs in Arrow batches via mapInPandas (same shape as
    a real ingest decode); media_type cycles by id like media_from_documents.
    """
    types = ["image", "audio", "video"]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            mtypes = [types[i % 3] for i in ids]
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "media_type": mtypes,
                    "media": [
                        synth_payload(int(i), t) for i, t in zip(ids, mtypes)
                    ],
                }
            )

    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("media_type", T.StringType(), False),
            T.StructField("media", T.BinaryType(), False),
        ]
    )
    # spread the 8-byte id list before the Arrow leaf: a single-file
    # source otherwise feeds ONE python worker (functions/partitioning)
    from airflow_retail_etl_spark.functions.partitioning import spread

    return spread(docs.select("doc_id"), "doc_id").mapInPandas(
        batches, schema
    )


def decode_media(media_df: DataFrame) -> DataFrame:
    """Partition-parallel REAL decode via mapInPandas → DECODE_SCHEMA.

    One Arrow batch in/out; payload bytes never hit the driver. Fields that
    don't apply to a media type are NULL.
    """
    cols = [f.name for f in DECODE_SCHEMA.fields]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: list[dict] = []
            for asset_id, mtype, payload in zip(
                pdf["asset_id"], pdf["media_type"], pdf["media"]
            ):
                row = dict.fromkeys(cols)
                row["asset_id"] = asset_id
                row["media_type"] = mtype
                row["n_bytes"] = len(payload)
                row.update(decode_payload(bytes(payload), mtype))
                out.append(row)
            yield pd.DataFrame(out, columns=cols)

    return media_df.mapInPandas(batches, DECODE_SCHEMA)


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


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("media", T.BinaryType(), True),
        T.StructField("src_width", T.IntegerType(), True),
        T.StructField("src_height", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
    ]
)


def resize_ppm(payload: bytes, out_w: int, out_h: int) -> bytes:
    """REAL nearest-neighbor P6 resize: numpy fancy-index row/column maps
    over the actual pixel buffer (ys = ⌊y·h/out_h⌋, xs = ⌊x·w/out_w⌋ —
    the standard floor mapping), re-emitted as a well-formed P6 payload.
    Pillow/OpenCV interpolation modes would slot in here; the Spark-side
    plumbing is identical either way."""
    import numpy as np

    w, h, maxval, off = _parse_ppm_header(payload, 0)
    end = off + 3 * w * h
    if end > len(payload):
        raise ValueError("truncated PPM pixel data")
    px = np.frombuffer(payload[off:end], dtype=np.uint8).reshape(h, w, 3)
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    out = px[ys][:, xs]
    return b"P6\n%d %d\n%d\n" % (out_w, out_h, maxval) + out.tobytes()


def resize_images(
    media_df: DataFrame, *, width: int, height: int
) -> DataFrame:
    """Partition-parallel image resize via mapInPandas → RESIZE_SCHEMA.

    Image rows get a REAL nearest-neighbor resize (resize_ppm) and the
    resized payload is RE-DECODED in the same batch for its stats — the
    output means/byte-count describe the bytes actually produced, so the
    oracle checks the resize end-to-end, not a metadata projection.
    Non-image rows pass through with NULL resize fields (same convention
    as DECODE_SCHEMA). Payload bytes never hit the driver; the batch
    loop is the Arrow-sized unit a GPU/codec library would take over.
    """
    cols = [f.name for f in RESIZE_SCHEMA.fields]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: list[dict] = []
            for asset_id, mtype, payload in zip(
                pdf["asset_id"], pdf["media_type"], pdf["media"]
            ):
                row = dict.fromkeys(cols)
                row["asset_id"] = asset_id
                row["media_type"] = mtype
                if mtype == "image" and payload is not None:
                    src = decode_ppm(bytes(payload))[0]
                    resized = resize_ppm(bytes(payload), width, height)
                    stats = decode_ppm(resized)[0]
                    row.update(
                        media=resized,
                        src_width=src["width"],
                        src_height=src["height"],
                        width=stats["width"],
                        height=stats["height"],
                        n_bytes=len(resized),
                        mean_r=stats["mean_r"],
                        mean_g=stats["mean_g"],
                        mean_b=stats["mean_b"],
                    )
                out.append(row)
            yield pd.DataFrame(out, columns=cols)

    return media_df.mapInPandas(batches, RESIZE_SCHEMA)


# --- perceptual hashing: image near-duplicate detection ---------------------
#
# dHash (difference hash): downsample the image to a (DHASH_GRID_W+1) ×
# DHASH_GRID_H luminance grid, emit one bit per horizontal neighbor pair
# (bit = right cell brighter than left), pack the 64 bits into a signed
# int64. Near-duplicate images — recompressions, small edits, slight
# brightness shifts — land within a few bits of Hamming distance, while the
# gradient structure makes unrelated images differ in ~32 bits on average.
# The pair search reuses operators.dedup.simhash_pairs verbatim (16-bit
# pigeonhole blocks — exact for Hamming <= 3, linear candidate generation),
# so images ride the same Hamming machinery as text SimHash.
#
# All integer math end-to-end (nearest-neighbor floor sampling, integer
# luminance r+g+b, comparisons), so the hash is bit-replicable by an ANSI
# SQL oracle from the synthesis contract alone.

DHASH_GRID_W = 8   #: gradient bits per row (sampled columns = +1)
DHASH_GRID_H = 8   #: rows
_GRADIENT_WH = 64  #: synth gradient images are 64x64


@_functools.lru_cache(maxsize=64)
def _gradient_payload_cached(cls: int, c: int) -> bytes:
    """The 48 distinct gradient payloads, keyed by the ONLY inputs the
    pixel math reads (slope class, brightness offset) — a lookup table
    of constants, not a data-path cache. synth_gradient_payload was
    measured at ~100 µs/image while emitting one of 48 possible byte
    strings per row (round 15)."""
    w = h = _GRADIENT_WH
    a, b = 5 + 8 * (cls % 4), 3 + 8 * (cls // 4)
    import numpy as np

    xs = np.arange(w, dtype=np.int64)
    ys = np.arange(h, dtype=np.int64)
    ax = a * xs[None, :]
    by = b * ys[:, None]
    px = np.empty((h, w, 3), dtype=np.uint8)
    px[:, :, 0] = (ax + by + c) % 256
    px[:, :, 1] = (2 * ax + by + c) % 256
    px[:, :, 2] = (ax + 2 * by + c) % 256
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def synth_gradient_payload(doc_id: int) -> bytes:
    """Deterministic STRUCTURED P6 payload for perceptual hashing.

    The constant-color synth_payload images are degenerate for any
    spatial hash (every gradient bit is 0); this variant emits a 64×64
    linear-gradient image whose dHash is discriminative and analytic in
    doc_id:

    - class = doc_id % 16 fixes the gradient slopes
      a = 5 + 8·(class % 4), b = 3 + 8·(class ⌊/⌋ 4) — 16 patterns whose
      mod-256 wrap structure separates them by ≥11 dHash bits while
      same-class brightness variants stay within 3 (measured over the
      full class × offset grid);
    - c = (doc_id ⌊/⌋ 16) % 3 is a small brightness offset: same-class
      images are near-identical (gradient bits flip only where the +c
      crosses a mod-256 wrap — a few bits), the perceptual-near-dup
      relation the hash exists to catch;
    - channels: r = (a·x + b·y + c) % 256, g = (2a·x + b·y + c) % 256,
      b = (a·x + 2b·y + c) % 256.
    """
    return _gradient_payload_cached(doc_id % 16, (doc_id // 16) % 3)


def synth_gradient_corpus(docs: DataFrame) -> DataFrame:
    """(asset_id, media) — structured P6 payloads per document, emitted in
    mapInPandas Arrow batches (the same ingest-decode shape as
    synth_media_corpus)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "media": [
                        synth_gradient_payload(int(i)) for i in ids
                    ],
                }
            )

    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("media", T.BinaryType(), False),
        ]
    )
    # spread the 8-byte id list before the Arrow leaf: a single-file
    # source otherwise feeds ONE python worker (functions/partitioning)
    from airflow_retail_etl_spark.functions.partitioning import spread

    return spread(docs.select("doc_id"), "doc_id").mapInPandas(
        batches, schema
    )


def dhash64(payload: bytes) -> int:
    """Reference dHash of one P6 payload (signed int64, two's complement).

    Grid sampling is the nearest-neighbor floor map resize_ppm uses:
    sampled column x_gx = ⌊gx·w/9⌋ (gx = 0..8), row y_gy = ⌊gy·h/8⌋
    (gy = 0..7); cell luminance = r+g+b of the sampled pixel (exact
    integers, no division); bit (gy·8 + gx) = lum[gy][gx+1] > lum[gy][gx].
    """
    import numpy as np

    w, h, _maxval, off = _parse_ppm_header(payload, 0)
    end = off + 3 * w * h
    if end > len(payload):
        raise ValueError("truncated PPM pixel data")
    px = np.frombuffer(payload[off:end], dtype=np.uint8).reshape(h, w, 3)
    xs = (np.arange(DHASH_GRID_W + 1) * w) // (DHASH_GRID_W + 1)
    ys = (np.arange(DHASH_GRID_H) * h) // DHASH_GRID_H
    lum = px[ys][:, xs].astype(np.int64).sum(axis=2)  # (8, 9) grid
    bits = lum[:, 1:] > lum[:, :-1]                   # (8, 8) gradients
    # vectorized little-endian pack ≡ Σ bit_i << i (the old Python loop)
    val = int.from_bytes(
        np.packbits(bits.flatten(), bitorder="little").tobytes(), "little"
    )
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def dhash_media(media_df: DataFrame) -> DataFrame:
    """Partition-parallel dHash over (asset_id, media) P6 payloads via
    mapInPandas → (asset_id, dhash). Payload bytes stay on the executors;
    the signature table is 16 bytes/row however large the images are —
    the reduction that makes image near-dup a text-sized problem."""
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("dhash", T.LongType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].astype("int64"),
                    "dhash": [
                        dhash64(bytes(p)) for p in pdf["media"]
                    ],
                }
            )

    return media_df.mapInPandas(batches, schema)


def synth_gradient_dhash(docs: DataFrame) -> DataFrame:
    """(asset_id, dhash) — synthesize AND hash in ONE python stage.

    The two-leaf form (synth_gradient_corpus → dhash_media) ships every
    12 KB payload JVM→python→JVM→python→JVM — four Arrow crossings of
    media bytes whose only consumer is the 8-byte hash (the guide's
    'move heavy bytes once' rule, §8; measured ~40 s of executor CPU at
    sf0.1 for ~0.7 s of actual synth+hash work). Here the payload is
    born and decoded inside the same worker batch — dhash64 still
    parses the real P6 bytes — and only (doc_id in, asset_id+hash out)
    cross the boundary. Bit-identical to the two-leaf form by
    construction (same synth, same hash; test-pinned)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "dhash": [
                        dhash64(synth_gradient_payload(int(i)))
                        for i in ids
                    ],
                }
            )

    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("dhash", T.LongType(), False),
        ]
    )
    from airflow_retail_etl_spark.functions.partitioning import spread

    return spread(docs.select("doc_id"), "doc_id").mapInPandas(
        batches, schema
    )


def image_neardup_pairs_from_hashes(
    sigs: DataFrame,
    *,
    max_hamming: int = 3,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """image_neardup_pairs over a prebuilt (asset_id, dhash) signature
    table (e.g. :func:`synth_gradient_dhash`'s fused output)."""
    from airflow_retail_etl_spark.operators import dedup as _dedup

    return _dedup.simhash_pairs(
        sigs.select(
            F.col("asset_id").alias("id"), F.col("dhash").alias("simhash")
        ),
        max_hamming=max_hamming,
        max_bucket_size=max_bucket_size,
    )


def image_neardup_pairs(
    media_df: DataFrame,
    *,
    max_hamming: int = 3,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Perceptual near-duplicate image pairs: dHash signatures fed through
    the text-SimHash Hamming machinery (operators.dedup.simhash_pairs —
    16-bit pigeonhole blocks, EXACT for max_hamming <= 3, linear candidate
    generation). Returns (id_a, id_b, hamming).

    Exactness vs the cap: the default ``max_bucket_size=10_000`` is the
    production skew backstop — a pigeonhole block shared by more than
    10k images (identical-image mega-clusters) is truncated, silently
    dropping pairs beyond it. Real corpora should resolve exact-duplicate
    payloads FIRST (dedup_exact on a payload hash), after which blocks
    stay small; callers wanting the exact contract at any skew (the
    oracle-graded registry forms do) pass ``max_bucket_size=None``."""
    from airflow_retail_etl_spark.operators import dedup as _dedup

    sigs = dhash_media(media_df).select(
        F.col("asset_id").alias("id"), F.col("dhash").alias("simhash")
    )
    return _dedup.simhash_pairs(
        sigs, max_hamming=max_hamming, max_bucket_size=max_bucket_size
    )


def synth_gradient_video_payload(doc_id: int) -> bytes:
    """Deterministic multi-frame gradient video: 3 + doc_id % 3 concatenated
    64×64 P6 frames sharing the document's slope class (doc_id % 16), with
    per-frame brightness offset c_f = (doc_id ⌊/⌋ 16 + f) % 8. Same-class
    videos with nearby offset windows share frames whose dHashes collide
    exactly — the frame-set overlap video near-dup detects."""
    cls = doc_id % 16
    n_frames = 3 + doc_id % 3
    frames = []
    for f in range(n_frames):
        # same gradient as synth_gradient_payload, per-frame offset
        fake_id = cls + 16 * ((doc_id // 16 + f) % 8)
        frames.append(synth_gradient_payload(fake_id))
    return b"".join(frames)


def synth_gradient_video_corpus(docs: DataFrame) -> DataFrame:
    """(asset_id, media) multi-frame gradient videos per document."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "media": [
                        synth_gradient_video_payload(int(i)) for i in ids
                    ],
                }
            )

    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("media", T.BinaryType(), False),
        ]
    )
    # spread the 8-byte id list before the Arrow leaf: a single-file
    # source otherwise feeds ONE python worker (functions/partitioning)
    from airflow_retail_etl_spark.functions.partitioning import spread

    return spread(docs.select("doc_id"), "doc_id").mapInPandas(
        batches, schema
    )


def video_frame_hashes(media_df: DataFrame) -> DataFrame:
    """Per-frame dHash of concatenated-P6 video payloads via mapInPandas →
    (asset_id, frame_idx, dhash). The video-sized payload reduces to
    8 bytes per frame before anything shuffles."""
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("dhash", T.LongType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, hashes = [], [], []
            for asset_id, payload in zip(pdf["asset_id"], pdf["media"]):
                buf = bytes(payload)
                off, f = 0, 0
                while off < len(buf):
                    w, h, _mx, px_off = _parse_ppm_header(buf, off)
                    end = px_off + 3 * w * h
                    ids.append(asset_id)
                    idxs.append(f)
                    hashes.append(dhash64(buf[off:end]))
                    off, f = end, f + 1
            yield pd.DataFrame(
                {"asset_id": ids, "frame_idx": idxs, "dhash": hashes}
            )

    return media_df.mapInPandas(batches, schema)


def synth_gradient_video_frame_hashes(docs: DataFrame) -> DataFrame:
    """(asset_id, frame_idx, dhash) — synthesize and per-frame-hash the
    gradient videos in ONE python stage (same fused-leaf rationale as
    :func:`synth_gradient_dhash`: the multi-frame payload's only
    consumer is 8 bytes per frame; bit-identical to
    video_frame_hashes(synth_gradient_video_corpus(docs)))."""
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("dhash", T.LongType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, hashes = [], [], []
            for asset_id in pdf["doc_id"].astype("int64"):
                buf = synth_gradient_video_payload(int(asset_id))
                off, f = 0, 0
                while off < len(buf):
                    w, h, _mx, px_off = _parse_ppm_header(buf, off)
                    end = px_off + 3 * w * h
                    ids.append(asset_id)
                    idxs.append(f)
                    hashes.append(dhash64(buf[off:end]))
                    off, f = end, f + 1
            yield pd.DataFrame(
                {"asset_id": ids, "frame_idx": idxs, "dhash": hashes}
            )

    from airflow_retail_etl_spark.functions.partitioning import spread

    return spread(docs.select("doc_id"), "doc_id").mapInPandas(
        batches, schema
    )


def video_neardup_pairs(
    frames_df: DataFrame,
    *,
    min_jaccard: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Near-duplicate VIDEO pairs by frame-set overlap: collapse each
    video to its DISTINCT frame-dHash set, then exact set Jaccard via the
    text-dedup inverted-index engine (operators.dedup.set_jaccard_pairs —
    same single-join plan, same hot-element cap: a ubiquitous frame hash,
    e.g. black/intro frames across a whole corpus, is the skew case
    ``max_doc_freq`` exists for). Recompressions, re-cuts and
    brightness-shifted re-uploads share most frame hashes; unrelated
    videos share none. Returns (id_a, id_b, jaccard)."""
    from airflow_retail_etl_spark.operators import dedup as _dedup

    sets_ = frames_df.groupBy(
        F.col("asset_id").alias("id")
    ).agg(F.array_sort(F.collect_set("dhash")).alias("shingles"))
    return _dedup.set_jaccard_pairs(
        sets_, min_jaccard=min_jaccard, max_doc_freq=max_doc_freq
    )


# --- audio fingerprinting: energy-delta near-dup ----------------------------

AUDIO_FP_WINDOWS = 65   #: energy windows (64 delta bits)
AUDIO_FP_WINLEN = 64    #: samples per window


def synth_wave_payload(doc_id: int) -> bytes:
    """Deterministic STRUCTURED WAV for audio fingerprinting (the
    constant-amplitude synth_payload square wave has uniform energy —
    degenerate for any energy-delta code). 65 windows × 64 samples of a
    ±A_w square wave, PCM16 mono 8 kHz, with the amplitude contour
    analytic in doc_id:

    - class = doc_id % 16 → a = 1 + (class % 4)·2, b = 1 + (class ⌊/⌋ 4)·3;
      A_w = 1000·(1 + (a·w³ + b·w² + (a+b)·w) mod 13) — 16 contours
      separated by ≥9 fingerprint bits (measured over the full grid);
    - c = (doc_id ⌊/⌋ 16) % 3 boosts window 13 + 17·c by +13500 (still
      < 2¹⁵): same-class takes are near-identical, ≤4 bits apart.
    """
    return _wave_payload_cached(doc_id % 16, (doc_id // 16) % 3)


@_functools.lru_cache(maxsize=64)
def _wave_payload_cached(cls: int, c: int) -> bytes:
    """The 48 distinct wave payloads, keyed by the only inputs the
    contour math reads (class, boosted-window index) — same lookup-table
    rationale as _gradient_payload_cached."""
    a, b = 1 + (cls % 4) * 2, 1 + (cls // 4) * 3
    amps = [
        1000 * (1 + (a * w**3 + b * w**2 + (a + b) * w) % 13)
        for w in range(AUDIO_FP_WINDOWS)
    ]
    amps[13 + 17 * c] += 13500
    pcm: list[int] = []
    for amp in amps:
        pcm.extend(
            amp if s % 2 == 0 else -amp for s in range(AUDIO_FP_WINLEN)
        )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack(f"<{len(pcm)}h", *pcm))
    return buf.getvalue()


def synth_wave_corpus(docs: DataFrame) -> DataFrame:
    """(asset_id, media) structured WAV payloads per document."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "media": [synth_wave_payload(int(i)) for i in ids],
                }
            )

    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("media", T.BinaryType(), False),
        ]
    )
    from airflow_retail_etl_spark.functions.partitioning import spread

    return spread(docs.select("doc_id"), "doc_id").mapInPandas(
        batches, schema
    )


def audio_fingerprint64(payload: bytes) -> int:
    """Reference energy-delta fingerprint of one PCM16 WAV (signed int64).

    Decode (stdlib ``wave``), split into AUDIO_FP_WINDOWS fixed windows,
    exact integer energy E_w = Σ sample² per window, bit i =
    E[i+1] > E[i]. The 1-band energy-difference code — banded spectral
    fingerprints (Chromaprint/Echoprint) slot into the same plumbing
    with an FFT per window; the Spark-side batch shape is identical.
    """
    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2 or w.getnchannels() != 1:
            raise ValueError("expected PCM16 mono")
        raw = w.readframes(w.getnframes())
    x = np.frombuffer(raw, dtype="<i2").astype(np.int64)
    n = AUDIO_FP_WINDOWS * AUDIO_FP_WINLEN
    if len(x) < n:
        raise ValueError(f"need >= {n} samples, got {len(x)}")
    e = (x[:n] ** 2).reshape(AUDIO_FP_WINDOWS, AUDIO_FP_WINLEN).sum(axis=1)
    val = 0
    for i in range(AUDIO_FP_WINDOWS - 1):
        if e[i + 1] > e[i]:
            val |= 1 << i
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def audio_fingerprint_media(media_df: DataFrame) -> DataFrame:
    """Partition-parallel energy-delta fingerprints via mapInPandas →
    (asset_id, afp). 8 bytes per clip however long the audio."""
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("afp", T.LongType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].astype("int64"),
                    "afp": [
                        audio_fingerprint64(bytes(p)) for p in pdf["media"]
                    ],
                }
            )

    return media_df.mapInPandas(batches, schema)


def synth_wave_fingerprint(docs: DataFrame) -> DataFrame:
    """(asset_id, afp) — synthesize and fingerprint the structured WAVs
    in ONE python stage (fused-leaf rationale of synth_gradient_dhash;
    audio_fingerprint64 still decodes the real WAV bytes with the
    stdlib codec; bit-identical to
    audio_fingerprint_media(synth_wave_corpus(docs)))."""
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("afp", T.LongType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "afp": [
                        audio_fingerprint64(synth_wave_payload(int(i)))
                        for i in ids
                    ],
                }
            )

    from airflow_retail_etl_spark.functions.partitioning import spread

    return spread(docs.select("doc_id"), "doc_id").mapInPandas(
        batches, schema
    )


def audio_neardup_pairs_from_fingerprints(
    fps: DataFrame,
    *,
    max_hamming: int = 4,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """audio_neardup_pairs over a prebuilt (asset_id, afp) table
    (e.g. :func:`synth_wave_fingerprint`'s fused output)."""
    from airflow_retail_etl_spark.operators import dedup as _dedup

    return _dedup.simhash_pairs(
        fps.select(
            F.col("asset_id").alias("id"), F.col("afp").alias("simhash")
        ),
        max_hamming=max_hamming,
        prefix_bits=8,
        max_bucket_size=max_bucket_size,
    )


def audio_neardup_pairs(
    media_df: DataFrame,
    *,
    max_hamming: int = 4,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Near-duplicate AUDIO pairs: energy-delta fingerprints through the
    SimHash pigeonhole machinery with 8-bit blocks (8 blocks ⇒ complete
    for Hamming radius ≤ 7, covering the default radius 4 — re-encodes
    and level-shifted takes land within a few bits; unrelated clips
    differ in ~32). Returns (id_a, id_b, hamming).

    Same exactness-vs-cap contract as image_neardup_pairs: the 10k
    default bucket cap is a production skew backstop that silently drops
    pairs inside mega-buckets; oracle-graded forms pass
    ``max_bucket_size=None`` for the exact contract."""
    from airflow_retail_etl_spark.operators import dedup as _dedup

    sigs = audio_fingerprint_media(media_df).select(
        F.col("asset_id").alias("id"), F.col("afp").alias("simhash")
    )
    return _dedup.simhash_pairs(
        sigs,
        max_hamming=max_hamming,
        prefix_bits=8,
        max_bucket_size=max_bucket_size,
    )
