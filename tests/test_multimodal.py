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


def test_decode_stub_real_path_rejects_unparseable():
    with pytest.raises(ValueError):
        decode_stub(b"not a real payload", "image", fake=False)


def test_wav_roundtrip_exact_stats():
    from airflow_retail_etl_spark.multimodal import decode_wav, synth_payload

    d = decode_wav(synth_payload(7, "audio"))
    # contract: A = 1000 + 7 % 29000 = 1007, n = 100 + 2·7 = 114
    assert d["sample_rate"] == 8000
    assert d["n_channels"] == 1 and d["sample_width"] == 2
    assert d["n_frames"] == 114
    assert d["peak"] == 1007.0
    assert d["rms"] == 1007.0  # ±A square wave: rms is exactly A
    assert d["duration_ms"] == 114 * 1000.0 / 8000


def test_wav_decoder_handles_arbitrary_pcm():
    # not just the synthesizer's wave shape: a ramp signal decodes too
    import io
    import struct
    import wave as wave_mod

    import numpy as np

    from airflow_retail_etl_spark.multimodal import decode_wav

    samples = list(range(-100, 100))
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    d = decode_wav(buf.getvalue())
    assert d["n_channels"] == 2
    assert d["sample_rate"] == 44100
    assert d["n_frames"] == len(samples) // 2  # stereo: 2 samples/frame
    assert d["peak"] == 100.0
    assert d["rms"] == pytest.approx(
        float(np.sqrt(np.mean(np.array(samples, dtype=np.float64) ** 2)))
    )


def test_ppm_roundtrip_and_comments():
    from airflow_retail_etl_spark.multimodal import decode_ppm, synth_payload

    d, end = decode_ppm(synth_payload(10, "image"))
    assert (d["width"], d["height"], d["maxval"]) == (18, 18, 255)
    assert d["mean_r"] == 10.0 and d["mean_g"] == 70.0 and d["mean_b"] == 130.0
    # a PPM with a comment line still parses (real-format robustness)
    ppm = b"P6\n# a comment\n2 1\n255\n" + bytes([1, 2, 3, 5, 6, 7])
    d2, _ = decode_ppm(ppm)
    assert (d2["width"], d2["height"]) == (2, 1)
    assert d2["mean_r"] == 3.0  # (1+5)/2


def test_video_frames_walk():
    from airflow_retail_etl_spark.multimodal import (
        decode_video_ppm,
        synth_payload,
    )

    d = decode_video_ppm(synth_payload(6, "video"))  # k = 2 + 6 % 4 = 4
    assert d["n_frames"] == 4
    assert d["duration_ms"] == 160.0
    assert d["mean_r"] == 6.0


def test_decode_media_end_to_end_spark(spark):
    from airflow_retail_etl_spark.multimodal import (
        decode_media,
        synth_media_corpus,
    )

    docs = spark.createDataFrame(
        [(i, "x") for i in range(12)], ["doc_id", "text"]
    )
    out = {r["asset_id"]: r for r in decode_media(synth_media_corpus(docs)).collect()}
    assert len(out) == 12
    assert out[1]["media_type"] == "audio" and out[1]["rms"] == 1001.0
    assert out[3]["media_type"] == "image" and out[3]["width"] == 11
    assert out[5]["media_type"] == "video" and out[5]["n_frames"] == 3
    # unified schema: inapplicable fields are NULL
    assert out[3]["sample_rate"] is None and out[1]["width"] is None


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


def test_resize_ppm_nearest_neighbor_math():
    """Pin the floor index mapping on a NON-constant image: resized pixel
    (y, x) must equal source pixel (⌊y·h/H⌋, ⌊x·w/W⌋)."""
    import numpy as np

    from airflow_retail_etl_spark.multimodal import decode_ppm, resize_ppm
    from airflow_retail_etl_spark.multimodal import _parse_ppm_header

    w, h = 10, 6
    px = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            px[y, x] = ((x * 3) % 256, (y * 5) % 256, (x + y) % 256)
    payload = b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()

    out = resize_ppm(payload, 4, 3)
    ow, oh, maxval, off = _parse_ppm_header(out, 0)
    assert (ow, oh, maxval) == (4, 3, 255)
    got = np.frombuffer(out[off:], dtype=np.uint8).reshape(3, 4, 3)
    ys = (np.arange(3) * h) // 3
    xs = (np.arange(4) * w) // 4
    assert (got == px[ys][:, xs]).all()
    # upscale round-trips too (pure index repetition)
    up = resize_ppm(out, 8, 6)
    stats = decode_ppm(up)[0]
    assert (stats["width"], stats["height"]) == (8, 6)


def test_resize_images_passthrough_and_stats(spark):
    """resize_images over a mixed corpus: image rows carry re-decoded
    stats of the RESIZED bytes; audio/video rows pass through NULL."""
    from airflow_retail_etl_spark import multimodal

    docs = spark.createDataFrame(
        [(i,) for i in range(12)], ["doc_id"]
    )
    media = multimodal.synth_media_corpus(docs)
    out = multimodal.resize_images(media, width=16, height=12)
    rows = {r["asset_id"]: r for r in out.collect()}
    assert len(rows) == 12
    for i, r in rows.items():
        if r["media_type"] == "image":
            assert (r["width"], r["height"]) == (16, 12)
            assert r["n_bytes"] == 589
            assert r["mean_r"] == float(i % 256)
            assert r["src_width"] == 8 + i % 32
        else:
            assert r["width"] is None and r["media"] is None


# --- perceptual hashing / image near-dup ------------------------------------

def test_dhash_media_matches_reference(spark):
    from airflow_retail_etl_spark import multimodal as M

    docs = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    media = M.synth_gradient_corpus(docs)
    got = {r["asset_id"]: r["dhash"] for r in M.dhash_media(media).collect()}
    for i in range(40):
        assert got[i] == M.dhash64(M.synth_gradient_payload(i)), i


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_image_neardup_recall_on_perturbed_images(spark):
    """Near-identical images (small pixel edits of a base image) must be
    recovered by the Hamming-3 pair search; an unrelated image must not."""
    import numpy as np

    from airflow_retail_etl_spark import multimodal as M

    base = M.synth_gradient_payload(7)
    w, h, _maxval, off = M._parse_ppm_header(base, 0)
    px = np.frombuffer(base[off:], dtype=np.uint8).reshape(h, w, 3).copy()

    # off-grid edit: pixels never sampled by the 9x8 floor map -> hash 0 away
    sampled_x = {(gx * w) // 9 for gx in range(9)}
    sampled_y = {(gy * h) // 8 for gy in range(8)}
    ex = next(x for x in range(w) if x not in sampled_x)
    ey = next(y for y in range(h) if y not in sampled_y)
    off_grid = px.copy()
    off_grid[ey, ex] = [255, 255, 255]
    p_off = b"P6\n%d %d\n255\n" % (w, h) + off_grid.tobytes()

    # on-grid edit: one sampled pixel nudged -> at most a couple of bits
    sx, sy = min(sampled_x - {0}), min(sampled_y - {0})
    on_grid = px.copy()
    on_grid[sy, sx] = (on_grid[sy, sx].astype(int) + 40) % 256
    p_on = b"P6\n%d %d\n255\n" % (w, h) + on_grid.tobytes()

    unrelated = M.synth_gradient_payload(3)  # different slope class

    assert _ham(M.dhash64(base), M.dhash64(p_off)) == 0
    assert 0 < _ham(M.dhash64(base), M.dhash64(p_on)) <= 3
    assert _ham(M.dhash64(base), M.dhash64(unrelated)) > 3

    media = spark.createDataFrame(
        [(1, base), (2, p_off), (3, p_on), (4, unrelated)],
        "asset_id long, media binary",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in M.image_neardup_pairs(media, max_hamming=3).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) in pairs
    assert not any(4 in p for p in pairs)


def test_image_neardup_class_separation(spark):
    """Same slope class (brightness variants) pairs up; cross-class never
    does at radius 3 (measured separation >= 11 bits)."""
    from airflow_retail_etl_spark import multimodal as M

    docs = spark.range(0, 64).withColumnRenamed("id", "doc_id")
    media = M.synth_gradient_corpus(docs)
    pairs = M.image_neardup_pairs(media, max_hamming=3).collect()
    assert pairs, "no near-dup pairs found at all"
    for r in pairs:
        assert r["id_a"] % 16 == r["id_b"] % 16, (
            f"cross-class pair {r['id_a']},{r['id_b']}"
        )
    # every same-class pair is within radius 3 in this corpus -> complete
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    for cls in range(16):
        members = [i for i in range(64) if i % 16 == cls]
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                assert (a, b) in found, (a, b)


def test_video_frame_hashes_match_reference(spark):
    from airflow_retail_etl_spark import multimodal as M

    docs = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    media = M.synth_gradient_video_corpus(docs)
    got = {
        (r["asset_id"], r["frame_idx"]): r["dhash"]
        for r in M.video_frame_hashes(media).collect()
    }
    for i in range(12):
        payload = M.synth_gradient_video_payload(i)
        off, f = 0, 0
        while off < len(payload):
            w, h, _mx, px = M._parse_ppm_header(payload, off)
            end = px + 3 * w * h
            assert got[(i, f)] == M.dhash64(payload[off:end]), (i, f)
            off, f = end, f + 1
    # every video contributed all its frames
    assert len(got) == sum(3 + i % 3 for i in range(12))


def test_video_neardup_same_class_only(spark):
    """Videos pair iff they share exact frame hashes: same slope class
    with overlapping offset windows; never across classes."""
    from airflow_retail_etl_spark import multimodal as M

    docs = spark.range(0, 96).withColumnRenamed("id", "doc_id")
    frames = M.video_frame_hashes(M.synth_gradient_video_corpus(docs))
    pairs = M.video_neardup_pairs(frames, min_jaccard=0.25).collect()
    assert pairs
    for r in pairs:
        assert r["id_a"] % 16 == r["id_b"] % 16, r
        assert 0.25 <= r["jaccard"] <= 1.0
    # identical offset windows -> jaccard exactly 1.0 must appear
    assert any(r["jaccard"] == 1.0 for r in pairs)


def test_set_jaccard_pairs_cap_matches_uncapped_scores(spark):
    """set_jaccard_pairs (the engine under video_neardup) keeps exact
    scores under the hot-element cap — same contract as jaccard_pairs."""
    from pyspark.sql import functions as SF

    from airflow_retail_etl_spark.operators.dedup import set_jaccard_pairs

    rows = [
        (1, [10, 11, 12, 99]),
        (2, [10, 11, 13, 99]),
        (3, [20, 21, 22, 99]),  # shares only the ubiquitous 99 with 1/2
    ]
    df = spark.createDataFrame(rows, "id long, shingles array<bigint>")
    uncapped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in set_jaccard_pairs(df).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in set_jaccard_pairs(df, max_doc_freq=2).collect()
    }
    # 99 (in all 3 docs) is capped out of candidate generation: pairs that
    # ONLY shared it disappear; the surviving pair keeps its exact score
    assert (1, 3) in uncapped and (2, 3) in uncapped
    assert (1, 3) not in capped and (2, 3) not in capped
    assert capped[(1, 2)] == uncapped[(1, 2)] == 3 / 5


def test_audio_fingerprint_matches_reference(spark):
    from airflow_retail_etl_spark import multimodal as M

    docs = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    got = {
        r["asset_id"]: r["afp"]
        for r in M.audio_fingerprint_media(
            M.synth_wave_corpus(docs)
        ).collect()
    }
    for i in range(24):
        assert got[i] == M.audio_fingerprint64(M.synth_wave_payload(i)), i


def test_audio_neardup_recall_on_perturbed_takes(spark):
    """Level-shifted / lightly edited takes of the same clip must pair at
    radius 4; a different contour class must not."""
    import io as _io
    import struct as _struct
    import wave as _wave

    import numpy as np

    from airflow_retail_etl_spark import multimodal as M

    base = M.synth_wave_payload(9)
    with _wave.open(_io.BytesIO(base), "rb") as w:
        raw = w.readframes(w.getnframes())
    x = np.frombuffer(raw, dtype="<i2").astype(np.int64)

    def to_wav(samples):
        buf = _io.BytesIO()
        with _wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(
                _struct.pack(f"<{len(samples)}h", *map(int, samples))
            )
        return buf.getvalue()

    # gentle global gain (~-3%): scales every window energy equally —
    # every E[i+1] > E[i] comparison is preserved, hamming 0
    gained = to_wav((x * 31) // 32)
    # zero out a few samples inside ONE window: a couple of bits at most
    edited = x.copy()
    edited[20 * 64 + 5:20 * 64 + 10] = 0
    edited_wav = to_wav(edited)
    unrelated = M.synth_wave_payload(2)

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    f = M.audio_fingerprint64
    assert ham(f(base), f(gained)) == 0
    assert 0 <= ham(f(base), f(edited_wav)) <= 4
    assert ham(f(base), f(unrelated)) > 4

    media = spark.createDataFrame(
        [(1, base), (2, gained), (3, edited_wav), (4, unrelated)],
        "asset_id long, media binary",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in M.audio_neardup_pairs(media, max_hamming=4).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs
    assert not any(4 in p for p in pairs)


def test_audio_neardup_class_separation(spark):
    from airflow_retail_etl_spark import multimodal as M

    docs = spark.range(0, 64).withColumnRenamed("id", "doc_id")
    media = M.synth_wave_corpus(docs)
    pairs = M.audio_neardup_pairs(media, max_hamming=4).collect()
    assert pairs
    found = set()
    for r in pairs:
        assert r["id_a"] % 16 == r["id_b"] % 16, r
        found.add((r["id_a"], r["id_b"]))
    # complete within class on this corpus (intra <= 4 by construction)
    for cls in range(16):
        members = [i for i in range(64) if i % 16 == cls]
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                assert (a, b) in found, (a, b)


def test_entry_image_dedup_resolve_contract(spark):
    """Clusters partition the assets; keeper = cluster_id = min member;
    exactly one keeper per cluster; same-class assets share a cluster."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    rows = entry.queries()["image_dedup_resolve"](spark, sf).collect()
    assert rows
    by_cluster = {}
    for r in rows:
        assert r["keeper_id"] == r["cluster_id"]
        assert r["is_keeper"] == (r["asset_id"] == r["keeper_id"])
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        assert sum(m["is_keeper"] for m in members) == 1
        assert min(m["asset_id"] for m in members) == cid
        assert all(m["cluster_size"] == len(members) for m in members)
        # near-dup classes never merge across slope classes
        assert len({m["asset_id"] % 16 for m in members}) == 1


def test_fused_leaves_equal_two_leaf_forms(spark):
    """The round-15 fused synth+feature leaves are bit-identical to the
    two-leaf (synth corpus → feature mapInPandas) forms they replace."""
    from airflow_retail_etl_spark import multimodal as mm

    docs = spark.range(0, 97).select(F.col("id").alias("doc_id"))
    a = {
        (r["asset_id"], r["dhash"])
        for r in mm.synth_gradient_dhash(docs).collect()
    }
    b = {
        (r["asset_id"], r["dhash"])
        for r in mm.dhash_media(mm.synth_gradient_corpus(docs)).collect()
    }
    assert a == b
    fa = {
        (r["asset_id"], r["frame_idx"], r["dhash"])
        for r in mm.synth_gradient_video_frame_hashes(docs).collect()
    }
    fb = {
        (r["asset_id"], r["frame_idx"], r["dhash"])
        for r in mm.video_frame_hashes(
            mm.synth_gradient_video_corpus(docs)
        ).collect()
    }
    assert fa == fb
    wa = {
        (r["asset_id"], r["afp"])
        for r in mm.synth_wave_fingerprint(docs).collect()
    }
    wb = {
        (r["asset_id"], r["afp"])
        for r in mm.audio_fingerprint_media(
            mm.synth_wave_corpus(docs)
        ).collect()
    }
    assert wa == wb
