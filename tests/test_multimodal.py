"""Multimodal plumbing: schema, batching, determinism, stub gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from liblevenshtein_rust_spark.operators.multimodal import (
    FEATURE_DIM,
    FEATURES_SCHEMA,
    MEDIA_SCHEMA,
    featurize_media,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    return synth_media(spark, docs).cache()


def test_media_schema_and_rows(spark, media):
    assert media.count() == 50
    assert dict(media.dtypes)["payload"] == "binary"


def test_featurize_shapes_and_determinism(spark, media):
    f1 = featurize_media(media)
    assert f1.schema == FEATURES_SCHEMA
    rows = {r.media_id: r for r in f1.collect()}
    assert len(rows) == 50
    for r in rows.values():
        assert len(r.features) == FEATURE_DIM
        assert r.n_bytes > 0 and r.width >= 16 and r.height >= 16
    # determinism across a different partitioning
    f2 = featurize_media(media.repartition(7))
    rows2 = {r.media_id: r for r in f2.collect()}
    for k in rows:
        assert rows[k].features == rows2[k].features


def test_real_decoder_is_gated(spark, media):
    with pytest.raises(Exception) as ei:
        featurize_media(media, decoder="pillow").count()
    assert "NotImplementedError" in str(ei.value) or "decoder" in str(ei.value)


def test_bmp_roundtrip_local():
    """bmp_payload bytes parse back to the geometry and pixel histogram
    they were built from — a real header+payload decode, no libraries."""
    import numpy as np

    from liblevenshtein_rust_spark.operators.multimodal import (
        _decode_bmp, bmp_payload)

    seed = b"hello media world"
    blob = bmp_payload(seed)
    w, h, feats = _decode_bmp(blob)
    assert (w, h) == (8 + len(seed) % 9, 4 + len(seed) % 5)
    assert abs(float(feats.sum()) - 1.0) < 1e-6  # normalized histogram
    # histogram matches a direct computation over the pixel array
    px = np.frombuffer(blob, dtype=np.uint8, offset=54)
    exp = np.histogram(px, bins=FEATURE_DIM, range=(0, 256))[0] / px.size
    assert np.allclose(feats, exp)


def test_wav_roundtrip_local():
    import numpy as np

    from liblevenshtein_rust_spark.operators.multimodal import (
        _decode_wav, wav_payload)

    seed = bytes(range(64))
    blob = wav_payload(seed, rate=8000)
    rate, ch, env = _decode_wav(blob)
    assert (rate, ch) == (8000, 1)
    x = (np.frombuffer(seed, np.uint8).astype(np.int16) - 128) * 256
    exp = np.sqrt((x.astype(np.float64).reshape(FEATURE_DIM, -1) ** 2).mean(axis=1))
    assert np.allclose(env, exp, rtol=1e-6)


def test_auto_decoder_end_to_end(spark, sf_dir):
    """Real BMP/WAV payloads decode through the Spark stage; opaque video
    bytes raise at the codec seam."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    m = synth_media(spark, docs, real_payloads=True).cache()
    rows = {r.media_id: r for r in featurize_media(
        m.where(F.col("kind") != "video"), decoder="auto").collect()}
    assert rows
    for r in rows.values():
        if r.kind == "image":
            assert 8 <= r.width <= 16 and 4 <= r.height <= 8
        else:
            assert r.width == 8000 and r.height == 1
        assert len(r.features) == FEATURE_DIM
    with pytest.raises(Exception) as ei:
        featurize_media(m.where(F.col("kind") == "video"),
                        decoder="auto").count()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)
    m.unpersist()


def test_features_feed_ann(spark, media):
    """Features slot straight into the similarity operators."""
    from liblevenshtein_rust_spark.operators.similarity import cosine_top_k

    feats = featurize_media(media).select(
        "media_id", F.col("features").alias("vec"))
    q = feats.limit(3).select(F.col("media_id").alias("q_id"),
                              F.col("vec").alias("q_vec"))
    c = feats.select(F.col("media_id").alias("c_id"), F.col("vec").alias("c_vec"))
    top = cosine_top_k(q, c, 3)
    got = {(r.q_id, r.rank, r.c_id) for r in top.collect()}
    # self is always rank 1 with sim 1.0
    for r in top.where(F.col("rank") == 1).collect():
        assert r.q_id == r.c_id
    assert len(got) == 9


def test_resize_images_geometry_and_pixels(spark):
    from liblevenshtein_rust_spark.operators.multimodal import (
        _bmp_grid, _resize_nn, bmp_payload, resize_images)

    rows = [("m_1", "image", bmp_payload(b"some pixel source"), {}),
            ("m_2", "image", bmp_payload(b"a much longer pixel seed text"), {}),
            ("m_3", "audio", b"RIFF....WAVE", {})]
    m = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in resize_images(m, 16, 16).collect()}
    assert set(out) == {"m_1", "m_2"}          # only images
    for mid, payload, _ in [("m_1", rows[0][2], 0), ("m_2", rows[1][2], 0)]:
        r = out[mid]
        assert (r["width"], r["height"]) == (16, 16)
        got = _bmp_grid(bytes(r["payload"]))
        expect = _resize_nn(_bmp_grid(payload), 16, 16)
        assert (got == expect).all()           # byte-exact resample
        assert r["n_bytes"] == len(bytes(r["payload"]))


def test_resize_same_size_is_identity(spark):
    from liblevenshtein_rust_spark.operators.multimodal import (
        _bmp_grid, bmp_payload, resize_images)
    p = bmp_payload(b"identity check")
    g = _bmp_grid(p)
    h, w = g.shape[0], g.shape[1]
    m = spark.createDataFrame([("m", "image", p, {})], MEDIA_SCHEMA)
    r = resize_images(m, w, h).collect()[0]
    assert (_bmp_grid(bytes(r["payload"])) == g).all()


def test_sample_frames_walks_container(spark):
    from liblevenshtein_rust_spark.operators.multimodal import (
        _bmp_grid, bmp_payload, mbmp_payload, sample_frames)
    seed = b"rotating frame seed"
    m = spark.createDataFrame(
        [("v_1", "video", mbmp_payload(seed, 5), {}),
         ("v_2", "video", mbmp_payload(seed, 1), {}),
         ("i_1", "image", bmp_payload(seed), {})], MEDIA_SCHEMA)
    got = sample_frames(m, every=2).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["media_id"], []).append(r)
    assert set(by_id) == {"v_1", "v_2"}        # only video
    v1 = sorted(by_id["v_1"], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in v1] == [0, 2, 4]
    assert all(r["n_frames"] == 5 for r in v1)
    # frame 2's pixels = bmp of the seed rotated by 2
    rot2 = seed[2:] + seed[:2]
    from liblevenshtein_rust_spark.operators.multimodal import bmp_payload as bp
    assert bytes(v1[1]["payload"]) == bp(rot2)
    assert [r["frame_idx"] for r in by_id["v_2"]] == [0]


def test_sample_frames_codec_seam(spark):
    from liblevenshtein_rust_spark.operators.multimodal import sample_frames
    m = spark.createDataFrame(
        [("v", "video", b"\x00\x00\x01\xba mpeg-ps", {})], MEDIA_SCHEMA)
    with pytest.raises(Exception, match="codec"):
        sample_frames(m, every=2).collect()


def test_mbmp_empty_seed_geometry_matches_bmp():
    # geometry must derive from the ORIGINAL seed length (like bmp_payload),
    # not from a placeholder substituted for empty seeds
    from liblevenshtein_rust_spark.operators.multimodal import (
        bmp_payload, mbmp_payload)
    frame = bmp_payload(b"")
    assert mbmp_payload(b"", 3) == frame * 3
