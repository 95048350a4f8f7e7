"""Multimodal binary-column plumbing: feature extraction batch shape,
deterministic stub features, exact binary dedup."""

from courlan_spark.operators.multimodal import (
    _decode_stub,
    exact_media_dedup,
    extract_media_features,
)


def test_media_features_and_dedup(spark):
    rows = [
        (1, "image", b"payload-one", None, None, None),
        (2, "image", b"payload-two", None, None, None),
        (3, "audio", b"payload-one", None, None, None),  # exact dup of 1
        (4, "video", b"", None, None, None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, width int, height int, duration_ms int",
    )
    feats = {r["media_id"]: r for r in extract_media_features(media).collect()}
    assert feats[1]["n_bytes"] == len(b"payload-one")
    assert feats[1]["content_hash"] == feats[3]["content_hash"]
    assert feats[1]["content_hash"] != feats[2]["content_hash"]
    assert len(feats[1]["feature"]) == 8
    # stub decode is deterministic and matches the scalar form
    # (float32 column round-trip -> compare with tolerance)
    expected = _decode_stub(b"payload-one", "image")
    assert all(
        abs(a - b) < 1e-6 for a, b in zip(feats[1]["feature"], expected)
    )
    assert feats[4]["n_bytes"] == 0

    groups = {r["content_hash"]: r for r in exact_media_dedup(media).collect()}
    dup_group = [g for g in groups.values() if g["n_copies"] == 2]
    assert len(dup_group) == 1 and dup_group[0]["keeper_id"] == 1


def test_resize_and_frame_sampling(spark):
    rows = [
        (1, "image", b"img-bytes", 640, 480, None),
        (2, "video", b"vid-bytes", None, None, 3500),
        (3, "audio", b"aud-bytes", None, None, 2000),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, width int, height int, duration_ms int",
    )
    from courlan_spark.operators.multimodal import (
        media_neardup_pairs,
        resize_media,
        sample_video_frames,
    )

    resized = {r["media_id"]: r for r in resize_media(media, 128, 128).collect()}
    assert (resized[1]["width"], resized[1]["height"]) == (128, 128)
    assert resized[1]["payload"] != b"img-bytes"          # stub transformed
    assert resized[2]["payload"] == b"vid-bytes"          # non-image passthrough
    assert resized[2]["duration_ms"] == 3500
    # deterministic stub
    again = {r["media_id"]: r for r in resize_media(media, 128, 128).collect()}
    assert again[1]["payload"] == resized[1]["payload"]

    frames = sample_video_frames(media, every_ms=1000).collect()
    # video of 3500ms at 1000ms cadence -> ts 0,1000,2000,3000
    assert [(r["frame_idx"], r["ts_ms"]) for r in sorted(frames, key=lambda r: r["ts_ms"])] == [
        (0, 0), (1, 1000), (2, 2000), (3, 3000)
    ]
    assert all(r["media_id"] == 2 for r in frames)
    assert len({bytes(r["frame"]) for r in frames}) == 4  # distinct per ts

    # identical payloads -> identical stub features -> cosine 1 pair
    dup_rows = rows + [(4, "image", b"img-bytes", 640, 480, None)]
    dup_media = spark.createDataFrame(
        dup_rows,
        "media_id long, kind string, payload binary, width int, height int, duration_ms int",
    )
    pairs = media_neardup_pairs(dup_media, threshold=0.999).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 4)]


# ---- round 4: REAL pure-numpy codecs for uncompressed formats ----


def _make_bmp(width=16, height=12, seed=5):
    import numpy as np

    from courlan_spark.operators import codecs

    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
    return rgb, codecs.encode_bmp(rgb)


def _make_wav(n_frames=4000, rate=8000, channels=2, seed=6):
    import struct

    import numpy as np

    rng = np.random.default_rng(seed)
    pcm = (rng.standard_normal((n_frames, channels)) * 8000).astype("<i2")
    data = pcm.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16
    )
    payload = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return pcm, rate, payload


def test_bmp_roundtrip_and_resize():
    import numpy as np

    from courlan_spark.operators import codecs

    rgb, payload = _make_bmp(width=15, height=9)  # odd width: row padding
    decoded = codecs.decode_bmp(payload)
    assert np.array_equal(decoded, rgb)
    small = codecs.resize_nearest(decoded, 5, 3)
    assert small.shape == (3, 5, 3)
    # nearest-neighbor picks actual source pixels
    assert all(
        small[i, j].tolist() in rgb.reshape(-1, 3).tolist()
        for i in range(3)
        for j in range(5)
    )
    again = codecs.decode_bmp(codecs.encode_bmp(small))
    assert np.array_equal(again, small)


def test_wav_roundtrip_features():
    import numpy as np

    from courlan_spark.operators import codecs

    pcm, rate, payload = _make_wav()
    samples, got_rate = codecs.decode_wav(payload)
    assert got_rate == rate and samples.shape == pcm.shape
    assert np.allclose(samples, pcm.astype(np.float32) / 32768.0)
    feats = codecs.audio_features(samples, rate)
    assert len(feats) == 8
    assert abs(feats[3] - pcm.shape[0] / rate) < 1e-6  # duration
    assert 0 < feats[0] <= feats[1] <= 1.0  # rms <= peak


def test_codecs_reject_unknown_profiles():
    import pytest

    from courlan_spark.operators import codecs

    with pytest.raises(codecs.UnsupportedMediaError):
        codecs.decode_bmp(b"BM" + b"\x00" * 60)  # bogus header
    with pytest.raises(codecs.UnsupportedMediaError):
        codecs.decode_wav(b"RIFF\x00\x00\x00\x00WAVEjunk")


def test_media_features_real_decode_path(spark):
    """BMP and WAV payloads get MEASURED features (channel means /
    RMS), not digest stubs — two images with different brightness must
    order by their mean channel feature; compressed-format payloads
    still take the stub."""
    import numpy as np

    from courlan_spark.operators import codecs
    from courlan_spark.operators.multimodal import extract_media_features

    dark = codecs.encode_bmp(np.full((8, 8, 3), 10, dtype=np.uint8))
    bright = codecs.encode_bmp(np.full((8, 8, 3), 240, dtype=np.uint8))
    _, _, wav = _make_wav(n_frames=800, channels=1)
    rows = [
        (1, "image", bytearray(dark), 8, 8, None),
        (2, "image", bytearray(bright), 8, 8, None),
        (3, "audio", bytearray(wav), None, None, 100),
        (4, "image", bytearray(b"\x89PNG fake compressed"), 4, 4, None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, width int, "
        "height int, duration_ms int",
    )
    feats = {
        r["media_id"]: r["feature"]
        for r in extract_media_features(media).collect()
    }
    assert feats[1][0] < 0.1 and feats[2][0] > 0.9  # measured means
    assert abs(feats[3][3] - 0.1) < 1e-3  # wav duration 800/8000 s
    assert len(feats[4]) == 8  # stub fallback still shaped right


def test_resize_media_real_bmp_path(spark):
    import numpy as np

    from courlan_spark.operators import codecs
    from courlan_spark.operators.multimodal import resize_media

    rgb, payload = _make_bmp(width=16, height=12)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), 16, 12, None)],
        "media_id long, kind string, payload binary, width int, "
        "height int, duration_ms int",
    )
    out = resize_media(media, 4, 3).collect()[0]
    assert (out["width"], out["height"]) == (4, 3)
    resized = codecs.decode_bmp(bytes(out["payload"]))
    assert resized.shape == (3, 4, 3)
    assert np.array_equal(resized, codecs.resize_nearest(rgb, 4, 3))
