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
