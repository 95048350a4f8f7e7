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
