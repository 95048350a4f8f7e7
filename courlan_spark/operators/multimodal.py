"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct;
decode/feature stages are Arrow-batched mapInPandas passes.  The
actual codecs are not available in this container, so the decode
kernel is a deterministic stub (clearly marked); the Spark-side
contract — schema, batch shape, partition sizing — is real and
tested, and a production deployment swaps `_decode_stub` for a
Pillow/ffmpeg-backed kernel with no plan changes.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, content_hash string, feature array<float>"


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """STUB: deterministic fake 'feature vector' from payload bytes.
    A real deployment replaces this with an image/audio decoder; the
    surrounding plan (mapInPandas, Arrow batches, schema) is final."""
    digest = hashlib.blake2b(payload or b"", digest_size=32).digest()
    return [b / 255.0 for b in digest[:8]]


def extract_media_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    "Arrow-batched decode/feature pass over opaque binary payloads."

    def run(iterator):
        for pdf in iterator:
            features = [
                _decode_stub(p if isinstance(p, (bytes, bytearray)) else b"", k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        len(p) if isinstance(p, (bytes, bytearray)) else 0
                        for p in pdf["payload"]
                    ],
                    "content_hash": [
                        hashlib.md5(
                            p if isinstance(p, (bytes, bytearray)) else b""
                        ).hexdigest()
                        for p in pdf["payload"]
                    ],
                    "feature": features,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def exact_media_dedup(media: DataFrame) -> DataFrame:
    "Exact binary dedup on content hash (native md5 + hash-agg)."
    return (
        media.withColumn("content_hash", F.md5(F.col("payload")))
        .groupBy("content_hash")
        .agg(
            F.min("media_id").alias("keeper_id"),
            F.count("*").alias("n_copies"),
        )
    )
