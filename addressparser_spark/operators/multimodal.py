"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: media lives as an opaque ``binary``
column with a typed metadata struct; decode/feature-extract runs as
Arrow-batched ``mapInPandas`` so each task streams batches without
materializing whole partitions.

The sandbox has no image/audio libraries, so the decode step is STUBBED:
``decode_media`` raises ``NotImplementedError`` unless ``deterministic_fake``
is set, in which case features are derived deterministically from the bytes
(md5 arithmetic) — the Spark-side plumbing (schema, batching, partitioning,
UDF signatures) is real and tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<n_bytes: bigint, mime: string, source: string>"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, "
    "width int, height int, duration_ms int, feature_hash string"
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table: text bytes as the opaque payload.

    Stand-in for reading real image/audio blobs; kind cycles by doc_id so all
    downstream branches execute.
    """
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
            F.concat(kind, F.lit("/synthetic")).alias("mime"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def _fake_features(kind: str, payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a real decoder: dims/duration from bytes."""
    h = hashlib.md5(payload).digest()
    if kind == "image":
        return 64 + h[0] % 192, 64 + h[1] % 192, 0
    if kind == "audio":
        return 0, 0, 1000 + int.from_bytes(h[2:4], "big") % 60000
    return 320 + h[4] % 64, 240 + h[5] % 64, 1000 + int.from_bytes(h[6:8], "big") % 30000


def decode_media(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas``.

    Real deployment: replace ``_fake_features`` with PIL/librosa/ffmpeg calls
    inside the same batch loop — the Arrow batch shape, output schema, and
    partitioning are identical.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not deterministic_fake:
            raise NotImplementedError(
                "real media decoding requires image/audio libraries not "
                "present in this environment; set deterministic_fake=True"
            )
        for pdf in batches:
            feats = [
                _fake_features(k, bytes(p)) for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "duration_ms": [f[2] for f in feats],
                    "feature_hash": [
                        hashlib.md5(bytes(p)).hexdigest() for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Frame-sampling plumbing for video: one row per sampled offset.

    The sampled "frame" is a deterministic byte-slice hash (real decoder slots
    into the same explode shape).
    """
    feats = decode_media(media.filter(F.col("kind") == "video"))
    offsets = F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
    return feats.select(
        "media_id",
        F.explode(offsets).alias("offset_ms"),
        F.md5(F.concat_ws("|", "feature_hash", F.col("offset_ms").cast("string"))).alias("frame_hash"),
    )
