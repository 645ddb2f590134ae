"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` UDFs.

The decode step is STUBBED (no image/audio libraries in this container —
``decode_media`` raises NotImplementedError unless ``fake=True``, which
substitutes a deterministic fake decoder), but the Spark-side plumbing —
schema, batch shape, partitioning, UDF signatures — is real and tested:
this is exactly the structure a production pipeline drops PIL/ffmpeg into.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, media binary, n_bytes long, meta_width int, "
    "meta_height int"
)


def as_media_table(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Wrap a text corpus as a fake media table (binary payload = UTF-8
    bytes; deterministic metadata) — the test stand-in for an ingest of real
    image/audio bytes."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("media"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        (F.col(id_col) % 640 + 16).cast("int").alias("meta_width"),
        (F.col(id_col) % 480 + 16).cast("int").alias("meta_height"),
    )


def decode_media(payload: bytes, media_type: str, fake: bool = False) -> np.ndarray:
    """Decode one media payload to a float feature array. Real decoders
    (PIL / soundfile / pyav) are not installed in this container."""
    if not fake:
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present in "
            "this container; pass fake=True for the deterministic stub"
        )
    # deterministic fake: 8 features from the sha256 digest
    digest = hashlib.sha256(payload).digest()
    return np.frombuffer(digest[:32], dtype=np.uint8).reshape(8, 4).mean(axis=1) / 255.0


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """(doc_id, media_type, features array<double>) via mapInPandas — the
    decode/feature-extract stage. Batch shape: one Arrow batch of binary
    payloads in, one batch of fixed-width feature vectors out; partitioning
    is inherited (no shuffle), so this scales linearly with input splits."""

    def extract(batches):
        for pdf in batches:
            feats = [
                decode_media(bytes(m), t, fake=fake).tolist()
                for m, t in zip(pdf["media"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "features": feats,
                }
            )

    return media.mapInPandas(
        extract, schema="doc_id long, media_type string, features array<double>"
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 64, fake: bool = True) -> DataFrame:
    """Video-style frame sampling stand-in: emit one row per sampled offset
    (mapInPandas fan-out: 1 input row -> N output rows, the shape of a real
    frame sampler)."""

    def sample(batches):
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "offset": [], "frame_sig": []}
            for did, m in zip(pdf["doc_id"], pdf["media"]):
                payload = bytes(m)
                for fi, off in enumerate(range(0, len(payload), every_n_bytes)):
                    chunk = payload[off:off + every_n_bytes]
                    rows["doc_id"].append(did)
                    rows["frame_idx"].append(fi)
                    rows["offset"].append(off)
                    rows["frame_sig"].append(hashlib.sha256(chunk).hexdigest()[:16])
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        sample,
        schema="doc_id long, frame_idx int, offset long, frame_sig string",
    )
