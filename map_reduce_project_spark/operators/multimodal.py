"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
typed metadata columns next to them. The Spark-side plumbing — schema,
Arrow batch shape, ``mapInPandas`` partition processing — is real and
tested; the actual media decode is stubbed (no image/audio libs in
this container) behind ``decode_media``, which raises
``NotImplementedError`` for real modalities and produces a
deterministic fake decode for the ``fake/*`` modality used in tests.

At scale this is the canonical pattern: keep payloads in parquet
binary columns (or pointers to object storage), process them with
Arrow-batched Python only in the narrow decode/featurize stage, and
keep everything before/after in JVM expressions.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

METADATA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_md5", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def decode_media(payload: bytes, modality: str) -> dict:
    """Decode stub. Real decoders (PIL/ffmpeg/soundfile) are not in
    this container; the fake modality yields deterministic dimensions
    derived from the payload so the pipeline is testable end-to-end."""
    if modality.startswith("fake/"):
        return {
            "width": 64 + payload[0] % 64 if payload else 0,
            "height": 64 + len(payload) % 64,
        }
    raise NotImplementedError(
        f"no decoder for modality {modality!r} in this environment"
    )


def attach_fake_payload(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Manufacture a binary payload column from text (UTF-8 bytes) with
    a modality tag — stands in for real image/audio bytes in tests."""
    return docs.select(
        F.col(id_col),
        F.lit("fake/image").alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def extract_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over (doc_id, modality, payload).

    ``mapInPandas``: one Python process per partition, pandas batches
    in/out — the shape every real decode/featurize stage uses. All
    outputs are deterministic functions of the payload bytes.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                decode_media(payload, modality)
                for payload, modality in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "payload_md5": [
                        hashlib.md5(p).hexdigest() for p in pdf["payload"]
                    ],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                }
            )

    return media.mapInPandas(process, METADATA_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def resize_media(payload: bytes, modality: str, w: int, h: int) -> bytes:
    """Resize stub: a real engine calls PIL/libvips here. The fake
    modality produces a deterministic derived payload (md5-chained to
    the target geometry) so downstream stages and tests have stable
    bytes to hash."""
    if modality.startswith("fake/"):
        seed = hashlib.md5(payload + f"|{w}x{h}".encode()).digest()
        return (seed * ((w * h * 3) // len(seed) + 1))[: w * h * 3]
    raise NotImplementedError(
        f"no resizer for modality {modality!r} in this environment"
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """1:1 Arrow-batched resize stage over (doc_id, modality, payload).

    Same mapInPandas shape as ``extract_metadata``; the output payload
    is the resized bytes (w*h*3 for the fake modality — an RGB buffer
    stand-in). Partitioning is preserved: a narrow transform, no
    shuffle, safe to chain before a write or a featurize stage.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                resize_media(p, m, width, height)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "payload": out,
                    "width": [width] * len(out),
                    "height": [height] * len(out),
                }
            )

    return media.mapInPandas(process, RESIZED_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_md5", StringType()),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """1:N frame-sampling stage (the video shape: one row in, one row
    per sampled frame out — mapInPandas is the right tool because the
    fan-out ratio is data-dependent, which a pandas_udf can't express).

    The fake "video" has ``len(payload) // 32`` frames; every_n-th is
    sampled and fingerprinted. A real engine swaps the body for an
    ffmpeg keyframe pull with identical schema and batch shape.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, md5s = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(payload) // 32
                for i in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    md5s.append(
                        hashlib.md5(payload[i * 32 : (i + 1) * 32]).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_md5": md5s}
            )

    return media.mapInPandas(process, FRAMES_SCHEMA)
