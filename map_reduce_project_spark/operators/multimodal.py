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
