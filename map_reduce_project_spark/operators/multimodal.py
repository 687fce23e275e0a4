"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
typed metadata columns next to them. The Spark-side plumbing — schema,
Arrow batch shape, ``mapInPandas`` partition processing — is real and
tested. ``decode_media`` does REAL header-level metadata extraction
for PNG/JPEG/BMP/PPM/WAV (pure stdlib parsing — the cheap first pass
a pipeline runs over every payload); full pixel/sample decode and
resize for compressed formats need PIL/ffmpeg (not in this
container) and stay stubbed behind ``NotImplementedError``, with a
deterministic ``fake/*`` modality so the pipeline is testable
end-to-end.

At scale this is the canonical pattern: keep payloads in parquet
binary columns (or pointers to object storage), process them with
Arrow-batched Python only in the narrow decode/featurize stage, and
keep everything before/after in JVM expressions.
"""

from __future__ import annotations

import hashlib
import struct
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


def _parse_png(b: bytes) -> dict:
    # IHDR is mandatory-first: width/height are big-endian u32 at 16..24
    if len(b) < 24 or b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    w, h = struct.unpack(">II", b[16:24])
    return {"width": w, "height": h}


def _parse_bmp(b: bytes) -> dict:
    # BITMAPINFOHEADER: signed little-endian dims at 18/22 (negative
    # height = top-down row order)
    if len(b) < 26 or b[:2] != b"BM":
        raise ValueError("not a BMP")
    w, h = struct.unpack("<ii", b[18:26])
    return {"width": abs(w), "height": abs(h)}


def _parse_ppm(b: bytes) -> dict:
    # P6 "<w> <h> <maxval>" header, '#' comments allowed
    if b[:2] != b"P6":
        raise ValueError("not a binary PPM")
    fields: list[int] = []
    i = 2
    while len(fields) < 2 and i < len(b):
        c = b[i : i + 1]
        if c == b"#":
            i = b.find(b"\n", i)
            if i < 0:
                break
            i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(b) and b[j : j + 1].isdigit():
                j += 1
            if j == i:
                raise ValueError("bad PPM header")
            fields.append(int(b[i:j]))
            i = j
    if len(fields) < 2:
        raise ValueError("truncated PPM header")
    return {"width": fields[0], "height": fields[1]}


def _parse_jpeg(b: bytes) -> dict:
    # walk markers to the first SOF0-SOF15 frame header (skipping
    # DHT/DAC/RST/standalone markers); dims are big-endian u16 there
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", b[i + 5 : i + 9])
            return {"width": w, "height": h}
        (seg_len,) = struct.unpack(">H", b[i + 2 : i + 4])
        i += 2 + seg_len
    raise ValueError("no JPEG frame header found")


def _parse_wav(b: bytes) -> dict:
    # RIFF chunk walk: channels from 'fmt ', sample count from 'data'
    # size / block align. width = samples per channel, height =
    # channel count (the metadata schema's 2-D slot for audio).
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    channels = bits = None
    n_samples = 0
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        (size,) = struct.unpack("<I", b[i + 4 : i + 8])
        if cid == b"fmt ":
            channels, _rate = struct.unpack("<HI", b[i + 10 : i + 16])
            (bits,) = struct.unpack("<H", b[i + 22 : i + 24])
        elif cid == b"data" and channels and bits:
            n_samples = size // (channels * bits // 8)
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if channels is None:
        raise ValueError("no fmt chunk")
    return {"width": n_samples, "height": channels}


_HEADER_DECODERS = {
    "image/png": _parse_png,
    "image/bmp": _parse_bmp,
    "image/x-portable-pixmap": _parse_ppm,
    "image/jpeg": _parse_jpeg,
    "audio/wav": _parse_wav,
}


def decode_media(payload: bytes, modality: str) -> dict:
    """Header-level metadata decode.

    REAL for PNG / JPEG / BMP / PPM / WAV — pure header parsing, no
    media libraries, which is exactly the cheap first metadata pass a
    production pipeline runs over billions of payloads (full pixel
    decode is deferred to the narrow featurize stage and a far
    smaller row set). Pixel/sample decode and resize for compressed
    formats still need PIL/ffmpeg — not in this container — so those
    stages stay stubbed. The ``fake/*`` modality yields deterministic
    dimensions derived from the payload so the full pipeline is
    testable end-to-end without any real media bytes.
    """
    if modality.startswith("fake/"):
        return {
            "width": 64 + payload[0] % 64 if payload else 0,
            "height": 64 + len(payload) % 64,
        }
    decoder = _HEADER_DECODERS.get(modality)
    if decoder is not None:
        return decoder(payload)
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
