"""Multimodal plumbing query: binary payload -> mapInPandas metadata
extraction. The payloads are manufactured from document text (UTF-8
bytes) so the whole Arrow-batched decode path can be oracle-checked:
every output column is a deterministic function of the bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_project_spark.operators.multimodal import (
    attach_fake_payload,
    extract_metadata,
    spread_rows,
)
from map_reduce_project_spark.queries import Query
from map_reduce_project_spark.sources.io import read_table


def mm_metadata_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_rows(read_table(spark, sf_dir, "documents"))
    return extract_metadata(attach_fake_payload(docs))


MM_METADATA_SQL = """
SELECT doc_id,
  'fake/image' AS modality,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  md5(text) AS payload_md5,
  CAST(CASE WHEN octet_length(encode(text)) = 0 THEN 0
            ELSE 64 + (('0x' || substr(hex(encode(text)), 1, 2))::INT % 64)
       END AS BIGINT) AS width,
  CAST(64 + octet_length(encode(text)) % 64 AS BIGINT) AS height
FROM documents
"""


QUERIES = [
    Query("mm_extract_metadata", mm_metadata_q, MM_METADATA_SQL, "Arrow-batched binary payload metadata extraction (mapInPandas)"),
]


def mm_frame_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (1:N mapInPandas fan-out) rolled up per doc —
    the sampled-frame COUNTS are pure functions of payload length, so
    the data-dependent explode is still under the exact hash gate."""
    from pyspark.sql import functions as F

    from map_reduce_project_spark.operators.multimodal import sample_frames

    docs = spread_rows(read_table(spark, sf_dir, "documents"))
    frames = sample_frames(attach_fake_payload(docs), every_n=10)
    return frames.groupBy("doc_id").agg(
        F.count("*").alias("n_sampled"),
        F.max("frame_idx").alias("max_frame_idx"),
    )


MM_FRAMES_SQL = """
SELECT doc_id,
  CAST((octet_length(encode(text)) // 32 + 9) // 10 AS BIGINT) AS n_sampled,
  CAST(((octet_length(encode(text)) // 32 + 9) // 10 - 1) * 10 AS BIGINT)
    AS max_frame_idx
FROM documents
WHERE octet_length(encode(text)) >= 32
"""

QUERIES.append(
    Query(
        "mm_frame_sample",
        mm_frame_sample_q,
        MM_FRAMES_SQL,
        "1:N frame sampling via mapInPandas, counts hash-checked",
    )
)


def mm_resize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 1:1 Arrow-batched resize stage under the exact gate: the
    fake resizer's output bytes are md5-chained to the input payload
    and target geometry, so the RESIZED PAYLOAD ITSELF is
    oracle-reconstructible — the oracle rebuilds the byte stream in
    hex-string space (DuckDB md5/repeat/substring are VARCHAR-only)
    and both sides compare md5-of-lowercase-hex of the full buffer."""
    from pyspark.sql import functions as F

    from map_reduce_project_spark.operators.multimodal import resize_images

    docs = spread_rows(read_table(spark, sf_dir, "documents"))
    resized = resize_images(attach_fake_payload(docs), 8, 8)
    return resized.select(
        "doc_id",
        "width",
        "height",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5(F.lower(F.hex("payload"))).alias("resized_hex_md5"),
    )


# 8x8 RGB buffer = 192 bytes = 13 repeats of the 16-byte md5 seed,
# truncated; in hex space that is 384 chars of the repeated md5 hex
MM_RESIZE_SQL = """
SELECT doc_id,
  CAST(8 AS BIGINT) AS width,
  CAST(8 AS BIGINT) AS height,
  CAST(192 AS BIGINT) AS n_bytes,
  md5(substring(repeat(md5(text || '|8x8'), 13), 1, 384)) AS resized_hex_md5
FROM documents
"""

QUERIES.append(
    Query(
        "mm_resize",
        mm_resize_q,
        MM_RESIZE_SQL,
        "1:1 mapInPandas resize stage; resized payload bytes oracle-reconstructed in hex space",
    )
)


def mm_pixel_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel decode under the exact gate: payloads are genuine
    P6 PPM (even ids) / padded bottom-up 24-bit BMP (odd ids) bytes
    built distributively from doc_id, and the engine path actually
    parses the formats (header walk, 4-byte row padding, BGR +
    bottom-up row order). Solid-color geometry makes the decoded
    integer channel sums SQL-predictable from doc_id arithmetic, so a
    wrong stride / row order / channel order shows up as a hash
    mismatch."""
    from map_reduce_project_spark.operators.multimodal import (
        attach_real_image_payload,
        pixel_stats,
    )

    docs = spread_rows(read_table(spark, sf_dir, "documents"))
    return pixel_stats(attach_real_image_payload(docs))


MM_PIXEL_STATS_SQL = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CASE WHEN doc_id % 2 = 0 THEN 'image/x-portable-pixmap'
       ELSE 'image/bmp' END AS modality,
  CAST(1 + doc_id % 16 AS BIGINT) AS width,
  CAST(1 + (doc_id // 16) % 16 AS BIGINT) AS height,
  CAST((1 + doc_id % 16) * (1 + (doc_id // 16) % 16) AS BIGINT) AS n_pixels,
  CAST((doc_id % 256) * (1 + doc_id % 16) * (1 + (doc_id // 16) % 16)
       AS BIGINT) AS sum_r,
  CAST(((doc_id * 7) % 256) * (1 + doc_id % 16) * (1 + (doc_id // 16) % 16)
       AS BIGINT) AS sum_g,
  CAST(((doc_id * 13) % 256) * (1 + doc_id % 16) * (1 + (doc_id // 16) % 16)
       AS BIGINT) AS sum_b
FROM documents
"""

QUERIES.append(
    Query(
        "mm_pixel_stats",
        mm_pixel_stats_q,
        MM_PIXEL_STATS_SQL,
        "real PPM/BMP pixel decode (padding, BGR, bottom-up) -> exact channel sums",
    )
)


def mm_resize_pixels_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL nearest-neighbor resize (numpy floor-index mapping) of real
    PPM/BMP payloads to 5x3, re-encoded as P6 PPM — the full output
    byte stream is md5-checked against an oracle that reconstructs it
    in hex space (solid input -> solid output, header is a constant)."""
    from pyspark.sql import functions as F

    from map_reduce_project_spark.operators.multimodal import (
        attach_real_image_payload,
        resize_images,
    )

    docs = spread_rows(read_table(spark, sf_dir, "documents"))
    resized = resize_images(attach_real_image_payload(docs), 5, 3)
    return resized.select(
        "doc_id",
        "width",
        "height",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5(F.lower(F.hex("payload"))).alias("resized_hex_md5"),
    )


# output payload = 11-byte header "P6\n5 3\n255\n" (hex constant below)
# + 15 repeats of the 3-byte solid color = 56 bytes
MM_RESIZE_PIXELS_SQL = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(5 AS BIGINT) AS width,
  CAST(3 AS BIGINT) AS height,
  CAST(56 AS BIGINT) AS n_bytes,
  md5('50360a3520330a3235350a'
      || repeat(printf('%02x%02x%02x',
                       doc_id % 256, (doc_id * 7) % 256, (doc_id * 13) % 256),
                15)) AS resized_hex_md5
FROM documents
"""

QUERIES.append(
    Query(
        "mm_resize_pixels",
        mm_resize_pixels_q,
        MM_RESIZE_PIXELS_SQL,
        "real pixel resize (decode -> numpy nearest -> PPM re-encode), bytes oracle-reconstructed",
    )
)


def mm_audio_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PCM16 WAV decode under the exact gate: every document gets
    a genuine RIFF/WAVE payload (samples a deterministic function of
    the id), the engine walks the container and unpacks the int16
    stream, and the integer stats hash-match an oracle that predicts
    them from the generator arithmetic — proving the decode, not just
    the header parse."""
    from map_reduce_project_spark.operators.multimodal import (
        attach_real_audio_payload,
        audio_sample_stats,
    )

    docs = spread_rows(read_table(spark, sf_dir, "documents"))
    return audio_sample_stats(attach_real_audio_payload(docs))


MM_AUDIO_STATS_SQL = """
WITH g AS (SELECT doc_id, 16 + doc_id % 17 AS n FROM documents),
s AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM g),
v AS (
  SELECT doc_id, n, ((doc_id * 31 + i * 7) % 2048) - 1024 AS val
  FROM s
)
SELECT doc_id,
  CAST(8000 AS BIGINT) AS sample_rate,
  CAST(n AS BIGINT) AS n_samples,
  CAST(SUM(val) AS BIGINT) AS sum_samples,
  CAST(SUM(val * val) AS BIGINT) AS sum_sq,
  CAST(MAX(ABS(val)) AS BIGINT) AS peak
FROM v GROUP BY doc_id, n
"""

QUERIES.append(
    Query(
        "mm_audio_stats",
        mm_audio_stats_q,
        MM_AUDIO_STATS_SQL,
        "real PCM16 WAV decode (RIFF walk + int16 unpack) -> exact stream stats",
    )
)


def mm_image_dhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual dHash under the exact gate: gradient PPM payloads
    are genuinely parsed back to pixels, luma'd, and difference-hashed
    (operators/multimodal.py:image_dhash); the oracle reconstructs all
    64 bits from the gradient generator arithmetic and formats the
    same 16-hex string — so the hash only matches if the real decode
    and the bit packing are both correct."""
    from map_reduce_project_spark.operators.multimodal import (
        attach_gradient_image_payload,
        image_dhash,
    )

    docs = spread_rows(read_table(spark, sf_dir, "documents"))
    return image_dhash(attach_gradient_image_payload(docs))


def _dhash_half_sql(lo_bit: int) -> str:
    terms = []
    for b in range(lo_bit, lo_bit + 32):
        y, x = divmod(b, 8)
        g1 = f"((doc_id * 13 + {x} * 17 + {y} * 29) % 256)"
        g2 = f"((doc_id * 13 + {x + 1} * 17 + {y} * 29) % 256)"
        terms.append(
            f"(CASE WHEN {g1} > {g2} THEN {1 << (b - lo_bit)} ELSE 0 END)"
        )
    return " + ".join(terms)


MM_DHASH_SQL = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  printf('%08x%08x',
    CAST({_dhash_half_sql(32)} AS BIGINT),
    CAST({_dhash_half_sql(0)} AS BIGINT)) AS dhash
FROM documents
"""

QUERIES.append(
    Query(
        "mm_image_dhash",
        mm_image_dhash_q,
        MM_DHASH_SQL,
        "perceptual dHash from real PPM pixel decode vs bit-predicting oracle",
    )
)


def mm_shot_boundaries_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video shot detection under the exact gate: 6 REAL PPM frames
    per document (gradient orientation flips at frame 3 — a cut),
    each genuinely decoded and dHashed
    (operators/multimodal.py:frame_dhashes), then consecutive-frame
    Hamming + threshold (shot_boundaries). The oracle predicts every
    frame's hash bits from the generator arithmetic and runs the same
    lag/xor/bit_count — so decode, hashing, and the temporal pass are
    all certified."""
    from map_reduce_project_spark.operators.multimodal import (
        frame_dhashes,
        shot_boundaries,
    )

    docs = spread_rows(read_table(spark, sf_dir, "documents"))
    return shot_boundaries(frame_dhashes(docs))


def _shot_half_sql(a: int, b: int, lo_bit: int) -> str:
    terms = []
    for bit in range(lo_bit, lo_bit + 32):
        y, x = divmod(bit, 8)
        g1 = f"((doc_id * 13 + {x} * {a} + {y} * {b}) % 256)"
        g2 = f"((doc_id * 13 + {x + 1} * {a} + {y} * {b}) % 256)"
        terms.append(
            f"(CASE WHEN {g1} > {g2} THEN {1 << (bit - lo_bit)} ELSE 0 END)"
        )
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


MM_SHOT_SQL = f"""
WITH f AS (
  SELECT doc_id, unnest(range(0, 6)) AS frame_idx FROM documents
),
h AS (
  SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
    CASE WHEN frame_idx < 3 THEN {_shot_half_sql(17, 29, 32)}
         ELSE {_shot_half_sql(29, 17, 32)} END AS hi,
    CASE WHEN frame_idx < 3 THEN {_shot_half_sql(17, 29, 0)}
         ELSE {_shot_half_sql(29, 17, 0)} END AS lo
  FROM f
),
g AS (
  SELECT doc_id, frame_idx, hi, lo,
         LAG(hi) OVER w AS phi, LAG(lo) OVER w AS plo
  FROM h
  WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
)
SELECT doc_id, frame_idx, printf('%08x%08x', hi, lo) AS dhash,
  CAST(COALESCE(bit_count(xor(hi, phi)) + bit_count(xor(lo, plo)), -1) AS BIGINT)
    AS hamming_prev,
  COALESCE(bit_count(xor(hi, phi)) + bit_count(xor(lo, plo)) >= 8, FALSE)
    AS is_cut
FROM g
"""

QUERIES.append(
    Query(
        "mm_shot_boundaries",
        mm_shot_boundaries_q,
        MM_SHOT_SQL,
        "video shot detection: real per-frame decode + dHash + consecutive-frame Hamming cut flag",
    )
)


def mm_audio_activity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio activity segmentation (VAD shape): REAL PCM16 decode
    streams samples into the relational plane
    (operators/multimodal.py:audio_samples), 4-sample frames get an
    exact integer energy, active frames (energy above the per-doc
    mean) merge into contiguous segments via gaps-and-islands — the
    decode-in-Python, DSP-in-the-JVM split every audio pipeline wants.
    Output: one row per active segment with exact bounds and energy.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from map_reduce_project_spark.operators.multimodal import (
        attach_real_audio_payload,
        audio_samples,
    )

    docs = spread_rows(read_table(spark, sf_dir, "documents"))
    samples = audio_samples(attach_real_audio_payload(docs))
    frames = (
        samples.withColumn("frame", F.expr("i div 4"))
        .groupBy("doc_id", "frame")
        .agg(F.sum(F.col("sample") * F.col("sample")).alias("energy"))
    )
    mean_e = frames.groupBy("doc_id").agg(
        F.avg("energy").alias("me"), F.count("*").alias("nf")
    )
    flagged = frames.join(mean_e, "doc_id").select(
        "doc_id",
        "frame",
        "energy",
        (F.col("energy").cast("double") > F.col("me")).alias("active"),
    )
    w = Window.partitionBy("doc_id").orderBy("frame")
    seg = flagged.where("active").withColumn(
        "seg_id", (F.col("frame") - F.row_number().over(w)).cast("long")
    )
    return seg.groupBy("doc_id", "seg_id").agg(
        F.min("frame").cast("long").alias("start_frame"),
        F.max("frame").cast("long").alias("end_frame"),
        F.sum("energy").cast("long").alias("segment_energy"),
    )


MM_AUDIO_ACTIVITY_SQL = """
WITH g AS (SELECT doc_id, 16 + doc_id % 17 AS n FROM documents),
s AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM g),
v AS (
  SELECT doc_id, i // 4 AS frame,
         ((doc_id * 31 + i * 7) % 2048) - 1024 AS val
  FROM s
),
frames AS (
  SELECT doc_id, CAST(frame AS BIGINT) AS frame,
         CAST(SUM(val * val) AS BIGINT) AS energy
  FROM v GROUP BY doc_id, frame
),
me AS (SELECT doc_id, AVG(energy) AS me FROM frames GROUP BY doc_id),
flagged AS (
  SELECT f.doc_id, f.frame, f.energy,
         CAST(f.energy AS DOUBLE) > me.me AS active
  FROM frames f JOIN me ON me.doc_id = f.doc_id
),
seg AS (
  SELECT doc_id, frame, energy,
         CAST(frame - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY frame) AS BIGINT)
           AS seg_id
  FROM flagged WHERE active
)
SELECT doc_id, seg_id,
  CAST(MIN(frame) AS BIGINT) AS start_frame,
  CAST(MAX(frame) AS BIGINT) AS end_frame,
  CAST(SUM(energy) AS BIGINT) AS segment_energy
FROM seg GROUP BY doc_id, seg_id
"""

QUERIES.append(
    Query(
        "mm_audio_activity",
        mm_audio_activity_q,
        MM_AUDIO_ACTIVITY_SQL,
        "audio activity segmentation: real PCM decode -> frame energy -> gaps-and-islands segments",
    )
)


def mm_pixel_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image pixel-intensity histogram from REAL decode: the
    gradient PPM payloads are parsed back to pixels and the grayscale
    values binned into 8 intensity buckets (value >> 5) — the
    image-statistics pass (exposure/contrast profiling) every vision
    data pipeline runs before training. Exact integer counts; the
    oracle rebuilds each bin from the gradient arithmetic.
    """
    from pyspark.sql import functions as F

    from map_reduce_project_spark.operators.multimodal import (
        DHASH_H,
        DHASH_W,
        attach_gradient_image_payload,
        decode_pixels,
    )
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    media = attach_gradient_image_payload(
        spread_rows(read_table(spark, sf_dir, "documents"))
    )

    def hist(batches):
        import numpy as np

        for pdf in batches:
            ids, bins, counts = [], [], []
            for doc_id, payload, modality in zip(
                pdf["doc_id"], pdf["payload"], pdf["modality"]
            ):
                px = decode_pixels(bytes(payload), modality).astype(np.int64)
                gray = (
                    px[:, :, 0] * 299 + px[:, :, 1] * 587 + px[:, :, 2] * 114
                ) // 1000
                binned = gray >> 5
                for b in range(8):
                    ids.append(int(doc_id))
                    bins.append(b)
                    counts.append(int((binned == b).sum()))
            yield pd.DataFrame(
                {"doc_id": ids, "bin": bins, "n_pixels": counts}
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("bin", LongType()),
            StructField("n_pixels", LongType()),
        ]
    )
    return media.mapInPandas(hist, schema)


MM_PIXEL_HIST_SQL = """
WITH px AS (
  SELECT doc_id, x, y,
         ((doc_id * 13 + x * 17 + y * 29) % 256) >> 5 AS bin
  FROM documents,
       (SELECT unnest(range(0, 9)) AS x),
       (SELECT unnest(range(0, 8)) AS y)
),
bins AS (SELECT unnest(range(0, 8)) AS bin)
SELECT d.doc_id, CAST(b.bin AS BIGINT) AS bin,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_pixels
FROM documents d
CROSS JOIN bins b
LEFT JOIN (
  SELECT doc_id, bin, COUNT(*) AS n FROM px GROUP BY doc_id, bin
) c ON c.doc_id = d.doc_id AND c.bin = b.bin
"""

QUERIES.append(
    Query(
        "mm_pixel_histogram",
        mm_pixel_histogram_q,
        MM_PIXEL_HIST_SQL,
        "8-bin intensity histogram from real pixel decode vs arithmetic-predicting oracle",
    )
)


def mm_png_pixel_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-format decode under the exact gate: payloads
    are spec-valid PNGs (zlib-deflated, per-scanline filters cycling
    through all five spec filter types, RGBA for odd ids) built
    distributively from doc_id, and the engine path genuinely
    INFLATES and UNFILTERS them (operators/multimodal.py PNG codec —
    stdlib zlib, no media library). Gradient content makes every
    filter reconstruction nontrivial, and the decoded integer channel
    sums are SQL-predictable from the gradient arithmetic, so a wrong
    Paeth predictor, filter offset, or alpha handling shows up as a
    hash mismatch."""
    from map_reduce_project_spark.operators.multimodal import (
        attach_real_png_payload,
        pixel_stats,
    )

    docs = spread_rows(read_table(spark, sf_dir, "documents"))
    return pixel_stats(attach_real_png_payload(docs))


# w = 1 + id % 8, h = 1 + (id // 8) % 6, channel c(x,y) =
# (id * k + 3x + 5y) % 256 for k in (1, 7, 13); generate_series is
# INCLUSIVE in DuckDB, so the bounds are w-1 / h-1 directly
MM_PNG_PIXEL_STATS_SQL = """
WITH g AS (
  SELECT x.g AS x, y.g AS y
  FROM generate_series(0, 7) x(g), generate_series(0, 5) y(g)
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
  'image/png' AS modality,
  CAST(1 + (d.doc_id // 8) % 6 AS BIGINT) AS height,
  CAST(1 + d.doc_id % 8 AS BIGINT) AS width,
  CAST((1 + d.doc_id % 8) * (1 + (d.doc_id // 8) % 6) AS BIGINT) AS n_pixels,
  CAST(SUM(CASE WHEN g.x <= d.doc_id % 8 AND g.y <= (d.doc_id // 8) % 6
           THEN (d.doc_id * 1 + 3 * g.x + 5 * g.y) % 256 END) AS BIGINT) AS sum_r,
  CAST(SUM(CASE WHEN g.x <= d.doc_id % 8 AND g.y <= (d.doc_id // 8) % 6
           THEN (d.doc_id * 7 + 3 * g.x + 5 * g.y) % 256 END) AS BIGINT) AS sum_g,
  CAST(SUM(CASE WHEN g.x <= d.doc_id % 8 AND g.y <= (d.doc_id // 8) % 6
           THEN (d.doc_id * 13 + 3 * g.x + 5 * g.y) % 256 END) AS BIGINT) AS sum_b
FROM documents d CROSS JOIN g
GROUP BY d.doc_id
"""
QUERIES.append(
    Query(
        "mm_png_pixel_stats",
        mm_png_pixel_stats_q,
        MM_PNG_PIXEL_STATS_SQL,
        "real PNG inflate+unfilter decode (all 5 filters, RGBA) -> exact channel sums",
    )
)


def mm_png_palette_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL indexed-color PNG decode under the exact gate (round 7):
    payloads are spec-valid color-type-3 PNGs at bit depths 2, 4 AND
    8 (id % 3 picks the depth, so the MSB-first sub-byte unpackers
    and the full-byte path all sit under one hash), PLTE-driven,
    filters cycling all five types over bpp=1 byte arithmetic
    (operators/multimodal.py:encode_palette_png/_decode_png_pixels).
    Index and palette formulas compose in SQL exactly like the GIF
    oracle, so a wrong bit order, palette stride, or pad-bit leak is
    a hash mismatch."""
    from map_reduce_project_spark.operators.multimodal import (
        attach_real_palette_png_payload,
        pixel_stats,
    )

    docs = spread_rows(read_table(spark, sf_dir, "documents"))
    return pixel_stats(attach_real_palette_png_payload(docs))


# w = 2 + id % 7, h = 2 + (id // 7) % 5; n_colors = 16/256/4 by id % 3;
# idx = (id + 3x + 5y) % n_colors; palette i = (i, 7i % 256, 13i % 256)
MM_PNG_PALETTE_STATS_SQL = """
WITH g AS (
  SELECT x.g AS x, y.g AS y
  FROM generate_series(0, 8) x(g), generate_series(0, 6) y(g)
),
p AS (
  SELECT d.doc_id, g.x, g.y,
    CASE d.doc_id % 3 WHEN 0 THEN 16 WHEN 1 THEN 256 ELSE 4 END AS nc,
    2 + d.doc_id % 7 AS w, 2 + (d.doc_id // 7) % 5 AS h
  FROM documents d CROSS JOIN g
),
px AS (
  SELECT doc_id, w, h,
    (doc_id + 3 * x + 5 * y) % nc AS idx
  FROM p WHERE x < w AND y < h
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  'image/png' AS modality,
  CAST(h AS BIGINT) AS height,
  CAST(w AS BIGINT) AS width,
  CAST(w * h AS BIGINT) AS n_pixels,
  CAST(SUM(idx % 256) AS BIGINT) AS sum_r,
  CAST(SUM((7 * idx) % 256) AS BIGINT) AS sum_g,
  CAST(SUM((13 * idx) % 256) AS BIGINT) AS sum_b
FROM px
GROUP BY doc_id, w, h
"""
QUERIES.append(
    Query(
        "mm_png_palette_stats",
        mm_png_palette_stats_q,
        MM_PNG_PALETTE_STATS_SQL,
        "real indexed-color PNG decode (PLTE, depths 2/4/8, sub-byte unpack) -> exact channel sums",
    )
)


def mm_gif_pixel_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode under the exact gate: payloads are spec-valid
    GIF89a files (real variable-width LZW — the decoder is pinned
    against the canonical 1x1 spec example, so the encoder cannot
    hide a mutually-cancelling bug behind the round trip) built
    distributively from doc_id (192-589 pixels; the larger ids push
    the LZW code width past its initial 9 bits, and the width-bump
    machinery is separately pinned by codec unit tests). Palette entry i =
    (i, 7i%256, 13i%256), pixel index (x,y) = (id+3x+5y)%256, so the
    decoded channel sums compose two formulas the oracle replays; a
    wrong width-bump rule or KwKwK case is a hash mismatch."""
    from map_reduce_project_spark.operators.multimodal import (
        attach_real_gif_payload,
        pixel_stats,
    )

    docs = spread_rows(read_table(spark, sf_dir, "documents"))
    return pixel_stats(attach_real_gif_payload(docs))


# w = 16 + id % 16, h = 12 + (id // 16) % 8; idx = (id + 3x + 5y) % 256;
# channels (idx, 7*idx % 256, 13*idx % 256)
MM_GIF_PIXEL_STATS_SQL = """
WITH g AS (
  SELECT x.g AS x, y.g AS y
  FROM generate_series(0, 31) x(g), generate_series(0, 19) y(g)
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
  'image/gif' AS modality,
  CAST(12 + (d.doc_id // 16) % 8 AS BIGINT) AS height,
  CAST(16 + d.doc_id % 16 AS BIGINT) AS width,
  CAST((16 + d.doc_id % 16) * (12 + (d.doc_id // 16) % 8) AS BIGINT)
    AS n_pixels,
  CAST(SUM(CASE WHEN g.x < 16 + d.doc_id % 16
                 AND g.y < 12 + (d.doc_id // 16) % 8
           THEN (d.doc_id + 3 * g.x + 5 * g.y) % 256 END) AS BIGINT) AS sum_r,
  CAST(SUM(CASE WHEN g.x < 16 + d.doc_id % 16
                 AND g.y < 12 + (d.doc_id // 16) % 8
           THEN (7 * ((d.doc_id + 3 * g.x + 5 * g.y) % 256)) % 256 END)
       AS BIGINT) AS sum_g,
  CAST(SUM(CASE WHEN g.x < 16 + d.doc_id % 16
                 AND g.y < 12 + (d.doc_id // 16) % 8
           THEN (13 * ((d.doc_id + 3 * g.x + 5 * g.y) % 256)) % 256 END)
       AS BIGINT) AS sum_b
FROM documents d CROSS JOIN g
GROUP BY d.doc_id
"""

QUERIES.append(
    Query(
        "mm_gif_pixel_stats",
        mm_gif_pixel_stats_q,
        MM_GIF_PIXEL_STATS_SQL,
        "real GIF LZW decode (variable width, spec-pinned) -> exact channel sums",
    )
)


def mm_jpeg_pixel_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode under the exact gate — the DC-only
    profile where the T.81 entropy layer is pure integers: payloads
    are spec-valid grayscale JFIFs (standard Annex K Huffman tables,
    byte stuffing, DC prediction chain) with every 8x8 block
    constant, so IDCT of the lone DC is flat and dc*q00/8 + 128 is
    exact at q00 = 8. A wrong Huffman table, EXTEND sign rule, or
    prediction reset shows up as a hash mismatch. Profiles that
    genuinely need libjpeg (nonzero AC, color) raise honestly inside
    the decoder."""
    from map_reduce_project_spark.operators.multimodal import (
        attach_real_jpeg_payload,
        pixel_stats,
    )

    docs = spread_rows(read_table(spark, sf_dir, "documents"))
    return pixel_stats(attach_real_jpeg_payload(docs))


# w = 8*(2 + id%4), h = 8*(1 + (id//4)%3); block (bx, by) value
# (id + 11bx + 17by) % 256; every channel sum = 64 * sum over blocks
MM_JPEG_PIXEL_STATS_SQL = """
WITH g AS (
  SELECT x.g AS bx, y.g AS by
  FROM generate_series(0, 4) x(g), generate_series(0, 2) y(g)
),
sums AS (
  SELECT d.doc_id,
    64 * SUM(CASE WHEN g.bx < 2 + d.doc_id % 4
                   AND g.by < 1 + (d.doc_id // 4) % 3
             THEN (d.doc_id + 11 * g.bx + 17 * g.by) % 256 END) AS s
  FROM documents d CROSS JOIN g
  GROUP BY d.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  'image/jpeg' AS modality,
  CAST(8 * (1 + (doc_id // 4) % 3) AS BIGINT) AS height,
  CAST(8 * (2 + doc_id % 4) AS BIGINT) AS width,
  CAST(64 * (2 + doc_id % 4) * (1 + (doc_id // 4) % 3) AS BIGINT)
    AS n_pixels,
  CAST(s AS BIGINT) AS sum_r,
  CAST(s AS BIGINT) AS sum_g,
  CAST(s AS BIGINT) AS sum_b
FROM sums
"""

QUERIES.append(
    Query(
        "mm_jpeg_pixel_stats",
        mm_jpeg_pixel_stats_q,
        MM_JPEG_PIXEL_STATS_SQL,
        "real DC-only baseline JPEG decode (T.81 entropy layer) -> exact sums",
    )
)


def mm_jpeg_color_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLOR baseline-JPEG decode under the exact gate: interleaved
    3-component scans (1x1 sampling, per-component DC prediction
    chains) with the YCbCr->RGB conversion in documented 2^16
    fixed-point integer math — so the oracle replays marker parse,
    three Huffman chains, AND the color conversion formula per
    block. Subsampled-chroma profiles still raise honestly (that is
    where real upsampling interpolation starts)."""
    from map_reduce_project_spark.operators.multimodal import (
        attach_real_jpeg_color_payload,
        pixel_stats,
    )

    docs = spread_rows(read_table(spark, sf_dir, "documents"))
    return pixel_stats(attach_real_jpeg_color_payload(docs))


# fixed-point conversion replayed per block; fd(x) = FLOOR(x/65536)
MM_JPEG_COLOR_SQL = """
WITH g AS (
  SELECT x.g AS bx, y.g AS by
  FROM generate_series(0, 3) x(g), generate_series(0, 1) y(g)
),
blocks AS (
  SELECT d.doc_id, g.bx, g.by,
    (d.doc_id + 23 * g.bx + 41 * g.by) % 256 AS yv,
    (3 * d.doc_id + 29 * g.bx + 7 * g.by) % 256 - 128 AS cbv,
    (5 * d.doc_id + 13 * g.bx + 31 * g.by) % 256 - 128 AS crv
  FROM documents d CROSS JOIN g
  WHERE g.bx < 2 + d.doc_id % 3 AND g.by < 1 + (d.doc_id // 3) % 2
),
px AS (
  SELECT doc_id,
    LEAST(255, GREATEST(0,
      yv + CAST(FLOOR((91881 * crv + 32768) / 65536.0) AS BIGINT))) AS r,
    LEAST(255, GREATEST(0,
      yv + CAST(FLOOR((-22554 * cbv - 46802 * crv + 32768) / 65536.0)
                AS BIGINT))) AS gg,
    LEAST(255, GREATEST(0,
      yv + CAST(FLOOR((116130 * cbv + 32768) / 65536.0) AS BIGINT))) AS b
  FROM blocks
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  'image/jpeg' AS modality,
  CAST(8 * (1 + (doc_id // 3) % 2) AS BIGINT) AS height,
  CAST(8 * (2 + doc_id % 3) AS BIGINT) AS width,
  CAST(64 * (2 + doc_id % 3) * (1 + (doc_id // 3) % 2) AS BIGINT)
    AS n_pixels,
  CAST(64 * SUM(r) AS BIGINT) AS sum_r,
  CAST(64 * SUM(gg) AS BIGINT) AS sum_g,
  CAST(64 * SUM(b) AS BIGINT) AS sum_b
FROM px
GROUP BY doc_id
"""

QUERIES.append(
    Query(
        "mm_jpeg_color_stats",
        mm_jpeg_color_stats_q,
        MM_JPEG_COLOR_SQL,
        "color DC-only JPEG: 3 Huffman chains + fixed-point YCbCr->RGB, exact",
    )
)


def mm_flac_audio_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL FLAC decode under the exact gate — the constant-subframe
    tier, where FLAC's container and INTEGRITY layers are pure
    integers: STREAMINFO, frame sync, header field codes, and both
    CRCs (8 over the header, 16 over the frame) verified per frame
    (a corrupted payload raises, pinned by test). Held-tone fixtures
    (2-4 frames of 256 constant samples each) make the stream stats
    SQL-predictable; LPC/rice/stereo tiers raise honestly — that is
    where real audio DSP starts."""
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    from map_reduce_project_spark.operators.multimodal import (
        decode_flac_constant,
        tone_flac_audio,
    )

    import pandas as pd

    docs = spread_rows(read_table(spark, sf_dir, "documents")).selectExpr(
        "CAST(doc_id AS LONG) AS doc_id"
    )
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_samples", LongType()),
            StructField("sum_samples", LongType()),
            StructField("min_sample", LongType()),
            StructField("max_sample", LongType()),
        ]
    )

    def stats(batches):
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                _, payload = tone_flac_audio(int(doc_id))
                s = decode_flac_constant(payload)
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "n_samples": len(s),
                        "sum_samples": int(s.sum()),
                        "min_sample": int(s.min()),
                        "max_sample": int(s.max()),
                    }
                )
            yield pd.DataFrame(out)

    return docs.mapInPandas(stats, schema)


# frame f in 0..(2+id%3)-1 holds (7id+13f)%4096-2048 for 256 samples
MM_FLAC_SQL = """
WITH f AS (SELECT g AS f FROM generate_series(0, 4) t(g)),
vals AS (
  SELECT d.doc_id, (7 * d.doc_id + 13 * f.f) % 4096 - 2048 AS v
  FROM documents d JOIN f ON f.f < 2 + d.doc_id % 3
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(256 * COUNT(*) AS BIGINT) AS n_samples,
  CAST(256 * SUM(v) AS BIGINT) AS sum_samples,
  CAST(MIN(v) AS BIGINT) AS min_sample,
  CAST(MAX(v) AS BIGINT) AS max_sample
FROM vals
GROUP BY doc_id
"""

QUERIES.append(
    Query(
        "mm_flac_audio_stats",
        mm_flac_audio_stats_q,
        MM_FLAC_SQL,
        "real FLAC constant-subframe decode with verified CRCs -> exact stats",
    )
)


def mm_avi_frame_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container decode under the exact gate: spec-valid
    AVI files (RIFF LIST walk, avih, BITMAPINFOHEADER, bottom-up
    stride-padded BGR '00db' frames, and an idx1 index VERIFIED
    against the frames actually present — a desynced index raises,
    pinned by test) built distributively; odd widths exercise the
    4-byte row padding. Per-frame channel sums are replayed by the
    oracle from the gradient formulas. MJPEG decodes for real too
    (mm_mjpeg_frame_stats); inter-frame codecs (H.264...) are the
    honest boundary where codec DSP this module cannot define
    deterministically begins."""
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from map_reduce_project_spark.operators.multimodal import (
        decode_avi_frames,
        gradient_avi_video,
    )

    docs = spread_rows(read_table(spark, sf_dir, "documents")).selectExpr(
        "CAST(doc_id AS LONG) AS doc_id"
    )
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_id", LongType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("sum_r", LongType()),
            StructField("sum_g", LongType()),
            StructField("sum_b", LongType()),
        ]
    )

    def stats(batches):
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                _, payload = gradient_avi_video(int(doc_id))
                for f, px in enumerate(decode_avi_frames(payload)):
                    h, w, _ = px.shape
                    out.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_id": f,
                            "width": w,
                            "height": h,
                            "sum_r": int(px[:, :, 0].sum()),
                            "sum_g": int(px[:, :, 1].sum()),
                            "sum_b": int(px[:, :, 2].sum()),
                        }
                    )
            yield pd.DataFrame(out)

    return docs.mapInPandas(stats, schema)


MM_AVI_SQL = """
WITH g AS (
  SELECT x.g AS x, y.g AS y
  FROM generate_series(0, 15) x(g), generate_series(0, 9) y(g)
),
f AS (SELECT g AS f FROM generate_series(0, 4) t(g))
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
  CAST(f.f AS BIGINT) AS frame_id,
  CAST(8 + d.doc_id % 8 AS BIGINT) AS width,
  CAST(6 + (d.doc_id // 8) % 4 AS BIGINT) AS height,
  CAST(SUM(CASE WHEN g.x < 8 + d.doc_id % 8 AND g.y < 6 + (d.doc_id // 8) % 4
           THEN (d.doc_id * 1 + 2 * f.f + 3 * g.x + 5 * g.y) % 256 END)
       AS BIGINT) AS sum_r,
  CAST(SUM(CASE WHEN g.x < 8 + d.doc_id % 8 AND g.y < 6 + (d.doc_id // 8) % 4
           THEN (d.doc_id * 7 + 2 * f.f + 3 * g.x + 5 * g.y) % 256 END)
       AS BIGINT) AS sum_g,
  CAST(SUM(CASE WHEN g.x < 8 + d.doc_id % 8 AND g.y < 6 + (d.doc_id // 8) % 4
           THEN (d.doc_id * 13 + 2 * f.f + 3 * g.x + 5 * g.y) % 256 END)
       AS BIGINT) AS sum_b
FROM documents d
JOIN f ON f.f < 2 + d.doc_id % 3
CROSS JOIN g
GROUP BY d.doc_id, f.f
"""

QUERIES.append(
    Query(
        "mm_avi_frame_stats",
        mm_avi_frame_stats_q,
        MM_AVI_SQL,
        "real AVI container decode (RIFF walk + verified idx1) -> per-frame sums",
    )
)


def mm_webdataset_shards_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard manifest for a MULTIMODAL training
    corpus: each record's byte cost is its text length plus its
    (deterministic synthetic) image payload size, records are laid
    out in doc_id order, and a record belongs to shard
    floor(start_byte / shard_bytes) — the tar-shard planning stage
    every large-scale multimodal loader (WebDataset/tfrecord) runs
    before writing. The exclusive prefix sum is a single running
    window ordered by id over record-COUNT-sized rows (one row per
    record, no payload bytes move); at extreme corpus sizes the same
    two-pass partition-offset formulation as pack_sequences applies.
    Exact int64 arithmetic end to end."""
    from pyspark.sql.window import Window

    docs = read_table(spark, sf_dir, "documents")
    # synthetic payload size mirrors attach_real_gif_payload's dims:
    # (16 + id%16) x (12 + (id//16)%8) x 3 bytes of pixels
    rec = docs.select(
        "doc_id",
        (
            F.col("n_chars").cast("long")
            + (16 + F.col("doc_id") % 16)
            * (12 + (F.col("doc_id") / 16).cast("long") % 8)
            * 3
        ).alias("rec_bytes"),
    )
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        rec.withColumn(
            "start_byte",
            F.coalesce(F.sum("rec_bytes").over(w), F.lit(0)).cast("long"),
        )
        .select(
            "doc_id",
            "rec_bytes",
            "start_byte",
            F.expr("start_byte div 65536").cast("long").alias("shard_id"),
        )
    )


MM_WDS_SQL = """
WITH rec AS (
  SELECT doc_id,
    CAST(n_chars + (16 + doc_id % 16) * (12 + (doc_id // 16) % 8) * 3
         AS BIGINT) AS rec_bytes
  FROM documents
)
SELECT doc_id, rec_bytes,
  CAST(COALESCE(SUM(rec_bytes) OVER (ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
    AS start_byte,
  CAST(COALESCE(SUM(rec_bytes) OVER (ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 65536
       AS BIGINT) AS shard_id
FROM rec
"""

QUERIES.append(
    Query(
        "mm_webdataset_shards",
        mm_webdataset_shards_q,
        MM_WDS_SQL,
        "WebDataset shard manifest: byte-budget layout of text+media records",
    )
)


def mm_jpeg_420_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4:2:0 SUBSAMPLED baseline-JPEG decode under the exact gate —
    the dominant real-corpus layout: each interleaved MCU carries 4 Y
    blocks + Cb + Cr, chroma is upsampled by exact 2x2 replication
    (T.81 leaves the filter to the decoder; replication keeps every
    step integer), and the fixed-point YCbCr->RGB follows. Channels
    are constant per 8x8 luma block, so the oracle replays the
    composed block formulas; a wrong macroblock raster order,
    predictor chain, or upsample alignment is a hash mismatch."""
    from map_reduce_project_spark.operators.multimodal import (
        attach_real_jpeg_420_payload,
        pixel_stats,
    )

    docs = spread_rows(read_table(spark, sf_dir, "documents"))
    return pixel_stats(attach_real_jpeg_420_payload(docs))


MM_JPEG_420_SQL = """
WITH g AS (
  SELECT x.g AS bx, y.g AS by
  FROM generate_series(0, 5) x(g), generate_series(0, 3) y(g)
),
blocks AS (
  SELECT d.doc_id, g.bx, g.by,
    (d.doc_id + 9 * g.bx + 21 * g.by) % 256 AS yv,
    (3 * d.doc_id + 17 * (g.bx // 2)) % 256 - 128 AS cbv,
    (5 * d.doc_id + 27 * (g.by // 2)) % 256 - 128 AS crv
  FROM documents d CROSS JOIN g
  WHERE g.bx < 2 * (1 + d.doc_id % 3) AND g.by < 2 * (1 + (d.doc_id // 3) % 2)
),
px AS (
  SELECT doc_id,
    LEAST(255, GREATEST(0,
      yv + CAST(FLOOR((91881 * crv + 32768) / 65536.0) AS BIGINT))) AS r,
    LEAST(255, GREATEST(0,
      yv + CAST(FLOOR((-22554 * cbv - 46802 * crv + 32768) / 65536.0)
                AS BIGINT))) AS gg,
    LEAST(255, GREATEST(0,
      yv + CAST(FLOOR((116130 * cbv + 32768) / 65536.0) AS BIGINT))) AS b
  FROM blocks
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  'image/jpeg' AS modality,
  CAST(16 * (1 + (doc_id // 3) % 2) AS BIGINT) AS height,
  CAST(16 * (1 + doc_id % 3) AS BIGINT) AS width,
  CAST(256 * (1 + doc_id % 3) * (1 + (doc_id // 3) % 2) AS BIGINT)
    AS n_pixels,
  CAST(64 * SUM(r) AS BIGINT) AS sum_r,
  CAST(64 * SUM(gg) AS BIGINT) AS sum_g,
  CAST(64 * SUM(b) AS BIGINT) AS sum_b
FROM px
GROUP BY doc_id
"""

QUERIES.append(
    Query(
        "mm_jpeg_420_stats",
        mm_jpeg_420_stats_q,
        MM_JPEG_420_SQL,
        "4:2:0 subsampled JPEG: macroblock interleave + replicate upsample, exact",
    )
)


def mm_jpeg_ac_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL AC-coefficient baseline-JPEG decode under the exact gate:
    the full T.81 entropy layer — zigzag scan, (run, size) Huffman
    symbols, double-ZRL zero runs, EOB — feeding the module's DEFINED
    fixed-point integer IDCT, whose four nonzero terms per pixel the
    oracle replays with the same inlined W constants and the same
    floor-shift rounding. A wrong zigzag entry, run accounting, or
    IDCT constant is a hash mismatch on all 500 files."""
    from map_reduce_project_spark.operators.multimodal import (
        attach_real_jpeg_ac_payload,
        pixel_stats,
    )

    docs = spread_rows(read_table(spark, sf_dir, "documents"))
    return pixel_stats(attach_real_jpeg_ac_payload(docs))


MM_JPEG_AC_SQL = """
WITH w(u, x, wv) AS (
  VALUES
    (0, 0, 362),
    (0, 1, 362),
    (0, 2, 362),
    (0, 3, 362),
    (0, 4, 362),
    (0, 5, 362),
    (0, 6, 362),
    (0, 7, 362),
    (1, 0, 502),
    (1, 1, 426),
    (1, 2, 284),
    (1, 3, 100),
    (1, 4, -100),
    (1, 5, -284),
    (1, 6, -426),
    (1, 7, -502),
    (3, 0, 426),
    (3, 1, -100),
    (3, 2, -502),
    (3, 3, -284),
    (3, 4, 284),
    (3, 5, 502),
    (3, 6, 100),
    (3, 7, -426),
    (5, 0, 284),
    (5, 1, -502),
    (5, 2, 100),
    (5, 3, 426),
    (5, 4, -426),
    (5, 5, -100),
    (5, 6, 502),
    (5, 7, -284)
),
g AS (
  SELECT bx.g AS bx, by.g AS by, px.g AS px, py.g AS py
  FROM generate_series(0, 2) bx(g), generate_series(0, 1) by(g),
       generate_series(0, 7) px(g), generate_series(0, 7) py(g)
),
pix AS (
  SELECT d.doc_id, g.bx, g.by, g.px, g.py,
    LEAST(255, GREATEST(0,
      CAST(FLOOR((
          ((d.doc_id + 13 * g.bx + 29 * g.by) % 256 - 128)
            * w0x.wv * w0y.wv
        + ((3 * d.doc_id + 7 * g.bx) % 64 - 32) * w1x.wv * w0y.wv
        + ((5 * d.doc_id + 11 * g.by) % 64 - 32) * w0x.wv * w1y.wv
        + (d.doc_id % 16 + 1) * w5x.wv * w3y.wv
        + 524288) / 1048576.0) AS BIGINT) + 128)) AS p
  FROM documents d
  CROSS JOIN g
  JOIN w w0x ON w0x.u = 0 AND w0x.x = g.px
  JOIN w w0y ON w0y.u = 0 AND w0y.x = g.py
  JOIN w w1x ON w1x.u = 1 AND w1x.x = g.px
  JOIN w w1y ON w1y.u = 1 AND w1y.x = g.py
  JOIN w w5x ON w5x.u = 5 AND w5x.x = g.px
  JOIN w w3y ON w3y.u = 3 AND w3y.x = g.py
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  'image/jpeg' AS modality,
  CAST(16 AS BIGINT) AS height,
  CAST(24 AS BIGINT) AS width,
  CAST(384 AS BIGINT) AS n_pixels,
  CAST(SUM(p) AS BIGINT) AS sum_r,
  CAST(SUM(p) AS BIGINT) AS sum_g,
  CAST(SUM(p) AS BIGINT) AS sum_b
FROM pix
GROUP BY doc_id
"""

QUERIES.append(
    Query(
        "mm_jpeg_ac_stats",
        mm_jpeg_ac_stats_q,
        MM_JPEG_AC_SQL,
        "full AC entropy decode + defined integer IDCT, oracle-replayed per term",
    )
)


def mm_jpeg_411_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4:1:1 SUBSAMPLED baseline-JPEG decode under the exact gate —
    the DV-camcorder layout: each interleaved MCU carries 4 Y blocks
    side by side + Cb + Cr, chroma is upsampled by 4x HORIZONTAL
    replication only, then the fixed-point YCbCr->RGB. The oracle
    replays the composed block formulas; a wrong MCU strip order,
    predictor chain, or upsample axis is a hash mismatch."""
    from map_reduce_project_spark.operators.multimodal import (
        attach_real_jpeg_411_payload,
        pixel_stats,
    )

    docs = spread_rows(read_table(spark, sf_dir, "documents"))
    return pixel_stats(attach_real_jpeg_411_payload(docs))


MM_JPEG_411_SQL = """
WITH g AS (
  SELECT x.g AS bx, y.g AS by
  FROM generate_series(0, 7) x(g), generate_series(0, 2) y(g)
),
blocks AS (
  SELECT d.doc_id, g.bx, g.by,
    (d.doc_id + 7 * g.bx + 19 * g.by) % 256 AS yv,
    (3 * d.doc_id + 13 * (g.bx // 4) + 5 * g.by) % 256 - 128 AS cbv,
    (5 * d.doc_id + 11 * (g.bx // 4) + 3 * g.by) % 256 - 128 AS crv
  FROM documents d CROSS JOIN g
  WHERE g.bx < 4 * (1 + d.doc_id % 2)
    AND g.by < 1 + (d.doc_id // 2) % 3
),
px AS (
  SELECT doc_id,
    LEAST(255, GREATEST(0,
      yv + CAST(FLOOR((91881 * crv + 32768) / 65536.0) AS BIGINT))) AS r,
    LEAST(255, GREATEST(0,
      yv + CAST(FLOOR((-22554 * cbv - 46802 * crv + 32768) / 65536.0)
                AS BIGINT))) AS gg,
    LEAST(255, GREATEST(0,
      yv + CAST(FLOOR((116130 * cbv + 32768) / 65536.0) AS BIGINT))) AS b
  FROM blocks
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  'image/jpeg' AS modality,
  CAST(8 * (1 + (doc_id // 2) % 3) AS BIGINT) AS height,
  CAST(32 * (1 + doc_id % 2) AS BIGINT) AS width,
  CAST(256 * (1 + doc_id % 2) * (1 + (doc_id // 2) % 3) AS BIGINT)
    AS n_pixels,
  CAST(64 * SUM(r) AS BIGINT) AS sum_r,
  CAST(64 * SUM(gg) AS BIGINT) AS sum_g,
  CAST(64 * SUM(b) AS BIGINT) AS sum_b
FROM px
GROUP BY doc_id
"""

QUERIES.append(
    Query(
        "mm_jpeg_411_stats",
        mm_jpeg_411_stats_q,
        MM_JPEG_411_SQL,
        "4:1:1 subsampled JPEG: 4-wide MCU strips + horizontal-only upsample",
    )
)


def mm_jpeg_440_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4:4:0 SUBSAMPLED baseline-JPEG decode under the exact gate —
    the transposed-4:2:2 layout: each interleaved MCU carries 2 Y
    blocks STACKED + Cb + Cr, chroma is upsampled by 2x VERTICAL
    replication only. Decoders that hardcode horizontal subsampling
    fail exactly here; the oracle replays the composed formulas."""
    from map_reduce_project_spark.operators.multimodal import (
        attach_real_jpeg_440_payload,
        pixel_stats,
    )

    docs = spread_rows(read_table(spark, sf_dir, "documents"))
    return pixel_stats(attach_real_jpeg_440_payload(docs))


MM_JPEG_440_SQL = """
WITH g AS (
  SELECT x.g AS bx, y.g AS by
  FROM generate_series(0, 2) x(g), generate_series(0, 3) y(g)
),
blocks AS (
  SELECT d.doc_id, g.bx, g.by,
    (d.doc_id + 23 * g.bx + 9 * g.by) % 256 AS yv,
    (3 * d.doc_id + 7 * g.bx + 17 * (g.by // 2)) % 256 - 128 AS cbv,
    (5 * d.doc_id + 13 * g.bx + 27 * (g.by // 2)) % 256 - 128 AS crv
  FROM documents d CROSS JOIN g
  WHERE g.bx < 1 + d.doc_id % 3
    AND g.by < 2 * (1 + (d.doc_id // 3) % 2)
),
px AS (
  SELECT doc_id,
    LEAST(255, GREATEST(0,
      yv + CAST(FLOOR((91881 * crv + 32768) / 65536.0) AS BIGINT))) AS r,
    LEAST(255, GREATEST(0,
      yv + CAST(FLOOR((-22554 * cbv - 46802 * crv + 32768) / 65536.0)
                AS BIGINT))) AS gg,
    LEAST(255, GREATEST(0,
      yv + CAST(FLOOR((116130 * cbv + 32768) / 65536.0) AS BIGINT))) AS b
  FROM blocks
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  'image/jpeg' AS modality,
  CAST(16 * (1 + (doc_id // 3) % 2) AS BIGINT) AS height,
  CAST(8 * (1 + doc_id % 3) AS BIGINT) AS width,
  CAST(128 * (1 + doc_id % 3) * (1 + (doc_id // 3) % 2) AS BIGINT)
    AS n_pixels,
  CAST(64 * SUM(r) AS BIGINT) AS sum_r,
  CAST(64 * SUM(gg) AS BIGINT) AS sum_g,
  CAST(64 * SUM(b) AS BIGINT) AS sum_b
FROM px
GROUP BY doc_id
"""

QUERIES.append(
    Query(
        "mm_jpeg_440_stats",
        mm_jpeg_440_stats_q,
        MM_JPEG_440_SQL,
        "4:4:0 subsampled JPEG: stacked MCU columns + vertical-only upsample",
    )
)


def mm_jpeg_progressive_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PROGRESSIVE (SOF2) JPEG decode under the exact gate: the
    fixtures carry the SAME quantized coefficients as the baseline AC
    fixture, re-encoded through libjpeg's 6-scan progression —
    spectral selection (bands 1-5 / 6-63), successive approximation
    (DC Al=1, AC Al=2 with two refinement passes), EOBRUN end-of-band
    runs, and the AC correction-bit algorithm. Progressive coding is
    lossless over quantized coefficients, so the decoded pixels ride
    the identical term-by-term SQL oracle; any scan-ordering, band,
    refinement, or EOBRUN bug is a hash mismatch on all 500 files."""
    from map_reduce_project_spark.operators.multimodal import (
        attach_real_jpeg_progressive_payload,
        pixel_stats,
    )

    docs = spread_rows(read_table(spark, sf_dir, "documents"))
    return pixel_stats(attach_real_jpeg_progressive_payload(docs))


QUERIES.append(
    Query(
        "mm_jpeg_progressive_stats",
        mm_jpeg_progressive_stats_q,
        MM_JPEG_AC_SQL,
        "progressive SOF2 decode (spectral selection + successive approximation)",
    )
)


def mm_flac_fixed_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIXED-predictor FLAC decode under the exact gate: frames carry
    order-2 polynomial prediction with genuine partitioned-Rice
    entropy decoding (unary quotient + k remainder bits, zigzag sign
    fold) — the exact-integer tier of real FLAC compression, beyond
    the constant-subframe tier. Melody fixtures (linear trend the
    predictor absorbs + a small periodic residual the Rice coder
    carries) make the reconstructed stream stats SQL-predictable;
    the LPC + multi-partition-Rice tier has its own gate
    (mm_flac_lpc_stats)."""
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from map_reduce_project_spark.operators.multimodal import (
        decode_flac_constant,
        melody_flac_audio,
    )

    docs = spread_rows(read_table(spark, sf_dir, "documents")).selectExpr(
        "CAST(doc_id AS LONG) AS doc_id"
    )
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_samples", LongType()),
            StructField("sum_samples", LongType()),
            StructField("min_sample", LongType()),
            StructField("max_sample", LongType()),
        ]
    )

    def stats(batches):
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                _, payload = melody_flac_audio(int(doc_id))
                sarr = decode_flac_constant(payload)
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "n_samples": len(sarr),
                        "sum_samples": int(sarr.sum()),
                        "min_sample": int(sarr.min()),
                        "max_sample": int(sarr.max()),
                    }
                )
            yield pd.DataFrame(out)

    return docs.mapInPandas(stats, schema)


MM_FLAC_FIXED_SQL = """
WITH f AS (SELECT g AS f FROM generate_series(0, 1) t(g)),
ts AS (SELECT g AS t FROM generate_series(0, 255) t(g)),
vals AS (
  SELECT d.doc_id,
    (d.doc_id % 1000 + f.f)
      + ((d.doc_id % 50) - 25) * ts.t
      + ((13 * ts.t + d.doc_id) % 7) - 3 AS v
  FROM documents d
  JOIN f ON f.f < 1 + d.doc_id % 2
  CROSS JOIN ts
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_samples,
  CAST(SUM(v) AS BIGINT) AS sum_samples,
  CAST(MIN(v) AS BIGINT) AS min_sample,
  CAST(MAX(v) AS BIGINT) AS max_sample
FROM vals
GROUP BY doc_id
"""

QUERIES.append(
    Query(
        "mm_flac_fixed_stats",
        mm_flac_fixed_stats_q,
        MM_FLAC_FIXED_SQL,
        "FIXED-predictor FLAC with real Rice entropy decode -> exact stats",
    )
)


def mm_flac_lpc_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LPC FLAC with MULTI-PARTITION Rice under the exact gate: each
    frame's order-2 quantized-coefficient prediction feeds FOUR Rice
    partitions with mixed parameters [4, ESCAPE(6), 3, 5] — mixed-k
    decoding, partition-boundary residual accounting (the first
    partition is short by the predictor order), and the escaped
    verbatim-width partition are all hash-gated. The melody's linear
    trend is absorbed by the predictor; the reconstructed stream is
    SQL-predictable because FLAC is lossless."""
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from map_reduce_project_spark.operators.multimodal import (
        decode_flac_constant,
        melody_flac_lpc_audio,
    )

    docs = spread_rows(read_table(spark, sf_dir, "documents")).selectExpr(
        "CAST(doc_id AS LONG) AS doc_id"
    )
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_samples", LongType()),
            StructField("sum_samples", LongType()),
            StructField("min_sample", LongType()),
            StructField("max_sample", LongType()),
        ]
    )

    def stats(batches):
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                _, payload = melody_flac_lpc_audio(int(doc_id))
                sarr = decode_flac_constant(payload)
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "n_samples": len(sarr),
                        "sum_samples": int(sarr.sum()),
                        "min_sample": int(sarr.min()),
                        "max_sample": int(sarr.max()),
                    }
                )
            yield pd.DataFrame(out)

    return docs.mapInPandas(stats, schema)


MM_FLAC_LPC_SQL = """
WITH ts AS (SELECT g AS t FROM generate_series(0, 511) t(g)),
vals AS (
  SELECT d.doc_id,
    (d.doc_id % 800) + 2 * ts.t + ((7 * ts.t + d.doc_id) % 9) - 4 AS v
  FROM documents d
  JOIN ts ON ts.t < 256 * (1 + d.doc_id % 2)
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_samples,
  CAST(SUM(v) AS BIGINT) AS sum_samples,
  CAST(MIN(v) AS BIGINT) AS min_sample,
  CAST(MAX(v) AS BIGINT) AS max_sample
FROM vals
GROUP BY doc_id
"""

QUERIES.append(
    Query(
        "mm_flac_lpc_stats",
        mm_flac_lpc_stats_q,
        MM_FLAC_LPC_SQL,
        "LPC FLAC with multi-partition Rice incl. escaped partitions -> exact stats",
    )
)


def mm_flac_stereo_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STEREO FLAC decode under the exact gate: the channel
    assignment rotates across docs (independent, left/side,
    right/side, mid/side), so all four exact-integer decorrelation
    inverses — side channels carrying bps+1 bits — plus the
    two-partition Rice walk are hash-gated, not just unit-tested.
    Per-channel sums are SQL-predictable from the L/R formulas
    REGARDLESS of assignment (the inverses are exact), which is
    itself the property being proven."""
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from map_reduce_project_spark.operators.multimodal import (
        decode_flac_constant,
        stereo_flac_audio,
    )

    docs = spread_rows(read_table(spark, sf_dir, "documents")).selectExpr(
        "CAST(doc_id AS LONG) AS doc_id"
    )
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_samples", LongType()),
            StructField("sum_left", LongType()),
            StructField("sum_right", LongType()),
            StructField("max_left", LongType()),
            StructField("min_right", LongType()),
        ]
    )

    def stats(batches):
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                _, payload = stereo_flac_audio(int(doc_id))
                sarr = decode_flac_constant(payload)
                left, right = sarr[0::2], sarr[1::2]
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "n_samples": len(sarr),
                        "sum_left": int(left.sum()),
                        "sum_right": int(right.sum()),
                        "max_left": int(left.max()),
                        "min_right": int(right.min()),
                    }
                )
            yield pd.DataFrame(out)

    return docs.mapInPandas(stats, schema)


MM_FLAC_STEREO_SQL = """
WITH ts AS (SELECT g AS t FROM generate_series(0, 255) t(g)),
vals AS (
  SELECT d.doc_id,
    (d.doc_id % 500) + 2 * ts.t + ((5 * ts.t + d.doc_id) % 11) - 5 AS l,
    (d.doc_id % 300) - ts.t + ((7 * ts.t + d.doc_id) % 9) - 4 AS r
  FROM documents d CROSS JOIN ts
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(512 AS BIGINT) AS n_samples,
  CAST(SUM(l) AS BIGINT) AS sum_left,
  CAST(SUM(r) AS BIGINT) AS sum_right,
  CAST(MAX(l) AS BIGINT) AS max_left,
  CAST(MIN(r) AS BIGINT) AS min_right
FROM vals
GROUP BY doc_id
"""

QUERIES.append(
    Query(
        "mm_flac_stereo_stats",
        mm_flac_stereo_stats_q,
        MM_FLAC_STEREO_SQL,
        "stereo FLAC: all four decorrelation inverses hash-gated via rotation",
    )
)


def mm_jpeg_422_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4:2:2 SUBSAMPLED baseline-JPEG decode under the exact gate —
    the broadcast/video-frame layout between 1x1 and 4:2:0: each
    interleaved MCU carries 2 Y blocks + Cb + Cr over a 16x8 strip,
    chroma upsampled by exact HORIZONTAL replication (full vertical
    resolution), then the fixed-point YCbCr->RGB. Channels are
    constant per 8x8 luma block, so the oracle replays the composed
    block formulas; a wrong strip order, predictor chain, or the
    4:2:0 upsample applied by mistake is a hash mismatch."""
    from map_reduce_project_spark.operators.multimodal import (
        attach_real_jpeg_422_payload,
        pixel_stats,
    )

    docs = spread_rows(read_table(spark, sf_dir, "documents"))
    return pixel_stats(attach_real_jpeg_422_payload(docs))


MM_JPEG_422_SQL = """
WITH g AS (
  SELECT x.g AS bx, y.g AS by
  FROM generate_series(0, 5) x(g), generate_series(0, 1) y(g)
),
blocks AS (
  SELECT d.doc_id, g.bx, g.by,
    (d.doc_id + 9 * g.bx + 21 * g.by) % 256 AS yv,
    (3 * d.doc_id + 13 * (g.bx // 2) + 7 * g.by) % 256 - 128 AS cbv,
    (5 * d.doc_id + 23 * g.by + 11 * (g.bx // 2)) % 256 - 128 AS crv
  FROM documents d CROSS JOIN g
  WHERE g.bx < 2 * (1 + d.doc_id % 3) AND g.by < 1 + (d.doc_id // 3) % 2
),
px AS (
  SELECT doc_id,
    LEAST(255, GREATEST(0,
      yv + CAST(FLOOR((91881 * crv + 32768) / 65536.0) AS BIGINT))) AS r,
    LEAST(255, GREATEST(0,
      yv + CAST(FLOOR((-22554 * cbv - 46802 * crv + 32768) / 65536.0)
                AS BIGINT))) AS gg,
    LEAST(255, GREATEST(0,
      yv + CAST(FLOOR((116130 * cbv + 32768) / 65536.0) AS BIGINT))) AS b
  FROM blocks
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  'image/jpeg' AS modality,
  CAST(8 * (1 + (doc_id // 3) % 2) AS BIGINT) AS height,
  CAST(16 * (1 + doc_id % 3) AS BIGINT) AS width,
  CAST(128 * (1 + doc_id % 3) * (1 + (doc_id // 3) % 2) AS BIGINT)
    AS n_pixels,
  CAST(64 * SUM(r) AS BIGINT) AS sum_r,
  CAST(64 * SUM(gg) AS BIGINT) AS sum_g,
  CAST(64 * SUM(b) AS BIGINT) AS sum_b
FROM px
GROUP BY doc_id
"""

QUERIES.append(
    Query(
        "mm_jpeg_422_stats",
        mm_jpeg_422_stats_q,
        MM_JPEG_422_SQL,
        "4:2:2 subsampled JPEG: strip interleave + horizontal replicate upsample, exact",
    )
)


def mm_exif_metadata_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Exif/TIFF metadata decode under the exact gate: each doc
    gets a JPEG whose APP1 segment is genuine TIFF — byte-order mark
    (alternating II/MM by doc parity, so BOTH endiannesses sit under
    the hash), magic 42, IFD0 entry walk, in-line SHORT values and
    offset-addressed ASCII strings. The oracle replays the fixture
    formulas; a wrong endian branch, offset base, or NUL handling is
    a hash mismatch on half the corpus."""
    from map_reduce_project_spark.operators.multimodal import (
        extract_exif,
    )

    docs = spread_rows(read_table(spark, sf_dir, "documents"))
    return extract_exif(docs)


MM_EXIF_SQL = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CASE WHEN doc_id % 2 = 1 THEN 'MM' ELSE 'II' END AS byte_order,
  CAST(1 + doc_id % 8 AS BIGINT) AS orientation,
  'Maker' || (doc_id % 5) AS make,
  'Cam' || (doc_id % 7) AS model,
  '2024:01:' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
    || ' 12:' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0')
    || ':00' AS datetime
FROM documents
"""

QUERIES.append(
    Query(
        "mm_exif_metadata",
        mm_exif_metadata_q,
        MM_EXIF_SQL,
        "real Exif/TIFF IFD decode, both endiannesses, offset-addressed values, exact",
    )
)


def mm_mjpeg_frame_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Motion-JPEG decode under the exact gate: spec-valid MJPG
    AVIs (RIFF walk, MJPG fourcc in strh AND BITMAPINFOHEADER, one
    complete baseline JFIF per '00dc' chunk, idx1 verified) whose
    every frame runs through the module's exact-integer T.81 decoder
    — MJPEG is intra-only, so this is a real compressed-video tier,
    not a container stunt. Per-frame pixel sums replay in SQL from
    the block-gradient formula. Inter-frame codecs (H.264...) remain
    the honest NotImplementedError boundary."""
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from map_reduce_project_spark.operators.multimodal import (
        decode_avi_frames,
        gradient_mjpeg_video,
    )

    docs = spread_rows(read_table(spark, sf_dir, "documents")).selectExpr(
        "CAST(doc_id AS LONG) AS doc_id"
    )
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_id", LongType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("sum_px", LongType()),
        ]
    )

    def stats(batches):
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                _, payload = gradient_mjpeg_video(int(doc_id))
                for f, px in enumerate(decode_avi_frames(payload)):
                    h, w, _ = px.shape
                    out.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_id": f,
                            "width": w,
                            "height": h,
                            "sum_px": int(px[:, :, 0].astype("int64").sum()),
                        }
                    )
            yield pd.DataFrame(out)

    return docs.mapInPandas(stats, schema)


# w = 8*(2+id%4) -> up to 5 blocks wide; h = 8*(1+(id//4)%3) -> up to
# 3 blocks high; frames f < 2 + id%3; block (bx, by) of frame f holds
# (id + 11bx + 17by + 7f) % 256, so the frame sum is 64 * sum(blocks)
MM_MJPEG_SQL = """
WITH g AS (
  SELECT x.g AS bx, y.g AS by
  FROM generate_series(0, 4) x(g), generate_series(0, 2) y(g)
),
f AS (SELECT g AS f FROM generate_series(0, 4) t(g))
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
  CAST(f.f AS BIGINT) AS frame_id,
  CAST(8 * (2 + d.doc_id % 4) AS BIGINT) AS width,
  CAST(8 * (1 + (d.doc_id // 4) % 3) AS BIGINT) AS height,
  CAST(64 * SUM(CASE WHEN g.bx < 2 + d.doc_id % 4
                      AND g.by < 1 + (d.doc_id // 4) % 3
                THEN (d.doc_id + 11 * g.bx + 17 * g.by + 7 * f.f) % 256 END)
       AS BIGINT) AS sum_px
FROM documents d
JOIN f ON f.f < 2 + d.doc_id % 3
CROSS JOIN g
GROUP BY d.doc_id, f.f
"""

QUERIES.append(
    Query(
        "mm_mjpeg_frame_stats",
        mm_mjpeg_frame_stats_q,
        MM_MJPEG_SQL,
        "real Motion-JPEG decode: MJPG AVI walk -> per-frame T.81 entropy layer",
    )
)


def mm_audio_decimate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio resampling under the exact gate (round 7): real WAV
    payloads decode, decimate by 2 — each output sample is
    (s[2j] + s[2j+1]) >> 1, arithmetic-shift floor division so both
    engines agree on negatives; the odd tail sample drops — then
    RE-ENCODE as a genuine 4 kHz WAV and run the standard sample
    stats over the NEW payload. The decode -> transform -> encode ->
    decode round trip all happens inside the gate: a wrong shift
    semantics, tail handling, or re-encode header shows up in the
    hash. Two partition-local mapInPandas stages, zero shuffles."""
    from map_reduce_project_spark.operators.multimodal import (
        attach_real_audio_payload,
        audio_sample_stats,
        decimate_audio,
    )

    docs = spread_rows(read_table(spark, sf_dir, "documents"))
    return audio_sample_stats(
        decimate_audio(attach_real_audio_payload(docs), factor=2)
    )


# source samples: n = 16 + id % 17, s(i) = ((id*31 + i*7) % 2048) - 1024;
# decimated: n_out = n // 2, d(j) = (s(2j) + s(2j+1)) >> 1 (floor shift)
MM_AUDIO_DECIMATE_SQL = """
WITH g AS (SELECT doc_id, 16 + doc_id % 17 AS n FROM documents),
j AS (
  SELECT doc_id, n, unnest(range(0, n // 2)) AS jj FROM g
),
d AS (
  SELECT doc_id, n,
    ((((doc_id * 31 + (2 * jj) * 7) % 2048) - 1024)
     + (((doc_id * 31 + (2 * jj + 1) * 7) % 2048) - 1024)) >> 1 AS val
  FROM j
)
SELECT doc_id,
  CAST(4000 AS BIGINT) AS sample_rate,
  CAST(n // 2 AS BIGINT) AS n_samples,
  CAST(SUM(val) AS BIGINT) AS sum_samples,
  CAST(SUM(val * val) AS BIGINT) AS sum_sq,
  CAST(MAX(ABS(val)) AS BIGINT) AS peak
FROM d GROUP BY doc_id, n
"""

QUERIES.append(
    Query(
        "mm_audio_decimate",
        mm_audio_decimate_q,
        MM_AUDIO_DECIMATE_SQL,
        "real WAV decode -> decimate-by-2 (floor-shift averaging) -> re-encode -> exact stats of the new payload",
    )
)


def mm_png_interlace_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG closure tiers under the exact gate (round 8): even ids are
    Adam7-INTERLACED truecolor PNGs (seven independently-filtered
    passes, geometry 3..11 x 3..10 so empty/partial/full pass shapes
    all occur); odd ids are 16-BIT-channel PNGs (big-endian samples,
    byte-wise filters with bpp=6, decode strips to the high byte —
    the libpng convention). The engine genuinely inflates, walks the
    pass grid, unfilters per pass, and scatters sub-images
    (operators/multimodal.py:_decode_png_pixels); channel sums are
    closed-form in doc_id so the oracle predicts them exactly — a
    wrong pass offset, per-pass prior-row leak, or low-byte strip
    shows up as a hash mismatch."""
    from map_reduce_project_spark.operators.multimodal import (
        attach_interlace_png_payload,
        pixel_stats,
    )

    docs = spread_rows(read_table(spark, sf_dir, "documents"))
    return pixel_stats(attach_interlace_png_payload(docs))


# w = 3 + id % 9, h = 3 + (id // 9) % 8; even ids 8-bit Adam7 with
# c(x,y) = (id*k + 3x + 5y) % 256; odd ids 16-bit with decoded byte
# ((id*k + 257x + 513y) % 65536) // 256
MM_PNG_INTERLACE_SQL = """
WITH g AS (
  SELECT x.g AS x, y.g AS y
  FROM generate_series(0, 10) x(g), generate_series(0, 9) y(g)
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
  'image/png' AS modality,
  CAST(3 + (d.doc_id // 9) % 8 AS BIGINT) AS height,
  CAST(3 + d.doc_id % 9 AS BIGINT) AS width,
  CAST((3 + d.doc_id % 9) * (3 + (d.doc_id // 9) % 8) AS BIGINT)
    AS n_pixels,
  CAST(SUM(CASE WHEN g.x < 3 + d.doc_id % 9
                 AND g.y < 3 + (d.doc_id // 9) % 8 THEN
    CASE WHEN d.doc_id % 2 = 0
         THEN (d.doc_id * 1 + 3 * g.x + 5 * g.y) % 256
         ELSE ((d.doc_id * 1 + 257 * g.x + 513 * g.y) % 65536) // 256
    END END) AS BIGINT) AS sum_r,
  CAST(SUM(CASE WHEN g.x < 3 + d.doc_id % 9
                 AND g.y < 3 + (d.doc_id // 9) % 8 THEN
    CASE WHEN d.doc_id % 2 = 0
         THEN (d.doc_id * 7 + 3 * g.x + 5 * g.y) % 256
         ELSE ((d.doc_id * 7 + 257 * g.x + 513 * g.y) % 65536) // 256
    END END) AS BIGINT) AS sum_g,
  CAST(SUM(CASE WHEN g.x < 3 + d.doc_id % 9
                 AND g.y < 3 + (d.doc_id // 9) % 8 THEN
    CASE WHEN d.doc_id % 2 = 0
         THEN (d.doc_id * 13 + 3 * g.x + 5 * g.y) % 256
         ELSE ((d.doc_id * 13 + 257 * g.x + 513 * g.y) % 65536) // 256
    END END) AS BIGINT) AS sum_b
FROM documents d CROSS JOIN g
GROUP BY d.doc_id
"""
QUERIES.append(
    Query(
        "mm_png_interlace_stats",
        mm_png_interlace_stats_q,
        MM_PNG_INTERLACE_SQL,
        "Adam7-interlaced + 16-bit-channel PNG decode -> exact channel sums",
    )
)
