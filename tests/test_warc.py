"""WARC/WET ingestion tests (sources/warc.py, round 9).

The reader is pinned by HAND-BUILT spec-layout byte streams (the
multimodal-codec discipline) so the synthetic fixture writer and the
reader cannot hide mutually-cancelling bugs; malformed inputs must
fail loud with position context, never resynchronize silently.
"""

from __future__ import annotations

import gzip
import io
import os

import pytest

from map_reduce_project_spark.sources.warc import (
    ensure_synthetic_warc_dir,
    iter_warc_records,
    read_warc,
    synth_conversion_record,
    wet_payload_text,
    write_synthetic_warc_dir,
)

# A two-record WARC stream typed out BY HAND from the ISO 28500
# layout — not produced by the repo's writer.
HAND_BUILT = (
    b"WARC/1.0\r\n"
    b"WARC-Type: warcinfo\r\n"
    b"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000001>\r\n"
    b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
    b"Content-Type: application/warc-fields\r\n"
    b"Content-Length: 13\r\n"
    b"\r\n"
    b"software: t\r\n"
    b"\r\n\r\n"
    b"WARC/1.1\r\n"
    b"WARC-Type: conversion\r\n"
    b"WARC-Target-URI: https://h.com/a\r\n"
    b"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000002>\r\n"
    b"WARC-Date: 2026-01-01T00:00:01Z\r\n"
    b"Content-Type: text/plain\r\n"
    b"Content-Length: 12\r\n"
    b"\r\n"
    b"hello\nworld\n"
    b"\r\n\r\n"
)


def test_parser_hand_built_stream():
    recs = list(iter_warc_records(io.BytesIO(HAND_BUILT), "hand"))
    assert len(recs) == 2
    a, b = recs
    assert a["version"] == "WARC/1.0"
    assert a["headers"]["warc-type"] == "warcinfo"
    assert a["payload"] == b"software: t\r\n"
    assert a["record_pos"] == 1
    assert b["version"] == "WARC/1.1"
    assert b["headers"]["warc-target-uri"] == "https://h.com/a"
    assert b["payload"] == b"hello\nworld\n"
    assert b["record_pos"] == 2
    # offsets point at each record's version line
    assert a["offset"] == 0
    assert b["offset"] == HAND_BUILT.index(b"WARC/1.1")


def test_parser_obs_fold_continuation():
    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: https://h.com/very\r\n"
        b"\tlong/path\r\n"
        b"Content-Length: 2\r\n"
        b"\r\n"
        b"ok"
        b"\r\n\r\n"
    )
    (rec,) = iter_warc_records(io.BytesIO(raw), "fold")
    assert rec["headers"]["warc-target-uri"] == "https://h.com/very long/path"


@pytest.mark.parametrize(
    "raw, msg",
    [
        (b"HTTP/1.1 200 OK\r\n\r\n", "version line"),
        (
            b"WARC/1.0\r\nWARC-Type: x\r\n\r\n\r\n\r\n",
            "missing Content-Length",
        ),
        (
            b"WARC/1.0\r\nContent-Length: 10\r\n\r\nshort\r\n\r\n",
            "truncated payload",
        ),
        (
            b"WARC/1.0\r\nContent-Length: 2\r\n\r\nokXX\r\n",
            "record trailer",
        ),
        (
            b"WARC/1.0\r\nContent-Length: abc\r\n\r\n",
            "non-integer Content-Length",
        ),
        (
            b"WARC/1.0\r\nNoColonHere\r\n\r\n\r\n\r\n",
            "header without ':'",
        ),
    ],
)
def test_parser_fails_loud(raw, msg):
    with pytest.raises(ValueError, match=msg):
        list(iter_warc_records(io.BytesIO(raw), "bad"))


def test_parser_gzip_multimember_roundtrip():
    # Common Crawl layout: each record its own gzip member,
    # concatenated — GzipFile must read across member boundaries.
    buf = io.BytesIO()
    for d in (3, 11):
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(synth_conversion_record(d))
    stream = io.BufferedReader(gzip.GzipFile(fileobj=io.BytesIO(buf.getvalue())))
    recs = list(iter_warc_records(stream, "gz"))
    assert [r["payload"].decode() for r in recs] == [
        wet_payload_text(3),
        wet_payload_text(11),
    ]


def test_warc_datasource_partitions_and_fields(spark, tmp_path):
    # one InputPartition per archive file; plain + gzip both parse;
    # spot-check the full column set against wet_payload_text
    out = str(tmp_path / "warc")
    write_synthetic_warc_dir([0, 1, 2, 3, 9, 10], out, n_files=2)
    df = read_warc(spark, out)
    assert df.rdd.getNumPartitions() == 2
    rows = {
        (r.warc_file, r.record_pos): r for r in df.collect()
    }
    # file 0 (plain): warcinfo + docs 0,2,10 ; file 1 (gz): 1,3,9
    assert set(r.warc_type for r in rows.values()) == {
        "warcinfo",
        "conversion",
    }
    r = rows[("synth-0000.warc", 3)]  # doc 2 (sorted: info,0,2,10)
    assert r.target_uri == "https://example2.com/doc/2"
    assert bytes(r.payload).decode() == wet_payload_text(2)
    assert r.content_length == len(wet_payload_text(2))
    assert r.warc_date == "2026-08-15T00:00:00Z"
    g = rows[("synth-0001.warc.gz", 4)]  # doc 9 (info,1,3,9)
    assert g.target_uri == "https://example9.com/doc/9"
    assert bytes(g.payload).decode() == wet_payload_text(9)


def test_warc_datasource_missing_path_fails(spark, tmp_path):
    # pin the fail-loud contract, not just "some failure": the
    # FileNotFoundError message must surface through the Python
    # DataSource error wrapping (bare Exception would match any
    # unrelated breakage and pin nothing)
    with pytest.raises(Exception, match="no archive files"):
        read_warc(spark, str(tmp_path / "nope")).collect()


def test_ensure_synthetic_dir_cached_and_atomic():
    d1 = ensure_synthetic_warc_dir("/root/testdata/sf0.001")
    d2 = ensure_synthetic_warc_dir("/root/testdata/sf0.001")
    assert d1 == d2 and os.path.exists(os.path.join(d1, "_SUCCESS"))
    files = sorted(os.listdir(d1))
    assert "synth-0000.warc" in files and "synth-0001.warc.gz" in files
