"""WARC/WET ingestion (ISO 28500) — the stage-MINUS-ONE of a crawl
pipeline: real crawl corpora (Common-Crawl-shaped) arrive as archive
files of records, not columnar tables, and the engine's crawl arc
(html_extract -> outlinks -> link-graph CC, SURVEY §16) previously
began at an already-columnar ``html`` column.

Reference parity note: the reference engine (wwfong/map-reduce-project,
``ccf_connected_components.py:23-282``) has no archive ingestion; this
is north-star surface under SURVEY §2's scans/sources category,
implemented on the same custom Python DataSource extensibility seam as
``sources/pydatasource.py:166-198``.

Scale design (100 TB): a Common Crawl snapshot is ~80k gzip WARC files
of ~1 GB each. gzip is NOT splittable, so the industry-standard unit
of parallelism is the FILE: ``partitions()`` returns one
``InputPartition`` per archive file, each ``read()`` streams its file
record-by-record task-side (constant memory — records are decoded one
``Content-Length`` payload at a time, never whole-file), and 80k
partitions across 1000 executors schedule exactly like any other
80k-split scan. Per-record gzip members (the Common Crawl layout —
each record its own gzip member, members concatenated) decompress
transparently through ``gzip.GzipFile``'s multi-member handling.

Parsing is STRICT to the spec record layout — version line, CRLF
headers, blank line, exactly ``Content-Length`` payload bytes, then
``\\r\\n\\r\\n`` — and fails loud with file + record index + byte
offset rather than resynchronizing silently (a desynced reader yields
garbage rows downstream; at 100 TB nobody re-checks them).

Test strategy mirrors the multimodal-codec discipline
(``operators/multimodal.py``): the reader is pinned by HAND-BUILT
spec-layout byte streams in unit tests, so the synthetic-fixture
writer below and the reader cannot hide mutually-cancelling bugs; the
gate oracle additionally predicts every parsed field (including
``content_length`` recomputed from the predicted payload, not echoed
from the written header) purely from the ``documents`` table.
"""

from __future__ import annotations

import glob
import gzip
import hashlib
import io
import os
import shutil
import tempfile
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import StructType

WARC_SCHEMA_DDL = (
    "warc_file string, record_pos long, warc_version string, "
    "warc_type string, record_id string, target_uri string, "
    "warc_date string, content_type string, content_length long, "
    "payload binary"
)

# ---------------------------------------------------------------------------
# Record-level parser (pure stdlib, stream-in / dict-out)


def _fail(source: str, idx: int, offset: int, msg: str) -> None:
    raise ValueError(
        f"WARC parse error in {source}, record {idx} "
        f"(byte offset {offset}): {msg}"
    )


def iter_warc_records(
    stream: io.BufferedIOBase, source: str = "<stream>"
) -> Iterator[dict]:
    """Yield one dict per WARC record from a binary stream:
    ``{version, headers (lower-cased name -> value), payload (bytes),
    record_pos (1-based), offset}``. Strict spec layout; raises
    ``ValueError`` with position context on any deviation."""
    idx = 0
    offset = 0
    while True:
        version_line = stream.readline()
        if not version_line:
            return
        idx += 1
        rec_off = offset
        offset += len(version_line)
        if not version_line.startswith(b"WARC/") or not (
            version_line.endswith(b"\r\n")
        ):
            _fail(
                source,
                idx,
                rec_off,
                f"expected 'WARC/x.y\\r\\n' version line, got "
                f"{version_line[:40]!r}",
            )
        version = version_line[:-2].decode("ascii", "replace")
        headers: dict[str, str] = {}
        last_name: str | None = None
        while True:
            line = stream.readline()
            offset += len(line)
            if line == b"\r\n":
                break
            if not line.endswith(b"\r\n"):
                _fail(
                    source,
                    idx,
                    rec_off,
                    f"header line without CRLF terminator: {line[:40]!r}",
                )
            body = line[:-2]
            if body[:1] in (b" ", b"\t"):
                # obs-fold continuation line (RFC 822 style)
                if last_name is None:
                    _fail(
                        source,
                        idx,
                        rec_off,
                        "continuation line before any header",
                    )
                headers[last_name] += " " + body.strip().decode(
                    "utf-8", "replace"
                )
                continue
            name, sep, value = body.partition(b":")
            if not sep:
                _fail(
                    source, idx, rec_off, f"header without ':': {body[:40]!r}"
                )
            last_name = name.strip().decode("ascii", "replace").lower()
            headers[last_name] = value.strip().decode("utf-8", "replace")
        if "content-length" not in headers:
            _fail(source, idx, rec_off, "missing Content-Length header")
        try:
            n = int(headers["content-length"])
        except ValueError:
            _fail(
                source,
                idx,
                rec_off,
                f"non-integer Content-Length "
                f"{headers['content-length']!r}",
            )
        if n < 0:
            _fail(source, idx, rec_off, f"negative Content-Length {n}")
        payload = stream.read(n)
        offset += len(payload)
        if len(payload) != n:
            _fail(
                source,
                idx,
                rec_off,
                f"truncated payload: Content-Length {n}, "
                f"got {len(payload)} bytes",
            )
        trailer = stream.read(4)
        offset += len(trailer)
        if trailer != b"\r\n\r\n":
            _fail(
                source,
                idx,
                rec_off,
                f"expected CRLF CRLF record trailer, got {trailer!r}",
            )
        yield {
            "version": version,
            "headers": headers,
            "payload": payload,
            "record_pos": idx,
            "offset": rec_off,
        }


def _wrap_archive(raw: io.BufferedIOBase) -> io.BufferedIOBase:
    """Plain or gzip by magic bytes (suffix-independent);
    gzip.GzipFile handles concatenated per-record members. The caller
    owns (and closes) ``raw`` — GzipFile does not close its fileobj.

    Error contract (fuzzed by tools/fuzz_warc.py): gzip-layer
    corruption surfaces as the decompressor's own loud errors —
    ``EOFError`` for a member truncated before its end-of-stream
    marker, ``gzip.BadGzipFile`` for corrupt member framing — and
    fails the Spark task; layout violations INSIDE the decompressed
    stream raise ``ValueError`` with byte-offset context from
    ``iter_warc_records``. Nothing is skipped silently."""
    magic = raw.read(2)
    raw.seek(0)
    if magic == b"\x1f\x8b":
        return io.BufferedReader(gzip.GzipFile(fileobj=raw))  # type: ignore[arg-type]
    return raw


# ---------------------------------------------------------------------------
# Custom Python DataSource: one partition per archive file


class _WarcFilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


def _expand_paths(path_opt: str) -> list[str]:
    """Directory -> every *.warc / *.warc.gz / *.wet / *.wet.gz
    inside; glob pattern or single file pass through. Sorted for
    deterministic partition numbering."""
    p = path_opt
    if p.startswith("file://"):
        p = p[len("file://"):]
    if os.path.isdir(p):
        files = [
            f
            for f in glob.glob(os.path.join(p, "*"))
            if f.endswith((".warc", ".warc.gz", ".wet", ".wet.gz"))
        ]
    elif any(ch in p for ch in "*?["):
        files = glob.glob(p)
    else:
        files = [p] if os.path.exists(p) else []
    if not files:
        raise FileNotFoundError(f"warc source: no archive files at {path_opt}")
    return sorted(files)


class _WarcReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("warc source requires a load(path)")
        self.files = _expand_paths(path)

    def partitions(self) -> list[InputPartition]:
        return [_WarcFilePartition(f) for f in self.files]

    # Arrow-batch flush bounds (round 12, guide §4.2): records buffer
    # until either cap, so batches stay large enough to amortize the
    # boundary but payload bytes never pile up unbounded in the worker
    _BATCH_RECORDS = 1024
    _BATCH_BYTES = 16 << 20

    def read(self, partition: _WarcFilePartition) -> Iterator:
        """Yield ``pyarrow.RecordBatch`` objects (optimization round
        12): the tuple protocol pickled every multi-KB payload row by
        row; Arrow moves the same columns (bit-identical values, same
        spec-strict parser and error contract) in batched buffers."""
        import pyarrow as pa

        base = os.path.basename(partition.path)
        cols: list[list] = [[] for _ in range(10)]
        held = 0

        def flush():
            nonlocal cols, held
            batch = pa.RecordBatch.from_arrays(
                [
                    pa.array(cols[0], type=pa.string()),
                    pa.array(cols[1], type=pa.int64()),
                    pa.array(cols[2], type=pa.string()),
                    pa.array(cols[3], type=pa.string()),
                    pa.array(cols[4], type=pa.string()),
                    pa.array(cols[5], type=pa.string()),
                    pa.array(cols[6], type=pa.string()),
                    pa.array(cols[7], type=pa.string()),
                    pa.array(cols[8], type=pa.int64()),
                    pa.array(cols[9], type=pa.binary()),
                ],
                names=[
                    "warc_file",
                    "record_pos",
                    "warc_version",
                    "warc_type",
                    "record_id",
                    "target_uri",
                    "warc_date",
                    "content_type",
                    "content_length",
                    "payload",
                ],
            )
            cols = [[] for _ in range(10)]
            held = 0
            return batch

        with open(partition.path, "rb") as raw:
            stream = _wrap_archive(raw)
            for rec in iter_warc_records(stream, source=partition.path):
                h = rec["headers"]
                payload = rec["payload"]
                for i, v in enumerate(
                    (
                        base,
                        rec["record_pos"],
                        rec["version"],
                        h.get("warc-type"),
                        h.get("warc-record-id"),
                        h.get("warc-target-uri"),
                        h.get("warc-date"),
                        h.get("content-type"),
                        int(h["content-length"]),
                        payload,
                    )
                ):
                    cols[i].append(v)
                held += len(payload)
                if (
                    len(cols[0]) >= self._BATCH_RECORDS
                    or held >= self._BATCH_BYTES
                ):
                    yield flush()
        if cols[0]:
            yield flush()


class WarcDataSource(DataSource):
    """``spark.read.format("warc").load(dir_or_glob)`` — columns:
    (warc_file, record_pos, warc_version, warc_type, record_id,
    target_uri, warc_date, content_type, content_length, payload)."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str | StructType:
        return WARC_SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _WarcReader(self.options)


def register_warc(spark) -> None:
    """Idempotent session registration."""
    spark.dataSource.register(WarcDataSource)


def read_warc(spark, path: str):
    register_warc(spark)
    return spark.read.format("warc").load(path)


# ---------------------------------------------------------------------------
# Deterministic synthetic WET fixture (test scaffolding — production
# reads real archives; this writer exists so a DuckDB oracle can
# predict every parsed record from the documents table alone)

N_SYNTH_FILES = 8
_WARC_DATE = "2026-08-15T00:00:00Z"


def _uuid_urn(seed: str) -> str:
    h = hashlib.md5(seed.encode()).hexdigest()
    return (
        f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
    )


def wet_payload_text(doc_id: int) -> str:
    """Deterministic multi-line WET plain text for ``doc_id`` — ASCII
    only (char length == byte length, so the oracle's ``length()``
    IS the Content-Length), with bullet / ellipsis / repeated lines so
    line-based quality rules (Gopher repetition signals) have real
    multi-line structure to measure."""
    lines = [
        f"Document {doc_id} headline",
        f"The quick brown fox jumps over the lazy dog {doc_id % 7} times.",
        f"- bullet item {doc_id % 5} in the summary list",
        f"Trailing thought number {doc_id % 3}...",
        "Shared boilerplate footer line",
    ]
    lines += ["repeated filler sentence for padding"] * (doc_id % 4)
    return "\n".join(lines) + "\n"


def synth_target_uri(doc_id: int) -> str:
    return f"https://example{doc_id % 50}.com/doc/{doc_id}"


def _record_bytes(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode() for k, v in headers
    )
    return (
        head
        + f"Content-Length: {len(payload)}\r\n\r\n".encode()
        + payload
        + b"\r\n\r\n"
    )


def synth_conversion_record(doc_id: int) -> bytes:
    payload = wet_payload_text(doc_id).encode()
    return _record_bytes(
        [
            ("WARC-Type", "conversion"),
            ("WARC-Record-ID", _uuid_urn(str(doc_id))),
            ("WARC-Date", _WARC_DATE),
            ("WARC-Target-URI", synth_target_uri(doc_id)),
            ("Content-Type", "text/plain"),
        ],
        payload,
    )


def synth_warcinfo_record(file_idx: int) -> bytes:
    payload = (
        f"software: synth-wet 1.0\r\nfile-index: {file_idx}\r\n".encode()
    )
    return _record_bytes(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Record-ID", _uuid_urn(f"warcinfo:{file_idx}")),
            ("WARC-Date", _WARC_DATE),
            ("Content-Type", "application/warc-fields"),
        ],
        payload,
    )


def synth_file_name(file_idx: int) -> str:
    # odd-indexed files exercise the per-record-gzip-member path
    return f"synth-{file_idx:04d}.warc" + (
        ".gz" if file_idx % 2 == 1 else ""
    )


def write_synthetic_warc_dir(
    doc_ids: list[int], out_dir: str, n_files: int = N_SYNTH_FILES
) -> None:
    """Write ``doc_ids`` as WET conversion records across ``n_files``
    archives (file = doc_id % n_files, sorted by doc_id within a
    file, one warcinfo record leading each file; odd files gzipped
    per-record-member, Common Crawl layout). Driver-side scaffolding
    on purpose: a task-side writer would land files on different
    executors' local disks on a real cluster — fixture bytes must be
    one coherent local directory."""
    os.makedirs(out_dir, exist_ok=True)
    by_file: dict[int, list[int]] = {}
    for d in doc_ids:
        by_file.setdefault(d % n_files, []).append(d)
    for fi, ids in sorted(by_file.items()):
        records = [synth_warcinfo_record(fi)] + [
            synth_conversion_record(d) for d in sorted(ids)
        ]
        target = os.path.join(out_dir, synth_file_name(fi))
        if fi % 2 == 1:
            buf = io.BytesIO()
            for rec in records:
                with gzip.GzipFile(
                    fileobj=buf, mode="wb", mtime=0
                ) as gz:
                    gz.write(rec)
            data = buf.getvalue()
        else:
            data = b"".join(records)
        with open(target, "wb") as f:
            f.write(data)


def bench_payload_text(doc_id: int, pad_lines: int) -> str:
    """The fixture payload plus ``pad_lines`` deterministic filler
    lines (~4 KB/record) — the bench fan-out probe wants realistic
    record sizes without touching the oracle-pinned fixture text."""
    pad = "".join(
        f"padding line {doc_id} {j} lorem ipsum dolor sit amet "
        "consectetur adipiscing elit sed do eiusmod\n"
        for j in range(pad_lines)
    )
    return wet_payload_text(doc_id) + pad


def write_bench_warc_dir(
    spark,
    out_dir: str,
    n_files: int = 200,
    recs_per_file: int = 2_500,
    pad_lines: int = 70,
) -> None:
    """TASK-PARALLEL synthesis of a Common-Crawl-shaped WET corpus for
    the bench scan probe: ``n_files`` gzip archives, each one warcinfo
    record + ``recs_per_file`` conversion records, every record its
    own gzip member (the Common Crawl layout ``iter_warc_records``
    handles via multi-member decompression). One Spark task writes one
    archive — the same file-grained parallelism the READ side uses, so
    synthesis of the ~2 GB raw corpus takes seconds on 32 cores.

    Local-mode bench scaffolding: tasks write into one shared local
    directory, which is only coherent when all executors share the
    filesystem (local[*]); a cluster deployment would point the writer
    at shared storage. The fixture writer above stays driver-side for
    exactly that reason.
    """
    os.makedirs(out_dir, exist_ok=True)

    def _write_files(idx_iter) -> None:
        for fi in idx_iter:
            path = os.path.join(out_dir, f"bench-{fi:05d}.warc.gz")
            with open(path, "wb") as fh:
                records = [synth_warcinfo_record(fi)]
                base = fi * recs_per_file
                records += [
                    _record_bytes(
                        [
                            ("WARC-Type", "conversion"),
                            ("WARC-Record-ID", _uuid_urn(f"bench:{base + j}")),
                            ("WARC-Date", _WARC_DATE),
                            ("WARC-Target-URI", synth_target_uri(base + j)),
                            ("Content-Type", "text/plain"),
                        ],
                        bench_payload_text(base + j, pad_lines).encode(),
                    )
                    for j in range(recs_per_file)
                ]
                for rec in records:
                    buf = io.BytesIO()
                    with gzip.GzipFile(
                        fileobj=buf, mode="wb", mtime=0, compresslevel=1
                    ) as gz:
                        gz.write(rec)
                    fh.write(buf.getvalue())

    spark.sparkContext.parallelize(
        range(n_files), n_files
    ).foreachPartition(_write_files)


def ensure_synthetic_warc_dir(sf_dir: str) -> str:
    """Build-once cache of the synthetic WET fixture for ``sf_dir``'s
    documents table, keyed by the exact doc_id population (count, min,
    max, sum) — concurrent gate/census/bench sessions share one dir;
    the build is atomic (mkdtemp then rename) so a half-written dir is
    never visible."""
    import pyarrow.parquet as pq

    ids = (
        pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        )
        .column("doc_id")
        .to_pylist()
    )
    key_src = (
        f"{len(ids)}|{min(ids)}|{max(ids)}|{sum(ids)}|"
        f"v1|{N_SYNTH_FILES}"
    )
    key = hashlib.md5(key_src.encode()).hexdigest()[:12]
    final = os.path.join(
        tempfile.gettempdir(), f"spark_graft_warc_{key}"
    )
    marker = os.path.join(final, "_SUCCESS")
    if os.path.exists(marker):
        return final
    tmp = tempfile.mkdtemp(prefix=f"spark_graft_warc_build_{key}_")
    write_synthetic_warc_dir(ids, tmp)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write(key_src + "\n")
    try:
        os.rename(tmp, final)
    except OSError:
        # another session won the race; its dir is keyed identically
        shutil.rmtree(tmp, ignore_errors=True)
    return final
