"""Fixture-parity WARC source: real ``.warc`` / ``.warc.gz`` files →
PAGES_SCHEMA rows.

The reference streams ``(offset, record, errors)`` tuples from an
archive file via ``ArchiveRecord.open_archive(gzip='auto')``
(cdx_writer.py:823-828, reader in the external warctools package).
The distributed equivalent: ``spark.read.format('binaryFile')`` hands
each archive to one task, and an Arrow-batched ``mapInPandas`` kernel
splits it into records:

* **gzip member splitting** — record-per-member WARCs are concatenated
  gzip streams; ``zlib.decompressobj(wbits=31)`` decodes one member at
  a time and ``unused_data`` marks the next member's byte offset, so
  per-record ``offset`` (CDX field V) and ``compressed_size`` (field
  S) fall out exactly like the reference's member-at-a-time reader.
  Empty members (the reference's ``empty-gzips.warc.gz`` fixture) are
  tolerated and skipped.
* **WARC record parse** — ``WARC/x.y`` version line, header block to
  the first blank line, ``Content-Length`` payload bytes.  Headers map
  to PAGES_SCHEMA: WARC-Type → record_type, WARC-Target-URI → url
  (angle-bracket wrapped URIs preserved verbatim — safe_url strips
  them downstream, cdx_writer.py:185-187), WARC-Date → raw_date
  (verbatim; date14_column handles ISO-8601 incl. micro/nano
  truncation), Content-Type → content_type, full header map →
  warc_headers.

One archive = one task is the right granularity at scale: WARCs are
written ~1 GB each, so a 100 TB crawl is ~100k files spread across
executors; no intra-file parallelism is needed (and none is possible
without an offset index, which is exactly the CDX this engine emits).
"""

from __future__ import annotations

import os
import re
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from .schema import PAGES_SCHEMA

_RE_VERSION = re.compile(rb"^WARC/\d+\.\d+\r?\n")
_RE_HEADER_SPLIT = re.compile(rb"\r?\n\r?\n", re.S)


def split_gzip_members(data: bytes):
    """Yield (offset, compressed_size, decompressed_bytes) per gzip
    member; empty members are yielded with empty payload."""
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(data[pos:])
        except zlib.error:
            break
        consumed = n - pos - len(d.unused_data)
        if consumed <= 0:
            break
        yield pos, consumed, out
        pos += consumed


def parse_warc_members(data: bytes):
    """Yield (offset, size, record_bytes) for an UNCOMPRESSED WARC:
    records delimited by Content-Length + blank-line separators."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos:pos + 2] in (b"\r\n", b"\n"):
            pos += 2 if data[pos:pos + 2] == b"\r\n" else 1
        if pos >= n or not _RE_VERSION.match(data[pos:pos + 16]):
            break
        m = _RE_HEADER_SPLIT.search(data, pos)
        if not m:
            break
        head = data[pos:m.start()]
        cl = re.search(rb"(?im)^content-length:\s*(\d+)\s*$", head)
        body_len = int(cl.group(1)) if cl else 0
        end = m.end() + body_len
        yield pos, end - pos, data[pos:end]
        pos = end


def parse_warc_record(raw: bytes) -> dict | None:
    """One WARC record's bytes → a PAGES_SCHEMA row dict (or None)."""
    if not _RE_VERSION.match(raw[:16]):
        return None
    m = _RE_HEADER_SPLIT.search(raw)
    if not m:
        return None
    head = raw[:m.start()].decode("latin1")
    lines = head.splitlines()[1:]  # drop version line
    headers: dict[str, str] = {}
    for line in lines:
        if ":" in line:
            k, v = line.split(":", 1)
            headers[k.strip()] = v.strip()
    cl = headers.get("Content-Length")
    try:
        body_len = int(cl) if cl is not None else len(raw) - m.end()
    except ValueError:
        body_len = len(raw) - m.end()
    body = raw[m.end():m.end() + body_len]
    url = headers.get("WARC-Target-URI")
    if url and url.startswith("<") and url.endswith(">"):
        pass  # safe_url strips the wget wrapper downstream
    return {
        "url": url,
        "warc_ts": None,
        "raw_date": headers.get("WARC-Date"),
        "record_type": headers.get("WARC-Type"),
        "content_type": headers.get("Content-Type"),
        "html": body,
        "text": None,
        "lang": None,
        "warc_headers": headers,
        "content_length": int(cl) if cl and cl.lstrip("-").isdigit()
        else None,
        "compressed_size": None,  # filled by the splitter
        "offset": None,
        "warc_file": None,
    }


def archive_to_rows(path: str, data: bytes) -> Iterator[dict]:
    """All records of one archive (gzip auto-detected) as row dicts."""
    name = os.path.basename(path)
    if data[:2] == b"\x1f\x8b":
        members = split_gzip_members(data)
    else:
        members = parse_warc_members(data)
    for offset, size, raw in members:
        if raw == b"":
            continue  # tolerated empty gzip member
        row = parse_warc_record(raw)
        if row is None:
            continue
        row["offset"] = offset
        row["compressed_size"] = size
        row["warc_file"] = name
        yield row


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC scan: one task per archive file."""
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in PAGES_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                rows.extend(archive_to_rows(p, bytes(content)))
            yield pd.DataFrame(
                {c: [r[c] for r in rows] for c in cols})

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
        .mapInPandas(kernel, schema=PAGES_SCHEMA)
    )
