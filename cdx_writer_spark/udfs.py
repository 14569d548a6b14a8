"""The engine's only Python-side scalar ops, as Arrow-vectorized pandas UDFs.

Everything else in the CDX projection is native Catalyst expressions
(whole-stage codegen).  These three exist because Spark lacks the exact
semantics natively:

* ``http_split``      — header/payload split of raw HTTP blocks
                        (cdx_writer.py:390-407); returns a struct so the
                        block is parsed exactly once per record (the
                        reference's parse-once discipline, :348-352).
* ``make_surt_udf``   — SURT canonicalization with original-URL fallback
                        (cdx_writer.py:128-136) via canonicalize.py.
* ``meta_tags_udf``   — HTML ``<meta>`` scan stopping at ``</head>``
                        (cdx_writer.py:461-519).

(The SHA-1/base32 checksum used to be the fourth — it is now fully
native: JVM ``sha1`` + a codegen'd hex→base32 encoding in
``fields.sha1_b32_column``, so payload bytes no longer make a second
Arrow crossing just to be hashed.)

Callers MASK the inputs with ``when()`` so rows that don't need the op
ship NULL (not multi-MB payloads) across the Arrow boundary — e.g. the
digest fast path (cdx_writer.py:449-453) never sends payload bytes to
Python when a WARC-Payload-Digest header exists.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from .canonicalize import massaged_url, surt_key

_CRLF_SPLIT = re.compile(rb"\r?\n\r?\n")
# Status line (cdx_writer.py:435-436), anchored via .match
_RE_STATUS_LINE = re.compile(r"HTTP(/\d\.\d)? (\d+)")
# First Content-Type header line, value whitespace-trimmed
# (parse_http_header + .strip(), cdx_writer.py:356-374)
_RE_CT_LINE = re.compile(r"^content-type:\s*(.+?)\s*$", re.I | re.M)
_RE_BEFORE_SEMI = re.compile(r"^(.+?);")

_HTTP_SPLIT_TYPE = StructType([
    StructField("headers", StringType()),
    StructField("body_off", IntegerType()),
    StructField("status", StringType()),
    StructField("version", StringType()),
    StructField("ct", StringType()),
])


# --- native http_split (zero-Python twin) -----------------------------------
#
# Python-str regex semantics reproduced in java.util.regex:
#  * (?d) = UNIX_LINES makes ^ $ and . treat ONLY \n as a line
#    terminator — exactly Python's str semantics (Java otherwise
#    refuses to let . cross \r and anchors $ before lone \r).
#  * Python \s on str, restricted to latin-1 code points, is the
#    explicit class below (Java's \s is ASCII-only and would drop
#    \x1c-\x1f, \x85, \xa0).
_WS_L1 = r" \t\n\x0B\f\r\x1C\x1D\x1E\x1F\x85\xA0"
_SEP_RE = r"(\r?\n\r?\n)"
_STATUS_RE_N = r"^HTTP(/\d\.\d)? (\d+)"
_CT_RE_N = (r"(?idm)^content-type:[" + _WS_L1 + r"]*(.+?)[" + _WS_L1
            + r"]*$")
_SEMI_RE_N = r"(?d)^(.+?);"


def native_http_split_struct(block: Column) -> Column:
    """The same (http_headers, body_off, http_status, http_version,
    http_ct) contract as :func:`http_split`, as ONE pure-Catalyst
    struct — the record bytes never cross the Arrow boundary at all.

    The block decodes JVM-side as ISO-8859-1 (1:1 bytes->chars, so
    char offsets ARE byte offsets — same trick as the UDF's latin1
    decode); the blank-line search (`regexp_instr`) stops at the first
    match, and the status/content-type regexes run over the SMALL
    header substring only.  Every intermediate (decoded string, match
    position, header text) is lambda-bound (``bind_once``) so it
    evaluates exactly once however many consumers the struct has;
    callers must still put a materialization barrier between this
    struct and its ~30 field consumers (``job.cdx_flagged`` uses
    ``inline(array(struct))`` — a Generate node Catalyst cannot
    collapse projections across), or projection collapse re-inlines
    the whole parse per field (the measured 100x blowup that
    originally motivated the UDF)."""
    from .functions.dedup import bind_once

    # mask non-HTTP blocks at the INPUT (null decode -> every field
    # null) rather than wrapping the struct in when(): a null STRUCT
    # element would make the caller's inline() drop the row entirely,
    # silently losing non-response records from the flagged frame
    block = F.when(F.substring(block, 1, 4) == F.lit(b"HTTP"), block)

    def outer(s: Column) -> Column:
        pos0 = F.regexp_instr(s, F.lit(_SEP_RE))
        sep_len = F.length(F.regexp_extract(s, _SEP_RE, 1))

        def with_pos(pos: Column) -> Column:
            head = F.when(pos > 0,
                          s.substr(F.lit(1), pos - 1)).otherwise(s)
            off = (F.when(pos > 0, pos + sep_len)
                   .otherwise(F.length(s) + 1)).cast("int")

            def with_head(h: Column) -> Column:
                version = F.nullif(
                    F.regexp_extract(h, _STATUS_RE_N, 1), F.lit(""))
                status = F.nullif(
                    F.regexp_extract(h, _STATUS_RE_N, 2), F.lit(""))
                ct_raw = F.nullif(
                    F.regexp_extract(h, _CT_RE_N, 1), F.lit(""))
                ct = F.coalesce(
                    F.nullif(F.regexp_extract(ct_raw, _SEMI_RE_N, 1),
                             F.lit("")),
                    ct_raw)
                return F.struct(h.alias("http_headers"),
                                off.alias("body_off"),
                                status.alias("http_status"),
                                version.alias("http_version"),
                                ct.alias("http_ct"))

            return bind_once(head, with_head)

        return bind_once(pos0, with_pos)

    return bind_once(F.decode(block, "ISO-8859-1"), outer)


@pandas_udf(_HTTP_SPLIT_TYPE)
def http_split(block: pd.Series) -> pd.DataFrame:
    """Split a raw HTTP message into (headers text, payload OFFSET,
    status code, HTTP version, raw content-type value).

    Mirrors ResponseHandler.parse_headers_and_content
    (cdx_writer.py:390-407): blocks not starting with ``HTTP`` yield
    all-NULL; blocks with no blank line (empty payloads terminated by
    a single newline) yield (whole block, len+1) so the payload slices
    to b'' and its digest is sha1(b'') — fixtures transposed_header /
    empty_payload_header_*.

    ``body_off`` is the 1-based byte offset of the payload within the
    input block — NOT the payload bytes.  The payload is sliced
    NATIVELY by the caller (``substring(html, body_off,
    octet_length(html))``, job.py), so the multi-MB bodies never make
    the return trip across the Arrow boundary: only the (small) header
    text and three parsed scalars come back from Python.  ``latin1``
    decodes 1:1, so ``m.end()`` in bytes is exact.

    The status/version groups (:435-441) and the raw Content-Type header
    value up to ';' (:367-384, validation stays native in fields.py) are
    parsed here — in the SAME per-row Python pass that already decodes
    the block — so the downstream dispatch/field Columns are cheap
    attribute references.  Before this, the native regexp_extract chain
    over `headers` was re-inlined at every one of its ~30 uses by
    Catalyst's projection collapse, exploding the codegen'd projection
    (observed 100× slowdown on the full CDX plan).
    """
    headers: list[str | None] = []
    offs: list[int | None] = []
    statuses: list[str | None] = []
    versions: list[str | None] = []
    cts: list[str | None] = []
    for block_bytes in block:
        if block_bytes is None or not block_bytes.startswith(b"HTTP"):
            headers.append(None)
            offs.append(None)
            statuses.append(None)
            versions.append(None)
            cts.append(None)
            continue
        m_sep = _CRLF_SPLIT.search(block_bytes)
        if m_sep:
            head = block_bytes[:m_sep.start()].decode("latin1")
            off = m_sep.end() + 1
        else:
            head = block_bytes.decode("latin1")
            off = len(block_bytes) + 1
        headers.append(head)
        offs.append(off)
        m = _RE_STATUS_LINE.match(head)
        statuses.append(m.group(2) if m else None)
        versions.append(m.group(1) if m else None)
        ct_m = _RE_CT_LINE.search(head)
        if ct_m:
            ct = ct_m.group(1)
            semi = _RE_BEFORE_SEMI.match(ct)
            cts.append(semi.group(1) if semi else ct)
        else:
            cts.append(None)
    return pd.DataFrame({"headers": headers, "body_off": offs,
                         "status": statuses, "version": versions,
                         "ct": cts})


def make_surt_udf(host_massage: bool = True, fallback: bool = True):
    """SURT-key UDF factory (``--no-host-massage`` maps to
    host_massage=False, cdx_writer.py:880-882).  With fallback=True this
    is the field-N semantics (massaged_url); with fallback=False it is the
    raw urlkey used by screenshot mode (cdx_writer.py:583)."""
    fn = massaged_url if fallback else surt_key

    @pandas_udf(StringType())
    def surt_udf(urls: pd.Series) -> pd.Series:
        return urls.map(
            lambda u: None if u is None else fn(u, host_massage=host_massage))

    return surt_udf


# Meta-tag scan regexes — semantics of cdx_writer.py:493-510: scan
# <meta ...> tags in order, stop at the first </head>, key from
# name|http-equiv, value from content, duplicate keys comma-appended
# except 'refresh' (first wins).
_RE_META_OR_HEAD = re.compile(rb"(<meta[^>]+?>|</head>)", re.I)
_RE_META_NAME = re.compile(
    rb"""\b(?:name|http-equiv)\s*=\s*(['"]?)(.*?)(\1)[\s/>]""", re.I)
_RE_META_CONTENT = re.compile(
    rb"""\bcontent\s*=\s*(['"]?)(.*?)(\1)[\s/>]""", re.I)


def parse_meta_tags(html: bytes) -> dict[str, str] | None:
    """Pure-Python meta-tag parse (shared with the row oracle)."""
    if html is None:
        return None
    html = html.strip()
    if html == b"":
        return {}
    tags: dict[str, str] = {}
    for m in _RE_META_OR_HEAD.finditer(html):
        tag = m.group(1)
        if tag.lower() == b"</head>":
            break
        nm = _RE_META_NAME.search(tag)
        if not nm:
            continue
        cm = _RE_META_CONTENT.search(tag)
        if not cm:
            continue
        name = nm.group(2).lower().decode("latin1")
        content = cm.group(2).decode("latin1")
        if name not in tags:
            tags[name] = content
        elif name != "refresh":  # refresh: first tag wins (cdx_writer.py:515-517)
            tags[name] += "," + content
    return tags


@pandas_udf(MapType(StringType(), StringType()))
def meta_tags_udf(body: pd.Series) -> pd.Series:
    """HTML meta-tag map.  Callers mask: only text/html response payloads
    under META_PARSE_LIMIT are passed (cdx_writer.py:471-486)."""
    return body.map(parse_meta_tags)
