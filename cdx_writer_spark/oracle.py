"""Row-at-a-time pure-Python oracle of the reference semantics.

Computes CDX lines + stats from pages rows exactly the way the reference
processes records one by one (cdx_writer.py:820-855), without any Spark.
The pytest suite runs the Spark pipeline and this oracle over the same
synthetic pages and asserts byte-identical output (the method of the
reference's golden-output suites, tests/test_small_warcs.py) — field
logic here is written independently from fields.py/dispatch.py (only the
canonicalizer and meta-tag parser are shared, each separately pinned to
reference fixtures).
"""

from __future__ import annotations

import base64
import hashlib
import re
from datetime import datetime

from .canonicalize import massaged_url, safe_url, surt_key
from .schema import FAKE_BUILD_VERSION, FIELD_MAP, META_PARSE_LIMIT
from .udfs import parse_meta_tags

RE_RESPONSE_LINE = re.compile(r"HTTP(?P<version>/\d\.\d)? (?P<statuscode>\d+)")
_CRLF = re.compile(rb"\r?\n\r?\n")
_RE_IS_RESPONSE = re.compile(r"application/http;\s*msgtype=response$", re.I)


def _sha1_b32(b: bytes) -> str:
    return base64.b32encode(hashlib.sha1(b).digest()).decode("ascii")


def _split_http(block: bytes | None):
    if block is None or not block.startswith(b"HTTP"):
        return None, None
    parts = _CRLF.split(block, 1)
    if len(parts) == 2:
        return parts[0].decode("latin1"), parts[1]
    return block.decode("latin1"), b""


def _http_header(headers: str | None, name: str) -> str | None:
    if headers is None:
        return None
    pat = re.compile(name + r":\s*(.+)", re.I)
    for line in headers.splitlines():
        m = pat.match(line)
        if m:
            return m.group(1)
    return None


def _dispatch(row: dict, all_records: bool, screenshot_mode: bool,
              headers: str | None):
    """Returns handler name, None (skip) or False (hard drop)."""
    rtype = row.get("record_type")
    ctype = row.get("content_type")
    wh = row.get("warc_headers") or {}

    def dispatch_screenshot():
        if rtype == "metadata" and ctype and ctype.startswith("image/"):
            return "screenshot"
        return None

    def dispatch_http():
        if ctype in ("text/dns",):
            return None
        if rtype == "response":
            m = RE_RESPONSE_LINE.match(headers or "")
            if m and m.group("statuscode") == "304":
                return None
            if wh.get("IP-address") == "0.0.0.0":
                if (m and m.group("version") is None
                        and m.group("statuscode") in ("502", "504")):
                    return False
            return "response"
        elif rtype == "revisit":
            prof = wh.get("WARC-Profile")
            if prof and prof.endswith("/revisit/server-not-modified"):
                return None
            return "revisit"
        return None

    def dispatch_resource():
        if rtype == "resource":
            url = row.get("url") or ""
            if url.startswith("ftp://"):
                return "ftp"
            elif url.startswith(("http://", "https://")):
                return "resource"
        return None

    def dispatch_other():
        if rtype == "warcinfo":
            return "warcinfo"
        elif rtype == "response":
            return "response"
        elif rtype == "revisit":
            return "revisit"
        return "base"

    chain = ([dispatch_screenshot] if screenshot_mode
             else [dispatch_http, dispatch_resource])
    if all_records:
        chain.append(dispatch_other)
    for disp in chain:
        h = disp()
        if h is False:
            return None
        if h:
            return h
    return None


def _date(row: dict) -> str | None:
    raw = row.get("raw_date")
    if raw is None:
        ts = row.get("warc_ts")
        return ts.strftime("%Y%m%d%H%M%S") if ts is not None else None
    if raw.isdigit():
        n = len(raw)
        if n == 14:
            return raw
        if 14 < n <= 18:
            return raw[:14]
        if n == 12:
            return raw + "00"
        if n == 10:
            return raw + "0000"
        return None  # tolerant divergence (reference raises)
    if re.match("[a-f0-9]+$", raw):
        return None
    if re.match("[0-9]{14,18}[a-zA-Z]+$", raw):
        return raw[:14]
    try:
        return datetime.strptime(raw[:19], "%Y-%m-%dT%H:%M:%S").strftime(
            "%Y%m%d%H%M%S")
    except ValueError:
        return None  # tolerant divergence


def _mime(handler: str, row: dict, headers: str | None) -> str | None:
    ctype = row.get("content_type")
    if handler == "warcinfo":
        return "warc-info"
    if handler in ("resource", "ftp", "screenshot"):
        return ctype
    if handler == "response":
        if ctype and _RE_IS_RESPONSE.match(ctype):
            ct = _http_header(headers, "content-type")
            if ct is None:
                return "unk"
            ct = ct.strip()
            if ct == "":
                return "unk"
            m = re.match("(.+?);", ct)
            if m:
                ct = m.group(1)
            if re.match(r"[a-z0-9\-\.\+/]+$", ct):
                return ct
            return "unk"
        if ctype is None:
            return "unk"
        if ctype == "no-type":
            return "unk"
        try:
            ctype.encode("ascii")
        except UnicodeEncodeError:
            return "unk"
        return ctype
    return "warc/" + (row.get("record_type") or "")


def _checksum(handler: str, row: dict, headers, body) -> str | None:
    wh = row.get("warc_headers") or {}
    pd_ = wh.get("WARC-Payload-Digest")
    bd = wh.get("WARC-Block-Digest")
    html = row.get("html")
    if handler == "revisit":
        return pd_.replace("sha1:", "") if pd_ is not None else None
    if handler == "response":
        if pd_ is not None:
            return pd_.replace("sha1:", "")
        return _sha1_b32(body if headers is not None else (html or b""))
    if handler == "ftp":
        if pd_:
            return pd_.replace("sha1:", "")
        if bd:
            return bd.replace("sha1:", "")
        return _sha1_b32(html or b"")
    return _sha1_b32(html or b"")


def _aif(handler: str, row: dict, headers, body, mime: str | None):
    if handler != "response":
        return None
    meta = None
    if mime == "text/html" and body is not None:
        eff_len = row.get("content_length")
        if eff_len is None:
            eff_len = len(row.get("html") or b"")
        meta = {} if eff_len > META_PARSE_LIMIT else parse_meta_tags(body)
    x_robots = _http_header(headers, "x-robots-tag")
    robot_tags: list[str] = []
    if meta and "robots" in meta:
        robot_tags += meta["robots"].split(",")
    if x_robots:
        robot_tags += x_robots.split(",")
    robot_tags = [t.strip().lower() for t in robot_tags]
    s = ""
    if "noarchive" in robot_tags:
        s += "A"
    if "nofollow" in robot_tags:
        s += "F"
    if "noindex" in robot_tags:
        s += "I"
    sfps = (row.get("warc_headers") or {}).get(
        "WARC-Simple-Form-Province-Status")
    if sfps:
        first = sfps.split(",", 2)[0]
        try:
            if int(first) > 0:
                s += "P"
        except ValueError:
            pass
    return s or None


def oracle_cdx(rows, fmt: str = "N b a m s k r M S V g",
               all_records: bool = False, screenshot_mode: bool = False,
               exclude_urls=(), host_massage: bool = True,
               g_prefix: str | None = None):
    """Returns (lines, stats) — `lines` in input row order, no header."""
    excludes = [surt_key(u.split()[0], host_massage=host_massage)
                for u in exclude_urls if u.strip() != ""]
    codes = fmt.split()
    for c in codes:
        if c not in FIELD_MAP:
            raise ValueError("unknown field: " + c)
    stats = {"num_records_processed": 0, "num_records_included": 0,
             "num_records_filtered": 0}
    lines: list[str] = []
    for row in rows:
        stats["num_records_processed"] += 1
        headers, body = _split_http(
            row.get("html") if row.get("record_type") == "response" else None)
        handler = _dispatch(row, all_records, screenshot_mode, headers)
        if not handler:
            continue
        cl = row.get("content_length")
        if cl is not None and cl < 0:
            continue
        safe = safe_url(row.get("url") or "")
        if handler == "warcinfo":
            original = "warcinfo:/%s/%s" % (row["warc_file"],
                                            FAKE_BUILD_VERSION)
            surt = original
        elif handler == "screenshot":
            original = "http://web.archive.org/screenshot/" + safe
            surt = ("org,archive,web)/screenshot/"
                    + surt_key(safe, host_massage=host_massage))
        else:
            original = safe
            surt = massaged_url(safe, host_massage=host_massage)
        if any(surt.startswith(p) for p in excludes):
            stats["num_records_filtered"] += 1
            continue
        mime = _mime(handler, row, headers)
        gname = row["warc_file"]
        if g_prefix:
            gname = g_prefix.rstrip("/") + "/" + gname
        values = {
            "N": surt,
            "b": _date(row),
            "a": original,
            "m": mime,
            "s": ("226" if handler == "ftp" else
                  (lambda m: m and m.group("statuscode"))(
                      RE_RESPONSE_LINE.match(headers or ""))
                  if handler == "response" else None),
            "k": _checksum(handler, row, headers, body),
            "r": None,
            "M": _aif(handler, row, headers, body, mime),
            "S": (str(row["compressed_size"])
                  if row.get("compressed_size") is not None else None),
            "V": str(row["offset"]) if row.get("offset") is not None else None,
            "g": gname,
        }
        lines.append(" ".join(
            "-" if values[c] is None else values[c] for c in codes))
        stats["num_records_included"] += 1
    return lines, stats
