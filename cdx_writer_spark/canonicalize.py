"""SURT URL canonicalization + the reference's URL-safety transform.

Pure-Python, bytes-domain implementation of the canonicalization pipeline
the reference applies via the public ``surt==0.3.1`` library
(``cdx_writer.py:15, 780-782``).  This is NOT a copy of that library; it is
a from-scratch implementation of the publicly documented SURT semantics
(Google safe-browsing URL canonicalization followed by the Internet
Archive's canonicalization rules), validated byte-for-byte against the
reference's golden-output fixtures (``tests/test_small_warcs.py``,
``tests/test_excludes.py``, ``tests/test_screenshot.py``).

Everything operates on *latin1-faithful* text: a URL string where each
character is one byte value 0-255, matching the reference's Python-2
byte-string processing (``cdx_writer.py:132, 180-181, 204``).

Used in three places:
* inside the ``surt_key`` pandas UDF (Arrow batches, executor side);
* on the driver to canonicalize exclusion-list prefixes
  (``cdx_writer.py:746-757``);
* by the frontier scheduler for URL-seen keys and host extraction.
"""

from __future__ import annotations

import re
import struct

__all__ = [
    "surt_key",
    "massaged_url",
    "safe_url",
    "surt_host",
    "UrlParseError",
]


class UrlParseError(ValueError):
    """URL cannot be canonicalized (reference falls back to the original
    URL when the surt library raises, ``cdx_writer.py:128-136``)."""


# --- latin1-faithful str <-> bytes ------------------------------------------

def _to_bytes(s: str | bytes) -> bytes:
    if isinstance(s, bytes):
        return s
    try:
        return s.encode("latin1")
    except UnicodeEncodeError:
        # True non-latin1 unicode can only come from user-supplied tables
        # (never from latin1-decoded archive ingest); utf-8 bytes are the
        # only sensible byte image for them.
        return s.encode("utf-8")


# --- percent escaping (Google canonicalization) ------------------------------

_PCT_HEX = re.compile(rb"%([0-9a-fA-F]{2})")

# Escape set: control/space (<= 0x20), DEL and above (>= 0x7f), '#', '%'.
# Evidenced by fixtures: '[' ']' '!' '*' '~' '(' ')' stay raw
# (date_resolution_*: '%5Bgte%5D' -> '[gte]'), space stays %20
# (space_in_target_uri), high bytes are %-escaped (bad_unicode_host,
# chardet_failure_url), '%2F' -> '/', '%26' -> '&' (spaces_in_url).
_ESCAPE_SET = frozenset(
    list(range(0x00, 0x21)) + list(range(0x7F, 0x100)) + [0x23, 0x25]
)


def _unescape_once(b: bytes) -> bytes:
    return _PCT_HEX.sub(lambda m: struct.pack("B", int(m.group(1), 16)), b)


def _unescape_repeatedly(b: bytes) -> bytes:
    while True:
        nxt = _unescape_once(b)
        if nxt == b:
            return b
        b = nxt


def _escape_once(b: bytes) -> bytes:
    out = bytearray()
    for byte in b:
        if byte in _ESCAPE_SET:
            out += b"%%%02X" % byte
        else:
            out.append(byte)
    return bytes(out)


# --- URL splitting ------------------------------------------------------------

_RE_SCHEME = re.compile(rb"^([a-zA-Z][a-zA-Z0-9+.\-]*):")
# RFC-3986-shaped split: scheme://authority/path?query#fragment
_RE_URL = re.compile(
    rb"^(?:([a-zA-Z][a-zA-Z0-9+.\-]*):)?"  # 1 scheme
    rb"(?://([^/?#]*))?"                     # 2 authority
    rb"([^?#]*)"                             # 3 path
    rb"(?:\?([^#]*))?"                       # 4 query
    rb"(?:#(.*))?$",                          # 5 fragment
    re.S,
)


class _Url:
    __slots__ = ("scheme", "userinfo", "host", "port", "path", "query", "fragment")

    def __init__(self):
        self.scheme = None
        self.userinfo = None
        self.host = None
        self.port = None  # int or None
        self.path = b""
        self.query = None
        self.fragment = None


_DEFAULT_PORTS = {b"http": 80, b"https": 443, b"ftp": 21}


def _parse(url: bytes) -> _Url:
    """Split a URL; raises UrlParseError on a non-numeric port, which is
    exactly how unparseable colon-URLs (``javascript:``/``mhtml:`` inside an
    http authority) reach the reference's original-URL fallback
    (fixtures bad_url_with_colon_{1,2})."""
    url = url.strip()
    if not _RE_SCHEME.match(url):
        url = b"http://" + url  # default scheme (exclude-list entries etc.)
    m = _RE_URL.match(url)
    if m is None:  # pragma: no cover - regex matches any bytes
        raise UrlParseError("unparseable url")
    u = _Url()
    u.scheme = (m.group(1) or b"").lower() or None
    authority = m.group(2)
    u.path = m.group(3) or b""
    u.query = m.group(4)
    u.fragment = m.group(5)
    if authority is None:
        raise UrlParseError("no authority")
    host = authority
    if b"@" in host:
        u.userinfo, _, host = host.rpartition(b"@")
    if b":" in host:
        host, _, port_s = host.rpartition(b":")
        try:
            u.port = int(port_s)
        except ValueError as exc:
            raise UrlParseError("bad port: %r" % port_s) from exc
    u.host = host
    return u


# --- Google canonicalization ---------------------------------------------------

_RE_MULTI_DOT = re.compile(rb"\.\.+")
_RE_MULTI_SLASH = re.compile(rb"//+")
_RE_DEC_HOST = re.compile(rb"^\d+$")
_RE_OCTAL_PART = re.compile(rb"^0[0-7]*$")
_RE_HEX_PART = re.compile(rb"^0[xX][0-9a-fA-F]+$")


def _ip_normalize(host: bytes) -> bytes:
    """Normalize decimal/octal/hex IPv4 host spellings to dotted quad."""
    parts = host.split(b".")
    if len(parts) == 1 and _RE_DEC_HOST.match(host):
        try:
            n = int(host)
        except ValueError:
            return host
        if 0 <= n <= 0xFFFFFFFF:
            return b"%d.%d.%d.%d" % (
                (n >> 24) & 0xFF, (n >> 16) & 0xFF, (n >> 8) & 0xFF, n & 0xFF)
        return host
    if len(parts) == 4:
        vals = []
        for p in parts:
            if _RE_HEX_PART.match(p):
                vals.append(int(p, 16))
            elif _RE_OCTAL_PART.match(p):
                vals.append(int(p, 8))
            elif _RE_DEC_HOST.match(p):
                vals.append(int(p, 10))
            else:
                return host
        if all(0 <= v <= 255 for v in vals):
            return b".".join(b"%d" % v for v in vals)
    return host


def _normalize_host(host: bytes) -> bytes:
    host = host.lower().strip(b".")
    host = _RE_MULTI_DOT.sub(b".", host)
    return _ip_normalize(host)


def _normalize_path(path: bytes) -> bytes:
    """Collapse // and resolve /./ and /../ segments; empty path -> '/'.
    (The '//' collapse is asserted by the reference's screenshot test,
    tests/test_screenshot.py:86-88.)"""
    if not path:
        return b"/"
    path = _RE_MULTI_SLASH.sub(b"/", path)
    out: list[bytes] = []
    for seg in path.split(b"/"):
        if seg == b".":
            continue
        if seg == b"..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    # preserve a trailing '/' produced by '.'/'..' final segments
    if path.endswith((b"/.", b"/..")) or path.endswith(b"/"):
        if not out or out[-1] != b"":
            out.append(b"")
    norm = b"/".join(out)
    if not norm.startswith(b"/"):
        norm = b"/" + norm
    return norm


def _google_canonicalize(u: _Url) -> None:
    if u.host is not None:
        u.host = _escape_once(_normalize_host(_unescape_repeatedly(u.host)))
    u.path = _escape_once(_normalize_path(_unescape_repeatedly(u.path)))
    if u.query is not None:
        u.query = _escape_once(_unescape_repeatedly(u.query))


# --- IA canonicalization -------------------------------------------------------

_RE_WWW = re.compile(rb"^www\d*\.")

# Session-id query params stripped by the IA canonicalizer (public wayback
# behavior; not exercised by reference fixtures but part of the surt
# contract). Query is lowercased before these run.
_RE_QUERY_SESSION = [
    re.compile(rb"(?:^|&)(?:jsessionid=[0-9a-z]{32})(?=&|$)"),
    re.compile(rb"(?:^|&)(?:phpsessid=[0-9a-z]{32})(?=&|$)"),
    re.compile(rb"(?:^|&)(?:sid=[0-9a-z]{32})(?=&|$)"),
    re.compile(rb"(?:^|&)(?:aspsessionid[a-z]{8}=[0-9a-z]{16,32})(?=&|$)"),
    re.compile(rb"(?:^|&)(?:cfid=[0-9]+&cftoken=[0-9a-z\-]+)(?=&|$)"),
]
_RE_PATH_JSESSION = re.compile(rb";jsessionid=[0-9a-z]{32}$")
_RE_PATH_ASPX_SESSION = re.compile(
    rb"^(.*/)(\((?:[a-z]\([0-9a-z]{24}\))+\)/)([^?]+\.aspx.*)$")


def _strip_query_session_ids(query: bytes) -> bytes:
    for pat in _RE_QUERY_SESSION:
        while True:
            m = pat.search(query)
            if not m:
                break
            s, e = m.span()
            if s > 0:  # match includes its leading '&'
                query = query[:s] + query[e:]
            else:  # match at string head; drop one following '&' if present
                rest = query[e:]
                query = rest[1:] if rest.startswith(b"&") else rest
    return query


def _ia_canonicalize(u: _Url, host_massage: bool = True) -> None:
    u.fragment = None
    u.userinfo = None
    if u.host is not None:
        u.host = u.host.lower()
        if host_massage:
            m = _RE_WWW.match(u.host)
            if m:
                u.host = u.host[m.end():]
    if u.scheme is not None and u.port is not None:
        if _DEFAULT_PORTS.get(u.scheme) == u.port:
            u.port = None
    path = u.path.lower()
    path = _RE_PATH_JSESSION.sub(b"", path)
    m = _RE_PATH_ASPX_SESSION.match(path)
    if m:
        path = m.group(1) + m.group(3)
    if path.endswith(b"/") and len(path) > 1:
        path = path[:-1]
    u.path = path
    if u.query is not None:
        q = u.query.lower()
        q = _strip_query_session_ids(q)
        if q == b"":
            u.query = None
        else:
            u.query = b"&".join(sorted(q.split(b"&")))


# --- SURT formatting -----------------------------------------------------------

def _format_surt(u: _Url) -> bytes:
    parts = u.host.split(b".") if u.host else []
    key = b",".join(reversed(parts))
    if u.port is not None:
        key += b":%d" % u.port
    key += b")" + u.path
    if u.query is not None:
        key += b"?" + u.query
    return key


# --- public API ----------------------------------------------------------------

def surt_key(url: str | bytes, host_massage: bool = True) -> str:
    """Canonical SURT key for `url` (reference: ``surt(url, **options)``,
    ``cdx_writer.py:780-782``). Raises UrlParseError for URLs the surt
    pipeline cannot parse — callers wanting the reference's fallback
    behavior use :func:`massaged_url`."""
    b = _to_bytes(url)
    if not b:
        return "-"
    if b.startswith(b"filedesc"):
        # surt passes filedesc: URLs through untouched (fixture
        # 10_digit_date.arc.gz keeps case: 'filedesc://IM_NLI_fb-...').
        return b.decode("latin1")
    u = _parse(b)
    _google_canonicalize(u)
    _ia_canonicalize(u, host_massage=host_massage)
    return _format_surt(u).decode("latin1")


def massaged_url(url: str | bytes, host_massage: bool = True) -> str:
    """Field ``N`` semantics: SURT key, falling back to the original URL on
    any canonicalization error (``cdx_writer.py:128-136``; fixtures
    bad_url_with_colon_{1,2})."""
    try:
        return surt_key(url, host_massage=host_massage)
    except Exception:
        b = _to_bytes(url)
        return b.decode("latin1")


_RE_SAFE = re.compile(r"[ \r\n\x0c\x08]")


def safe_url(url: str | bytes) -> str:
    """The reference's URL-safety transform (``cdx_writer.py:175-197``):
    strip wget's ``<...>`` wrapper, delete CR, percent-encode the whitespace
    bytes that break space-delimited CDX (uppercase hex: fixture
    formfeed_in_url shows ``%0C``)."""
    if isinstance(url, bytes):
        url = url.decode("latin1")
    if url[:1] == "<" and url[-1:] == ">":
        url = url[1:-1]
    url = url.replace("\r", "")
    return _RE_SAFE.sub(lambda m: "%{:02X}".format(ord(m.group(0))), url)


def surt_host(url: str | bytes) -> str | None:
    """Lowercased registered host of `url` (frontier partitioning /
    politeness key; not a reference field)."""
    try:
        u = _parse(_to_bytes(url))
    except UrlParseError:
        return None
    if not u.host:
        return None
    return _normalize_host(_unescape_repeatedly(u.host)).decode("latin1")
