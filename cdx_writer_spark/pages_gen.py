"""Deterministic synthetic `pages` generator (FIXTURES.md §1).

Fixed seed, no wall clock — CDX output must be byte-reproducible across
runs and parallelism levels (the north-rule determinism gate).  Two
layers:

* :func:`edge_case_rows` — a fixed taxonomy of pathological records
  mirroring /root/reference/tests/small_warcs/ (dates, URL pathologies,
  HTTP pathologies, digest variants, robots/meta combos, record types);
* :func:`bulk_rows` — parameterized volume with a power-law host
  distribution (crawl-hot-host skew exerciser for the frontier/salting
  work) built from the same deterministic PRNG.

Rows are plain dicts accepted by both the Spark schema
(``spark.createDataFrame(rows, PAGES_SCHEMA)``) and the row oracle.
"""

from __future__ import annotations

import base64
import hashlib
import random
from datetime import datetime, timedelta

_BASE_TS = datetime(2011, 2, 18, 23, 32, 56)


def _b32(b: bytes) -> str:
    return base64.b32encode(hashlib.sha1(b).digest()).decode("ascii")


def http_block(status: str = "200 OK", ctype: str | None = "text/html",
               payload: bytes = b"<html><body>x</body></html>",
               version: str = "/1.1", extra_headers: tuple = (),
               terminator: bytes = b"\r\n\r\n") -> bytes:
    head = "HTTP%s %s\r\n" % (version, status)
    if ctype is not None:
        head += "Content-Type: %s\r\n" % ctype
    for k, v in extra_headers:
        head += "%s: %s\r\n" % (k, v)
    return head.encode("latin1").rstrip(b"\r\n") + terminator + payload


def _row(url: str, *, record_type: str = "response",
         content_type: str | None = "application/http; msgtype=response",
         html: bytes | None = None, raw_date: str | None = None,
         ts_offset: int = 0, warc_headers: dict | None = None,
         content_length: int | None = None, text: str = "",
         lang: str = "en", warc_file: str = "synthetic-00000.warc.gz") -> dict:
    if html is None:
        html = http_block()
    return {
        "url": url,
        "warc_ts": _BASE_TS + timedelta(seconds=ts_offset),
        "raw_date": raw_date,
        "record_type": record_type,
        "content_type": content_type,
        "html": html,
        "text": text,
        "lang": lang,
        "warc_headers": warc_headers or {},
        "content_length": (len(html) if content_length is None
                           else content_length),
        "compressed_size": None,  # assigned by _finalize
        "offset": None,
        "warc_file": warc_file,
    }


def edge_case_rows() -> list[dict]:
    r: list[dict] = []
    add = r.append

    # warcinfo first record (uncompressed.warc fixture shape)
    add(_row("warcinfo-ignored", record_type="warcinfo",
             content_type="application/warc-fields",
             html=b"software: synthetic\r\nformat: WARC File Format 1.0\r\n"))

    # --- date taxonomy (cdx_writer.py:138-173) ---
    for rd in ("2016020900", "200011201434", "20151200000000",
               "201512000000000", "2000082305410049", "200009180023002953",
               "20160211000000jpg", "deadbeef", "2016021100000"):
        add(_row("http://dates.example.com/d/%s" % rd, raw_date=rd))
    add(_row("http://dates.example.com/iso-micro",
             raw_date="2019-11-18T12:56:03.123456Z"))
    add(_row("http://dates.example.com/iso-nano",
             raw_date="2019-11-18T12:56:03.123456789Z"))
    add(_row("http://dates.example.com/warc-ts-only", ts_offset=777))

    # --- URL pathologies ---
    add(_row("http://urls.example.com/a b/c\rd"))
    add(_row("<http://urls.example.com/wget-wrapped>"))
    add(_row("http://urls.example.com/form\x0cfeed\x08bs\nnl"))
    add(_row("https://www.fcc.example.gov/f?x=%5Bgte%5D1992%5Blte%5D&sort=d,DESC"))
    add(_row("http://arevebebe.free.fr/php3/selcateg.php3?selec=\xe9cole"))
    add(_row("http://JavaScript:Wtop('www.pick2hand.com/index2.html')"))
    add(_row("http://mhtml:d.hatena.ne.jp/images/logo.gif"))
    add(_row("http://210.179.120.1/test",
             html=http_block(payload=b"", terminator=b"\n")))
    add(_row("http://WWW.Upper.Example.COM:80/CaSe/PaTh?B=2&a=1"))
    add(_row("http://dup.example.com//double//slash/./x/../y"))

    # --- HTTP pathologies ---
    for st in ("301 Moved Permanently", "302 Found", "400 Bad Request",
               "403 Forbidden", "404 Not Found", "410 Gone"):
        add(_row("http://status.example.com/%s" % st.split()[0],
                 html=http_block(status=st)))
    add(_row("http://status.example.com/304",
             html=http_block(status="304 Not Modified", payload=b"")))
    add(_row("http://status.example.com/empty-lf",
             html=http_block(payload=b"", terminator=b"\n")))
    add(_row("http://status.example.com/empty-crlf",
             html=http_block(payload=b"", terminator=b"\r\n")))
    add(_row("http://status.example.com/not-http",
             html=b"garbage that does not start with the magic word"))
    add(_row("http://status.example.com/blank-ct",
             html=http_block(ctype="")))
    add(_row("http://status.example.com/no-ct", html=http_block(ctype=None)))
    add(_row("http://status.example.com/upper-ct",
             html=http_block(ctype="TEXT/HTML")))
    add(_row("http://status.example.com/params-ct",
             html=http_block(ctype="text/html; charset=utf-8")))
    add(_row("http://status.example.com/spacey-ct",
             html=http_block(ctype="text/html ; charset=x")))
    add(_row("http://status.example.com/no-version",
             html=http_block(version="")))
    add(_row("http://status.example.com/negative-cl", content_length=-1))
    # failed liveweb capture: hard drop (502, no version, ip 0.0.0.0)
    add(_row("http://liveweb.example.com/dead",
             html=http_block(status="502 Bad Gateway", version=""),
             warc_headers={"IP-address": "0.0.0.0"}))
    # same ip but versioned 502: kept
    add(_row("http://liveweb.example.com/alive",
             html=http_block(status="502 Bad Gateway"),
             warc_headers={"IP-address": "0.0.0.0"}))
    add(_row("http://dns.example.com/", content_type="text/dns",
             record_type="response", html=b"20130813000800\nexample.com A 1.2.3.4"))

    # --- ARC-style rows (record-level content type, no msgtype) ---
    add(_row("http://arc.example.com:80/x", content_type="text/html"))
    add(_row("http://arc.example.com:80/no-type", content_type="no-type"))
    add(_row("http://arc.example.com:80/non-ascii-ct",
             content_type="text/h\xe9ml"))

    # --- digest variants ---
    payload = b"<html>digest me</html>"
    add(_row("http://digest.example.com/with-payload-digest",
             html=http_block(payload=payload),
             warc_headers={"WARC-Payload-Digest": "sha1:" + _b32(payload)}))
    add(_row("http://digest.example.com/compute", html=http_block(payload=payload)))
    add(_row("http://digest.example.com/revisit", record_type="revisit",
             content_type="application/http; msgtype=response", html=b"",
             warc_headers={"WARC-Payload-Digest": "sha1:" + _b32(payload),
                           "WARC-Profile":
                           "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"}))
    add(_row("http://digest.example.com/revisit-no-sha1", record_type="revisit",
             html=b"", warc_headers={}))
    add(_row("http://digest.example.com/revisit-snm", record_type="revisit",
             html=b"",
             warc_headers={"WARC-Profile":
                           "http://netpreserve.org/warc/1.0/revisit/server-not-modified"}))
    add(_row("ftp://ftp.example.de/pub/INDEX.txt", record_type="resource",
             content_type="application/octet-stream", html=b"ftp file body",
             warc_headers={"WARC-Payload-Digest": "sha1:" + _b32(b"ftp file body")}))
    add(_row("ftp://ftp.example.de/pub/BLOCK.txt", record_type="resource",
             content_type="application/octet-stream", html=b"ftp block body",
             warc_headers={"WARC-Block-Digest": "sha1:" + _b32(b"ftp block body")}))
    add(_row("ftp://ftp.example.de/pub/NONE.txt", record_type="resource",
             content_type="application/octet-stream", html=b"ftp no digest"))
    add(_row("http://resource.example.com/r", record_type="resource",
             content_type="text/css", html=b"body{}"))
    add(_row("metadata://gnu.org/software/wget/warc/wget_arguments.txt",
             record_type="resource", content_type="text/plain",
             html=b"--mirror"))

    # --- robots meta / M field ---
    def html_with(meta: bytes) -> bytes:
        return http_block(payload=b"<html><head>" + meta
                          + b"</head><body>ok</body></html>")
    add(_row("http://robots.example.com/fi",
             html=html_with(b'<meta name="robots" content="nofollow, noindex">')))
    add(_row("http://robots.example.com/a",
             html=html_with(b"<meta name=ROBOTS content='noarchive'>")))
    add(_row("http://robots.example.com/afi",
             html=html_with(b'<meta name="robots" content="noindex">'
                            b'<meta name="robots" content="noarchive,nofollow">')))
    add(_row("http://robots.example.com/after-head",
             html=http_block(payload=b"<html><head></head>"
                             b'<meta name="robots" content="noindex"></html>')))
    add(_row("http://robots.example.com/x-robots",
             html=http_block(extra_headers=(("X-Robots-Tag", "noindex"),))))
    add(_row("http://robots.example.com/refresh-dup",
             html=html_with(b'<meta http-equiv="refresh" content="1;url=/a">'
                            b'<meta http-equiv="refresh" content="2;url=/b">'
                            b'<meta name="keywords" content="k1">'
                            b'<meta name="keywords" content="k2">')))
    add(_row("http://robots.example.com/password",
             warc_headers={"WARC-Simple-Form-Province-Status":
                           "1,1,http://(com,example,)/"}))
    add(_row("http://robots.example.com/password-zero",
             warc_headers={"WARC-Simple-Form-Province-Status": "0,0,x"}))
    add(_row("http://robots.example.com/password-junk",
             warc_headers={"WARC-Simple-Form-Province-Status": "nope,1"}))
    add(_row("http://robots.example.com/huge",
             html=html_with(b'<meta name="robots" content="noindex">'),
             content_length=6 * 1024 * 1024))
    add(_row("http://robots.example.com/blank-html",
             html=http_block(payload=b"   ")))

    # --- screenshot + other record types ---
    add(_row("http://example.com/", record_type="metadata",
             content_type="image/png", html=b"\x01" * 128))
    add(_row("http://example.com/request", record_type="request",
             content_type="application/http; msgtype=request",
             html=b"GET / HTTP/1.1\r\nHost: example.com\r\n\r\n"))

    # second file for multi-file ordering
    for i in range(3):
        add(_row("http://filetwo.example.org/p%d" % i,
                 warc_file="synthetic-00001.warc.gz", ts_offset=100 + i))
    return _finalize(r)


_TLDS = ("com", "org", "net", "de", "fr", "jp", "co.uk")
_WORDS = ("index", "about", "news", "article", "product", "search",
          "page", "item", "view", "static", "img", "css")


def bulk_rows(n: int, seed: int = 42, n_files: int = 8,
              hot_host_fraction: float = 0.3) -> list[dict]:
    """`n` mostly-response records over a power-law host distribution:
    ~`hot_host_fraction` of rows land on 3 hot hosts (crawl-hot-host
    skew), the rest spread over ~n/20 hosts."""
    rnd = random.Random(seed)
    n_hosts = max(10, n // 20)
    rows: list[dict] = []
    for i in range(n):
        if rnd.random() < hot_host_fraction:
            h = rnd.randrange(3)
        else:
            h = rnd.randrange(n_hosts)
        host = "www.site%d.%s" % (h, _TLDS[h % len(_TLDS)])
        depth = rnd.randrange(1, 4)
        path = "/".join(rnd.choice(_WORDS) for _ in range(depth))
        qs = ("?id=%d&ref=%s" % (rnd.randrange(10**6), rnd.choice(_WORDS))
              if rnd.random() < 0.3 else "")
        url = "http://%s/%s%s" % (host, path, qs)
        kind = rnd.random()
        payload = ("<html><head><title>%s</title>%s</head>"
                   "<body>%s</body></html>" % (
                       path,
                       ('<meta name="robots" content="noindex">'
                        if rnd.random() < 0.05 else ""),
                       " ".join(rnd.choice(_WORDS)
                                for _ in range(rnd.randrange(5, 60))),
                   )).encode("latin1")
        wh = {}
        if rnd.random() < 0.7:
            wh["WARC-Payload-Digest"] = "sha1:" + _b32(payload)
        if kind < 0.85:
            row = _row(url, html=http_block(
                status=rnd.choice(("200 OK", "200 OK", "200 OK", "404 Not Found",
                                   "301 Moved Permanently")),
                payload=payload), warc_headers=wh, ts_offset=i,
                text=payload.decode("latin1"), lang=rnd.choice(("en", "fr", "de")))
        elif kind < 0.92:
            row = _row(url, record_type="revisit", html=b"", warc_headers=wh,
                       ts_offset=i)
        elif kind < 0.97:
            row = _row(url, record_type="request",
                       content_type="application/http; msgtype=request",
                       html=b"GET / HTTP/1.1\r\n\r\n", ts_offset=i)
        else:
            row = _row(url, record_type="resource", content_type="text/css",
                       html=payload, ts_offset=i)
        row["warc_file"] = "bulk-%05d.warc.gz" % (i % n_files)
        rows.append(row)
    return _finalize(rows)


def _finalize(rows: list[dict]) -> list[dict]:
    """Assign compressed sizes and per-file cumulative offsets (field V is
    a running sum of record sizes within each file, cdx_writer.py:824)."""
    offsets: dict[str, int] = {}
    seqs: dict[str, int] = {}
    for row in rows:
        if row["compressed_size"] is None:
            row["compressed_size"] = max(120, len(row["html"] or b"") // 2 + 97)
        f = row["warc_file"]
        row["offset"] = offsets.get(f, 0)
        offsets[f] = row["offset"] + row["compressed_size"]
        row["record_seq"] = seqs.get(f, 0)
        seqs[f] = row["record_seq"] + 1
    return rows
