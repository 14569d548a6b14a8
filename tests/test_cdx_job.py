"""End-to-end CDX job tests: Spark pipeline vs the row-at-a-time oracle.

Mirrors the reference's golden-output strategy
(/root/reference/tests/test_small_warcs.py): the same synthetic pages are
run through the distributed plan and the pure-Python oracle and the CDX
lines must be byte-identical, in both default and --all-records modes,
plus exclusion/stats and screenshot-mode checks ported from
test_excludes.py / test_screenshot.py.
"""

import base64
import hashlib

import pytest
from pyspark.sql import functions as F

from cdx_writer_spark.job import (
    CDXConfig,
    cdx_header,
    cdx_lines,
    cdx_records,
    cdx_stats,
)
from cdx_writer_spark.oracle import oracle_cdx
from cdx_writer_spark.pages_gen import bulk_rows, edge_case_rows
from cdx_writer_spark.schema import PAGES_SCHEMA

EMPTY_SHA1 = "3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ"  # sha1(b'') base32


def _pages_df(spark, rows):
    return spark.createDataFrame(rows, PAGES_SCHEMA)


def _ordered_rows(rows):
    return sorted(rows, key=lambda r: (r["warc_file"], r["offset"]))


def _spark_lines(spark, rows, cfg):
    df = cdx_lines(_pages_df(spark, rows), cfg, sort=False)
    return [r.cdx_line for r in df.collect()]


@pytest.mark.parametrize("all_records", [False, True],
                         ids=["default", "all-records"])
def test_edge_cases_match_oracle(spark, all_records):
    rows = edge_case_rows()
    cfg = CDXConfig(all_records=all_records)
    got = _spark_lines(spark, rows, cfg)
    expected, _ = oracle_cdx(_ordered_rows(rows), all_records=all_records)
    assert got == expected
    if all_records:
        assert len(got) > 50  # the taxonomy is actually exercised
    else:
        assert 30 < len(got) < len(edge_case_rows())


@pytest.mark.parametrize("all_records", [False, True],
                         ids=["default", "all-records"])
def test_bulk_matches_oracle(spark, all_records):
    rows = bulk_rows(2000)
    cfg = CDXConfig(all_records=all_records)
    got = _spark_lines(spark, rows, cfg)
    expected, _ = oracle_cdx(_ordered_rows(rows), all_records=all_records)
    assert got == expected


def test_sorted_output_is_c_locale_bytewise(spark):
    rows = edge_case_rows()
    df = cdx_lines(_pages_df(spark, rows), CDXConfig(all_records=True),
                   sort=True)
    got = [r.cdx_line for r in df.collect()]
    assert got == sorted(got, key=lambda s: s.encode("latin1", "ignore"))
    # header sorts first because it starts with a space (README.md:25-27)
    assert sorted([cdx_header()] + got)[0] == cdx_header()


def test_excludes_and_stats(spark):
    # ported from /root/reference/tests/test_excludes.py
    rows = edge_case_rows()
    excludes = ("http://robots.example.com", "", "http://dates.example.com/d/")
    cfg = CDXConfig(all_records=True, exclude_urls=excludes)
    got = _spark_lines(spark, rows, cfg)
    exp_lines, exp_stats = oracle_cdx(
        _ordered_rows(rows), all_records=True, exclude_urls=excludes)
    assert got == exp_lines
    assert not any(line.startswith("com,example,robots)") for line in got)
    stats = cdx_stats(_pages_df(spark, rows), cfg)
    assert stats == exp_stats
    assert stats["num_records_processed"] == len(rows)
    assert stats["num_records_filtered"] >= 10
    assert (stats["num_records_included"]
            + stats["num_records_filtered"]) < stats["num_records_processed"]


def test_screenshot_mode(spark):
    # ported from /root/reference/tests/test_screenshot.py:58-97
    rows = edge_case_rows()
    cfg = CDXConfig(screenshot_mode=True)
    df = cdx_records(_pages_df(spark, rows), cfg)
    recs = df.collect()
    assert len(recs) == 1
    r = recs[0]
    assert r.massaged_url == "org,archive,web)/screenshot/com,example)/"
    assert r.original_url == ("http://web.archive.org/screenshot/"
                              "http://example.com/")
    assert r.mime_type == "image/png"
    assert r.response_code is None
    payload_digest = base64.b32encode(
        hashlib.sha1(b"\x01" * 128).digest()).decode()
    assert r.new_style_checksum == payload_digest


def test_custom_format_and_unknown_field(spark):
    rows = edge_case_rows()[:5]
    cfg = CDXConfig(format="N b g")
    got = _spark_lines(spark, rows, cfg)
    exp, _ = oracle_cdx(_ordered_rows(rows)[:0] or _ordered_rows(rows),
                        fmt="N b g")
    assert got == exp
    assert all(len(line.split(" ")) == 3 for line in got)
    with pytest.raises(ValueError):
        CDXConfig(format="N z").field_columns()


def test_known_field_values(spark):
    """Spot-check hard values that also appear in reference fixtures."""
    rows = edge_case_rows()
    cfg = CDXConfig(all_records=True)
    recs = {r.original_url: r
            for r in cdx_records(_pages_df(spark, rows), cfg).collect()}

    # empty payload -> sha1(b'') (fixtures transposed_header etc.)
    r = recs["http://status.example.com/empty-lf"]
    assert r.new_style_checksum == EMPTY_SHA1

    # date normalizations (fixtures 10/12/15/16/18_digit_date)
    assert recs["http://dates.example.com/d/2016020900"].date == "20160209000000"
    assert recs["http://dates.example.com/d/200011201434"].date == "20001120143400"
    assert recs["http://dates.example.com/d/201512000000000"].date == "20151200000000"
    assert recs["http://dates.example.com/d/200009180023002953"].date == "20000918002300"
    assert recs["http://dates.example.com/d/20160211000000jpg"].date == "20160211000000"
    assert recs["http://dates.example.com/d/deadbeef"].date is None
    assert recs["http://dates.example.com/iso-micro"].date == "20191118125603"

    # 304 included under --all-records, mime from status line parse
    assert "gov,nasa" not in recs  # sanity
    r304 = recs["http://status.example.com/304"]
    assert r304.response_code == "304"

    # uppercase content-type header value -> 'unk' (validation is
    # lowercase-only, cdx_writer.py:381)
    assert recs["http://status.example.com/upper-ct"].mime_type == "unk"
    assert recs["http://status.example.com/params-ct"].mime_type == "text/html"
    # 'text/html ;' leaves a trailing space -> fails validation -> unk
    assert recs["http://status.example.com/spacey-ct"].mime_type == "unk"
    assert recs["http://arc.example.com:80/no-type"].mime_type == "unk"
    assert recs["http://arc.example.com:80/non-ascii-ct"].mime_type == "unk"

    # robots flags incl. fixed AFI order and the P flag
    assert recs["http://robots.example.com/fi"].aif_meta_tags == "FI"
    assert recs["http://robots.example.com/a"].aif_meta_tags == "A"
    assert recs["http://robots.example.com/afi"].aif_meta_tags == "AFI"
    assert recs["http://robots.example.com/after-head"].aif_meta_tags is None
    assert recs["http://robots.example.com/x-robots"].aif_meta_tags == "I"
    assert recs["http://robots.example.com/password"].aif_meta_tags == "P"
    assert recs["http://robots.example.com/password-zero"].aif_meta_tags is None
    assert recs["http://robots.example.com/password-junk"].aif_meta_tags is None
    assert recs["http://robots.example.com/huge"].aif_meta_tags is None

    # ftp handler: status 226, digest fallback chain
    ftp = recs["ftp://ftp.example.de/pub/NONE.txt"]
    assert ftp.response_code == "226"
    assert ftp.new_style_checksum == base64.b32encode(
        hashlib.sha1(b"ftp no digest").digest()).decode()

    # warcinfo under --all-records
    wi = recs["warcinfo:/synthetic-00000.warc.gz/"
              "archive-commons.0.0.1-SNAPSHOT-20120112102659-python"]
    assert wi.mime_type == "warc-info"
    assert wi.massaged_url == wi.original_url


def test_default_mode_drops(spark):
    rows = edge_case_rows()
    cfg = CDXConfig()
    lines = _spark_lines(spark, rows, cfg)
    text = "\n".join(lines)
    assert "status.example.com/304" not in text       # F2
    assert "dns.example.com" not in text              # F1
    assert "liveweb.example.com/dead" not in text     # F3 (both modes)
    assert "liveweb.example.com/alive" in text
    assert "revisit-snm" not in text                  # F4
    assert "negative-cl" not in text                  # F8
    assert "wget_arguments" not in text               # F5 wget log resource
    assert "request" not in text                      # no dispatch_other
    # F3 hard-drops even under --all-records
    lines_all = "\n".join(_spark_lines(spark, rows,
                                       CDXConfig(all_records=True)))
    assert "liveweb.example.com/dead" not in lines_all
    assert "status.example.com/304" in lines_all
    assert "revisit-snm" in lines_all


def test_g_prefix(spark):
    rows = edge_case_rows()[:3]
    cfg = CDXConfig(all_records=True, g_prefix="/ia/warcs")
    recs = cdx_records(_pages_df(spark, rows), cfg).collect()
    assert all(r.file_name.startswith("/ia/warcs/synthetic-")
               for r in recs)


def test_sorted_sink_stats_single_count(spark, tmp_path):
    """Regression: the range-sort's bounds-sampling job must not
    double-fire the observation counters (stats were 2x before the
    persist barrier in write_sorted_cdx)."""
    import glob

    from cdx_writer_spark.sink import write_sorted_cdx

    rows = edge_case_rows()
    out = str(tmp_path / "sorted")
    stats = write_sorted_cdx(
        _pages_df(spark, rows), out, CDXConfig(all_records=True))
    n_lines = sum(
        len(open(p, "rb").read().splitlines())
        for p in glob.glob(out + "/part*"))
    assert stats["num_records_processed"] == len(rows)
    assert stats["num_records_included"] == n_lines


def test_large_exclude_list_stays_native(spark):
    """A 1000-prefix exclusion list compiles to per-length InSet probes
    (job.excluded_column) — result identical to the small list, and the
    physical plan contains no Python eval."""
    from cdx_writer_spark.job import cdx_flagged

    rows = bulk_rows(400)
    pages = _pages_df(spark, rows)
    real = ("http://www.site0.com", "http://www.site1.org")
    # pad with prefixes that match nothing
    padding = tuple("http://nomatch%d.example.net" % i
                    for i in range(1000))
    small_cfg = CDXConfig(exclude_urls=real)
    big_cfg = CDXConfig(exclude_urls=real + padding)
    assert len(big_cfg.exclude_surts()) > 1000
    big_df = cdx_flagged(pages, big_cfg).filter("excluded")

    def n_python_nodes(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return sum(plan.count(m) for m in ("BatchEvalPython",
                                           "ArrowEvalPython"))

    # the pipeline's masked Arrow UDFs (http_split and the surt re-eval
    # the excluded-filter itself induces; the SHA-1/base32 digest is
    # fully native) are the only Python in the plan — growing the list
    # 2 -> 1002 prefixes adds none
    baseline = n_python_nodes(
        cdx_flagged(pages, small_cfg).filter("excluded"))
    assert n_python_nodes(big_df) == baseline
    # per-length hash-set probes: substring(key, 1, len) INSET (...)
    assert "INSET" in big_df._jdf.queryExecution().executedPlan().toString()
    small = sorted(r.massaged_url for r in cdx_flagged(pages, small_cfg)
                   .filter("excluded").collect())
    big = sorted(r.massaged_url for r in big_df.collect())
    assert small == big
    assert len(big) > 0


def test_write_single_cdx_matches_reference_shape(spark, tmp_path):
    """write_single_cdx produces ONE file: header line first, then the
    lines — bytewise-sorted by default, (warc_file, offset) order with
    sort=False — matching the reference's stdout mode
    (cdx_writer.py:800-814)."""
    from cdx_writer_spark.job import cdx_header, cdx_lines
    from cdx_writer_spark.sink import write_single_cdx

    rows = bulk_rows(300)
    pages = _pages_df(spark, rows)
    cfg = CDXConfig()

    out = str(tmp_path / "single.cdx")
    stats = write_single_cdx(pages, out, cfg,
                             stats_file=str(tmp_path / "s.json"))
    body = open(out, "rb").read().decode("latin1").rstrip("\n")
    lines = body.split("\n")
    assert lines[0] == cdx_header(cfg)
    expected = [r.cdx_line for r in cdx_lines(pages, cfg, sort=True)
                .collect()]
    assert lines[1:] == expected
    assert lines[1:] == sorted(lines[1:])
    assert stats["num_records_included"] == len(expected)
    import json as _json
    assert _json.load(open(tmp_path / "s.json")) == stats

    out2 = str(tmp_path / "fileorder.cdx")
    write_single_cdx(pages, out2, cfg, sort=False)
    lines2 = open(out2, "rb").read().decode("latin1").rstrip("\n")
    expected2 = [r.cdx_line for r in cdx_lines(pages, cfg, sort=False)
                 .collect()]
    assert lines2.split("\n")[1:] == expected2


def test_native_sha1_b32_matches_hashlib(spark):
    """fields.sha1_b32_column (JVM sha1 + codegen'd hex->base32) is
    byte-identical to Python's base64.b32encode(hashlib.sha1(..)) —
    the reference digest formula (cdx_writer.py:222-223) — over empty,
    short, long, high-bit and NULL payloads."""
    import base64
    import hashlib

    from pyspark.sql import functions as F

    from cdx_writer_spark.fields import sha1_b32_column

    payloads = [b"", b"a", b"abc", bytes(range(256)) * 41,
                b"\xff" * 1000, "unicode ☃".encode("utf-8"), None]
    df = spark.createDataFrame([(p,) for p in payloads], "data binary")
    got = [r.k for r in
           df.select(sha1_b32_column(F.col("data")).alias("k")).collect()]
    want = [None if p is None
            else base64.b32encode(hashlib.sha1(p).digest()).decode("ascii")
            for p in payloads]
    assert got == want


# --- parse_cdx_lines (the CDX source / round trip) --------------------------


def test_cdx_write_parse_round_trip(spark):
    from cdx_writer_spark.fields import field_column_name
    from cdx_writer_spark.job import cdx_flagged
    from cdx_writer_spark.schema import DEFAULT_FORMAT
    from cdx_writer_spark.sink import parse_cdx_lines

    pages = spark.createDataFrame(
        edge_case_rows() + bulk_rows(200), PAGES_SCHEMA)
    cfg = CDXConfig(format=DEFAULT_FORMAT)
    lines = cdx_lines(pages, cfg, sort=True)
    parsed = parse_cdx_lines(lines, DEFAULT_FORMAT)

    names = [field_column_name(c) for c in DEFAULT_FORMAT.split(" ")]
    direct = (cdx_flagged(pages, cfg)
              .filter(F.col("admitted"))
              .select(*[F.coalesce(F.col(n).cast("string"), F.lit("-"))
                        .alias(n) for n in names]))
    got = sorted(map(tuple, parsed.collect()))
    want = sorted(map(tuple, direct.collect()))
    assert got == want and len(got) > 200


def test_parse_cdx_lines_drops_header_and_malformed(spark):
    from cdx_writer_spark.sink import parse_cdx_lines

    df = spark.createDataFrame(
        [(" CDX N b a",),
         ("com,example)/ 20120101000000 http://example.com/",),
         ("too few",),
         ("a b c d extra",)],
        "cdx_line string")
    got = parse_cdx_lines(df, "N b a").collect()
    assert len(got) == 1
    assert got[0]["massaged_url"] == "com,example)/"
    assert got[0]["date"] == "20120101000000"


def test_parse_cdx_lines_plan_is_shuffle_free(spark):
    from cdx_writer_spark.sink import parse_cdx_lines

    df = spark.createDataFrame([("a b c",)], "cdx_line string")
    plan = parse_cdx_lines(df, "N b a")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
