"""Outlink extraction semantics: resolution cases, drop rules, the
bounded ../ collapse, and binary-html decode (the oracle-parity sweep
covers the planted corpus; these pin the resolver's edges)."""

from __future__ import annotations

from cdx_writer_spark.frontier import links


def _links(spark, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, url string, html string")
    out = links.extract_links(df)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], set()).add(r["link"])
    return got


def test_resolution_cases(spark):
    html = (
        '<a href="https://abs.example/x">a</a>'
        '<a href="/rooted">a</a>'
        '<a href="sub/page">a</a>'
        '<a href="../parent">a</a>'
        '<a href="//cdn.example/y">a</a>'
        '<a href="#frag">a</a>'
        '<a href="javascript:void(0)">a</a>'
        '<a href="MAILTO:x@y">a</a>'
        '<A HREF="http://UPPER.example/Z">a</A>'
    )
    got = _links(spark, [(1, "http://h.example.com/a/b/page.html",
                          html)])
    assert got[1] == {
        "https://abs.example/x",
        "http://h.example.com/rooted",
        "http://h.example.com/a/b/sub/page",
        "http://h.example.com/a/parent",
        "http://cdn.example/y",
        "http://UPPER.example/Z",
    }


def test_base_without_path_and_https_scheme(spark):
    got = _links(spark, [
        (1, "https://h.example.com", '<a href="rel">a</a>'
                                     '<a href="//c.example/z">a</a>')])
    assert got[1] == {"https://h.example.com/rel",
                      "https://c.example/z"}


def test_collapse_is_bounded_at_three_levels(spark):
    deep = '<a href="../../../../four">a</a>'
    got = _links(spark, [(1, "http://h.example.com/a/b/c/d/e.html",
                          deep)])
    (link,) = got[1]
    # three levels collapse; the fourth leaves its residue — a
    # distinct-but-safe frontier key (documented simplification)
    assert link == "http://h.example.com/a/../four"


def test_binary_html_and_quote_forms(spark):
    df = spark.createDataFrame(
        [(1, "http://h.example.com/",
          "<a href=\"/ok\">a</a><a href='/single'>a</a>"
          "<a href=/bare>a</a><a href=rel.html>a</a>"
          .encode("latin-1"))],
        "doc_id long, url string, html binary")
    got = {r["link"] for r in links.extract_links(df).collect()}
    assert got == {"http://h.example.com/ok",
                   "http://h.example.com/single",
                   "http://h.example.com/bare",
                   "http://h.example.com/rel.html"}


def test_unquoted_href_terminates_at_whitespace_or_gt(spark):
    got = _links(spark, [
        (1, "http://h.example.com/",
         '<a href=/x class="b">a</a><a href=/y>a</a>')])
    assert got[1] == {"http://h.example.com/x",
                      "http://h.example.com/y"}


def test_generic_scheme_guard_drops_non_http_targets(spark):
    """Any explicit non-http scheme is dropped instead of falling
    through to the relative branch and minting a garbage URL."""
    html = ('<a href="data:image/png;base64,AAAA">a</a>'
            '<a href="tel:+15551234">a</a>'
            '<a href="ftp://files.example/x">a</a>'
            '<a href="file:///etc/passwd">a</a>'
            '<a href="a:b">a</a>'          # ambiguous -> scheme
            '<a href="rel/a:b">a</a>')     # colon after '/': relative
    got = _links(spark, [(1, "http://h.example.com/d/p.html", html)])
    assert got[1] == {"http://h.example.com/d/rel/a:b"}


def test_base_href_overrides_resolution_base(spark):
    html = ('<base href="http://bh.example.org/bdir/">'
            '<a href="rel/x">a</a><a href="/rooted">a</a>'
            '<a href="//cdn.example/y">a</a>'
            '<a href="http://abs.example/z">a</a>')
    got = _links(spark, [(1, "https://h.example.com/a/p.html", html)])
    assert got[1] == {
        "http://bh.example.org/bdir/rel/x",
        "http://bh.example.org/rooted",
        # protocol-relative picks up the BASE's scheme
        "http://cdn.example/y",
        "http://abs.example/z",
    }


def test_relative_or_singlequoted_base_href(spark):
    # relative <base href> falls back to the page URL (documented
    # subset); a single-quoted absolute base is honored
    got = _links(spark, [
        (1, "http://h.example.com/a/p.html",
         '<base href="/only/path/"><a href="rel">a</a>'),
        (2, "http://h.example.com/a/p.html",
         "<base href='https://b.example/q/'><a href=\"rel\">a</a>")])
    assert got[1] == {"http://h.example.com/a/rel"}
    assert got[2] == {"https://b.example/q/rel"}


def test_duplicate_links_dedup(spark):
    got = _links(spark, [
        (1, "http://h.example.com/", '<a href="/x">a</a>'
                                     '<a href="/x">b</a>')])
    assert got[1] == {"http://h.example.com/x"}


def test_data_href_is_not_an_outlink(spark):
    """href must start at an attribute boundary: a lone data-href is
    not a link; a real href after other attributes still matches."""
    got = _links(spark, [
        (1, "http://h.example.com/",
         '<a class="btn" data-href="/spa-route">a</a>'),
        (2, "http://h.example.com/",
         '<a data-href="/x" href="/real">a</a>')])
    assert 1 not in got
    assert got[2] == {"http://h.example.com/real"}


# --- extract_anchor_texts ------------------------------------------------------

def _anchors(spark, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, url string, html string")
    out = links.extract_anchor_texts(df)
    return sorted((r["doc_id"], r["link"], r["anchor"])
                  for r in out.collect())


def test_anchor_text_whitespace_collapse_and_resolution(spark):
    html = ('<a href="http://a.example/x">  Hello \t\n World </a>'
            '<a href="/local/5">loc</a>')
    got = _anchors(spark, [(1, "http://h.example.com/d/p.html", html)])
    assert got == [
        (1, "http://a.example/x", "Hello World"),
        (1, "http://h.example.com/local/5", "loc"),
    ]


def test_anchor_text_empty_anchor_kept_scheme_guard_applies(spark):
    html = ('<a href="http://a.example/x"></a>'
            '<a href="mailto:x@y.example">mail</a>'
            '<a href="#frag">frag</a>')
    got = _anchors(spark, [(1, "http://h.example.com/", html)])
    # the empty-anchor edge survives (link discovery), the
    # mailto/fragment targets are dropped exactly like extract_links
    assert got == [(1, "http://a.example/x", "")]


def test_anchor_text_base_href_override(spark):
    html = ('<base href="http://b.example.net/bdir/">'
            '<a href="rel/x">R</a>')
    got = _anchors(spark, [(1, "http://h.example.com/d/", html)])
    assert got == [(1, "http://b.example.net/bdir/rel/x", "R")]


def test_anchor_text_nested_tag_content_not_captured(spark):
    # anchor content with nested tags is outside the documented
    # subset: the link itself is still discovered by extract_links
    html = '<a href="/x"><b>bold</b></a><a href="/y">plain</a>'
    got = _anchors(spark, [(1, "http://h.example.com/", html)])
    assert got == [(1, "http://h.example.com/y", "plain")]
    df = spark.createDataFrame(
        [(1, "http://h.example.com/", html)],
        "doc_id long, url string, html string")
    found = {r["link"] for r in links.extract_links(df).collect()}
    assert found == {"http://h.example.com/x",
                     "http://h.example.com/y"}


# --- extract_sitemap_urls ------------------------------------------------------

def test_sitemap_trim_dedup_and_scheme_filter(spark):
    xml = ("<urlset><url><loc> http://a.example/p1 </loc></url>"
           "<url><loc>http://a.example/p1</loc></url>"
           "<url><loc>HTTPS://a.example/p2</loc></url>"
           "<url><loc>ftp://a.example/bad</loc></url>"
           "<url><loc>relative/nope</loc></url></urlset>")
    df = spark.createDataFrame([(1, xml)], "doc_id long, html string")
    got = sorted(r["loc"] for r in
                 links.extract_sitemap_urls(df).collect())
    assert got == ["HTTPS://a.example/p2", "http://a.example/p1"]


def test_sitemap_binary_and_empty(spark):
    df = spark.createDataFrame(
        [(1, b"<urlset><loc>http://a.example/x</loc></urlset>"),
         (2, b"<html>not a sitemap</html>")],
        "doc_id long, html binary")
    got = [(r["doc_id"], r["loc"]) for r in
           links.extract_sitemap_urls(df).collect()]
    assert got == [(1, "http://a.example/x")]


# --- url_templates -------------------------------------------------------------

def test_url_templates_collapse_digit_runs(spark):
    rows = [("http://h.example/a/123/view?id=77",),
            ("http://h.example/a/9/view?id=8",),
            ("http://h.example/static/css",),
            ("http://h.example",),
            ("https://h2.example/cal/2026/08/20",)]
    df = spark.createDataFrame(rows, "url string")
    got = {(r["host"], r["template"]): r["n_urls"]
           for r in links.url_templates(df).collect()}
    assert got == {
        ("h.example", "/a/{n}/view?id={n}"): 2,
        ("h.example", "/static/css"): 1,
        ("h.example", "/"): 1,
        ("h2.example", "/cal/{n}/{n}/{n}"): 1,
    }


# --- extract_robots_sitemaps ---------------------------------------------------

def test_robots_sitemap_directives(spark):
    txt = ("User-agent: *\n"
           "Disallow: /private\n"
           "Sitemap: http://a.example/sitemap.xml\n"
           "  SITEMAP:\thttps://a.example/other.xml  \n"
           "sitemap: http://a.example/sitemap.xml\n"
           "Sitemap: /relative/nope.xml\n"
           "# Sitemap: http://a.example/commented.xml\n")
    df = spark.createDataFrame([(1, txt), (2, "User-agent: *\n")],
                               "doc_id long, text string")
    got = sorted((r["doc_id"], r["sitemap"]) for r in
                 links.extract_robots_sitemaps(df).collect())
    assert got == [
        (1, "http://a.example/sitemap.xml"),
        (1, "https://a.example/other.xml"),
    ]


def test_robots_sitemap_binary_body(spark):
    df = spark.createDataFrame(
        [(1, b"Sitemap: http://b.example/s.xml\n")],
        "doc_id long, text binary")
    got = [(r["doc_id"], r["sitemap"]) for r in
           links.extract_robots_sitemaps(df).collect()]
    assert got == [(1, "http://b.example/s.xml")]
