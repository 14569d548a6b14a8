"""Outlink extraction: the crawl stage between fetch and frontier —
pull ``<a href>`` targets out of fetched HTML and resolve them against
the page URL, producing the (src, link) edges the scheduler enqueues.
The repo's crawl loop consumes a webgraph's ``outlinks`` column; this
operator is how that column comes into existence from REAL page bytes.

All-native Catalyst (three ``regexp_extract_all`` projections — one
per quoting form — + a resolution CASE per link; no Python, no
shuffle — embarrassingly parallel at any scale), with the expressions
kept inside the Java/RE2/Python-common regex subset so the DuckDB
oracle executes identical patterns where it needs them.

Covered href forms: double-quoted, single-quoted, and unquoted
attribute values; ``http(s)``/protocol-relative/root-relative/relative
targets.  A ``<base href>`` element overrides the resolution base when
its value is an absolute http(s) URL (first double-quoted match wins,
else first single-quoted).  Dropped targets: ``#fragment`` and any
explicit non-http scheme (``javascript:``, ``mailto:``, ``data:``,
``tel:``, … — one generic RFC-3986 scheme guard, so no scheme ever
falls through to the relative branch and mints a garbage frontier
URL).

Documented simplifications (each a deliberate subset, mirrored by the
oracle): a relative ``<base href>`` falls back to the page URL;
``../`` collapse bounded at 3 levels (deeper traversals keep their
residue — a crawler treats those URLs as distinct keys, which is
safe, just less normalized).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: href values in <a> tags, case-insensitive, one pattern per quoting
#: form.  The attribute must start at a whitespace boundary (directly
#: after the tag name or after an earlier attribute), so a lone
#: ``data-href`` cannot false-positive; a real ``href`` after other
#: attributes still matches via backtracking into the optional prefix
#: group.  The unquoted form excludes quote characters at the value
#: start so it can never shadow the quoted patterns, and terminates at
#: whitespace or ``>`` per the HTML attribute grammar.
_A_PREFIX = r'(?i)<a[ \t\n\r](?:[^>]*[ \t\n\r])?href='
HREF_PATTERNS = (
    _A_PREFIX + r'"([^"]*)"',
    _A_PREFIX + r"'([^']*)'",
    _A_PREFIX + r'''([^"' \t\n\r>][^ \t\n\r>]*)''',
)
#: backwards-compatible alias (double-quoted form)
HREF_PATTERN = HREF_PATTERNS[0]

#: first <base href> value, same boundary rules (quoted forms only —
#: an unquoted base href is vanishingly rare and ambiguous)
_BASE_PREFIX = r'(?i)<base[ \t\n\r](?:[^>]*[ \t\n\r])?href='
BASE_PATTERNS = (
    _BASE_PREFIX + r'"([^"]*)"',
    _BASE_PREFIX + r"'([^']*)'",
)

#: how many /seg/../ collapse passes the resolver applies
COLLAPSE_PASSES = 3

#: an explicit RFC-3986 scheme prefix (applied to the lowercased
#: value): anything matching this that is not http(s) is not a web
#: outlink — resolving it relatively would emit garbage like
#: http://host/dir/data:image/png;base64,...
_SCHEME_RE = r"^[a-z][a-z0-9+.-]*:"


def effective_base_col(html: Column, url: Column) -> Column:
    """The resolution base for a page: its first absolute-http(s)
    ``<base href>`` value when present, else the page URL."""
    dq = F.regexp_extract(html, BASE_PATTERNS[0], 1)
    sq = F.regexp_extract(html, BASE_PATTERNS[1], 1)
    b = F.when(dq != "", dq).otherwise(sq)
    return F.when(F.lower(b).rlike(r"^https?://"), b).otherwise(url)


def resolve_link_col(v: Column, base: Column) -> Column:
    """Resolve one href value against ``base`` (an absolute http(s)
    URL); NULL for dropped targets (fragments and any explicit
    non-http scheme: javascript:, mailto:, data:, tel:, ...)."""
    origin = F.regexp_extract(base, r"^(https?://[^/]+)", 1)
    # directory of the base path: everything through the last '/'
    # after the origin ('' when the base has no path -> '/')
    path = F.substring(base, F.length(origin) + 1, F.lit(1 << 30))
    dirpath = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, r"[^/]*$", ""))
    low = F.lower(v)
    resolved = (
        F.when(low.startswith("http://") | low.startswith("https://"),
               v)
        .when(v.startswith("//"),
              F.concat(F.regexp_extract(base, r"^(https?:)", 1), v))
        .when(v.startswith("/"), F.concat(origin, v))
        .when(v.startswith("#") | low.rlike(_SCHEME_RE), F.lit(None))
        .otherwise(F.concat(origin, dirpath, v))
    )
    for _ in range(COLLAPSE_PASSES):
        # collapse one /seg/../ level per pass, path side only (the
        # pattern requires a '/'-led segment, so '//host/' is safe)
        resolved = F.regexp_replace(
            resolved, r"/[^/.][^/]*/\.\./", "/")
    return resolved


def extract_links(pages: DataFrame, id_col: str = "doc_id",
                  html_col: str = "html", base_col: str = "url"
                  ) -> DataFrame:
    """(id, link) edges from the pages table: html may be a binary
    column (decoded ISO-8859-1, the byte-transparent charset the
    native HTTP split uses) or a string column."""
    html = F.col(html_col)
    if dict(pages.dtypes).get(html_col) == "binary":
        html = F.decode(html, "ISO-8859-1")
    hrefs = F.concat(*[F.regexp_extract_all(html, F.lit(p), 1)
                       for p in HREF_PATTERNS])
    # resolve + drop + dedup INSIDE the per-row array, then explode:
    # a global .distinct() would hash-exchange the full edge set, and
    # per-document dedup is the global dedup here (doc_id is in the
    # key); cross-document duplicate targets are the URL-seen
    # filter's job, not this operator's
    base = effective_base_col(html, F.col(base_col))
    resolved = F.array_distinct(F.filter(
        F.transform(hrefs, lambda v: resolve_link_col(v, base)),
        lambda x: x.isNotNull()))
    return pages.select(
        F.col(id_col), F.explode(resolved).alias("link"))


#: (href, anchor text) pairs — double-quoted hrefs with tag-free
#: anchor content, the anchor-text subset (single-quoted/unquoted
#: hrefs are still DISCOVERED by extract_links; this pattern only
#: bounds which links also carry usable text)
ANCHOR_PATTERN = (r'(?i)<a[ \t\n\r](?:[^>]*[ \t\n\r])?href='
                  r'"([^"]*)"[^>]*>([^<]*)</a>')

#: <loc> entries in a sitemap document (sitemaps.org protocol);
#: whitespace inside the element is trimmed per the XML data model
SITEMAP_LOC_PATTERN = r"<loc>([^<]*)</loc>"


def extract_anchor_texts(pages: DataFrame, id_col: str = "doc_id",
                         html_col: str = "html",
                         base_col: str = "url") -> DataFrame:
    """(id, link, anchor) rows from the pages table — the anchor-text
    edge stage of a web pipeline (anchor text is the classic external
    document description: it feeds ranking, link-spam detection, and
    query-independent summaries).  ``anchor`` is the tag-free inner
    text with ASCII whitespace collapsed and trimmed; ``link`` is the
    href resolved exactly like :func:`extract_links` (same base
    override, same scheme guard), so the edge set here is a labeled
    subset of that operator's output.

    Scale shape: all-native Catalyst — two ``regexp_extract_all``
    group projections zipped per row, resolution CASE, one explode.
    No Python, no shuffle; embarrassingly parallel at any corpus
    size.  Downstream per-target aggregation is the caller's ONE
    (link)-keyed exchange."""
    html = F.col(html_col)
    if dict(pages.dtypes).get(html_col) == "binary":
        html = F.decode(html, "ISO-8859-1")
    base = effective_base_col(html, F.col(base_col))
    hv = F.regexp_extract_all(html, F.lit(ANCHOR_PATTERN), 1)
    tv = F.regexp_extract_all(html, F.lit(ANCHOR_PATTERN), 2)
    pairs = pages.select(
        F.col(id_col), base.alias("__base"),
        F.explode(F.arrays_zip(hv.alias("h"), tv.alias("t")))
        .alias("__p"))
    return (pairs.select(
        F.col(id_col),
        resolve_link_col(F.col("__p.h"), F.col("__base"))
        .alias("link"),
        F.trim(F.regexp_replace(F.col("__p.t"), r"[ \t\n\r]+", " "))
        .alias("anchor"))
        .filter(F.col("link").isNotNull()))


def extract_sitemap_urls(pages: DataFrame, id_col: str = "doc_id",
                         xml_col: str = "html") -> DataFrame:
    """(id, loc) rows from sitemap XML documents (sitemaps.org
    protocol) — the crawl's OTHER discovery channel next to anchor
    edges: robots.txt ``Sitemap:`` directives point at these files
    and a scheduler seeds its frontier from them.  Only absolute
    http(s) ``<loc>`` values survive (the protocol requires absolute
    URLs; anything else is a malformed entry a crawler must drop).
    Values are trimmed, and deduplicated per document.

    Scale shape: one ``regexp_extract_all`` + per-row
    dedup/filter inside the array, one explode — no Python, no
    shuffle (the same embarrassingly-parallel shape as
    :func:`extract_links`)."""
    xml = F.col(xml_col)
    if dict(pages.dtypes).get(xml_col) == "binary":
        xml = F.decode(xml, "ISO-8859-1")
    locs = F.regexp_extract_all(xml, F.lit(SITEMAP_LOC_PATTERN), 1)
    cleaned = F.array_distinct(F.filter(
        F.transform(locs, lambda v: F.trim(v)),
        lambda v: F.lower(v).rlike(r"^https?://")))
    return pages.select(
        F.col(id_col), F.explode(cleaned).alias("loc"))


def url_template_col(url: Column) -> Column:
    """A URL's crawl-trap template: the path+query with every decimal
    digit run collapsed to ``{n}``.  Calendar pages, session ids,
    paginated listings and other infinite URL spaces collapse to one
    template each, so a per-(host, template) count exposes them —
    the standard pre-crawl heuristic for bounding per-pattern budget
    (a real scheduler caps fetches per exploding template)."""
    origin = F.regexp_extract(url, r"^https?://([^/]+)", 1)
    path = F.regexp_extract(url, r"^https?://[^/]+(/.*)?$", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.struct(
        origin.alias("host"),
        F.regexp_replace(path, r"[0-9]+", "{n}").alias("template"))


def url_templates(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-(host, template) URL counts over a frontier/corpus URL
    column — see :func:`url_template_col`.  ONE native projection +
    ONE (host, template)-keyed aggregation with map-side partials;
    output cardinality is the number of distinct page-generator
    patterns, orders of magnitude below the URL count, so the
    exchange is tiny at any corpus size."""
    t = url_template_col(F.col(url_col))
    return (urls.select(t.alias("t"))
            .groupBy(F.col("t.host").alias("host"),
                     F.col("t.template").alias("template"))
            .agg(F.count(F.lit(1)).alias("n_urls")))


#: Sitemap: directive lines in robots.txt — global per RFC 9309 §2.3
#: (not group-scoped), field name case-insensitive, value terminating
#: at whitespace or a '#' comment
ROBOTS_SITEMAP_PATTERN = (r"(?im)^[ \t]*sitemap[ \t]*:"
                          r"[ \t]*([^ \t\r\n#]+)")


def extract_robots_sitemaps(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """(id, sitemap) rows from robots.txt bodies — the wiring between
    the robots cache and :func:`extract_sitemap_urls`: ``Sitemap:``
    directives are global lines (RFC 9309 §2.3 passes them through;
    sitemaps.org defines them) and a scheduler seeds sitemap fetches
    from exactly this set.  Only absolute http(s) values survive
    (the protocol requires absolute URLs); values are deduplicated
    per document.

    All-native: one multiline ``regexp_extract_all`` + in-array
    filter/dedup + explode — zero Python, zero shuffle, the same
    embarrassingly-parallel shape as the other discovery
    operators."""
    body = F.col(text_col)
    if dict(df.dtypes).get(text_col) == "binary":
        body = F.decode(body, "ISO-8859-1")
    vals = F.regexp_extract_all(
        body, F.lit(ROBOTS_SITEMAP_PATTERN), 1)
    cleaned = F.array_distinct(F.filter(
        vals, lambda v: F.lower(v).rlike(r"^https?://")))
    return df.select(
        F.col(id_col), F.explode(cleaned).alias("sitemap"))
