"""Outlink extraction: the crawl stage between fetch and frontier —
pull ``<a href>`` targets out of fetched HTML and resolve them against
the page URL, producing the (src, link) edges the scheduler enqueues.
The repo's crawl loop consumes a webgraph's ``outlinks`` column; this
operator is how that column comes into existence from REAL page bytes.

All-native Catalyst (one ``regexp_extract_all`` + a resolution CASE
per link; no Python, no shuffle — embarrassingly parallel at any
scale), with the expression kept inside the Java/RE2/Python-common
regex subset so the DuckDB oracle executes the identical pattern.

Documented simplifications (each a deliberate subset, mirrored by the
oracle): double-quoted href values only; ``http(s)``/protocol-
relative/root-relative/relative targets (``#fragment``,
``javascript:``, ``mailto:`` dropped); ``../`` collapse bounded at 3
levels (deeper traversals keep their residue — a crawler treats those
URLs as distinct keys, which is safe, just less normalized).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: double-quoted href values in <a> tags, case-insensitive.  The
#: attribute must start at a whitespace boundary (directly after the
#: tag name or after an earlier attribute), so a lone ``data-href``
#: cannot false-positive; a real ``href`` after other attributes
#: still matches via backtracking into the optional prefix group.
HREF_PATTERN = (r'(?i)<a[ \t\n\r](?:[^>]*[ \t\n\r])?href="([^"]*)"')

#: how many /seg/../ collapse passes the resolver applies
COLLAPSE_PASSES = 3


def resolve_link_col(v: Column, base: Column) -> Column:
    """Resolve one href value against ``base`` (an absolute http(s)
    URL); NULL for dropped targets (fragments, javascript:,
    mailto:)."""
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
        .when(v.startswith("#") | low.startswith("javascript:")
              | low.startswith("mailto:"), F.lit(None))
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
    hrefs = F.regexp_extract_all(html, F.lit(HREF_PATTERN), 1)
    # resolve + drop + dedup INSIDE the per-row array, then explode:
    # a global .distinct() would hash-exchange the full edge set, and
    # per-document dedup is the global dedup here (doc_id is in the
    # key); cross-document duplicate targets are the URL-seen
    # filter's job, not this operator's
    base = F.col(base_col)
    resolved = F.array_distinct(F.filter(
        F.transform(hrefs, lambda v: resolve_link_col(v, base)),
        lambda x: x.isNotNull()))
    return pages.select(
        F.col(id_col), F.explode(resolved).alias("link"))
