"""Record admission — the reference's dispatcher chain as Column expressions.

RecordDispatcher (cdx_writer.py:620-692) walks an ordered list of
predicate functions, each returning a handler class, None (try the next
dispatcher) or False (hard drop, blocking later dispatchers).  Here the
chain is a ``coalesce`` of per-dispatcher ``when`` chains over a string
``handler`` column, with the hard drop (failed liveweb-proxy captures,
cdx_writer.py:647-655) overriding to NULL.  NULL handler == record not
indexed.  All of it is native Catalyst (whole-stage codegen; predicate
pushdown carries record_type/content_type to the scan).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Status line regex (cdx_writer.py:435-436): optional version group, then
# a space and digits, anchored at payload start.  Kept for reference/
# documentation; the actual extraction happens inside the http_split
# pandas UDF (udfs.py) so the status/version reach this module as plain
# attribute columns — re-inlining a regexp_extract at each of the ~30
# places the dispatch chain is referenced exploded the codegen'd plan.
RE_RESPONSE_LINE = r"^HTTP(/\d\.\d)? (\d+)"


def handler_column(
    record_type: Column,
    content_type: Column,
    url: Column,
    status: Column,
    version: Column,
    warc_headers: Column,
    all_records: bool = False,
    screenshot_mode: bool = False,
) -> Column:
    """String handler id ∈ {response, revisit, resource, ftp, warcinfo,
    screenshot, base} or NULL (record skipped).  ``status``/``version``
    are the pre-parsed HTTP status-line groups from http_split."""
    ip = F.element_at(warc_headers, F.lit("IP-address"))
    profile = F.element_at(warc_headers, F.lit("WARC-Profile"))

    # dispatch_http (cdx_writer.py:639-663)
    not_dns = content_type.isNull() | (content_type != "text/dns")
    h_http = (
        F.when(~not_dns, F.lit(None))
        .when(
            record_type == "response",
            F.when(status == "304", F.lit(None)).otherwise(F.lit("response")),
        )
        .when(
            record_type == "revisit",
            F.when(
                profile.isNotNull()
                & profile.endswith("/revisit/server-not-modified"),
                F.lit(None),
            ).otherwise(F.lit("revisit")),
        )
        .otherwise(F.lit(None))
    )

    # dispatch_resource (cdx_writer.py:665-673) — wget's argv/log resource
    # records have non-http(s)/ftp URLs and are skipped.
    h_resource = F.when(
        record_type == "resource",
        F.when(url.startswith("ftp://"), F.lit("ftp"))
        .when(url.startswith("http://") | url.startswith("https://"),
              F.lit("resource"))
        .otherwise(F.lit(None)),
    ).otherwise(F.lit(None))

    # dispatch_screenshot (cdx_writer.py:632-637)
    h_screenshot = F.when(
        (record_type == "metadata")
        & content_type.isNotNull()
        & content_type.startswith("image/"),
        F.lit("screenshot"),
    ).otherwise(F.lit(None))

    # dispatch_other (cdx_writer.py:675-683), only with --all-records
    h_other = (
        F.when(record_type == "warcinfo", F.lit("warcinfo"))
        .when(record_type == "response", F.lit("response"))
        .when(record_type == "revisit", F.lit("revisit"))
        .otherwise(F.lit("base"))
    )

    if screenshot_mode:
        chain = [h_screenshot]
    else:
        chain = [h_http, h_resource]
    if all_records:
        chain.append(h_other)
    handler = F.coalesce(*chain) if len(chain) > 1 else chain[0]

    # Hard drop: failed liveweb-proxy ARC captures return False from
    # dispatch_http, blocking even dispatch_other (cdx_writer.py:647-655).
    hard_drop = (
        (record_type == "response")
        & not_dns
        & (ip == "0.0.0.0")
        & status.isNotNull()
        & version.isNull()
        & status.isin("502", "504")
    )
    if screenshot_mode:
        return handler  # dispatch_http (and its hard drop) not installed
    return F.when(hard_drop, F.lit(None)).otherwise(handler)


def content_length_ok(content_length: Column) -> Column:
    """Negative archive-header Content-Length drops the record
    (cdx_writer.py:836-839; fixture negative_content_length.arc.gz).
    Missing header passes."""
    return F.coalesce(content_length >= 0, F.lit(True))
