"""CDX query-side operators: the lookups an archive REPLAY stack runs
against the index the write path produces.

* :func:`revisit_dedup` — Heritrix-style storage deduplication: among
  captures sharing a payload digest, the globally-first capture stays
  a ``response`` and every later one becomes a ``revisit`` record
  pointing at it (the WARC ``identical-payload-digest`` profile the
  reference's F4 filter consumes on read; this operator GENERATES that
  structure on write — reference cdx_writer.py:663-672 handles the
  records this op would emit).
* :func:`closest_capture` — the Wayback "closest timestamp" query: per
  URL, the capture minimizing |ts - target| (earlier wins ties).
* :func:`prefix_scan` — the CDX-server ``matchType=prefix`` lookup:
  all captures whose SURT key starts with a prefix, optionally bounded
  to a timestamp window, in index order with an optional result cap.
* :func:`merge_captures` — incremental index maintenance: upsert a
  delta batch of captures into an existing index with
  latest-generation-wins semantics per ``(surt_key, ts)`` — the CDC
  step that folds a new crawl's CDX lines into the standing index
  without rewriting it.

revisit_dedup / closest_capture / merge_captures are single
aggregations with map-side partial ``min``/``max`` ``struct`` combines
— deliberately NOT windows: a boilerplate payload captured 10^9 times
is ONE group whose partial extrema fold map-side, where a
``row_number`` window would sort the hot key's captures in one task.
The join back (revisit_dedup) is digest-keyed and AQE skew-splittable.
prefix_scan is filter + top-k: the prefix predicate compiles to a
``StringStartsWith`` parquet pushdown (row groups outside the key
range never leave the scan) and the capped form plans as
``TakeOrderedAndProject`` — per-partition heaps, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def revisit_dedup(captures: DataFrame, url_col: str = "url",
                  ts_col: str = "ts", digest_col: str = "digest",
                  id_col: str = "doc_id") -> DataFrame:
    """Assign each capture its storage disposition: the first capture
    of each payload digest (by ``(ts, id)``) keeps ``response``; later
    ones become ``revisit`` with ``refers_to_url`` / ``refers_to_ts``
    of that first capture.  NULL digests (no payload) pass through as
    ``response`` with no referent.

    Output: ``(id, url, ts, record_type, refers_to_url,
    refers_to_ts)``."""
    keyed = captures.select(
        F.col(id_col).alias("id"), F.col(url_col).alias("url"),
        F.col(ts_col).cast("long").alias("ts"),
        F.col(digest_col).alias("digest"))
    firsts = (keyed.filter(F.col("digest").isNotNull())
              .groupBy("digest")
              .agg(F.min(F.struct("ts", "id", "url")).alias("f")))
    joined = keyed.join(firsts, "digest", "left")
    is_first = (F.col("f").isNull()
                | ((F.col("ts") == F.col("f.ts"))
                   & (F.col("id") == F.col("f.id"))))
    return joined.select(
        "id", "url", "ts",
        F.when(is_first, F.lit("response")).otherwise(F.lit("revisit"))
        .alias("record_type"),
        F.when(is_first, F.lit(None).cast("string"))
        .otherwise(F.col("f.url")).alias("refers_to_url"),
        F.when(is_first, F.lit(None).cast("long"))
        .otherwise(F.col("f.ts")).alias("refers_to_ts"))


def closest_capture(captures: DataFrame, target_ts: int,
                    url_col: str = "url", ts_col: str = "ts",
                    id_col: str = "doc_id") -> DataFrame:
    """Per URL, the capture closest to ``target_ts`` (ties to the
    EARLIER capture, then lower id — the Wayback replay lookup run for
    every URL at once).  Output: ``(url, ts, id, distance)``.

    One aggregation, map-side partial min over
    ``struct(|ts-target|, ts, id)`` — never a per-URL sort."""
    keyed = captures.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).cast("long").alias("ts"),
        F.col(id_col).alias("id"))
    dist = F.abs(F.col("ts") - F.lit(int(target_ts)))
    best = (keyed.groupBy("url")
            .agg(F.min(F.struct(dist.alias("d"), "ts", "id"))
                 .alias("b")))
    return best.select(
        "url", F.col("b.ts").alias("ts"), F.col("b.id").alias("id"),
        F.col("b.d").cast("long").alias("distance"))


def prefix_scan(index: DataFrame, surt_prefix: str,
                ts_from: int | None = None, ts_to: int | None = None,
                limit: int | None = None, key_col: str = "surt_key",
                ts_col: str = "ts", id_col: str = "doc_id") -> DataFrame:
    """CDX-server ``matchType=prefix`` (pywb / OpenWayback semantics):
    every capture whose SURT key starts with ``surt_prefix``, within
    the optional half-open ``[ts_from, ts_to)`` window, ordered by
    ``(key, ts, id)`` — the index's total order — and capped to
    ``limit`` rows when given (the server's ``limit=`` parameter).

    Scale shape: ``startswith`` compiles to a ``StringStartsWith``
    pushed filter, so a sorted/Z-ordered index prunes row groups by
    the key's min/max stats before any row is read; the timestamp
    bounds push the same way.  With ``limit``, Spark plans
    ``TakeOrderedAndProject`` — each scan partition keeps a
    ``limit``-row heap and only those heaps cross the wire, so a
    10^10-row index answers a capped prefix query without a global
    sort.  Output: ``(surt_key, ts, id)``."""
    out = index.select(
        F.col(key_col).alias("surt_key"),
        F.col(ts_col).cast("long").alias("ts"),
        F.col(id_col).alias("id"))
    out = out.filter(F.col("surt_key").startswith(surt_prefix))
    if ts_from is not None:
        out = out.filter(F.col("ts") >= int(ts_from))
    if ts_to is not None:
        out = out.filter(F.col("ts") < int(ts_to))
    out = out.orderBy("surt_key", "ts", "id")
    return out.limit(int(limit)) if limit is not None else out


def collapse_captures(index: DataFrame, digits: int = 8,
                      key_col: str = "surt_key", ts_col: str = "ts",
                      id_col: str = "doc_id") -> DataFrame:
    """CDX-server ``collapse=timestamp:N``: within each
    ``(surt_key, ts div 10^(14-digits))`` group keep only the FIRST
    capture — the dedup the Wayback calendar view runs so a page
    captured hourly renders one entry per day (``digits=8`` on
    14-digit timestamps).  Here ``ts`` is a plain integer timeline,
    so the collapse unit is ``10^(14-digits)`` ticks.

    One aggregation, map-side partial ``min(struct(ts, id))`` — a URL
    captured 10^9 times inside one collapse bucket folds map-side.
    Output: ``(surt_key, ts, id, n_collapsed)``."""
    unit = 10 ** (14 - digits)
    keyed = index.select(
        F.col(key_col).alias("surt_key"),
        F.col(ts_col).cast("long").alias("ts"),
        F.col(id_col).alias("id"))
    best = (keyed.groupBy("surt_key",
                          (F.col("ts") - F.col("ts") % unit)
                          .alias("_bucket"))
            .agg(F.min(F.struct("ts", "id")).alias("f"),
                 F.count(F.lit(1)).alias("n_collapsed")))
    return best.select("surt_key", F.col("f.ts").alias("ts"),
                       F.col("f.id").alias("id"), "n_collapsed")


def merge_captures(base: DataFrame, delta: DataFrame,
                   key_col: str = "surt_key", ts_col: str = "ts",
                   digest_col: str = "digest",
                   id_col: str = "doc_id") -> DataFrame:
    """Upsert ``delta`` into ``base``: one output row per
    ``(surt_key, ts)``, the delta's version winning where both carry
    the key (CDC latest-generation-wins — the nightly job that folds a
    fresh crawl's CDX lines into the standing index).  Ties inside one
    side resolve by highest id (a re-emitted capture supersedes).

    One union + one aggregation: ``max(struct(generation, id,
    payload...))`` folds map-side, so a hot key re-captured 10^9 times
    never concentrates in a window sort; the shuffle carries exactly
    one partially-combined row per (key, ts) per map partition.
    Output: ``(surt_key, ts, digest, id, generation)`` with
    ``generation`` 0 = base survivor, 1 = delta survivor."""
    def keyed(df: DataFrame, gen: int) -> DataFrame:
        return df.select(
            F.col(key_col).alias("surt_key"),
            F.col(ts_col).cast("long").alias("ts"),
            F.col(digest_col).alias("digest"),
            F.col(id_col).alias("id"),
            F.lit(gen).alias("generation"))

    both = keyed(base, 0).unionByName(keyed(delta, 1))
    best = (both.groupBy("surt_key", "ts")
            .agg(F.max(F.struct("generation", "id", "digest"))
                 .alias("w")))
    return best.select(
        "surt_key", "ts", F.col("w.digest").alias("digest"),
        F.col("w.id").alias("id"),
        F.col("w.generation").alias("generation"))
