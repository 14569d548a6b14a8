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

Both are single aggregations with map-side partial ``min(struct(...))``
combines — deliberately NOT windows: a boilerplate payload captured
10^9 times is ONE group whose partial minima fold map-side, where a
``row_number`` window would sort the hot digest's captures in one
task.  The join back (revisit_dedup) is digest-keyed and AQE
skew-splittable.
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
