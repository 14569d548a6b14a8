"""DUST-style URL alias-rule mining: which query parameters are
content-insignificant (Bar-Yossef, Keidar & Schonfeld, WWW'07 —
"Do Not Crawl in the DUST: Different URLs with Similar Text").

A crawler that knows ``?sessionid=`` / ``?utm_source=`` never change
the page can collapse URL aliases BEFORE fetching — at 10^10 URLs the
cheapest page is the one never requested.  The full paper mines
arbitrary substring substitution rules from crawl logs; this module
implements the high-yield special case real crawl stacks deploy
(parameter insignificance), with the paper's support/ratio validation:
a parameter ``p`` is insignificant when, across URLs carrying ``p``,
stripping ``p`` yields a URL the corpus has ALSO seen — with the SAME
content digest — in at least ``ratio`` of cases (and at least
``min_support`` URLs carry ``p`` at all).

The reference has no alias miner (it indexes whatever was crawled);
this is a north-rule frontier component — the evidence source is the
(url, digest) pairs the CDX path already emits (fields.py 'k').

Scale shape: one distinct over (url, digest) pairs, a narrow
in-row split/filter/rejoin projection (zero Python), one equi-join of
16-byte md5 keys (the exact-dedup identity convention — digests are
already trusted as content identity in ``dedup.exact_dedup``), and a
parameter-cardinality aggregation with map-side partials.  Nothing
wider than (url, digest) ever shuffles, and the verdict table is
parameter-cardinality (thousands), broadcastable back onto a frontier
of any size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: join-key separator between url and digest (neither contains \x1f)
_SEP = "\x1f"


def strip_param_col(base: Column, parts: Column, param: Column) -> Column:
    """URL with every ``param=...`` pair removed from its query string
    (query-less result drops the '?'); order of surviving pairs is
    preserved, so the rebuild string-matches how the alias URL itself
    would have been seen."""
    rest = F.filter(
        parts, lambda kv: F.split_part(kv, F.lit("="), F.lit(1))
        != param)
    return F.when(F.size(rest) == 0, base).otherwise(
        F.concat(base, F.lit("?"), F.array_join(rest, "&")))


def insignificant_params(pages: DataFrame, url_col: str = "url",
                         digest_col: str = "digest",
                         min_support: int = 2, ratio_num: int = 1,
                         ratio_den: int = 2) -> DataFrame:
    """Mine per-parameter insignificance verdicts from (url, digest)
    observations.

    Output: ``(param, n_urls, n_matched, insignificant)`` — one row
    per query-parameter name seen on at least ``min_support`` distinct
    (url, digest) observations; ``n_matched`` counts observations
    whose ``p``-stripped URL was ALSO observed with the same digest,
    and ``insignificant`` is the integer ratio test
    ``n_matched·ratio_den >= n_urls·ratio_num`` (no float boundary).

    The match is evidence-based, not semantic: a parameter that never
    changes content still reads significant if the crawl never fetched
    the stripped variant (no witness) — exactly the paper's
    support-validation behavior, and why the ratio is a parameter."""
    pairs = (pages
             .filter(F.col(url_col).isNotNull()
                     & F.col(digest_col).isNotNull())
             .select(F.col(url_col).alias("url"),
                     F.col(digest_col).alias("digest"))
             .distinct())
    base = F.substring_index("url", "?", 1)
    query = F.substring_index("url", "?", -1)
    with_q = (pairs.filter(F.instr(F.col("url"), "?") > 0)
              .select("url", "digest", base.alias("base"),
                      F.split(query, "&").alias("parts")))
    # one observation per (url, digest, param NAME): duplicate names
    # in one query string (a=1&a=2) vote once and strip together
    probe = with_q.select(
        "digest", "base", "parts",
        F.explode(F.array_distinct(F.transform(
            F.col("parts"),
            lambda kv: F.split_part(kv, F.lit("="), F.lit(1)))))
        .alias("param"))
    stripped = strip_param_col(F.col("base"), F.col("parts"),
                               F.col("param"))
    # 16-byte identity keys so the witness join never exchanges URLs
    # twice — md5-as-identity is the module-wide exact-dedup convention
    witness = (pairs.select(
        F.md5(F.concat_ws(_SEP, "url", "digest")).alias("k"))
        .distinct().withColumn("_hit", F.lit(True)))
    flagged = (probe.select(
        "param",
        F.md5(F.concat_ws(_SEP, stripped, F.col("digest"))).alias("k"))
        .join(witness, "k", "left"))
    counted = (flagged.groupBy("param").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum(F.when(F.col("_hit"), 1).otherwise(0))
        .alias("n_matched")))
    return (counted.filter(F.col("n_urls") >= min_support)
            .select("param",
                    F.col("n_urls").cast("long").alias("n_urls"),
                    F.col("n_matched").cast("long").alias("n_matched"),
                    (F.col("n_matched") * F.lit(ratio_den)
                     >= F.col("n_urls") * F.lit(ratio_num))
                    .alias("insignificant")))


def collapse_aliases(frontier: DataFrame, verdicts: DataFrame,
                     url_col: str = "url") -> DataFrame:
    """Apply mined verdicts to a frontier: remove every parameter the
    verdict table marks insignificant from ``frontier[url_col]``
    (adding a ``canonical_url`` column), so alias URLs dedup under the
    existing URL-seen machinery.

    The verdict table is parameter-cardinality and BROADCAST; the
    rewrite is a pure projection over the frontier — zero shuffles,
    any frontier size."""
    drop = (verdicts.filter(F.col("insignificant"))
            .agg(F.array_sort(F.collect_set("param")).alias("drop")))
    base = F.substring_index(url_col, "?", 1)
    query = F.substring_index(url_col, "?", -1)
    parts = F.split(query, "&")
    rest = F.filter(
        parts, lambda kv: ~F.array_contains(
            F.col("_drop"), F.split_part(kv, F.lit("="), F.lit(1))))
    rewritten = F.when(
        F.instr(F.col(url_col), "?") == 0, F.col(url_col)).otherwise(
        F.when(F.size(rest) == 0, base).otherwise(
            F.concat(base, F.lit("?"), F.array_join(rest, "&"))))
    return (frontier
            .crossJoin(F.broadcast(drop.select(F.col("drop")
                                               .alias("_drop"))))
            .withColumn("canonical_url", rewritten)
            .drop("_drop"))
