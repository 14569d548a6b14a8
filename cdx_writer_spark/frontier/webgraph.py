"""Deterministic synthetic web graph — the sandbox stand-in for the
live web (and for the Common-Crawl-style Iceberg pages table at scale).

Every page, outlink and robots rule is a pure native-Column function of
``doc_id``, so crawls are byte-reproducible across runs, partitionings
and parallelism levels (the north-rule two-cluster-size determinism
gate), and the whole graph stays JVM-side (no Python, no RNG state).

Graph shape: N pages over ``N_HOSTS`` hosts with a skewed host
distribution (host = doc_id % N_HOSTS, so host 0 is no hotter than
host 36 — skew instead comes from the *link* function: a fraction of
links point at the low-doc_id "hub" pages, which concentrates frontier
candidates on a few hosts, the crawl-hot-host skew the north star
calls out).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

N_HOSTS = 37
LINKS_PER_PAGE = 4


def host_idx_col(d: Column, n_hosts: int,
                 skew: float | None = None) -> Column:
    """Host index for a page.  ``skew=None`` (default) is the uniform
    ``doc_id % n_hosts`` every oracle replicates.  A float turns on a
    DETERMINISTIC Zipf-like assignment (the real web's hot-host
    distribution): a 20-bit hash of doc_id becomes u ∈ (0,1) and the
    index is the log-uniform inverse CDF ``floor(n_hosts^(u^skew))-1``
    — P(host h) ≈ 1/(h+1) at skew=1 (Zipf s≈1), heavier heads for
    skew>1 (skew=1.1 puts ~8% of a 20k-host web on host 0).  Pure
    Column arithmetic of doc_id (hash → pow → floor), so skewed crawls
    stay byte-reproducible at any parallelism."""
    if skew is None:
        return d % n_hosts
    u = (F.pmod(F.xxhash64(d.cast("long")), F.lit(1 << 20))
         .cast("double") + F.lit(0.5)) / F.lit(float(1 << 20))
    idx = F.floor(F.pow(F.lit(float(n_hosts)),
                        F.pow(u, F.lit(float(skew))))) - 1
    return F.least(idx, F.lit(n_hosts - 1)).cast("long")


def host_col(d: Column, n_hosts: int = N_HOSTS,
             skew: float | None = None) -> Column:
    return F.concat(F.lit("site"),
                    host_idx_col(d, n_hosts, skew).cast("string"),
                    F.lit(".example.com"))


def url_col(d: Column, n_hosts: int = N_HOSTS,
            skew: float | None = None) -> Column:
    return F.concat(F.lit("http://"), host_col(d, n_hosts, skew),
                    F.lit("/p/"), d.cast("string"))


def surt_col(d: Column, n_hosts: int = N_HOSTS,
             skew: float | None = None) -> Column:
    """SURT key of url_col, derived from doc_id (hosts here are simple
    3-label lowercase names, so the SURT is a pure string build —
    byte-identical to canonicalize.surt_key on the same URL, which
    tests assert)."""
    return F.concat(
        F.lit("com,example,site"),
        host_idx_col(d, n_hosts, skew).cast("string"),
        F.lit(")/p/"), d.cast("string"))


def outlink_ids_col(d: Column, n_pages: int) -> Column:
    """LINKS_PER_PAGE deterministic outlinks: 2 'random' far links, one
    hub link (mod 97 concentrates on low ids -> hot hosts), one
    same-host neighbor."""
    return F.array(
        (d * 7 + 1) % n_pages,
        (d * 13 + 5) % n_pages,
        (d * 31 + 3) % 97 % n_pages,        # hub concentration
        (d + N_HOSTS) % n_pages,            # same-host neighbor
    )


def host_rank_col(d: Column, n_hosts: int = N_HOSTS,
                  skew: float | None = None) -> Column:
    """Static per-host quality score in (0, 1]: rank(host h) =
    1/(1+h) — higher for low host indices (the 'hubs')."""
    return F.lit(1.0) / (F.lit(1.0)
                         + host_idx_col(d, n_hosts, skew)
                         .cast("double"))


def pages(spark: SparkSession, n_pages: int,
          n_partitions: int = 8, n_hosts: int = N_HOSTS,
          host_skew: float | None = None) -> DataFrame:
    """The crawlable web: (doc_id, url, surt_key, host, host_rank,
    outlinks array<string>).  At 100 TB this is the Iceberg pages scan;
    here it's a range + native projections.  ``host_skew`` switches
    the uniform host layout to the deterministic Zipf-like one (see
    :func:`host_idx_col`) — the skew-stress configuration the salted
    schedule tournament is evidenced under."""
    d = F.col("id")
    return (
        spark.range(0, n_pages, 1, n_partitions)
        .select(
            d.alias("doc_id"),
            url_col(d, n_hosts, host_skew).alias("url"),
            surt_col(d, n_hosts, host_skew).alias("surt_key"),
            host_col(d, n_hosts, host_skew).alias("host"),
            host_rank_col(d, n_hosts, host_skew).alias("host_rank"),
            F.transform(outlink_ids_col(d, n_pages),
                        lambda l: url_col(l, n_hosts, host_skew))
            .alias("outlinks"),
            F.transform(outlink_ids_col(d, n_pages),
                        lambda l: surt_col(l, n_hosts, host_skew))
            .alias("outlink_surts"),
        )
    )


def robots_rules(spark: SparkSession,
                 n_hosts: int = N_HOSTS) -> DataFrame:
    """Synthetic robots.txt corpus: every 5th host disallows /p/1* paths,
    every 7th host sets a lower per-round fetch budget (crawl-delay
    equivalent).  Tiny dimension table — broadcast to executors."""
    h = F.col("id")
    return (
        spark.range(0, n_hosts)
        .select(
            F.concat(F.lit("site"), h.cast("string"),
                     F.lit(".example.com")).alias("host"),
            F.when(h % 5 == 0, F.lit("/p/1")).alias("disallow_prefix"),
            F.when(h % 7 == 0, F.lit(2)).otherwise(F.lit(8))
            .cast("int").alias("budget_per_round"),
        )
    )


def seeds(spark: SparkSession, n_seeds: int, n_pages: int,
          n_hosts: int = N_HOSTS,
          host_skew: float | None = None) -> DataFrame:
    """Seed frontier: the first `n_seeds` pages at depth 0."""
    d = F.col("id")
    return (
        spark.range(0, min(n_seeds, n_pages))
        .select(
            surt_col(d, n_hosts, host_skew).alias("surt_key"),
            url_col(d, n_hosts, host_skew).alias("url"),
            host_col(d, n_hosts, host_skew).alias("host"),
            host_rank_col(d, n_hosts, host_skew).alias("host_rank"),
            F.lit(0).alias("depth"),
            F.lit(0).alias("discovered_round"),
            F.lit("pending").alias("state"),
        )
    )
