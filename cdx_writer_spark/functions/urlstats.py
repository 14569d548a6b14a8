"""Host / URL metadata operators.

:func:`registrable_domain` — pay-level-domain (eTLD+1) extraction by
longest-suffix match against a public-suffix-style rule table: the
grouping key every per-site crawl policy (politeness budgets, host
quotas, webgraph rollups) actually wants, since ``a.example.co.uk``
and ``b.example.co.uk`` are one site while ``example1.github.io`` and
``example2.github.io`` are two.

Algorithm (a deterministic subset of the Public Suffix List
algorithm): a host's candidate suffixes are its last ``k`` labels for
``k = 1 .. n_labels-1``; the longest candidate present in the rule
table is the public suffix, and the registrable domain is that suffix
plus the one label before it.  Wildcard (``*``) and exception (``!``)
PSL rules are NOT implemented — explicit suffixes only (documented
subset; the rule-table shape is the same, so a full PSL snapshot
drops in as data).

Scale shape: the rule table is a few thousand rows → broadcast join;
candidate generation is a ``posexplode`` over at most ``n_labels-1``
narrow (host, k, candidate) rows per DISTINCT host — dedupe hosts
first and join the result back, so a 10^10-page corpus with 10^7
hosts pays the explode 10^7 times, not 10^10.  The longest-match
reduction is one ``max(struct(k, ...))`` aggregation (map-side
partial combine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# A deterministic public-suffix-style rule list (PSL semantics at toy
# scale): generic TLDs, ccTLDs, second-level country suffixes, and two
# private-registry entries that must beat their parent TLD on length.
DEFAULT_SUFFIXES: tuple[str, ...] = (
    "com", "net", "org", "edu", "gov", "io", "de", "fr", "jp", "uk",
    "au", "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au",
    "co.jp", "github.io", "blogspot.com",
)


def registrable_domain(hosts: DataFrame, host_col: str = "host",
                       suffixes: tuple[str, ...] = DEFAULT_SUFFIXES,
                       ) -> DataFrame:
    """Per distinct host: ``(host, public_suffix,
    registrable_domain)``.  Hosts whose every candidate misses the
    rule table (unknown TLD, dotless names) yield NULL suffix and
    domain — the caller's policy decides whether to treat the raw
    host as its own site.  Candidates never consume the whole host,
    so a host exactly equal to a rule matches only via its own
    proper-suffix rules (if any) — full PSL same-host semantics are
    out of this subset's scope.

    Join the result back to the page table on ``host`` — never run
    the explode over the page rows themselves (module docstring)."""
    spark = hosts.sparkSession
    rules = spark.createDataFrame(
        [(s, s.count(".") + 1) for s in sorted(set(suffixes))],
        "suffix string, rk int")
    max_k = max(s.count(".") + 1 for s in suffixes)

    h = (hosts.select(F.lower(F.col(host_col)).alias("host"))
         .distinct()
         .withColumn("_parts", F.split(F.regexp_replace(
             F.col("host"), r"\.$", ""), r"\.")))
    # candidate k never consumes the whole host (a registrable domain
    # needs >=1 label before the suffix); a single-label host gets no
    # candidates at all — guard the sequence, which would otherwise
    # DESCEND for stop < start
    n_cand = F.least(F.lit(max_k), F.size("_parts") - 1)
    cand = h.select(
        "host", "_parts",
        F.explode(F.when(n_cand >= 1, F.sequence(F.lit(1), n_cand))
                  .otherwise(F.array().cast("array<int>"))).alias("k"),
    ).withColumn("cand", F.array_join(
        F.slice("_parts", F.col("k") * -1, F.col("k")), "."))
    hit = cand.join(F.broadcast(rules),
                    (F.col("cand") == F.col("suffix"))
                    & (F.col("k") == F.col("rk")))
    best = (hit.groupBy("host")
            .agg(F.max(F.struct(F.col("k"), "suffix",
                                F.array_join(
                                    F.slice("_parts",
                                            (F.col("k") + 1) * -1,
                                            F.col("k") + 1), ".")
                                .alias("dom"))).alias("b")))
    return (h.select("host")
            .join(best, "host", "left")
            .select("host",
                    F.col("b.suffix").alias("public_suffix"),
                    F.col("b.dom").alias("registrable_domain")))
