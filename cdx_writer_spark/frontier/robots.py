"""robots.txt: RFC 9309 parser + longest-match-wins rule matcher.

The north rule calls for "robots.txt rule caches broadcast to
executors".  ``politeness.apply_robots`` keeps the simple
single-prefix-per-host dimension model; this module is the full REP
(Robots Exclusion Protocol) surface:

* :func:`parse_robots` — pure-Python RFC 9309 parser (groups of
  ``User-agent`` lines followed by ``Allow``/``Disallow``/
  ``Crawl-delay`` rules; comments and unknown fields per spec).
  Group selection: the crawler's product token must match a group's
  user-agent token EXACTLY (case-insensitive); ``*`` matches all at
  lower specificity; all groups carrying the winning token merge and
  the max declared crawl-delay wins (RFC 9309 §2.2.1).
* :func:`compile_robots` — the per-host robots corpus (tiny: one text
  per fetched robots.txt) parsed in one Arrow batch pass into a
  broadcastable rules table: LIKE-compiled allow/disallow pattern
  lists + a crawl-delay-derived per-round budget.
* :func:`apply_robots_rep` — the matcher as PURE Catalyst expressions
  over the candidates (broadcast hash join, zero shuffle, zero
  Python): RFC longest-match-wins — the matching rule with the
  longest path (octet length of the rule text) decides; an allow and
  disallow of equal length → allow wins (§2.2.2).  ``*`` wildcards
  and the ``$`` end anchor (both MUST-support per §2.2.3) compile to
  SQL LIKE patterns (linear-time match, no per-row regex compile),
  with ``%``/``_``/``\\`` in rule text escaped.

Percent-encoding normalization (RFC 9309 §2.2.2): both sides of the
match are canonicalized before comparison — every valid ``%XX``
triplet percent-decodes to its octet EXCEPT ``%2F``, which stays the
literal string ``%2F`` (an encoded slash must remain distinct from
the path separator).  Rules normalize once per host in Python at
compile time (wildcard ``*`` and the ``$`` anchor are identified in
the RAW rule text first, so a decoded ``%2A`` is a literal asterisk,
never a wildcard); candidate paths normalize natively
(``try_url_decode`` with ``+`` and ``%2f`` protected — ``+`` is a
literal plus in a path, not a space).  So a rule ``/a%20b`` matches
the candidate ``/a b`` and vice versa.  A path whose decode fails
(malformed triplet, invalid UTF-8) falls back to its raw bytes on the
candidate side while Python decodes the valid triplets around it —
the one documented asymmetry, confined to malformed inputs.

Scale: parsing touches one row per HOST (the robots corpus), never
per candidate; the compiled rules broadcast like any small dimension,
and the per-candidate decision is a whole-stage-codegen expression —
the candidates side never shuffles and never enters Python.
"""

from __future__ import annotations

import math
import re
import urllib.parse

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, DoubleType, IntegerType,
                               StringType, StructField, StructType)

from ..functions.dedup import bind_once
from .politeness import DEFAULT_BUDGET, url_path_col

# Budget derivation: a crawl round models ~ROUND_SECONDS of per-host
# wall clock; Crawl-delay d caps the host at ROUND_SECONDS/d fetches
# per round (floor, min 1).  Hosts without a delay get DEFAULT_BUDGET.
ROUND_SECONDS = 60

_RULE_FIELDS = ("allow", "disallow", "crawl-delay")


def parse_robots(text: str, agent: str = "*"):
    """Parse robots.txt text for ``agent``; returns
    ``(allow_rules, disallow_rules, crawl_delay)`` with rules as raw
    path strings (empty-value rules dropped per RFC — ``Disallow:``
    with no value means allow-all)."""
    agent_l = agent.lower()
    groups = []  # (ua_tokens, allows, disallows, delay)
    cur_uas: list[str] = []
    cur: tuple | None = None
    in_header = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_header:
                cur_uas, cur, in_header = [], None, True
            cur_uas.append(value.lower())
            continue
        if field in _RULE_FIELDS:
            in_header = False
            if cur is None:
                if not cur_uas:
                    continue  # rules before any user-agent line: ignored
                cur = (cur_uas, [], [], [None])
                groups.append(cur)
            if field == "allow" and value:
                cur[1].append(value)
            elif field == "disallow" and value:
                cur[2].append(value)
            elif field == "crawl-delay":
                try:
                    cur[3][0] = float(value)
                except ValueError:
                    pass
        # unknown fields (sitemap, host, ...) are ignored per RFC

    # group selection (RFC 9309 §2.2.1): the crawler's PRODUCT TOKEN
    # (the part before '/') must match a group's user-agent token
    # EXACTLY, case-insensitively; '*' matches everything at lower
    # specificity.  Substring/prefix matching is deliberately NOT done
    # — a group for an unrelated crawler named 'bot' must not capture
    # 'cdxbot'.  Duplicate groups carrying the winning token merge;
    # when several declare a crawl-delay the MAX wins (deterministic
    # and the politest interpretation).
    product = agent_l.split("/", 1)[0].strip()

    def specificity(uas):
        if product and product in uas:
            return 1
        if "*" in uas:
            return 0
        return -1

    scored = [(specificity(g[0]), g) for g in groups]
    best = max((s for s, _ in scored), default=-1)
    allow: list[str] = []
    disallow: list[str] = []
    delay = None
    if best >= 0:
        for s, g in scored:
            if s == best:
                allow += g[1]
                disallow += g[2]
                if g[3][0] is not None:
                    delay = (g[3][0] if delay is None
                             else max(delay, g[3][0]))
    return allow, disallow, delay


# the transient stand-in for '%2F' while the rest of the string
# percent-decodes; \x01 cannot appear in a sane URL path, and a
# *decoded* %01 colliding with it is pathological enough to document
# rather than defend (it would read back as a literal '%2F')
_SLASH_SENTINEL = "\x01"
# same trick for literal '+': url_decode treats '+' as an encoded
# space, so it is swapped out before the decode and restored after —
# on BOTH the success and the malformed-fallback branch, keeping the
# fallback genuinely the raw bytes (a decoded %02 colliding with the
# sentinel is the same documented pathology as %01 above)
_PLUS_SENTINEL = "\x02"
_PCT_2F = re.compile("%2f", re.IGNORECASE)


def normalize_rule_path(segment: str) -> str:
    """RFC 9309 §2.2.2 canonical form of a literal rule segment:
    percent-decode every valid ``%XX`` triplet except ``%2F`` (kept as
    the uppercase literal ``%2F`` so an encoded slash stays distinct
    from the separator); malformed triplets pass through raw.  Mirrors
    the native candidate-side pipeline in :func:`normalize_path_col`
    step for step."""
    protected = _PCT_2F.sub(_SLASH_SENTINEL, segment)
    decoded = urllib.parse.unquote(protected, errors="replace")
    # mirror the candidate side's sentinel restores EXACTLY, including
    # the documented pathological collisions: a literal %01 reads back
    # as '%2F' and a literal %02 as '+' on BOTH sides, so rule and
    # candidate normal forms can never diverge on any input
    return (decoded.replace(_SLASH_SENTINEL, "%2F")
            .replace(_PLUS_SENTINEL, "+"))


def normalize_path_col(path):
    """The same canonicalization as :func:`normalize_rule_path`, as
    pure Catalyst expressions over a candidate path column (zero
    Python): protect literal ``+`` (a plus in a path is NOT a space)
    and ``%2f`` with sentinels, ``try_url_decode``, restore both.  A
    malformed path (bad triplet) decodes to NULL and falls back to its
    raw (case-normalized-``%2F``) bytes — the sentinels are restored
    on that branch too, so the fallback really is the raw path (a
    rule ``/a+b%`` matches candidate ``/a+b%``)."""
    p = F.replace(path, F.lit("+"), F.lit(_PLUS_SENTINEL))
    p = F.regexp_replace(p, "(?i)%2f", _SLASH_SENTINEL)
    p = F.coalesce(F.try_url_decode(p), p)
    p = F.replace(p, F.lit(_SLASH_SENTINEL), F.lit("%2F"))
    return F.replace(p, F.lit(_PLUS_SENTINEL), F.lit("+"))


def rule_to_like(rule: str) -> str:
    """A robots path rule as a SQL LIKE pattern (escape char ``\\``):
    ``*`` → ``%``; a trailing ``$`` anchors the match (no trailing
    ``%``); literal segments percent-normalized per RFC 9309 §2.2.2
    (wildcards and the anchor are recognized in the RAW text BEFORE
    decoding, so ``%2A``/``%24`` decode to literal ``*``/``$``);
    literal ``%``/``_``/``\\`` escaped after normalization."""
    anchored = rule.endswith("$")
    body = rule[:-1] if anchored else rule
    out = []
    for i, seg in enumerate(body.split("*")):
        if i:
            out.append("%")
        for ch in normalize_rule_path(seg):
            if ch in ("%", "_", "\\"):
                out.append("\\" + ch)
            else:
                out.append(ch)
    pat = "".join(out)
    return pat if anchored else pat + "%"


def rule_norm_len(rule: str) -> int:
    """Longest-match metric for a rule: octet length of its NORMALIZED
    text (decoded triplets count their decoded octets, so ``/a%20b``
    and ``/a b`` rank equally; the ``$`` anchor keeps its octet as
    before normalization existed)."""
    anchored = rule.endswith("$")
    body = rule[:-1] if anchored else rule
    norm = "*".join(normalize_rule_path(s) for s in body.split("*"))
    return len(norm.encode("utf-8")) + (1 if anchored else 0)


_RULES_SCHEMA = StructType([
    StructField("host", StringType()),
    StructField("allow", ArrayType(StructType([
        StructField("pat", StringType()),
        StructField("rlen", IntegerType())]))),
    StructField("disallow", ArrayType(StructType([
        StructField("pat", StringType()),
        StructField("rlen", IntegerType())]))),
    StructField("crawl_delay", DoubleType()),
    StructField("budget_per_round", IntegerType()),
])


def compile_robots(corpus: DataFrame, agent: str = "*",
                   default_budget: int = DEFAULT_BUDGET,
                   round_seconds: int = ROUND_SECONDS) -> DataFrame:
    """``corpus`` (host, robots_txt) -> broadcastable rules table
    (host, allow, disallow, crawl_delay, budget_per_round).  One Arrow
    pass over the per-host corpus; rule lengths are the RAW rule-path
    lengths (the RFC's longest-match metric), patterns are
    LIKE-compiled once here so the matcher never string-processes."""

    def compile_batch(it):
        for pdf in it:
            rows = {"host": [], "allow": [], "disallow": [],
                    "crawl_delay": [], "budget_per_round": []}
            for host, txt in zip(pdf["host"], pdf["robots_txt"]):
                al, dis, delay = parse_robots(txt or "", agent)
                rows["host"].append(host)
                rows["allow"].append(
                    [(rule_to_like(r), rule_norm_len(r)) for r in al])
                rows["disallow"].append(
                    [(rule_to_like(r), rule_norm_len(r)) for r in dis])
                rows["crawl_delay"].append(delay)
                # robots.txt is untrusted input: a zero / negative /
                # non-finite Crawl-delay must not blow up the budget
                # (60 // 1e-9 overflows IntegerType and kills the whole
                # Arrow batch).  Invalid delays fall back to the
                # default budget; valid delays resolve at 1ms — a
                # sub-millisecond Crawl-delay is indistinguishable from
                # none, and the cap keeps the budget in int32 range.
                if delay is None or not (delay > 0 and math.isfinite(delay)):
                    budget = default_budget
                else:
                    # cap BEFORE int(): a subnormal delay (1e-310) makes
                    # round_seconds / delay overflow to float inf, and
                    # int(inf) raises — min() against the finite cap
                    # first keeps the conversion safe for any positive
                    # finite delay
                    budget = int(max(1.0, min(float(round_seconds * 1000),
                                              round_seconds / delay)))
                rows["budget_per_round"].append(budget)
            yield pd.DataFrame(rows)

    return corpus.select("host", "robots_txt").mapInPandas(
        compile_batch, schema=_RULES_SCHEMA)


def _match_len(path, rules):
    """Longest matching rule length (octets of the raw rule), -1 when
    nothing matches — pure Catalyst (LIKE inside the HOF lambda)."""
    return F.coalesce(
        F.array_max(F.transform(
            F.filter(rules,
                     lambda r: F.call_function(
                         "like", path, r["pat"], F.lit("\\"))),
            lambda r: r["rlen"])),
        F.lit(-1))


def apply_robots_rep(candidates: DataFrame, rules: DataFrame,
                     default_budget: int = DEFAULT_BUDGET) -> DataFrame:
    """Candidates minus REP-disallowed URLs, plus ``budget_per_round``.

    Broadcast hash join on host; the longest-match decision is a
    codegen expression (ties → allow, per RFC 9309 §2.2.2; hosts with
    no robots row are allowed with the default budget).  The URL path
    is bound ONCE per row (``bind_once``) so the LIKE lambda never
    re-derives it per rule."""
    r = F.broadcast(rules.select("host", "allow", "disallow",
                                 "budget_per_round"))
    joined = candidates.join(r, "host", "left")
    # nested bind_once: path AND the disallow match-length are each
    # evaluated exactly once per row (a bound variable cannot be
    # re-inlined into the LIKE lambdas — see dedup.bind_once)
    # an empty path (bare "http://host") normalizes to "/" before
    # matching, as crawlers (and urllib.robotparser) do; the path is
    # then percent-normalized (RFC 9309 §2.2.2) to mirror the rules'
    # compile-time normalization
    raw_path = url_path_col(F.col("url"))
    allowed = F.col("allow").isNull() | bind_once(
        normalize_path_col(
            F.coalesce(F.nullif(raw_path, F.lit("")), F.lit("/"))),
        lambda path: bind_once(
            _match_len(path, F.col("disallow")),
            lambda d: (d == -1)                      # nothing disallows
            | (_match_len(path, F.col("allow")) >= d)))  # allow wins ties
    return (
        joined.filter(allowed)
        .withColumn("budget_per_round",
                    F.coalesce(F.col("budget_per_round"),
                               F.lit(default_budget)))
        .drop("allow", "disallow")
    )
