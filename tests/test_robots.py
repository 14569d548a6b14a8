"""RFC 9309 robots.txt parser + longest-match matcher gates.

Layers:

* pure-Python parser unit tests (group merging, most-specific UA
  selection, comments/blank lines/case, empty-value rules,
  crawl-delay, unknown fields);
* equivalence against the stdlib ``urllib.robotparser`` on
  disallow-only corpora — the one regime where Python's
  first-match-in-order semantics coincide with RFC longest-match
  (every match is a disallow, so "any match" == "longest match");
* matcher semantics end-to-end through Spark: longest-match-wins,
  allow/disallow ties → allow, ``*`` wildcards, ``$`` anchors,
  literal ``%``/``_`` escaping, no-robots-row default;
* plan shape: broadcast join, zero Python nodes in the decision.
"""

from __future__ import annotations

import urllib.robotparser

from pyspark.sql import functions as F

from cdx_writer_spark.frontier.robots import (
    apply_robots_rep,
    compile_robots,
    parse_robots,
    rule_to_like,
)

RFC_TXT = """
# comment line
User-agent: examplebot
Disallow: /private/
Allow: /private/public
Crawl-delay: 2

User-agent: *
Disallow: /tmp*
Disallow: /exact$

User-Agent: ExampleBot
DISALLOW: /also-private/
"""


def test_parser_groups_and_specificity():
    al, dis, delay = parse_robots(RFC_TXT, agent="examplebot/1.2")
    # both examplebot groups merge; the * group is out-specificized
    assert al == ["/private/public"]
    assert sorted(dis) == ["/also-private/", "/private/"]
    assert delay == 2.0
    al, dis, delay = parse_robots(RFC_TXT, agent="otherbot")
    assert al == [] and sorted(dis) == ["/exact$", "/tmp*"]
    assert delay is None


def test_parser_edge_cases():
    # empty-value Disallow means allow-all (rule dropped)
    al, dis, _ = parse_robots("User-agent: *\nDisallow:\n")
    assert (al, dis) == ([], [])
    # rules before any user-agent line are ignored
    al, dis, _ = parse_robots("Disallow: /x\nUser-agent: *\nDisallow: /y\n")
    assert dis == ["/y"]
    # consecutive UA lines share one group; a UA line after rules
    # starts a NEW group
    txt = ("User-agent: a\nUser-agent: b\nDisallow: /ab\n"
           "User-agent: b\nDisallow: /b2\n")
    _, dis, _ = parse_robots(txt, agent="b")
    assert sorted(dis) == ["/ab", "/b2"]
    # unknown fields + junk delay ignored
    al, dis, delay = parse_robots(
        "User-agent: *\nSitemap: http://x/s.xml\nCrawl-delay: soon\n"
        "Disallow: /q\n")
    assert dis == ["/q"] and delay is None
    # no matching group at all
    assert parse_robots("User-agent: onlybot\nDisallow: /\n",
                        agent="me") == ([], [], None)


def test_rule_to_like():
    assert rule_to_like("/a") == "/a%"
    assert rule_to_like("/a*b") == "/a%b%"
    assert rule_to_like("/a$") == "/a"
    assert rule_to_like("/a*b$") == "/a%b"
    assert rule_to_like("/100%_x") == "/100\\%\\_x%"


def test_disallow_only_equivalence_with_stdlib():
    """On disallow-only rule sets RFC longest-match and stdlib
    first-match agree; sweep a deterministic corpus of rules/paths."""
    rules = ["/a", "/a/b", "/c*d", "/e$", "/f/", "/", "/g*"]
    paths = ["/a", "/a/b/c", "/ab", "/c/x/d", "/cd", "/e", "/e/f",
             "/f/", "/f", "/x", "/g/h", "", "/c/d/e"]
    txt = "User-agent: *\n" + "".join(f"Disallow: {r}\n" for r in rules)
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(txt.splitlines())
    al, dis, _ = parse_robots(txt)
    assert al == [] and dis == rules
    import re as _re

    def like_match(pat, s):
        rx = "^" + "".join(
            ".*" if c == "%" else _re.escape(c)
            for c in _re.sub(r"\\(.)", r"\1", pat)) + ("$" if not
                                                         pat.endswith("%")
                                                         else "")
        return _re.match(rx, s) is not None

    for p in paths:
        norm = p or "/"  # empty path normalizes to "/" (matcher does too)
        ours = not any(like_match(rule_to_like(r), norm) for r in dis)
        theirs = rp.can_fetch("bot", "http://h" + p)
        assert ours == theirs, (p, ours, theirs)


def _decide(spark, robots_txt, paths, agent="cdxbot"):
    corpus = spark.createDataFrame([("h", robots_txt)],
                                   "host string, robots_txt string")
    rules = compile_robots(corpus, agent=agent)
    cand = spark.createDataFrame(
        [("h", "http://h" + p, p) for p in paths],
        "host string, url string, path string")
    out = apply_robots_rep(cand, rules)
    kept = {r["path"] for r in out.select("path").collect()}
    return kept


def test_matcher_longest_match_and_ties(spark):
    txt = ("User-agent: *\n"
           "Disallow: /p/\n"
           "Allow: /p/ok\n"       # longer than /p/ -> allows /p/ok*
           "Disallow: /p/okx\n")  # longer still -> beats the allow
    kept = _decide(spark, txt, ["/p/a", "/p/ok", "/p/ok2", "/p/okx",
                                "/q", "/p/okxy"])
    assert kept == {"/p/ok", "/p/ok2", "/q"}
    # equal-length allow and disallow -> allow wins (RFC 9309 §2.2.2)
    kept = _decide(spark, "User-agent: *\nDisallow: /t1\nAllow: /t2\n",
                   ["/t1", "/t2"])
    assert kept == {"/t2"}
    kept = _decide(spark, "User-agent: *\nDisallow: /tie\nAllow: /tie\n",
                   ["/tie/x"])
    assert kept == {"/tie/x"}


def test_matcher_wildcards_anchors_and_defaults(spark):
    txt = ("User-agent: *\n"
           "Disallow: /w*z\n"
           "Disallow: /end$\n"
           "Disallow: /100%\n")
    kept = _decide(spark, txt, ["/w/y/z", "/wz", "/w", "/end", "/end/x",
                                "/100%x", "/100x"])
    assert kept == {"/w", "/end/x", "/100x"}
    # host with no robots row: allowed, default budget
    corpus = spark.createDataFrame([("other", "User-agent: *\nDisallow: /\n")],
                                   "host string, robots_txt string")
    cand = spark.createDataFrame([("h", "http://h/x")],
                                 "host string, url string")
    out = apply_robots_rep(cand, compile_robots(corpus)).collect()
    assert len(out) == 1 and out[0]["budget_per_round"] == 8


def test_percent_encoding_normalization(spark):
    """RFC 9309 §2.2.2: rule and candidate paths compare in percent-
    normalized form — an encoded rule matches a raw candidate and vice
    versa; %2F stays distinct from the path separator; + is a literal
    plus; %2A decodes to a literal asterisk, never a wildcard."""
    txt = ("User-agent: *\n"
           "Disallow: /a%20b\n"      # encoded rule vs raw candidate
           "Disallow: /c d\n"        # raw rule vs encoded candidate
           "Disallow: /e+f\n"        # literal plus both sides
           "Disallow: /g%2Fh\n"      # encoded slash stays literal
           "Disallow: /i%2Aj\n")     # %2A = literal '*', NOT a wildcard
    kept = _decide(spark, txt, [
        "/a b", "/a%20b", "/a_b",
        "/c%20d", "/c d",
        "/e+f", "/e%2Bf", "/e f",
        "/g%2fh", "/g/h",
        "/i*j", "/i%2Aj", "/iXXXj",
    ])
    assert kept == {"/a_b", "/e f", "/g/h", "/iXXXj"}
    # normalized lengths rank fairly: the encoded allow (/p%20q/x, 7
    # normalized octets) out-ranks the raw disallow (/p q/, 5 octets)
    txt2 = ("User-agent: *\n"
            "Disallow: /p q/\n"
            "Allow: /p%20q/x\n")
    kept2 = _decide(spark, txt2, ["/p q/y", "/p%20q/x1", "/p q/x2"])
    assert kept2 == {"/p%20q/x1", "/p q/x2"}


def test_rule_and_candidate_normalization_agree_bytewise(spark):
    """The rule side normalizes in Python (unquote) and the candidate
    side in Catalyst (try_url_decode) — the matcher is only correct if
    the two normal forms are IDENTICAL on every input, including
    invalid-UTF-8 triplets (both sides must pick the same U+FFFD
    replacement), malformed escapes (both fall back to raw), and the
    documented %01/%02 sentinel pathologies."""
    from cdx_writer_spark.frontier.robots import (
        normalize_path_col, normalize_rule_path)

    paths = [
        "/a%20b", "/a b", "/a+b", "/a%2Bb",
        "/caf%E9",            # valid triplet, invalid UTF-8
        "/x%E9%A0y",          # truncated multi-byte run mid-string
        "/%FF%FE",            # two invalid bytes
        "/emoji%F0%9F%98%80",  # valid 4-byte UTF-8
        "/a%2Fb", "/%2f%2F",  # encoded slashes stay literal
        "/%2A%24",            # encoded wildcard/anchor chars
        "/a+b%", "/100%", "/%zz", "/%",  # malformed escapes
        "/%01%02",            # sentinel collisions (documented)
        "/q %", "/", "",
    ]
    df = spark.createDataFrame([(p,) for p in paths], "p string")
    got = {r.p: r.n for r in
           df.select("p", normalize_path_col(F.col("p")).alias("n"))
           .collect()}
    for p in paths:
        assert got[p] == normalize_rule_path(p), (
            p, got[p], normalize_rule_path(p))


def test_malformed_candidate_fallback_is_truly_raw(spark):
    """A candidate path whose decode fails (trailing lone '%') falls
    back to its RAW bytes — the '+'-protection sentinel must be
    restored on that branch too, or a rule spelled exactly like the
    candidate stops matching it."""
    txt = ("User-agent: *\n"
           "Disallow: /a+b%\n"       # matches its own literal path
           "Disallow: /q %\n")       # raw space + lone % both sides
    kept = _decide(spark, txt, ["/a+b%", "/a+b%20", "/q %", "/ok"])
    # /a+b%20 decodes cleanly to '/a+b ' which the prefix rule
    # '/a+b%' (normalized: literal '%') must NOT match
    assert kept == {"/a+b%20", "/ok"}


def test_crawl_delay_budget(spark):
    corpus = spark.createDataFrame(
        [("slow", "User-agent: *\nCrawl-delay: 12\nDisallow: /no\n"),
         ("fast", "User-agent: *\nCrawl-delay: 0.5\n"),
         ("plain", "User-agent: *\nDisallow: /no\n")],
        "host string, robots_txt string")
    rules = {r["host"]: r for r in compile_robots(corpus).collect()}
    assert rules["slow"]["budget_per_round"] == 5     # 60 // 12
    assert rules["fast"]["budget_per_round"] == 120   # 60 // 0.5
    assert rules["plain"]["budget_per_round"] == 8    # DEFAULT_BUDGET


def test_crawl_delay_hostile_values_never_crash(spark):
    """Untrusted robots.txt: zero / negative / NaN / inf / huge
    Crawl-delay values must compile to a sane bounded budget instead of
    overflowing IntegerType and aborting the Arrow batch."""
    corpus = spark.createDataFrame(
        [("zero", "User-agent: *\nCrawl-delay: 0\n"),
         ("neg", "User-agent: *\nCrawl-delay: -3\n"),
         ("nan", "User-agent: *\nCrawl-delay: nan\n"),
         ("inf", "User-agent: *\nCrawl-delay: inf\n"),
         ("tiny", "User-agent: *\nCrawl-delay: 0.000001\n"),
         ("subnormal", "User-agent: *\nCrawl-delay: 1e-310\n"),
         ("huge", "User-agent: *\nCrawl-delay: 1e18\n")],
        "host string, robots_txt string")
    rules = {r["host"]: r for r in compile_robots(corpus).collect()}
    # invalid (<=0, non-finite) -> default budget
    assert rules["zero"]["budget_per_round"] == 8
    assert rules["neg"]["budget_per_round"] == 8
    assert rules["nan"]["budget_per_round"] == 8
    assert rules["inf"]["budget_per_round"] == 8
    assert rules["huge"]["budget_per_round"] == 1  # finite but enormous
    # valid sub-ms delay -> capped at 1ms resolution, int32-safe
    assert rules["tiny"]["budget_per_round"] == 60_000
    # positive finite SUBNORMAL: 60 / 1e-310 overflows float to inf —
    # the cap must apply before the int() conversion
    assert rules["subnormal"]["budget_per_round"] == 60_000


def test_matcher_plan_is_broadcast_and_python_free(spark):
    corpus = spark.createDataFrame([("h", "User-agent: *\nDisallow: /p\n")],
                                   "host string, robots_txt string")
    rules = compile_robots(corpus)
    cand = spark.createDataFrame([("h", "http://h/p")],
                                 "host string, url string")
    plan = (apply_robots_rep(cand, rules)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    # Python appears only below the broadcast (rules compilation), so
    # strip the broadcast subtree marker side: the candidates' filter
    # expression itself must be UDF-free
    assert "pythonUDF" not in plan.split("BroadcastHashJoin")[0]

def test_unrelated_token_never_captures_substring_agent():
    """Exact product-token matching (RFC 9309): a group for a crawler
    literally named 'bot' must not capture 'cdxbot', and a one-letter
    token must not out-rank '*' for agents merely containing it."""
    txt = ("User-agent: bot\nDisallow: /\n\n"
           "User-agent: *\nDisallow: /only\n")
    al, dis, _ = parse_robots(txt, agent="cdxbot/2.1")
    assert dis == ["/only"]
    txt2 = "User-agent: a\nDisallow: /\nUser-agent: *\nDisallow: /w\n"
    _, dis2, _ = parse_robots(txt2, agent="alpha-crawler")
    assert dis2 == ["/w"]
    # the exact token still wins over *
    _, dis3, _ = parse_robots(txt2, agent="a/9")
    assert dis3 == ["/"]


def test_duplicate_group_crawl_delay_takes_max():
    """Merged duplicate groups: the max declared delay wins — never
    file-order-dependent."""
    txt = ("User-agent: x\nCrawl-delay: 1\nDisallow: /a\n"
           "User-agent: x\nCrawl-delay: 10\nDisallow: /b\n")
    _, dis, d = parse_robots(txt, agent="x")
    assert sorted(dis) == ["/a", "/b"] and d == 10.0
    rev = ("User-agent: x\nCrawl-delay: 10\nDisallow: /b\n"
           "User-agent: x\nCrawl-delay: 1\nDisallow: /a\n")
    _, _, d2 = parse_robots(rev, agent="x")
    assert d2 == 10.0
