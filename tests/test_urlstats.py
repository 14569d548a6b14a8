"""eTLD+1 extraction (functions/urlstats.py): longest-suffix match
semantics, private-registry precedence, unknown TLDs, degenerate
hosts, and the broadcast plan shape."""

from __future__ import annotations

from cdx_writer_spark.functions import urlstats


def _run(spark, hosts):
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    return {r.host: (r.public_suffix, r.registrable_domain)
            for r in urlstats.registrable_domain(df).collect()}


def test_longest_match_and_private_registry(spark):
    got = _run(spark, [
        "www.example.com", "example.co.uk", "a.b.example.org.uk",
        "user1.github.io", "plain.io", "deep.cdn.example.com.au",
    ])
    assert got["www.example.com"] == ("com", "example.com")
    # co.uk (2 labels) beats uk (1 label)
    assert got["example.co.uk"] == ("co.uk", "example.co.uk")
    assert got["a.b.example.org.uk"] == ("org.uk", "example.org.uk")
    # private registry github.io beats io: each USER is a site
    assert got["user1.github.io"] == ("github.io", "user1.github.io")
    assert got["plain.io"] == ("io", "plain.io")
    assert got["deep.cdn.example.com.au"] == ("com.au", "example.com.au")


def test_unknown_and_degenerate_hosts(spark):
    got = _run(spark, [
        "site.internal",      # unknown TLD
        "localhost",          # dotless
        "co.uk",              # host == a rule: only its proper
                              # suffixes can match -> uk -> dom co.uk
        "Example.COM.",       # case + trailing dot normalize
    ])
    assert got["site.internal"] == (None, None)
    assert got["localhost"] == (None, None)
    assert got["co.uk"] == ("uk", "co.uk")
    assert got["example.com."] == ("com", "example.com")


def test_dedup_before_explode_and_broadcast_plan(spark):
    """The rule join must broadcast, and the output is one row per
    DISTINCT host no matter how many page rows share it."""
    df = spark.createDataFrame(
        [("a.example.com",)] * 50 + [("b.example.com",)],
        "host string")
    out = urlstats.registrable_domain(df)
    assert out.count() == 2
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
