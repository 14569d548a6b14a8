"""DUST parameter-insignificance mining (frontier/dust.py) — planted
alias structure with a known ground truth, multi-parameter rebuild
semantics, support/ratio gating, and the frontier collapse rewrite."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdx_writer_spark.frontier import dust


def _alias_rows(n_groups=10):
    """Per content group g: the bare URL, a ?sid=<unique>&ref=home
    alias (same digest), a ?ref=home alias (same digest), and a
    ?page=2 variant with DIFFERENT content."""
    rows = []
    for g in range(n_groups):
        b = f"http://site{g % 3}.example.com/item/{g}"
        rows.append((b, f"d{g}"))
        rows.append((f"{b}?sid={4 * g + 1}&ref=home", f"d{g}"))
        rows.append((f"{b}?ref=home", f"d{g}"))
        rows.append((f"{b}?page=2", f"p{g}"))
    return rows


def _python_reference(rows, min_support=2, num=1, den=2):
    seen = set(rows)
    votes = {}
    for url, digest in set(rows):
        if "?" not in url:
            continue
        base, query = url.split("?", 1)
        parts = query.split("&")
        for param in dict.fromkeys(kv.split("=", 1)[0] for kv in parts):
            rest = [kv for kv in parts
                    if kv.split("=", 1)[0] != param]
            stripped = base + ("?" + "&".join(rest) if rest else "")
            n, m = votes.get(param, (0, 0))
            votes[param] = (n + 1, m + ((stripped, digest) in seen))
    return sorted(
        (p, n, m, m * den >= n * num)
        for p, (n, m) in votes.items() if n >= min_support)


def test_insignificant_params_matches_python_reference(spark):
    rows = _alias_rows()
    df = spark.createDataFrame(rows, "url string, digest string")
    want = _python_reference(rows)
    for parts in (1, 7):
        got = sorted(map(tuple, dust.insignificant_params(
            df.repartition(parts)).collect()))
        assert got == want
    # the planted ground truth is what we think it is
    assert want == [("page", 10, 0, False), ("ref", 20, 10, True),
                    ("sid", 10, 10, True)]


def test_duplicate_param_names_vote_once_and_strip_together(spark):
    rows = [
        ("http://h/x", "d"),
        ("http://h/x?a=1&a=2", "d"),        # both a= pairs strip away
        ("http://h/x?a=1&a=2&b=3", "d"),    # -> ?b=3 (unseen): miss
    ]
    df = spark.createDataFrame(rows, "url string, digest string")
    got = sorted(map(tuple, dust.insignificant_params(
        df, min_support=1).collect()))
    # a: voted once per URL (2 URLs); ?a=1&a=2 strips whole -> base
    # (seen), the 3-pair URL strips to ?b=3 (unseen).  b: strips to
    # ?a=1&a=2 which IS seen with the same digest.
    assert got == [("a", 2, 1, True), ("b", 1, 1, True)]
    assert got == _python_reference(rows, min_support=1)


def test_min_support_and_querless_urls(spark):
    rows = [("http://h/p", "d"), ("http://h/p?once=1", "d")]
    df = spark.createDataFrame(rows, "url string, digest string")
    assert dust.insignificant_params(df, min_support=2).count() == 0
    one = dust.insignificant_params(df, min_support=1).collect()
    assert [(r.param, r.n_urls, r.n_matched, r.insignificant)
            for r in one] == [("once", 1, 1, True)]


def test_collapse_aliases_rewrites_only_insignificant(spark):
    rows = _alias_rows()
    df = spark.createDataFrame(rows, "url string, digest string")
    verdicts = dust.insignificant_params(df)
    frontier = spark.createDataFrame(
        [("http://x/a?sid=9&page=2&ref=h",), ("http://x/b",),
         ("http://x/c?sid=1",)], "url string")
    got = sorted(r.canonical_url for r in dust.collapse_aliases(
        frontier, verdicts).collect())
    assert got == ["http://x/a?page=2", "http://x/b", "http://x/c"]


def test_collapse_with_no_verdicts_is_identity(spark):
    verdicts = dust.insignificant_params(
        spark.createDataFrame([("http://h/p?keep=1", "d1"),
                               ("http://h/p", "d2")],
                              "url string, digest string"))
    assert verdicts.filter(F.col("insignificant")).count() == 0
    frontier = spark.createDataFrame(
        [("http://x/a?keep=1",)], "url string")
    got = dust.collapse_aliases(frontier, verdicts).collect()
    assert got[0].canonical_url == "http://x/a?keep=1"
