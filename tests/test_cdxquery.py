"""CDX query-side operators (cdxquery.py): revisit-generation dedup
and closest-capture lookup — python-reference equality, tie-breaks,
NULL digests, partitioning invariance, and the no-window plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdx_writer_spark import cdxquery


def _captures():
    # digest dA captured 3 times (two urls), dB once, one NULL digest
    return [
        (1, "http://a/x", 100, "dA"),
        (2, "http://a/x", 200, "dA"),
        (3, "http://b/y", 150, "dA"),
        (4, "http://c/z", 120, "dB"),
        (5, "http://c/z", 120, None),
        (6, "http://a/x", 100, "dC"),   # ts tie with id 1, own digest
    ]


def test_revisit_dedup_reference_and_nulls(spark):
    df = spark.createDataFrame(
        _captures(), "doc_id long, url string, ts long, digest string")
    for parts in (1, 5):
        got = sorted(map(tuple, cdxquery.revisit_dedup(
            df.repartition(parts)).collect()))
        assert got == sorted([
            (1, "http://a/x", 100, "response", None, None),
            (2, "http://a/x", 200, "revisit", "http://a/x", 100),
            (3, "http://b/y", 150, "revisit", "http://a/x", 100),
            (4, "http://c/z", 120, "response", None, None),
            (5, "http://c/z", 120, "response", None, None),  # NULL digest
            (6, "http://a/x", 100, "response", None, None),
        ])


def test_revisit_dedup_ts_then_id_tiebreak(spark):
    rows = [(9, "u9", 50, "d"), (7, "u7", 50, "d"), (8, "u8", 40, "d")]
    df = spark.createDataFrame(
        rows, "doc_id long, url string, ts long, digest string")
    got = {r.id: (r.record_type, r.refers_to_url)
           for r in cdxquery.revisit_dedup(df).collect()}
    assert got[8] == ("response", None)          # earliest ts wins
    assert got[7] == ("revisit", "u8")
    assert got[9] == ("revisit", "u8")


def test_closest_capture_reference_and_ties(spark):
    rows = [("u", 100, 1), ("u", 180, 2), ("u", 220, 3),
            ("v", 90, 4), ("v", 310, 5), ("w", 200, 6)]
    df = spark.createDataFrame(rows, "url string, ts long, doc_id long")
    got = sorted(map(tuple, cdxquery.closest_capture(
        df.repartition(4), target_ts=200).collect()))
    # u: 180 and 220 both at distance 20 -> earlier (180) wins;
    # v: 90 and 310 both at distance 110 -> earlier (90) wins
    assert got == [("u", 180, 2, 20), ("v", 90, 4, 110),
                   ("w", 200, 6, 0)]


def test_cdxquery_plans_are_aggregations_not_windows(spark):
    """Both ops must fold hot digests/URLs map-side: plans contain
    partial-aggregated HashAggregates and NO Window/Sort operator."""
    df = spark.createDataFrame(
        [(1, "u", 1, "d")], "doc_id long, url string, ts long, "
        "digest string")
    for frame in (cdxquery.revisit_dedup(df),
                  cdxquery.closest_capture(df, 5)):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "partial_min" in plan


def test_prefix_scan_semantics_and_cap(spark):
    rows = [("com,a)/p", 10, 1), ("com,a)/q", 30, 2), ("com,ab)/r", 20, 3),
            ("com,b)/s", 15, 4), ("com,a)/p", 5, 5)]
    df = spark.createDataFrame(
        rows, "surt_key string, ts long, doc_id long")
    got = [tuple(r) for r in cdxquery.prefix_scan(
        df.repartition(3), "com,a", ts_from=6, ts_to=25).collect()]
    # prefix matches com,a AND com,ab (prefix, not host equality);
    # ts 5 (below from) and 30 (at/above to) are out; index order
    assert got == [("com,a)/p", 10, 1), ("com,ab)/r", 20, 3)]
    capped = cdxquery.prefix_scan(df.repartition(3), "com,a", limit=2)
    assert [r.id for r in capped.collect()] == [5, 1]


def test_prefix_scan_plan_pushdown_and_topk(spark, tmp_path):
    """The prefix predicate must reach the parquet scan as a pushed
    StringStartsWith, and the capped form must plan TakeOrdered (per-
    partition heaps), not a global Sort + CollectLimit."""
    p = str(tmp_path / "idx")
    spark.range(1000).selectExpr(
        "concat('com,site', id % 37, ')/p/', id) AS surt_key",
        "id AS ts", "id AS doc_id").write.parquet(p)
    scan = cdxquery.prefix_scan(spark.read.parquet(p), "com,site1",
                                limit=10)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "StartsWith(surt_key,com,site1" in plan.replace(" ", ""), plan
    assert "TakeOrderedAndProject" in plan, plan


def test_merge_captures_insert_replace_carry(spark):
    base = spark.createDataFrame(
        [("k1", 1, "d1", 10), ("k2", 2, "d2", 20)],
        "surt_key string, ts long, digest string, doc_id long")
    delta = spark.createDataFrame(
        [("k2", 2, "n2", 21), ("k3", 3, "n3", 30)],
        "surt_key string, ts long, digest string, doc_id long")
    got = {(r.surt_key, r.ts): (r.digest, r.id, r.generation)
           for r in cdxquery.merge_captures(base, delta).collect()}
    assert got == {
        ("k1", 1): ("d1", 10, 0),   # carry-over
        ("k2", 2): ("n2", 21, 1),   # delta replaces
        ("k3", 3): ("n3", 30, 1),   # insert
    }


def test_merge_captures_plan_is_mapside_agg(spark):
    df = spark.createDataFrame(
        [("k", 1, "d", 1)],
        "surt_key string, ts long, digest string, doc_id long")
    plan = (cdxquery.merge_captures(df, df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan
    assert "partial_max" in plan


def test_collapse_captures_calendar_dedup(spark):
    # unit = 10 ticks (digits=13); key u: ts 8,9 in bucket 0, 11,15 in
    # bucket 10; key v: ts 9 alone
    rows = [("u", 9, 1), ("u", 8, 2), ("u", 11, 3), ("u", 15, 4),
            ("v", 9, 5)]
    df = spark.createDataFrame(
        rows, "surt_key string, ts long, doc_id long")
    got = {(r.surt_key, r.ts): (r.id, r.n_collapsed)
           for r in cdxquery.collapse_captures(
               df.repartition(3), digits=13).collect()}
    assert got == {("u", 8): (2, 2), ("u", 11): (3, 2),
                   ("v", 9): (5, 1)}
    plan = (cdxquery.collapse_captures(df, digits=13)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan and "partial_min" in plan
