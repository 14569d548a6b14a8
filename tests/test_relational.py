"""As-of join semantics (functions/relational.py): backward-inclusive
matching, left-outer NULLs, equal-ts inclusivity, tolerance, tie
resolution, and the scale shape (one exchange, no row multiplication,
no Python) — the oracle-parity sweep covers the events corpus against
DuckDB's native ASOF JOIN; these pin the operator's edges."""

from __future__ import annotations

import pyspark.sql.functions as F

from cdx_writer_spark.functions.relational import asof_join


def _run(spark, left_rows, right_rows, **kw):
    left = spark.createDataFrame(left_rows, "k long, ts long, lv string")
    right = spark.createDataFrame(right_rows, "k long, ts long, p string")
    out = asof_join(left, right, on="k", **kw)
    return {(r["k"], r["ts"]): (r["ts_r"], r["p_r"])
            for r in out.collect()}


def test_backward_inclusive_semantics(spark):
    got = _run(
        spark,
        [(1, 5, "a"), (1, 9, "b"), (1, 3, "c"), (2, 3, "d")],
        [(1, 4, "p4"), (1, 7, "p7"), (2, 9, "pz")])
    assert got == {
        (1, 5): (4, "p4"),       # latest <= 5 is 4
        (1, 9): (7, "p7"),       # latest <= 9 is 7
        (1, 3): (None, None),    # nothing precedes 3
        (2, 3): (None, None),    # right row is in the future
    }


def test_equal_ts_is_inclusive(spark):
    got = _run(spark, [(1, 7, "a")], [(1, 7, "p7"), (1, 2, "p2")])
    assert got == {(1, 7): (7, "p7")}


def test_left_rows_preserved_exactly_once(spark):
    left = spark.createDataFrame(
        [(1, 5, "a"), (1, 5, "b"), (1, 6, "c")],
        "k long, ts long, lv string")
    right = spark.createDataFrame(
        [(1, 1, "p"), (1, 2, "q"), (1, 3, "r")],
        "k long, ts long, p string")
    out = asof_join(left, right, on="k").collect()
    # no row multiplication: one output row per left row even with
    # many matching right rows and duplicate left timestamps
    assert sorted((r["ts"], r["lv"], r["p_r"]) for r in out) == [
        (5, "a", "r"), (5, "b", "r"), (6, "c", "r")]


def test_tolerance_nulls_stale_matches(spark):
    got = _run(spark,
               [(1, 10, "a"), (1, 100, "b")],
               [(1, 8, "p8")], tolerance=5)
    assert got == {(1, 10): (8, "p8"),       # age 2 <= 5
                   (1, 100): (None, None)}   # age 92 > 5: stale


def test_right_ties_resolve_deterministically(spark):
    # two right rows at the same (k, ts): the max payload struct wins,
    # at every partitioning
    a = _run(spark, [(1, 9, "x")], [(1, 4, "pA"), (1, 4, "pB")])
    for n in (1, 7):
        left = spark.createDataFrame(
            [(1, 9, "x")], "k long, ts long, lv string").repartition(n)
        right = spark.createDataFrame(
            [(1, 4, "pA"), (1, 4, "pB")],
            "k long, ts long, p string").repartition(n)
        out = asof_join(left, right, on="k").collect()
        assert [(r["ts_r"], r["p_r"]) for r in out] \
            == [list(a.values())[0]] == [(4, "pB")]


def test_distinct_ts_column_names(spark):
    left = spark.createDataFrame(
        [(1, 10, "a")], "k long, lt long, lv string")
    right = spark.createDataFrame(
        [(1, 4, 3.5)], "k long, rt long, val double")
    out = asof_join(left, right, on="k", left_ts="lt",
                    right_ts="rt").collect()
    assert [(r["k"], r["lt"], r["lv"], r["rt_r"], r["val_r"])
            for r in out] == [(1, 10, "a", 4, 3.5)]


def test_asof_plan_single_exchange_no_python(spark):
    """Scale shape: one hash exchange on the key (the window), no
    cartesian/broadcast-nested-loop, no Python."""
    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("ts"),
        F.col("id").alias("lv"))
    right = spark.range(50).select(
        (F.col("id") % 5).alias("k"), (F.col("id") * 2).alias("ts"),
        F.col("id").alias("p"))
    plan = asof_join(left, right, on="k")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Python" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


# --- range join ---------------------------------------------------------------

from cdx_writer_spark.functions.relational import range_join


def _brute_pairs(points, intervals):
    out = set()
    for (k, t, pid) in points:
        for (k2, s, e, iid) in intervals:
            if k == k2 and s <= t <= e:
                out.add((pid, iid))
    return out


def test_range_join_matches_brute_force(spark):
    import random

    rng = random.Random(7)
    pts = [(rng.randrange(5), rng.randrange(200), i)
           for i in range(300)]
    ivs = [(rng.randrange(5), s := rng.randrange(200),
            s + rng.randrange(40), 1000 + i) for i in range(80)]
    p = spark.createDataFrame(pts, "k long, ts long, pid long")
    i = spark.createDataFrame(ivs, "k long, start long, end long, "
                                   "iid long")
    got = {(r["pid"], r["iid_r"]) for r in
           range_join(p, i, on="k", bucket_width=16).collect()}
    assert got == _brute_pairs(pts, ivs)
    # no duplicate pairs even when an interval spans many buckets
    rows = range_join(p, i, on="k", bucket_width=4).collect()
    assert len(rows) == len({(r["pid"], r["iid_r"]) for r in rows})
    assert {(r["pid"], r["iid_r"]) for r in rows} == got


def test_range_join_bounds_inclusive_and_empty_interval(spark):
    p = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 9, 3), (1, 21, 4)],
        "k long, ts long, pid long")
    i = spark.createDataFrame(
        [(1, 10, 20, 100), (1, 30, 29, 101)],   # second is inverted
        "k long, start long, end long, iid long")
    got = {(r["pid"], r["iid_r"]) for r in
           range_join(p, i, on="k").collect()}
    assert got == {(1, 100), (2, 100)}   # inclusive both ends


def test_range_join_plan_no_nested_loop_no_python(spark):
    p = spark.range(100).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("ts"),
        F.col("id").alias("pid"))
    i = spark.range(20).select(
        (F.col("id") % 3).alias("k"), (F.col("id") * 9).alias("start"),
        (F.col("id") * 9 + 5).alias("end"), F.col("id").alias("iid"))
    plan = range_join(p, i, on="k")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Python" not in plan
