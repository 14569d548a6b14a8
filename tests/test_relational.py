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


# --- distributed prefix sum -----------------------------------------------------

from cdx_writer_spark.functions.relational import prefix_sum


def test_prefix_sum_matches_naive_window_any_bucket_width(spark):
    import random

    from pyspark.sql.window import Window
    rng = random.Random(11)
    rows = [(rng.randrange(3), rng.randrange(1000),
             rng.randrange(-5, 6)) for _ in range(400)]
    df = spark.createDataFrame(rows, "k long, t long, v long")
    # pre-aggregate duplicates (the operator's documented contract)
    agg = df.groupBy("k", "t").agg(F.sum("v").alias("v"))
    naive = (Window.partitionBy("k").orderBy("t")
             .rangeBetween(Window.unboundedPreceding, 0))
    want = sorted(
        (r["k"], r["t"], r["rt"]) for r in
        agg.select("k", "t", F.sum("v").over(naive).alias("rt"))
        .collect())
    for width in (1, 16, 100, 10**9):
        got = sorted(
            (r["k"], r["t"], r["running_total"]) for r in
            prefix_sum(agg, "k", "t", "v", bucket_width=width)
            .collect())
        assert got == want, f"width={width}"


def test_prefix_sum_plan_bounded_windows_broadcast_offsets(spark):
    df = spark.range(1000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("t"),
        F.lit(1).alias("v"))
    plan = prefix_sum(df, "k", "t", "v", bucket_width=64) \
        ._jdf.queryExecution().executedPlan().toString()
    import re

    # the offset table joins back via BROADCAST, not a shuffle
    assert "BroadcastHashJoin" in plan
    assert plan.count("BroadcastExchange") == 1
    # exactly two windows: bucket offsets (bucket-count rows) and
    # the within-bucket local sum — neither spans a whole key
    assert plan.count("Window [") == 2
    data_side, offsets_side = plan.split("BroadcastExchange", 1)
    # the DATA-side window partitions by (k, __b) and orders by t —
    # never by the key alone (that would be the single-task collapse)
    assert re.search(
        r"windowspecdefinition\(k#\d+L?, __b#\d+L?, t#", data_side)
    # the offsets window lives BELOW the broadcast, consumes the
    # (k, __b) bucket-total aggregate, and uses the exclusive
    # RowFrame(-1) — one row per bucket, not per data row
    assert "Window [" in offsets_side
    assert "unboundedpreceding$(), -1)" in offsets_side
    assert "HashAggregate(keys=[k#" in offsets_side
    assert "Python" not in plan


def test_events_concurrency_invariants(spark):
    import __spark_entry__ as entrymod
    out = entrymod.q_events_concurrency(
        spark, "/root/testdata/sf0.001").cache()
    # concurrency never negative, and every type drains to zero at
    # its last boundary (sum of all deltas is zero by construction)
    assert out.filter(F.col("n_active") < 0).count() == 0
    from pyspark.sql.window import Window
    last = (out.withColumn(
        "rn", F.row_number().over(
            Window.partitionBy("event_type")
            .orderBy(F.desc("us")))).filter(F.col("rn") == 1))
    assert last.filter(F.col("n_active") != 0).count() == 0
    out.unpersist()


# --- snapshot_delta -------------------------------------------------------

from cdx_writer_spark.functions.relational import (bloom_semi_join,
                                                   snapshot_delta)


def _snap(spark, rows):
    return spark.createDataFrame(rows, "surt_key string, digest string")


def test_snapshot_delta_all_four_statuses(spark):
    old = _snap(spark, [("a", "d1"), ("b", "d2"), ("c", "d3")])
    new = _snap(spark, [("b", "d2"), ("c", "dX"), ("d", "d4")])
    got = {r["surt_key"]: (r["status"], r["old_digest"], r["new_digest"])
           for r in snapshot_delta(old, new).collect()}
    assert got == {
        "a": ("removed", "d1", None),
        "b": ("unchanged", "d2", "d2"),
        "c": ("changed", "d3", "dX"),
        "d": ("added", None, "d4"),
    }


def test_snapshot_delta_matches_full_outer_join(spark):
    # randomized-ish (seeded arithmetic) equivalence vs the naive plan
    base = spark.range(200)
    old = base.filter(F.col("id") % 3 != 0).select(
        F.col("id").cast("string").alias("surt_key"),
        F.md5(F.concat(F.lit("o"), F.col("id").cast("string")))
        .alias("digest"))
    new = base.filter(F.col("id") % 4 != 1).select(
        F.col("id").cast("string").alias("surt_key"),
        F.md5(F.concat(
            F.when(F.col("id") % 5 == 0, F.lit("n")).otherwise(F.lit("o")),
            F.col("id").cast("string"))).alias("digest"))
    naive = (old.withColumnRenamed("digest", "old_digest")
             .join(new.withColumnRenamed("digest", "new_digest"),
                   "surt_key", "full_outer")
             .select("surt_key",
                     F.when(F.col("old_digest").isNull(), "added")
                     .when(F.col("new_digest").isNull(), "removed")
                     .when(F.col("old_digest") == F.col("new_digest"),
                           "unchanged")
                     .otherwise("changed").alias("status"),
                     "old_digest", "new_digest"))
    got = sorted(map(tuple, snapshot_delta(old, new).collect()))
    want = sorted(map(tuple, naive.collect()))
    assert got == want


def test_snapshot_delta_plan_single_exchange_no_join(spark):
    old = _snap(spark, [("a", "d1")])
    new = _snap(spark, [("a", "d1")])
    plan = snapshot_delta(old, new)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in plan  # union-tag decomposition, not a join
    assert plan.count("Exchange") <= 1  # one hash exchange on the key


# --- bloom_semi_join ------------------------------------------------------


def test_bloom_semi_join_equals_plain_semi_join(spark):
    big = spark.range(2000).select(
        F.col("id").alias("k"),
        (F.col("id") * 7 % 13).alias("payload"))
    dim = spark.range(400).filter(F.col("id") % 5 == 2).select(
        F.col("id").alias("k"))
    got = sorted(map(tuple, bloom_semi_join(
        big, dim, "k", n_partitions=4, capacity=256).collect()))
    want = sorted(map(tuple,
                      big.join(dim, "k", "left_semi").collect()))
    assert got == want and len(want) == 80


def test_bloom_semi_join_string_keys_and_nulls(spark):
    big = spark.createDataFrame(
        [("h1", 1), ("h2", 2), (None, 3), ("h9", 4)], "k string, v int")
    dim = spark.createDataFrame([("h1",), ("h9",)], "k string")
    got = sorted(map(tuple, bloom_semi_join(
        big, dim, "k", n_partitions=2, capacity=64).collect()))
    assert got == [("h1", 1), ("h9", 4)]  # NULL never matches


def test_bloom_semi_join_plan_broadcasts_filters(spark):
    big = spark.range(100).select(F.col("id").alias("k"))
    dim = spark.range(10).select(F.col("id").alias("k"))
    plan = bloom_semi_join(big, dim, "k", n_partitions=2, capacity=64) \
        ._jdf.queryExecution().executedPlan().toString()
    # the filter table rides a broadcast join onto big: big itself is
    # never exchanged before the probe
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
