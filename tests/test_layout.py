"""Z-order layout (functions/layout.py) — Morton key python-reference
equality, ntile file assignment, pruning effectiveness vs a
one-dimensional sort, and input masking."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdx_writer_spark.functions import layout


def _morton(x, y, bits):
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
    return z


def _grid(spark, side=64):
    rows = [(x, y, x * side + y) for x in range(side)
            for y in range(side)]
    return rows, spark.createDataFrame(rows, "u long, t long, i long")


def test_zorder_stats_match_python_reference(spark):
    rows, df = _grid(spark)
    got = sorted(map(tuple, layout.zorder_file_stats(
        df.repartition(8), ["u", "t"], "i",
        bits=6, n_files=16).collect()))
    srt = sorted(rows, key=lambda r: (_morton(r[0], r[1], 6), r[2]))
    n, k = len(srt), 16
    want, pos = [], 0
    for f in range(1, k + 1):
        s = n // k + (1 if f <= n % k else 0)      # ntile remainder
        grp = srt[pos:pos + s]
        pos += s
        want.append((f, s, min(g[0] for g in grp),
                     max(g[0] for g in grp), min(g[1] for g in grp),
                     max(g[1] for g in grp)))
    assert got == sorted(want)
    # partitioning invariance
    one = sorted(map(tuple, layout.zorder_file_stats(
        df.coalesce(1), ["u", "t"], "i", bits=6, n_files=16).collect()))
    assert one == got


def test_zorder_prunes_where_single_sort_cannot(spark):
    """The operator's reason to exist: on a 64x64 grid in 16 files, a
    point query on EITHER z-ordered dimension touches exactly
    16^(1/2) = 4 file stat-boxes, while a layout sorted by t alone
    must read ALL 16 files for any u predicate."""
    rows, df = _grid(spark)
    z = layout.zorder_file_stats(df, ["u", "t"], "i",
                                 bits=6, n_files=16)
    for v in (0, 17, 40, 63):
        assert layout.files_touched(z, "u", v) == 4
        assert layout.files_touched(z, "t", v) == 4
    # baseline: files cut from a t-only sort — u stats are useless
    w = Window.orderBy("t", "i")
    lin = (df.withColumn("file_id", F.ntile(16).over(w))
           .groupBy("file_id")
           .agg(F.min("u").alias("min_u"), F.max("u").alias("max_u")))
    for v in (0, 40):
        assert lin.filter((F.col("min_u") <= v)
                          & (F.col("max_u") >= v)).count() == 16


def test_zvalue_masks_out_of_range_and_stays_native(spark):
    df = spark.createDataFrame([(5, 3), (5 + 256, 3 + 512)],
                               "a long, b long")
    out = df.select(layout.zvalue_col(
        [F.col("a"), F.col("b")], bits=8).alias("z")).collect()
    assert out[0].z == out[1].z == _morton(5, 3, 8)
    plan = df.select(layout.zvalue_col(
        [F.col("a"), F.col("b")], 8).alias("z")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan
