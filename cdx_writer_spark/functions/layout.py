"""Z-order (Morton) data layout for multi-dimensional scan pruning.

At 100 TB the fastest operator is the file never read: engines skip
parquet files whose column min/max stats exclude the predicate, but
stats only prune along the ORDER the data was written in.  Sorting by
one column makes point queries on any OTHER column touch every file.
Interleaving the bits of several bucketed dimensions into one Morton
key (the technique behind Delta's OPTIMIZE ZORDER and Iceberg sort
orders — public lakehouse practice) gives every interleaved dimension
locality: a k-file layout over D z-ordered dimensions touches ~k^(1-1/D)
files for a single-dimension point query instead of all k.

Everything here is exact integer bit arithmetic (shift/and/or over
int64), fully codegen'd, no Python — so a SQL oracle reproduces keys,
file assignment and per-file stats bit-for-bit.

Scale shape: the z-key is a pure projection; file assignment is one
global range order (``ntile``) at bench scale — on a cluster the same
key feeds ``repartitionByRange(n_files, zkey)`` + per-partition sort,
the standard write path, with identical pruning behavior.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue_col(dims: list[Column], bits: int = 8) -> Column:
    """Morton interleave of ``len(dims)`` already-bucketed dimensions,
    each expected in ``[0, 2^bits)`` (values are masked to that range
    so hostile inputs cannot smear the key space).  Bit ``b`` of
    dimension ``d`` lands at position ``b·D + d`` — the constant-
    unrolled shift/and/or chain stays inside whole-stage codegen."""
    n_dims = len(dims)
    z = F.lit(0).cast("long")
    for d, c in enumerate(dims):
        masked = c.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for b in range(bits):
            z = z.bitwiseOR(F.shiftleft(
                F.shiftright(masked, b).bitwiseAND(F.lit(1)),
                b * n_dims + d))
    return z


def zorder_file_stats(df: DataFrame, dims: list[str], order_tiebreak: str,
                      bits: int = 8, n_files: int = 16) -> DataFrame:
    """Assign every row to one of ``n_files`` z-ordered files and
    report the per-file stats a scan planner would prune on:
    ``(file_id, n_rows, <min/max per dimension>)``.

    File assignment is ``ntile(n_files)`` over ``(zvalue, tiebreak)``
    — deterministic, identical remainder semantics in ANSI SQL
    engines, and exactly the boundaries ``repartitionByRange`` +
    parquet write would produce for the balanced case.  The min/max
    columns ARE the parquet footer stats: a predicate on any single
    interleaved dimension overlaps only ~n_files^(1-1/D) of the
    [min, max] boxes (pytest-gated against a one-dimensional sort,
    which a cross-dimension query must read in full)."""
    from pyspark.sql.window import Window

    zed = df.select(
        *[F.col(d).cast("long").alias(d) for d in dims],
        F.col(order_tiebreak).alias("_tb"),
        zvalue_col([F.col(d) for d in dims], bits).alias("_z"))
    w = Window.orderBy("_z", "_tb")
    filed = zed.withColumn("file_id", F.ntile(n_files).over(w))
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for d in dims:
        aggs += [F.min(d).alias(f"min_{d}"), F.max(d).alias(f"max_{d}")]
    return filed.groupBy(F.col("file_id").cast("int").alias("file_id")) \
        .agg(*aggs)


def files_touched(stats: DataFrame, dim: str, value: int) -> int:
    """How many files a point predicate ``dim = value`` must read,
    given :func:`zorder_file_stats` output — the pruning-effectiveness
    probe (driver-side; stats frames are n_files rows)."""
    return stats.filter(
        (F.col(f"min_{dim}") <= value)
        & (F.col(f"max_{dim}") >= value)).count()
