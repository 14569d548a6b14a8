"""Relational operators Spark's DataFrame API lacks as primitives,
built as compositions of built-in ops (never UDFs, never range-join
explosions).

Currently:

* the **as-of join** — for each left row, the single latest right
  row with ``right_ts <= left_ts`` on the same key (the time-series
  "most recent fact" join every event/feature pipeline needs;
  DuckDB/kdb/pandas ``merge_asof`` semantics, backward direction,
  inclusive);
* the **range join** — point-in-interval containment via fixed-width
  bucketization (see :func:`range_join`);
* the **distributed prefix sum** — running totals without a
  data-sized single-partition window, via the two-level bucket
  decomposition (see :func:`prefix_sum`; powers sweep-line interval
  concurrency).

As-of scale shape: the naive formulations are a non-equi join (a
Catalyst BroadcastNestedLoop/cartesian at worst) or a per-key
``collect_list`` + Python scan.  This implementation is the
union-tag trick instead: tag both sides, union them (cheap — one
schema-aligned concat), and run ONE window over (key, ts) that
carries the last-seen right payload forward onto following left rows.
Cost is a single hash exchange of left+right on the join key plus a
per-partition sort — the same price as the sort-merge equi-join Spark
would pick anyway, with no row multiplication, no skew amplification
beyond the key's own frequency, and whole-stage-codegen window
execution (zero Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              tolerance: Column | int | None = None,
              suffix: str = "_r") -> DataFrame:
    """Backward (inclusive) as-of join: every ``left`` row gains the
    payload of the latest ``right`` row with
    ``right[right_ts] <= left[left_ts]`` and equal ``on`` key — NULLs
    when no right row precedes it (left-outer semantics).

    ``tolerance``: optional max allowed ``left_ts - right_ts`` (same
    units as the ts columns); matches older than the window are
    nulled out, mirroring ``pandas.merge_asof(tolerance=...)``.

    Right payload columns are appended with ``suffix`` (the right ts
    column becomes e.g. ``ts_r``); ties are impossible on a
    (key, ts)-unique right side, and otherwise resolve to the
    row latest in (ts, payload-struct) order — deterministic at any
    parallelism because the window order is a total order over the
    carried struct.

    Timestamps may be any orderable type; when ``tolerance`` is used
    they must support subtraction (use epoch numbers for
    cross-engine-exact arithmetic).
    """
    payload_cols = [c for c in right.columns
                    if c not in (on, right_ts)]
    # one struct carries ts + payload so a single last() resolves
    # both "which right row" and "its values" atomically (two
    # separate last() calls could disagree under equal-ts ties)
    rstruct = F.struct(
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(c) for c in payload_cols])
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        # right rows sort BEFORE left rows at equal ts (backward
        # join is inclusive): flag 0 < 1
        F.lit(0).alias("__side"),
        rstruct.alias("__r"))
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"))
    unioned = r.select("__k", "__t", "__side", "__r",
                       F.lit(None).cast(l.schema["__l"].dataType)
                       .alias("__l")).unionByName(l)
    w = (Window.partitionBy("__k").orderBy("__t", "__side", "__r")
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = unioned.withColumn(
        "__m", F.last("__r", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1)
    if tolerance is not None:
        tol = tolerance if isinstance(tolerance, Column) \
            else F.lit(tolerance)
        out = out.withColumn(
            "__m", F.when(F.col("__t") - F.col("__m")["__ts"] <= tol,
                          F.col("__m")))
    return out.select(
        *[F.col("__l")[c].alias(c) for c in left.columns],
        F.col("__m")["__ts"].alias(right_ts + suffix),
        *[F.col("__m")[c].alias(c + suffix) for c in payload_cols])


def range_join(points: DataFrame, intervals: DataFrame, on: str,
               point_col: str = "ts", start_col: str = "start",
               end_col: str = "end", bucket_width: int = 16,
               suffix: str = "_r") -> DataFrame:
    """Interval containment join: every (key, point) row pairs with
    every same-key interval where ``start <= point <= end``
    (inclusive) — the event-in-window join.

    Scale shape: Catalyst plans a raw ``p.k = i.k AND p.ts BETWEEN
    i.start AND i.end`` as a sort-merge on the key alone, re-scanning
    every same-key interval per point (quadratic in hot keys, and a
    BroadcastNestedLoop without the equi-key).  This is the standard
    bucketization instead: each interval explodes to the fixed-width
    buckets it covers (``sequence(start div w, end div w)`` — bounded
    rows, proportional to interval length / width), each point maps
    to exactly ONE bucket, and the join is a plain equi-join on
    (key, bucket) refined by the exact BETWEEN — so matching work is
    proportional to true selectivity, the exchange is narrow
    (key, bucket), AQE can split skewed buckets, and no pair is ever
    produced twice (the point's single bucket dedups by
    construction).  Pick ``bucket_width`` near the typical interval
    length: width >> intervals wastes bucket fan-out on the probe
    side; width << intervals multiplies the interval explode.

    Point/start/end must be integral (epoch seconds/µs/days);
    interval payload columns come back with ``suffix``.
    """
    w = F.lit(int(bucket_width)).cast("long")
    payload = [c for c in intervals.columns
               if c not in (on, start_col, end_col)]
    i = intervals.select(
        F.col(on).alias("__k"),
        F.col(start_col).cast("long").alias("__s"),
        F.col(end_col).cast("long").alias("__e"),
        *[F.col(c).alias(c + suffix) for c in payload]).filter(
        F.col("__s") <= F.col("__e"))
    exploded = i.withColumn(
        "__b", F.explode(F.sequence(
            F.floor(F.col("__s") / w), F.floor(F.col("__e") / w))))
    p = points.withColumn(
        "__b", F.floor(F.col(point_col).cast("long") / w)) \
        .withColumn("__k", F.col(on))
    joined = p.join(exploded, ["__k", "__b"]).filter(
        (F.col(point_col).cast("long") >= F.col("__s"))
        & (F.col(point_col).cast("long") <= F.col("__e")))
    return joined.select(
        *points.columns,
        F.col("__s").alias(start_col + suffix),
        F.col("__e").alias(end_col + suffix),
        *[F.col(c + suffix) for c in payload])


def prefix_sum(df: DataFrame, part_col: str, order_col: str,
               val_col: str, out_col: str = "running_total",
               bucket_width: int = 3_600_000_000) -> DataFrame:
    """Distributed running total: for every row, the sum of
    ``val_col`` over all same-``part_col`` rows with
    ``order_col' <= order_col`` (ties ordered by ``order_col`` are
    summed together before ranking, so the result is well-defined —
    callers wanting per-row running sums at duplicate keys should
    pre-aggregate, as q_events_concurrency does).

    Scale shape: the naive ``Window.partitionBy(part).orderBy(ord)``
    puts EVERY row of a partition key through one task — with few
    distinct keys (event types, hosts ranked by tier, a global
    total) that is a single-reducer collapse at 100 TB.  This is the
    classic two-level scan decomposition instead:

    1. rows land in fixed-width ``order_col`` buckets — the working
       exchange is (part, bucket), bounded by the bucket width, and
       AQE can split hot buckets;
    2. per-(part, bucket) totals (one narrow partial agg) feed a
       window over BUCKET COUNT rows — thousands, not billions — to
       produce each bucket's exclusive offset;
    3. the tiny offset table broadcast-joins back and a within-bucket
       window (bounded by bucket population) adds the local running
       sum to the offset.

    No data-sized single partition anywhere; the only per-key serial
    structure is one row per bucket.  ``order_col`` must be integral
    (epoch µs by convention)."""
    from pyspark.sql.window import Window

    w = F.lit(int(bucket_width)).cast("long")
    b = df.withColumn("__b", F.floor(F.col(order_col).cast("long") / w))
    tot = b.groupBy(part_col, "__b").agg(F.sum(val_col).alias("__t"))
    w_off = (Window.partitionBy(part_col).orderBy("__b")
             .rowsBetween(Window.unboundedPreceding, -1))
    off = tot.select(
        part_col, "__b",
        F.coalesce(F.sum("__t").over(w_off),
                   F.lit(0).cast("long")).alias("__off"))
    w_in = (Window.partitionBy(part_col, "__b").orderBy(order_col)
            .rangeBetween(Window.unboundedPreceding, 0))
    return (b.join(F.broadcast(off), [part_col, "__b"])
            .withColumn(out_col,
                        F.sum(val_col).over(w_in) + F.col("__off"))
            .drop("__b", "__off"))


def snapshot_delta(old: DataFrame, new: DataFrame,
                   key: str = "surt_key",
                   payload: str = "digest") -> DataFrame:
    """Crawl-over-crawl snapshot diff: classify every key across two
    snapshots as ``added`` / ``removed`` / ``changed`` / ``unchanged``
    — the recrawl-planning primitive (two CDX snapshots of the same
    seed list: ``key`` = SURT, ``payload`` = SHA-1 payload digest;
    "changed" keys are the re-fetch set, "added" the discovery set).

    Output: ``(key, status, old_<payload>, new_<payload>)``.

    Scale shape: the naive formulation is a FULL OUTER JOIN of two
    corpus-sized tables (two hash exchanges feeding a join operator
    that must keep both sides' unmatched rows).  This is the
    union-tag decomposition instead: one schema-aligned union (free —
    no exchange) and ONE groupBy(key) with map-side partial
    aggregation, so exactly one hash exchange of (key, payload) pairs
    and no join at any scale.  Keys are unique per snapshot by
    contract (a CDX snapshot carries one latest capture per SURT);
    duplicates within a side resolve to ``max(payload)``,
    deterministically at any parallelism.
    """
    ptype = new.schema[payload].dataType
    tagged = (
        old.select(F.col(key).alias("__sd_key"),
                   F.col(payload).alias("__sd_old"),
                   F.lit(None).cast(ptype).alias("__sd_new"))
        .unionByName(new.select(
            F.col(key).alias("__sd_key"),
            F.lit(None).cast(ptype).alias("__sd_old"),
            F.col(payload).alias("__sd_new"))))
    agg = tagged.groupBy("__sd_key").agg(
        F.max("__sd_old").alias("__sd_old"),
        F.max("__sd_new").alias("__sd_new"))
    status = (
        F.when(F.col("__sd_old").isNull(), F.lit("added"))
        .when(F.col("__sd_new").isNull(), F.lit("removed"))
        .when(F.col("__sd_old") == F.col("__sd_new"),
              F.lit("unchanged"))
        .otherwise(F.lit("changed")))
    return agg.select(
        F.col("__sd_key").alias(key),
        status.alias("status"),
        F.col("__sd_old").alias(f"old_{payload}"),
        F.col("__sd_new").alias(f"new_{payload}"))


def bloom_semi_join(big: DataFrame, dim: DataFrame, key: str,
                    n_partitions: int = 16,
                    capacity: int | None = None,
                    fpr: float = 0.01) -> DataFrame:
    """EXACT semi-join of ``big`` against ``dim``'s keys with a Bloom
    runtime pre-filter — the explicit form of the runtime-filter
    pattern for 100 TB joins: rows whose key is definitely absent
    from ``dim`` are dropped BEFORE the join exchange, so only true
    matches plus the Bloom's ~fpr false-positive sliver ever shuffle.
    The survivors are exact-verified with a semi-join (Bloom filters
    have no false negatives), so the result equals
    ``big.join(dim, key, 'left_semi')`` row-for-row.

    Reuses the crawl frontier's partitioned-Bloom machinery
    (:mod:`cdx_writer_spark.frontier.seen`): the filter table is
    n_partitions rows of int64 words built with the native
    position-explode fold, broadcast onto ``big``, and probed as a
    pure Catalyst expression (zero Python, zero shuffle of ``big``
    at the probe).  ``dim`` is the small side by contract — size
    ``capacity`` (per-partition) to its key count; the broadcast is
    n_partitions × filter bytes, the same budget
    :func:`~cdx_writer_spark.frontier.seen.flag_maybe_seen` gates.

    Keys are compared as strings (both the filter fold and the probe
    hash ``cast(key as string)``), matching semi-join equality for
    string/integer keys; NULL keys never match, as in a plain
    semi-join.
    """
    from ..frontier import seen
    from ..frontier.bloom import BloomFilter

    capacity = capacity or seen.DEFAULT_CAPACITY
    spark = big.sparkSession
    dim_keys = dim.select(
        F.col(key).cast("string").alias("surt_key")).distinct()
    filters = seen.update_filters(
        dim_keys, seen.empty_filters(spark, n_partitions, capacity,
                                     fpr),
        n_partitions, capacity, fpr)
    static_k = BloomFilter.sized_for(capacity, fpr).k

    kc = F.col(key).cast("string")
    h1 = F.xxhash64(kc)
    h2 = F.xxhash64(F.lit("b"), kc)
    pid = F.pmod(h1, F.lit(n_partitions)).cast("int")
    flt = F.broadcast(filters.select(
        F.col("partition_id").alias("__bsj_pid"),
        F.col("bits_longs").alias("__bsj_words"),
        F.col("n_bits").alias("__bsj_nbits")))
    probed = (big
              .withColumn("__bsj_pid", pid)
              .withColumn("__bsj_h1", h1)
              .withColumn("__bsj_h2", h2)
              .join(flt, "__bsj_pid", "left"))
    maybe = seen._native_probe_col(
        F.col("__bsj_h1"), F.col("__bsj_h2"), F.col("__bsj_words"),
        F.col("__bsj_nbits"), None, static_k=static_k)
    survivors = (probed
                 .filter(F.coalesce(maybe, F.lit(False)))
                 .drop("__bsj_pid", "__bsj_h1", "__bsj_h2",
                       "__bsj_words", "__bsj_nbits"))
    return survivors.join(
        dim.select(F.col(key)).distinct(), key, "left_semi")
