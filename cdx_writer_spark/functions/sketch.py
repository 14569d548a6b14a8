"""Cardinality sketching: a PORTABLE HyperLogLog (Flajolet et al.
2007) for distinct counting at crawl scale — how many distinct URLs /
normalized documents / hosts a 10^10-row corpus holds, in one pass
and m registers, where an exact countDistinct would shuffle the full
key set.

Spark's built-in ``approx_count_distinct`` is HLL++ with an opaque
JVM hash — correct but unverifiable.  This implementation hashes with
md5 (available bit-for-bit in any engine) and keeps every register
update in EXACT integer/string arithmetic (the rank is derived from
the length of ``bin(w)`` — no floating-point log whose boundary
behavior could differ between engines), so a DuckDB oracle reproduces
the register state and the estimate to the last bit.  The harmonic
sum is kept as a scaled BIGINT (``2^(50-rank)`` per register, ranks
capped at 50), which makes it an order-independent exact integer —
the kmeans/LM dyadic-sum trick again.

Scale shape: one narrow (bucket, rank) projection off the scan, one
m-row groupBy max (map-side partial max — the classic mergeable
sketch), one 1-row fold.  No shuffle wider than m rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: register-index bits (m = 2^B registers) — 256 registers gives a
#: ~6.5% standard error, plenty for corpus-size telemetry
B = 8
M = 1 << B
#: rank cap: 2^(50-rank) stays an exact BIGINT term (sum < 2^58)
RANK_CAP = 50


def _hash60_col(value: Column) -> Column:
    """Top 60 bits of md5(value) as a BIGINT (15 hex digits — signed-
    safe, identical in any engine with md5 + base conversion)."""
    return F.conv(F.substring(F.md5(value.cast("string")), 1, 15),
                  16, 10).cast("long")


def hll_register_cols(value: Column) -> tuple[Column, Column]:
    """(bucket, rank) for one value: bucket = top B bits, rank = 1 +
    leading zeros of the remaining 52 bits (capped), via the exact
    ``53 - length(bin(w))`` identity (bin() emits no leading zeros)."""
    h = _hash60_col(value)
    w = h % F.lit(1 << 52)
    # (h - w) is an exact multiple of 2^52 with a <2^8 quotient, so
    # the double division is exact (a bare h / 2^52 would round the
    # 60-bit numerator through a 53-bit mantissa first)
    bucket = ((h - w) / F.lit(1 << 52)).cast("long")
    rank = F.when(w == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.bin(w)))
    return bucket, F.least(rank, F.lit(RANK_CAP))


def hll_count(df: DataFrame, col: str) -> DataFrame:
    """One-row cardinality estimate for ``df[col]`` (NULLs ignored):
    ``(m, nonzero_registers, sum_scaled, estimate)``.  ``sum_scaled``
    is the exact scaled harmonic sum ``Σ 2^(50-rank_j)`` over all m
    registers (absent registers contribute rank 0) — the
    hash-stable anchor; ``estimate`` applies the standard bias-
    corrected formula with linear counting in the small range."""
    bucket, rank = hll_register_cols(F.col(col))
    regs = (df.filter(F.col(col).isNotNull())
            .select(bucket.alias("bucket"), rank.alias("rank"))
            .groupBy("bucket").agg(F.max("rank").alias("r")))
    # 2^(50-r) via pow: exact for integer exponents in [0, 50], and
    # cast to BIGINT before summing so the fold is an exact integer
    # (pyspark's shiftleft only takes a literal bit count)
    folded = regs.agg(
        F.count(F.lit(1)).alias("nonzero_registers"),
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), (F.lit(RANK_CAP) - F.col("r"))
                        .cast("double")).cast("long")),
            F.lit(0).cast("long"))
        .alias("present_sum"))
    alpha = 0.7213 / (1.0 + 1.079 / M)
    total = (F.col("present_sum")
             + (F.lit(M) - F.col("nonzero_registers"))
             * F.lit(1 << RANK_CAP).cast("long"))
    zeros = F.lit(M) - F.col("nonzero_registers")
    raw = (F.lit(alpha * M * M) * F.lit(float(1 << RANK_CAP))
           / total.cast("double"))
    est = F.when((zeros > 0) & (raw <= F.lit(2.5 * M)),
                 F.lit(float(M)) * F.log(F.lit(float(M))
                                         / zeros.cast("double"))
                 ).otherwise(raw)
    return folded.select(
        F.lit(M).cast("long").alias("m"),
        F.col("nonzero_registers").cast("long")
        .alias("nonzero_registers"),
        total.cast("long").alias("sum_scaled"),
        F.round(est, 2).alias("estimate"))


def hll_count_grouped(df: DataFrame, key: str, col: str) -> DataFrame:
    """Per-group cardinality estimates — one HLL sketch per ``key``
    (distinct URLs per host, distinct documents per language...), the
    GROUPED form of :func:`hll_count` with identical register/estimate
    arithmetic.

    Scale shape: the register reduction aggregates on (key, bucket) —
    at most m rows per group survive the map-side partial max, so a
    host with 10^9 URLs contributes the same ≤256 rows to the shuffle
    as a host with 10^3 (the mergeable-sketch property doing the skew
    containment); the per-key fold is then a ≤m-row-per-key
    aggregation.  Groups whose values are all NULL produce no row
    (standard GROUP BY semantics).
    """
    bucket, rank = hll_register_cols(F.col(col))
    regs = (df.filter(F.col(col).isNotNull())
            .select(F.col(key), bucket.alias("bucket"),
                    rank.alias("rank"))
            .groupBy(key, "bucket").agg(F.max("rank").alias("r")))
    folded = regs.groupBy(key).agg(
        F.count(F.lit(1)).alias("nonzero_registers"),
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), (F.lit(RANK_CAP) - F.col("r"))
                        .cast("double")).cast("long")),
            F.lit(0).cast("long"))
        .alias("present_sum"))
    alpha = 0.7213 / (1.0 + 1.079 / M)
    total = (F.col("present_sum")
             + (F.lit(M) - F.col("nonzero_registers"))
             * F.lit(1 << RANK_CAP).cast("long"))
    zeros = F.lit(M) - F.col("nonzero_registers")
    raw = (F.lit(alpha * M * M) * F.lit(float(1 << RANK_CAP))
           / total.cast("double"))
    est = F.when((zeros > 0) & (raw <= F.lit(2.5 * M)),
                 F.lit(float(M)) * F.log(F.lit(float(M))
                                         / zeros.cast("double"))
                 ).otherwise(raw)
    return folded.select(
        F.col(key),
        F.lit(M).cast("long").alias("m"),
        F.col("nonzero_registers").cast("long")
        .alias("nonzero_registers"),
        total.cast("long").alias("sum_scaled"),
        F.round(est, 2).alias("estimate"))


# --- count-min sketch (Cormode & Muthukrishnan 2005) --------------------------

#: count-min defaults: 4 rows x 256 buckets -> eps = e/256 ~ 1% of the
#: stream length at 98% confidence; bump width for tighter bounds
CMS_DEPTH = 4
CMS_WIDTH = 256


def _cms_bucket(j: int, value: Column, width: int) -> Column:
    """Row-``j`` bucket for ``value``: md5 of the row-salted string,
    top 60 bits mod width — portable (md5 + base conversion), no JVM
    hash opacity, so an oracle reproduces the table bit-for-bit."""
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{j}:"), value.cast("string"))),
        1, 15), 16, 10).cast("long")
    return h % F.lit(width)


def cms_table(df: DataFrame, col: str, depth: int = CMS_DEPTH,
              width: int = CMS_WIDTH) -> DataFrame:
    """Build the count-min table for ``df[col]`` (NULLs ignored):
    ``(j, bucket, cnt)`` — at most depth×width rows however large the
    input.  The frequency sketch for crawl-scale heavy-hitter
    telemetry (hot hosts, hot mime types): counts are additive, so
    tables from different partitions/days MERGE by summing cnt —
    the same mergeable-aggregate shape as the HLL registers.

    Scale: one explode (×depth) of a narrow (j, bucket) projection,
    one groupBy with map-side partial counts; the shuffle carries
    two small ints per row×depth and collapses to ≤ depth×width rows.
    """
    value = F.col(col)
    pairs = F.explode(F.array(*[
        F.struct(F.lit(j).cast("int").alias("j"),
                 _cms_bucket(j, value, width).alias("bucket"))
        for j in range(depth)]))
    return (df.filter(value.isNotNull())
            .select(pairs.alias("p"))
            .select(F.col("p.j").alias("j"),
                    F.col("p.bucket").alias("bucket"))
            .groupBy("j", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_estimate(table: DataFrame, items: DataFrame, col: str,
                 depth: int = CMS_DEPTH,
                 width: int = CMS_WIDTH) -> DataFrame:
    """Point-estimate the frequency of every row of ``items[col]``
    against a :func:`cms_table`: ``(col, est)`` with the classic
    min-over-rows read.  Guarantees est ≥ true count (never under),
    est ≤ true + eps·N w.h.p.  The table is depth×width rows and
    BROADCAST onto the probe side — the items scan never shuffles."""
    value = F.col(col)
    probes = (items.filter(value.isNotNull())
              .select(value.alias("__v"), F.explode(F.array(*[
                  F.struct(F.lit(j).cast("int").alias("j"),
                           _cms_bucket(j, value, width)
                           .alias("bucket"))
                  for j in range(depth)])).alias("p"))
              .select("__v", F.col("p.j").alias("j"),
                      F.col("p.bucket").alias("bucket")))
    joined = probes.join(F.broadcast(table), ["j", "bucket"], "left")
    return (joined.groupBy("__v")
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias("est"))
            .select(F.col("__v").alias(col), "est"))


# --- HDR-style quantile sketch ---------------------------------------------

#: mantissa bits of the quantile histogram: buckets are
#: (exponent, 4-mantissa-bit) cells, so relative error <= 1/16
Q_MB = 4
Q_M = 1 << Q_MB


def quantile_bucket_col(v: Column) -> Column:
    """The HDR-histogram bucket id of a non-negative int64: values
    below 2^4 map to themselves (exact), larger values to
    ``(e - 4) * 16 + (v >> (e - 4))`` where ``e`` is the top bit
    index — derived from ``length(bin(v))``, NOT a float log2, so
    bucket boundaries are engine-exact (the HLL rank trick).  Bucket
    ids are monotone in ``v`` and each bucket spans < 1/16 of its
    lower bound."""
    e = F.length(F.bin(v)) - F.lit(1)
    sh = (e - F.lit(Q_MB)).cast("int")
    return F.when(v < Q_M, v).otherwise(
        (e - F.lit(Q_MB)) * F.lit(Q_M)
        + F.call_function("shiftright", v, sh)).cast("long")


def quantile_bucket_lo_col(b: Column) -> Column:
    """Lower-bound value of bucket ``b`` — the sketch's estimate."""
    s = F.floor(b / F.lit(Q_M)).cast("long")
    return F.when(b < Q_M, b).otherwise(
        F.call_function(
            "shiftleft", (F.pmod(b, F.lit(Q_M)) + F.lit(Q_M)),
            (s - F.lit(1)).cast("int"))).cast("long")


def quantile_sketch(df: DataFrame, value_col: str,
                    percentiles: tuple[int, ...] = (50, 90, 99)
                    ) -> DataFrame:
    """Mergeable quantile estimation at corpus scale — page sizes,
    token counts, fetch latencies over 10^10 rows — without the
    global sort an exact ``percentile_disc`` needs.  HDR-histogram
    buckets (exponent + 4 mantissa bits): every value folds into one
    of ~16·64 integer buckets, the per-bucket counts ARE the sketch
    (mergeable by addition, map-side partial agg), and each
    percentile reads the first bucket whose cumulative count reaches
    ``ceil(n * pct / 100)``.  Estimates are the bucket lower bound:
    ``estimate <= true < estimate * (1 + 1/16) + 1``, guaranteed, in
    pure int64 on any engine (no float log; pytest-gated against
    exact percentiles).

    Output: ``(pct, estimate, n)``, one row per requested
    percentile.

    Scale shape: one narrow bucket projection off the scan + ONE
    bucket-keyed groupBy with map-side partial counts (the only
    data-sized exchange carries bucket ids); the cumulative window
    and the percentile probe run over the few-hundred-row bucket
    table.  Negative values are clamped to bucket 0."""
    from pyspark.sql.window import Window

    v = F.greatest(F.col(value_col).cast("long"), F.lit(0))
    counts = (df.select(quantile_bucket_col(v).alias("b"))
              .groupBy("b").agg(F.count(F.lit(1)).alias("cnt")))
    w_cum = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cum = counts.select(
        "b", F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"))
    pcts = None
    for p in percentiles:
        row = F.struct(F.lit(int(p)).alias("pct"))
        pcts = F.array(row) if pcts is None else F.concat(
            pcts, F.array(row))
    p_df = cum.sparkSession.range(1).select(
        F.explode(pcts).alias("p")).select(F.col("p.pct").alias("pct"))
    hit = (cum.crossJoin(F.broadcast(p_df))
           .filter(F.col("cum") * 100
                   >= F.col("n") * F.col("pct"))
           .groupBy("pct")
           .agg(F.min("b").alias("b"), F.max("n").alias("n")))
    return hit.select(
        F.col("pct").cast("int").alias("pct"),
        quantile_bucket_lo_col(F.col("b")).alias("estimate"),
        F.col("n").cast("long").alias("n"))


def quantile_sketch_grouped(df: DataFrame, key: str, value_col: str,
                            percentiles: tuple[int, ...] = (50, 90, 99)
                            ) -> DataFrame:
    """Per-group percentiles at corpus scale — the realized form of
    the documented swap for exact grouped ``percentile`` (which
    buffers each group's values): one sketch per key, same
    HDR-histogram buckets as :func:`quantile_sketch`.

    Output: ``(key, pct, estimate, n)``.

    Scale shape / skew containment: the (key, bucket) aggregation
    with map-side partial counts caps ANY group's shuffle
    contribution at the bucket-table size (~16·64 rows) — a
    10^9-page host and a 10^3-page host ship the same few hundred
    rows, the grouped-HLL property again.  The cumulative window and
    the percentile probe then run per key over those bounded bucket
    rows (never the group's values)."""
    from pyspark.sql.window import Window

    v = F.greatest(F.col(value_col).cast("long"), F.lit(0))
    counts = (df.select(F.col(key), quantile_bucket_col(v).alias("b"))
              .groupBy(key, "b").agg(F.count(F.lit(1)).alias("cnt")))
    w_cum = Window.partitionBy(key).orderBy("b").rowsBetween(
        Window.unboundedPreceding, 0)
    w_all = Window.partitionBy(key)
    cum = counts.select(
        key, "b", F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"))
    pcts = F.array(*[F.struct(F.lit(int(p)).alias("pct"))
                     for p in percentiles])
    p_df = cum.sparkSession.range(1).select(
        F.explode(pcts).alias("p")).select(F.col("p.pct").alias("pct"))
    hit = (cum.crossJoin(F.broadcast(p_df))
           .filter(F.col("cum") * 100 >= F.col("n") * F.col("pct"))
           .groupBy(key, "pct")
           .agg(F.min("b").alias("b"), F.max("n").alias("n")))
    return hit.select(
        F.col(key),
        F.col("pct").cast("int").alias("pct"),
        quantile_bucket_lo_col(F.col("b")).alias("estimate"),
        F.col("n").cast("long").alias("n"))


# --- exact two-pass heavy hitters (Misra-Gries candidates) -------------------

def _mg_candidates(df: DataFrame, k: int) -> DataFrame:
    """Pass 1: per-partition Misra-Gries summaries over ``df.item``
    (already cast to string, NULL-free) — each task keeps at most
    ``k`` counters in memory and emits at most ``k`` candidate rows,
    whatever the partition's distinct cardinality.

    Merge rule (Agarwal et al., "Mergeable Summaries", PODS'12): sum
    counters, then if more than ``k`` survive, subtract the (k+1)-th
    largest value from all and drop the non-positive — the summary
    undercounts any item by at most N_p/(k+1), so every item with
    partition count > N_p/(k+1) keeps a positive counter.  By
    pigeonhole, any GLOBAL item with cnt·(k+1) > N appears with
    c_p·(k+1) > N_p in at least one partition, so the union of
    per-partition survivors is a complete candidate superset — the
    exactness of the second pass never depends on this summary's
    counts, only on that completeness."""
    import pandas as pd

    def mg(batches):
        run = None
        for pdf in batches:
            vc = pdf["item"].value_counts()
            run = vc if run is None else run.add(vc, fill_value=0)
            if len(run) > k:
                cut = run.sort_values(ascending=False).iloc[k]
                run = run - cut
                run = run[run > 0]
        items = [] if run is None else list(run.index)
        yield pd.DataFrame({"item": pd.Series(items, dtype=str)})

    return df.mapInPandas(mg, "item string")


def heavy_hitters(df: DataFrame, col: str, k: int = 8) -> DataFrame:
    """EXACT phi-heavy hitters (phi = 1/(k+1)) in two scans and no
    full-cardinality shuffle: every distinct value of ``df[col]``
    whose count strictly exceeds N/(k+1), with its exact count.

    A plain ``groupBy(col).count()`` answers this too — but its
    shuffle carries every per-partition-distinct key (the 10^10
    distinct-URL exchange at crawl scale).  Here pass 1 is MAP-ONLY
    (``k`` bounded counters per task, ≤ k candidate rows emitted per
    partition — see :func:`_mg_candidates`); pass 2 re-scans with the
    ≤ k·P candidate set broadcast, and its groupBy key is
    candidate-or-NULL, so the shuffle holds at most (candidates + 1)
    distinct keys however many distinct values the data has.  The
    result is partitioning-independent because the final test
    ``cnt·(k+1) > N`` uses pass-2's exact counts only.

    Output: ``(item, cnt, n)`` — n is the total non-NULL row count.
    """
    from pyspark.sql.window import Window

    vals = (df.filter(F.col(col).isNotNull())
            .select(F.col(col).cast("string").alias("item")))
    cand = _mg_candidates(vals, k).distinct()
    flagged = vals.join(
        F.broadcast(cand.withColumn("_hh", F.lit(True))),
        "item", "left")
    agg = (flagged
           .groupBy(F.when(F.col("_hh"), F.col("item")).alias("item"))
           .agg(F.count(F.lit(1)).alias("cnt")))
    # the unpartitioned window runs over the POST-aggregation frame
    # (<= candidates + 1 rows), not the data — one tiny single-task
    # pass that avoids rescanning df for the total
    n = F.sum("cnt").over(Window.partitionBy())
    return (agg.withColumn("n", n.cast("long"))
            .filter(F.col("item").isNotNull()
                    & (F.col("cnt") * F.lit(k + 1) > F.col("n")))
            .select("item", F.col("cnt").cast("long").alias("cnt"),
                    "n"))


# --- KMV distinct-set sketch (Bar-Yossef et al. 2002) ------------------------

#: KMV default size: relative error ~ 1/sqrt(k-2) ~ 13% at k=64;
#: estimates carry their integer anchors so callers can re-derive
KMV_K = 64


def _kmv_partition_mins(hashed: DataFrame, k: int) -> DataFrame:
    """Per-partition k smallest DISTINCT hash values (bounded memory,
    map-only) — the mergeable KMV summary: ≤ k rows per partition
    leave the scan, whatever the partition's cardinality."""
    import numpy as np
    import pandas as pd

    def mins(batches):
        arr = np.empty(0, dtype=np.int64)
        for pdf in batches:
            arr = np.unique(np.concatenate(
                [arr, pdf["h"].to_numpy(dtype=np.int64)]))[:k]
        yield pd.DataFrame({"h": arr})

    return hashed.mapInPandas(mins, "h long")


def kmv_mins(df: DataFrame, col: str, k: int = KMV_K) -> DataFrame:
    """The global KMV sketch of ``df[col]``'s distinct set: the k
    smallest distinct values of the portable 60-bit md5 hash
    (:func:`_hash60_col` — bit-identical in any engine with md5).

    Scale shape: hash natively JVM-side, per-partition bounded k-min
    pass (map-only), then distinct + ordered limit over ≤ k·P summary
    rows — never a shuffle of the full distinct set."""
    hashed = (df.filter(F.col(col).isNotNull())
              .select(_hash60_col(F.col(col)).alias("h")))
    return (_kmv_partition_mins(hashed, k)
            .distinct().orderBy("h").limit(k))


def kmv_overlap(df_a: DataFrame, col_a: str, df_b: DataFrame,
                col_b: str, k: int = KMV_K) -> DataFrame:
    """Distinct-set overlap between two corpora from their KMV
    sketches (Beyer et al., SIGMOD'07 distinct-value synopses): union
    cardinality from the k-th smallest hash of the merged sketch,
    intersection by counting union-sketch members present in BOTH
    input sketches.  The production shape for "how many distinct URLs
    do two crawl snapshots share" — each side ships a k-row sketch,
    never its key set, and sketches from different days/segments merge
    by re-taking k minima.

    Exact small regime: with fewer than k distinct union hashes the
    sketch IS the distinct set, so estimates equal exact counts.

    Output (one row): ``(k, n_union_sketch, kth_hash, matches_both,
    est_union, est_intersection)`` — integer anchors first, float
    estimates rounded to 2 (same IEEE ops in the oracle engine)."""
    a = kmv_mins(df_a, col_a, k)
    b = kmv_mins(df_b, col_b, k)
    u = (a.unionByName(b).distinct().orderBy("h").limit(k)
         .join(a.withColumn("_a", F.lit(True)), "h", "left")
         .join(b.withColumn("_b", F.lit(True)), "h", "left"))
    folded = u.agg(
        F.count(F.lit(1)).alias("n_u"),
        F.max("h").alias("kth_hash"),
        F.coalesce(F.sum(F.when(F.col("_a") & F.col("_b"), 1)
                         .otherwise(0)), F.lit(0)).alias("matches"))
    # (k-1)·2^60 / h_(k): both factors exactly representable doubles,
    # identical cast+divide in the oracle engine
    est_u = F.when(
        F.col("n_u") < k, F.col("n_u").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(float(1 << 60))
        / F.col("kth_hash").cast("double"))
    step = folded.select(
        F.lit(k).cast("long").alias("k"),
        F.col("n_u").cast("long").alias("n_union_sketch"),
        F.col("kth_hash").cast("long").alias("kth_hash"),
        F.col("matches").cast("long").alias("matches_both"),
        F.round(est_u, 2).alias("est_union"))
    # intersection scales the ROUNDED union estimate so the oracle
    # reproduces the arithmetic from the same published anchor; the
    # divisor is the SKETCH size (min(k, n_u)): below k the union
    # sketch is the complete distinct set, so the ratio collapses to
    # the exact match count
    return step.withColumn(
        "est_intersection",
        F.round(F.col("matches_both").cast("double")
                * F.col("est_union")
                / F.least(F.lit(k), F.col("n_union_sketch"))
                .cast("double"), 2))
