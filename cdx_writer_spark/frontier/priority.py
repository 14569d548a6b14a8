"""Deterministic priority frontier + per-host top-k selection.

Frontier ordering (north star: "host-rank + depth lexicographic key"):
within a host, fetch shallower pages first, then lexicographic SURT;
across hosts the key ranks higher-quality hosts first.  The ordering
is a **total order** over (host, depth, surt_key) — no partition-order
dependence, no un-ordered ``limit()`` — so the scheduled batch is
byte-identical at any parallelism (the two-cluster-size determinism
gate; tests run local[2] vs local[8] vs local[32]).

Scale notes: the window partitions by host, so the shuffle key is
``host``.  Hot hosts (crawl-hot-host skew) bound the window partition
at *frontier-pending-per-host* rows; AQE skew-split cannot split a
window partition, so for pathological hosts the loop first caps
per-host candidates with a cheap salted pre-aggregation: the same
window over ``(host, salt)`` with a higher cap, then the exact window
over the survivors — a two-level tournament that keeps every partition
under ~2× median.  The sandbox graph's hot hosts stay well inside one
task, so the pre-pass is gated by ``salt_threshold``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SALT_BUCKETS = 16


def _order_cols():
    return [F.asc("depth"), F.asc("surt_key")]


def select_batch(candidates: DataFrame,
                 salt_threshold: int | None = None) -> DataFrame:
    """Per-host top-``budget_per_round`` by (depth, surt_key), with the
    global priority rank attached.  Input: politeness.apply_robots
    output (has ``budget_per_round``)."""
    if salt_threshold is not None:
        # two-level tournament for hot hosts: per-(host, salt) cap first
        salted = candidates.withColumn(
            "_salt", F.pmod(F.xxhash64("surt_key"), F.lit(SALT_BUCKETS)))
        w_pre = Window.partitionBy("host", "_salt").orderBy(*_order_cols())
        candidates = (
            salted.withColumn("_pre_rank", F.row_number().over(w_pre))
            .filter(F.col("_pre_rank") <= salt_threshold)
            .drop("_salt", "_pre_rank")
        )
    w = Window.partitionBy("host").orderBy(*_order_cols())
    return (
        candidates.withColumn("host_pos", F.row_number().over(w))
        .filter(F.col("host_pos") <= F.col("budget_per_round"))
    )


def recrawl_policy(observations: DataFrame,
                   key: str = "surt_key", ts_col: str = "ts",
                   digest_col: str = "digest",
                   fast_millis: int = 500,
                   medium_millis: int = 100) -> DataFrame:
    """Adaptive revisit scheduling (Cho & Garcia-Molina 2003,
    "Effective page refresh policies for web crawlers"): estimate
    each URL's change rate from its snapshot history — successive
    (ts, payload-digest) observations across crawls — and bucket it
    into revisit tiers the scheduler can join against.  The
    estimator is the observed change fraction in integer MILLIS
    (``1000 * n_changes div n_intervals``), exact int64 on any
    engine.

    Tiers: ``fast`` (rate >= fast_millis), ``medium`` (>=
    medium_millis), ``slow`` (observed stable), ``unknown`` (a
    single observation — no interval evidence yet; crawl it on the
    discovery cadence).

    Output: ``(key, n_obs, n_changes, change_millis, tier)``;
    ``change_millis`` is NULL for ``unknown``.

    Scale shape: ONE hash exchange on the key serves both the
    per-key lag window (change detection between consecutive
    observations, ordered by ts with digest tie-break for
    determinism under duplicate timestamps) and the per-key
    aggregate — Catalyst reuses the partitioning.  State per key is
    its own observation count (snapshot count, single digits in
    practice), so no skew beyond key frequency; the output is one
    row per URL, the frontier-sized table the scheduler already
    handles."""
    w = Window.partitionBy(key).orderBy(ts_col, digest_col)
    prev = F.lag(digest_col).over(w)
    obs = observations.select(
        key,
        F.when(prev.isNotNull() & (prev != F.col(digest_col)),
               F.lit(1)).otherwise(F.lit(0)).cast("long")
        .alias("__rc_chg"),
        F.when(prev.isNotNull(), F.lit(1)).otherwise(F.lit(0))
        .cast("long").alias("__rc_int"))
    per_key = obs.groupBy(key).agg(
        (F.sum("__rc_int") + 1).cast("long").alias("n_obs"),
        F.sum("__rc_chg").cast("long").alias("n_changes"),
        F.sum("__rc_int").alias("__rc_n_int"))
    rate = F.expr("(1000 * n_changes) div __rc_n_int")
    return per_key.select(
        key, "n_obs", "n_changes",
        F.when(F.col("__rc_n_int") > 0, rate).cast("long")
        .alias("change_millis"),
        F.when(F.col("__rc_n_int") == 0, F.lit("unknown"))
        .when(rate >= fast_millis, F.lit("fast"))
        .when(rate >= medium_millis, F.lit("medium"))
        .otherwise(F.lit("slow")).alias("tier"))
