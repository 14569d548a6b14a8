"""AQE skew-join evidence: the engine's stated 100 TB answer for
skewed equi-joins (docs/SCALE.md) is "leave the join unhinted and let
AQE split hot partitions".  This pins that the mechanism actually
fires on this Spark build under a hot-key layout — the final adaptive
plan must carry ``SortMergeJoin(skew=true)`` over an ``AQEShuffleRead
skewed`` — and that the split changes no results (same aggregate as a
broadcast-join recompute of the identical relation).

Thresholds are lowered so a ~300k-row local input exhibits what a
multi-GB hot partition exhibits at production defaults (256 MB
threshold, factor 5); the *shape* under test is scale-independent.
"""

from __future__ import annotations

import pyspark.sql.functions as F

_CONF = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
        "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def _skewed_frames(spark):
    # 90% of rows share key 0; the rest spread over 63 keys, so the
    # hot shuffle partition is >> factor x median and > threshold
    left = spark.range(300_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise(F.col("id") % 64).alias("k"),
        F.col("id").alias("payload"))
    right = spark.range(64).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("rv"))
    return left, right


def test_aqe_splits_hot_partition_and_preserves_result(spark):
    saved = {k: spark.conf.get(k, None) for k in _CONF}
    try:
        for k, v in _CONF.items():
            spark.conf.set(k, v)
        left, right = _skewed_frames(spark)
        agg = (left.join(right, "k")
               .select(F.sum(F.col("payload") + F.col("rv"))
                       .alias("s")))
        got = agg.collect()[0]["s"]
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan
        assert "AQEShuffleRead skewed" in plan
        # identical relation through the broadcast path — the skew
        # split must not duplicate or drop any matched row
        want = (left.join(F.broadcast(right), "k")
                .select(F.sum(F.col("payload") + F.col("rv"))
                        .alias("s")).collect()[0]["s"])
        assert got == want
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
