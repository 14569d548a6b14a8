"""Streaming CDX: incremental exactly-once line emission must match the
batch pipeline's output; windowed stats must match batch aggregation."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from cdx_writer_spark.job import CDXConfig, cdx_lines
from cdx_writer_spark.pages_gen import bulk_rows
from cdx_writer_spark.schema import PAGES_SCHEMA
from cdx_writer_spark.streaming import (
    cdx_stream_stats, pages_stream, run_cdx_stream,
)


def _read_lines(out_dir):
    lines = []
    for p in glob.glob(out_dir + "/part*"):
        lines += open(p, "rb").read().decode("latin1").splitlines()
    return sorted(lines)


def test_stream_matches_batch_and_is_incremental(spark, tmp_path):
    land = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rows = bulk_rows(400)
    a, b = rows[:250], rows[250:]

    spark.createDataFrame(a, PAGES_SCHEMA).write.mode("append").parquet(land)
    run_cdx_stream(spark, land, out, ckpt)
    first = _read_lines(out)
    assert 0 < len(first) < 250

    # second drain processes ONLY the delta (checkpoint bookkeeping)
    spark.createDataFrame(b, PAGES_SCHEMA).write.mode("append").parquet(land)
    run_cdx_stream(spark, land, out, ckpt)
    both = _read_lines(out)
    assert len(both) > len(first)

    batch = sorted(
        r.cdx_line for r in cdx_lines(
            spark.createDataFrame(rows, PAGES_SCHEMA),
            CDXConfig(), sort=False).collect())
    assert both == batch


def test_stream_stats_window_matches_batch(spark, tmp_path):
    land = str(tmp_path / "landing")
    rows = bulk_rows(300)
    spark.createDataFrame(rows, PAGES_SCHEMA).write.parquet(land)
    stats = cdx_stream_stats(pages_stream(spark, land), window="1 hour")
    q = (stats.writeStream.format("memory").queryName("stats_tbl")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {r.window_start: (r.num_records_processed,
                            r.num_records_included)
           for r in spark.sql("select * from stats_tbl").collect()}
    batch = (
        spark.createDataFrame(rows, PAGES_SCHEMA)
        .groupBy(F.window("warc_ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n")).collect())
    assert sum(n for n, _ in got.values()) == len(rows)
    assert len(got) == len(batch)
