"""Table-format seam: format resolution (paths vs Iceberg catalog
identifiers), env default, and the parquet round trip the sandbox can
execute (the Iceberg branch is exercised on a cluster with a catalog;
here it is pinned to the right reader/writer API calls by monkeypatch
so a drive-by refactor cannot silently re-route it to parquet)."""

from __future__ import annotations

import pytest

from cdx_writer_spark import io as table_io


@pytest.mark.parametrize("ref,want", [
    ("/data/pages.parquet", "parquet"),
    ("out_dir/corpus", "parquet"),
    ("pages.parquet", "parquet"),
    ("prod.web.pages", "iceberg"),
    ("catalog.db.tbl", "iceberg"),
    ("bare_name", "parquet"),
])
def test_auto_inference(ref, want):
    assert table_io.resolve_format(ref) == want


def test_explicit_format_wins():
    assert table_io.resolve_format("prod.web.pages", "parquet") \
        == "parquet"
    assert table_io.resolve_format("/a/b.parquet", "iceberg") \
        == "iceberg"


def test_env_default(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_TABLE_FORMAT", "iceberg")
    assert table_io.resolve_format("/a/b.parquet") == "iceberg"
    # the env must also win when a job passes its argparse default
    # 'auto' through explicitly (corpus_job does)
    assert table_io.resolve_format("/a/b.parquet", "auto") == "iceberg"
    # ...but an explicit non-auto fmt beats the env
    assert table_io.resolve_format("/a/b.parquet", "parquet") \
        == "parquet"
    monkeypatch.setenv("SPARK_GRAFT_TABLE_FORMAT", "bogus")
    with pytest.raises(ValueError, match="unknown table format"):
        table_io.resolve_format("x")


def test_parquet_round_trip(spark, tmp_path):
    df = spark.range(5).selectExpr("id", "id * 2 AS v")
    ref = str(tmp_path / "t.parquet")
    table_io.save_table(df, ref)
    got = table_io.load_table(spark, ref)
    assert sorted(r["v"] for r in got.collect()) == [0, 2, 4, 6, 8]


def test_iceberg_branch_uses_v2_writer(spark):
    """No catalog in the sandbox — pin that the Iceberg branch calls
    spark.read.format('iceberg').load(ref) and DataFrame.writeTo(ref)
    with the right mode mapping."""
    calls = []

    class FakeWriteTo:
        def __init__(self, ref):
            calls.append(("writeTo", ref))

        def append(self):
            calls.append(("append",))

        def createOrReplace(self):
            calls.append(("createOrReplace",))

        def create(self):
            calls.append(("create",))

    df = spark.range(1)
    object.__setattr__(df, "writeTo", lambda ref: FakeWriteTo(ref))
    table_io.save_table(df, "cat.db.t", mode="append")
    table_io.save_table(df, "cat.db.t", mode="overwrite")
    table_io.save_table(df, "cat.db.t", mode="error")
    assert calls == [("writeTo", "cat.db.t"), ("append",),
                     ("writeTo", "cat.db.t"), ("createOrReplace",),
                     ("writeTo", "cat.db.t"), ("create",)]

    class FakeReader:
        def __init__(self):
            self.fmt = None

        def format(self, f):
            calls.append(("format", f))
            return self

        def load(self, ref):
            calls.append(("load", ref))
            return "sentinel"

    class FakeSpark:
        read = FakeReader()

    calls.clear()
    out = table_io.load_table(FakeSpark(), "cat.db.t")
    assert out == "sentinel"
    assert calls == [("format", "iceberg"), ("load", "cat.db.t")]
