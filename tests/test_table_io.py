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


def test_corpus_job_end_to_end_in_iceberg_mode(spark, tmp_path,
                                               monkeypatch):
    """The full corpus job in ``--table-format iceberg`` against a
    SIMULATED catalog (no Iceberg runtime in this sandbox): a
    dict-of-tables backs ``DataFrame.writeTo`` and
    ``read.format('iceberg')``, so the REAL io.py branch executes end
    to end — every read and the final write must route through the V2
    identifiers with catalog-append semantics (create on a fresh
    table, refuse a duplicate create), and the clean corpus must land
    in the catalog, never on a parquet path."""
    import importlib.util
    import json
    import os
    import sys

    import pyspark.sql.readwriter as rw
    # patch the CLASSIC subclass: the abstract pyspark.sql.DataFrame
    # parent's writeTo is overridden there, so patching the parent
    # would not intercept real frames
    from pyspark.sql import SparkSession
    from pyspark.sql.classic.dataframe import DataFrame

    from cdx_writer_spark.webview import pages_from_documents

    catalog: dict[str, str] = {}          # ref -> backing parquet dir
    calls: list[tuple] = []
    store = str(tmp_path / "catalog_store")

    def register(ref, df, mode):
        path = os.path.join(store, ref.replace(".", "__"))
        if mode == "create":
            if ref in catalog:
                raise ValueError(f"table {ref} already exists")
            df.write.parquet(path)
        elif mode == "append":
            if ref not in catalog:
                raise ValueError(f"append to missing table {ref}")
            df.write.mode("append").parquet(path)
        else:
            df.write.mode("overwrite").parquet(path)
        catalog[ref] = path

    class FakeV2Writer:
        def __init__(self, df, ref):
            self._df, self._ref = df, ref

        def append(self):
            calls.append(("append", self._ref))
            register(self._ref, self._df, "append")

        def createOrReplace(self):
            calls.append(("createOrReplace", self._ref))
            register(self._ref, self._df, "replace")

        def create(self):
            calls.append(("create", self._ref))
            register(self._ref, self._df, "create")

    class FakeIcebergReader:
        def __init__(self, sp):
            self._sp = sp

        def load(self, ref):
            calls.append(("read", ref))
            return self._sp.read.parquet(catalog[ref])

    real_format = rw.DataFrameReader.format

    def fake_format(self, f):
        if f == "iceberg":
            return FakeIcebergReader(self._spark
                                     if hasattr(self, "_spark")
                                     else spark)
        return real_format(self, f)

    monkeypatch.setattr(DataFrame, "writeTo",
                        lambda self, ref: FakeV2Writer(self, ref))
    monkeypatch.setattr(rw.DataFrameReader, "format", fake_format)
    # the job ends with spark.stop(); keep the shared test session
    monkeypatch.setattr(SparkSession, "stop", lambda self: None)

    # seed the catalog with the pages table
    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    register("web.crawl.pages", pages, "replace")
    calls.clear()

    stats_file = str(tmp_path / "stats.json")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "corpus_job_under_test",
        os.path.join(repo, "jobs", "corpus_job.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv", [
        "corpus_job.py", "web.crawl.pages", "web.corpus.clean",
        "--table-format", "iceberg", "--stats-file", stats_file,
        "--cpus", "4"])
    mod.main()

    # reads and the final write routed through the catalog
    assert ("read", "web.crawl.pages") in calls
    assert ("create", "web.corpus.clean") in calls
    # the job's post-write verification read also used the catalog
    assert ("read", "web.corpus.clean") in calls
    # nothing escaped to a literal parquet path named like the ref
    assert not os.path.exists("web.corpus.clean")

    stats = json.load(open(stats_file))
    got = spark.read.parquet(catalog["web.corpus.clean"])
    assert got.count() == stats["clean_docs"] > 0
    assert {"doc_id", "url", "clean_text"} <= set(got.columns)

    # append-only catalog semantics survive the seam: a second create
    # of the same identifier must refuse (Iceberg CREATE TABLE
    # semantics), an append must extend
    import pytest as _pytest

    with _pytest.raises(ValueError, match="already exists"):
        table_io.save_table(got.limit(1), "web.corpus.clean",
                            "iceberg", mode="error")
    n0 = spark.read.parquet(catalog["web.corpus.clean"]).count()
    table_io.save_table(got.limit(5), "web.corpus.clean", "iceberg",
                        mode="append")
    assert spark.read.parquet(
        catalog["web.corpus.clean"]).count() == n0 + 5
