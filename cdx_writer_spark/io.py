"""Table I/O seam: the north rule runs over **Iceberg** tables of
Common-Crawl-style pages; this sandbox has no Iceberg catalog, so
every job reads/writes parquet paths with Iceberg-append semantics
(documented at each call site).  This module makes the switch a
CONFIG, not a code change: pass ``--table-format iceberg`` (or set
``SPARK_GRAFT_TABLE_FORMAT=iceberg``) on a cluster with an Iceberg
catalog and the same jobs read catalog identifiers via
``spark.read.format("iceberg")`` / append via ``DataFrame.writeTo``.

``auto`` inference keeps the common cases zero-config: a reference
that looks like a filesystem path (contains a path separator, or ends
in ``.parquet``) is parquet; a dotted catalog identifier
(``prod.web.pages``) is Iceberg.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

FORMATS = ("auto", "parquet", "iceberg")


def resolve_format(ref: str, fmt: str | None = None) -> str:
    """Resolve to a concrete format for ``ref``.  Precedence: an
    explicit non-auto ``fmt`` wins; ``auto`` (or None) consults the
    SPARK_GRAFT_TABLE_FORMAT env default; a non-auto env value wins
    over inference — so jobs that pass their ``--table-format auto``
    argparse default straight through still honor the env switch."""
    f = (fmt or "auto").lower()
    if f not in FORMATS:
        raise ValueError(f"unknown table format {f!r}; "
                         f"expected one of {FORMATS}")
    if f == "auto":
        f = os.environ.get("SPARK_GRAFT_TABLE_FORMAT", "auto").lower()
        if f not in FORMATS:
            raise ValueError(f"unknown table format {f!r} (from "
                             f"SPARK_GRAFT_TABLE_FORMAT); "
                             f"expected one of {FORMATS}")
    if f != "auto":
        return f
    if "/" in ref or os.sep in ref or ref.endswith(".parquet"):
        return "parquet"
    if "." in ref:  # dotted catalog identifier, e.g. prod.web.pages
        return "iceberg"
    return "parquet"


def load_table(spark: SparkSession, ref: str,
               fmt: str | None = None) -> DataFrame:
    """Read a pages/eval/target table from a parquet path or an
    Iceberg catalog identifier."""
    if resolve_format(ref, fmt) == "iceberg":
        return spark.read.format("iceberg").load(ref)
    return spark.read.parquet(ref)


def save_table(df: DataFrame, ref: str, fmt: str | None = None,
               mode: str = "error") -> None:
    """Write ``df`` to a parquet path or an Iceberg table.  Iceberg
    writes use the V2 ``writeTo`` API: ``append`` for the
    snapshot-append semantics every frontier/corpus commit assumes,
    ``createOrReplace`` for ``overwrite``, create-fresh for
    ``error``."""
    if resolve_format(ref, fmt) == "iceberg":
        w = df.writeTo(ref)
        if mode == "append":
            w.append()
        elif mode == "overwrite":
            w.createOrReplace()
        else:
            w.create()
        return
    df.write.mode(mode).parquet(ref)
