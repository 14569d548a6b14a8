"""Deterministic corpus sampling — the selection primitives a
training-data build runs between hygiene and mixing (hold-out carves,
ablation subsets, per-language balancing).  Randomness is replaced by
portable content hashing (md5 over a salt + the row id), so any
engine — and any rerun — reproduces the exact sample: a sample that
cannot be reproduced cannot be audited, and at 100 TB re-drawing one
is a full-corpus pass.

Two tiers, same spirit as the exact-vs-sketch split elsewhere in the
repo:

* :func:`stratified_sample` — EXACT per-stratum proportions via a
  hash-ordered ranking window: within each stratum the kept set is
  the first ``ceil(n * num / den)`` rows by md5 order.  ONE
  stratum-keyed exchange (both windows — rank and stratum size —
  share it).  The documented 10^10-row caveat: a stratum is one
  window partition, so a single stratum dominating the corpus
  serializes into few tasks — for corpus-scale strata use the hash
  tier below, which needs no exchange at all.
* :func:`hash_sample` — shuffle-free threshold sampling: keep a row
  iff the first 4 hex digits of its salted md5 compare below a
  threshold derived from ``rate_num / 65536``.  A pure projection
  (map-only at any scale); the achieved fraction is exact in
  expectation and binomially concentrated, not exact per stratum.

Both are Column-level specs simple enough for a DuckDB oracle to run
verbatim (md5 hex and lexicographic compare agree across engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sample_key_col(id_col: Column, salt: str) -> Column:
    """The portable per-row sampling key: lowercase md5 hex of
    ``salt || id``.  Distinct salts give independent samples; the
    same salt reproduces the same sample anywhere."""
    return F.md5(F.concat(F.lit(salt), id_col.cast("string")))


def stratified_sample(df: DataFrame, stratum_col: str,
                      id_col: str = "doc_id",
                      rate_num: int = 1, rate_den: int = 10,
                      salt: str = "sample") -> DataFrame:
    """Exact-proportion stratified sample: within each stratum keep
    the first ``ceil(n_stratum * rate_num / rate_den)`` rows ranked
    by (md5 key, id).  Returns the kept rows as ``(id, stratum,
    sample_rank, n_stratum)`` — rank and stratum size ride along so
    downstream mixing can weight without re-counting.

    Both windows (rank, size) partition on the stratum, so Catalyst
    plans ONE exchange; the ceil is the integer identity
    ``(n*num + den - 1) div den`` — no floats anywhere, which is what
    lets the oracle match row-for-row."""
    key = sample_key_col(F.col(id_col), salt)
    w_rank = Window.partitionBy(stratum_col).orderBy(
        key.asc(), F.col(id_col).asc())
    w_all = Window.partitionBy(stratum_col)
    ranked = df.select(
        F.col(id_col), F.col(stratum_col),
        F.row_number().over(w_rank).alias("sample_rank"),
        F.count(F.lit(1)).over(w_all).alias("n_stratum"))
    quota = F.expr(
        f"(n_stratum * {int(rate_num)} + {int(rate_den)} - 1) "
        f"div {int(rate_den)}")
    return (ranked.filter(F.col("sample_rank") <= quota)
            .select(id_col, stratum_col,
                    F.col("sample_rank").cast("int").alias("sample_rank"),
                    F.col("n_stratum").cast("long").alias("n_stratum")))


def hash_threshold(rate_num: int) -> str:
    """The 4-hex-digit threshold string for ``rate_num / 65536``:
    rows whose key prefix compares lexicographically below it are
    kept.  Lowercase hex compare is identical in every engine."""
    if not 0 <= int(rate_num) <= 65536:
        raise ValueError(f"rate_num {rate_num} outside [0, 65536]")
    return format(int(rate_num), "04x")


def hash_sample(df: DataFrame, id_col: str = "doc_id",
                rate_num: int = 6554, salt: str = "sample") -> DataFrame:
    """Shuffle-free deterministic sample at ``rate_num / 65536``
    (default ≈ 10%): keep a row iff the first 4 hex digits of its
    salted md5 key are below :func:`hash_threshold`.  A pure
    projection — map-only at 10^10 rows, and the kept set is a pure
    function of (salt, id) so independent jobs (or engines) agree on
    it without coordination."""
    key = sample_key_col(F.col(id_col), salt)
    return df.filter(
        F.substring(key, 1, 4) < F.lit(hash_threshold(rate_num)))
