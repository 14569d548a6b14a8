"""Benchmark / test-set decontamination for training corpora.

The standard pre-training hygiene step (GPT-3 appendix C, Llama, The
Pile): any document sharing an n-gram (n = 13 words by convention)
with a held-out evaluation set is flagged so the corpus build can drop
or scrub it — otherwise eval answers leak into the training data.

Scale shape (the 100 TB path):

* Both sides reduce to 16-byte BINARY ``unhex(md5)`` n-gram digests
  before any exchange (md5's hex string form would double the
  shuffled bytes); n-gram TEXT never shuffles.
* The corpus side explodes per-document DISTINCT n-grams (the within-
  document dedup happens before the exchange, so a document repeating
  one banned phrase k times contributes one probe row, not k).
* The join against the banned set is left PLAIN deliberately: eval
  sets are usually small enough that AQE broadcasts them from runtime
  bytes, but a forced broadcast hint would be a scale bug the moment
  someone decontaminates against a large corpus slice (the same
  failure mode as an unbounded verify-prune broadcast).  Hit counting
  aggregates map-side on doc_id.
* The final outcome join back onto the corpus is doc_id-keyed; with a
  doc_id-bucketed source it is exchange-free on the wide side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import shingles_col


def banned_ngram_digests(test_docs: DataFrame, n: int = 13,
                         text_col: str = "text") -> DataFrame:
    """The distinct 16-byte binary digests of every word n-gram in
    the held-out set: one column ``_h``.  Documents shorter than n words
    contribute their whole text as a single n-gram (the
    :func:`~cdx_writer_spark.functions.dedup.shingles_col` fallback),
    so short eval rows are still protected."""
    return (
        test_docs
        .select(F.explode(shingles_col(F.col(text_col), k=n)).alias("_s"))
        .select(F.unhex(F.md5("_s")).alias("_h"))
        .distinct()
    )


def decontaminate(docs: DataFrame, banned: DataFrame, n: int = 13,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per-document contamination outcome against a banned-digest set
    (built by :func:`banned_ngram_digests` with the same ``n``).

    Returns one row per input document: ``(id, n_hits, contaminated)``
    where ``n_hits`` counts the document's DISTINCT n-grams that appear
    in the banned set.  The caller applies the policy (drop the doc,
    route it to scrubbing, …) — flagging and policy are separate so the
    flag table can be audited before anything is deleted."""
    probes = docs.select(
        F.col(id_col),
        F.explode(shingles_col(F.col(text_col), k=n)).alias("_s"),
    ).select(id_col, F.unhex(F.md5("_s")).alias("_h"))
    hits = (
        probes.join(banned, "_h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )
