"""Deduplication operators for web-text corpora.

Scale design: every variant is shuffle-minimal —
* exact/normalized dedup is one hash-partitioned groupBy on a 16-byte
  digest (map-side partial aggregation; no payload shuffle, only the
  digest + id);
* MinHash-LSH is entirely native (higher-order functions + xxhash64):
  shingle → L-signature → b bands, then ONE shuffle on (band, band_hash)
  to bucket candidates, a bucket self-join bounded by bucket size, and
  exact-Jaccard verification of candidates only;
* SimHash reduces each doc to a 64-bit key; near-dup candidates share a
  rotated prefix (here: exact-key groups + banded 16-bit chunks).

At 100 TB the groupBy keys are uniformly-distributed hashes, so no
salting is needed; AQE handles residual bucket skew in the LSH join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import normalized_text_col, tokens_col


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """One surviving id per byte-identical text: (text_hash, keep_id,
    n_dups)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"),
             F.count(F.lit(1)).alias("n_dups"))
    )


def normalized_dedup(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Dedup after lowercase/punctuation/whitespace normalization."""
    return (
        df.select(F.md5(normalized_text_col(F.col(text_col)))
                  .alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"),
             F.count(F.lit(1)).alias("n_dups"))
    )


# --- MinHash + LSH ---------------------------------------------------------

def shingles_col(text: Column, k: int = 3) -> Column:
    """Word k-shingles as an array (deduplicated)."""
    toks = tokens_col(text)
    return F.array_distinct(
        F.when(
            F.size(toks) >= k,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def minhash_signature_col(shingles: Column, num_hashes: int = 32) -> Column:
    """L-element MinHash signature, seed-varied via xxhash64(seed, s) —
    fully native, no Python."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda j: F.array_min(
            F.transform(shingles, lambda s: F.xxhash64(j, s))),
    )


def minhash_lsh_candidates(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", num_hashes: int = 32,
                           bands: int = 8) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing >=1 LSH band."""
    rows = num_hashes // bands
    sig = (
        df.select(F.col(id_col).alias("id"),
                  shingles_col(F.col(text_col)).alias("sh"))
        .withColumn("sig", minhash_signature_col(F.col("sh"), num_hashes))
    )
    banded = sig.select(
        "id", "sh",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(F.concat_ws(
                        ",", F.transform(F.slice(F.col("sig"),
                                                 b * rows + 1, rows),
                                         lambda v: v.cast("string")))
                               ).alias("bucket")),
            )
        ).alias("bb"),
    ).select("id", "sh", F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.sh").alias("sh_a"), F.col("b.sh").alias("sh_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_lsh_dedup(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", threshold: float = 0.7,
                      num_hashes: int = 32, bands: int = 8) -> DataFrame:
    """Verified near-dup pairs: LSH candidates filtered by exact Jaccard
    over shingle sets (computed only for candidates)."""
    cand = minhash_lsh_candidates(df, text_col, id_col, num_hashes, bands)
    jac = (
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.size(F.array_union("sh_a", "sh_b"))
    )
    return (
        cand.withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard over LSH-bucketed candidates (scale path);
    semantics identical to an all-pairs Jaccard above the threshold for
    pairs the LSH recalls."""
    return minhash_lsh_dedup(df, text_col, id_col, threshold=threshold)


# --- SimHash ---------------------------------------------------------------

def simhash_hex_col(text_expr: str, bands: int = 4,
                    bits_per_band: int = 16) -> Column:
    """64-bit SimHash as a 16-hex-char string, fully native SQL.

    Per-token xxhash64 values are bound ONCE via a single-element
    transform() lambda, then each 16-bit chunk is a bit-majority vote
    folded with base-2 accumulation (chunks avoid int64 sign overflow
    under ANSI mode and double as Hamming-neighbor band keys: docs within
    small Hamming distance share at least one identical chunk).
    `text_expr` is a SQL expression for the text column.
    """
    toks = "array_distinct(split(trim(lower({t})), '\\\\s+'))".format(
        t=text_expr)
    hashes = "transform({toks}, t -> xxhash64(t))".format(toks=toks)
    chunk_tpl = (
        "lpad(hex(aggregate(sequence({hi}, {lo}, -1), 0, (acc, i) -> "
        "acc * 2 + if(size(filter(h, x -> (shiftright(x, i) & 1) = 1)) * 2 "
        ">= size(h), 1, 0))), {w}, '0')"
    )
    chunks = []
    for b in range(bands - 1, -1, -1):
        chunks.append(chunk_tpl.format(
            hi=b * bits_per_band + bits_per_band - 1,
            lo=b * bits_per_band,
            w=bits_per_band // 4))
    return F.expr(
        "transform(array({hashes}), h -> concat({chunks}))[0]".format(
            hashes=hashes, chunks=", ".join(chunks)))


def simhash_band_struct_col(text_expr: str, bands: int = 4,
                            bits_per_band: int = 16) -> Column:
    """The same SimHash as an array of band hex strings, for banded
    Hamming-candidate joins (explode -> groupBy band index+value)."""
    toks = "array_distinct(split(trim(lower({t})), '\\\\s+'))".format(
        t=text_expr)
    hashes = "transform({toks}, t -> xxhash64(t))".format(toks=toks)
    chunk_tpl = (
        "lpad(hex(aggregate(sequence({hi}, {lo}, -1), 0, (acc, i) -> "
        "acc * 2 + if(size(filter(h, x -> (shiftright(x, i) & 1) = 1)) * 2 "
        ">= size(h), 1, 0))), {w}, '0')"
    )
    chunks = [chunk_tpl.format(hi=b * bits_per_band + bits_per_band - 1,
                               lo=b * bits_per_band, w=bits_per_band // 4)
              for b in range(bands)]
    return F.expr(
        "transform(array({hashes}), h -> array({chunks}))[0]".format(
            hashes=hashes, chunks=", ".join(chunks)))


def simhash_dedup(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Docs grouped by identical SimHash (exact-collision tier)."""
    return (
        df.select(F.col(id_col),
                  simhash_hex_col(text_col).alias("simhash"))
        .groupBy("simhash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def simhash_near_pairs(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by banded SimHash: candidates share >=1 of 4
    16-bit bands (guaranteed recall for Hamming distance <= 3), then the
    true bit distance verifies."""
    base = df.select(
        F.col(id_col).alias("id"),
        simhash_hex_col(text_col).alias("simhash"),
        simhash_band_struct_col(text_col).alias("sbands"))
    banded = base.select(
        "id", "simhash",
        F.posexplode("sbands").alias("band", "bval"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bval") == F.col("b.bval"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.simhash").alias("sh_a"),
                F.col("b.simhash").alias("sh_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # Hamming distance between the two 64-bit values via their hex forms
    ham = F.expr(
        "aggregate(sequence(1, 16), 0, (acc, i) -> acc + "
        "bit_count(cast(conv(substring(sh_a, i, 1), 16, 10) as int) "
        "^ cast(conv(substring(sh_b, i, 1), 16, 10) as int)))")
    return (cand.withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))
