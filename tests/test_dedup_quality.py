"""Ground-truth quality gates for the APPROXIMATE dedup tier.

The reference's ethos is golden-output verification
(/root/reference/tests/test_small_warcs.py:108-143); the exact CDX
pipeline honors that byte-for-byte.  These tests apply the same bar to
the operators the reference doesn't have: MinHash-LSH and SimHash
near-dup results are checked against EXACT all-pairs recomputations
(tractable at test scale via a crossJoin ground truth that the
production operators never use).

Everything is deterministic (xxhash64 seeds, synthetic corpus from
index arithmetic), so the measured recalls are stable run-to-run and
the asserted floors are meaningful regressions gates, not flaky
statistics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdx_writer_spark.functions import dedup

# --- synthetic corpus with KNOWN near-duplicate structure --------------------
#
# 30 base docs of 30 tokens each (disjoint vocabularies), and for each
# base: a near-dup with 1 token replaced (3-shingle Jaccard ~ 25/31 =
# 0.81) and a moderate variant with 6 tokens replaced (J ~ 0.33, below
# every threshold used here).

N_BASE = 30
TOKENS_PER_DOC = 30


def _corpus_rows():
    rows = []
    for i in range(N_BASE):
        toks = [f"w{i}_{j}" for j in range(TOKENS_PER_DOC)]
        rows.append((i * 10, " ".join(toks)))
        near = list(toks)
        near[7] = f"x{i}_near"
        rows.append((i * 10 + 1, " ".join(near)))
        mod = list(toks)
        for j in range(6):
            mod[j * 5] = f"x{i}_mod{j}"
        rows.append((i * 10 + 2, " ".join(mod)))
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(_corpus_rows(), "doc_id long, text string")


def _exact_jaccard_pairs(corpus):
    """ALL-pairs exact shingle Jaccard — the ground truth.  Quadratic
    crossJoin: test-scale only, never a production path."""
    sh = corpus.select(
        F.col("doc_id").alias("id"),
        dedup.shingles_col(F.col("text")).alias("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.crossJoin(b)
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            (F.size(F.array_intersect("a.sh", "b.sh")).cast("double")
             / F.size(F.array_union("a.sh", "b.sh"))).alias("jaccard"))
    )


def test_minhash_lsh_recall_and_precision(spark, corpus):
    """minhash_lsh_dedup vs exact all-pairs Jaccard:

    * precision 1: every returned pair truly has J >= threshold, with
      the exact Jaccard value attached;
    * recall >= 0.9 for pairs with J >= 0.8 (theory: band-match prob
      1-(1-J^4)^8 = 0.985 at J=0.8; deterministic here, measured 1.0).
    """
    threshold = 0.7
    got = {(r.id_a, r.id_b): r.jaccard
           for r in dedup.minhash_lsh_dedup(
               corpus, threshold=threshold).collect()}
    exact = {(r.id_a, r.id_b): r.jaccard
             for r in _exact_jaccard_pairs(corpus).collect()}

    # the corpus really contains high-similarity pairs (non-vacuous)
    high = {p for p, j in exact.items() if j >= 0.8}
    assert len(high) >= N_BASE

    # precision: nothing below threshold, values match exact
    for pair, j in got.items():
        assert round(exact[pair], 4) == j
        assert j >= threshold

    # recall on the high tier
    found_high = high & set(got)
    recall = len(found_high) / len(high)
    assert recall >= 0.9, f"minhash recall {recall} on J>=0.8 pairs"


def test_minhash_lsh_rejects_moderate_pairs(spark, corpus):
    """Pairs engineered at J ~ 0.33 (6/30 tokens replaced) never pass
    the 0.7 exact-Jaccard verification, whatever the LSH recalls."""
    got = set((r.id_a, r.id_b) for r in dedup.minhash_lsh_dedup(
        corpus, threshold=0.7).collect())
    moderate = {(i * 10, i * 10 + 2) for i in range(N_BASE)}
    assert not (got & moderate)


def test_simhash_banded_equals_exact_hamming(spark, corpus):
    """simhash_near_pairs must equal the EXACT all-pairs Hamming <= 3
    set — the 4x16-bit banding is a guarantee, not a heuristic: <= 3
    bit flips cannot touch all 4 disjoint 16-bit bands (pigeonhole), so
    every qualifying pair shares at least one band verbatim."""
    got = {(r.id_a, r.id_b): r.hamming
           for r in dedup.simhash_near_pairs(
               corpus, max_hamming=3).collect()}

    sh = corpus.select(F.col("doc_id").alias("id"),
                       dedup.simhash_hex_col("text").alias("simhash"))
    a, b = sh.alias("a"), sh.alias("b")
    ham = F.expr(
        "aggregate(sequence(1, 16), 0, (acc, i) -> acc + "
        "bit_count(cast(conv(substring(sh_a, i, 1), 16, 10) as int) "
        "^ cast(conv(substring(sh_b, i, 1), 16, 10) as int)))")
    exact = {(r.id_a, r.id_b): r.hamming for r in (
        a.crossJoin(b).filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.simhash").alias("sh_a"),
                F.col("b.simhash").alias("sh_b"))
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= 3)).collect()}

    # non-vacuous: 1-token perturbations land within Hamming 3
    assert len(exact) > 0
    assert got == exact
