"""Exact edit-distance-1 fuzzy matching — near-identical URL/host/
title detection where token-level dedup (MinHash/Jaccard) is blind:
one-character typos, off-by-one numeric ids, singular/plural drift.

The scale problem: a naive edit-distance join is all-pairs (O(n²)
levenshtein calls — a BroadcastNestedLoop at best).  This module uses
the deletion-neighborhood trick (the FastSS family, Bocek et al.
2007): two strings at edit distance ≤ 1 ALWAYS share a member of
``{s} ∪ {s minus one character}`` — substitution shares the
both-sides deletion, insertion/deletion shares the shorter string,
equality shares itself.  So banding on md5(variant) has guaranteed
recall at d≤1; sharing a variant only bounds the distance by 2, so a
single native ``levenshtein`` verify per candidate makes the result
exact.  Everything is native Catalyst (transform/substr/md5/
levenshtein) — zero Python, zero UDF.

Scale shape: a string of length L emits L+1 variant rows (16-byte
digests, not the variants themselves would be an option at huge L —
here the band key IS the digest), one narrow exchange, a bucket
self-join whose output is proportional to true near-pair density,
then the verify filter.  Operates on DISTINCT strings — identical
texts collapse before banding (the dedup.py pre-collapse discipline:
a name repeated 10^9 times bands once); expand back to ids by
joining on the string.

``levenshtein ≤ 2`` needs the 2-deletion neighborhood (O(L²)
variants/string — the documented cost wall); prefer MinHash/Jaccard
above d=1 unless strings are short.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(col: Column) -> Column:
    """``{s} ∪ {s with character i removed}`` as a distinct array —
    all native (one transform over a length sequence; empty strings
    contribute just themselves)."""
    n = F.length(col)
    seq = F.when(n >= 1, F.sequence(F.lit(1), n)) \
        .otherwise(F.array().cast("array<int>"))
    dels = F.transform(
        seq,
        lambda i: F.concat(col.substr(F.lit(1), i - F.lit(1)),
                           col.substr(i + F.lit(1), n)))
    return F.array_distinct(F.concat(F.array(col), dels))


def edit1_pairs(names: DataFrame, col: str = "name") -> DataFrame:
    """All pairs of DISTINCT values of ``names[col]`` within
    Levenshtein distance ≤ 1: ``(name_a, name_b, dist)`` with
    ``name_a < name_b`` (each unordered pair once).  Exact — the
    deletion-neighborhood banding is recall-complete at d≤1 and the
    native ``levenshtein`` verify removes the d=2 false candidates
    banding admits."""
    t = F.col(col)
    nm = (names.filter(t.isNotNull())
          .select(t.alias("__t")).distinct())
    banded = nm.select(
        "__t",
        F.explode(deletion_variants(F.col("__t"))).alias("__v")
    ).select("__t", F.unhex(F.md5(F.col("__v"))).alias("__b"))
    a = banded.select(F.col("__t").alias("name_a"), "__b")
    b = banded.select(F.col("__t").alias("name_b"), "__b")
    return (a.join(b, "__b")
            .filter(F.col("name_a") < F.col("name_b"))
            .select("name_a", "name_b").distinct()
            .withColumn("dist", F.levenshtein("name_a", "name_b"))
            .filter(F.col("dist") <= 1))
