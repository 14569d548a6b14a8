"""Similarity search over embedding columns (array<float>).

* :func:`cosine_topk` — exact brute-force top-k: broadcast the (small)
  query set, score with native higher-order functions (zip_with +
  aggregate, JVM-side, no Python), rank with a per-query window.
  At 100 TB this is the verification baseline and the final re-rank.
* :func:`lsh_bucket_topk` — the scale path: deterministic random
  hyperplanes (seeded by xxhash64 of (plane, dim), no RNG state), sign
  bits -> bucket key, candidates restricted to the query's bucket
  (optionally multi-probe by flipping bits), then exact re-rank inside
  buckets.  One shuffle on bucket key instead of a full cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        _as_double(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                q_id_col: str = "q_id", q_vec_col: str = "q_vec") -> DataFrame:
    """Exact top-k neighbors per query vector: (q_id, vec_id, cosine,
    rank).  Queries are broadcast; ties break on vec_id for determinism."""
    from pyspark.sql.window import Window

    scored = (
        emb.crossJoin(F.broadcast(queries))
        .withColumn("cosine",
                    F.round(cosine_col(F.col(vec_col), F.col(q_vec_col)), 4))
    )
    w = Window.partitionBy(q_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col(q_id_col), F.col(id_col), "cosine", "rank")
    )


def hyperplane_bucket_col(vec: Column, n_planes: int = 12) -> Column:
    """Deterministic LSH bucket id: sign pattern of `n_planes` pseudo-
    random hyperplanes, plane weights derived from xxhash64(plane, dim)
    mapped to [-0.5, 0.5) — reproducible across runs and cluster sizes
    (no RNG state, no broadcast of plane matrices)."""
    def plane_dot(p: Column) -> Column:
        return F.aggregate(
            F.zip_with(
                _as_double(vec),
                F.transform(F.sequence(F.lit(0), F.size(vec) - 1),
                            lambda d: (F.pmod(F.xxhash64(p, d), F.lit(1000))
                                       .cast("double") / 1000.0 - 0.5)),
                lambda x, w: x * w),
            F.lit(0.0), lambda acc, v: acc + v)

    bits = F.transform(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda p: F.when(plane_dot(p) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat_ws("", bits)


def lsh_bucket_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                    n_planes: int = 12, id_col: str = "vec_id",
                    vec_col: str = "embedding", q_id_col: str = "q_id",
                    q_vec_col: str = "q_vec") -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket;
    exact cosine re-rank within the bucket.  Recall < 1 by design — the
    brute-force `cosine_topk` is the correctness oracle."""
    from pyspark.sql.window import Window

    e = emb.withColumn("bucket", hyperplane_bucket_col(F.col(vec_col),
                                                       n_planes))
    q = queries.withColumn("bucket",
                           hyperplane_bucket_col(F.col(q_vec_col), n_planes))
    scored = (
        e.join(F.broadcast(q), "bucket")
        .withColumn("cosine",
                    F.round(cosine_col(F.col(vec_col), F.col(q_vec_col)), 4))
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col(q_id_col), F.col(id_col), "cosine", "rank")
    )


def embedding_near_dup_pairs(emb: DataFrame, threshold: float = 0.95,
                             n_planes: int = 10, id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs via bucketed self-join +
    exact verification (the embedding tier of the dedup suite)."""
    e = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                   hyperplane_bucket_col(F.col(vec_col), n_planes)
                   .alias("bucket"))
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .withColumn("cosine", F.round(cosine_col(F.col("a.v"),
                                                 F.col("b.v")), 4))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                "cosine")
    )
