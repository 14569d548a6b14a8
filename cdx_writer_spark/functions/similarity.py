"""Similarity search over embedding columns (array<float>).

* :func:`cosine_topk` — exact brute-force top-k: broadcast the (small)
  query set, score with native higher-order functions (zip_with +
  aggregate, JVM-side, no Python), rank with a per-query window.
  At 100 TB this is the verification baseline and the final re-rank.
* :func:`lsh_bucket_topk` — the scale path: deterministic random
  hyperplanes (seeded by xxhash64 of (plane, dim), no RNG state), sign
  bits -> bucket key, candidates restricted to the query's bucket,
  then exact re-rank inside buckets.  One shuffle on bucket key
  instead of a full cross join.  ``n_probes > 1`` enables multi-probe
  (Lv et al., VLDB'07 adapted to sign-bit LSH): the QUERY side also
  probes the buckets reached by flipping its lowest-margin sign bits
  — the planes whose dot product is closest to 0, i.e. the most
  likely misassignments — trading a small constant factor of (tiny,
  broadcast) query rows for recall.  The data side never re-hashes
  and never fans out, so the extra probes are free at corpus scale.
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


def topk_per_query(scored: DataFrame, k: int, q_id_col: str = "q_id",
                   id_col: str = "vec_id",
                   score_col: str = "cosine") -> DataFrame:
    """Two-stage exact top-k over a scored frame: (q_id, id, score, rank).

    Stage 1 ranks within (q_id, input-partition) — the exchange key
    carries ``spark_partition_id`` so parallelism is #partitions ×
    #queries, and only the narrow (q_id, id, score) projection moves
    (the wide vector columns are pruned before the exchange).  Stage 2
    merges the ≤ k×P survivors per query in a tiny final window.  This
    replaces the single window keyed on q_id alone, which funnels the
    entire scored scan into #queries reducer tasks (a serialization
    point at a 100 TB scan with a handful of queries).

    Both stages order by (score desc, id asc), so the result is
    identical to the one-window form at any partitioning.
    """
    from pyspark.sql.window import Window

    narrow = (
        scored.select(q_id_col, id_col, score_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    order = [F.desc(score_col), F.asc(id_col)]
    w_local = Window.partitionBy(q_id_col, "_pid").orderBy(*order)
    survivors = (
        narrow.withColumn("_local_rank", F.row_number().over(w_local))
        .filter(F.col("_local_rank") <= k)
    )
    w_final = Window.partitionBy(q_id_col).orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, score_col, "rank")
    )


def cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                q_id_col: str = "q_id", q_vec_col: str = "q_vec") -> DataFrame:
    """Exact top-k neighbors per query vector: (q_id, vec_id, cosine,
    rank).  Queries are broadcast; scoring is a map-only stage; the
    ranking is the two-stage :func:`topk_per_query` (no full-scan
    exchange keyed on q_id).  Ties break on vec_id for determinism."""
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .withColumn("cosine",
                    F.round(cosine_col(F.col(vec_col), F.col(q_vec_col)), 4))
    )
    return topk_per_query(scored, k, q_id_col, id_col)


def hyperplane_bucket_col(vec: Column, n_planes: int = 12,
                          plane_offset: int = 0,
                          portable: bool = False) -> Column:
    """Deterministic LSH bucket id: sign pattern of `n_planes` pseudo-
    random hyperplanes, plane weights derived from a seeded hash of
    (plane, dim) mapped to [-0.5, 0.5) — reproducible across runs and
    cluster sizes (no RNG state, no broadcast of plane matrices).
    ``plane_offset`` shifts the plane index range so banded callers get
    independent plane sets per band.

    ``portable``: weights come from the first 12 hex chars of
    md5('p,d') — a 48-bit integer, so ``value / 2^48 - 0.5`` is EXACT
    in binary double in any engine (48 < 53 mantissa bits; the divisor
    is a power of two).  With both engines folding the dot product
    left-to-right over identical doubles, the sign bits — hence the
    buckets — are bit-identical, which is what lets the DuckDB oracle
    re-derive the bucketed ANN pipeline end-to-end."""
    bits = F.transform(
        F.sequence(F.lit(plane_offset),
                   F.lit(plane_offset + n_planes - 1)),
        lambda p: F.when(_plane_dot(vec, p, portable) >= 0,
                         F.lit("1")).otherwise(F.lit("0")))
    return F.concat_ws("", bits)


def _plane_weight(p: Column, d: Column, portable: bool) -> Column:
    """The (plane, dim) pseudo-random weight in [-0.5, 0.5).  The ONE
    definition shared by the data-side bucket and the query-side probe
    margins — probe bucket 0 must equal the data bucket bit-for-bit,
    so this derivation must never fork."""
    if portable:
        h = F.md5(F.concat(p.cast("string"), F.lit(","),
                           d.cast("string")))
        return (F.conv(F.substring(h, 1, 12), 16, 10).cast("double")
                / F.lit(float(1 << 48)) - 0.5)
    return (F.pmod(F.xxhash64(p, d), F.lit(1000)).cast("double")
            / 1000.0 - 0.5)


def _plane_dot(vec: Column, p: Column, portable: bool) -> Column:
    """Signed dot product of ``vec`` with plane ``p`` — same
    left-to-right fold on both the bucket and the probe path (the fold
    order is part of the cross-engine bit-identity contract)."""
    return F.aggregate(
        F.zip_with(
            _as_double(vec),
            F.transform(F.sequence(F.lit(0), F.size(vec) - 1),
                        lambda d: _plane_weight(p, d, portable)),
            lambda x, w: x * w),
        F.lit(0.0), lambda acc, v: acc + v)


def _plane_dots_col(vec: Column, n_planes: int,
                    portable: bool = False) -> Column:
    """Per-plane signed dot products as an array<double> — the raw
    margins behind :func:`hyperplane_bucket_col`'s sign bits (plane
    offset 0; built on the same :func:`_plane_dot`, so
    ``dots[i] >= 0`` iff bucket bit i is '1')."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda p: _plane_dot(vec, p, portable))


def probe_buckets_col(vec: Column, n_planes: int, n_probes: int,
                      portable: bool = False) -> Column:
    """Multi-probe bucket list for a query vector: element 0 is the
    vector's own bucket (identical to :func:`hyperplane_bucket_col`);
    elements 1..n_probes-1 flip ONE sign bit each, in ascending order
    of the plane's |margin| (the hyperplanes the vector sits closest
    to — the likeliest misassignments).  All buckets are distinct by
    construction (each flips a different bit), so the probe join never
    duplicates candidate pairs.  Pure Catalyst; the dots array and the
    base bit-string are lambda-bound (``bind_once``) so neither is
    re-evaluated per probe."""
    from .dedup import bind_once

    n_probes = max(1, min(n_probes, n_planes + 1))
    dots = _plane_dots_col(vec, n_planes, portable)

    def build(ds: Column) -> Column:
        bits = F.concat_ws("", F.transform(
            ds, lambda d: F.when(d >= 0, F.lit("1")).otherwise(F.lit("0"))))
        # plane indices by ascending |margin| (struct sort: m, then i)
        order = F.transform(
            F.array_sort(F.zip_with(
                ds, F.sequence(F.lit(0), F.lit(n_planes - 1)),
                lambda d, i: F.struct(F.abs(d).alias("m"),
                                      i.alias("i")))),
            lambda s: s["i"])

        def flips(bts: Column) -> Column:
            return F.concat(
                F.array(bts),
                F.transform(
                    F.slice(order, 1, n_probes - 1),
                    lambda i: F.concat(
                        bts.substr(F.lit(1), i),
                        F.when(bts.substr(i + 1, F.lit(1)) == "1",
                               F.lit("0")).otherwise(F.lit("1")),
                        bts.substr(i + 2, F.lit(n_planes) - i - 1))))

        return bind_once(bits, flips)

    return bind_once(dots, build)


def lsh_bucket_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                    n_planes: int = 12, id_col: str = "vec_id",
                    vec_col: str = "embedding", q_id_col: str = "q_id",
                    q_vec_col: str = "q_vec",
                    portable: bool = False, n_probes: int = 1) -> DataFrame:
    """Approximate top-k: candidates share one of the query's
    ``n_probes`` hyperplane buckets (1 = the query's own bucket only;
    >1 adds lowest-margin bit-flip probes, see
    :func:`probe_buckets_col` — only the tiny broadcast query side
    fans out, the corpus is hashed once); exact cosine re-rank within
    the probed buckets.  Recall < 1 by design, rising monotonically
    with ``n_probes`` — the brute-force `cosine_topk` is the
    exhaustive baseline (and with ``portable`` hyperplanes the DuckDB
    oracle replicates the single-probe pipeline exactly, buckets
    included)."""
    e = emb.withColumn("bucket", hyperplane_bucket_col(
        F.col(vec_col), n_planes, portable=portable))
    if n_probes <= 1:
        q = queries.withColumn("bucket", hyperplane_bucket_col(
            F.col(q_vec_col), n_planes, portable=portable))
    else:
        q = queries.withColumn("bucket", F.explode(probe_buckets_col(
            F.col(q_vec_col), n_planes, n_probes, portable)))
    scored = (
        e.join(F.broadcast(q), "bucket")
        .withColumn("cosine",
                    F.round(cosine_col(F.col(vec_col), F.col(q_vec_col)), 4))
    )
    return topk_per_query(scored, k, q_id_col, id_col)


def _codebook_row(cents: DataFrame) -> DataFrame:
    """Aggregate a (cid, cvec) codebook into ONE row holding a
    cid-sorted array of (cid, cvec) structs — the broadcastable form
    every assignment stage cross-joins onto the scan (collect_list
    order is partition-dependent; array_sort on the leading cid field
    restores determinism)."""
    return cents.agg(F.array_sort(F.collect_list(
        F.struct(F.col("cid"), F.col("cvec")))).alias("_codebook"))


def _nearest_cells(vec: Column, n: int) -> Column:
    """The ``n`` best cells of ``_codebook`` for ``vec``: highest
    cosine, ties toward the lower centroid id.  ``n == 1`` (the
    per-VECTOR assignment, i.e. the hot path every IVF/IVF-PQ index
    build runs over the whole corpus) takes a single ``array_max``
    pass instead of sorting all C scored cells per row — identical
    element by the same lexicographic (cos, neg_cid) order the sort
    used, O(C) instead of O(C log C).  Multi-cell probes (per-QUERY,
    tiny row count) keep the sort."""
    scored = F.transform(
        F.col("_codebook"),
        lambda c: F.struct(
            F.round(cosine_col(vec, c["cvec"]), 9).alias("cos"),
            (-c["cid"]).alias("neg_cid")))
    if n == 1:
        return F.array(-F.array_max(scored)["neg_cid"])
    top = F.slice(F.reverse(F.array_sort(scored)), 1, n)
    return F.transform(top, lambda s: -s["neg_cid"])


def kmeans_codebook(emb: DataFrame, n_centroids: int = 8,
                    n_iter: int = 4, quant: int = 1024,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Train an IVF codebook with spherical Lloyd iterations, fully
    distributed and **deterministic at any partitioning**.

    Why this is safe to run on 100 TB where naive KMeans is not:

    * Inputs are quantized to the ``1/quant`` grid (``quant`` a power
      of two), so every per-cell coordinate sum is a dyadic rational
      with bounded denominator — IEEE double addition of such values
      is EXACT (no rounding while ``|sum|*quant < 2^53``), hence
      **order-independent**: the same codebook falls out at 2 or 2000
      partitions, and re-runs are byte-identical (the property the
      determinism test pins).
    * The mean recomputation is a posexplode over (cell, pos, val)
      with map-side partial ``sum``/``count`` aggregation — a narrow
      3-column shuffle of size rows×dim, never a ``collect()``; the
      codebook itself only ever materializes as ``n_centroids`` rows.
    * Assignment reuses the broadcast one-row codebook cross-join of
      :func:`ivf_topk` — a map-only stage, no shuffle.

    Seeding is deterministic: the ``n_centroids`` lowest-id vectors.
    Cells that lose all members keep their previous centroid.  Means
    are re-quantized to the grid so the NEXT iteration's sums stay
    exact.  Assignment scores by cosine (scale-invariant), so this is
    spherical k-means; pass the result as ``codebook=`` to
    :func:`ivf_topk`.
    """
    qgrid = F.lit(float(quant))
    q = emb.select(
        F.col(id_col).cast("long").alias("_id"),
        F.transform(_as_double(F.col(vec_col)),
                    lambda x: F.round(x * qgrid) / qgrid).alias("_qv"))
    cents = (q.orderBy("_id").limit(n_centroids)
             .select(F.col("_id").alias("cid"), F.col("_qv").alias("cvec"))
             .persist())
    cents.count()
    for _ in range(n_iter):
        cb = _codebook_row(cents)
        assigned = q.crossJoin(F.broadcast(cb)).select(
            "_qv", _nearest_cells(F.col("_qv"), 1)[0].alias("cell"))
        means = (
            assigned.select("cell", F.posexplode("_qv").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.sum("val").alias("s"), F.count("*").alias("c"))
            .select("cell", "pos",
                    (F.round(F.col("s") / F.col("c") * qgrid) / qgrid)
                    .alias("m")))
        new_cents = (
            means.groupBy("cell")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"]).alias("cvec"))
            .select(F.col("cell").alias("cid"), "cvec"))
        prev = cents
        cents = (prev.select("cid", F.col("cvec").alias("_prev"))
                 .join(new_cents, "cid", "left")
                 .select("cid",
                         F.coalesce(F.col("cvec"), F.col("_prev"))
                         .alias("cvec"))
                 .persist())
        cents.count()   # materialize: keeps the unrolled-loop lineage flat
        prev.unpersist()
    return cents


def ivf_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
             centroid_stride: int = 37, nprobe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "q_id", q_vec_col: str = "q_vec",
             codebook: DataFrame | None = None) -> DataFrame:
    """IVF-flat approximate top-k: assign every vector to its nearest
    centroid cell, probe the query's ``nprobe`` nearest cells, exact
    cosine re-rank inside them.

    The codebook is a DataFrame ``(cid long, cvec array<float>)``
    **broadcast as data**: it is aggregated into a single cid-sorted
    array row and broadcast-cross-joined onto the scan, so cell
    assignment is a map-only stage over a constant-size plan — no
    shuffle, no Python, and no driver ``collect()`` inlining centroid
    literals into the expression tree (which at a real codebook size —
    thousands of centroids × dims — is a driver/codegen bomb; the plan
    test pins the Broadcast + compact-plan shape).  Pass ``codebook``
    to use trained centers (e.g. Spark ML KMeans ``clusterCenters``);
    the default is the deterministic stand-in a correctness oracle can
    replicate: centroids are the vectors with
    ``id % centroid_stride == 0``.

    Assignment ties (identical rounded cosine to two centroids) break
    toward the lower centroid id, mirrored by the SQL oracle; the
    9-decimal rounding absorbs cross-engine float-summation noise.
    """
    cents = codebook if codebook is not None else (
        emb.filter(F.col(id_col) % centroid_stride == 0).select(
            F.col(id_col).cast("long").alias("cid"),
            F.col(vec_col).alias("cvec")))
    if cents.limit(1).count() == 0:
        raise ValueError("no centroids: stride larger than id range "
                         "(or empty codebook)")
    cb = _codebook_row(cents)
    assigned = emb.crossJoin(F.broadcast(cb)).select(
        F.col(id_col), F.col(vec_col),
        _nearest_cells(F.col(vec_col), 1)[0].alias("cell"))
    q_cells = queries.crossJoin(F.broadcast(cb)).select(
        F.col(q_id_col), F.col(q_vec_col),
        F.explode(_nearest_cells(F.col(q_vec_col), nprobe)).alias("cell"))
    # each vector lives in exactly ONE cell and the query's nprobe
    # cells are distinct, so the join matches any (query, vector) pair
    # at most once — no dedup (and no shuffle) needed
    scored = (
        assigned.join(F.broadcast(q_cells), "cell")
        .withColumn("cosine",
                    F.round(cosine_col(F.col(vec_col), F.col(q_vec_col)), 4))
    )
    return topk_per_query(scored, k, q_id_col, id_col)


def embedding_near_dup_pairs(emb: DataFrame, threshold: float = 0.95,
                             bands: int = 4, planes_per_band: int = 8,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             max_bucket_size: int | None = None,
                             verify_broadcast_limit: int | None = None
                             ) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded LSH self-join +
    exact verification (the embedding tier of the dedup suite).

    OR-amplification: each vector gets ``bands`` bucket keys (sign
    pattern of ``planes_per_band`` hyperplanes, plane indices disjoint
    per band); a candidate pair shares ≥ 1 (band, bucket); exact cosine
    then verifies, so precision is 1 by construction and recall is
    1-(1-p^r)^b for angular similarity p.  A pair of exactly-parallel
    vectors (e.g. v and 2v: doubling is lossless in binary float, so
    every plane dot scales by exactly 2 and no sign flips) is caught
    with probability 1 — the property the oracle-checked planted-clone
    query relies on.

    Blowup/width control (see functions.dedup module docstring):
    byte-identical vectors collapse to one representative before
    banding (identical-cluster pairs come straight from membership at
    cosine 1); the banding exchange carries only (band, bucket, gkey)
    — never the vectors, which are re-joined for the surviving
    DISTINCT candidate pairs only; ``max_bucket_size`` optionally
    drops (and logs) degenerate buckets.  No all-pairs join anywhere.
    """
    from .dedup import (_banded_candidate_pairs, _exact_groups,
                        _expand_rep_pairs, _intra_group_pairs,
                        _persist_candidates, _pruned_reps)

    # vector identity key: float32 -> string is injective for distinct
    # values, so equal keys == byte-equal vectors
    gkey = F.md5(F.concat_ws(",", F.transform(
        F.col(vec_col), lambda x: x.cast("string"))))
    membership, reps = _exact_groups(emb, gkey, id_col,
                                     F.col(vec_col), "v")
    # `v` is an AGGREGATE output (first(v)) — always materialized, so
    # referencing it per plane is a cheap attribute read and needs no
    # bind_once barrier (measured: binding it here costs ~2x in array
    # copies; contrast dedup._minhash_banded, where the referenced
    # column is a collapsible projection expression)
    banded = reps.select(
        "gkey",
        F.explode(F.array(*[
            F.struct(
                F.lit(band).alias("band"),
                hyperplane_bucket_col(
                    F.col("v"), planes_per_band,
                    plane_offset=band * planes_per_band).alias("bucket"))
            for band in range(bands)])).alias("bb"),
    ).select("gkey", F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket"))
    # persist: tiny by construction but its lineage is the banding
    # pipeline, and it is consumed three times below
    cand = _persist_candidates(_banded_candidate_pairs(
        banded, ["band", "bucket"], max_bucket_size))
    # re-join vectors for the surviving candidate keys only (size-gated
    # broadcast prune) — the wide reps never stream through the verify
    v_verify = _pruned_reps(reps, cand, verify_broadcast_limit)
    va = v_verify.select(F.col("gkey").alias("gkey_a"),
                         F.col("v").alias("v_a"))
    vb = v_verify.select(F.col("gkey").alias("gkey_b"),
                         F.col("v").alias("v_b"))
    rep_pairs = (
        cand.join(va, "gkey_a").join(vb, "gkey_b")
        .withColumn("cosine", F.round(cosine_col(F.col("v_a"),
                                                 F.col("v_b")), 4))
        .filter(F.col("cosine") >= threshold)
        .select("gkey_a", "gkey_b", "cosine")
    )
    inter = _expand_rep_pairs(rep_pairs, membership, "cosine")
    # byte-equal vectors: cosine rounds to exactly 1.0 (|1 - s/√s·√s|
    # is a couple of ulps), matching the all-pairs oracle's value
    intra = _intra_group_pairs(membership, F.lit(1.0), "cosine") \
        .filter(F.lit(threshold) <= 1.0)
    return inter.unionByName(intra).select("id_a", "id_b", "cosine")


#: default centroid-sampling rate for semdedup's derived codebook:
#: Abbas et al. 2023 cluster with ~0.1% of N centroids, which keeps
#: the EXPECTED cell size near 1/rate (~1000) at ANY corpus size —
#: the property a fixed-count codebook lacks (fixed cells ⇒ cell
#: size grows linearly with the corpus ⇒ the within-cell self-join
#: goes quadratic at 100 TB).
SEMDEDUP_CELLS_FRAC = 0.001


def semdedup_codebook(emb: DataFrame, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      cells_frac: float = SEMDEDUP_CELLS_FRAC
                      ) -> DataFrame:
    """Corpus-tracking default codebook: hash-sample ``cells_frac``
    of the vectors as centroids.  Sampling by RATE
    (``pmod(xxhash64(id), round(1/frac)) == 0``) rather than by a
    fixed count or an id-stride needs NO count job, is independent of
    id density/range, and automatically grows the codebook with the
    corpus — expected cell size stays ~``1/cells_frac`` whether N is
    10^5 or 10^10.  For production-quality cells pass a trained
    :func:`kmeans_codebook` instead; this is the scale-safe zero-cost
    default."""
    stride = max(1, int(round(1.0 / cells_frac)))
    return emb.filter(
        F.pmod(F.xxhash64(F.col(id_col).cast("long")),
               F.lit(stride)) == 0).select(
        F.col(id_col).cast("long").alias("cid"),
        F.col(vec_col).alias("cvec"))


def semdedup(emb: DataFrame, threshold: float = 0.95,
             centroid_stride: int | None = None,
             id_col: str = "vec_id",
             vec_col: str = "embedding",
             codebook: DataFrame | None = None,
             cells_frac: float = SEMDEDUP_CELLS_FRAC) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster-scoped
    semantic deduplication — assign every embedding to its nearest
    centroid cell, build the within-cell cosine ≥ ``threshold`` pair
    graph, and keep exactly ONE vector per connected duplicate group
    (the minimum id; everything else points at it as ``keeper``).
    Connected components — not a greedy drop-if-any-lower-id-neighbor
    rule — so a chain a~b, b~c with a≁c still keeps one member and
    every ``keeper`` is itself a KEPT row (the greedy rule both
    over-deletes and can emit keepers that were themselves dropped).
    Returns one row per input vector: ``(vec_id, cell, keeper,
    kept)`` with ``keeper`` NULL on kept rows.

    Scale shape: cell assignment is the same broadcast-codebook
    map-only stage as ``ivf_topk`` (no shuffle, no Python, no driver
    centroid literals); the within-cell self-join is the algorithm's
    published cost model — pairwise cosine confined to a cell, the
    codebook sized WITH the corpus (the paper uses ~0.1% of N
    clusters) so cells stay bounded and no all-pairs join ever
    materializes (a skewed cell is a mis-sized codebook, not a plan
    problem).  The component step runs on the NEAR-DUP PAIRS only
    (two int64 columns, O(log n) star rounds — see
    dedup.connected_components), not the corpus.

    Codebook selection: ``codebook`` (a trained ``(cid, cvec)``
    frame, e.g. :func:`kmeans_codebook`) wins; else an explicit
    ``centroid_stride`` keeps the legacy id-modulo sampling (fixed
    cell COUNT — oracle-replicable, but cells grow linearly with the
    corpus, so reserve it for bounded inputs); else the DEFAULT is
    :func:`semdedup_codebook` — rate-based hash sampling whose cell
    sizes stay ~``1/cells_frac`` at any N, with a lowest-ids fallback
    when the corpus is too small for the rate to sample anything.
    """
    if codebook is not None:
        cents = codebook
    elif centroid_stride is not None:
        cents = emb.filter(F.col(id_col) % centroid_stride == 0) \
            .select(F.col(id_col).cast("long").alias("cid"),
                    F.col(vec_col).alias("cvec"))
    else:
        cents = semdedup_codebook(emb, id_col, vec_col, cells_frac)
        if cents.limit(1).count() == 0:
            # corpus smaller than ~1/cells_frac rows: any handful of
            # centroids is fine at this size, and the orderBy/limit
            # only ever runs on such tiny inputs
            cents = emb.orderBy(F.col(id_col)).limit(8).select(
                F.col(id_col).cast("long").alias("cid"),
                F.col(vec_col).alias("cvec"))
    if cents.limit(1).count() == 0:
        raise ValueError("no centroids: stride larger than id range "
                         "(or empty codebook/corpus)")
    from .dedup import _persist_candidates

    cb = _codebook_row(cents)
    # the assigned frame feeds three consumers (both self-join legs +
    # the final keeper join): persist it once instead of re-running
    # the codebook cross-join per leg (registered in the candidate-
    # cache registry; release_candidate_caches() frees it)
    asg = _persist_candidates(
        emb.crossJoin(F.broadcast(cb)).select(
            F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col),
            _nearest_cells(F.col(vec_col), 1)[0].alias("cell")))
    a = asg.select(F.col("vec_id").alias("a_id"),
                   F.col(vec_col).alias("a_vec"), "cell")
    b = asg.select(F.col("vec_id").alias("b_id"),
                   F.col(vec_col).alias("b_vec"), "cell")
    from .dedup import connected_components

    pairs = (
        a.join(b, "cell")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(F.round(cosine_col(F.col("a_vec"), F.col("b_vec")), 4)
                >= threshold)
        .select("a_id", "b_id")
    )
    comp = connected_components(pairs, id_a="a_id", id_b="b_id")
    kept = F.col("component").isNull() | (F.col("component")
                                          == F.col("vec_id"))
    return (
        asg.join(comp, asg["vec_id"] == comp["id"], "left")
        .select("vec_id", "cell",
                F.when(~kept, F.col("component")).alias("keeper"),
                kept.alias("kept"))
    )


# --- product quantization (PQ) ------------------------------------------------

def l2sq_col(a: Column, b: Column) -> Column:
    """Squared L2 distance, left-fold order (matches the SQL oracle's
    ordered list fold)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b),
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_codebook_row(emb: DataFrame, ksub: int = 16, stride: int = 31,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Deterministic PQ codebook as ONE broadcastable row: ``_pq`` is
    an array of the ``ksub`` full centroid vectors (double), in
    ascending source-id order.  Centroid ``c``'s subvector for
    subspace ``j`` is ``slice(_pq[c], j*d+1, d)`` — the same array
    serves every subspace, so no per-subspace transpose materializes.

    Like :func:`ivf_topk`'s modulo codebook this is the oracle-
    replicable stand-in (vectors with ``id % stride == 0``, first
    ``ksub`` by id); pass any trained ``(cid, cvec)`` frame through
    the same aggregation for production (e.g. per-subspace k-means via
    :func:`kmeans_codebook` on sliced views).
    """
    from pyspark.sql.window import Window

    sel = emb.filter(F.col(id_col) % stride == 0).select(
        F.col(id_col).cast("long").alias("_cid"),
        _as_double(F.col(vec_col)).alias("_cv"))
    # single-task window: the stride-filtered codebook side is tiny by
    # construction (same shape as kmeans_codebook's seeding)
    ranked = sel.withColumn(
        "_r", F.row_number().over(Window.orderBy("_cid"))) \
        .filter(F.col("_r") <= ksub)
    return ranked.agg(F.transform(
        F.array_sort(F.collect_list(F.struct("_r", "_cv"))),
        lambda s: s["_cv"]).alias("_pq"))


def pq_codes_col(vec: Column, m: int, d: int) -> Column:
    """PQ code array (length ``m``, values 0-based centroid ranks) for
    ``vec`` against the in-scope ``_pq`` codebook column: per subspace
    the argmin squared-L2 centroid, ties to the lower rank (struct
    ``array_min`` orders (dist, idx) lexicographically).  Distances
    round to 9 decimals so cross-engine float-summation noise cannot
    flip an argmin the oracle re-derives."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.array_min(F.transform(
            F.col("_pq"),
            lambda cv, ci: F.struct(
                F.round(l2sq_col(F.slice(vec, j * d + 1, d),
                                 F.slice(cv, j * d + 1, d)), 9)
                .alias("dist"),
                ci.alias("idx"))))["idx"])


def pq_encode(emb: DataFrame, m: int = 8, ksub: int = 16,
              stride: int = 31, dim: int | None = None,
              id_col: str = "vec_id", vec_col: str = "embedding",
              codebook: DataFrame | None = None) -> DataFrame:
    """Encode every vector to an ``m``-byte PQ code: (id, codes).

    This is the 100 TB memory story for similarity search: a 64-dim
    float vector is 256 bytes; its code is ``m`` small ints (8 here,
    16x smaller — 256x with dim=1536/m=48 production shapes).  The
    downstream ADC scan reads ONLY the code column (column pruning),
    never the vectors.  Encoding is a map-only stage over a broadcast
    one-row codebook — no shuffle, no Python, no driver collect of
    centroid literals (same plan discipline as :func:`ivf_topk`).
    """
    if dim is None:
        dim = len(emb.select(vec_col).limit(1).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    cb = codebook if codebook is not None else pq_codebook_row(
        emb, ksub, stride, id_col, vec_col)
    return emb.crossJoin(F.broadcast(cb)).select(
        F.col(id_col),
        pq_codes_col(F.col(vec_col), m, dim // m).alias("codes"))


def pq_topk(emb: DataFrame, queries: DataFrame, k: int = 5, m: int = 8,
            ksub: int = 16, stride: int = 31, dim: int | None = None,
            id_col: str = "vec_id", vec_col: str = "embedding",
            q_id_col: str = "q_id", q_vec_col: str = "q_vec",
            codebook: DataFrame | None = None) -> DataFrame:
    """PQ-ADC approximate top-k by inner product: (q_id, vec_id,
    approx_ip, rank).

    Asymmetric distance computation: each query precomputes a lookup
    table ``lut[j][c] = <q_subvec_j, centroid_{c} subvec_j>`` (an
    m x ksub grid, rounded to 9 decimals); a data vector's approximate
    inner product is the sum of its ``m`` table entries — the scan
    touches only the code column and a broadcast LUT, so the per-row
    cost is m array lookups + adds regardless of dim.  Scale shape:
    encode and score are both map-only over broadcasts; the only
    exchange is :func:`topk_per_query`'s narrow two-stage rank.  Ties
    break to the lower vec_id; the SQL oracle re-derives codebook,
    codes, LUTs and ranking exactly (left-fold ordered sums + round-9
    grid on both sides).
    """
    if dim is None:
        dim = len(emb.select(vec_col).limit(1).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d = dim // m
    cb = codebook if codebook is not None else pq_codebook_row(
        emb, ksub, stride, id_col, vec_col)
    codes = pq_encode(emb, m, ksub, stride, dim, id_col, vec_col,
                      codebook=cb)
    lut = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.transform(
            F.col("_pq"),
            lambda cv: F.round(dot_col(F.slice(F.col(q_vec_col),
                                               j * d + 1, d),
                                       F.slice(cv, j * d + 1, d)), 9)))
    q_lut = queries.crossJoin(F.broadcast(cb)).select(
        F.col(q_id_col), lut.alias("_lut"))
    scored = codes.crossJoin(F.broadcast(q_lut)).select(
        q_id_col, id_col,
        F.round(F.aggregate(
            F.zip_with(F.col("codes"), F.col("_lut"),
                       lambda c, row: F.element_at(row, c + 1)),
            F.lit(0.0), lambda acc, v: acc + v), 4).alias("approx_ip"))
    return topk_per_query(scored, k, q_id_col, id_col,
                          score_col="approx_ip")


def ivfpq_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
               m: int = 8, ksub: int = 16, pq_stride: int = 31,
               centroid_stride: int = 37, nprobe: int = 2,
               dim: int | None = None,
               id_col: str = "vec_id", vec_col: str = "embedding",
               q_id_col: str = "q_id", q_vec_col: str = "q_vec",
               ivf_codebook: DataFrame | None = None,
               pq_codebook: DataFrame | None = None) -> DataFrame:
    """IVF-PQ approximate top-k — the production ANN shape (Faiss
    IVFADC without residual encoding): a coarse quantizer restricts
    the scan to the query's ``nprobe`` cells, and WITHIN them vectors
    are ranked by the PQ-ADC approximate inner product over their
    ``m``-byte codes.

    Scale shape (this is why the tier exists): the index build is ONE
    map-only projection per vector — cell id + PQ codes against two
    broadcast one-row codebooks, no shuffle — and the query scan reads
    ONLY (cell, codes): ``nprobe / n_cells`` of the corpus touched,
    m table lookups + adds per candidate regardless of dim, vectors
    themselves never read after the build.  At 10^10 × dim-1536
    vectors that is the difference between scanning 60 TB of floats
    and ~5% of a 480 GB code column.  The only exchange is the narrow
    two-stage rank of :func:`topk_per_query`.

    Composition contract (pytest-gated): with ``nprobe >=`` the cell
    count the result equals :func:`pq_topk` exactly (probing every
    cell degenerates to the full ADC scan); the oracle re-derives the
    whole pipeline (cells, codes, LUTs, cell-restricted ADC sums) in
    SQL.  Both codebooks accept trained frames (``kmeans_codebook`` /
    per-subspace k-means) through the same aggregation paths.
    """
    if dim is None:
        dim = len(emb.select(vec_col).limit(1).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d = dim // m
    cents = ivf_codebook if ivf_codebook is not None else (
        emb.filter(F.col(id_col) % centroid_stride == 0).select(
            F.col(id_col).cast("long").alias("cid"),
            F.col(vec_col).alias("cvec")))
    cb_ivf = _codebook_row(cents)
    cb_pq = pq_codebook if pq_codebook is not None else pq_codebook_row(
        emb, ksub, pq_stride, id_col, vec_col)
    # the index build: cell + codes in one map-only stage
    enc = (emb.crossJoin(F.broadcast(cb_ivf))
           .crossJoin(F.broadcast(cb_pq))
           .select(F.col(id_col),
                   _nearest_cells(F.col(vec_col), 1)[0].alias("cell"),
                   pq_codes_col(F.col(vec_col), m, d).alias("codes")))
    q_cells = queries.crossJoin(F.broadcast(cb_ivf)).select(
        F.col(q_id_col),
        F.explode(_nearest_cells(F.col(q_vec_col), nprobe))
        .alias("cell"))
    lut = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.transform(
            F.col("_pq"),
            lambda cv: F.round(dot_col(F.slice(F.col(q_vec_col),
                                               j * d + 1, d),
                                       F.slice(cv, j * d + 1, d)), 9)))
    # the m x ksub LUT depends only on the query vector: build it ONCE
    # per query and join the nprobe cell rows onto it by q_id —
    # building it on q_cells would recompute the identical table
    # nprobe times per query (32-64x redundant arithmetic at
    # production probe counts)
    q_lut = queries.crossJoin(F.broadcast(cb_pq)).select(
        F.col(q_id_col), lut.alias("_lut"))
    # every vector lives in exactly one cell and a query's nprobe
    # cells are distinct -> each (query, vector) matches at most once
    scored = enc.join(F.broadcast(q_cells), "cell") \
        .join(F.broadcast(q_lut), q_id_col).select(
        q_id_col, id_col,
        F.round(F.aggregate(
            F.zip_with(F.col("codes"), F.col("_lut"),
                       lambda c, row: F.element_at(row, c + 1)),
            F.lit(0.0), lambda acc, v: acc + v), 4).alias("approx_ip"))
    return topk_per_query(scored, k, q_id_col, id_col,
                          score_col="approx_ip")
