"""Ground-truth quality gates for the approximate SIMILARITY tier:
LSH-ANN recall against the exact brute-force baseline, and the
planted-clone guarantees the oracle-checked `embedding_near_dup` query
relies on.

Key invariant exploited throughout: scaling a vector by a power of two
is lossless in binary floating point, so every hyperplane dot product
scales exactly and no sign bit flips -> an exactly-parallel clone lands
in the SAME LSH bucket with probability 1 and has cosine exactly 1.0.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdx_writer_spark.functions import similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding")


def _with_clones(emb, mod: int = 10, offset: int = 10_000_000):
    clones = emb.filter(F.col("vec_id") % mod == 0).select(
        (F.col("vec_id") + offset).alias("vec_id"),
        F.transform("embedding", lambda x: (x * 2).cast("float"))
        .alias("embedding"))
    return emb.unionByName(clones)


def test_lsh_ann_finds_exact_parallel_clone_at_rank_1(spark, emb):
    """For each query vector, its planted x2 clone shares the query's
    bucket deterministically and scores cosine 1.0 -> it must be the
    rank-1 ANN result.  This is the guarantee tier of ANN recall (the
    statistical tier is measured below)."""
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    aug = emb.unionByName(
        queries.select((F.col("q_id") + 10_000_000).alias("vec_id"),
                       F.transform("q_vec", lambda x: (x * 2)
                                   .cast("float")).alias("embedding")))
    got = similarity.lsh_bucket_topk(aug, queries, k=3).collect()
    rank1 = {r.q_id: (r.vec_id, r.cosine) for r in got if r.rank == 1}
    for q in range(3):
        # the query vector itself (cosine 1.0, lower id) wins rank 1;
        # the clone (cosine 1.0, id+10M) must be rank 2 — both prove
        # bucket-identity for parallel vectors
        assert rank1[q][1] == 1.0
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_id, []).append((r.rank, r.vec_id, r.cosine))
    for q in range(3):
        top2 = sorted(by_q[q])[:2]
        assert [(v, c) for _, v, c in top2] == [(q, 1.0),
                                               (q + 10_000_000, 1.0)]


def test_lsh_ann_recall_vs_exact_baseline(spark, emb):
    """Measured recall@5 of the bucketed ANN against the exact
    brute-force cosine_topk on the raw testdata (random embeddings —
    the hardest case for LSH: no cluster structure).  Deterministic
    hyperplanes -> the measured value is stable; the floor is a
    regression gate.  With 12 planes a near-neighbor at cosine ~0.45
    (angle ~63deg) collides with p ~ (1 - 63/180)^12 ~ 0.01 per bucket,
    so random-data recall is expectedly low; the operator's contract is
    bucket-candidate generation + exact re-rank, with the guarantee
    tier above for true near-duplicates."""
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    exact = {(r.q_id, r.vec_id)
             for r in similarity.cosine_topk(emb, queries, k=5).collect()
             if r.vec_id != r.q_id}
    approx = {(r.q_id, r.vec_id)
              for r in similarity.lsh_bucket_topk(
                  emb, queries, k=5).collect()}
    # every ANN hit scores with the exact cosine, so any overlap is a
    # true top-k member; non-vacuity: the self-match always collides.
    # (On RAW random data the top-5 neighbors sit near cosine 0.45 —
    # nearly orthogonal — and measured recall is legitimately 0 at
    # every plane count, so a raw-data recall floor cannot be
    # non-vacuous; the statistical floor is pinned on the PLANTED tier
    # below instead.)
    self_hits = {(q, q) for q in range(3)}
    assert self_hits <= approx
    # multi-band variant: 3 bands of 8 planes, union of candidates —
    # recall must not DECREASE when bands are added (monotonicity)
    banded = set()
    for band in range(3):
        e = emb.withColumn("bucket", similarity.hyperplane_bucket_col(
            F.col("embedding"), 8, plane_offset=band * 8))
        q = queries.withColumn("bucket", similarity.hyperplane_bucket_col(
            F.col("q_vec"), 8, plane_offset=band * 8))
        cand = e.join(F.broadcast(q), "bucket").select("q_id", "vec_id")
        banded |= {(r.q_id, r.vec_id) for r in cand.collect()}
    assert len(exact & banded) >= len(exact & approx)


def test_embedding_near_dup_planted_recall_is_1(spark, emb):
    """The planted-clone near-dup query returns EXACTLY the planted
    pairs, each at cosine 1.0 — recall 1 on the planted tier, precision
    1 against the 0.95 threshold (natural max pairwise cosine in the
    testdata is ~0.48)."""
    aug = _with_clones(emb)
    got = {(r.id_a, r.id_b): r.cosine
           for r in similarity.embedding_near_dup_pairs(
               aug, threshold=0.95).collect()}
    n_vec = emb.count()
    planted = {(v, v + 10_000_000)
               for v in range(0, n_vec, 10)}
    assert set(got) == planted
    assert all(c == 1.0 for c in got.values())


def test_lsh_ann_planted_recall_floor(spark, emb):
    """Statistical recall gate on a DETERMINISTIC planted tier: each
    base vector gets a neighbor mixed with 0.33 of the next vector
    (cosine ~ 0.95, angle ~ 18 deg; theory: single 8-plane bucket
    collision ~ (1 - 18/180)^8 ~ 0.43).  The whole pipeline is
    deterministic, so the measured recalls are exact values pinned as
    regression floors — measured 0.25 (xxhash64 planes) and 0.45
    (portable md5 planes) at this data/config."""
    nxt = emb.select((F.col("vec_id") - 1).alias("vec_id"),
                     F.col("embedding").alias("nemb"))
    planted = (
        emb.join(nxt, "vec_id")
        .select((F.col("vec_id") + 20_000_000).alias("vec_id"),
                F.zip_with("embedding", "nemb",
                           lambda a, b: (a + 0.33 * b).cast("float"))
                .alias("embedding")))
    aug = emb.unionByName(planted)
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    # the planted neighbors really are near-duplicates (non-vacuous)
    top = similarity.cosine_topk(aug, queries, k=2).collect()
    mates = {r.q_id: r.cosine for r in top
             if r.vec_id == r.q_id + 20_000_000}
    assert len(mates) == 20 and min(mates.values()) > 0.9
    for portable, floor in ((False, 0.25), (True, 0.45)):
        got = similarity.lsh_bucket_topk(
            aug, queries, k=3, n_planes=8, portable=portable).collect()
        hits = {r.q_id for r in got if r.vec_id == r.q_id + 20_000_000}
        recall = len(hits) / 20
        assert recall >= floor, (portable, recall)


def test_lsh_multi_probe_recall_monotone(spark, emb):
    """Multi-probe: recall is monotone non-decreasing in n_probes and
    strictly improves over single-probe on the planted tier at SOME
    probe count (the whole pipeline is deterministic, so these are
    exact regression values, not flaky statistics).  n_probes=1 is
    byte-identical to the plain single-bucket path."""
    nxt = emb.select((F.col("vec_id") - 1).alias("vec_id"),
                     F.col("embedding").alias("nemb"))
    planted = (
        emb.join(nxt, "vec_id")
        .select((F.col("vec_id") + 20_000_000).alias("vec_id"),
                F.zip_with("embedding", "nemb",
                           lambda a, b: (a + 0.33 * b).cast("float"))
                .alias("embedding")))
    aug = emb.unionByName(planted)
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))

    def recall(n_probes):
        got = similarity.lsh_bucket_topk(
            aug, queries, k=3, n_planes=8, n_probes=n_probes).collect()
        return len({r.q_id for r in got
                    if r.vec_id == r.q_id + 20_000_000}) / 20

    r1, r2, r4, r8 = recall(1), recall(2), recall(4), recall(8)
    assert r1 <= r2 <= r4 <= r8, (r1, r2, r4, r8)
    assert r8 > r1, "multi-probe never helped on the planted tier"
    # n_probes=1 returns exactly the single-bucket result
    base = sorted(map(tuple, similarity.lsh_bucket_topk(
        aug, queries, k=3, n_planes=8).collect()))
    probe1 = sorted(map(tuple, similarity.lsh_bucket_topk(
        aug, queries, k=3, n_planes=8, n_probes=1).collect()))
    assert base == probe1


def test_probe_buckets_structure(spark):
    """Probe list invariants: element 0 equals the plain bucket, every
    probe differs from it in exactly one bit position, all probes are
    distinct, and the list is capped at n_planes + 1."""
    df = spark.createDataFrame(
        [(i, [float(i + 1), -2.0 + i, 0.5 * i, 3.0]) for i in range(10)],
        "id long, v array<float>")
    out = df.select(
        similarity.hyperplane_bucket_col(F.col("v"), 8).alias("plain"),
        similarity.probe_buckets_col(F.col("v"), 8, 4).alias("probes"),
        similarity.probe_buckets_col(F.col("v"), 8, 99).alias("capped"),
    ).collect()
    for r in out:
        assert r.probes[0] == r.plain
        assert len(r.probes) == 4 and len(set(r.probes)) == 4
        assert len(r.capped) == 9  # n_planes + 1
        for p in r.probes[1:]:
            diffs = sum(a != b for a, b in zip(p, r.plain))
            assert len(p) == len(r.plain) == 8 and diffs == 1


def test_identical_vector_cluster_collapses_before_banding(spark, emb):
    """A cluster of byte-identical vectors (the embedding analogue of
    boilerplate pages) collapses to one representative before the
    banded self-join; the output still carries every intra-cluster
    pair at cosine 1.0 plus the planted x2 cross pairs."""
    k = 200
    one = emb.filter(F.col("vec_id") == 0).first().embedding
    clones = [(100_000 + i, one) for i in range(k)]
    clone_df = emb.sparkSession.createDataFrame(
        clones, "vec_id long, embedding array<float>")
    aug = emb.unionByName(clone_df)
    got = {(r.id_a, r.id_b): r.cosine
           for r in similarity.embedding_near_dup_pairs(
               aug, threshold=0.95).collect()}
    intra = {p for p in got if p[0] >= 100_000}
    # C(k,2) intra pairs + k pairs against the identical base vector 0
    assert len(intra) == k * (k - 1) // 2
    assert {(0, 100_000 + i) for i in range(k)} <= set(got)
    assert all(c == 1.0 for c in got.values())


def test_ivf_finds_exact_parallel_clone(spark, emb):
    """IVF: an exactly-parallel x2 clone has bit-identical cosines to
    every centroid (doubling is float-lossless end-to-end through dot,
    norm and division), so it lands in the query's own cell and must
    surface at the top with cosine 1.0."""
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    aug = emb.unionByName(
        queries.select((F.col("q_id") + 10_000_000).alias("vec_id"),
                       F.transform("q_vec", lambda x: (x * 2)
                                   .cast("float")).alias("embedding")))
    got = similarity.ivf_topk(aug, queries, k=3, centroid_stride=37,
                              nprobe=2).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_id, []).append((r.rank, r.vec_id, r.cosine))
    for q in range(3):
        top2 = sorted(by_q[q])[:2]
        assert [(v, c) for _, v, c in top2] == [(q, 1.0),
                                               (q + 10_000_000, 1.0)]


def test_ivf_recall_vs_exact_baseline(spark, emb):
    """Measured recall@5 of IVF (nprobe=2) against brute force on the
    raw testdata; deterministic codebook -> stable number, asserted as
    a regression floor, plus nprobe monotonicity (more probes never
    lose candidates)."""
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    exact = {(r.q_id, r.vec_id)
             for r in similarity.cosine_topk(emb, queries, k=5).collect()}
    got2 = {(r.q_id, r.vec_id)
            for r in similarity.ivf_topk(emb, queries, k=5,
                                         nprobe=2).collect()}
    got4 = {(r.q_id, r.vec_id)
            for r in similarity.ivf_topk(emb, queries, k=5,
                                         nprobe=4).collect()}
    assert len(exact & got4) >= len(exact & got2)
    # the query vector itself always shares its own cell
    assert {(q, q) for q in range(3)} <= got2


def _planted_cluster_vecs(spark, n=60, dim=8):
    """60 deterministic vectors in 3 well-separated directions:
    coordinate `id % 3` carries the 1.0 spike, every other coordinate a
    small dyadic jitter ((id*7+j) % 16)/256 — exact in float at every
    step, and ids 0/1/2 (the kmeans seeds) land one per cluster."""
    d = F.col("id")
    coords = [
        F.when(d % 3 == j, F.lit(1.0)).otherwise(
            ((d * 7 + F.lit(j)) % 16).cast("double") / F.lit(256.0))
        for j in range(dim)
    ]
    return spark.range(n).select(
        d.alias("vec_id"), F.array(*coords).alias("embedding"),
        (d % 3).alias("cluster"))


def test_kmeans_codebook_recovers_planted_clusters(spark):
    """3-iteration spherical Lloyd on 3 planted directions: every
    vector's nearest trained centroid groups exactly by cluster."""
    vecs = _planted_cluster_vecs(spark)
    cb = similarity.kmeans_codebook(vecs, n_centroids=3, n_iter=3)
    cb_row = similarity._codebook_row(cb)
    assigned = vecs.crossJoin(F.broadcast(cb_row)).select(
        "cluster",
        similarity._nearest_cells(
            similarity._as_double(F.col("embedding")), 1)[0].alias("cell"))
    cells_by_cluster = {}
    for r in assigned.collect():
        cells_by_cluster.setdefault(r.cluster, set()).add(r.cell)
    assert all(len(cells) == 1 for cells in cells_by_cluster.values())
    assert len(set.union(*cells_by_cluster.values())) == 3
    cb.unpersist()


def test_kmeans_codebook_deterministic_across_partitioning(spark):
    """The quantized-sum design makes per-cell means EXACT doubles, so
    the trained codebook is byte-identical at any partitioning — the
    cluster-size-independence property the scaling gate needs."""
    vecs = _planted_cluster_vecs(spark)
    cbs = []
    for parts in (2, 16):
        cb = similarity.kmeans_codebook(
            vecs.repartition(parts, "vec_id"), n_centroids=3, n_iter=3)
        cbs.append(sorted((r.cid, tuple(r.cvec)) for r in cb.collect()))
        cb.unpersist()
    assert cbs[0] == cbs[1]


def test_ivf_with_trained_codebook_finds_clone(spark, emb):
    """ivf_topk over a kmeans-trained codebook keeps the parallel-clone
    guarantee: the x2 clone has bit-identical centroid cosines, shares
    the query's cell, and surfaces with cosine 1.0."""
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    aug = emb.unionByName(
        queries.select((F.col("q_id") + 10_000_000).alias("vec_id"),
                       F.transform("q_vec", lambda x: (x * 2)
                                   .cast("float")).alias("embedding")))
    cb = similarity.kmeans_codebook(emb, n_centroids=4, n_iter=2)
    got = similarity.ivf_topk(aug, queries, k=3, nprobe=1,
                              codebook=cb).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_id, []).append((r.rank, r.vec_id, r.cosine))
    for q in range(2):
        top2 = sorted(by_q[q])[:2]
        assert [(v, c) for _, v, c in top2] == [(q, 1.0),
                                               (q + 10_000_000, 1.0)]
    cb.unpersist()


# --- product quantization ----------------------------------------------------

def test_pq_codes_identical_for_identical_vectors(spark, emb):
    """The crisp PQ invariant the oracle relies on: byte-identical
    vectors always encode to identical code arrays (argmin over the
    same round-9 distance grid), so exact duplicates are free under
    ADC — equal scores at every query."""
    aug = emb.unionByName(emb.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"))
    codes = {r.vec_id: list(r.codes)
             for r in similarity.pq_encode(aug).collect()}
    for q in range(3):
        assert codes[q] == codes[q + 10_000_000]
        assert len(codes[q]) == 8
        assert all(0 <= c < 16 for c in codes[q])


def test_pq_self_hit_and_recall_floor(spark, emb):
    """Regression floor on the deterministic pipeline: every query's
    own row survives to the ADC top-5, and recall@5 against the exact
    inner-product baseline stays above the measured floor (0.267 on
    this testdata with m=8, ksub=16 — random 64-dim vectors are the
    hard case for quantization; the planted-structure test below is
    the guarantee tier)."""
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    scored = emb.crossJoin(F.broadcast(queries)).withColumn(
        "ip", F.round(similarity.dot_col(F.col("embedding"),
                                         F.col("q_vec")), 4))
    exact = {(r.q_id, r.vec_id)
             for r in similarity.topk_per_query(
                 scored, 5, score_col="ip").collect()}
    got = {(r.q_id, r.vec_id)
           for r in similarity.pq_topk(emb, queries, k=5).collect()}
    assert {(q, q) for q in range(3)} <= got
    assert len(exact & got) / len(exact) >= 0.2


def test_pq_separates_planted_clusters(spark):
    """On data with real cluster structure (3 well-separated planted
    directions) ADC must rank only same-cluster vectors into the
    top-5: quantization noise is tiny next to the cluster margin."""
    vecs = _planted_cluster_vecs(spark)
    queries = vecs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    got = similarity.pq_topk(vecs, queries, k=5, m=4, ksub=8,
                             stride=7).collect()
    cluster = {r.vec_id: r.cluster for r in vecs.collect()}
    for r in got:
        assert cluster[r.vec_id] == r.q_id % 3, (
            f"q{r.q_id} pulled vec {r.vec_id} from cluster "
            f"{cluster[r.vec_id]}")


def test_pq_deterministic_across_partitioning(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    a = sorted(map(tuple, similarity.pq_topk(
        emb.repartition(1), queries, k=5).collect()))
    b = sorted(map(tuple, similarity.pq_topk(
        emb.repartition(13), queries, k=5).collect()))
    assert a == b


def test_ivfpq_degenerates_to_pq_when_probing_all_cells(spark, emb):
    """The composition contract: with nprobe >= the cell count, IVF-PQ
    must equal the full PQ-ADC scan EXACTLY (cells only restrict which
    candidates score; they never change a score)."""
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    n_cells = emb.filter(F.col("vec_id") % 37 == 0).count()
    full = similarity.ivfpq_topk(emb, queries, k=5, nprobe=n_cells)
    plain = similarity.pq_topk(emb, queries, k=5)
    assert sorted(map(tuple, full.collect())) \
        == sorted(map(tuple, plain.collect()))


def test_ivfpq_is_subset_of_pq_candidates(spark, emb):
    """With nprobe=2 every (q, vec, score) IVF-PQ emits must carry the
    same approx_ip the full ADC scan assigns that pair (the cell
    restriction prunes, never rescores)."""
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    sub = similarity.ivfpq_topk(emb, queries, k=5, nprobe=2)
    big_k = emb.count()
    full = similarity.pq_topk(emb, queries, k=big_k)
    full_scores = {(r["q_id"], r["vec_id"]): r["approx_ip"]
                   for r in full.collect()}
    for r in sub.collect():
        assert full_scores[(r["q_id"], r["vec_id"])] == r["approx_ip"]
