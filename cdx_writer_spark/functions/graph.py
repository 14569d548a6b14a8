"""Iterative graph ranking over an edge list — the host-rank input to
the frontier's priority key (the north star schedules by
"host-rank + depth"; this is where a real crawl derives that rank from
the observed link graph instead of a static seed list).

The centerpiece is :func:`pagerank_exact` — PageRank in EXACT integer
arithmetic.  Floating-point PageRank is not reproducible across
engines or even across partitionings (float sums are
order-dependent), which would make crawl priorities flap between
runs.  Scaling every rank to a large integer budget and doing all
divisions as integer division makes the fixpoint a pure function of
the edge SET: any engine, any parallelism, any summation order
produces bit-identical ranks — which is what lets a DuckDB oracle
check the result hash-for-hash and lets a resumed crawl reproduce its
own schedule.

Scale shape (the 10^10-node path):

* Per-iteration state is one ``(node, rank)`` int64 pair — 16 bytes a
  node, partitioned by node id.
* Each iteration is ONE equi-join of the static degree-annotated edge
  list with the current ranks (shuffle on src) plus ONE aggregation
  (shuffle on dst) — the canonical PageRank cost; nothing is
  collected, nothing is broadcast except two 1-row aggregates
  (dangling mass, and nothing else).
* The degree-annotated edge list is computed once, checkpointed, and
  reused every iteration (degree join does not repeat).
* Ranks are eagerly ``localCheckpoint``-ed per iteration and the
  previous iteration's blocks explicitly released (same
  registry-diff discipline as ``dedup.connected_components`` — plain
  ``unpersist()`` does not free checkpoint blocks), so plan depth and
  stored state stay one iteration deep at any iteration count.  On a
  real cluster swap ``localCheckpoint`` for a reliable
  ``checkpoint()``.

Dangling nodes (no outlinks — every real webgraph has them) hand
their full rank to the uniform teleport pool each iteration, the
standard correction: the dangling mass is a 1-row aggregate,
broadcast back via ``crossJoin`` (never ``collect`` into a literal
plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_exact(edges: DataFrame, src: str = "src",
                   dst: str = "dst", iterations: int = 3,
                   scale: int = 1 << 40, damping_num: int = 85,
                   damping_den: int = 100) -> DataFrame:
    """Integer-exact PageRank over ``edges``; returns
    ``(node, rank)`` with ``rank`` a BIGINT share of ``scale``.

    The spec (both this engine and any oracle must follow it
    operation-for-operation — integer division is not associative,
    so the ORDER below is part of the contract):

    * ``n``      = |distinct(src) ∪ distinct(dst)| after dropping
      self-loops and duplicate edges
    * ``init``   = ``scale div n`` — every node's iteration-0 rank
    * ``base``   = ``((den - num) * init) div den`` — the teleport
      share, constant across iterations
    * per iteration: each node with outdegree ``k`` sends
      ``rank div k`` along each out-edge; nodes with NO out-edges
      contribute their whole rank to a dangling pool ``D``, shared
      uniformly as ``D div n``; then
      ``rank' = base + (num * (inflow + D div n)) div den``
      with ``inflow`` the BIGINT sum of received contributions
      (0 when none).

    All quantities stay well under 2**63 for any ``scale`` ≤ 2**55
    (total mass never exceeds ``scale``; the widest intermediate is
    ``num * scale``).
    """
    e = (edges.select(F.col(src).cast("long").alias("s"),
                      F.col(dst).cast("long").alias("d"))
         .filter(F.col("s") != F.col("d"))
         .distinct())
    nodes = (e.select(F.col("s").alias("node"))
             .union(e.select(F.col("d").alias("node")))
             .distinct())

    sc = edges.sparkSession.sparkContext

    def _persistent_ids() -> set:
        return {int(i) for i in
                sc._jsc.getPersistentRDDs().keySet().toArray()}

    def _release(ids) -> None:
        reg = sc._jsc.getPersistentRDDs()
        for i in ids:
            ref = reg.get(i)
            if ref is not None:
                ref.unpersist(False)

    seen = _persistent_ids()
    nodes = nodes.localCheckpoint(eager=True)
    # degree-annotated edges: static across iterations, so the degree
    # aggregation+join happens exactly once
    deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("__outdeg"))
    e_deg = e.join(deg, "s").localCheckpoint(eager=True)
    # dangling = nodes with no out-edges: a static node-set property,
    # materialized once so the anti-join never replays per iteration
    dangling_nodes = nodes.join(
        deg.select(F.col("s").alias("node")), "node", "left_anti"
    ).localCheckpoint(eager=True)
    static_ids = _persistent_ids() - seen

    n = nodes.count()  # one 1-row job; node ids are never collected
    if n == 0:
        return nodes.select("node", F.lit(0).cast("long").alias("rank"))
    init = scale // n
    base = ((damping_den - damping_num) * init) // damping_den

    ranks = nodes.select(
        "node", F.lit(init).cast("long").alias("rank"))
    seen = _persistent_ids()
    ranks = ranks.localCheckpoint(eager=True)
    cur_ids = _persistent_ids() - seen

    for _ in range(int(iterations)):
        inflow = (e_deg.join(
            ranks.select(F.col("node").alias("s"), "rank"), "s")
            .select(F.col("d").alias("node"),
                    F.expr("rank div __outdeg").alias("__c"))
            .groupBy("node")
            .agg(F.sum("__c").alias("__inflow")))
        dang = (ranks.join(dangling_nodes, "node", "left_semi")
                .agg(F.coalesce(F.sum("rank"), F.lit(0))
                     .alias("__dm")))
        nxt = (nodes.join(inflow, "node", "left")
               .crossJoin(F.broadcast(dang))
               .select(
                   "node",
                   (F.lit(base)
                    + F.expr(
                        f"({damping_num} * (coalesce(__inflow, 0L) "
                        f"+ (__dm div {n}))) div {damping_den}"))
                   .cast("long").alias("rank")))
        seen = _persistent_ids()
        nxt = nxt.localCheckpoint(eager=True)
        nxt_ids = _persistent_ids() - seen
        _release(cur_ids)
        ranks, cur_ids = nxt, nxt_ids

    out = ranks
    _release(static_ids)
    return out


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Exact triangle counting over an undirected edge list, keyed by
    each triangle's smallest node id: returns ``(node, n_triangles)``
    — one row per node that is the id-minimum of at least one
    triangle (the sum over rows is the graph's triangle count, each
    triangle counted exactly once).

    Scale shape — the degree-ordered orientation (the standard
    compact-forward/MapReduce trick, e.g. Suri & Vassilvitskii WWW'11
    and Cohen's MapReduce curriculum): orient every undirected edge
    from its lower-(degree, id) endpoint to the higher one, so every
    node's OUT-degree is bounded by ~sqrt(2m) regardless of its real
    degree.  Wedge generation (the only superlinear stage) is then a
    self-join on the oriented source whose per-key fan-out is that
    bounded out-degree squared — a 10^8-degree hub contributes
    wedges from its tiny oriented out-list, not C(10^8, 2).  The
    closing check is one equi-join of wedges against oriented edges.
    Two shuffles total beyond the degree computation; no Python, no
    broadcast of anything data-sized.

    Every triangle is generated exactly once (its (degree, id)-rank
    ordering is total), and the output key is id-based (``least`` of
    the three corners), so the result is independent of the internal
    orientation — an id-ordered oracle can check it even though the
    engine orients by degree.

    Self-loops are dropped; parallel/reversed duplicate edges
    collapse via the canonical (min, max) form."""
    e = (edges.select(F.col(src).cast("long").alias("a"),
                      F.col(dst).cast("long").alias("b"))
         .filter(F.col("a") != F.col("b"))
         .select(F.least("a", "b").alias("u"),
                 F.greatest("a", "b").alias("v"))
         .distinct())
    deg = (e.select(F.col("u").alias("n"))
           .unionAll(e.select(F.col("v").alias("n")))
           .groupBy("n").agg(F.count(F.lit(1)).alias("d")))
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    # orient low-(degree, id) -> high-(degree, id)
    annotated = e.join(du, "u").join(dv, "v")
    lo_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    oriented = annotated.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("t"))
    # wedges s -> (t1, t2): both higher-rank than s; order the pair
    # by plain id so each unordered pair appears once
    o1 = oriented.select("s", F.col("t").alias("t1"))
    o2 = oriented.select("s", F.col("t").alias("t2"))
    wedges = (o1.join(o2, "s")
              .filter(F.col("t1") < F.col("t2")))
    # close the wedge: the (t1, t2) edge exists — probe the canonical
    # (min-id, max-id) edge list directly (t1 < t2 already)
    closer = e.select(F.col("u").alias("c1"), F.col("v").alias("c2"))
    tri = wedges.join(
        closer, (F.col("t1") == F.col("c1"))
        & (F.col("t2") == F.col("c2")))
    return (tri.select(F.least("s", "t1", "t2").alias("node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("n_triangles")))
