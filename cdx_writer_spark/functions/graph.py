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


def trustrank_exact(edges: DataFrame, seeds: DataFrame,
                    src: str = "src", dst: str = "dst",
                    node: str = "node", iterations: int = 3,
                    scale: int = 1 << 40, damping_num: int = 85,
                    damping_den: int = 100) -> DataFrame:
    """Integer-exact TrustRank (Gyöngyi, Garcia-Molina & Pedersen,
    VLDB 2004): PageRank with the teleport vector restricted to a
    TRUSTED seed set, so trust flows outward from vetted hosts and
    link-farm neighborhoods — unreachable from any seed — converge to
    rank 0.  The classic web-spam demotion signal for a crawl
    scheduler: ``host_rank`` in the frontier priority key can be the
    trust score instead of (or blended with) raw PageRank, and a real
    operation names exactly this operator ("biased PageRank over a
    seed whitelist").

    Returns ``(node, rank)`` with ``rank`` a BIGINT share of
    ``scale``.  The spec (order matters — integer division is not
    associative; an oracle must follow it operation-for-operation):

    * ``trusted`` = seeds ∩ nodes (a seed absent from the graph holds
      no mass), ``s = |trusted|``; if ``s = 0`` every rank is 0.
    * ``init`` = ``scale div s`` for trusted nodes, 0 otherwise.
    * ``base`` = ``((den - num) * (scale div s)) div den`` for
      trusted nodes, 0 otherwise — the biased teleport share.
    * per iteration: each node with outdegree ``k`` sends
      ``rank div k`` along each out-edge; dangling nodes pool their
      whole rank into ``D``, redistributed uniformly over the TRUSTED
      set as ``D div s`` (the biased-teleport treatment of dangling
      mass — it returns to the seeds, never to untrusted nodes);
      then ``rank' = base_v + (num * (inflow + [v trusted] *
      (D div s))) div den``.

    Scale shape: identical to :func:`pagerank_exact` — per iteration
    ONE equi-join of the static degree-annotated edge list with the
    (node, rank) int64 frame and ONE aggregation, dangling mass a
    1-row broadcast; the trusted flag is a static boolean column on
    the checkpointed node frame (one anti-join at setup, never
    re-derived).  Same eager-localCheckpoint / release-previous-
    round discipline, so plan depth and stored blocks stay one
    iteration deep at any iteration count."""
    e = (edges.select(F.col(src).cast("long").alias("s"),
                      F.col(dst).cast("long").alias("d"))
         .filter(F.col("s") != F.col("d"))
         .distinct())
    nodes = (e.select(F.col("s").alias("node"))
             .union(e.select(F.col("d").alias("node")))
             .distinct())
    seed_ids = seeds.select(
        F.col(node).cast("long").alias("node")).distinct()

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
    # trusted flag rides the node frame: static across iterations
    nodes = (nodes.join(
        seed_ids.select("node", F.lit(True).alias("__trusted")),
        "node", "left")
        .select("node", F.coalesce("__trusted", F.lit(False))
                .alias("__trusted"))
        .localCheckpoint(eager=True))
    deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("__outdeg"))
    e_deg = e.join(deg, "s").localCheckpoint(eager=True)
    dangling_nodes = nodes.select("node").join(
        deg.select(F.col("s").alias("node")), "node", "left_anti"
    ).localCheckpoint(eager=True)
    static_ids = _persistent_ids() - seen

    s_count = nodes.filter("__trusted").count()
    if s_count == 0:
        out = nodes.select(
            "node", F.lit(0).cast("long").alias("rank"))
        out = out.localCheckpoint(eager=True)
        _release(static_ids)
        return out
    init = scale // s_count
    base = ((damping_den - damping_num) * init) // damping_den

    ranks = nodes.select(
        "node",
        F.when(F.col("__trusted"), F.lit(init)).otherwise(F.lit(0))
        .cast("long").alias("rank"))
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
                   (F.when(F.col("__trusted"), F.lit(base))
                    .otherwise(F.lit(0))
                    + F.expr(
                        f"({damping_num} * (coalesce(__inflow, 0L) "
                        f"+ (case when __trusted then __dm div "
                        f"{s_count} else 0L end))) "
                        f"div {damping_den}"))
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


def label_propagation(edges: DataFrame, src: str = "src",
                      dst: str = "dst", rounds: int = 2) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan,
    Albert & Kumara 2007) over an UNDIRECTED view of the edge list:
    returns ``(node, label)`` after ``rounds`` synchronous updates —
    the mirror-site / template-farm grouping signal a crawl scheduler
    uses to spread budget across communities instead of drowning in
    one heavily-interlinked cluster.

    The spec (deterministic — an oracle must follow it exactly):

    * the undirected edge set is ``{(u,v)} ∪ {(v,u)}`` after dropping
      self-loops and duplicates; isolated nodes don't exist (every
      node has ≥ 1 neighbor by construction).
    * ``label₀(v) = v``.
    * per round, ALL nodes update simultaneously (synchronous — no
      update-order dependence, unlike the paper's asynchronous
      variant): ``label'(v)`` = the neighbor label with the highest
      multiplicity, ties broken by the SMALLEST label.

    A fixed round count keeps the result a pure function of
    (edge set, rounds) — synchronous LPA can oscillate on bipartite
    structures, so convergence detection would be data-dependent;
    callers pick rounds ~ O(graph diameter of interest).

    Scale shape: per round ONE equi-join of the static symmetrized
    edge list with the (node, label) int64 frame, ONE (node, label)
    count aggregation with map-side partials, and ONE per-node argmax
    via ``max(struct(count, -label))`` — an aggregation, not a
    window, so no per-node sort and skewed high-degree nodes stay
    inside partial aggregation.  Rounds ``localCheckpoint`` eagerly
    with the same release-previous-round discipline as
    :func:`pagerank_exact`."""
    raw = (edges.select(F.col(src).cast("long").alias("a"),
                        F.col(dst).cast("long").alias("b"))
           .filter(F.col("a") != F.col("b")))
    e = (raw.select(F.col("a").alias("s"), F.col("b").alias("d"))
         .union(raw.select(F.col("b").alias("s"),
                           F.col("a").alias("d")))
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
    e = e.localCheckpoint(eager=True)
    static_ids = _persistent_ids() - seen

    labels = e.select(F.col("s").alias("node")).distinct().select(
        "node", F.col("node").alias("label"))
    seen = _persistent_ids()
    labels = labels.localCheckpoint(eager=True)
    cur_ids = _persistent_ids() - seen

    for _ in range(int(rounds)):
        counts = (e.join(
            labels.select(F.col("node").alias("s"), "label"), "s")
            .groupBy(F.col("d").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("__c")))
        # argmax by (count, -label): highest multiplicity wins, ties
        # to the smallest label — one aggregation, no window sort
        nxt = (counts.groupBy("node")
               .agg(F.max(F.struct(
                   F.col("__c").alias("c"),
                   (-F.col("label")).alias("nl"))).alias("__m"))
               .select("node",
                       (-F.col("__m.nl")).cast("long").alias("label")))
        seen = _persistent_ids()
        nxt = nxt.localCheckpoint(eager=True)
        nxt_ids = _persistent_ids() - seen
        _release(cur_ids)
        labels, cur_ids = nxt, nxt_ids

    out = labels
    _release(static_ids)
    return out


def bfs_depths(edges: DataFrame, seeds: DataFrame,
               src: str = "src", dst: str = "dst",
               node: str = "node", max_depth: int = 3) -> DataFrame:
    """Minimum hop distance from a seed set over a DIRECTED edge
    list, bounded at ``max_depth`` — the "depth" half of the
    north star's "host-rank + depth" frontier priority key, derived
    from the observed link graph instead of trusted from crawl
    bookkeeping.  Returns ``(node, depth)`` with one row per node
    reachable within ``max_depth`` hops (seeds at depth 0); nodes
    reached at several depths appear ONCE at their minimum.

    Scale shape — level-synchronous frontier expansion (the standard
    Pregel/BSP BFS):

    * Each round is ONE equi-join of the CURRENT frontier (only the
      nodes first reached last round, never the whole visited set)
      against the static edge list, ONE distinct, and ONE anti-join
      against the visited set — all shuffles keyed on node id, no
      broadcast of anything data-sized.
    * The visited set grows monotonically but each round's join
      probe side is the new frontier only, so per-round cost tracks
      the expansion wavefront, not the accumulated result — the
      property that makes BFS feasible on a 10^10-node webgraph.
    * Rounds ``localCheckpoint`` eagerly and release the previous
      round's blocks (same discipline as :func:`pagerank_exact`);
      plan depth stays one round deep at any ``max_depth``.  Early
      exit on an exhausted frontier via a 1-row count.

    The result is a pure function of (edge set, seed set,
    max_depth) — set semantics end-to-end, no floats — so a
    recursive-CTE oracle can check it hash-for-hash."""
    e = (edges.select(F.col(src).cast("long").alias("s"),
                      F.col(dst).cast("long").alias("d"))
         .filter(F.col("s") != F.col("d"))
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
    e = e.localCheckpoint(eager=True)
    static_ids = _persistent_ids() - seen

    seen = _persistent_ids()
    visited = (seeds.select(F.col(node).cast("long").alias("node"))
               .distinct()
               .select("node", F.lit(0).cast("int").alias("depth"))
               .localCheckpoint(eager=True))
    frontier = visited
    cur_ids = _persistent_ids() - seen

    for depth in range(1, int(max_depth) + 1):
        nxt = (frontier.join(
            e, frontier["node"] == e["s"])
            .select(F.col("d").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .select("node", F.lit(depth).cast("int").alias("depth")))
        seen = _persistent_ids()
        nxt = nxt.localCheckpoint(eager=True)
        visited = visited.unionAll(nxt).localCheckpoint(eager=True)
        new_ids = _persistent_ids() - seen
        _release(cur_ids)
        frontier, cur_ids = nxt, new_ids
        if nxt.limit(1).count() == 0:
            break

    _release(static_ids)
    return visited


def hits_exact(edges: DataFrame, src: str = "src", dst: str = "dst",
               iterations: int = 2, scale: int = 1 << 20) -> DataFrame:
    """Integer-exact HITS (Kleinberg 1999) over a directed edge list:
    returns ``(node, hub, authority)`` BIGINT scores, each a share of
    ``scale`` after sum-normalization.  Like :func:`pagerank_exact`,
    every operation is integer arithmetic in a documented order, so
    the fixpoint is a pure function of the edge SET — reproducible
    across engines, partitionings and summation orders, which is what
    lets link-farm/hub detection feed crawl priorities without
    schedule flap.

    The spec (an oracle must follow it operation-for-operation):

    * nodes = distinct endpoints after dropping self-loops/dup edges
    * ``h0 = scale div n`` for every node
    * per iteration, in this order:
      - raw authority ``a(v) = Σ h(u)`` over in-edges ``u→v``
        (0 when none)
      - normalize: ``a'(v) = (a(v) * scale) div Σa``  (Σa over all
        nodes; skip when Σa = 0)
      - raw hub ``h(u) = Σ a'(v)`` over out-edges ``u→v`` (0 when
        none)
      - normalize: ``h'(u) = (h(u) * scale) div Σh``

    Overflow bound: raw sums never exceed ``m·scale`` (m = |edges|)
    and the widest intermediate is ``raw · scale`` ≤ ``m·scale²`` —
    under 2**63 for the default ``scale`` = 2**20 up to m ≈ 8·10^6
    per normalization GROUP; at larger m lower ``scale`` or swap the
    normalizer to a two-step div (documented, not needed at bench
    scale).

    Scale shape: per iteration TWO equi-joins of the static edge list
    with a ``(node, score)`` int64 frame and TWO aggregations — the
    canonical HITS cost; the normalizing sums are 1-row aggregates
    broadcast back via ``crossJoin`` (never collected into the plan).
    Iterations ``localCheckpoint`` eagerly with the same
    release-previous-round discipline as :func:`pagerank_exact`."""
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
    e = e.localCheckpoint(eager=True)
    static_ids = _persistent_ids() - seen

    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node", F.lit(0).cast("long").alias("hub"),
            F.lit(0).cast("long").alias("authority"))
    init = scale // n

    hubs = nodes.select(
        "node", F.lit(init).cast("long").alias("score"))
    auths = nodes.select(
        "node", F.lit(0).cast("long").alias("score"))
    seen = _persistent_ids()
    hubs = hubs.localCheckpoint(eager=True)
    auths = auths.localCheckpoint(eager=True)
    cur_ids = _persistent_ids() - seen

    def _normalize(raw: DataFrame) -> DataFrame:
        total = raw.agg(
            F.coalesce(F.sum("score"), F.lit(0)).alias("__t"))
        return (raw.crossJoin(F.broadcast(total))
                .select("node", F.when(
                    F.col("__t") > 0,
                    F.expr(f"(score * {scale}) div __t"))
                    .otherwise(F.lit(0))
                    .cast("long").alias("score")))

    for _ in range(int(iterations)):
        raw_a = (e.join(hubs.select(F.col("node").alias("s"),
                                    "score"), "s")
                 .groupBy(F.col("d").alias("node"))
                 .agg(F.sum("score").alias("__raw")))
        a_new = _normalize(
            nodes.join(raw_a, "node", "left")
            .select("node", F.coalesce("__raw", F.lit(0))
                    .cast("long").alias("score")))
        seen = _persistent_ids()
        a_new = a_new.localCheckpoint(eager=True)
        a_ids = _persistent_ids() - seen
        raw_h = (e.join(a_new.select(F.col("node").alias("d"),
                                     "score"), "d")
                 .groupBy(F.col("s").alias("node"))
                 .agg(F.sum("score").alias("__raw")))
        h_new = _normalize(
            nodes.join(raw_h, "node", "left")
            .select("node", F.coalesce("__raw", F.lit(0))
                    .cast("long").alias("score")))
        seen = _persistent_ids()
        h_new = h_new.localCheckpoint(eager=True)
        h_ids = _persistent_ids() - seen
        _release(cur_ids)
        hubs, auths, cur_ids = h_new, a_new, a_ids | h_ids

    out = (hubs.select("node", F.col("score").alias("hub"))
           .join(auths.select("node",
                              F.col("score").alias("authority")),
                 "node"))
    _release(static_ids)
    return out
