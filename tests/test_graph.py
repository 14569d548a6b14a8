"""pagerank_exact: the integer-arithmetic spec is checked against an
independent pure-Python reference (dict-and-loop — no Spark, no SQL),
and the determinism claim (pure function of the edge SET) is checked
by re-running under different partitionings."""

from __future__ import annotations

import pytest

from cdx_writer_spark.functions import graph

SCALE = 1 << 40


def _py_pagerank(edges, iterations=3, scale=SCALE, num=85, den=100):
    """Reference implementation of the documented spec, straight from
    the graph.py docstring, in plain dicts."""
    eset = {(s, d) for s, d in edges if s != d}
    nodes = sorted({s for s, _ in eset} | {d for _, d in eset})
    if not nodes:
        return {}
    n = len(nodes)
    init = scale // n
    base = ((den - num) * init) // den
    outdeg = {}
    for s, _ in eset:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: init for v in nodes}
    for _ in range(iterations):
        inflow = {v: 0 for v in nodes}
        for s, d in eset:
            inflow[d] += rank[s] // outdeg[s]
        dm = sum(rank[v] for v in nodes if v not in outdeg)
        rank = {v: base + (num * (inflow[v] + dm // n)) // den
                for v in nodes}
    return rank


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = graph.pagerank_exact(df, **kw)
    return {r["node"]: r["rank"] for r in out.collect()}


def test_matches_python_reference_on_random_graph(spark):
    import random
    rng = random.Random(7)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(120)]
    got = _run(spark, edges, iterations=4)
    assert got == _py_pagerank(edges, iterations=4)


def test_dangling_mass_is_redistributed(spark):
    # 3 -> sink 9 (no out-edges): without the dangling correction the
    # ring nodes' total mass would decay every iteration
    edges = [(1, 2), (2, 3), (3, 1), (3, 9)]
    got = _run(spark, edges, iterations=3)
    want = _py_pagerank(edges, iterations=3)
    assert got == want
    # the sink received rank yet still fed mass back into the pool
    assert want[9] > 0
    n, init = 4, SCALE // 4
    base = ((100 - 85) * init) // 100
    assert got[9] > base  # strictly more than the bare teleport share


def test_result_is_partitioning_invariant(spark):
    import random
    rng = random.Random(11)
    edges = [(rng.randrange(25), rng.randrange(25)) for _ in range(80)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {(r["node"], r["rank"])
         for r in graph.pagerank_exact(df.repartition(1)).collect()}
    b = {(r["node"], r["rank"])
         for r in graph.pagerank_exact(df.repartition(16, "dst"))
         .collect()}
    assert a == b


def test_duplicate_edges_and_self_loops_are_ignored(spark):
    base = [(1, 2), (2, 1)]
    noisy = base + [(1, 2), (1, 2), (1, 1), (2, 2)]
    assert _run(spark, noisy) == _run(spark, base)


def test_total_mass_is_conserved_to_rounding(spark):
    import random
    rng = random.Random(3)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(90)]
    got = _run(spark, edges, iterations=5)
    n = len(got)
    total = sum(got.values())
    # every integer division floors, losing < 1 per node per term;
    # 5 iterations x 3 floor sites per node bounds the total drift
    assert SCALE - total < 20 * n * 5
    assert total <= SCALE


def test_checkpoint_blocks_are_released(spark):
    """Same discipline as connected_components: after a run, at most
    the final iteration's checkpoint may remain stored."""
    sc = spark.sparkContext

    def ids():
        return {int(i) for i in
                sc._jsc.getPersistentRDDs().keySet().toArray()}

    before = ids()
    edges = [(i, (i * 3 + 1) % 20) for i in range(20)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = graph.pagerank_exact(df, iterations=6)
    out.count()
    leftover = ids() - before
    assert len(leftover) <= 1, (
        f"{len(leftover)} persistent RDDs leaked: {sorted(leftover)}")


def test_empty_edge_list(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert graph.pagerank_exact(df).count() == 0


@pytest.mark.parametrize("iterations", [0, 1])
def test_iteration_zero_and_one(spark, iterations):
    edges = [(1, 2), (2, 3)]
    got = _run(spark, edges, iterations=iterations)
    assert got == _py_pagerank(edges, iterations=iterations)


# --- triangle counting ----------------------------------------------------------

from itertools import combinations

from cdx_writer_spark.functions.graph import triangle_count


def _py_triangles(edges):
    """Brute-force: per id-minimum node, count of triangles."""
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in es for n in e})
    out = {}
    for x, y, z in combinations(nodes, 3):
        if ((x, y) in es and (x, z) in es and (y, z) in es):
            out[x] = out.get(x, 0) + 1
    return out


def _tri(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["n_triangles"]
            for r in triangle_count(df).collect()}


def test_triangles_match_brute_force_random(spark):
    import random

    rng = random.Random(23)
    edges = [(rng.randrange(30), rng.randrange(30))
             for _ in range(160)]
    assert _tri(spark, edges) == _py_triangles(edges)


def test_triangles_duplicates_loops_reversed_collapse(spark):
    # one triangle stated with every kind of redundancy
    edges = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (1, 3),
             (1, 1), (4, 4), (3, 4)]
    assert _tri(spark, edges) == {1: 1}


def test_triangles_hub_star_has_none(spark):
    # a pure star (hub + leaves, no leaf-leaf edges): zero triangles,
    # and the degree orientation keeps the hub's oriented out-list
    # EMPTY (every edge points leaf -> hub), so wedge fan-out at the
    # hub is zero — the skew-containment property itself
    edges = [(0, i) for i in range(1, 40)]
    assert _tri(spark, edges) == {}


def test_triangles_complete_graph(spark):
    n = 9
    edges = [(a, b) for a in range(n) for b in range(a + 1, n)]
    got = _tri(spark, edges)
    # node x is the minimum of C(n-1-x, 2) triangles
    want = {x: (n - 1 - x) * (n - 2 - x) // 2 for x in range(n - 2)}
    assert got == want
    assert sum(got.values()) == n * (n - 1) * (n - 2) // 6


# --- bfs_depths ---------------------------------------------------------------

def _py_bfs(edges, seeds, max_depth=3):
    eset = {(s, d) for s, d in edges if s != d}
    adj = {}
    for s, d in eset:
        adj.setdefault(s, set()).add(d)
    depth = {v: 0 for v in set(seeds)}
    frontier = set(seeds)
    for lvl in range(1, max_depth + 1):
        nxt = set()
        for u in frontier:
            nxt |= adj.get(u, set())
        nxt -= depth.keys()
        for v in nxt:
            depth[v] = lvl
        frontier = nxt
        if not frontier:
            break
    return depth


def _run_bfs(spark, edges, seeds, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    out = graph.bfs_depths(e, s, **kw)
    return {r["node"]: r["depth"] for r in out.collect()}


def test_bfs_matches_python_reference_on_random_graph(spark):
    import random
    rng = random.Random(11)
    edges = [(rng.randrange(60), rng.randrange(60))
             for _ in range(150)]
    seeds = [0, 7, 13]
    for md in (1, 3, 5):
        assert _run_bfs(spark, edges, seeds, max_depth=md) == \
            _py_bfs(edges, seeds, max_depth=md)


def test_bfs_min_depth_wins_on_diamond(spark):
    # 0->1->3 and 0->3: node 3 must report depth 1, not 2
    edges = [(0, 1), (1, 3), (0, 3), (3, 4)]
    got = _run_bfs(spark, edges, [0], max_depth=4)
    assert got == {0: 0, 1: 1, 3: 1, 4: 2}


def test_bfs_early_exit_and_unreachable(spark):
    # component {0,1} exhausts at depth 1; {8,9} never reached
    edges = [(0, 1), (8, 9)]
    got = _run_bfs(spark, edges, [0], max_depth=10)
    assert got == {0: 0, 1: 1}


def test_bfs_directionality(spark):
    # edges point INTO the seed: nothing is reachable
    edges = [(1, 0), (2, 0)]
    got = _run_bfs(spark, edges, [0], max_depth=3)
    assert got == {0: 0}


def test_bfs_partitioning_invariance(spark):
    import random
    rng = random.Random(3)
    edges = [(rng.randrange(30), rng.randrange(30))
             for _ in range(80)]
    e1 = spark.createDataFrame(edges, "src long, dst long")
    e2 = e1.repartition(13)
    s = spark.createDataFrame([(0,), (5,)], "node long")
    r1 = sorted(map(tuple, graph.bfs_depths(e1, s).collect()))
    r2 = sorted(map(tuple, graph.bfs_depths(e2, s).collect()))
    assert r1 == r2


# --- hits_exact ---------------------------------------------------------------

def _py_hits(edges, iterations=2, scale=1 << 20):
    eset = {(s, d) for s, d in edges if s != d}
    nodes = sorted({s for s, _ in eset} | {d for _, d in eset})
    if not nodes:
        return {}
    n = len(nodes)
    init = scale // n
    h = {v: init for v in nodes}
    a = {v: 0 for v in nodes}

    def norm(x):
        t = sum(x.values())
        if t <= 0:
            return {v: 0 for v in x}
        return {v: (x[v] * scale) // t for v in x}

    for _ in range(iterations):
        raw_a = {v: 0 for v in nodes}
        for s, d in eset:
            raw_a[d] += h[s]
        a = norm(raw_a)
        raw_h = {v: 0 for v in nodes}
        for s, d in eset:
            raw_h[s] += a[d]
        h = norm(raw_h)
    return {v: (h[v], a[v]) for v in nodes}


def _run_hits(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = graph.hits_exact(df, **kw)
    return {r["node"]: (r["hub"], r["authority"]) for r in out.collect()}


def test_hits_matches_python_reference_on_random_graph(spark):
    import random
    rng = random.Random(5)
    edges = [(rng.randrange(40), rng.randrange(40))
             for _ in range(120)]
    for it in (1, 2, 4):
        assert _run_hits(spark, edges, iterations=it) == \
            _py_hits(edges, iterations=it)


def test_hits_hub_vs_authority_separation(spark):
    # 0 links to 1..4 (pure hub); 1..4 all link to 9 (pure authority
    # fed by spokes).  0's hub score must dominate every spoke's,
    # and 9's authority must dominate everything.
    edges = [(0, i) for i in range(1, 5)] + [(i, 9) for i in range(1, 5)]
    got = _run_hits(spark, edges, iterations=3)
    assert got == _py_hits(edges, iterations=3)
    hubs = {v: h for v, (h, _) in got.items()}
    auths = {v: a for v, (_, a) in got.items()}
    assert hubs[0] == max(hubs.values())
    assert auths[9] == max(auths.values())
    assert auths[0] == 0          # nothing links to 0
    assert hubs[9] == 0           # 9 links to nothing


def test_hits_partitioning_invariance(spark):
    import random
    rng = random.Random(17)
    edges = [(rng.randrange(25), rng.randrange(25))
             for _ in range(70)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r1 = sorted(map(tuple, graph.hits_exact(df).collect()))
    r2 = sorted(map(tuple,
                    graph.hits_exact(df.repartition(11)).collect()))
    assert r1 == r2


# --- trustrank ------------------------------------------------------------------


def _py_trustrank(edges, seeds, iterations=3, scale=SCALE, num=85,
                  den=100):
    """Reference implementation of the trustrank_exact spec, straight
    from the graph.py docstring, in plain dicts."""
    eset = {(s, d) for s, d in edges if s != d}
    nodes = sorted({s for s, _ in eset} | {d for _, d in eset})
    trusted = sorted(set(seeds) & set(nodes))
    if not nodes:
        return {}
    if not trusted:
        return {v: 0 for v in nodes}
    s_count = len(trusted)
    init = scale // s_count
    base = ((den - num) * init) // den
    outdeg = {}
    for s, _ in eset:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: (init if v in trusted else 0) for v in nodes}
    for _ in range(iterations):
        inflow = {v: 0 for v in nodes}
        for s, d in eset:
            inflow[d] += rank[s] // outdeg[s]
        dm = sum(rank[v] for v in nodes if v not in outdeg)
        rank = {
            v: (base if v in trusted else 0)
            + (num * (inflow[v]
                      + (dm // s_count if v in trusted else 0))) // den
            for v in nodes}
    return rank


def _run_trust(spark, edges, seeds, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame([(s,) for s in seeds], "node long")
    out = graph.trustrank_exact(df, sdf, **kw)
    return {r["node"]: r["rank"] for r in out.collect()}


def test_trustrank_matches_python_reference(spark):
    import random
    rng = random.Random(23)
    edges = [(rng.randrange(40), rng.randrange(40))
             for _ in range(120)]
    seeds = [0, 1, 2, 3, 4]
    got = _run_trust(spark, edges, seeds, iterations=4)
    assert got == _py_trustrank(edges, seeds, iterations=4)


def test_trustrank_unreachable_nodes_get_zero(spark):
    # two disjoint rings; seeds only in the first — the second ring is
    # unreachable from any trusted node, so every rank there is 0
    # (the spam-demotion property that motivates the operator)
    ring1 = [(1, 2), (2, 3), (3, 1)]
    ring2 = [(10, 11), (11, 12), (12, 10)]
    got = _run_trust(spark, ring1 + ring2, [1], iterations=4)
    assert got == _py_trustrank(ring1 + ring2, [1], iterations=4)
    assert all(got[v] == 0 for v in (10, 11, 12))
    assert all(got[v] > 0 for v in (1, 2, 3))


def test_trustrank_dangling_mass_returns_to_seeds(spark):
    # 1 -> 9 (sink): the sink's rank drains back to the trusted set
    # each iteration, never to untrusted nodes
    edges = [(1, 2), (2, 1), (1, 9)]
    got = _run_trust(spark, edges, [1], iterations=3)
    want = _py_trustrank(edges, [1], iterations=3)
    assert got == want
    assert want[9] > 0          # the sink holds rank it received
    assert got[2] > 0           # reachable untrusted node holds rank


def test_trustrank_seeds_absent_from_graph_are_ignored(spark):
    edges = [(1, 2), (2, 1)]
    got = _run_trust(spark, edges, [1, 999], iterations=3)
    assert got == _py_trustrank(edges, [1, 999], iterations=3)
    # 999 is not a node: the trusted share splits over {1} alone
    assert got == _run_trust(spark, edges, [1], iterations=3)


def test_trustrank_no_live_seeds_is_all_zero(spark):
    edges = [(1, 2), (2, 3)]
    got = _run_trust(spark, edges, [999], iterations=3)
    assert got == {1: 0, 2: 0, 3: 0}


def test_trustrank_partitioning_invariance(spark):
    import random
    rng = random.Random(29)
    edges = [(rng.randrange(25), rng.randrange(25))
             for _ in range(80)]
    df = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame([(0,), (3,)], "node long")
    a = sorted(map(tuple, graph.trustrank_exact(
        df.repartition(1), sdf).collect()))
    b = sorted(map(tuple, graph.trustrank_exact(
        df.repartition(16, "dst"), sdf).collect()))
    assert a == b


def test_trustrank_checkpoint_blocks_are_released(spark):
    sc = spark.sparkContext

    def ids():
        return {int(i) for i in
                sc._jsc.getPersistentRDDs().keySet().toArray()}

    before = ids()
    edges = [(i, (i * 3 + 1) % 20) for i in range(20)]
    df = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame([(0,), (1,)], "node long")
    out = graph.trustrank_exact(df, sdf, iterations=6)
    out.count()
    leftover = ids() - before
    assert len(leftover) <= 1, (
        f"{len(leftover)} persistent RDDs leaked: {sorted(leftover)}")


# --- label propagation ----------------------------------------------------------


def _py_lpa(edges, rounds=2):
    """Reference implementation of the label_propagation spec in
    plain dicts: symmetrize, label=id, synchronous argmax updates
    with (max multiplicity, min label) tie-break."""
    und = set()
    for a, b in edges:
        if a != b:
            und.add((a, b))
            und.add((b, a))
    neigh = {}
    for s, d in und:
        neigh.setdefault(d, []).append(s)
    labels = {v: v for v in neigh}
    for _ in range(rounds):
        nxt = {}
        for v, ns in neigh.items():
            counts = {}
            for u in ns:
                lb = labels[u]
                counts[lb] = counts.get(lb, 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[v] = best[0]
        labels = nxt
    return labels


def _run_lpa(spark, edges, rounds=2):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = graph.label_propagation(df, rounds=rounds)
    return {r["node"]: r["label"] for r in out.collect()}


def test_lpa_matches_python_reference(spark):
    import random
    rng = random.Random(31)
    edges = [(rng.randrange(30), rng.randrange(30))
             for _ in range(90)]
    edges = [e for e in edges if e[0] != e[1]]
    for rounds in (1, 2, 3):
        assert _run_lpa(spark, edges, rounds) == _py_lpa(edges, rounds)


def test_lpa_two_cliques_converge_to_two_communities(spark):
    # two 4-cliques bridged by one edge: after 2 rounds each clique
    # carries its min id; the bridge does not merge them
    def clique(ids):
        return [(a, b) for a in ids for b in ids if a < b]
    edges = clique([0, 1, 2, 3]) + clique([10, 11, 12, 13]) + [(3, 10)]
    got = _run_lpa(spark, edges, rounds=3)
    assert got == _py_lpa(edges, rounds=3)
    assert {got[v] for v in (0, 1, 2)} == {0}
    assert {got[v] for v in (11, 12, 13)} == {10}


def test_lpa_direction_is_ignored(spark):
    edges = [(1, 2), (2, 3), (3, 4)]
    rev = [(b, a) for a, b in edges]
    assert _run_lpa(spark, edges) == _run_lpa(spark, rev)


def test_lpa_partitioning_invariance(spark):
    import random
    rng = random.Random(37)
    edges = [(rng.randrange(25), rng.randrange(25))
             for _ in range(80)]
    edges = [e for e in edges if e[0] != e[1]]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(map(tuple, graph.label_propagation(
        df.repartition(1)).collect()))
    b = sorted(map(tuple, graph.label_propagation(
        df.repartition(16, "dst")).collect()))
    assert a == b


def test_lpa_checkpoint_blocks_are_released(spark):
    sc = spark.sparkContext

    def ids():
        return {int(i) for i in
                sc._jsc.getPersistentRDDs().keySet().toArray()}

    before = ids()
    edges = [(i, (i * 3 + 1) % 20) for i in range(20)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = graph.label_propagation(df, rounds=5)
    out.count()
    leftover = ids() - before
    assert len(leftover) <= 1, (
        f"{len(leftover)} persistent RDDs leaked: {sorted(leftover)}")
