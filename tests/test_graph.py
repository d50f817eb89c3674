"""Connected-components semantics on constructed graphs.

The driver-checked queries (dedup_doc_clusters/dedup_cluster_removals)
prove the operator on the real corpus, whose blocking graph happens to be
near-clique; these tests pin the shapes that graph can't express — long
chains (propagation over diameter), rings, two cliques merged by one
bridge edge — plus the convergence guard.
"""

import pytest

from uav_streamprocessor_spark.operators.graph import (
    components_with_sizes,
    connected_components,
)


def _cc_dict(spark, pairs, **kw):
    edges = spark.createDataFrame(pairs, "src long, dst long")
    return {
        r["node"]: r["comp"] for r in connected_components(edges, **kw).collect()
    }


def test_chain_propagates_over_full_diameter(spark):
    # 0-1-2-...-9: min label must travel 9 hops, the worst case per node
    comp = _cc_dict(spark, [(i, i + 1) for i in range(9)])
    assert comp == {i: 0 for i in range(10)}


def test_ring_collapses_to_min(spark):
    comp = _cc_dict(spark, [(i, (i + 1) % 6) for i in range(6)])
    assert comp == {i: 0 for i in range(6)}


def test_bridged_cliques_merge_and_separate_component_stays(spark):
    # clique {1,2,3}, clique {10,11,12}, bridge 3-10; separate pair {20,21}
    clique1 = [(1, 2), (1, 3), (2, 3)]
    clique2 = [(10, 11), (10, 12), (11, 12)]
    comp = _cc_dict(spark, clique1 + clique2 + [(3, 10), (20, 21)])
    assert comp == {1: 1, 2: 1, 3: 1, 10: 1, 11: 1, 12: 1, 20: 20, 21: 20}


def test_direction_and_duplicate_edges_are_irrelevant(spark):
    # reversed + repeated edges: same fixpoint (undirected semantics)
    comp = _cc_dict(spark, [(5, 4), (4, 5), (3, 4), (5, 4)])
    assert comp == {3: 3, 4: 3, 5: 3}


def test_sizes_join(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "src long, dst long")
    rows = {
        r["node"]: (r["comp"], r["comp_size"])
        for r in components_with_sizes(edges).collect()
    }
    assert rows == {1: (1, 3), 2: (1, 3), 3: (1, 3), 7: (7, 2), 8: (7, 2)}


def test_nonconvergence_raises_not_partial(spark):
    # diameter 5 can't finish in 2 rounds; with the fallback disabled it
    # must raise, never return a partially-propagated labeling
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2, fallback=False)


def test_path_100_converges_via_alternating_fallback(spark):
    """VERDICT r4 #4: a 100-node path (diameter 99, far past the hash-min
    budget) converges through the large-star/small-star fallback instead
    of raising — and to the exact labeling."""
    comp = _cc_dict(spark, [(i, i + 1) for i in range(99)], max_iter=3)
    assert comp == {i: 0 for i in range(100)}


def test_alternating_equals_hashmin_on_adversarial_shapes(spark):
    """The fallback path (forced via max_iter=0-ish budgets) must agree
    with the converged hash-min labeling on every constructed shape —
    chain, ring, bridged cliques, duplicate/reversed edges, forest."""
    shapes = [
        [(i, i + 1) for i in range(9)],                      # chain
        [(i, (i + 1) % 6) for i in range(6)],                # ring
        [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12), (3, 10),
         (20, 21)],                                          # bridged cliques
        [(5, 4), (4, 5), (3, 4), (5, 4)],                    # dup/reversed
        [(i, i + 50) for i in range(10)] + [(0, 1), (2, 3)], # forest
    ]
    for pairs in shapes:
        via_hashmin = _cc_dict(spark, pairs, max_iter=25)
        via_fallback = _cc_dict(spark, pairs, max_iter=1)
        assert via_fallback == via_hashmin, pairs


def test_small_diameter_graphs_never_enter_the_fallback(spark, monkeypatch):
    """Dup-cluster graphs (near-cliques) must stay on the cheap hash-min
    path: poison the fallback and prove it is not consulted."""
    from uav_streamprocessor_spark.operators import graph as graph_mod

    def boom(*a, **kw):  # pragma: no cover - must not run
        raise AssertionError("fallback used for a small-diameter graph")

    monkeypatch.setattr(graph_mod, "_alternating_components", boom)
    comp = _cc_dict(
        spark, [(1, 2), (1, 3), (2, 3), (20, 21)], max_iter=25
    )
    assert comp == {1: 1, 2: 1, 3: 1, 20: 20, 21: 20}


# ---------------------------------------------------------------------------
# pagerank
# ---------------------------------------------------------------------------

def _numpy_pagerank(pairs, iters=10, damping=0.85):
    """Dense reference: same update rule, same iteration count."""
    import numpy as np

    edges = set()
    for a, b in pairs:
        if a != b:
            edges.add((a, b))
            edges.add((b, a))
    nodes = sorted({x for e in edges for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for u, _ in edges:
        outdeg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[outdeg == 0].sum()
        contrib = np.zeros(n)
        for u, v in edges:
            contrib[idx[v]] += r[idx[u]] / outdeg[idx[u]]
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return {node: r[idx[node]] for node in nodes}


def _pr_dict(spark, pairs, **kw):
    from uav_streamprocessor_spark.operators.graph import pagerank

    edges = spark.createDataFrame(pairs, "src long, dst long")
    return {r["node"]: r["rank"] for r in pagerank(edges, **kw).collect()}


def test_pagerank_matches_numpy_exactly(spark):
    # star + chain + separate pair: hubs, leaves, and a dangling-free mix
    pairs = [(0, i) for i in range(1, 6)] + [(6, 7), (7, 8), (20, 21)]
    got = _pr_dict(spark, pairs)
    want = _numpy_pagerank(pairs)
    assert set(got) == set(want)
    for node in want:
        assert abs(got[node] - want[node]) < 1e-9, node


def test_pagerank_two_round_contraction_matches_numpy(spark):
    """The iters=2 form behind dedup_pagerank_contraction (the oracled
    shadow of the 10-round rows-only query) is the same update rule, just
    truncated — pin it against the dense reference at the same depth."""
    pairs = [(0, i) for i in range(1, 6)] + [(6, 7), (7, 8), (20, 21)]
    got = _pr_dict(spark, pairs, iters=2)
    want = _numpy_pagerank(pairs, iters=2)
    assert set(got) == set(want)
    for node in want:
        assert abs(got[node] - want[node]) < 1e-12, node
    # 2 rounds != 10 rounds on this graph — the shadow is a real
    # intermediate state, not the converged fixpoint
    assert got != _pr_dict(spark, pairs, iters=10)


def test_pagerank_hub_outranks_leaves_and_sums_to_one(spark):
    pairs = [(0, i) for i in range(1, 8)]
    got = _pr_dict(spark, pairs)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    hub = got[0]
    for leaf in range(1, 8):
        assert hub > got[leaf]
    # leaves are symmetric -> identical ranks
    leaf_vals = {round(got[i], 12) for i in range(1, 8)}
    assert len(leaf_vals) == 1


def test_pagerank_damping_zero_is_uniform(spark):
    pairs = [(0, 1), (1, 2), (2, 3)]
    got = _pr_dict(spark, pairs, damping=0.0)
    for v in got.values():
        assert abs(v - 0.25) < 1e-12


def test_pagerank_directed_dangling_mass_conserved(spark):
    # directed chain 0->1->2: node 2 is dangling; ranks must still sum to 1
    pairs = [(0, 1), (1, 2)]
    got = _pr_dict(spark, pairs, undirected=False)
    want = _numpy_pagerank_directed(pairs)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for node in want:
        assert abs(got[node] - want[node]) < 1e-9


def _numpy_pagerank_directed(pairs, iters=10, damping=0.85):
    import numpy as np

    edges = sorted({(a, b) for a, b in pairs if a != b})
    nodes = sorted({x for e in edges for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for u, _ in edges:
        outdeg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[outdeg == 0].sum()
        contrib = np.zeros(n)
        for u, v in edges:
            contrib[idx[v]] += r[idx[u]] / outdeg[idx[u]]
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return {node: r[idx[node]] for node in nodes}


# ---------------------------------------------------------------------------
# triangle_stats
# ---------------------------------------------------------------------------

def _tri_dict(spark, pairs):
    from uav_streamprocessor_spark.operators.graph import triangle_stats

    edges = spark.createDataFrame(pairs, "src long, dst long")
    return {
        r["node"]: (r["degree"], r["n_triangles"], r["clustering_coeff"])
        for r in triangle_stats(edges).collect()
    }


def test_triangle_single(spark):
    t = _tri_dict(spark, [(1, 2), (2, 3), (1, 3)])
    assert t == {1: (2, 1, 1.0), 2: (2, 1, 1.0), 3: (2, 1, 1.0)}


def test_triangle_star_has_none(spark):
    # star K1,4: hub degree 4, zero triangles, coefficient 0
    t = _tri_dict(spark, [(0, i) for i in range(1, 5)])
    assert t[0] == (4, 0, 0.0)
    for leaf in range(1, 5):
        assert t[leaf] == (1, 0, 0.0)


def test_triangle_k4_counts(spark):
    # K4: C(4,3)=4 triangles, each node in C(3,2)=3 of them, coeff 1.0
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    t = _tri_dict(spark, k4)
    assert t == {i: (3, 3, 1.0) for i in range(4)}


def test_triangle_orientation_and_duplicates_irrelevant(spark):
    # same triangle given with reversed + duplicated edges
    t = _tri_dict(spark, [(2, 1), (1, 2), (3, 2), (1, 3), (3, 1)])
    assert t == {1: (2, 1, 1.0), 2: (2, 1, 1.0), 3: (2, 1, 1.0)}


def test_triangle_bowtie_coefficients(spark):
    # two triangles sharing node 0: deg(0)=4, in 2 triangles ->
    # coeff = 2*2/(4*3) = 1/3; the wings are full triangles
    bowtie = [(0, 1), (0, 2), (1, 2), (0, 3), (0, 4), (3, 4)]
    t = _tri_dict(spark, bowtie)
    assert t[0] == (4, 2, round(1 / 3, 6))
    for wing in (1, 2, 3, 4):
        assert t[wing] == (2, 1, 1.0)


# ---------------------------------------------------------------------------
# coreness (h-index fixpoint)
# ---------------------------------------------------------------------------

def _coreness_reference(pairs):
    """Textbook peeling: repeatedly remove min-degree nodes; a node's
    coreness is the k level at which it gets peeled."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    core = {}
    alive = dict(adj)
    deg = {n: len(v) for n, v in alive.items()}
    k = 0
    while deg:
        k = max(k, min(deg.values()))
        peel = [n for n, d in deg.items() if d <= k]
        for n in peel:
            core[n] = k
            for m in adj[n]:
                if m in deg and m != n:
                    deg[m] -= 1
            del deg[n]
    return core


def _coreness_dict(spark, pairs):
    from uav_streamprocessor_spark.operators.graph import coreness

    edges = spark.createDataFrame(pairs, "src long, dst long")
    return {r["node"]: r["coreness"] for r in coreness(edges).collect()}


def test_coreness_shapes(spark):
    # path: everything coreness 1
    assert _coreness_dict(spark, [(i, i + 1) for i in range(5)]) == {
        i: 1 for i in range(6)
    }
    # cycle: coreness 2
    assert _coreness_dict(spark, [(i, (i + 1) % 5) for i in range(5)]) == {
        i: 2 for i in range(5)
    }
    # K4 with a pendant: clique 3, pendant 1
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = _coreness_dict(spark, k4 + [(3, 9)])
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 9: 1}


def test_coreness_first_round_brackets_fixpoint(spark):
    """The 1-round shadow behind dedup_coreness_contraction: h1 equals
    the fixpoint on one-round graphs (clique+pendant, star) and brackets
    it (coreness <= h1 <= degree) on a graph that needs more rounds."""
    from uav_streamprocessor_spark.operators.graph import coreness_first_round

    def round1(pairs):
        edges = spark.createDataFrame(pairs, "src long, dst long")
        return {
            r["node"]: (r["degree"], r["h1"])
            for r in coreness_first_round(edges).collect()
        }

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = round1(k4 + [(3, 9)])
    # clique nodes 0-2: degree 3, neighbor degrees {3,3,4} -> h1 = 3 ==
    # coreness; node 3 carries the pendant (degree 4, h-index 3); the
    # pendant sees one degree-4 neighbor -> h1 = min(1, 4) = 1
    assert got == {0: (3, 3), 1: (3, 3), 2: (3, 3), 3: (4, 3), 9: (1, 1)}
    # star: one round already reaches the all-1 fixpoint
    star = [(0, i) for i in range(1, 6)]
    assert round1(star) == {0: (5, 1), **{i: (1, 1) for i in range(1, 6)}}
    # random graph: bracketing invariant against the converged fixpoint
    import random

    rng = random.Random(7)
    pairs = list({tuple(sorted((rng.randrange(30), rng.randrange(30))))
                  for _ in range(120)})
    pairs = [p for p in pairs if p[0] != p[1]]
    core = _coreness_dict(spark, pairs)
    r1 = round1(pairs)
    assert set(r1) == set(core)
    assert any(r1[n][1] > core[n] for n in core)  # truncation is real
    for n, (degree, h1) in r1.items():
        assert core[n] <= h1 <= degree, n


def test_coreness_matches_peeling_reference_on_random_graph(spark):
    import random

    rng = random.Random(7)
    pairs = list({tuple(sorted((rng.randrange(30), rng.randrange(30))))
                  for _ in range(120)})
    pairs = [p for p in pairs if p[0] != p[1]]
    assert _coreness_dict(spark, pairs) == _coreness_reference(pairs)


def test_coreness_corpus_matches_reference(spark):
    from uav_streamprocessor_spark.fixtures import register_uav_views
    from uav_streamprocessor_spark.operators import dedup

    register_uav_views(spark, "/root/testdata/sf0.001")
    got = {
        r["doc_id"]: r["coreness"]
        for r in dedup.doc_graph_coreness(spark).collect()
    }
    pairs = [
        (r["src"], r["dst"])
        for r in dedup.doc_block_edges(spark).collect()
    ]
    assert got == _coreness_reference(pairs)
    assert len(got) > 0 and max(got.values()) >= 2


def test_modularity_closed_forms_on_planted_partitions(spark):
    """Two disjoint triangles with their CC partition: each community
    has e_c = 3, m = 6, d_c = 6 -> contribution 3/6 - (6/12)^2 = 0.25,
    Q = 0.5 exactly. Merging everything into ONE community scores
    Q = (6/6) - 1^2 = 0 exactly (the null partition)."""
    from uav_streamprocessor_spark.operators.graph import modularity

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)],
        "src long, dst long",
    )
    two = spark.createDataFrame(
        [(n, 1 if n < 10 else 10) for n in [1, 2, 3, 10, 11, 12]],
        "node long, community long",
    )
    rows = {r["community"]: r for r in modularity(edges, two).collect()}
    assert set(rows) == {1, 10}
    for r in rows.values():
        assert r["within_edges"] == 3 and r["degree_sum"] == 6
        assert r["contribution"] == 0.25
        assert r["modularity_q"] == 0.5

    one = spark.createDataFrame(
        [(n, 1) for n in [1, 2, 3, 10, 11, 12]], "node long, community long"
    )
    null_rows = modularity(edges, one).collect()
    assert len(null_rows) == 1 and null_rows[0]["modularity_q"] == 0.0


def test_modularity_duplicate_and_reversed_edges_invariant(spark):
    """The undirected-simple normalization makes duplicate and reversed
    edges no-ops."""
    from uav_streamprocessor_spark.operators.graph import modularity

    base = [(1, 2), (2, 3), (1, 3)]
    noisy = base + [(b, a) for a, b in base] + base
    labels = spark.createDataFrame(
        [(n, 1) for n in (1, 2, 3)], "node long, community long"
    )
    clean = modularity(
        spark.createDataFrame(base, "src long, dst long"), labels
    ).collect()
    messy = modularity(
        spark.createDataFrame(noisy, "src long, dst long"), labels
    ).collect()
    assert clean == messy


def test_modularity_on_corpus_blocking_graph(spark):
    """The CC partition of its own graph maximizes within-edges: every
    edge is within-community, so Q = 1 - Σ(d_c/2m)² > 0, and the
    within-edge total equals m."""
    from uav_streamprocessor_spark.fixtures import register_uav_views
    from uav_streamprocessor_spark.operators import dedup
    from uav_streamprocessor_spark.operators.graph import modularity
    from pyspark.sql import functions as F

    register_uav_views(spark, "/root/testdata/sf0.001")
    edges = dedup.doc_block_edges(spark)
    labels = dedup.doc_dup_clusters(spark).select(
        F.col("doc_id").alias("node"), F.col("cluster_id").alias("community")
    )
    rows = modularity(edges, labels).collect()
    assert rows
    m = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
        .count()
    )
    assert sum(r["within_edges"] for r in rows) == m
    assert 0.0 < rows[0]["modularity_q"] <= 1.0


def test_pagerank_quantized_matches_numpy_bit_exact(spark):
    """quantize=True (the r13 dedup_pagerank_centrality promotion): both
    the engine and a numpy replication snap every round — and the 1/N
    init — to the 1e-9 grid, so the traces must agree BIT-FOR-BIT, not
    just within tolerance. This is the same progressive-rounding law the
    DuckDB recursive-CTE oracle applies."""
    import numpy as np

    pairs = [(0, i) for i in range(1, 6)] + [(6, 7), (7, 8), (20, 21), (5, 6)]
    got = _pr_dict(spark, pairs, quantize=True)

    edges = set()
    for a, b in pairs:
        edges.add((a, b))
        edges.add((b, a))
    nodes = sorted({x for e in edges for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for u, _ in edges:
        outdeg[idx[u]] += 1
    q = lambda x: np.round(x * 1e9) / 1e9
    r = q(np.full(n, 1.0 / n))
    for _ in range(10):
        contrib = np.zeros(n)
        for u, v in edges:
            contrib[idx[v]] += r[idx[u]] / outdeg[idx[u]]
        r = q((1 - 0.85) / n + 0.85 * contrib)
    for node in nodes:
        assert got[node] == r[idx[node]], node  # exact, no tolerance
    # quantization is a <=1e-9-per-round perturbation of the true ranks
    want = _numpy_pagerank(pairs)
    for node in nodes:
        assert abs(got[node] - want[node]) < 2e-8, node
