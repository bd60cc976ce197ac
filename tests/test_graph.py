"""ops/graph.py: brute-force cross-checks on seeded random graphs plus
known-shape cases (triangle, square, star). The brute forces are plain
Python over adjacency sets — an independent implementation, not a second
Spark plan."""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from openue_spark.ops.graph import symmetrize, triangle_stats, two_hop_reach


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string"
    )


def _adj(pairs):
    adj = {}
    for a, b in pairs:
        a, b = str(a), str(b)
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


def _brute_two_hop(pairs):
    adj = _adj(pairs)
    out = {}
    for a, nbrs in adj.items():
        reach = set()
        for m in nbrs:
            reach |= adj[m]
        reach.discard(a)
        if reach:
            out[a] = len(reach)
    return out


def _brute_triangles(pairs):
    adj = _adj(pairs)
    und = {tuple(sorted((a, b))) for a, b in ((str(x), str(y)) for x, y in pairs) if a != b}
    tri = sum(
        1
        for u, v, w in itertools.combinations(sorted(adj), 3)
        if v in adj[u] and w in adj[u] and w in adj[v]
    )
    return len(adj), len(und), tri


def _random_pairs(seed, n_nodes=24, n_edges=60):
    rng = random.Random(seed)
    return [
        (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
    ]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_two_hop_reach_matches_brute_force(spark, seed):
    pairs = _random_pairs(seed)
    got = {
        r["entity"]: r["n_two_hop"]
        for r in two_hop_reach(_edges_df(spark, pairs)).collect()
    }
    assert got == _brute_two_hop(pairs)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_triangle_stats_matches_brute_force(spark, seed):
    pairs = _random_pairs(seed)
    row = triangle_stats(_edges_df(spark, pairs)).collect()[0]
    n_nodes, n_edges, n_tri = _brute_triangles(pairs)
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (
        n_nodes,
        n_edges,
        n_tri,
    )
    # every triangle closes exactly one oriented wedge
    assert row["n_wedges"] >= row["n_triangles"]


def test_known_shapes(spark):
    # triangle + square sharing node 0, plus a degree-5 star on node 9:
    # exactly one triangle; the star contributes wedges but closes none
    pairs = [(0, 1), (1, 2), (2, 0), (0, 3), (3, 4), (4, 5), (5, 0)]
    pairs += [(9, k) for k in range(10, 15)]
    row = triangle_stats(_edges_df(spark, pairs)).collect()[0]
    assert row["n_triangles"] == 1
    assert row["n_edges"] == 12
    # star center 9: its 5 leaves each reach the 4 other leaves (and can
    # re-reach nothing else); 9 itself reaches nothing at distance 2
    # (leaves have no other neighbors), so 9 has NO row
    reach = {
        r["entity"]: r["n_two_hop"]
        for r in two_hop_reach(_edges_df(spark, pairs)).collect()
    }
    assert reach["10"] == 4 and "9" not in reach
    assert reach == _brute_two_hop(pairs)


def test_two_hop_mid_degree_cap_is_deterministic_truncation(spark):
    pairs = _random_pairs(7, n_nodes=12, n_edges=80)
    full = {
        r["entity"]: r["n_two_hop"]
        for r in two_hop_reach(_edges_df(spark, pairs)).collect()
    }
    capped_df = two_hop_reach(_edges_df(spark, pairs), max_mid_degree=3)
    capped = {r["entity"]: r["n_two_hop"] for r in capped_df.collect()}
    # cap = first-3-by-id truncation of the MID (hop2) adjacency only; the
    # source hop keeps every edge (ADVICE r4: sources must not be capped)
    adj = _adj(pairs)
    trunc = {a: set(sorted(nbrs)[:3]) for a, nbrs in adj.items()}
    expect = {}
    for a, nbrs in adj.items():
        reach = set()
        for m in nbrs:
            reach |= trunc[m]
        reach.discard(a)
        if reach:
            expect[a] = len(reach)
    assert capped == expect
    assert all(capped[k] <= full[k] for k in capped)


def test_two_hop_approx_within_hll_error(spark):
    pairs = _random_pairs(11, n_nodes=40, n_edges=200)
    exact = {
        r["entity"]: r["n_two_hop"]
        for r in two_hop_reach(_edges_df(spark, pairs)).collect()
    }
    approx = {
        r["entity"]: r["n_two_hop"]
        for r in two_hop_reach(_edges_df(spark, pairs), approx=True).collect()
    }
    assert set(approx) == set(exact)
    for k, v in exact.items():
        assert abs(approx[k] - v) <= max(2, 0.15 * v)


def test_symmetrize_drops_loops_and_dedups(spark):
    sym = symmetrize(_edges_df(spark, [(1, 2), (2, 1), (3, 3), (1, 2)]))
    assert sorted(map(tuple, sym.collect())) == [("1", "2"), ("2", "1")]


def test_triangle_plan_has_no_cartesian(spark):
    df = triangle_stats(_edges_df(spark, _random_pairs(3)))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the single-row count combiners cross-join at the END (1x1 rows);
    # the wedge/closure joins themselves must be key-equi joins
    assert "CartesianProduct" not in plan


def _brute_pagerank_int(pairs, iterations=3, scale=10**12, damping=85):
    e = {(str(a), str(b)) for a, b in pairs if str(a) != str(b)}
    nodes = {a for a, _ in e} | {b for _, b in e}
    outdeg = {}
    for a, _ in e:
        outdeg[a] = outdeg.get(a, 0) + 1
    base = (100 - damping) * scale // 100
    rank = {n: scale for n in nodes}
    for _ in range(iterations):
        c = {n: 0 for n in nodes}
        for a, b in e:
            c[b] += rank[a] // outdeg[a]
        rank = {n: base + (damping * c[n]) // 100 for n in nodes}
    return rank


@pytest.mark.parametrize("seed,iters", [(0, 1), (1, 3), (2, 4)])
def test_pagerank_int_matches_brute_force_exactly(spark, seed, iters):
    from openue_spark.ops.graph import pagerank_int

    pairs = _random_pairs(seed, n_nodes=20, n_edges=70)
    got = {
        r["node"]: r["rank"]
        for r in pagerank_int(_edges_df(spark, pairs), iterations=iters).collect()
    }
    assert got == _brute_pagerank_int(pairs, iterations=iters)


def test_pagerank_int_hub_outranks_leaves(spark):
    from openue_spark.ops.graph import pagerank_int

    # 6 leaves all pointing at one hub; hub points at one sink
    pairs = [(k, 99) for k in range(6)] + [(99, 100)]
    got = {
        r["node"]: r["rank"]
        for r in pagerank_int(_edges_df(spark, pairs)).collect()
    }
    assert got == _brute_pagerank_int(pairs)
    # the hub (6 in-edges) and its sink (fed the hub's whole rank) both
    # outrank every leaf (base mass only)
    assert got["99"] > got["0"] and got["100"] > got["0"]


def _brute_components(pairs):
    adj = _adj(pairs)
    comp = {}
    for start in adj:
        if start in comp:
            continue
        seen, stack = {start}, [start]
        while stack:
            v = stack.pop()
            for w in adj[v]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        label = min(seen)
        for v in seen:
            comp[v] = label
    return comp


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_connected_components_matches_brute_force(spark, seed):
    from openue_spark.ops.graph import connected_components

    pairs = _random_pairs(seed, n_nodes=40, n_edges=35)  # sparse: many comps
    got = {
        r["node"]: r["component"]
        for r in connected_components(_edges_df(spark, pairs)).collect()
    }
    assert got == _brute_components(pairs)


def test_connected_components_chain_and_islands(spark):
    from openue_spark.ops.graph import connected_components

    # a 12-node chain (deep diameter exercises contraction) + a triangle
    pairs = [(i, i + 1) for i in range(11)] + [(90, 91), (91, 92), (92, 90)]
    got = {
        r["node"]: r["component"]
        for r in connected_components(_edges_df(spark, pairs)).collect()
    }
    assert got == _brute_components(pairs)
    assert len(set(got.values())) == 2


def test_pagerank_int_overflow_guard(spark):
    from openue_spark.ops.graph import pagerank_int

    pairs = _random_pairs(3, n_nodes=20, n_edges=50)
    edges = _edges_df(spark, pairs)
    # an explicit scale whose star-graph worst case (85 * n * scale)
    # exceeds int64 must be rejected up front, not overflow silently
    with pytest.raises(ValueError, match="overflow"):
        pagerank_int(edges, scale=10**17)
    # scale=None auto-sizes: at 20 nodes the 10^12 cap is safe and wins
    auto = {
        r["node"]: r["rank"] for r in pagerank_int(edges, scale=None).collect()
    }
    assert auto == _brute_pagerank_int(pairs, scale=10**12)
    # a claimed 10^7-node graph (node_count overrides the count) drops
    # the auto scale to the largest safe power of 10: 10^10
    big = {
        r["node"]: r["rank"]
        for r in pagerank_int(edges, scale=None, node_count=10**7).collect()
    }
    assert big == _brute_pagerank_int(pairs, scale=10**10)


def _brute_lpa(edges, rounds=3):
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    labels = {v: v for v in adj}
    for _ in range(rounds):
        new = {}
        for v in adj:
            cnt = Counter(labels[u] for u in adj[v])
            top = max(cnt.values())
            new[v] = min(l for l, c in cnt.items() if c == top)
        labels = new
    return labels


def test_label_propagation_matches_brute_force(spark):
    import numpy as np

    from openue_spark.ops.graph import label_propagation

    for seed in (0, 1, 2):
        rng = np.random.RandomState(seed)
        edges = {
            (int(a), int(b))
            for a, b in rng.randint(0, 30, size=(60, 2))
            if a != b
        }
        df = spark.createDataFrame(sorted(edges), "src long, dst long")
        got = {r.node: r.label for r in label_propagation(df, 3).collect()}
        assert got == _brute_lpa(edges), f"seed {seed}"


def test_label_propagation_separates_two_cliques(spark):
    """Two 4-cliques joined by a single bridge edge converge to two
    communities labeled by each clique's min node."""
    from openue_spark.ops.graph import label_propagation

    cliq = lambda base: [  # noqa: E731
        (base + i, base + j) for i in range(4) for j in range(i + 1, 4)
    ]
    edges = cliq(0) + cliq(10) + [(3, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.label for r in label_propagation(df, 3).collect()}
    assert got == _brute_lpa(set(edges))
    assert {got[i] for i in range(4)} == {0}
    assert {got[i] for i in range(10, 14)} == {10}
