"""Degree-ordered triangle counting (operators/graphs)."""

from pyspark.sql import functions as F

from ngafid_cpat_spark.operators import graphs as G


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["u", "v"])


def test_k4_every_node_in_three_triangles(spark):
    # K4 has 4 triangles; each node sits in exactly 3 of them
    k4 = _edges(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)])
    out = {r["node"]: r["n_triangles"] for r in G.triangle_counts(k4).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_free_graphs_yield_nothing(spark):
    path = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    star = _edges(spark, [(0, i) for i in range(1, 8)])
    assert G.triangle_counts(path).count() == 0
    assert G.triangle_counts(star).count() == 0


def test_hub_plus_one_closing_edge(spark):
    # star on 0 plus the single edge (1,2): exactly one triangle
    # {0,1,2} — the hub's high degree must not double-count via
    # wedge symmetry (orientation keeps each wedge once)
    g = _edges(spark, [(0, i) for i in range(1, 8)] + [(1, 2)])
    out = {r["node"]: r["n_triangles"] for r in G.triangle_counts(g).collect()}
    assert out == {0: 1, 1: 1, 2: 1}


def test_oriented_out_degree_bounded_on_star(spark):
    # the scale property the operator exists for: orientation points
    # every star edge AT the hub (leaves have lower degree), so the
    # hub's oriented OUT-degree is 0 and the wedge join has no hot key
    star = _edges(spark, [(0, i) for i in range(1, 101)])
    o = G.oriented_edges(star)
    hub_out = o.filter(F.col("src") == 0).count()
    assert hub_out == 0
    assert o.count() == 100


def test_triangle_counts_with_ids_beyond_packing_range(spark):
    """Node ids above 1e9 must still count correctly: the ord key is
    a (deg, id) struct compared lexicographically, not an arithmetic
    pack that collides/overflows on large raw ids."""
    b = 3_000_000_000
    g = _edges(spark, [(b + 1, b + 2), (b + 1, b + 3), (b + 2, b + 3),
                       (b + 3, b + 4), (5, b + 1)])
    out = {r["node"]: r["n_triangles"] for r in G.triangle_counts(g).collect()}
    assert out == {b + 1: 1, b + 2: 1, b + 3: 1}


def _pagerank_py(pairs, n_iter=3):
    """Independent integer-micro PageRank reference (pure python,
    same arithmetic contract as pagerank_micro)."""
    adj: dict = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    deg = {n: len(ms) for n, ms in adj.items()}
    r = {n: 1_000_000 for n in adj}
    for _ in range(n_iter):
        contrib = {n: 0 for n in adj}
        for u, ms in adj.items():
            c = r[u] // deg[u]
            for v in ms:
                contrib[v] += c
        r = {n: 150_000 + (17 * contrib[n]) // 20 for n in adj}
    return r


def test_pagerank_matches_python_reference(spark):
    """pagerank_micro == the pure-python integer recipe on an
    irregular graph (hub + chain + isolated pair): bit-exact BIGINT
    micros, no float tolerance needed."""
    pairs = [(1, 2), (1, 3), (1, 4), (1, 5), (5, 6), (6, 7), (8, 9)]
    out = {
        r["node"]: r["rank_micro"]
        for r in G.pagerank_micro(_edges(spark, pairs), n_iter=3).collect()
    }
    assert out == _pagerank_py(pairs, 3)


def test_pagerank_hub_outranks_leaves(spark):
    # star graph: the hub accumulates its leaves' full contributions
    pairs = [(0, i) for i in range(1, 6)]
    out = {
        r["node"]: r["rank_micro"]
        for r in G.pagerank_micro(_edges(spark, pairs), n_iter=3).collect()
    }
    assert out[0] > max(out[i] for i in range(1, 6))
    assert len({out[i] for i in range(1, 6)}) == 1  # leaves symmetric
