"""Connected components (alternating large/small-star) vs a
sequential union-find brute force."""

from __future__ import annotations

import random

from hypothesis import given, settings, strategies as st

from data_frame_spark.operators.graph import connected_components, cluster_documents


def _uf_components(edges, n_hint=0):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        if u == v:
            continue  # self-loops carry no connectivity (dropped by the operator)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical rep = min vertex of the component
    comp = {}
    for x in list(parent):
        root = find(x)
        comp.setdefault(root, []).append(x)
    out = {}
    for members in comp.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def _run(spark, edges):
    df = spark.createDataFrame(
        [(int(u), int(v)) for u, v in edges], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(df).collect()
    }
    want = _uf_components(edges)
    assert got == want


def test_cc_two_triangles_bridge(spark):
    _run(spark, [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (3, 10), (20, 21)])


def test_cc_long_chain_converges_fast(spark):
    # a 64-node path: naive min-label needs 63 rounds; alternating
    # stars must finish within max_rounds=12 (O(log n))
    edges = [(i, i + 1) for i in range(64)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in
           connected_components(df, max_rounds=12).collect()}
    assert got == {i: 0 for i in range(65)}


def test_cc_self_loops_and_duplicates(spark):
    _run(spark, [(5, 5), (1, 2), (2, 1), (1, 2), (7, 3)])


@settings(max_examples=15, deadline=None, derandomize=True)
@given(st.integers(0, 10_000))
def test_cc_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed)
    n = rng.randint(2, 40)
    m = rng.randint(1, 60)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    edges = [(u, v) for u, v in edges if u != v] or [(0, 1)]
    _run(spark, edges)


def test_cluster_documents_sizes(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (8, 9), (4, 5)], "id_a long, id_b long"
    )
    rows = {(r["id"], r["cluster_id"], r["cluster_size"])
            for r in cluster_documents(df).collect()}
    assert rows == {
        (1, 1, 3), (2, 1, 3), (3, 1, 3),
        (8, 8, 2), (9, 8, 2),
        (4, 4, 2), (5, 4, 2),
    }


def test_cc_empty_edge_list(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).collect() == []
    assert cluster_documents(df).collect() == []


def test_cc_raises_on_uncastable_ids(spark):
    import pytest

    df = spark.createDataFrame(
        [("1", "2"), ("3", "not-a-number")], ["id_a", "id_b"]
    )
    with pytest.raises(ValueError, match="do not cast to long"):
        connected_components(df)


def test_cc_null_ids_dropped_not_raised(spark):
    # genuinely-null ids (not cast failures) keep the old drop
    # semantics — only the (1,2) edge remains
    df = spark.createDataFrame(
        [(1, 2), (None, 5)], "id_a long, id_b long"
    )
    got = {(r["id"], r["component"]) for r in connected_components(df).collect()}
    assert got == {(1, 1), (2, 1)}


def _brute_pagerank(edges, iterations):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    rank = {n: 1_000_000 for n in nodes}
    for _ in range(iterations):
        sums = {n: 0 for n in nodes}
        for s, d in edges:
            sums[d] += rank[s] // deg[s]
        rank = {n: 150000 + (85 * sums[n]) // 100 for n in nodes}
    return rank


def test_pagerank_matches_integer_reference_and_layout(spark):
    import random

    import pytest

    from data_frame_spark.operators.graph import pagerank

    rng = random.Random(21)
    edges = list({(rng.randrange(12), rng.randrange(12)) for _ in range(40)})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_micro"] for r in pagerank(df, iterations=6).collect()}
    assert got == _brute_pagerank(edges, 6)
    # integer arithmetic => bit-identical under any partitioning
    got7 = {
        r["node"]: r["rank_micro"]
        for r in pagerank(df.repartition(7), iterations=6).collect()
    }
    assert got7 == got
    # a hub receiving everything outranks a leaf; iterations=0 is init
    star = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)], "src long, dst long"
    )
    ranks = {r["node"]: r["rank_micro"] for r in pagerank(star, iterations=3).collect()}
    assert ranks[0] > ranks[1] == ranks[5]
    init = {r["node"]: r["rank_micro"] for r in pagerank(star, iterations=0).collect()}
    assert set(init.values()) == {1_000_000}
    with pytest.raises(ValueError):
        pagerank(star, iterations=-1)
