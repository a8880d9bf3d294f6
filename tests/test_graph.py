"""Connected components (operators/graph.py): hash-min label propagation.

The reference's dedup is exact-key only (pipeline/transform.py:72-75);
clustering generalizes "keep one representative per duplicate group" to
transitive near-dup groups.  These tests pin the fixpoint semantics on
graphs whose components are known by construction.
"""

import pytest

from data_engineering_etl_demo_spark.operators.graph import connected_components


def _components(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = connected_components(df).collect()
    return {r["node"]: r["component"] for r in rows}


def test_two_components(spark):
    # chain 1-2-3 (diameter 2) plus a separate pair 10-11
    got = _components(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    # path graph 0-1-...-9: worst diameter for hash-min at this size;
    # label 0 must still reach the far end within max_iter
    edges = [(i, i + 1) for i in range(9)]
    got = _components(spark, edges)
    assert got == {i: 0 for i in range(10)}


def test_cycle_and_self_loop(spark):
    # cycle 5-6-7-5 plus a self-loop 8-8 (isolated vertex via its own edge)
    got = _components(spark, [(5, 6), (6, 7), (7, 5), (8, 8)])
    assert got == {5: 5, 6: 5, 7: 5, 8: 8}


def test_edge_direction_irrelevant(spark):
    # (b, a) edges give the same undirected components as (a, b)
    got = _components(spark, [(4, 2), (2, 9)])
    assert got == {2: 2, 4: 2, 9: 2}


def test_max_iter_guard(spark):
    # driver_threshold=0 forces the distributed star rounds — the guard
    # only exists on that path (the driver fast path cannot half-converge)
    df = spark.createDataFrame([(i, i + 1) for i in range(12)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="no convergence"):
        connected_components(df, max_iter=1, driver_threshold=0)


def test_driver_fast_path_matches_star_rounds(spark):
    # the small-graph union-find fast path must produce EXACTLY the labels
    # the distributed star rounds produce — same min-reachable-id contract
    edges = [(1, 2), (2, 3), (10, 11), (7, 7), (20, 3), (11, 30)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    fast = {r["node"]: r["component"] for r in connected_components(df).collect()}
    dist = {
        r["node"]: r["component"]
        for r in connected_components(df, driver_threshold=0).collect()
    }
    assert fast == dist == {
        1: 1, 2: 1, 3: 1, 20: 1, 10: 10, 11: 10, 30: 10, 7: 7,
    }


# ---------------------------------------------------------------------------
# Degree-ordered triangle census
# ---------------------------------------------------------------------------


def _dense_edges():
    """A hub-heavy graph: 3 cliques of 10 sharing a hub vertex, plus a
    sprinkle of chain edges — the shape where id-orientation pays
    hub-degree-squared wedges."""
    edges = set()
    hub = 0
    for c in range(3):
        members = [hub] + [100 * (c + 1) + i for i in range(10)]
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                edges.add((min(a, b), max(a, b)))
    for i in range(50):
        edges.add((1000 + i, 1001 + i))
    return sorted(edges)


def _naive_counts(edges):
    """Reference triangle count: brute force over the adjacency sets."""
    import itertools

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tris = 0
    for a, b in edges:
        tris += len(adj[a] & adj[b] & {v for v in adj if v > b})
    # id-oriented wedge count: sum over v of C(out_deg(v), 2)
    out = {}
    for a, b in edges:
        out[a] = out.get(a, 0) + 1
    wedges = sum(d * (d - 1) // 2 for d in out.values())
    return wedges, tris


def test_triangle_census_degree_ordered_counts(spark):
    from data_engineering_etl_demo_spark.operators.graph import triangle_census

    edges = _dense_edges()
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    row = triangle_census(df).collect()[0]
    id_wedges, expect_tris = _naive_counts(edges)
    assert row["n_edges"] == len(edges)
    assert row["n_triangles"] == expect_tris
    # the point of degree ordering: strictly fewer wedge candidates than
    # the id orientation on a hub-heavy graph
    assert row["n_wedges"] < id_wedges
    # and never fewer than the triangles they must contain
    assert row["n_wedges"] >= row["n_triangles"]


def test_triangle_census_matches_sql_replay(spark):
    import duckdb

    from data_engineering_etl_demo_spark.operators.graph import (
        sql_triangle_census,
        triangle_census,
    )

    edges = _dense_edges()
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = tuple(triangle_census(df).collect()[0])
    con = duckdb.connect()
    import pandas as pd

    con.register("edge_df", pd.DataFrame(edges, columns=["id_a", "id_b"]))
    want = con.execute(
        sql_triangle_census("SELECT id_a, id_b FROM edge_df")
    ).fetchone()
    assert got == want


# ---------------------------------------------------------------------------
# Fixed-point PageRank
# ---------------------------------------------------------------------------


def test_pagerank_path_graph_closed_form(spark):
    """Hand-computed two-iteration ranks on the path 1-2-3 (all integer
    fixed-point steps replayed by hand)."""
    from data_engineering_etl_demo_spark.operators.graph import pagerank

    df = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    got = {r["doc_id"]: r["rank_fp"] for r in pagerank(df, iters=2).collect()}
    assert got == {
        1: 312083333333,
        2: 375833333332,
        3: 312083333333,
    }
    # center of the path outranks the leaves
    assert got[2] > got[1] == got[3]


def test_pagerank_matches_sql_replay(spark):
    import duckdb
    import pandas as pd

    from data_engineering_etl_demo_spark.operators.graph import (
        pagerank,
        sql_pagerank,
    )

    edges = _dense_edges()
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = sorted(map(tuple, pagerank(df, iters=2).collect()))
    con = duckdb.connect()
    con.register("edge_df", pd.DataFrame(edges, columns=["id_a", "id_b"]))
    want = sorted(
        con.execute(
            sql_pagerank("SELECT id_a, id_b FROM edge_df", iters=2)
        ).fetchall()
    )
    assert got == want


def test_census_and_pagerank_empty_graph(spark):
    from data_engineering_etl_demo_spark.operators.graph import (
        pagerank,
        triangle_census,
    )

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert tuple(triangle_census(empty).collect()[0]) == (0, 0, 0)
    pr = pagerank(empty, iters=2)
    assert pr.collect() == []
    assert [f.name for f in pr.schema.fields] == ["doc_id", "rank_fp"]


def test_bounded_hops_path_graph_truncates(spark):
    """Closed-form check on a path graph 0-1-2-3-4-5 with seed {0}:
    hops are exact BFS distances, truncation drops nodes beyond
    max_hops, and a node reachable two ways keeps the MIN distance."""
    from data_engineering_etl_demo_spark.operators.graph import bounded_hops

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 3)],
        "id_a long, id_b long",
    )
    seeds = spark.createDataFrame([(0,)], "doc_id long")
    got = {
        r["node"]: r["hop"]
        for r in bounded_hops(edges, seeds, max_hops=2).collect()
    }
    # 0-3 edge gives 3 distance 1, so 4 is at 2; 2 is at 2; node 5 is at
    # distance 3 and must be DROPPED by the max_hops=2 truncation
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 2}


def test_bounded_hops_no_edges_returns_seeds_only(spark):
    from data_engineering_etl_demo_spark.operators.graph import bounded_hops

    edges = spark.createDataFrame([], "id_a long, id_b long")
    seeds = spark.createDataFrame([(7,), (9,)], "doc_id long")
    got = {
        r["node"]: r["hop"]
        for r in bounded_hops(edges, seeds, max_hops=2).collect()
    }
    assert got == {7: 0, 9: 0}


def test_bounded_hops_matches_python_bfs_on_random_graph(spark):
    """One seeded random graph, checked against a driver-side BFS model:
    the distributed min-hop labels must equal classic BFS distances
    truncated at max_hops, for every choice of max_hops."""
    import random
    from collections import deque

    rng = random.Random(20260814)
    n = 30
    edges = sorted(
        {
            (a, b)
            for _ in range(45)
            for a, b in [sorted(rng.sample(range(n), 2))]
        }
    )
    seeds = [0, 17]
    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)

    def bfs(max_hops):
        dist = {s: 0 for s in seeds}
        dq = deque(seeds)
        while dq:
            u = dq.popleft()
            if dist[u] >= max_hops:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        return dist

    from data_engineering_etl_demo_spark.operators.graph import bounded_hops

    edf = spark.createDataFrame(edges, "id_a long, id_b long")
    sdf = spark.createDataFrame([(s,) for s in seeds], "doc_id long")
    for k in (1, 2, 4):
        # both the driver fast path (default threshold) and the
        # distributed BSP rounds (threshold 0) must equal the BFS model
        for thr in (100_000, 0):
            got = {
                r["node"]: r["hop"]
                for r in bounded_hops(
                    edf, sdf, max_hops=k, driver_threshold=thr
                ).collect()
            }
            assert got == bfs(k), f"max_hops={k} threshold={thr}"


def test_star_cc_rounds_logarithmic_on_path_graph(spark):
    """The reason large-star/small-star replaced hash-min (VERDICT r5):
    a path graph — the adversarial chain-of-dups shape — must converge in
    O(log n) star rounds, not O(n) diameter rounds."""
    import math

    from data_engineering_etl_demo_spark.operators.graph import (
        connected_components_with_rounds,
    )

    n = 256
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    labels, rounds = connected_components_with_rounds(df, driver_threshold=0)
    assert {r["node"]: r["component"] for r in labels.collect()} == {
        i: 0 for i in range(n)
    }
    assert rounds <= math.ceil(math.log2(n)) + 3, rounds
