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
    df = spark.createDataFrame([(i, i + 1) for i in range(12)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="no convergence"):
        connected_components(df, max_iter=1)
