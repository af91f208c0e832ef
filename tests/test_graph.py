"""Tests for operators/graph.py — weighted PageRank invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import types as Ty

from etl_cortex_spark.operators.graph import pagerank

_E = Ty.StructType(
    [
        Ty.StructField("src", Ty.LongType()),
        Ty.StructField("dst", Ty.LongType()),
        Ty.StructField("w", Ty.DoubleType()),
    ]
)
_N = Ty.StructType([Ty.StructField("node", Ty.LongType())])


def _graph(spark, edges, nodes):
    return (
        spark.createDataFrame([(s, d, float(w)) for s, d, w in edges], _E),
        spark.createDataFrame([(n,) for n in nodes], _N),
    )


def _ranks(df):
    return {r.node: r.pr for r in df.collect()}


def test_mass_conserved(spark):
    e, n = _graph(spark, [(0, 1, 1), (1, 2, 1), (2, 0, 1), (0, 2, 2)], [0, 1, 2])
    pr = _ranks(pagerank(e, n, iters=4))
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-9)


def test_symmetric_cycle_is_uniform(spark):
    e, n = _graph(spark, [(0, 1, 1), (1, 2, 1), (2, 0, 1)], [0, 1, 2])
    pr = _ranks(pagerank(e, n, iters=5))
    for v in pr.values():
        assert v == pytest.approx(1.0 / 3, abs=1e-9)


def test_hub_outranks_leaves(spark):
    # every leaf points at node 0; node 0 points at leaf 1 only
    edges = [(i, 0, 1) for i in (1, 2, 3, 4)] + [(0, 1, 1)]
    e, n = _graph(spark, edges, [0, 1, 2, 3, 4])
    pr = _ranks(pagerank(e, n, iters=5))
    assert pr[0] == max(pr.values())
    assert pr[1] > pr[2] == pytest.approx(pr[3], abs=1e-12)


def test_dangling_mass_redistributed(spark):
    # node 2 has no out-edges: its mass must spread, keeping sum == 1
    e, n = _graph(spark, [(0, 2, 1), (1, 2, 1)], [0, 1, 2])
    pr = _ranks(pagerank(e, n, iters=4))
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-9)
    assert pr[2] == max(pr.values())


def test_edge_weights_matter(spark):
    # node 0 splits 9:1 between 1 and 2
    e, n = _graph(spark, [(0, 1, 9), (0, 2, 1), (1, 0, 1), (2, 0, 1)], [0, 1, 2])
    pr = _ranks(pagerank(e, n, iters=5))
    assert pr[1] > pr[2]


@pytest.mark.slow
def test_deep_iteration_with_lineage_truncation(spark):
    """iters crossing the localCheckpoint boundaries must still
    converge to the cycle's stationary uniform vector."""
    e, n = _graph(spark, [(0, 1, 1), (1, 2, 1), (2, 0, 1)], [0, 1, 2])
    pr = _ranks(pagerank(e, n, iters=12))
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-9)
    for v in pr.values():
        assert v == pytest.approx(1.0 / 3, abs=1e-9)


def test_triangle_count_known_graphs(spark):
    from etl_cortex_spark.operators.graph import triangle_count

    # K4: 4 triangles, every node in exactly 3; edge directions and
    # duplicates must not matter
    k4 = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 3)],
        "src long, dst long",
    )
    got = {
        (r["node"], r["n_triangles"]) for r in triangle_count(k4).collect()
    }
    assert got == {(1, 3), (2, 3), (3, 3), (4, 3)}

    # path graph: no triangles → empty result
    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    assert triangle_count(path).count() == 0

    # self-loops ignored
    loops = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 3), (1, 3)], "src long, dst long"
    )
    got = {
        (r["node"], r["n_triangles"]) for r in triangle_count(loops).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1)}


def test_triangle_degree_ordering_same_set_fewer_wedges(spark):
    """Star + clique fixture: the hub (lowest id, highest degree) is
    the id-ordering worst case — it fans out C(deg, 2) wedges that can
    never close. Degree-ordering charges every edge to its
    lowest-degree endpoint, so the star contributes ZERO wedges, while
    the enumerated triangle set (and therefore every per-node count)
    is identical under both orientations."""
    from etl_cortex_spark.operators.graph import (
        _canonical_edges,
        oriented_edges,
        triangle_count,
        triangle_wedges,
    )

    # hub 0 — 20 leaves (no triangles), K4 on 100..103 (4 triangles),
    # plus one triangle touching the hub via two leaves (1, 2)
    star = [(0, i) for i in range(1, 21)]
    k4 = [(a, b) for a in (100, 101, 102, 103) for b in (100, 101, 102, 103) if a < b]
    extra = [(1, 2)]  # closes triangle (0, 1, 2)
    edges = spark.createDataFrame(star + k4 + extra, "src long, dst long")

    by_id = {
        (r["node"], r["n_triangles"])
        for r in triangle_count(edges, order_by_degree=False).collect()
    }
    by_deg = {
        (r["node"], r["n_triangles"])
        for r in triangle_count(edges, order_by_degree=True).collect()
    }
    assert by_id == by_deg
    assert by_deg == {
        (0, 1), (1, 1), (2, 1),
        (100, 3), (101, 3), (102, 3), (103, 3),
    }

    und = _canonical_edges(edges, "src", "dst")
    w_id = triangle_wedges(oriented_edges(und, by_degree=False)).count()
    w_deg = triangle_wedges(oriented_edges(und, by_degree=True)).count()
    # id-ordering: hub 0 alone fans out C(20, 2) = 190 wedges (all 20
    # star edges orient AWAY from id 0); degree-ordering: every star
    # edge points INTO the hub -> 0 star wedges; only the K4
    # (arboricity-bounded) and the (0,1,2) triangle's wedges remain.
    assert w_id >= 190
    assert w_deg <= 10
    assert w_deg < w_id / 19


def test_label_propagation_separates_two_communities(spark):
    """Two triangles bridged by nothing: every node must end labeled
    with its own triangle's minimum; isolated node keeps its label."""
    from etl_cortex_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (0, 2, 1), (10, 11, 1), (11, 12, 1), (10, 12, 1)],
        "src bigint, dst bigint, w bigint",
    )
    nodes = spark.createDataFrame([(i,) for i in (0, 1, 2, 10, 11, 12, 99)], "id bigint")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(nodes, edges, iters=3).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10, 99: 99}


def test_label_propagation_weight_beats_count(spark):
    """A node pulled by one heavy edge and two light ones must adopt
    the HEAVY neighbor's label — votes are weight sums, not neighbor
    counts. (Node 3: edge w=10 to label-0 side, edges w=1+1 to nodes
    4,5 which start labeled 4 and 5 — distinct labels, so even their
    sum can't beat 10.)"""
    from etl_cortex_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(0, 3, 10), (4, 3, 1), (5, 3, 1)], "src bigint, dst bigint, w bigint"
    )
    nodes = spark.createDataFrame([(i,) for i in (0, 3, 4, 5)], "id bigint")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(nodes, edges, iters=1).collect()
    }
    assert got[3] == 0


def test_bfs_hops_levels_reachability_and_exhaustion(spark):
    """bfs_hops (round 11): exact hop levels on a hand graph, the
    unreachable component excluded, source at 0 — and a chain longer
    than max_iter raises instead of silently truncating."""
    import pytest

    from etl_cortex_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 5), (5, 4), (8, 9)],
        "src bigint, dst bigint",
    )
    got = {r["node"]: r["hops"] for r in bfs_hops(edges, 1).collect()}
    # 4 is reachable in 2 via 5 (shorter than 1-2-3-4); 8,9 unreachable
    assert got == {1: 0, 2: 1, 5: 1, 3: 2, 4: 2}
    # undirected: BFS from 4 reaches 1 in 2
    got4 = {r["node"]: r["hops"] for r in bfs_hops(edges, 4).collect()}
    assert got4[1] == 2 and 8 not in got4

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src bigint, dst bigint"
    )
    with pytest.raises(RuntimeError, match="max_iter"):
        bfs_hops(chain, 0, max_iter=3)


def test_directed_3cycles_counts_each_cycle_once(spark):
    """Hand-built tournaments: a pure 3-cycle counts exactly 1, a
    transitive (scalar-reward-explainable) tournament counts 0, a
    4-node tournament with two overlapping cycles counts both, and
    duplicate edges don't double-count."""
    from etl_cortex_spark.operators.graph import directed_3cycles

    def run(edges):
        df = spark.createDataFrame(edges, "src long, dst long")
        [r] = directed_3cycles(df).collect()
        return r.n_edges, r.n_cycles

    assert run([(1, 2), (2, 3), (3, 1)]) == (3, 1)
    assert run([(1, 2), (2, 3), (1, 3)]) == (3, 0)  # transitive
    # 4 nodes: 1→2→3→1 and 1→2→4→1 share edge 1→2
    assert run([(1, 2), (2, 3), (3, 1), (2, 4), (4, 1)]) == (5, 2)
    # duplicate edges collapse before counting
    assert run([(1, 2), (1, 2), (2, 3), (3, 1)]) == (3, 1)
