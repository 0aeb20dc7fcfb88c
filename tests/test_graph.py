"""Graph traversal streams (operators/graph.py): gatherNodes one-hop
semantics and ShortestPathStream's all-shortest-paths enumeration
(io/graph/GatherNodesStream.java, ShortestPathStream.java:316-440)."""

import pytest

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e"),
         ("b", "e"), ("e", "a"), ("x", "y")],
        "f string, t string",
    )


def test_shortest_path_all_paths(spark, edges):
    """Two parents at the reaching level -> BOTH shortest paths come
    back (the per-level parent-list walk, :395-440)."""
    from lucene_solr_spark.operators.graph import shortest_path

    got = shortest_path(edges, "a", "d", "f", "t", max_depth=4).collect()
    assert [(r["path"], r["depth"]) for r in got] == [
        (["a", "b", "d"], 2), (["a", "c", "d"], 2),
    ]
    # unique shortest path; the longer a->c->d->e route is not emitted
    got = shortest_path(edges, "a", "e", "f", "t", max_depth=4).collect()
    assert [(r["path"], r["depth"]) for r in got] == [(["a", "b", "e"], 2)]


def test_shortest_path_no_path_and_depth_cap(spark, edges):
    from lucene_solr_spark.operators.graph import shortest_path

    assert shortest_path(edges, "a", "z", "f", "t", max_depth=3).count() == 0
    # reachable at depth 2 but capped at 1 -> no rows (maxDepth contract)
    assert shortest_path(edges, "a", "d", "f", "t", max_depth=1).count() == 0
    # cycle e->a never loops the BFS (visited exclusion)
    assert shortest_path(edges, "a", "y", "f", "t", max_depth=6).count() == 0


def test_gather_nodes_scatter_and_ancestors(spark, edges):
    """leaves carry per-node counts + sorted distinct ancestors
    (trackTraversal); scatter=branches prepends level-0 roots."""
    from lucene_solr_spark.operators.graph import gather_nodes

    roots = spark.createDataFrame([("a",), ("b",)], "node string")
    got = gather_nodes(edges, roots, "f", "t",
                       scatter=("branches", "leaves"),
                       track_traversal=True).collect()
    by = {(r["node"], r["level"]): r for r in got}
    assert set(by) == {("a", 0), ("b", 0), ("b", 1), ("c", 1),
                       ("d", 1), ("e", 1)}
    assert by[("d", 1)]["ancestors"] == ["b"]
    assert by[("b", 1)]["ancestors"] == ["a"]
    assert by[("b", 1)]["count_rows"] == 1
    # leaves-only default drops the roots
    only = gather_nodes(edges, roots, "f", "t").collect()
    assert all(r["level"] == 1 for r in only)
