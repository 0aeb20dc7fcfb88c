"""Graph traversal streams (solrj io/graph) as DataFrame iterations.

- ``gather_nodes`` — GatherNodesStream (io/graph/GatherNodesStream.java):
  one breadth-first hop from a set of root nodes across an edge
  relation ("walk from->to"), emitting the gathered nodes (scatter
  LEAVES default, optionally BRANCHES too) with optional per-node
  metrics and ancestor tracking (trackTraversal).
- ``shortest_path`` — ShortestPathStream (io/graph/ShortestPathStream
  .java:316-440): level-synchronous BFS keeping EVERY parent of each
  newly reached node per level, stopping at the first level that
  reaches the target, then walking the per-level parent lists backward
  to enumerate ALL shortest paths (one tuple per path, field ``path``).

Spark-first shapes:
- Each BFS level is ONE join of the frontier against the edge relation
  plus an anti-join against the visited set — the reference's
  joinBatchSize-batched /export queries collapse into a single
  distributed hash join per level; parent links stay DataFrames (never
  driver lists), so a frontier of billions of nodes is fine.  The only
  driver-side state is the loop counter and the found flag (one
  ``.limit(1).count()`` per level — the reference's targets check).
- Path reconstruction is depth-many joins prepending the parent column
  to an array column — O(shortest-path count) rows, executed on
  executors; the driver never materializes paths.
"""
from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def gather_nodes(edges: DataFrame, roots: DataFrame,
                 from_col: str, to_col: str,
                 scatter: Sequence[str] = ("leaves",),
                 track_traversal: bool = False,
                 metrics: dict[str, Sequence[str]] | None = None
                 ) -> DataFrame:
    """One gatherNodes hop: `roots` is a DataFrame with one column (the
    node ids), `edges` the from->to relation.  Returns (node, level
    [, ancestors][, metric...]) — level 0 rows are the scattered
    branches (roots), level 1 the gathered leaves, distinct per node
    with every ancestor collected when track_traversal (the
    reference's ancestors list)."""
    root_col = roots.columns[0]
    hop = edges.join(
        roots.select(F.col(root_col).alias(from_col)).distinct(), from_col
    )
    aggs = [F.count("*").alias("count_rows")]
    if metrics:
        from .streams import _metric_cols

        aggs = list(_metric_cols(metrics))
    if track_traversal:
        aggs.append(F.sort_array(F.collect_set(F.col(from_col)))
                    .alias("ancestors"))
    leaves = (
        hop.groupBy(F.col(to_col).alias("node"))
        .agg(*aggs)
        .withColumn("level", F.lit(1))
    )
    out = leaves
    if "branches" in scatter:
        branches = (
            roots.select(F.col(root_col).alias("node")).distinct()
            .withColumn("level", F.lit(0))
        )
        for c in leaves.columns:
            if c not in ("node", "level"):
                branches = branches.withColumn(
                    c, F.lit(None).cast(leaves.schema[c].dataType)
                )
        out = branches.select(*leaves.columns).unionByName(leaves)
    if "leaves" not in scatter:
        out = out.filter(F.col("level") == 0)
    return out.orderBy("level", "node")


def shortest_path(edges: DataFrame, from_node: str, to_node: str,
                  from_col: str = "from", to_col: str = "to",
                  max_depth: int = 4) -> DataFrame:
    """All shortest paths from `from_node` to `to_node` as
    DataFrame(path array<string>, depth int), empty when none within
    `max_depth` (the reference emits a "No path found" sentinel; we
    keep the relational shape and return zero rows).  Level-synchronous
    BFS: nodes reached at an earlier level are excluded from later
    frontiers (they cannot lie on a shortest path through a later
    level), every parent at the reaching level is kept, and the final
    walk-back enumerates each distinct path once
    (ShortestPathStream.java:395-440)."""
    spark = edges.sparkSession
    e = edges.select(F.col(from_col).alias("src"),
                     F.col(to_col).alias("dst")).distinct()
    frontier = spark.createDataFrame([(from_node,)], "node string")
    visited = frontier
    links: list[DataFrame] = []  # links[d]: (dst, src) reached at depth d+1
    found_depth = -1
    for depth in range(max_depth):
        hop = (
            e.join(frontier.withColumnRenamed("node", "src"), "src")
            .join(visited.withColumnRenamed("node", "dst"), "dst",
                  "left_anti")
            .select("dst", "src").distinct()
        )
        hop.persist()
        if hop.limit(1).count() == 0:
            hop.unpersist()
            break
        links.append(hop)
        if hop.filter(F.col("dst") == to_node).limit(1).count() > 0:
            found_depth = depth
            break
        frontier = hop.select(F.col("dst").alias("node")).distinct()
        visited = visited.union(frontier).distinct()
    if found_depth < 0:
        for h in links:
            h.unpersist()
        return spark.createDataFrame([], "path array<string>, depth int")
    paths = (
        links[found_depth].filter(F.col("dst") == to_node)
        .select(F.array("src", "dst").alias("path"))
    )
    for d in range(found_depth - 1, -1, -1):
        paths = (
            links[d]
            .join(paths.withColumn("dst", F.element_at("path", 1)), "dst")
            .select(F.concat(F.array("src"), "path").alias("path"))
        )
    out = paths.distinct().withColumn(
        "depth", F.lit(found_depth + 1)
    ).orderBy(F.array_join("path", "->"))
    for h in links:
        h.unpersist()
    return out
