"""Graph traversal: BFS reachability over an edge table.

Spark has no recursive CTE; the scalable equivalent is frontier
iteration — the same iterative-DataFrame discipline as
``dedup.connected_components`` (min-label propagation), applied to
the other classic graph ask: "which nodes are within k hops of this
seed set, and how far?" (lineage/impact analysis over table-dependency
graphs, affected-entity blast radius over shared-key graphs,
candidate expansion over similarity graphs).

Scale shape: each round is one frontier⋈edges keyed join plus an
anti-join against the visited set — cost proportional to the EDGE
FRONTIER, never nodes²; ``localCheckpoint`` cuts lineage per round
(without it the plan doubles each hop); the loop stops early on an
empty frontier (a count on the already-checkpointed frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_min_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    stats: dict | None = None,
) -> DataFrame:
    """Minimum hop count from any source node, by BFS frontier
    iteration: returns (``node_col``, ``hops``) for every node
    reachable in ≤ ``max_hops`` directed hops (sources themselves at
    hops 0; unreachable nodes absent). Edges are directed — pass both
    directions for an undirected graph.

    BFS visits each node at its FIRST (minimal) depth, so the
    anti-join against the visited set both deduplicates and
    guarantees minimality — no per-node min aggregate over all paths
    (the recursive-CTE oracle does exactly that global MIN; results
    match, the plans differ by design).

    Pass ``stats={}`` to record ``stats["frontier_sizes"]`` — the
    node count of each round's NEW frontier. Each round's join/anti
    inputs are the frontier frame (never the visited set), so these
    sizes ARE the per-round cost profile; the power-law graph test
    pins that contract. Costs one extra count action per round —
    leave ``stats`` None in production.
    """
    if max_hops < 0:
        raise ValueError(f"bfs_min_hops: max_hops must be >= 0, got {max_hops}")
    e = edges.select(
        F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")
    ).localCheckpoint()
    visited = (
        sources.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0).cast("bigint"))
        .localCheckpoint()
    )
    frontier = visited
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier.node == e.__src)
            .select(F.col("__dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(h).cast("bigint"))
            .localCheckpoint()
        )
        if not nxt.head(1):
            break
        if stats is not None:
            stats.setdefault("frontier_sizes", []).append(nxt.count())
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return visited.select(F.col("node").alias(node_col), "hops")
