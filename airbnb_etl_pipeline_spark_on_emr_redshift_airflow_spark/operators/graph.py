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
    broadcast_max_rows: int | None = 4_000_000,
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

    Join strategy is picked DELIBERATELY per round (guide §3.1) from
    the frontier/visited row counts the loop already knows: a
    checkpointed frame has no Catalyst stats, so left alone every
    round sort-merge/shuffle-joins the FULL edge set against a
    frontier that is usually tiny — the frontier (probe side) and the
    visited set (anti side) get an explicit broadcast hint while they
    hold ≤ ``broadcast_max_rows`` rows (slim single-column frames;
    the default ~4M rows ≈ tens of MB broadcast). Past the threshold
    the hint is dropped and the keyed shuffle plan takes over — the
    growth path for frontiers that outgrow executor memory. One
    action per round: the convergence check is a ``count()`` on the
    lazily-checkpointed new frontier (materialize + count in the same
    job, where an eager checkpoint plus ``head(1)`` was two).

    Pass ``stats={}`` to record ``stats["frontier_sizes"]`` — the
    node count of each round's NEW frontier. Each round's join/anti
    inputs are the frontier frame (never the visited set), so these
    sizes ARE the per-round cost profile; the power-law graph test
    pins that contract. The counts now drive convergence, so stats
    cost nothing extra.
    """
    if max_hops < 0:
        raise ValueError(f"bfs_min_hops: max_hops must be >= 0, got {max_hops}")

    def _maybe_bcast(df: DataFrame, n_rows: int) -> DataFrame:
        if broadcast_max_rows is not None and n_rows <= broadcast_max_rows:
            return F.broadcast(df)
        return df

    e = edges.select(
        F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")
    ).localCheckpoint()
    visited = (
        sources.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0).cast("bigint"))
        .localCheckpoint(eager=False)
    )
    # The up-front count's only consumer is the broadcast gate — skip
    # the blocking action entirely when the gate is disabled (ADVICE
    # r13; round 1's convergence count materializes the lazy frame
    # either way).
    n_visited = visited.count() if broadcast_max_rows is not None else 0
    frontier, n_frontier = visited, n_visited
    for h in range(1, max_hops + 1):
        nxt = (
            _maybe_bcast(frontier, n_frontier)
            .join(e, frontier.node == e.__src)
            .select(F.col("__dst").alias("node"))
            .distinct()
            .join(
                _maybe_bcast(visited.select("node"), n_visited),
                "node",
                "left_anti",
            )
            .withColumn("hops", F.lit(h).cast("bigint"))
            .localCheckpoint(eager=False)
        )
        cnt = nxt.count()
        if cnt == 0:
            break
        if stats is not None:
            stats.setdefault("frontier_sizes", []).append(cnt)
        # no checkpoint on the union: every leaf (seed set + each
        # round's frontier) is already materialized, so the union plan
        # stays ≤ max_hops shallow unions deep with zero recompute —
        # re-materializing the GROWING visited set each round was one
        # full O(visited) write per hop for nothing (round-10 cut;
        # the per-round checkpoint that matters is nxt's, which caps
        # the join lineage)
        visited = visited.unionByName(nxt)
        n_visited += cnt
        frontier, n_frontier = nxt, cnt
    return visited.select(F.col("node").alias(node_col), "hops")


def pagerank_fixed_point(
    edges: DataFrame,
    iterations: int = 2,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**9,
    src_col: str = "src",
    dst_col: str = "dst",
    init_ranks: DataFrame | None = None,
    teleport: DataFrame | None = None,
    broadcast_max_rows: int | None = 4_000_000,
) -> DataFrame:
    """Deterministic PageRank over integer fixed-point ranks — the
    second iterative-graph operator beside :func:`bfs_min_hops`.

    PERSONALIZED form (round 8): pass ``teleport`` — a ``node``
    column of seed nodes — and the (1−d) restart mass teleports to
    the SEEDS instead of uniformly: each seed's per-round base term is
    ``(scale·n_nodes·(den−num)) div (den·n_seeds)`` and non-seeds get
    0, so total restart mass matches the uniform form and the whole
    computation stays exact bigint algebra (the probe's oracle
    replays it as unrolled SQL). Seeds are intersected with the
    graph's node set first — a seed absent from the graph would
    silently leak restart mass otherwise. Ranks then measure
    proximity-weighted importance RELATIVE to the seed set (the
    related-entity / topic-sensitive ranking primitive, Haveliwala
    2002).

    Float PageRank cannot be value-hash-checked: double sums depend
    on partition combine order. Here every quantity is a bigint —
    ranks start at ``scale`` per node, each edge carries
    ``rank div out_degree`` (true integer division), and the update
    is ``(scale·(den-num)) div den + (num·Σcontrib) div den`` — so
    the result is bit-identical across partitionings AND expressible
    in ANSI SQL as unrolled iterations (the catalog probe's oracle).
    For symmetric (both-direction) edge sets every node has
    out-degree ≥ 1, so no dangling-mass correction is needed and
    total rank is conserved up to the per-node floor truncation
    (< iterations × n_nodes ulps of ``1/scale``).

    Scale shape: per iteration ONE contribution join keyed on the
    edge source (rank and degree frames are node-keyed; AQE picks
    the strategy) and one ``dst`` aggregation — the classic
    two-exchange PageRank round. The edges/nodes/degree frames
    checkpoint once and the rank frame checkpoints per round (the
    :func:`bfs_min_hops` lineage-cut discipline): without the cuts
    every iteration replays the whole prior lineage and the plan
    grows with the iteration count. Checkpoint eagerness is split by
    consumption pattern (round 13, measured both ways): the
    edges/nodes/degree frames stay EAGER because every round re-reads
    them — a lazy persist let concurrent AQE stages race-recompute
    their partitions (the all-lazy variant regressed the pagerank
    suite ~1.6×) — while the per-round rank frame is LAZY (consumed
    exactly once, by the next round), folding the ``iterations``
    blocking driver actions into the caller's single action (guide
    §1.2: per-round fixed cost is what an iterative operator
    amortizes worst). No driver-side state beyond the loop
    counter."""
    e = edges.select(
        F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")
    ).localCheckpoint()
    nodes = (
        e.select(F.col("__src").alias("node"))
        .unionByName(e.select(F.col("__dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    deg = e.groupBy("__src").agg(
        F.count(F.lit(1)).cast("bigint").alias("__out_deg")
    ).localCheckpoint()
    base = (scale * (damping_den - damping_num)) // damping_den
    # Deliberate join strategy per round (guide §3.1, the
    # bfs_min_hops / connected_components policy): checkpointed
    # frames carry no Catalyst stats, so AQE must plan and
    # materialize shuffle stages for both inputs of every per-round
    # join before it can downgrade to broadcast. The rank/degree/node
    # frames are all node-count-sized and that count is
    # loop-invariant, so one up-front count licenses explicit
    # broadcast hints while they hold ≤ broadcast_max_rows slim rows;
    # past the threshold the hints drop and the keyed-shuffle plan
    # remains the growth path.
    #
    # Driver-memory expectation for the default gate (ADVICE r13): the
    # hinted frames are slim two-column bigint rows, ~16-25 bytes
    # framed, so the 4M-row default licenses a broadcast relation of
    # ~100-150 MB rebuilt on the driver each round near the threshold
    # — well inside the default 8 GB driver but a real per-round cost;
    # callers on thin drivers should lower ``broadcast_max_rows`` (the
    # operators are parameterized precisely for this). The explicit
    # hint deliberately bypasses autoBroadcastJoinThreshold sizing
    # because checkpointed frames carry no stats at all.
    #
    # The count itself is needed by the broadcast gate and by the
    # personalized form's seed_base — skip the blocking action when
    # neither consumer exists (ADVICE r13).
    n_nodes = (
        nodes.count()
        if broadcast_max_rows is not None or teleport is not None
        else 0
    )

    def _maybe_bcast(df: DataFrame) -> DataFrame:
        if broadcast_max_rows is not None and n_nodes <= broadcast_max_rows:
            return F.broadcast(df)
        return df

    if teleport is not None:
        seeds = (
            teleport.select("node")
            .distinct()
            .join(nodes, "node", "left_semi")
            # lazy: the count() two lines down materializes it
            .localCheckpoint(eager=False)
        )
        n_seeds = seeds.count()
        if n_seeds == 0:
            raise ValueError(
                "pagerank_fixed_point: teleport set shares no node "
                "with the graph — all restart mass would be lost"
            )
        seed_base = (scale * n_nodes * (damping_den - damping_num)) // (
            damping_den * n_seeds
        )
        nodes = (
            nodes.join(
                seeds.withColumn("__is_seed", F.lit(True)), "node", "left"
            )
            .select(
                "node",
                F.coalesce("__is_seed", F.lit(False)).alias("__seed"),
            )
            .localCheckpoint()
        )
        base_col = F.when(F.col("__seed"), F.lit(seed_base)).otherwise(
            F.lit(0)
        )
    else:
        base_col = F.lit(base)
    if init_ranks is None:
        r = nodes.select("node").withColumn(
            "rank_fp", F.lit(scale).cast("bigint")
        )
    else:
        # WARM START (round 7, VERDICT r6 stretch #9): resume
        # iteration from a persisted ``(node, rank_fp)`` table — the
        # previous period's checkpoint. Because every update is exact
        # integer algebra, resuming is a PURE continuation: on an
        # unchanged graph, ``cold(k1) → warm(k2)`` is bit-identical to
        # ``cold(k1 + k2)`` (pinned in tests/test_graph.py). On a
        # GROWN graph, nodes absent from the checkpoint start at the
        # uniform ``scale`` init and existing nodes keep their learned
        # mass, so a few warm rounds re-converge the neighborhood the
        # delta touched instead of re-ranking the whole graph from
        # scratch — the incremental-maintenance path
        # examples/incremental.py runs per period. One keyed left
        # join; the loop below is unchanged.
        r = (
            nodes.join(
                init_ranks.select("node", F.col("rank_fp").alias("__init")),
                "node",
                "left",
            )
            .select(
                "node",
                F.coalesce(F.col("__init"), F.lit(scale))
                .cast("bigint")
                .alias("rank_fp"),
            )
            .localCheckpoint(eager=False)
        )
    for _ in range(iterations):
        contrib = (
            e.join(_maybe_bcast(r), e["__src"] == r["node"])
            .join(_maybe_bcast(deg), "__src")
            .select(
                "__dst",
                F.expr("rank_fp div __out_deg").alias("__c"),
            )
        )
        agg = contrib.groupBy("__dst").agg(
            F.sum("__c").cast("bigint").alias("__s")
        )
        r = (
            nodes.join(_maybe_bcast(agg), nodes["node"] == agg["__dst"], "left")
            .select(
                "node",
                (
                    base_col
                    + F.expr(
                        f"({damping_num} * coalesce(__s, 0L))"
                        f" div {damping_den}"
                    )
                )
                .cast("bigint")
                .alias("rank_fp"),
            )
            .localCheckpoint(eager=False)
        )
    return r.select("node", "rank_fp")


def triangle_counts(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node EXACT triangle counts over an undirected simple graph
    (input edges may carry duplicates, self-loops, or both directions
    — canonicalized first). Returns one row per node that appears in
    any edge: (``node``, ``degree``, ``n_triangles``, ``ccf_fp``) —
    ``ccf_fp`` is the local clustering coefficient
    ``2·T / (d·(d−1))`` in fixed-point millionths (exact integer
    ``div``, cross-engine deterministic; 0 for degree < 2).

    Algorithm: degree-ordered orientation (Schank & Wagner 2005; the
    MapReduce form in Suri & Vassilvitskii 2011): orient every edge
    from the endpoint that is smaller under the total order
    ``π = (degree, node)`` to the larger. Every triangle {x,y,z} with
    π(x) < π(y) < π(z) then materializes EXACTLY once, as the wedge
    (x→y, x→z) closed by the oriented edge (y→z) — no per-triangle
    dedup, no double counting.

    Why this survives 100 TB where naive wedge counting dies: without
    orientation a hub of degree d spawns d² wedges (a power-law
    graph's top hub alone can exceed the rest of the graph); with
    degree ordering every node's OUT-degree is bounded by O(√m), so
    the wedge join is Σ out_deg² ≤ m^{3/2} worst case and ~linear on
    bounded-degree graphs. Cost shape: canonicalize (1 exchange),
    degree count (1), two degree-attach joins (dim-sized degree frame
    — AQE broadcasts it on real graphs), the u-keyed wedge self-join,
    and the (v,w)-keyed closing join. All keyed joins, no Python.
    Oracle: ``g_triangle_count`` replays an id-ordered enumeration in
    ANSI SQL — per-node counts are orientation-independent, so the
    two strategies must agree row for row."""
    # The canonical edge set feeds FIVE consumers (degree count, two
    # degree attaches, both wedge sides via `oriented`, the closing
    # join); without a lineage cut Spark replays the whole
    # canonicalize-distinct subtree per consumer (~100 exchanges at
    # catalog scale for what should be ~10) — same discipline as the
    # shared-tokenize checkpoint in d_minhash_dup_clusters.
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("__da"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("__db"))
    ed = e.join(da, "a").join(db, "b")
    fwd = (F.col("__da") < F.col("__db")) | (
        (F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(fwd, F.col("__db")).otherwise(F.col("__da")).alias("__dv"),
    ).localCheckpoint(eager=False)
    w1 = oriented.select(
        "u", F.col("v").alias("v1"), F.col("__dv").alias("__d1")
    )
    w2 = oriented.select(
        "u", F.col("v").alias("v2"), F.col("__dv").alias("__d2")
    )
    wedges = w1.join(w2, "u").filter(
        (F.col("__d1") < F.col("__d2"))
        | ((F.col("__d1") == F.col("__d2")) & (F.col("v1") < F.col("v2")))
    )
    closing = oriented.select(
        F.col("u").alias("v1"), F.col("v").alias("v2")
    )
    tri = wedges.join(closing, ["v1", "v2"]).select("u", "v1", "v2")
    roles = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("v1").alias("node")))
        .unionAll(tri.select(F.col("v2").alias("node")))
    )
    cnt = roles.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("__t")
    )
    return deg.join(cnt, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("__t"), F.lit(0)).cast("bigint").alias(
            "n_triangles"
        ),
        F.when(
            F.col("degree") >= 2,
            F.expr(
                "(2 * coalesce(__t, 0L) * 1000000)"
                " div (degree * (degree - 1))"
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("ccf_fp"),
    )


def k_core(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    broadcast_max_rows: int | None = 4_000_000,
) -> DataFrame:
    """The k-CORE of an undirected simple graph (input canonicalized
    like :func:`triangle_counts`): the unique maximal subgraph in
    which every node has degree ≥ k, computed by iterative peeling —
    repeatedly drop nodes of degree < k until none remain (Seidman
    1983; the standard dense-cluster / spam-farm / community-seed
    extractor). Returns (``node``, ``core_degree``) for surviving
    nodes, where ``core_degree`` is the node's degree WITHIN the core
    — every returned row has ``core_degree >= k`` by construction,
    the self-certifying property a reviewer can check from the output
    alone; maximality (no dropped node could rejoin) is pinned
    against brute force in ``tests/test_graph.py``.

    Scale shape: each peel round is one degree count over the
    surviving edge set + one semi-join dropping edges that lost an
    endpoint — cost proportional to the SURVIVING edges, shrinking
    monotonically; ``localCheckpoint`` per round cuts lineage (the
    BFS/PageRank discipline — without it round r replays rounds
    1..r-1) and the loop exits when a round removes nothing. Peel
    rounds are O(peeling depth), bounded by the degeneracy ordering
    depth, typically ≪ node count on real graphs."""
    if k < 1:
        raise ValueError(f"k_core: k must be >= 1, got {k}")
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    while True:
        deg = (
            e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
            .localCheckpoint(eager=False)
        )
        # ONE driver action per round (round 13): the weak/survivor
        # existence probes were two separate head(1) jobs; one
        # two-valued aggregate over the (already lazily-checkpointed)
        # degree frame materializes it AND returns both counts — and
        # the survivor count licenses a deliberate broadcast below.
        n_weak, n_total = deg.agg(
            F.coalesce(
                F.sum(F.when(F.col("degree") < k, 1).otherwise(0)), F.lit(0)
            ),
            F.count(F.lit(1)),
        ).first()
        if n_weak == 0:
            return deg.select(
                "node", F.col("degree").alias("core_degree")
            )
        survivors = deg.filter(F.col("degree") >= k).select("node")
        if n_total - n_weak == 0:
            return survivors.withColumn(
                "core_degree", F.lit(0).cast("bigint")
            )
        # Checkpointed frames carry no stats, so AQE would plan (and
        # materialize) shuffle stages for BOTH sides of each semi-join
        # — re-shuffling the surviving edge set twice per peel round.
        # The survivor count just came back with the convergence probe:
        # broadcast-hint the node-sized build side while it stays under
        # broadcast_max_rows (the bfs/pagerank/cc policy); past the
        # threshold the keyed-shuffle plan remains the growth path.
        _hint = (
            F.broadcast
            if broadcast_max_rows is not None
            and n_total - n_weak <= broadcast_max_rows
            else (lambda df: df)
        )
        e = (
            e.join(
                _hint(survivors.select(F.col("node").alias("a"))),
                "a",
                "left_semi",
            )
            .join(
                _hint(survivors.select(F.col("node").alias("b"))),
                "b",
                "left_semi",
            )
            .localCheckpoint(eager=False)
        )


def triangle_counts_incremental(
    old_counts: DataFrame,
    old_edges: DataFrame,
    new_edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Maintain :func:`triangle_counts` under EDGE ADDITIONS in
    O(batch · avg-degree), never O(graph): given the previous artifact
    ``old_counts`` (= ``triangle_counts(old_edges)``), the previous
    edge set, and a batch of new edges, return the artifact for the
    grown graph — identical to a full recompute over
    ``old_edges ∪ new_edges`` (pinned in ``tests/test_graph.py``).

    Why it's O(batch): a triangle is NEW iff it contains ≥ 1 delta
    edge, so enumeration only ever fans out from the delta — for each
    delta edge (a, b), the common neighbors of a and b in the FULL
    graph. Triangles with 2-3 delta edges would be enumerated once
    per delta edge, so each is credited to its MINIMAL delta edge
    under the canonical (a, b) lexicographic order (the same
    exactly-once device as the degree-ordered orientation in the full
    algorithm: a total order picks one representative). Per-node
    deltas (each new triangle adds 1 to each of its 3 corners; each
    delta edge adds 1 to both endpoint degrees) then merge into the
    old artifact by one keyed outer join touching only changed nodes
    plus the carried rows; ccf recomputes from the merged (degree,
    count) in the same exact fixed-point arithmetic.

    Scale shape: the delta canonicalizes + anti-joins against the old
    edge set (keyed, delta-sized output); the two adjacency probes
    are keyed joins whose LEFT side is delta-sized (AQE broadcasts
    it), so the full edge table is scanned but never re-shuffled into
    wedge space; the merge join is artifact-keyed. Deletions are out
    of scope (the decremental form needs the same enumeration with a
    tombstone anti-join; additions are the ingest-path case the
    incremental example exercises)."""
    return triangle_counts_delta(
        old_counts, old_edges, added=new_edges,
        src_col=src_col, dst_col=dst_col,
    )


def triangle_counts_delta(
    old_counts: DataFrame,
    old_edges: DataFrame,
    added: DataFrame | None = None,
    removed: DataFrame | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Maintain :func:`triangle_counts` under edge ADDITIONS and
    REMOVALS in O(delta · avg-degree) — the full-DML completion of
    :func:`triangle_counts_incremental` (which this generalizes; the
    add-only path delegates here). The new graph is
    ``(old ∖ removed) ∪ added``; identical to a full recompute over it
    (pinned in tests).

    Exactly-once on both sides of the same total order: a DYING
    triangle (lives in the old graph, contains ≥ 1 removed edge)
    enumerates from its minimal removed edge against the OLD
    adjacency and subtracts; a BORN triangle (lives in the new graph,
    contains ≥ 1 added edge) enumerates from its minimal added edge
    against the NEW adjacency and adds. The two sets are disjoint by
    construction — a dying triangle is absent from the new graph (its
    removed edge is gone), a born one absent from the old — so the
    deltas compose additively per node. Degree deltas are the
    incident counts; nodes whose merged degree AND triangle count
    reach zero with no remaining edge drop out of the artifact
    (matching the full recompute, which only emits nodes appearing in
    some edge).

    Scale shape: both enumerations put the DELTA on the build side of
    keyed joins against an adjacency the data never re-shuffles into
    wedge space; the merge is one artifact-keyed outer join. The
    steady-state ingest cadence calls this with the day's
    added/removed edge batches — never a graph-sized recompute."""

    def canon(e: DataFrame | None) -> DataFrame | None:
        if e is None:
            return None
        return (
            e.select(
                F.least(F.col(src_col), F.col(dst_col)).alias("a"),
                F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    old_e = canon(old_edges).localCheckpoint(eager=False)
    rem = canon(removed)
    if rem is not None:
        # only edges actually present can die
        rem = rem.join(old_e, ["a", "b"], "left_semi").localCheckpoint(
            eager=False
        )
    kept = old_e if rem is None else old_e.join(
        rem, ["a", "b"], "left_anti"
    )
    add = canon(added)
    if add is not None:
        # re-adding a kept edge is a no-op; re-adding a just-removed
        # edge is a genuine add against the kept graph
        add = add.join(kept, ["a", "b"], "left_anti").localCheckpoint(
            eager=False
        )
    new_e = kept if add is None else kept.unionByName(add)
    new_e = new_e.localCheckpoint(eager=False)

    def edge_lt(ka1, kb1, ka2, kb2):
        return (F.col(ka1) < F.col(ka2)) | (
            (F.col(ka1) == F.col(ka2)) & (F.col(kb1) < F.col(kb2))
        )

    def _tri_touching(delta: DataFrame, graph: DataFrame) -> DataFrame:
        """Triangles of ``graph`` containing ≥ 1 ``delta`` edge, each
        exactly once (credited to its minimal delta edge)."""
        tagged = graph.join(
            delta, ["a", "b"], "left_semi"
        ).withColumn("__d", F.lit(True)).unionByName(
            graph.join(delta, ["a", "b"], "left_anti").withColumn(
                "__d", F.lit(False)
            )
        )
        adj = tagged.select(
            F.col("a").alias("u"), F.col("b").alias("w"),
            F.col("a").alias("ka"), F.col("b").alias("kb"), "__d",
        ).unionByName(
            tagged.select(
                F.col("b").alias("u"), F.col("a").alias("w"),
                F.col("a").alias("ka"), F.col("b").alias("kb"), "__d",
            )
        )
        adj_a = adj.select(
            F.col("u").alias("a"), "w",
            F.col("ka").alias("ka1"), F.col("kb").alias("kb1"),
            F.col("__d").alias("d1"),
        )
        adj_b = adj.select(
            F.col("u").alias("b"), "w",
            F.col("ka").alias("ka2"), F.col("kb").alias("kb2"),
            F.col("__d").alias("d2"),
        )
        return (
            delta.join(adj_a, "a")
            .filter(F.col("w") != F.col("b"))
            .join(adj_b, ["b", "w"])
            .filter(F.col("w") != F.col("a"))
            .filter(
                ~(F.col("d1") & edge_lt("ka1", "kb1", "a", "b"))
                & ~(F.col("d2") & edge_lt("ka2", "kb2", "a", "b"))
            )
            .select("a", "b", "w")
        )

    def _node_counts(tri: DataFrame, col: str) -> DataFrame:
        return (
            tri.select(F.col("a").alias("node"))
            .unionAll(tri.select(F.col("b").alias("node")))
            .unionAll(tri.select(F.col("w").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("bigint").alias(col))
        )

    def _deg_counts(e: DataFrame, col: str) -> DataFrame:
        return (
            e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("bigint").alias(col))
        )

    merged = old_counts.select("node", "degree", "n_triangles")
    zero = F.lit(0).cast("bigint")
    # the DEGREE delta is the full-outer leg: a node may enter the
    # graph through an added edge without being in any born triangle
    # (and every node of a dying/born triangle necessarily carries an
    # edge, so the triangle delta can safely LEFT-join onto it)
    if rem is not None:
        dies = _tri_touching(rem, old_e)
        merged = (
            merged.join(_deg_counts(rem, "__dd"), "node", "full_outer")
            .join(_node_counts(dies, "__td"), "node", "left")
            .select(
                "node",
                (F.coalesce("degree", zero) - F.coalesce("__dd", zero))
                .cast("bigint").alias("degree"),
                (
                    F.coalesce("n_triangles", zero)
                    - F.coalesce("__td", zero)
                ).cast("bigint").alias("n_triangles"),
            )
        )
    if add is not None:
        born = _tri_touching(add, new_e)
        merged = (
            merged.join(_deg_counts(add, "__db"), "node", "full_outer")
            .join(_node_counts(born, "__tb"), "node", "left")
            .select(
                "node",
                (F.coalesce("degree", zero) + F.coalesce("__db", zero))
                .cast("bigint").alias("degree"),
                (
                    F.coalesce("n_triangles", zero)
                    + F.coalesce("__tb", zero)
                ).cast("bigint").alias("n_triangles"),
            )
        )
    # nodes with no remaining incident edge leave the artifact (the
    # full recompute only emits nodes present in some edge)
    merged = merged.filter(F.col("degree") > 0)
    return merged.select(
        "node",
        "degree",
        "n_triangles",
        F.when(
            F.col("degree") >= 2,
            F.expr(
                "(2 * n_triangles * 1000000)"
                " div (degree * (degree - 1))"
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("ccf_fp"),
    )
