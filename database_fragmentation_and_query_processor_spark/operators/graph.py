"""Connected components over near-duplicate pair graphs.

The dedup pipeline's last step: pair lists (from MinHash-LSH / SimHash
/ embedding buckets) become CLUSTERS, so each group keeps one canonical
document. Cluster id = the minimum doc id in the component — the usual
deterministic convention.

Scale design (100 TB dedup graphs):

- Min-label propagation: every iteration is ONE shuffle (join edges on
  node) plus a tiny converged-count action; no driver-side graph state.
- Convergence takes O(graph diameter) iterations. Dup graphs are
  near-star-shaped (a canonical doc plus its copies, diameter 2-4), so
  the loop ends after a handful of rounds; ``max_iter`` bounds
  adversarial chains. For truly chain-heavy graphs the same join
  primitives compose into the large-star/small-star alternation
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14), which converges in O(log^2 n) — not needed for dup graphs.
- ``localCheckpoint`` after every round truncates lineage: the plan
  stays constant-size instead of growing by two joins per iteration
  (the classic iterative-DataFrame trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bidirectional(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Canonical (e_src, e_dst) bidirectional mirror of an undirected
    pair list, materialized before the double reference (an
    unmaterialized edge plan — e.g. a whole MinHash-LSH pipeline —
    would otherwise execute once per reference) and checkpointed so
    iterative callers start from truncated lineage. Shared by every
    graph operator; keep edge-materialization fixes HERE, not in the
    callers."""
    # e's checkpoint is LAZY (r14): the eager mirror checkpoint below
    # materializes it as a side effect of its own job — the per-block
    # cache lock serves the two union branches from one computation —
    # so edge materialization costs one blocking job, not two
    e = edges.select(
        F.col(src).alias("e_src"), F.col(dst).alias("e_dst")
    ).localCheckpoint(eager=False)
    return (
        e.union(e.select(F.col("e_dst"), F.col("e_src")))
        .distinct()
        .localCheckpoint(eager=True)
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, label) for every node in ``edges``; label = min node id
    reachable — i.e. the component's canonical id. Deterministic for
    any edge order."""
    bidir = bidirectional(edges, src, dst)
    # labels' checkpoint is LAZY (r14): round 1's convergence count
    # materializes it together with the round's own work — one blocking
    # job per round total, where the pre-r14 loop paid two (an eager
    # checkpoint job, then the count)
    labels = (
        bidir.select(F.col("e_src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=False)
    )
    changed = 0
    for _ in range(max_iter):
        nbr_min = (
            bidir.join(labels, bidir.e_dst == labels.node)
            .groupBy("e_src")
            .agg(F.min("label").alias("nbr_min"))
        )
        # the change flag rides along in the SAME join that updates the
        # labels — a separate old-vs-new join would add a third shuffle
        # to every round
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.e_src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
                ).alias("label"),
                (F.coalesce(F.col("nbr_min"), F.col("label")) < F.col("label")
                 ).alias("_chg"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.where(F.col("_chg")).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    if changed > 0:
        # exiting via max_iter with labels still moving means the
        # result is PARTIALLY propagated — callers compare against
        # exact-closure oracles (grid_density_clusters), so a
        # non-converged frame must never be returned silently
        # (ADVICE r11)
        raise RuntimeError(
            f"connected_components: not converged after {max_iter} "
            f"iterations ({changed} labels still changing) — raise "
            f"max_iter; label propagation halves the effective "
            f"diameter per round, so this indicates a chain-shaped "
            f"component far beyond the configured bound"
        )
    return labels


def cluster_sizes(labels: DataFrame) -> DataFrame:
    """(cluster_id, n_docs) per component."""
    return labels.groupBy(F.col("label").alias("cluster_id")).agg(
        F.count("*").cast("bigint").alias("n_docs")
    )


PAGERANK_SCALE = 1_000_000_000_000  # initial rank per node, integer units


def pagerank_integer(
    edges: DataFrame,
    iters: int = 3,
    src: str = "id_a",
    dst: str = "id_b",
    scale: int = PAGERANK_SCALE,
) -> DataFrame:
    """PageRank over an undirected pair graph in PURE INTEGER arithmetic
    — (node, rank) after ``iters`` power iterations, rank in units of
    1/scale. Float PageRank is not replayable across engines (the
    contribution sum is order-dependent); here every step is

        r' = scale·15/100  +  85 · Σ_{u~v} (r(u) div deg(u))  div 100

    with BIGINT floor division throughout, so the distributed sum is
    exact and the result is bit-identical on any engine and any
    partitioning (all values are positive, so Spark's truncating ``div``
    and DuckDB's flooring ``//`` agree).

    Scale design: each iteration is one join of the edge list against
    the rank table (shuffle on node id) plus a groupBy on the receiving
    node — the GraphX/Pregel plan expressed relationally. Lineage is
    truncated per round (localCheckpoint), so the plan stays
    constant-size at any iteration count. Degree is computed once."""
    bidir = bidirectional(edges, src, dst)
    deg = bidir.groupBy("e_src").agg(F.count("*").alias("deg"))
    # rank table: (node, rank); start uniform at `scale`
    # lazy: round 1's eager checkpoint materializes the seed table in
    # the same job (r14 — one blocking job less, same lineage cut)
    ranks = deg.select(
        F.col("e_src").alias("node"), F.lit(scale).cast("bigint").alias("rank")
    ).localCheckpoint(eager=False)
    base = int(scale) * 15 // 100
    for _ in range(iters):
        contrib = (
            bidir.join(deg, "e_src")
            .join(ranks, bidir.e_src == ranks.node)
            .select(
                F.col("e_dst").alias("to_node"),
                F.expr("rank div deg").alias("share"),
            )
        )
        ranks = (
            contrib.groupBy("to_node")
            .agg(F.sum("share").alias("insum"))
            .select(
                F.col("to_node").alias("node"),
                (F.lit(base) + F.expr("85 * insum div 100")).cast("bigint").alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Multi-source BFS: (node, hop) for every node within ``max_hops``
    of the seed set, hop = exact shortest-path edge distance.

    Frontier-style iteration — the Pregel BFS plan expressed
    relationally: each round joins the edge list against ONLY the nodes
    discovered in the previous round (not the whole settled set), then
    anti-joins the settled set to keep first-discovery hops. Work per
    round is proportional to the frontier's edge fan-out, so total work
    is O(edges within max_hops) regardless of graph size — the property
    that makes relational BFS viable on a 100 TB edge list. Lineage is
    truncated per round (localCheckpoint), and the loop exits early on
    an empty frontier."""
    bidir = bidirectional(edges, src, dst)
    # lazy inits/rounds (r14): the per-round frontier-emptiness count
    # and the settled-union checkpoint materialize these in their own
    # jobs — two blocking jobs per round, not three
    settled = (
        seeds.select(F.col(seeds.columns[0]).alias("node"))
        .distinct()
        .withColumn("hop", F.lit(0).cast("bigint"))
        .localCheckpoint(eager=False)
    )
    frontier = settled
    for h in range(1, max_hops + 1):
        nxt = (
            bidir.join(frontier, bidir.e_src == frontier.node)
            .select(F.col("e_dst").alias("node"))
            .distinct()
            .join(settled.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(h).cast("bigint"))
            .localCheckpoint(eager=False)
        )
        if nxt.limit(1).count() == 0:
            break
        settled = settled.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return settled


def triangle_counts(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Global triangle count of an undirected pair graph, plus the edge
    count and node count it was computed over (one summary row).

    Uses the oriented-wedge plan: with every edge stored once as
    (lo, hi), a triangle {a<b<c} is counted exactly once by joining
    wedges (a,b)+(b,c) against the closing edge (a,c). Two shuffle
    joins, no squaring of the edge list beyond the wedge fan-out —
    the standard scalable formulation (degree-ordered orientation
    bounds wedge counts by arboricity at 100 TB; id-ordered here since
    dup-graph degrees are tiny)."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .where(F.col("lo") < F.col("hi"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    ab = e.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    bc = e.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    ac = e.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    wedges = ab.join(bc, "b")
    tris = wedges.join(ac, ["a", "c"])
    nodes = e.select(F.col("lo").alias("n")).union(
        e.select(F.col("hi").alias("n"))
    ).distinct()
    return (
        tris.agg(F.count("*").cast("bigint").alias("n_triangles"))
        .crossJoin(e.agg(F.count("*").cast("bigint").alias("n_edges")))
        .crossJoin(nodes.agg(F.count("*").cast("bigint").alias("n_nodes")))
    )


def label_propagation(
    edges: DataFrame,
    rounds: int,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007) over an undirected pair graph: every node starts labeled
    with its own id; each round, every node adopts the label carried by
    the PLURALITY of its neighbors, ties broken toward the smallest
    label. Returns (node, label) after ``rounds`` synchronous updates.

    Determinism: the update is an integer argmax — max neighbor-label
    count, then min label — expressed as ``max(struct(count, -label))``
    so the distributed aggregate is a total order with no float and no
    arrival-order sensitivity; an unrolled SQL replay agrees exactly
    (unlike the asynchronous textbook variant, whose result depends on
    visit order). Scale design: each round is one edge⋈label join
    (shuffle on node id) plus one (node, label) count — the Pregel plan
    relationally, like pagerank_integer; lineage truncated per round."""
    bidir = bidirectional(edges, src, dst)
    # lazy: round 1's eager checkpoint materializes the seed labels in
    # the same job (r14 — one blocking job less, same lineage cut)
    labels = bidir.select(F.col("e_src").alias("node")).distinct().select(
        "node", F.col("node").cast("bigint").alias("label")
    ).localCheckpoint(eager=False)
    for _ in range(rounds):
        counted = (
            bidir.join(labels, bidir.e_src == labels.node)
            .groupBy(F.col("e_dst").alias("node2"), "label")
            .agg(F.count("*").cast("bigint").alias("c"))
        )
        labels = (
            counted.groupBy("node2")
            .agg(F.max(F.struct(F.col("c"), (-F.col("label")).alias("nl"))).alias("m"))
            .select(
                F.col("node2").alias("node"),
                (-F.col("m.nl")).cast("bigint").alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    return labels
