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


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, label) for every node in ``edges``; label = min node id
    reachable — i.e. the component's canonical id. Deterministic for
    any edge order."""
    # materialize the edge list ONCE before mirroring: the union below
    # references ``edges`` twice, and an unmaterialized edge plan (e.g.
    # the whole MinHash-LSH pipeline) would execute per reference
    edges = edges.select(
        F.col(src).alias("e_src"), F.col(dst).alias("e_dst")
    ).localCheckpoint(eager=True)
    bidir = (
        edges.union(edges.select(F.col("e_dst"), F.col("e_src")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        bidir.select(F.col("e_src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
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
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(F.col("_chg")).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    return labels


def cluster_sizes(labels: DataFrame) -> DataFrame:
    """(cluster_id, n_docs) per component."""
    return labels.groupBy(F.col("label").alias("cluster_id")).agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
