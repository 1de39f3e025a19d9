"""Connected components over a pair graph — the clustering step of a
near-duplicate dedup pipeline (LSH/verify emits PAIRS; keeping one canonical
document per duplicate GROUP needs the transitive closure of those pairs).

Spark-first form: iterative min-label propagation as pure DataFrame ops.
Every node starts labeled with itself; each round every node takes the min
of its own label and its neighbors' labels; fixpoint = component id is the
min node id of the component. Rounds needed = graph diameter, and near-dup
graphs are unions of small dense cliques (docs duplicating each other),
so 2-4 rounds close real corpora.

Scale notes:
- each round is one join edges->labels + one groupBy-min + one equality
  anti-check; all on (long, long) frames — narrow shuffles on the id key.
- convergence is checked with a count() action per round (iterative
  algorithms need a driver decision point; the frames counted are
  label-sized, not edge-sized).
- at 10^12-node scale you would switch to alternating large/small-star
  contraction (Kiveris et al., "Connected Components in MapReduce and
  Beyond") which converges in O(log n) rounds with the same per-round
  primitives; min-label propagation is the right form for duplicate
  clusters whose diameter is tiny, and the round primitives are identical.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 20) -> DataFrame:
    """Return (id, component) for every node appearing in `pairs`, where
    component = min node id reachable through the pair graph.

    Deterministic: depends only on the edge SET, not on partitioning or
    input order. Raises if the graph has not converged after max_iter
    rounds (diameter > max_iter) instead of returning a wrong clustering.
    """
    edges = (pairs.select(F.col(src).cast("long").alias("a"),
                          F.col(dst).cast("long").alias("b"))
             .union(pairs.select(F.col(dst).cast("long").alias("a"),
                                 F.col(src).cast("long").alias("b")))
             .distinct())
    # materialize the edge set ONCE: every round's actions re-execute the
    # edges lineage otherwise — for LSH pair graphs that lineage is the
    # whole signature + banding computation, recomputed per round
    edges = edges.localCheckpoint(eager=True)
    labels = (edges.select(F.col("a").alias("id")).distinct()
              .withColumn("label", F.col("id")))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iter):
        # neighbor-min pass: for each node, the min label among neighbors.
        # ONE joined frame per round carries both the old and the new
        # label; the convergence count then runs over the checkpointed
        # result instead of re-joining new labels against old (which cost
        # an extra shuffle per round).
        neigh = (edges.join(labels.withColumnRenamed("id", "b"), on="b")
                 .groupBy(F.col("a").alias("id"))
                 .agg(F.min("label").alias("nlabel")))
        step = (labels.join(neigh, on="id", how="left")
                .select("id", "label",
                        F.least("label", F.coalesce("nlabel", "label"))
                        .alias("new_label")))
        # truncate lineage each round or the plan grows exponentially
        step = step.localCheckpoint(eager=True)
        changed = step.filter(F.col("new_label") != F.col("label")).count()
        labels = step.select("id", F.col("new_label").alias("label"))
        if changed == 0:
            return labels.select("id", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter too large — raise max_iter or switch to "
        "star-contraction)")


def dup_clusters(pairs: Optional[DataFrame] = None, src: str = "id_a",
                 dst: str = "id_b", max_iter: int = 20,
                 components: Optional[DataFrame] = None) -> DataFrame:
    """Per-node duplicate-cluster assignment + cluster size:
    (id, component, cluster_size). Pass `components` to reuse an
    already-computed (id, component) frame — the propagation result is a
    checkpointed DataFrame, so callers running several cluster-derived
    queries in one session should compute it once and share it."""
    if components is None:
        if pairs is None:
            raise ValueError("need pairs or components")
        components = connected_components(pairs, src=src, dst=dst,
                                          max_iter=max_iter)
    sizes = components.groupBy("component").agg(
        F.count("*").alias("cluster_size"))
    return components.join(sizes, on="component").select(
        "id", "component", "cluster_size")
