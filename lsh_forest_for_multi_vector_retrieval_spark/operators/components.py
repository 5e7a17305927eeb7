"""Connected components over the verified-pair graph — hash-min label
propagation as an iterative DataFrame loop.

Reference analog: the reference groups candidate vectors into their
documents and ranks documents (``ForestVote`` doc aggregation,
/root/reference/src/shared/forest_vote.py:290-338); the dedup engine's
final grouping is the transitive closure of verified near-dup pairs.

Algorithm: every doc starts labeled with its own id; each round every
vertex takes the min label over itself and its neighbors; stop when no
label changes. Rounds = O(max cluster diameter) — near-dup clusters are
dense (band collisions create hub edges), so this converges in a handful
of rounds even at web scale. Each round is one join + one agg;
``localCheckpoint`` truncates lineage so the plan doesn't grow
exponentially (SURVEY §4.2 iterative-algorithms note).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    all_vertices: DataFrame | None = None,
    max_iterations: int = 50,
    vertex_col: str = "doc_id",
) -> DataFrame:
    """``(doc_id, cluster_id)`` where cluster_id = min doc_id in component.

    ``edges``: (doc_a, doc_b). ``all_vertices`` optionally supplies isolated
    docs (they become singleton clusters labeled by themselves).
    """
    sym = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    sym = sym.distinct().localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("src").alias(vertex_col))
        .distinct()
        .withColumn("cluster_id", F.col(vertex_col))
        .localCheckpoint(eager=True)
    )

    changed = 0
    for _ in range(max_iterations):
        # candidate label for each dst = min label among its neighbors
        msgs = (
            sym.join(labels, sym.src == F.col(vertex_col))
            .groupBy(F.col("dst").alias(vertex_col))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        # carry the old label through so the convergence check needs no
        # extra join; lazy localCheckpoint materializes during the same
        # action as the changed-count -> exactly ONE job per iteration
        stepped = (
            labels.withColumnRenamed("cluster_id", "old_label")
            .join(msgs, vertex_col, "left")
            .select(
                F.col(vertex_col),
                F.least(
                    F.col("old_label"), F.coalesce("nbr_min", "old_label")
                ).alias("cluster_id"),
                F.col("old_label"),
            )
            .localCheckpoint(eager=False)
        )
        changed = stepped.where(F.col("cluster_id") != F.col("old_label")).count()
        labels = stepped.select(vertex_col, "cluster_id")
        if changed == 0:
            break
    if changed != 0:
        # a component with diameter > max_iterations would otherwise get
        # silently split into several labels — surface it loudly
        warnings.warn(
            f"connected_components did not converge in {max_iterations} "
            f"iterations ({changed} labels still changing); cluster labels "
            "may be split. Raise max_iterations.",
            RuntimeWarning,
            stacklevel=2,
        )

    if all_vertices is not None:
        singles = all_vertices.select(vertex_col).join(
            labels.select(vertex_col), vertex_col, "left_anti"
        ).withColumn("cluster_id", F.col(vertex_col))
        labels = labels.unionByName(singles)
    return labels


def cluster_stats(clusters: DataFrame) -> DataFrame:
    """Cluster-size histogram (forest diagnostics analog,
    forest_insights.py:91-120)."""
    sizes = clusters.groupBy("cluster_id").agg(F.count("*").alias("cluster_n"))
    return (
        sizes.groupBy("cluster_n")
        .agg(F.count("*").alias("num_clusters"))
        .orderBy("cluster_n")
    )
