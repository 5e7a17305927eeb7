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

# Below this many edges the component graph is collected and solved with a
# driver-side union-find — the same size-gated physical-strategy switch
# Spark itself applies when it turns a shuffle join into a broadcast join.
# 5M edges ≈ 80 MB of id pairs, far under driver memory; label propagation
# at that size spends its whole wall-clock on per-iteration job-scheduling
# latency (each round is a join+agg over kilobytes). Above the gate the
# iterative distributed loop runs as before — at 10^12-doc scale the
# verified-pair graph is billions of edges and never collects.
DRIVER_CC_MAX_EDGES = 5_000_000


def _driver_union_find(pairs) -> dict:
    """Union-find with path compression; union-by-min keeps every root the
    minimum id of its component, matching hash-min label propagation
    bit-for-bit. Returns a label for EVERY vertex seen, roots included."""
    parent: dict = {}
    nodes: set = set()

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if rb < ra:
            ra, rb = rb, ra
        parent[rb] = ra
    return {x: find(x) for x in nodes}


def connected_components(
    edges: DataFrame,
    all_vertices: DataFrame | None = None,
    max_iterations: int = 50,
    vertex_col: str = "doc_id",
    driver_max_edges: int = DRIVER_CC_MAX_EDGES,
) -> DataFrame:
    """``(doc_id, cluster_id)`` where cluster_id = min doc_id in component.

    ``edges``: (doc_a, doc_b). ``all_vertices`` optionally supplies isolated
    docs (they become singleton clusters labeled by themselves).

    Physical strategy is size-gated (``driver_max_edges``; 0 forces the
    distributed path): small graphs collect to a driver union-find, large
    graphs run the iterative hash-min DataFrame loop. Both produce the
    identical labeling (cluster_id = component min; tested)."""
    spark = edges.sparkSession
    # limit(n+1).count() stops scanning once the gate is decided — it never
    # pays for a full count of a web-scale edge set
    if (
        driver_max_edges > 0
        and edges.select("doc_a").limit(driver_max_edges + 1).count()
        <= driver_max_edges
    ):
        pdf = edges.select("doc_a", "doc_b").distinct().toPandas()
        labels_map = _driver_union_find(
            zip(pdf["doc_a"].tolist(), pdf["doc_b"].tolist())
        )
        vtype = edges.schema["doc_a"].dataType
        rows = [(v, c) for v, c in labels_map.items()]
        labels = spark.createDataFrame(
            rows,
            schema=f"{vertex_col} {vtype.simpleString()}, cluster_id {vtype.simpleString()}",
        )
        if all_vertices is not None:
            singles = (
                all_vertices.select(vertex_col)
                .join(labels.select(vertex_col), vertex_col, "left_anti")
                .withColumn("cluster_id", F.col(vertex_col))
            )
            labels = labels.unionByName(singles)
        return labels

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
