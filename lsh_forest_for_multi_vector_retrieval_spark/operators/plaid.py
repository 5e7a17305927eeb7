"""PLAID-style centroid-pruned multi-vector retrieval (reference P2-P4:
/root/reference/notebooks/plaid.ipynb cells 5-8).

The reference pipeline: (cell 5) MiniBatchKMeans centroids over all token
vectors, normalized; (cell 6) inverted index centroid_id -> doc_ids;
(cell 7) query-vs-centroid score matrix S_cq, keep top-``nprobe``
centroids per query token, prune centroids whose best query-token score
is < ``t_cs``, union candidate docs from the index; (cells 7-8) centroid
interaction score ``S_cq[doc_cids].max(axis=0).sum()`` and rank.

Spark mapping (SURVEY §2.9): KMeans via ``pyspark.ml`` (P2); the inverted
index is an exploded ``(centroid_id, doc_id)`` DataFrame (P3); pruning is
a window top-nprobe + a ``max >= t_cs`` filter; the max-then-sum
interaction score is the V2 chamfer shape — two hash aggregates. The
centroid table is tiny and broadcast everywhere; the only wide ops are
keyed joins against the inverted index.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lsh_forest_for_multi_vector_retrieval_spark.functions.vectors import dot_col


def build_centroids(
    vectors: DataFrame,
    k: int = 16,
    seed: int = 42,
    max_iter: int = 20,
    vec_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """P2: KMeans centroids over all (token) vectors, unit-normalized like
    the reference (plaid.ipynb cell 5 normalizes centroids for cosine).
    Returns a tiny (centroid_id INT, centroid ARRAY<DOUBLE>) DataFrame."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = vectors.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feats)
    centers = []
    for i, c in enumerate(model.clusterCenters()):
        c = np.asarray(c, dtype=np.float64)
        if normalize:
            n = np.linalg.norm(c)
            if n > 0:
                c = c / n
        centers.append((i, c.tolist()))
    return vectors.sparkSession.createDataFrame(
        centers, "centroid_id int, centroid array<double>"
    )


def centroid_index(
    doc_vectors: DataFrame,
    centroids: DataFrame,
    doc_col: str = "doc_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """P3: the inverted index. Every doc token is assigned to its nearest
    (max-dot) centroid; output is the distinct exploded ``(centroid_id,
    doc_id)`` form — kept exploded rather than collect_set'd, per SURVEY
    §1.3, so downstream joins stay relational."""
    scored = doc_vectors.select(F.col(doc_col).alias("doc_id"), vec_col).crossJoin(
        F.broadcast(centroids)
    )
    s = dot_col(F.col(vec_col), F.col("centroid"))
    w = Window.partitionBy("doc_id", vec_col).orderBy(
        F.desc("s"), F.asc("centroid_id")
    )
    return (
        scored.select("doc_id", vec_col, "centroid_id", s.alias("s"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("centroid_id", "doc_id")
        .distinct()
    )


def plaid_topk(
    doc_vectors: DataFrame,
    query_vectors: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    t_cs: float = 0.0,
    doc_col: str = "doc_id",
    query_col: str = "query_id",
    vec_col: str = "embedding",
    qvec_id_col: str = "vec_id",
    rerank: int | None = None,
) -> DataFrame:
    """P3+P4: centroid-pruned candidate generation + centroid interaction
    score. Returns (query_id, doc_id, score, rank), rank<=k per query.

    ``query_vectors`` needs a stable per-token id column (``qvec_id_col``)
    — NOT derived with monotonically_increasing_id, which would vary with
    partitioning and break determinism.

    Score semantics = plaid.ipynb cell 7: for each candidate doc, for each
    query token, the best score among the doc's centroid ids
    (``S_cq[doc_cids].max(axis=0)``), summed over query tokens. Docs enter
    the candidate set if any of their centroids survives pruning (top-
    ``nprobe`` per query token AND max-over-query-tokens >= ``t_cs``).

    ``rerank``: full-PLAID final stage — take the top-``rerank`` docs per
    query by centroid score, recompute the EXACT max-sum interaction over
    the real vectors (the V2 chamfer shape), and rank those. Centroid
    quantization then only decides the pool, not the final order — the
    same cheap-candidates -> exact-verify split as the dedup flagship."""
    index = centroid_index(doc_vectors, centroids, doc_col, vec_col)

    # S_cq: query tokens x centroids (centroids broadcast — tiny side)
    qtok = query_vectors.select(
        F.col(query_col).alias("query_id"),
        F.col(qvec_id_col).alias("q_idx"),
        F.col(vec_col).alias("q_vec"),
    )
    s_cq = qtok.crossJoin(F.broadcast(centroids)).select(
        "query_id",
        "q_idx",
        "centroid_id",
        dot_col(F.col("q_vec"), F.col("centroid")).alias("s"),
    )

    # prune: keep top-nprobe centroids per query token...
    w = Window.partitionBy("query_id", "q_idx").orderBy(
        F.desc("s"), F.asc("centroid_id")
    )
    probed = s_cq.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= nprobe
    )
    # ...then drop centroids whose best score across the query is < t_cs
    # (cell 7's centroid_pruned_ids)
    kept = (
        probed.groupBy("query_id", "centroid_id")
        .agg(F.max("s").alias("best"))
        .where(F.col("best") >= t_cs)
        .select("query_id", "centroid_id")
    )

    # candidate docs per query via the inverted index
    cand = kept.join(index, "centroid_id").select("query_id", "doc_id").distinct()

    # interaction score: max over the doc's centroids, sum over query tokens
    doc_cents = index.select("doc_id", "centroid_id")
    per_tok = (
        cand.join(doc_cents, "doc_id")
        .join(s_cq, ["query_id", "centroid_id"])
        .groupBy("query_id", "doc_id", "q_idx")
        .agg(F.max("s").alias("tok_best"))
    )
    scores = per_tok.groupBy("query_id", "doc_id").agg(
        F.sum("tok_best").alias("score")
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = scores.withColumn("rank", F.row_number().over(wr))
    if rerank is None:
        return ranked.where(F.col("rank") <= k)

    pool = ranked.where(F.col("rank") <= max(k, rerank)).select(
        "query_id", "doc_id"
    )
    dtok = doc_vectors.select(
        F.col(doc_col).alias("doc_id"), F.col(vec_col).alias("d_vec")
    )
    exact_tok = (
        pool.join(qtok, "query_id")
        .join(dtok, "doc_id")
        .groupBy("query_id", "doc_id", "q_idx")
        .agg(F.max(dot_col(F.col("q_vec"), F.col("d_vec"))).alias("tok_best"))
    )
    exact = exact_tok.groupBy("query_id", "doc_id").agg(
        F.sum("tok_best").alias("score")
    )
    return exact.withColumn("rank", F.row_number().over(wr)).where(
        F.col("rank") <= k
    )
