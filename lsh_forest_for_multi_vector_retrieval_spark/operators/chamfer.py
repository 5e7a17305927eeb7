"""Multi-vector document scoring: chamfer similarity + retrieval ranking.

Reference analogs:
* ``chamfer(queries, vectors) = sum_q max_p <q,p>`` — the exact
  multi-vector similarity (/root/reference/src/shared/utils.py:27-35);
* ``chamfer_distance`` — one-sided mean-min L2
  (src/shared/test_forest_vote.py:110-124);
* ``collect_matches`` / ``sim_scores`` / ``rank_documents`` — the
  retrieval pipeline (src/shared/retrieval.py:4-45).

All are two hash aggregations: explode (doc_vec x query_vec) dots →
max per (doc, query-vec) → sum/avg per doc. The query side (a handful
of vectors) is broadcast; no shuffle touches the corpus until the
per-doc agg, which Catalyst partial-aggregates map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lsh_forest_for_multi_vector_retrieval_spark.functions.vectors import (
    dot_col,
    l2_sq_col,
)


def chamfer_scores(
    doc_vectors: DataFrame,
    query_vectors: DataFrame,
    doc_col: str = "doc_id",
    vec_col: str = "embedding",
    q_vec_col: str = "embedding",
) -> DataFrame:
    """(doc_id, chamfer) where chamfer = sum over query vectors of the max
    dot product against the doc's vectors (utils.py:27-35 semantics)."""
    q = query_vectors.select(
        F.monotonically_increasing_id().alias("q_idx"), F.col(q_vec_col).alias("q_vec")
    )
    d = doc_vectors.select(F.col(doc_col).alias("doc_id"), F.col(vec_col).alias("d_vec"))
    dots = (
        d.join(F.broadcast(q))
        .select("doc_id", "q_idx", dot_col(F.col("d_vec"), F.col("q_vec")).alias("dot"))
    )
    per_q = dots.groupBy("doc_id", "q_idx").agg(F.max("dot").alias("best"))
    return per_q.groupBy("doc_id").agg(F.sum("best").alias("chamfer"))


def chamfer_distance(
    a_vectors: DataFrame,
    b_vectors: DataFrame,
    a_col: str = "doc_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One-sided chamfer L2: for each a-doc, mean over its vectors of the
    min L2 distance to any b-vector (test_forest_vote.py:110-124)."""
    a = a_vectors.select(
        F.col(a_col).alias("doc_id"),
        F.monotonically_increasing_id().alias("a_idx"),
        F.col(vec_col).alias("a_vec"),
    )
    b = b_vectors.select(F.col(vec_col).alias("b_vec"))
    dists = a.join(F.broadcast(b)).select(
        "doc_id", "a_idx", F.sqrt(l2_sq_col(F.col("a_vec"), F.col("b_vec"))).alias("dist")
    )
    per_vec = dists.groupBy("doc_id", "a_idx").agg(F.min("dist").alias("min_d"))
    return per_vec.groupBy("doc_id").agg(F.avg("min_d").alias("chamfer_dist"))


def rank_documents(
    scores: DataFrame, score_col: str = "chamfer", k: int | None = None
) -> DataFrame:
    """argsort-desc of per-doc scores (retrieval.py:34-45) with
    deterministic tie-break on doc_id; optional top-k limit."""
    w = Window.orderBy(F.desc(score_col), F.asc("doc_id"))
    out = scores.withColumn("rank", F.row_number().over(w))
    if k is not None:
        out = out.where(F.col("rank") <= k)
    return out


def best_document(scores: DataFrame, score_col: str = "chamfer") -> DataFrame:
    return rank_documents(scores, score_col, k=1).drop("rank")
