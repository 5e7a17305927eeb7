"""Larger-scale plaid_topk timing: 10k docs x 4 tokens (40k vectors),
500 4-token queries, production kernels. Usage: python tools/plaid_scale_ab.py <repo_root>
"""
import sys, time

root = sys.argv[1]
sys.path.insert(0, root)

import bench  # noqa
from pyspark.sql import functions as F

spark = bench._spark(32)
n_docs, toks, dim, n_q = 10_000, 4, 64, 500
vecs = spark.range(n_docs * toks).select(
    (F.col("id") / toks).cast("long").alias("doc_id"),
    F.col("id").alias("vec_id"),
    F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.sin(F.col("id") * 0.7318 + j.cast("double") * 0.37 + 1.3),
    ).alias("embedding"),
).persist()
vecs.count()
queries = spark.range(n_q * toks).select(
    (F.col("id") / toks).cast("long").alias("query_id"),
    F.col("id").alias("vec_id"),
    F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.sin(F.col("id") * 1.2171 + j.cast("double") * 0.41 + 0.2),
    ).alias("embedding"),
).persist()
queries.count()

from lsh_forest_for_multi_vector_retrieval_spark.operators.plaid import (
    build_centroids_deterministic,
    plaid_topk,
)

cents = build_centroids_deterministic(vecs, k=32, iters=10, sample_limit=5000, id_col="vec_id")
res = plaid_topk(vecs, queries, cents, k=10, nprobe=16, t_cs=0.0, rerank=100,
                 assignment="pandas", scoring="pandas").localCheckpoint(eager=True)  # warm
import hashlib
rows = sorted((r.query_id, r.doc_id, r.rank) for r in res.collect())
digest = hashlib.md5(str(rows).encode()).hexdigest()[:12]
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    plaid_topk(vecs, queries, cents, k=10, nprobe=16, t_cs=0.0, rerank=100,
               assignment="pandas", scoring="pandas").localCheckpoint(eager=True)
    best = min(best, time.perf_counter() - t0)
print(f'{{"plaid_10kdocs_sec": {best:.2f}, "rows": {len(rows)}, "digest": "{digest}"}}')
spark.stop()
