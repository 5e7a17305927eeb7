"""Per-query isolated benchmarks for the optimization round (guide §1.4).

``bench.py`` is FROZEN for driver measurement; this sibling exists so
single queries can be timed in isolation (same session config, same
inputs, same call shapes as bench._suite_pass) without re-running the
whole suite. Results are cited in OPTIMIZATION_r06.md.

Usage:
    python bench_extra.py [query ...]        # default: all
    SPARK_GRAFT_BENCH_REPS=3 python bench_extra.py plaid_topk

Prints one JSON line: {"queries": {name: best_sec}, "reps": N, "probe": x}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import bench  # noqa: E402  (frozen harness — reused, never modified)

SF_DIR = bench.SF_DIR
CPUS = bench.CPUS
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))


def main() -> int:
    from pyspark.sql import functions as F

    spark = bench._spark(CPUS)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.count()

    import __spark_entry__ as em

    from lsh_forest_for_multi_vector_retrieval_spark.config import DedupConfig
    from lsh_forest_for_multi_vector_retrieval_spark.functions.bpe import (
        bpe_encode,
        fit_bpe,
    )
    from lsh_forest_for_multi_vector_retrieval_spark.operators.ann import (
        ivf_topk,
        lsh_topk,
    )
    from lsh_forest_for_multi_vector_retrieval_spark.operators.substring import (
        substring_dup_pairs,
    )

    def ann():
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        qs = emb.where(F.col("vec_id") < 20)
        return lsh_topk(
            emb, qs, k=10, dim=64, bits=64, n_chunks=16, ensure_k=True,
            round_digits=6, scoring="pandas",
        ).count()

    def ivf():
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        qs = emb.where(F.col("vec_id") < 20)
        return ivf_topk(
            emb, qs, k=10, n_centroids=64, nprobe=8, iters=10,
            ensure_k=True, round_digits=6, assignment="pandas",
            scoring="pandas",
        ).count()

    def bpe():
        merges = fit_bpe(docs, num_merges=200, top_words=2000)
        return (
            bpe_encode(docs.select("doc_id", "text"), merges)
            .agg(F.sum(F.size("bpe_tokens")))
            .collect()
        )

    suite = {
        "dedup_e2e": lambda: bench._flagship(spark, docs),
        "exact_dedup": lambda: em.q_exact_dup_groups(spark, SF_DIR).count(),
        "ngram_jaccard_exact": lambda: em.q_ngram_jaccard_pairs(spark, SF_DIR).count(),
        "simhash_pairs": lambda: em.q_simhash_pairs(spark, SF_DIR).count(),
        "substring_pairs": lambda: substring_dup_pairs(docs, gram=32, window=16).count(),
        "pricing_summary": lambda: em.q_pricing_summary(spark, SF_DIR).count(),
        "top_nations_by_revenue": lambda: em.q_top_nations_by_revenue(spark, SF_DIR).count(),
        "customer_top_orders": lambda: em.q_customer_top_orders(spark, SF_DIR).count(),
        "lsh_ann_topk": ann,
        "ivf_ann_topk": ivf,
        "bpe_encode": bpe,
        "forest_vote_topk": lambda: em.forest_vote_pipeline(
            spark, SF_DIR, DedupConfig(), k=5
        ).count(),
        "plaid_topk": lambda: bench.run_plaid(spark, reps=1, compute_mrr=False),
    }
    wanted = sys.argv[1:] or list(suite)
    unknown = [w for w in wanted if w not in suite]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}; known: {list(suite)}")

    # warm-up: one untimed execution of each selected query (JVM JIT,
    # Python worker pools — same rationale as bench.run_headline)
    for name in wanted:
        suite[name]()

    timings = {}
    for name in wanted:
        if name == "plaid_topk":
            # run_plaid times plaid_topk internally (best-of-reps) and
            # leaves centroid training / persists OUTSIDE the timed
            # region, exactly like bench._suite_pass's plaid row
            timings[name] = bench.run_plaid(spark, reps=REPS, compute_mrr=False)[
                "plaid_sec"
            ]
            print(f"[bench_extra] {name}: {timings[name]:.2f}s (best of {REPS})",
                  file=sys.stderr)
            continue
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            suite[name]()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"[bench_extra] {name}: {best:.2f}s (best of {REPS})", file=sys.stderr)

    probe = bench._delivery_probe_subproc(CPUS)
    out = {
        "queries": timings,
        "total": round(sum(timings.values()), 3),
        "reps": REPS,
        "probe_after": probe,
        "cpus": CPUS,
        "sf": SF_DIR,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
