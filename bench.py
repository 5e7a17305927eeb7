"""Benchmark driver.

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON line
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

--scaling: the north_rule's two-cluster-size criterion, sandbox stand-in —
run the identical flagship dedup job at local[8] and local[32] on the same
deterministic 40k-doc corpus (fresh JVM per parallelism level, spawned as
subprocesses) and report docs/sec at both plus scaling efficiency
(T8/T32)/(32/8). Results land in BENCH_SCALING.json and are summarized in
BASELINE.md.

--single-run N: internal helper for --scaling (one measurement at local[N]).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 40k docs ≈ minutes-long jobs at both parallelism levels — long enough to
# saturate the cores, short enough for interleaved A/B rounds to finish
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "40000"))
BENCH_CORPUS = os.environ.get(
    "SPARK_GRAFT_BENCH_CORPUS",
    f"/tmp/spark_graft_bench/pages_{BENCH_DOCS // 1000}k.parquet",
)


def _spark(cpus: int, shuffle_partitions: int | None = None):
    from lsh_forest_for_multi_vector_retrieval_spark.session import get_spark

    return get_spark(
        app_name="lshforest-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle_partitions or cpus,
        driver_memory="48g",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )


def _ensure_bench_corpus(spark) -> str:
    """Deterministic planted-dup corpus (seed 42) for the scaling runs —
    byte-identical regardless of parallelism (per-row seeding)."""
    p = Path(BENCH_CORPUS)
    if (p / "_SUCCESS").exists():
        return str(p)
    from lsh_forest_for_multi_vector_retrieval_spark.sources.pages import generate_pages

    n_clusters = BENCH_DOCS // 40  # 10% of docs in dup clusters of 4
    df = generate_pages(
        spark,
        n_clusters=n_clusters,
        cluster_size=4,
        n_exact_dups=n_clusters // 10,
        n_singletons=BENCH_DOCS - 4 * n_clusters - n_clusters // 10,
        doc_len=250,
        max_mutation=0.04,  # variants stay above the 0.8 Jaccard threshold
        seed=42,
        partitions=64,
    ).select("doc_id", "text")
    df.write.mode("overwrite").parquet(str(p))
    return str(p)


def _flagship(spark, docs):
    """The end-to-end dedup job used for both headline and scaling runs."""
    from lsh_forest_for_multi_vector_retrieval_spark.config import DedupConfig
    from lsh_forest_for_multi_vector_retrieval_spark.operators.dedup import minhash_dedup

    res = minhash_dedup(docs, DedupConfig())
    n_clusters = res.clusters.select("cluster_id").distinct().count()
    n_pairs = res.verified.count()
    res.unpersist()  # DedupResult.unpersist is blocking (round-3 VERDICT #1)
    return n_clusters, n_pairs


def run_plaid(spark) -> dict:
    """PLAID bench row: 500-query amortized q/s + MRR@10 on the SF_DIR
    embeddings (2,000 vectors -> 500 4-token docs at sf0.1), scored
    against the EXACT max-sum-interaction top-1 (the reference reports
    18.5 q/s / MRR 0.2997 on MS MARCO with a GPU encoder — BASELINE.md).
    Measured here (local[32], quiet window): ~35 q/s at MRR 0.55."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lsh_forest_for_multi_vector_retrieval_spark.functions.vectors import dot_col
    from lsh_forest_for_multi_vector_retrieval_spark.operators.metrics import mrr_at_k
    from lsh_forest_for_multi_vector_retrieval_spark.operators.plaid import (
        build_centroids,
        plaid_topk,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    docs = emb.select((F.col("vec_id") / 4).cast("long").alias("doc_id"), "embedding")
    # 500 SYNTHETIC 4-token queries (round-3 VERDICT #7): the old 25-query
    # run measured per-job scheduling overhead, not throughput. Each query
    # token references a deterministic Knuth-hash pick from the corpus
    # vectors, so the load amortizes fixed cost over 2,000 token lookups
    # while the exact max-sum-interaction oracle stays computable.
    n_q = int(os.environ.get("SPARK_GRAFT_PLAID_QUERIES", "500"))
    n_vecs = emb.count()
    corpus = docs.persist()
    queries = (
        spark.range(n_q * 4)
        .select(
            (F.col("id") / 4).cast("long").alias("query_id"),
            F.col("id").alias("vec_id"),
            ((F.col("id") * F.lit(2654435761)) % F.lit(n_vecs)).alias("ref"),
        )
        .join(
            emb.select(F.col("vec_id").alias("ref"), "embedding"), "ref"
        )
        .drop("ref")
        .persist()
    )
    corpus.count(), queries.count()

    # nprobe=16/32 centroids + rerank=100: the fixture embeddings are
    # unstructured (true top-1 sits at cosine ~0.3), so narrow probing
    # collapses MRR — measured sweep: nprobe=4/t_cs=0.2/rerank=20 -> MRR
    # 0.20; nprobe=16/t_cs=0/rerank=100 -> 0.56 at equal-or-lower wall
    cents = build_centroids(corpus, k=32, seed=42)
    t0 = time.perf_counter()
    res = plaid_topk(
        corpus, queries, cents, k=10, nprobe=16, t_cs=0.0, rerank=100
    ).localCheckpoint(eager=True)
    wall = time.perf_counter() - t0

    # exact oracle: true top-1 doc by max-sum interaction over real vectors
    qt = queries.select("query_id", "vec_id", F.col("embedding").alias("q_vec"))
    dt = corpus.select("doc_id", F.col("embedding").alias("d_vec"))
    per_tok = (
        F.broadcast(qt)
        .crossJoin(dt)
        .groupBy("query_id", "vec_id", "doc_id")
        .agg(F.max(dot_col(F.col("q_vec"), F.col("d_vec"))).alias("m"))
    )
    exact = per_tok.groupBy("query_id", "doc_id").agg(F.sum("m").alias("s"))
    w = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("doc_id"))
    rel = (
        exact.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select("query_id", "doc_id")
    )
    mrr = mrr_at_k(res, rel, k=10, query_col="query_id", item_col="doc_id")
    corpus.unpersist(blocking=True)
    queries.unpersist(blocking=True)
    return {
        "plaid_sec": round(wall, 3),
        "plaid_qps": round(n_q / wall, 1),
        "plaid_mrr10_vs_exact_top1": round(mrr, 4),
        "plaid_n_queries": n_q,
    }


def _delivery_probe(n_procs: int) -> float:
    """Deliverable-CPU probe (summed, long-quantum — same design as
    tools/scaling_paired.py): how many of ``n_procs`` cores the
    hypervisor is actually delivering right now.  Recorded in the bench
    artifact so a throttled-window sample is self-describing instead of
    reading as an engine regression (round-3 VERDICT "What's wrong" #1:
    the committed BENCH_r03.json was a throttle-window sample and could
    only be diagnosed by out-of-band reruns)."""
    import multiprocessing as mp

    def spin(reps: int = 30_000_000) -> float:
        t0 = time.perf_counter()
        x = 1.0
        for _ in range(reps):
            x = (x * 1.000001) % 97.0
        return time.perf_counter() - t0

    base = min(spin(), spin())  # min-of-2 single-core baseline
    with mp.Pool(n_procs) as pool:
        times = pool.map(_spin_worker, [30_000_000] * n_procs)
    return round(sum(base / t for t in times), 2)


def _spin_worker(reps: int) -> float:
    t0 = time.perf_counter()
    x = 1.0
    for _ in range(reps):
        x = (x * 1.000001) % 97.0
    return time.perf_counter() - t0


def run_headline() -> dict:
    import __spark_entry__ as em
    from pyspark.sql import functions as F

    from lsh_forest_for_multi_vector_retrieval_spark.operators.substring import (
        substring_dup_pairs,
    )

    spark = _spark(CPUS)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()  # warms the JVM + page cache

    timings: dict[str, float] = {}

    def timed(name: str, fn, reps: int = 2):
        # best-of-N: the sandbox VM is bursty and rep 1 absorbs Python
        # worker spin-up; the min is the steady-state cost
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    timed("dedup_e2e", lambda: _flagship(spark, docs))
    timed(
        "exact_dedup",
        lambda: em.q_exact_dup_groups(spark, SF_DIR).count(),
    )
    timed(
        "ngram_jaccard_exact",
        lambda: em.q_ngram_jaccard_pairs(spark, SF_DIR).count(),
    )
    timed("simhash_pairs", lambda: em.q_simhash_pairs(spark, SF_DIR).count())
    timed(
        "substring_pairs",
        lambda: substring_dup_pairs(docs, gram=32, window=16).count(),
    )
    timed("pricing_summary", lambda: em.q_pricing_summary(spark, SF_DIR).count())
    timed(
        "top_nations_by_revenue",
        lambda: em.q_top_nations_by_revenue(spark, SF_DIR).count(),
    )
    timed("customer_top_orders", lambda: em.q_customer_top_orders(spark, SF_DIR).count())
    from lsh_forest_for_multi_vector_retrieval_spark.operators.ann import lsh_topk

    def ann():
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        qs = emb.where(F.col("vec_id") < 20)
        return lsh_topk(
            emb, qs, k=10, dim=64, bits=64, n_chunks=16, ensure_k=True,
            round_digits=6,
        ).count()

    timed("lsh_ann_topk", ann)
    from lsh_forest_for_multi_vector_retrieval_spark.operators.ann import ivf_topk

    def ivf():
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        qs = emb.where(F.col("vec_id") < 20)
        return ivf_topk(
            emb, qs, k=10, n_centroids=64, nprobe=8, iters=10,
            ensure_k=True, round_digits=6, assignment="pandas",
        ).count()

    timed("ivf_ann_topk", ivf)
    # production hash family at SF_DIR (the sf0.01-pinned fixture assert
    # lives in the driver query, not the operator)
    from lsh_forest_for_multi_vector_retrieval_spark.config import DedupConfig as _DC

    timed(
        "forest_vote_topk",
        lambda: em.forest_vote_pipeline(spark, SF_DIR, _DC(), k=5).count(),
    )

    plaid = run_plaid(spark)
    timings["plaid_topk"] = plaid["plaid_sec"]

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "n_docs": n_docs,
        "dedup_docs_per_sec": round(n_docs / timings["dedup_e2e"], 1),
        "plaid_qps": plaid["plaid_qps"],
        "plaid_mrr10_vs_exact_top1": plaid["plaid_mrr10_vs_exact_top1"],
        "cpus": CPUS,
        # measured AFTER the suite: how many of the requested cores the
        # hypervisor was delivering around this sample (BASELINE.md
        # "substrate variability" — quiet windows read ~0.85-1.0x, capped
        # windows a fraction of that; a low value here flags the sample)
        "cpu_delivery_probe": _delivery_probe(CPUS),
    }
    spark.stop()
    return out


def run_single(cpus: int, reps: int | None = None) -> dict:
    # env resolved per call (not at import time) so callers that import
    # bench and set the var afterwards are honored (ADVICE round-2)
    if reps is None:
        reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "3"))
    # shuffle partitions FIXED across parallelism levels (like a real
    # cluster where the partition count is sized for the data, not the
    # executor count) so cores are the only variable
    spark = _spark(cpus, shuffle_partitions=64)
    corpus = _ensure_bench_corpus(spark)
    docs = spark.read.parquet(corpus)
    n = docs.count()
    # warm-up pass (JVM JIT + python workers + shuffle dirs), then
    # best-of-reps measured passes (the sandbox VM is bursty)
    _flagship(spark, docs)
    wall = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        n_clusters, n_pairs = _flagship(spark, docs)
        wall = min(wall, time.perf_counter() - t0)
    spark.stop()
    return {
        "cpus": cpus,
        "n_docs": n,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n / wall, 1),
        "n_clusters": n_clusters,
        "n_pairs": n_pairs,
    }


def run_scaling(
    rounds: int = int(os.environ.get("SPARK_GRAFT_SCALING_ROUNDS", "3"))
) -> dict:
    """Interleaved A/B/A/B sampling: the sandbox VM's capacity varies by
    multiples over minutes, so the two parallelism levels alternate in
    time and the per-level MINIMUM approximates quiet-window performance
    for both fairly. Each sample is a fresh JVM (subprocess).

    The scaling corpus is 4x the headline corpus (160k docs,
    $SPARK_GRAFT_SCALING_DOCS to override): strong-scaling efficiency is
    only meaningful when the parallel fraction dominates the fixed
    per-job scheduling latency (~1-2 s/job regardless of cores) — at 40k
    docs the local[32] leg finishes in ~35 s and Amdahl's fixed ~15 s
    caps efficiency at ~0.6 no matter how well the operators scale."""
    scaling_docs = os.environ.get("SPARK_GRAFT_SCALING_DOCS", "160000")
    samples: dict[int, list[dict]] = {8: [], 32: []}
    for _ in range(rounds):
        for cpus in (8, 32):
            proc = subprocess.run(
                [sys.executable, __file__, "--single-run", str(cpus)],
                capture_output=True,
                text=True,
                env={
                    **os.environ,
                    "PYTHONPATH": str(Path(__file__).parent),
                    "SPARK_GRAFT_BENCH_DOCS": scaling_docs,
                },
            )
            lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
            if lines:
                samples[cpus].append(json.loads(lines[-1]))
    best = {c: min(s, key=lambda r: r["wall_sec"]) for c, s in samples.items()}
    t8, t32 = best[8]["wall_sec"], best[32]["wall_sec"]
    eff = (t8 / t32) / (32 / 8)
    out = {
        "metric": "scaling_efficiency_8_to_32_cores",
        "value": round(eff, 3),
        "unit": "efficiency",
        "runs": best,
        "all_samples": {str(c): [r["wall_sec"] for r in s] for c, s in samples.items()},
        "note": "sandbox stand-in for N->4N executors (north_rule): same job, "
        "same input, local[8] vs local[32], interleaved rounds, min per level; "
        "efficiency=(T8/T32)/4",
    }
    Path("BENCH_SCALING.json").write_text(json.dumps(out, indent=2))
    # same-results check: clusters/pairs must be identical at both levels
    assert best[8]["n_clusters"] == best[32]["n_clusters"], "nondeterminism!"
    assert best[8]["n_pairs"] == best[32]["n_pairs"], "nondeterminism!"
    return out


if __name__ == "__main__":
    if "--single-run" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--single-run") + 1])
        print(json.dumps(run_single(cpus)))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_headline()))
