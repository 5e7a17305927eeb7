"""A/B: pandas-UDF MinHash vs JVM-only Column-expression MinHash.

VERDICT r01 asked whether a JVM-side signature path (no Python boundary)
beats the Arrow-batched NumPy kernel. Three candidates over the same
shingle arrays (sf0.1 documents, 128 perms):

  A. pandas UDF (current production path, functions/minhash.py) —
     61-bit family, per-row NumPy kernel;
  B. explode + groupBy(doc_id) with 128 codegen'd min() aggregates —
     31-bit family (ANSI-safe: products < 2^62), costs one extra shuffle
     of the exploded shingle rows;
  C. higher-order functions: F.array(128 × F.aggregate(shingles, ...)) —
     31-bit family, no shuffle, but HOF lambdas are interpreted per
     element (not whole-stage codegen).

Run: PYTHONPATH=/root/repo python tools/minhash_ab.py [sf_dir]
Prints per-variant wall seconds (best of 3) for computing+consuming all
signatures. The winner is documented in functions/minhash.py.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from lsh_forest_for_multi_vector_retrieval_spark.config import DedupConfig
from lsh_forest_for_multi_vector_retrieval_spark.functions.minhash import minhash_udf
from lsh_forest_for_multi_vector_retrieval_spark.functions.shingles import with_shingles
from lsh_forest_for_multi_vector_retrieval_spark.session import (
    ensure_min_partitions,
    get_spark,
)

P31 = (1 << 31) - 1  # Mersenne prime 2^31-1


def params31(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, P31, size=num_perm).astype(np.int64) | 1
    b = rng.randint(0, P31, size=num_perm).astype(np.int64)
    return a, b


def variant_a(sigs_input, cfg):
    mh = minhash_udf(cfg.num_perm, cfg.minhash_seed)
    return sigs_input.select("doc_id", mh(F.col("shingles")).alias("sig"))


def variant_b(sigs_input, cfg):
    a, b = params31(cfg.num_perm, cfg.minhash_seed)
    h31 = F.pmod(F.col("sh"), F.lit(P31))
    exploded = sigs_input.select("doc_id", F.explode("shingles").alias("sh")).select(
        "doc_id", h31.alias("h")
    )
    aggs = [
        F.min((F.lit(int(a[p])) * F.col("h") + F.lit(int(b[p]))) % F.lit(P31)).alias(
            f"s{p}"
        )
        for p in range(cfg.num_perm)
    ]
    wide = exploded.groupBy("doc_id").agg(*aggs)
    return wide.select(
        "doc_id", F.array(*[f"s{p}" for p in range(cfg.num_perm)]).alias("sig")
    )


def variant_c(sigs_input, cfg):
    a, b = params31(cfg.num_perm, cfg.minhash_seed)
    sh31 = F.transform(F.col("shingles"), lambda x: F.pmod(x, F.lit(P31)))
    staged = sigs_input.select("doc_id", sh31.alias("h31"))
    sig = F.array(
        *[
            F.aggregate(
                F.col("h31"),
                F.lit(P31).cast("long"),
                lambda acc, h: F.least(
                    acc, (F.lit(int(a[p])) * h + F.lit(int(b[p]))) % F.lit(P31)
                ),
            )
            for p in range(cfg.num_perm)
        ]
    )
    return staged.select("doc_id", sig.alias("sig"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cfg = DedupConfig()
    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    shingled = (
        with_shingles(ensure_min_partitions(docs), k=cfg.shingle_size)
        .select("doc_id", "shingles")
        .persist()
    )
    n = shingled.count()  # materialize input so only the sig stage is timed
    print(f"docs: {n}")
    for name, fn in [("A_pandas_udf", variant_a), ("B_explode_groupby", variant_b), ("C_hof_aggregate", variant_c)]:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(shingled, cfg)
            # consume every signature value (prevents column pruning);
            # max-of-hash instead of sum — ANSI mode forbids long overflow
            out.select(F.max(F.xxhash64("sig"))).collect()
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
