"""Paired interleaved scaling measurement (north-rule evidence harness).

The sandbox VM's available throughput swings by multiples over multi-minute
windows, so independent best-of-N legs at each parallelism level can land
in different load regimes and produce nonsense ratios (observed: the same
local[32] job in 39 s and 280 s within one hour). This harness holds BOTH
SparkSessions resident (one local[8], one local[32] JVM — idle JVMs cost no
CPU) and alternates single flagship passes 32,8,32,8,... so adjacent
samples see near-identical background load. It reports:

  * per-level minima (quiet-window throughput at each level), and
  * efficiency from the per-level minima: (T8/T32)/(32/8)

Workers are subprocesses driven over a stdin/stdout line protocol; the
measured job is bench.py's flagship (minhash_dedup end-to-end) on the
shared deterministic corpus, shuffle partitions fixed at 64 across levels
(a real cluster sizes partitions for the data, not the executor count).

Usage: python tools/scaling_paired.py [passes_per_level] [n_docs] [small] [big]
(small/big = the two local[N] parallelism levels, default 8 and 32).
Writes BENCH_SCALING.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

WORKER_CODE = r"""
import sys, time
sys.path.insert(0, {root!r})
from lsh_forest_for_multi_vector_retrieval_spark import get_spark
from lsh_forest_for_multi_vector_retrieval_spark.config import DedupConfig
from lsh_forest_for_multi_vector_retrieval_spark.operators.dedup import minhash_dedup

cpus = int(sys.argv[1])
corpus = sys.argv[2]
spark = get_spark(master=f"local[{{cpus}}]", shuffle_partitions=64,
                  driver_memory="48g",
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
docs = spark.read.parquet(corpus)
n = docs.count()

def flagship():
    res = minhash_dedup(docs, DedupConfig())
    nc = res.clusters.select("cluster_id").distinct().count()
    npairs = res.verified.count()
    res.signatures.unpersist()
    res.verified.unpersist()
    return nc, npairs

flagship()  # warm-up: JVM JIT, python workers, shuffle dirs
print(f"READY {{n}}", flush=True)
for line in sys.stdin:
    if line.strip() != "RUN":
        break
    t0 = time.perf_counter()
    nc, npairs = flagship()
    print(f"DONE {{time.perf_counter() - t0:.3f}} {{nc}} {{npairs}}", flush=True)
spark.stop()
"""


def main() -> int:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 160_000
    small = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    big = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    # corpus via bench.py helpers (deterministic, seed 42)
    os.environ["SPARK_GRAFT_BENCH_DOCS"] = str(n_docs)
    sys.path.insert(0, str(ROOT))
    import bench

    spark = bench._spark(16)
    corpus = bench._ensure_bench_corpus(spark)
    spark.stop()

    code = WORKER_CODE.format(root=str(ROOT))
    workers: dict[int, subprocess.Popen] = {}
    for cpus in (small, big):
        workers[cpus] = subprocess.Popen(
            [sys.executable, "-u", "-c", code, str(cpus), corpus],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
    n = None
    for cpus, w in workers.items():
        for line in w.stdout:
            if line.startswith("READY"):
                n = int(line.split()[1])
                break
        print(f"worker local[{cpus}] ready, n={n}", flush=True)

    samples: dict[int, list[float]] = {small: [], big: []}
    results = set()
    for i in range(passes):
        for cpus in (big, small):  # adjacent passes share the load window
            w = workers[cpus]
            w.stdin.write("RUN\n")
            w.stdin.flush()
            line = w.stdout.readline()
            _, sec, nc, npairs = line.split()
            samples[cpus].append(float(sec))
            results.add((int(nc), int(npairs)))
            print(f"pass {i} local[{cpus}]: {sec}s", flush=True)
    for w in workers.values():
        w.stdin.close()
        w.wait(timeout=120)

    assert len(results) == 1, f"nondeterminism across levels/passes: {results}"
    t8, t32 = min(samples[small]), min(samples[big])
    eff = (t8 / t32) / (big / small)
    nc, npairs = next(iter(results))
    out = {
        "metric": f"scaling_efficiency_{small}_to_{big}_cores",
        "value": round(eff, 3),
        "unit": "efficiency",
        "runs": {
            str(small): {
                "cpus": small,
                "n_docs": n,
                "wall_sec": t8,
                "docs_per_sec": round(n / t8, 1),
                "n_clusters": nc,
                "n_pairs": npairs,
            },
            str(big): {
                "cpus": big,
                "n_docs": n,
                "wall_sec": t32,
                "docs_per_sec": round(n / t32, 1),
                "n_clusters": nc,
                "n_pairs": npairs,
            },
        },
        "all_samples": {str(c): s for c, s in samples.items()},
        "note": f"sandbox stand-in for N->4N executors (north_rule): same "
        f"flagship dedup job, same input, two RESIDENT JVMs (local[{small}], "
        f"local[{big}]) alternating single passes so adjacent samples share "
        "the VM's bursty background load; per-level minimum = quiet-window "
        f"throughput; efficiency=(T{small}/T{big})/{big // small}",
    }
    Path(ROOT / "BENCH_SCALING.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
