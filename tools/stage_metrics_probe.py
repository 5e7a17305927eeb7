"""Per-Spark-stage utilization probe for the flagship dedup job.

The paired/stage harnesses answer "does the job scale?"; this one answers
"WHERE does the 4-core wall go?". It runs ONE warm flagship pass at
local[N] (taskset-pin externally for fidelity) with the Spark UI's REST
API enabled, then pulls /api/v1 stage metrics and prints, per stage:

    wall (stage duration), task-time, cpu-time, utilization = task-time /
    (wall * N), shuffle bytes, and the stage name

plus the pass's uncovered wall (time no stage was running = driver-side
gaps: job scheduling, AQE re-planning, broadcast builds, toPandas,
createDataFrame round-trips).

Usage: python tools/stage_metrics_probe.py [cpus] [n_docs]
Writes nothing; diagnostic stdout only.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> int:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 320_000

    os.environ["SPARK_GRAFT_BENCH_DOCS"] = str(n_docs)
    import bench
    from lsh_forest_for_multi_vector_retrieval_spark.session import get_spark
    from lsh_forest_for_multi_vector_retrieval_spark.config import DedupConfig
    from lsh_forest_for_multi_vector_retrieval_spark.operators.dedup import minhash_dedup

    gen = bench._spark(16)
    corpus = bench._ensure_bench_corpus(gen)
    gen.stop()

    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=64,
        driver_memory="40g",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4099",
            "spark.ui.showConsoleProgress": "false",
            "spark.executor.heartbeatInterval": "60s",
            "spark.network.timeout": "1200s",
            "spark.sql.files.maxPartitionBytes": "16777216",
        },
    )
    docs = spark.read.parquet(corpus)

    def flagship():
        res = minhash_dedup(docs, DedupConfig())
        nc = res.clusters.select("cluster_id").distinct().count()
        npairs = res.verified.count()
        res.unpersist()
        return nc, npairs

    flagship()  # warm-up

    def stages():
        app = json.load(
            urllib.request.urlopen("http://localhost:4099/api/v1/applications")
        )[0]["id"]
        return json.load(
            urllib.request.urlopen(
                f"http://localhost:4099/api/v1/applications/{app}/stages"
                "?status=complete&details=false"
            )
        )

    seen = {s["stageId"] for s in stages()}
    t0 = time.perf_counter()
    nc, npairs = flagship()
    wall = time.perf_counter() - t0
    new = [s for s in stages() if s["stageId"] not in seen]
    new.sort(key=lambda s: s["stageId"])

    print(f"\nflagship wall {wall:.2f}s at local[{cpus}] ({n_docs} docs, "
          f"{nc} clusters / {npairs} pairs)\n")
    print(f"{'id':>4} {'wall_s':>7} {'task_s':>7} {'cpu_s':>7} {'util':>5} "
          f"{'tasks':>5} {'shW_MB':>7} {'shR_MB':>7}  name")
    covered = 0.0
    intervals = []
    for s in new:
        sub = (time.mktime(time.strptime(s["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S"))
               + float(s["submissionTime"][20:23]) / 1000)
        end = (time.mktime(time.strptime(s["completionTime"][:19], "%Y-%m-%dT%H:%M:%S"))
               + float(s["completionTime"][20:23]) / 1000)
        dur = end - sub
        intervals.append((sub, end))
        task_s = s["executorRunTime"] / 1000
        cpu_s = s.get("executorCpuTime", 0) / 1e9
        util = task_s / (dur * cpus) if dur > 0 else 0
        print(f"{s['stageId']:>4} {dur:>7.2f} {task_s:>7.2f} {cpu_s:>7.2f} "
              f"{util:>5.2f} {s['numCompleteTasks']:>5} "
              f"{s['shuffleWriteBytes'] / 1e6:>7.1f} "
              f"{s['shuffleReadBytes'] / 1e6:>7.1f}  {s['name'][:60]}")
    # merged coverage of [sub, end] intervals = wall where >=1 stage ran
    intervals.sort()
    cur_s, cur_e = None, None
    for s0, e0 in intervals:
        if cur_e is None or s0 > cur_e:
            if cur_e is not None:
                covered += cur_e - cur_s
            cur_s, cur_e = s0, e0
        else:
            cur_e = max(cur_e, e0)
    if cur_e is not None:
        covered += cur_e - cur_s
    total_task = sum(s["executorRunTime"] for s in new) / 1000
    print(f"\nstage-covered wall ~{covered:.2f}s of {wall:.2f}s "
          f"(uncovered ~{wall - covered:.2f}s = driver gaps: scheduling, "
          f"AQE re-plan, broadcast builds, collects)")
    print(f"total task time {total_task:.2f}s -> overall utilization "
          f"{total_task / (wall * cpus):.2f} of {cpus} cores")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
