"""Per-stage Amdahl decomposition of the flagship dedup pipeline.

BENCH_SCALING.json answers "does the whole job scale 1->4 cores?" with a
probe-gated end-to-end ratio. This tool answers the mechanistic question
underneath it — WHICH stages scale, and where the serial floor lives —
by timing each flagship stage behind an eager localCheckpoint barrier
(so stage N's clock never includes recomputing stage N-1):

  signatures  shingle + MinHash/SimHash pandas-UDF scan   (expect ~linear)
  bands       posexplode + band hashing                   (expect ~linear)
  pairs       bucket groupBy + pair generation shuffle    (expect ~linear)
  verify      pair x signature join + exact Jaccard       (expect ~linear)
  cc          iterative join/agg label propagation        (expect a serial
              floor: each iteration is a driver-scheduled job over
              kilobytes of edges, so wall time is dominated by fixed
              per-job latency, not CPU — Amdahl's serial term)

Evidence discipline is inherited from tools/scaling_paired.py (same
resident pinned JVMs, same deliverable-CPU probes, same pre-declared
>=95%-delivery validity gate from BASELINE.md): per-stage efficiency is
reported from per-level MINIMA over probe-valid legs only.

Usage: python tools/stage_scaling.py [passes] [n_docs] [small] [big]
Writes STAGE_SCALING.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

from scaling_paired import (  # noqa: E402
    LOG_DIR,
    _cpu_probe,
    _read_line,
    _wait_for_quiet,
)


def _stage_log_tail(cpus: int, lines: int = 15) -> str:
    """Tail of THIS tool's worker log — scaling_paired._log_tail reads
    worker_{cpus}.log, but these workers write stage_worker_{cpus}.log,
    so error paths used to report a stale sibling log (round-5 review)."""
    p = LOG_DIR / f"stage_worker_{cpus}.log"
    if not p.exists():
        return "(no log)"
    return "\n".join(p.read_text(errors="replace").splitlines()[-lines:])


STAGES = ["signatures", "bands", "pairs", "verify", "cc"]

WORKER_CODE = r"""
import json, sys, time
sys.path.insert(0, {root!r})
from lsh_forest_for_multi_vector_retrieval_spark import get_spark
from lsh_forest_for_multi_vector_retrieval_spark.config import DedupConfig
from lsh_forest_for_multi_vector_retrieval_spark.operators.bands import (
    band_table, with_signatures,
)
from lsh_forest_for_multi_vector_retrieval_spark.operators.components import (
    connected_components,
)
from lsh_forest_for_multi_vector_retrieval_spark.operators.pairs import candidate_pairs
from lsh_forest_for_multi_vector_retrieval_spark.operators.verify import verify_pairs

cpus = int(sys.argv[1])
corpus = sys.argv[2]
spark = get_spark(master=f"local[{{cpus}}]", shuffle_partitions=64,
                  driver_memory="40g",
                  extra_conf={{
                      "spark.ui.showConsoleProgress": "false",
                      "spark.executor.heartbeatInterval": "60s",
                      "spark.network.timeout": "1200s",
                      # 16 MB splits: full-wave balancing for the
                      # signature scan (see tools/scaling_paired.py)
                      "spark.sql.files.maxPartitionBytes": "16777216",
                  }})
cfg = DedupConfig()
docs = spark.read.parquet(corpus).select("doc_id", "text")
n = docs.count()


def staged():
    t = {{}}
    t0 = time.perf_counter()
    # eager localCheckpoint = materialization barrier; each stage's clock
    # covers exactly its own compute (plus the checkpoint write, which a
    # resumable production run pays too — plans/pipeline.py writes parquet
    # at the same boundaries)
    sigs = with_signatures(docs, cfg).select(
        "doc_id", "shingles", "sig", "simhash"  # same cols the flagship keeps
    ).localCheckpoint(eager=True)
    t["signatures"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    bands = band_table(sigs, cfg).localCheckpoint(eager=True)
    t["bands"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    cands = candidate_pairs(bands, cfg).localCheckpoint(eager=True)
    t["pairs"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    # cands is already an eager localCheckpoint: tell the prune not to
    # copy it into a second block-manager checkpoint (the storageLevel
    # probe cannot see checkpointed-ness — only the cache manager)
    verified = verify_pairs(
        cands, sigs, cfg, materialize_pairs=False
    ).localCheckpoint(eager=True)
    t["verify"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    clusters = connected_components(
        verified, all_vertices=sigs.select("doc_id"),
        max_iterations=cfg.cc_max_iterations,
    )
    nc = clusters.select("cluster_id").distinct().count()
    t["cc"] = time.perf_counter() - t0
    npairs = verified.count()
    for df in (sigs, bands, cands, verified):
        df.unpersist(blocking=True)
    return t, nc, npairs


staged()  # warm-up: JVM JIT, python workers, shuffle dirs
print(f"READY {{n}}", flush=True)
for line in sys.stdin:
    if line.strip() != "RUN":
        break
    t, nc, npairs = staged()
    print("DONE " + json.dumps({{"t": t, "nc": nc, "npairs": npairs}}),
          flush=True)
spark.stop()
"""


def main() -> int:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 80_000
    small = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    big = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    budget = float(os.environ.get("SPARK_GRAFT_SCALING_BUDGET", "2400"))
    quiet_patience = float(os.environ.get("SPARK_GRAFT_QUIET_PATIENCE", "300"))

    os.environ["SPARK_GRAFT_BENCH_DOCS"] = str(n_docs)
    import bench

    if (Path(bench.BENCH_CORPUS) / "_SUCCESS").exists():
        corpus = bench.BENCH_CORPUS
    else:
        spark = bench._spark(16)
        corpus = bench._ensure_bench_corpus(spark)
        spark.stop()

    LOG_DIR.mkdir(exist_ok=True)
    code = WORKER_CODE.format(root=str(ROOT))
    pin0 = int(os.environ.get("SPARK_GRAFT_SCALING_PIN_BASE", "24"))
    pin_base = {small: pin0, big: pin0 + small}
    import shutil

    # shutil.which — slim images without a `which` binary crashed
    # instead of falling back to unpinned (round-5 review; mirrors
    # scaling_paired)
    use_taskset = (
        os.environ.get("SPARK_GRAFT_SCALING_PIN", "1") == "1"
        and shutil.which("taskset") is not None
    )
    workers: dict[int, subprocess.Popen] = {}
    logs: dict[int, object] = {}
    # per level: list of (stage->sec, probe, valid)
    legs: dict[int, list[dict]] = {small: [], big: []}
    results: set[tuple[int, int]] = set()
    t_start = time.monotonic()
    try:
        for cpus in (small, big):
            logs[cpus] = open(LOG_DIR / f"stage_worker_{cpus}.log", "w")
            prefix = (
                ["taskset", "-c", f"{pin_base[cpus]}-{pin_base[cpus] + cpus - 1}"]
                if use_taskset
                else []
            )
            workers[cpus] = subprocess.Popen(
                prefix + [sys.executable, "-u", "-c", code, str(cpus), corpus],
                stdin=subprocess.PIPE,
                stdout=subprocess.PIPE,
                stderr=logs[cpus],
                text=True,
            )
        n = None
        for cpus, w in workers.items():
            while True:
                line = _read_line(w, cpus, _stage_log_tail)
                if line.startswith("READY"):
                    n = int(line.split()[1])
                    break
            print(f"stage worker local[{cpus}] ready, n={n}", flush=True)

        i = 0
        max_passes = max(passes * 4, 8)
        while (
            min(
                sum(1 for leg in legs[c] if leg["valid"]) for c in (small, big)
            )
            < passes
            and i < max_passes
        ):
            if i >= 1 and time.monotonic() - t_start > budget:
                print(f"budget exhausted after {i} passes", flush=True)
                break
            order = (big, small) if i % 2 == 0 else (small, big)
            for cpus in order:
                cpu_set = (
                    set(range(pin_base[cpus], pin_base[cpus] + cpus))
                    if use_taskset
                    else None
                )
                probe = _wait_for_quiet(
                    cpus, cpu_set, gate=0.95 * cpus, patience_s=quiet_patience
                )
                w = workers[cpus]
                w.stdin.write("RUN\n")
                w.stdin.flush()
                line = _read_line(w, cpus, _stage_log_tail)
                if not line.startswith("DONE "):
                    raise RuntimeError(
                        f"bad stage-worker line from local[{cpus}]: {line!r};"
                        f" stderr tail:\n{_stage_log_tail(cpus)}"
                    )
                payload = json.loads(line[5:])
                # post-leg probe: a pre-leg probe cannot certify the whole
                # leg. Hardened settle+retry BACKPORTED from
                # scaling_paired (round-5 review: the 8 s single-probe
                # version here predated the sibling's fix — at large
                # corpora the JVM's own wind-down outlives 8 s and voids
                # clean legs; max-of-two at ~12 s and ~27 s recovers
                # them while a real substrate cap persists across both).
                time.sleep(12.0)
                post = _cpu_probe(cpus, cpu_set=cpu_set)
                if post < 0.95 * cpus:
                    time.sleep(15.0)
                    post = max(post, _cpu_probe(cpus, cpu_set=cpu_set))
                valid = min(probe, post) >= 0.95 * cpus
                legs[cpus].append(
                    {
                        "t": payload["t"],
                        "probe": probe,
                        "probe_post": post,
                        "valid": valid,
                    }
                )
                results.add((payload["nc"], payload["npairs"]))
                total = sum(payload["t"].values())
                print(
                    f"pass {i} local[{cpus}]: total {total:.1f}s "
                    + " ".join(
                        f"{s}={payload['t'][s]:.1f}" for s in STAGES
                    )
                    + f" (probe {probe}/{cpus}{'' if valid else ' VOID'})",
                    flush=True,
                )
            i += 1

        if not results:
            print("no completed legs — no artifact written", flush=True)
            return 1
        assert len(results) == 1, f"nondeterministic results across legs: {results}"

        def stage_min(cpus: int, stage: str) -> float | None:
            vals = [leg["t"][stage] for leg in legs[cpus] if leg["valid"]]
            return round(min(vals), 3) if vals else None

        per_stage = {}
        for s in STAGES:
            t_s, t_b = stage_min(small, s), stage_min(big, s)
            speedup = round(t_s / t_b, 3) if t_s and t_b else None
            per_stage[s] = {
                f"t{small}_min_sec": t_s,
                f"t{big}_min_sec": t_b,
                "speedup": speedup,
                "efficiency": round(speedup / (big / small), 3)
                if speedup
                else None,
            }
        tot_s = sum(v[f"t{small}_min_sec"] or 0 for v in per_stage.values())
        tot_b = sum(v[f"t{big}_min_sec"] or 0 for v in per_stage.values())
        nc, npairs = next(iter(results))
        out = {
            "metric": f"per_stage_scaling_{small}_to_{big}_cores",
            "n_docs": n,
            "stages": per_stage,
            "total_from_stage_minima": {
                f"t{small}_sec": round(tot_s, 2),
                f"t{big}_sec": round(tot_b, 2),
                # None when a level never produced a probe-valid leg (an
                # all-throttled window) — the artifact then records the
                # raw legs but makes no efficiency claim
                "efficiency": round((tot_s / tot_b) / (big / small), 3)
                if tot_s and tot_b
                else None,
            },
            "serial_share_at_big": round(
                (per_stage["cc"][f"t{big}_min_sec"] or 0) / tot_b, 3
            )
            if tot_b
            else None,
            "legs": {
                str(c): [
                    {
                        "total_sec": round(sum(leg["t"].values()), 2),
                        "probe": leg["probe"],
                        "probe_post": leg["probe_post"],
                        "valid": leg["valid"],
                        **{s: round(leg["t"][s], 2) for s in STAGES},
                    }
                    for leg in legs[c]
                ]
                for c in (small, big)
            },
            "result_fingerprint": {"n_clusters": nc, "n_pairs": npairs},
            "note": (
                "per-stage minima over probe-valid legs; validity gate is "
                "STRICTER than BENCH_SCALING.json: >=95% deliverable-CPU "
                "both immediately before AND after the leg (pre-only gating "
                "admitted mid-leg throttle windows); eager localCheckpoint "
                "barriers between stages so each clock covers exactly one "
                "stage; cc/verify at this size sit at the fixed per-job "
                "scheduling floor (the Amdahl serial term)"
            ),
        }
        (ROOT / "STAGE_SCALING.json").write_text(json.dumps(out, indent=1))
        print(json.dumps(out["stages"], indent=1))
        print(
            f"total eff {out['total_from_stage_minima']['efficiency']} | "
            f"serial(cc) share at {big} cores: {out['serial_share_at_big']}"
        )
        return 0
    finally:
        for cpus, w in workers.items():
            try:
                w.stdin.close()
            except Exception:
                pass
            w.terminate()
        for f in logs.values():
            f.close()


if __name__ == "__main__":
    raise SystemExit(main())
