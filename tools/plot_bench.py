"""Render the headline bench artifact as a per-query bar chart.

Reads BENCH_r05.json (or a path given on the command line) and draws
``charts/bench_queries.png`` — per-query wall seconds as labeled
horizontal bars — plus ``charts/bench_probes.png``, the per-pass CPU
delivery probes (pre and post legs) against the 28.8/32 gate, so a
reader can see at a glance that the committed sample came from a
full-delivery window.

Run: PYTHONPATH=/root/repo python tools/plot_bench.py [artifact.json]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lsh_forest_for_multi_vector_retrieval_spark.sinks.plots import (  # noqa: E402
    hbar_png,
    multi_line_png,
)


def plot_bench_artifact(artifact: dict, out_dir: str = "charts") -> list:
    """Write the two bench panels; returns the written paths."""
    d = Path(out_dir)
    d.mkdir(exist_ok=True)
    written = []

    queries = dict(sorted(artifact["queries"].items(),
                          key=lambda kv: -kv[1]))
    written.append(hbar_png(str(d / "bench_queries.png"), queries))

    pre = artifact.get("pass_probes")
    if pre:
        post = artifact.get("pass_probes_post", [])
        xs = list(range(1, len(pre) + 1))
        series = {"pre": (xs, pre)}
        if post:
            series["post"] = (list(range(1, len(post) + 1)), post)
        gate = artifact.get("probe_gate")
        if gate is not None:
            series[f"gate {gate:g}"] = (xs, [float(gate)] * len(xs))
        written.append(
            multi_line_png(str(d / "bench_probes.png"), series))
    return written


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r05.json"
    artifact = json.loads(Path(path).read_text())
    written = plot_bench_artifact(artifact)
    print(f"wrote {written}")


if __name__ == "__main__":
    main()
