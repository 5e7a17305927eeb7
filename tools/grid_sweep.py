"""E3 config-grid sweep (reference run_experiments,
/root/reference/src/shared/test_forest_vote.py:328-461): cross-product
over banding shape x verification threshold on a planted-dup corpus,
reporting recall/precision vs the exact-Jaccard oracle plus wall time.

Rebuild-avoidance exactly like the reference's ``tree_params`` guard
(test_query.py:191): MinHash signatures depend only on (shingle_size,
num_perm, seed) — computed ONCE and persisted; each banding config
rebuilds only the band/pair stages; each threshold re-verifies from the
same candidates.

Run: PYTHONPATH=/root/repo python tools/grid_sweep.py
Writes GRID_SWEEP.json (one row per config) plus the reference's sweep
artifacts (test_forest_vote.py:437-461: all_experiment_results.csv +
experiment_summary.png): grid_sweep_results.csv and two summary panels
(recall / precision vs threshold, one series per band shape) under
charts/.
"""

from __future__ import annotations

import csv
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F

from lsh_forest_for_multi_vector_retrieval_spark.config import DedupConfig
from lsh_forest_for_multi_vector_retrieval_spark.operators.bands import (
    band_table,
    with_signatures,
)
from lsh_forest_for_multi_vector_retrieval_spark.operators.dedup import (
    ngram_jaccard_pairs_exact,
)
from lsh_forest_for_multi_vector_retrieval_spark.operators.pairs import candidate_pairs
from lsh_forest_for_multi_vector_retrieval_spark.operators.verify import verify_pairs
from lsh_forest_for_multi_vector_retrieval_spark.sources.pages import generate_pages
from lsh_forest_for_multi_vector_retrieval_spark.session import get_spark

BAND_SHAPES = [(8, 16), (16, 8), (32, 4)]  # (num_bands, rows_per_band)
THRESHOLDS = [0.7, 0.8, 0.9]
N_DOCS = 4000


def main() -> None:
    spark = get_spark(
        app_name="grid-sweep", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    docs = generate_pages(
        spark,
        n_clusters=200,
        cluster_size=4,
        n_exact_dups=20,
        n_singletons=N_DOCS - 820,
        doc_len=150,
        max_mutation=0.10,  # spread pair similarity across the thresholds
        seed=42,
    ).select("doc_id", "text").persist()
    docs.count()

    # exact oracle pairs, once per threshold (band-shape independent)
    oracle: dict[float, set[tuple[int, int]]] = {}
    exact = ngram_jaccard_pairs_exact(docs, threshold=min(THRESHOLDS)).persist()
    for t in THRESHOLDS:
        oracle[t] = {
            (r.doc_a, r.doc_b)
            for r in exact.where(F.col("jaccard") >= t).collect()
        }

    # signatures once (the tree_params rebuild guard)
    base = DedupConfig()
    sigs = with_signatures(docs, base).select("doc_id", "shingles", "sig").persist()
    sigs.count()

    rows = []
    for nb, rpb in BAND_SHAPES:
        cfg = DedupConfig(num_bands=nb, rows_per_band=rpb)
        t0 = time.perf_counter()
        cands = candidate_pairs(band_table(sigs, cfg), cfg).persist()
        n_cands = cands.count()
        band_wall = time.perf_counter() - t0
        for thr in THRESHOLDS:
            vcfg = DedupConfig(
                num_bands=nb, rows_per_band=rpb, jaccard_threshold=thr
            )
            t1 = time.perf_counter()
            got = {
                (r.doc_a, r.doc_b)
                for r in verify_pairs(cands, sigs, vcfg).collect()
            }
            verify_wall = time.perf_counter() - t1
            truth = oracle[thr]
            tp = len(got & truth)
            rows.append(
                {
                    "num_bands": nb,
                    "rows_per_band": rpb,
                    "jaccard_threshold": thr,
                    "n_candidates": n_cands,
                    "n_pairs": len(got),
                    "n_true": len(truth),
                    "recall": round(tp / len(truth), 4) if truth else 1.0,
                    "precision": round(tp / len(got), 4) if got else 1.0,
                    "band_wall_sec": round(band_wall, 2),
                    "verify_wall_sec": round(verify_wall, 2),
                }
            )
            print(json.dumps(rows[-1]))
        cands.unpersist()
    out = {
        "n_docs": N_DOCS,
        "corpus": "generate_pages seed=42 max_mutation=0.10",
        "note": "signatures computed once and reused across the grid "
        "(reference tree_params rebuild guard, test_query.py:191)",
        "grid": rows,
    }
    Path(ROOT / "GRID_SWEEP.json").write_text(json.dumps(out, indent=2))
    write_sweep_artifacts(rows)
    spark.stop()
    print(f"wrote GRID_SWEEP.json ({len(rows)} configs)")


def write_sweep_artifacts(rows: list, out_dir: str | None = None) -> list:
    """CSV + summary plots for a finished sweep — the reference's
    run_experiments sinks (test_forest_vote.py:437: results_df.to_csv
    ('all_experiment_results.csv'); :464-502: lineplots hued by config →
    experiment_summary.png). One series per band shape, recall and
    precision vs threshold."""
    from lsh_forest_for_multi_vector_retrieval_spark.sinks.plots import (
        multi_line_png,
    )

    # anchor at the repo root (sibling-tool convention), not the CWD
    d = Path(out_dir) if out_dir is not None else ROOT / "charts"
    d.mkdir(exist_ok=True)
    written = []
    csv_path = d / "grid_sweep_results.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    written.append(str(csv_path))
    for metric in ("recall", "precision"):
        series: dict[str, tuple[list, list]] = {}
        for r in rows:
            label = f"{r['num_bands']}x{r['rows_per_band']}"
            xs, ys = series.setdefault(label, ([], []))
            xs.append(r["jaccard_threshold"])
            ys.append(r[metric])
        written.append(
            multi_line_png(str(d / f"sweep_{metric}.png"), series)
        )
    print(f"wrote {written}")
    return written


if __name__ == "__main__":
    main()
