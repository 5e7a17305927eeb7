"""Hot-bucket strategy study: clique-truncation vs pivot-star vs adaptive
variable-depth bands (round-2 VERDICT #5, extended in round 3).

Two corpus shapes produce LSH mega-buckets at web scale, and they need
different medicine — this experiment measures all three strategies on
both and records why the flagship defaults to pivot-star + fixed depth:

* CORPUS A — "mega-dup": groups of hundreds of near-identical pages
  (empty product/template pages). Signatures are essentially equal, so
  NOTHING can split these buckets (adaptive deepening included); the only
  question is what the pair generator does with a 300-doc bucket.
  - clique-truncation (r02 behavior: docs beyond the cap dropped) loses
    cluster membership: orphaned docs become spurious singletons.
  - pivot-star keeps every doc connected through <=k pivots at O(k*n)
    pairs: clusters stay whole at linear cost.
* CORPUS B — "template near-miss": groups sharing ~3/4 of their text
  (token Jaccard ~0.72, BELOW the 0.8 dup threshold). Band buckets fill
  with candidates that all FAIL verification — pure wasted verify work.
  Here deepening helps: members differ in ~25% of signature rows, so a
  longer prefix splits the bucket and the candidate count drops.

Writes ADAPTIVE_AB.json.

Usage: python tools/adaptive_ab.py
"""

from __future__ import annotations

import json
import sys
import time
from dataclasses import replace
from pathlib import Path

import numpy as np
import pandas as pd

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from lsh_forest_for_multi_vector_retrieval_spark import get_spark  # noqa: E402
from lsh_forest_for_multi_vector_retrieval_spark.config import DedupConfig  # noqa: E402
from lsh_forest_for_multi_vector_retrieval_spark.operators.dedup import (  # noqa: E402
    minhash_dedup,
)
from lsh_forest_for_multi_vector_retrieval_spark.sources.pages import (  # noqa: E402
    generate_pages,
)

# signature config shared by all arms. Reserved deepening rows come
# from DedupConfig.signature_len (adaptive_reserved_rows, default 64 =
# num_bands * max_extra for disjoint per-band extras) — NOT from
# num_perm headroom: the old num_perm=160 computed 32 permutations no
# arm ever consumed, inflating the fixed arms' MinHash cost for nothing
# (round-5 review). Pair budget is ~equal across arms: clique over 16
# kept docs vs star with 16 pivots.
BASE = DedupConfig(num_perm=128, max_bucket_docs=4096, bucket_pivots=16,
                   adaptive_max_bucket=16, adaptive_max_extra_rows=4)

ARMS = {
    # r02 behavior: hard-truncate the bucket, full clique over the kept
    # docs — every doc beyond the cap is dropped from pair generation
    "clique_truncate": replace(BASE, max_bucket_docs=16, bucket_pivots=10**6),
    # r03 default: keep the whole bucket, every doc pairs with <=16 pivots
    "pivot_star": BASE,
    # LSH-forest variable depth on top of the star
    "adaptive_star": replace(BASE, use_adaptive_bands=True),
}


def run_arm(docs, cfg: DedupConfig) -> dict:
    t0 = time.perf_counter()
    res = minhash_dedup(docs, cfg)
    n_cand = res.candidates.count()
    n_pairs = res.verified.count()
    labels = {r.doc_id: r.cluster_id for r in res.clusters.collect()}
    wall = time.perf_counter() - t0
    res.unpersist()
    return {"candidates": n_cand, "verified_pairs": n_pairs,
            "labels": labels, "wall_sec": round(wall, 2)}


def corpus_a(spark):
    """4 mega-dup groups of 300 near-identical docs + 800 singletons."""
    return generate_pages(
        spark, n_clusters=4, cluster_size=300, n_singletons=800,
        n_exact_dups=0, doc_len=200, max_mutation=0.01, seed=5,
    ).select("doc_id", "text"), 4, 300


def corpus_b(spark):
    """6 template groups of 250 docs at token-Jaccard ~0.72 (sub-threshold
    near-misses) + 500 singletons. Deterministic driver-side build."""
    rng = np.random.RandomState(77)
    vocab = [f"w{i:04d}" for i in range(5000)]
    rows = []
    doc_id = 0
    for g in range(6):
        template = " ".join(rng.choice(vocab, 180))
        for _ in range(250):
            filler = " ".join(rng.choice(vocab, 30))
            rows.append({"doc_id": doc_id, "text": template + " " + filler})
            doc_id += 1
    for _ in range(500):
        rows.append({"doc_id": doc_id, "text": " ".join(rng.choice(vocab, 210))})
        doc_id += 1
    spark_df = spark.createDataFrame(pd.DataFrame(rows))
    return spark_df.repartition(16), 6, 250


def main() -> int:
    spark = get_spark(master="local[16]", shuffle_partitions=32,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    out = {"metric": "hot_bucket_strategy_ab", "corpora": {}}

    # --- corpus A: mega-dup cluster integrity
    docs, n_groups, gsz = corpus_a(spark)
    docs = docs.persist()
    n_docs_a = docs.count()
    a = {}
    for name, cfg in ARMS.items():
        r = run_arm(docs, cfg)
        # integrity: fraction of each group's docs sharing that group's
        # majority label, averaged over groups
        fracs = []
        for g in range(n_groups):
            ids = range(g * gsz, (g + 1) * gsz)
            lab = [r["labels"][i] for i in ids]
            top = max(set(lab), key=lab.count)
            fracs.append(lab.count(top) / gsz)
        a[name] = {
            "cluster_integrity": round(sum(fracs) / len(fracs), 4),
            "candidates": r["candidates"],
            "verified_pairs": r["verified_pairs"],
            "wall_sec": r["wall_sec"],
        }
    docs.unpersist()
    out["corpora"]["A_mega_dup"] = {
        # counted from the corpus itself, not a re-stated literal
        "n_docs": n_docs_a, "groups": f"{n_groups}x{gsz}", "arms": a,
    }

    # --- corpus B: sub-threshold template near-misses (verify waste)
    docs, n_groups, gsz = corpus_b(spark)
    docs = docs.persist()
    n_docs_b = docs.count()
    b = {}
    for name, cfg in ARMS.items():
        r = run_arm(docs, cfg)
        b[name] = {
            "candidates": r["candidates"],
            "verified_pairs": r["verified_pairs"],  # ~0: all below 0.8
            "wall_sec": r["wall_sec"],
        }
    docs.unpersist()
    out["corpora"]["B_template_near_miss"] = {
        "n_docs": n_docs_b, "groups": f"{n_groups}x{gsz}", "arms": b,
    }

    # conclusion formatted from THIS run's measurements — a static
    # string desynchronizes from its own arms section the moment any
    # operator or corpus changes (round-5 review)
    cand_cut = (
        100.0
        * (b["adaptive_star"]["candidates"] - b["pivot_star"]["candidates"])
        / max(b["pivot_star"]["candidates"], 1)
    )
    out["conclusion"] = (
        "flagship default = pivot_star, fixed depth. A: star keeps "
        "mega-clusters whole (integrity "
        f"{a['pivot_star']['cluster_integrity']} vs "
        f"{a['clique_truncate']['cluster_integrity']} for clique "
        "truncation) at O(k*n) pairs. B: adaptive deepening changes "
        f"sub-threshold candidates by {cand_cut:+.0f}% vs the star, but "
        "its iterative groupBy+semi-join build rounds cost more wall "
        "than the saved verify work at this scale — it stays an opt-in "
        "(use_adaptive_bands) for corpora where per-candidate verify "
        "cost dominates (very long documents)"
    )
    Path(ROOT / "ADAPTIVE_AB.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
