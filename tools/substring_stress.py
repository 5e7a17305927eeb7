"""Boilerplate-footer stress for the substring pivot-star (round-3
VERDICT #2 "done" criterion): a crawl-shaped corpus where EVERY doc in a
large group shares one >=47-char footer, so a single winnowed fingerprint
bucket holds the whole group. The round-3 code emitted the full C(n,2)
clique from such a bucket (the one remaining 100x plan hazard); the
round-4 pivot star must emit exactly k*(n-k) + C(k,2) candidates, keep
every doc connected to the pivots, and ledger the skipped member-member
comparisons.

Arms:
* star   — default bucket_pivots=64 at n=20,000 footer docs (the scale
           the clique could never survive: C(20k,2) = 200M pairs).
* clique — bucket_pivots=10**6 (full clique) at n=2,000 for contrast
           (C(2k,2) = 2M pairs already ~37x the star's 128k at that n).

Writes SUBSTRING_STRESS.json.

Usage: python tools/substring_stress.py [n_star] [n_clique]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from lsh_forest_for_multi_vector_retrieval_spark import get_spark  # noqa: E402
from lsh_forest_for_multi_vector_retrieval_spark.operators.substring import (  # noqa: E402
    fingerprint_drop_stats,
    substring_dup_pairs,
)


CONCLUSION_TEMPLATE = (
    "one shared footer across {n} docs yields {pairs} distinct star "
    "candidates (single-bucket formula k(n-k)+C(k,2) = {formula}; the "
    "footer winnows into ~2-3 fingerprint buckets whose stars union) "
    "instead of C(n,2) = {clique}; {covered} footer docs stay connected "
    "through the pivots and every skipped member-member comparison is "
    "ledgered"
)


def make_corpus(spark, n_footer: int, n_singletons: int, seed: int):
    """n_footer docs sharing one 60-char footer + unrelated singletons.
    Driver-side deterministic build (strings are small)."""
    rng = np.random.RandomState(seed)
    alpha = list("abcdefghijklmnopqrstuvwxyz ")
    footer = "".join(rng.choice(alpha, 60))
    rows = []
    for i in range(n_footer):
        rows.append({"doc_id": i, "text": "".join(rng.choice(alpha, 150)) + footer})
    for j in range(n_singletons):
        rows.append({"doc_id": n_footer + j, "text": "".join(rng.choice(alpha, 210))})
    return spark.createDataFrame(pd.DataFrame(rows)).repartition(32)


def run_arm(docs, n_footer: int, bucket_pivots: int, max_bucket_docs: int) -> dict:
    """max_bucket_docs is raised above the group size in every arm so the
    PIVOT STAR is the only cap under test — the two caps are layered:
    bucket_pivots bounds the PAIR count (O(k*n)), max_bucket_docs bounds
    the collect_set aggregation-buffer memory (default 4096 ~ 32 KB of
    ids; a bucket beyond it is truncated and ledgered as dropped_docs).
    """
    t0 = time.perf_counter()
    # materialize ONCE: the returned plan's dominant verify join would
    # otherwise execute twice (count + the coverage audit below), and
    # the duplicate was charged to wall_sec (round-5 review). wall now
    # covers exactly one end-to-end computation.
    pairs = substring_dup_pairs(
        docs, gram=32, window=16, bucket_pivots=bucket_pivots,
        max_bucket_docs=max_bucket_docs,
    ).localCheckpoint(eager=True)
    n_pairs = pairs.count()
    wall = time.perf_counter() - t0
    # connectivity audit (reads the checkpoint — not timed): every
    # non-pivot footer doc must appear in >=1 pair
    covered = (
        pairs.selectExpr("doc_a as d").union(pairs.selectExpr("doc_b as d"))
        .where(f"d < {n_footer}")
        .distinct()
        .count()
    )
    led = fingerprint_drop_stats(
        docs, gram=32, window=16, bucket_pivots=bucket_pivots,
        max_bucket_docs=max_bucket_docs,
    ).collect()
    skipped = max((r.starred_pairs_skipped for r in led), default=0)
    return {
        "bucket_pivots": bucket_pivots,
        "candidate_pairs": n_pairs,
        "footer_docs_covered": covered,
        "wall_sec": round(wall, 2),
        "max_starred_pairs_skipped": int(skipped),
    }


def main() -> int:
    n_star = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_clique = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    spark = get_spark(
        master="local[16]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    k = 64  # default bucket_pivots

    docs = make_corpus(spark, n_star, n_star // 10, seed=21).persist()
    docs.count()
    star = run_arm(docs, n_star, bucket_pivots=k, max_bucket_docs=2 * n_star)
    star["expected_star_pairs"] = k * (n_star - k) + k * (k - 1) // 2
    star["clique_pairs_avoided"] = n_star * (n_star - 1) // 2
    docs.unpersist(blocking=True)

    docs2 = make_corpus(spark, n_clique, n_clique // 10, seed=22).persist()
    docs2.count()
    clique = run_arm(docs2, n_clique, bucket_pivots=10**6, max_bucket_docs=2 * n_clique)
    star_small = run_arm(docs2, n_clique, bucket_pivots=k, max_bucket_docs=2 * n_clique)
    docs2.unpersist(blocking=True)

    out = {
        "metric": "substring_hot_bucket_stress",
        "star_20k": {"n_footer_docs": n_star, **star},
        "clique_contrast_2k": {"n_footer_docs": n_clique, **clique},
        "star_contrast_2k": {"n_footer_docs": n_clique, **star_small},
        "conclusion": CONCLUSION_TEMPLATE.format(
            n=f"{n_star:,}", pairs=f"{star['candidate_pairs']:,}",
            formula=f"{star['expected_star_pairs']:,}",
            clique=f"{star['clique_pairs_avoided']:,}",
            covered=f"{star['footer_docs_covered']:,}",
        ),
    }
    # never silently overwrite the committed canonical artifact: its
    # conclusion carries analysis written against that specific run's
    # numbers (the 1.36x single-bucket-formula deviation note), which a
    # templated rerun cannot reproduce (round-5 review) — reruns land in
    # a sibling file for manual promotion
    dest = ROOT / "SUBSTRING_STRESS.json"
    if dest.exists():
        dest = ROOT / "SUBSTRING_STRESS_rerun.json"
    dest.write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
