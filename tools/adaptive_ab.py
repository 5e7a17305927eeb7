"""A/B: fixed-depth bands + hot-bucket cap vs variable-depth adaptive bands.

Round-2 VERDICT #5: `adaptive_band_table` (the LSH-forest F1/F2 variable-
depth machinery) was tested but not wired into any pipeline; the flagship
used fixed bands + `max_bucket_docs` caps. This experiment decides which
strategy the flagship should default to, on the corpus shape where they
differ: a boilerplate-heavy web corpus (every page shares site chrome, so
MinHash band buckets collapse into mega-buckets — the 100 TB skew hazard).

 * FIXED arm: base bands; buckets over `max_bucket_docs` are truncated
   (deterministic cap + drop ledger). Cheap, but dropped docs lose pairs.
 * ADAPTIVE arm: buckets over `adaptive_max_bucket` get longer prefixes
   (extra MinHash rows from the reserved permutation region) until they
   split below the bound — no truncation, recall preserved, extra rounds
   of groupBy+semi-join instead.

Both arms share one signature config (num_perm=160: 16x8 base + 32
reserved rows) so the MinHash cost is identical; recall/precision are
scored against the driver-side exact-Jaccard oracle. Writes
ADAPTIVE_AB.json.

Usage: python tools/adaptive_ab.py [n_docs(default 2000)] [cap(default 64)]
"""

from __future__ import annotations

import json
import sys
import time
from dataclasses import replace
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

from lsh_forest_for_multi_vector_retrieval_spark import get_spark  # noqa: E402
from lsh_forest_for_multi_vector_retrieval_spark.config import DedupConfig  # noqa: E402
from lsh_forest_for_multi_vector_retrieval_spark.operators.bands import (  # noqa: E402
    adaptive_band_table,
    band_table,
    with_signatures,
)
from lsh_forest_for_multi_vector_retrieval_spark.operators.dedup import (  # noqa: E402
    minhash_dedup,
)
from lsh_forest_for_multi_vector_retrieval_spark.operators.pairs import (  # noqa: E402
    bucket_drop_stats,
)
from lsh_forest_for_multi_vector_retrieval_spark.sources.pages import (  # noqa: E402
    generate_pages,
    true_dup_pairs_oracle,
)

BOILER = (
    " copyright example site all rights reserved privacy policy terms of"
    " service cookie notice sign in register subscribe to our newsletter"
    " follow us on social media back to top site map contact advertise"
)


def run_arm(docs, cfg: DedupConfig) -> dict:
    t0 = time.perf_counter()
    res = minhash_dedup(docs, cfg)
    pairs = {(r.doc_a, r.doc_b) for r in res.verified.select("doc_a", "doc_b").collect()}
    wall = time.perf_counter() - t0
    res.unpersist()
    return {"pairs": pairs, "wall_sec": round(wall, 2)}


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    spark = get_spark(master="local[16]", shuffle_partitions=32,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    n_clusters = n_docs // 20
    pages = generate_pages(
        spark,
        n_clusters=n_clusters,
        cluster_size=4,
        n_exact_dups=0,
        n_singletons=n_docs - 4 * n_clusters,
        doc_len=120,
        max_mutation=0.04,
        seed=9,
    ).withColumn("text", F.concat(F.col("text"), F.lit(BOILER * 2)))
    docs = pages.select("doc_id", "text").persist()
    docs.count()

    base = DedupConfig(num_perm=160, max_bucket_docs=cap, adaptive_max_bucket=cap)
    fixed_cfg = replace(base, use_adaptive_bands=False)
    adapt_cfg = replace(base, use_adaptive_bands=True)

    oracle = true_dup_pairs_oracle(
        docs.toPandas(), threshold=base.jaccard_threshold, k=base.shingle_size
    )

    # skew diagnostics: bucket-size extremes + docs dropped by the cap
    sigs = with_signatures(docs, base).select("doc_id", "shingles", "sig").persist()
    fixed_bands = band_table(sigs, fixed_cfg)
    drops = bucket_drop_stats(fixed_bands, fixed_cfg).agg(
        F.count("*").alias("hot_buckets"), F.sum("dropped_docs").alias("dropped_docs")
    ).first()
    adapt_bands = adaptive_band_table(sigs, adapt_cfg)
    depth_hist = {
        int(r.depth): int(r["count"])
        for r in adapt_bands.groupBy("depth").count().collect()
    }
    sigs.unpersist()

    arms = {}
    for name, cfg in (("fixed_cap", fixed_cfg), ("adaptive", adapt_cfg)):
        r = run_arm(docs, cfg)
        got = r["pairs"]
        arms[name] = {
            "recall": round(len(got & oracle) / max(len(oracle), 1), 4),
            "precision": round(len(got & oracle) / max(len(got), 1), 4),
            "n_pairs": len(got),
            "wall_sec": r["wall_sec"],
        }

    out = {
        "metric": "adaptive_vs_fixed_band_ab",
        "n_docs": n_docs,
        "bucket_cap": cap,
        "n_oracle_pairs": len(oracle),
        "skew": {
            "hot_buckets_over_cap": int(drops.hot_buckets or 0),
            "docs_dropped_by_cap": int(drops.dropped_docs or 0),
            "adaptive_depth_histogram": depth_hist,
        },
        "arms": arms,
        "note": "boilerplate-heavy corpus (every doc shares site chrome); "
        "same num_perm=160 signatures both arms; oracle = driver-side "
        "exact Jaccard >= 0.8",
    }
    Path(ROOT / "ADAPTIVE_AB.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
