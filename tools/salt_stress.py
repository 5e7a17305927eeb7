"""Hot-band salting stress: one synthetic mega-bucket (2M docs sharing a
band hash — the '50M empty pages' template shape at test scale) plus 1M
healthy singleton buckets, pushed through bucket_ids_capped at
salt_partitions=1 (single-reducer collect_set, the memory hazard) and =32
(two-stage salted). Asserts the kept id set is IDENTICAL and records wall
times + config in SALT_STRESS.json. The equality at 2M rows is the
distributed-scale evidence behind the unit test's 5k-row proof
(tests/test_pairs_components.py::test_salted_bucket_cap_equals_unsalted).

Wall times are informal (no probe gating) — the artifact's claim is
correctness + completion, not throughput.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

from lsh_forest_for_multi_vector_retrieval_spark import get_spark  # noqa: E402
from lsh_forest_for_multi_vector_retrieval_spark.operators.pairs import (  # noqa: E402
    bucket_ids_capped,
)


def main() -> int:
    hot_n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    singles = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    cap = 4096
    spark = get_spark(
        master="local[8]",
        shuffle_partitions=64,
        driver_memory="8g",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    hot = spark.range(hot_n).select(
        F.lit(0).alias("band_id"),
        F.lit(7).cast("long").alias("band_hash"),
        F.col("id").alias("doc_id"),
    )
    cold = spark.range(singles).select(
        F.lit(1).alias("band_id"),
        (F.col("id") + 100).alias("band_hash"),  # unique bucket per doc
        (F.col("id") + 10_000_000).alias("doc_id"),
    )
    bands = hot.unionByName(cold).repartition(64).persist()
    bands.count()

    out: dict = {
        "metric": "salt_stress_mega_bucket",
        "hot_bucket_rows": hot_n,
        "singleton_buckets": singles,
        "max_bucket_docs": cap,
        "legs": {},
    }
    ids = {}
    for s in (1, 32):
        t0 = time.perf_counter()
        got = bucket_ids_capped(
            bands, ["band_id", "band_hash"], cap, salt_partitions=s
        ).collect()
        wall = round(time.perf_counter() - t0, 2)
        assert len(got) == 1, f"expected only the hot bucket, got {len(got)}"
        ids[s] = got[0]["ids"]
        out["legs"][str(s)] = {"wall_sec": wall, "kept_ids": len(ids[s])}
        print(f"salt={s}: {wall}s, kept {len(ids[s])} ids", flush=True)
    assert ids[1] == ids[32] == list(range(cap)), "salted != unsalted!"
    out["identical"] = True
    (ROOT / "SALT_STRESS.json").write_text(json.dumps(out, indent=1))
    print("identical kept sets; wrote SALT_STRESS.json", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
