"""Precompute expected-output parquet fixtures for the two DETERMINISTIC
rows-only driver queries (round-2 VERDICT #3), flipping them to full
value-checked oracles without SQL re-implementation:

* ``media_near_dups`` — the planted media corpus (sources/media.py,
  seed 7) is integer math end-to-end: regenerate every image/video frame
  array in plain NumPy (no Spark), average-hash each with the SAME
  independently-hand-value-tested kernel (functions/multimodal.py
  ``average_hash``), and do BRUTE-FORCE all-pairs Hamming <= 3. What the
  oracle then cross-checks in the Spark path: the mapInPandas decode
  plumbing, the pigeonhole chunk blocking join (lossless for <=3), and
  the JVM bit_count verify.

* ``substring_pairs`` — winnowed rolling-hash fingerprints over
  /root/testdata/sf0.01/documents.parquet are deterministic given the
  text: recompute fingerprints + gram sets per doc with the NumPy kernels
  (operators/substring.py ``_rolling_hashes``/``_winnow``), then build
  the inverted index, candidate pairs, and exact gram-set intersections
  with plain Python dictionaries. Cross-checks the distributed explode /
  groupBy / bucket-pair / array_intersect plumbing.

The driver's DuckDB oracle reads the committed fixtures via
``read_parquet('/root/repo/fixtures/...')`` (see __spark_entry__
``oracle_sql``). tests/test_expected_fixtures.py regenerates both
in-memory and compares against the live Spark operators, so a drift
between code and committed fixture fails pytest before it fails the
driver.

Usage: python tools/make_expected_fixtures.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pandas as pd

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from lsh_forest_for_multi_vector_retrieval_spark.functions.multimodal import (  # noqa: E402
    average_hash,
)
from lsh_forest_for_multi_vector_retrieval_spark.operators.substring import (  # noqa: E402
    _rolling_hashes,
    _winnow,
)
from lsh_forest_for_multi_vector_retrieval_spark.sources.media import (  # noqa: E402
    _noisy_copy,
)

FIXTURES = ROOT / "fixtures"


def _media_frames(
    media_id: int,
    seed: int = 7,
    n_groups: int = 8,
    group_size: int = 3,
    n_singletons: int = 16,
    height: int = 32,
    width: int = 32,
    n_video: int = 4,
    video_frames: int = 8,
) -> np.ndarray | None:
    """Frame array for one image/video row of generate_media(seed=7, ...)
    — the exact per-row RNG recipe of sources/media.py, reproduced without
    Spark. Returns None for audio rows."""
    n_images = n_groups * group_size + n_singletons
    rng = np.random.RandomState(seed * 1_000_003 + media_id)
    if media_id < n_images:
        in_group = media_id < n_groups * group_size
        if in_group and media_id % group_size != 0:
            base_id = (media_id // group_size) * group_size
            base_rng = np.random.RandomState(seed * 1_000_003 + base_id)
            base = base_rng.randint(0, 256, size=(1, height, width, 3), dtype=np.uint8)
            return _noisy_copy(rng, base, n_pix=3)
        return rng.randint(0, 256, size=(1, height, width, 3), dtype=np.uint8)
    if media_id < n_images + n_video:
        return rng.randint(0, 256, size=(video_frames, height, width, 3), dtype=np.uint8)
    return None


def expected_media_near_dups(max_hamming: int = 3) -> pd.DataFrame:
    """Brute-force all-pairs ahash-Hamming expectation for
    q_media_near_dups (generate_media(n_groups=8, group_size=3,
    n_singletons=16, seed=7) defaults)."""
    n_images = 8 * 3 + 16
    hashes: dict[int, int] = {}
    for mid in range(n_images + 4):  # images + default 4 videos
        frames = _media_frames(mid)
        assert frames is not None
        hashes[mid] = average_hash(frames[0])
    rows = []
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = bin((hashes[a] ^ hashes[b]) & 0xFFFFFFFFFFFFFFFF).count("1")
            if ham <= max_hamming:
                rows.append({"doc_a": a, "doc_b": b, "hamming": ham})
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"]).astype("int64")


def expected_substring_pairs(
    sf_dir: str = "/root/testdata/sf0.01",
    gram: int = 32,
    window: int = 16,
    max_bucket_docs: int = 4096,
) -> pd.DataFrame:
    """Pure-Python expectation for q_substring_pairs(sf_dir): winnowed
    fingerprint inverted index -> bucket pairs (sorted ids, capped the
    same deterministic way) -> exact gram-set intersection counts."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    fps: dict[int, np.ndarray] = {}
    grams: dict[int, set] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        doc_id = int(doc_id)
        if text is None:
            h = np.empty(0, dtype=np.uint64)
        else:
            h = _rolling_hashes(text, gram)
        fps[doc_id] = _winnow(h, window)
        grams[doc_id] = set(np.unique(h).tolist())
    inv: dict[int, list[int]] = {}
    for doc_id, f in fps.items():
        for v in f.tolist():
            inv.setdefault(v, []).append(doc_id)
    cands = set()
    for ids in inv.values():
        if len(ids) < 2:
            continue
        ids = sorted(ids)[:max_bucket_docs]
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                cands.add((a, b))
    rows = []
    for a, b in sorted(cands):
        shared = len(grams[a] & grams[b])
        if shared > 0:
            rows.append({"doc_a": a, "doc_b": b, "shared_grams": shared})
    return pd.DataFrame(
        rows, columns=["doc_a", "doc_b", "shared_grams"]
    ).astype("int64")


def main() -> int:
    FIXTURES.mkdir(exist_ok=True)
    media = expected_media_near_dups()
    media.to_parquet(FIXTURES / "media_near_dups.parquet", index=False)
    print(f"media_near_dups: {len(media)} pairs")
    sub = expected_substring_pairs()
    sub.to_parquet(FIXTURES / "substring_pairs_sf0.01.parquet", index=False)
    print(f"substring_pairs (sf0.01): {len(sub)} pairs")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
