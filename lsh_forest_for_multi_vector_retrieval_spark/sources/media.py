"""Deterministic synthetic media corpus (images / video / audio) with
planted near-duplicate groups — the multimodal analog of sources/pages.py.

Per-row seeding (seed = global_seed + media_id) makes the corpus
byte-identical regardless of partitioning or parallelism, same contract as
generate_pages. Payloads use the real dependency-free codecs from
functions/multimodal.py (rawrgb / rawpcm16), so decode-resize-hash runs on
real pixel math with no stub in the loop.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.multimodal import MEDIA_SCHEMA, encode_rawrgb


def _noisy_copy(rng: np.random.RandomState, base: np.ndarray, n_pix: int) -> np.ndarray:
    """Perturb n_pix random pixels by ±<=8 — stays within ahash Hamming<=3
    of the base for the sizes used here."""
    out = base.copy()
    f, h, w, c = out.shape
    for _ in range(n_pix):
        fi, hi, wi = rng.randint(f), rng.randint(h), rng.randint(w)
        delta = rng.randint(-8, 9, size=c)
        out[fi, hi, wi] = np.clip(out[fi, hi, wi].astype(int) + delta, 0, 255)
    return out


def generate_media(
    spark: SparkSession,
    n_groups: int = 20,
    group_size: int = 3,
    n_singletons: int = 40,
    height: int = 32,
    width: int = 32,
    n_video: int = 4,
    n_audio: int = 8,
    video_frames: int = 8,
    audio_sec: float = 0.5,
    sample_rate: int = 16000,
    seed: int = 7,
    partitions: int = 8,
) -> DataFrame:
    """Rows follow MEDIA_SCHEMA. Images: ``n_groups`` planted near-dup
    groups of ``group_size`` (one base + noisy copies, same true_group)
    plus ``n_singletons`` independents. Videos/audio exercise the
    multi-frame / PCM paths."""
    n_images = n_groups * group_size + n_singletons
    total = n_images + n_video + n_audio
    ids = spark.range(0, total, 1, partitions).select(F.col("id").alias("media_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id in pdf["media_id"]:
                media_id = int(media_id)
                rng = np.random.RandomState(seed * 1_000_003 + media_id)
                if media_id < n_images:
                    group = media_id // group_size if media_id < n_groups * group_size else None
                    if group is not None and media_id % group_size != 0:
                        # noisy copy: regenerate the group base with the
                        # BASE row's rng, then perturb with our own
                        base_id = group * group_size
                        base_rng = np.random.RandomState(seed * 1_000_003 + base_id)
                        base = base_rng.randint(
                            0, 256, size=(1, height, width, 3), dtype=np.uint8
                        )
                        frames = _noisy_copy(rng, base, n_pix=3)
                    else:
                        frames = rng.randint(
                            0, 256, size=(1, height, width, 3), dtype=np.uint8
                        )
                    rows.append(
                        {
                            "media_id": media_id,
                            "doc_id": media_id,
                            "media_type": "image",
                            "payload": encode_rawrgb(frames),
                            "meta": {
                                "codec": "rawrgb",
                                "width": width,
                                "height": height,
                                "channels": 3,
                                "n_frames": 1,
                                "sample_rate": None,
                            },
                            "true_group": group,
                        }
                    )
                elif media_id < n_images + n_video:
                    frames = rng.randint(
                        0, 256, size=(video_frames, height, width, 3), dtype=np.uint8
                    )
                    rows.append(
                        {
                            "media_id": media_id,
                            "doc_id": media_id,
                            "media_type": "video",
                            "payload": encode_rawrgb(frames),
                            "meta": {
                                "codec": "rawrgb",
                                "width": width,
                                "height": height,
                                "channels": 3,
                                "n_frames": video_frames,
                                "sample_rate": None,
                            },
                            "true_group": None,
                        }
                    )
                else:
                    n = int(audio_sec * sample_rate)
                    t = np.arange(n) / sample_rate
                    freq = 200.0 + 50.0 * (media_id % 7)
                    wave = 0.5 * np.sin(2 * np.pi * freq * t) + 0.01 * rng.randn(n)
                    pcm = np.clip(wave * 32767, -32768, 32767).astype("<i2")
                    rows.append(
                        {
                            "media_id": media_id,
                            "doc_id": None,
                            "media_type": "audio",
                            "payload": pcm.tobytes(),
                            "meta": {
                                "codec": "rawpcm16",
                                "width": None,
                                "height": None,
                                "channels": 1,
                                "n_frames": None,
                                "sample_rate": sample_rate,
                            },
                            "true_group": None,
                        }
                    )
            yield pd.DataFrame(rows)

    return ids.mapInPandas(gen, schema=MEDIA_SCHEMA)
