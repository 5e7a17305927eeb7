"""Multimodal operators over opaque binary media columns.

All four are ``mapInPandas`` stages (Arrow batch in, Arrow batch out) so
they pipeline with zero shuffle: at 100 TB each executor decodes only its
own input splits, and the only shuffles in this file are the ones dedup
fundamentally needs (the ahash block join). Column pruning still applies —
each operator selects only (id, payload, meta) before the Python stage so
the scan never drags unused columns through Arrow.

Reference analog: the reference hashes token multisets of *text*
(/root/reference/src/shared/utils.py); these operators produce the same
kinds of per-item signatures (perceptual hash, feature vector) for pixels
and audio so the downstream LSH/verify machinery is shared.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.multimodal import (
    audio_features,
    decode_audio,
    decode_image,
    image_features,
    resize_nearest,
)
from ..functions.simhash import hamming_chunk_cols

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("chan_mean", T.ArrayType(T.DoubleType()), False),
        T.StructField("chan_std", T.ArrayType(T.DoubleType()), False),
        T.StructField("luma_hist", T.ArrayType(T.DoubleType()), False),
        T.StructField("ahash", T.LongType(), False),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("zero_crossing_rate", T.DoubleType(), False),
        T.StructField("duration_sec", T.DoubleType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("channels", T.IntegerType(), False),
    ]
)


def with_image_features(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """(media_id, chan_mean, chan_std, luma_hist, ahash) for every image /
    video row — decode + feature math per Arrow batch, no shuffle."""
    src = media.where(F.col("media_type").isin("image", "video")).select(
        F.col(id_col).alias("media_id"), "payload", "meta"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                frames = decode_image(payload, meta)
                rows.append({"media_id": int(media_id), **image_features(frames)})
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA])

    return src.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("ahash", T.LongType(), False),
    ]
)


def with_ahash(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """(media_id, ahash) only — the dedup hot path. ``with_image_features``
    also computes full-resolution float64 per-channel means/stds and a
    luma histogram per row, all of which ``media_near_dup_pairs`` throws
    away; the ahash needs only an 8x8 nearest-neighbor gather + mean
    threshold, so at scale this stage skips nearly all the per-pixel
    floating-point work (round-5 review)."""
    from ..functions.multimodal import average_hash

    src = media.where(F.col("media_type").isin("image", "video")).select(
        F.col(id_col).alias("media_id"), "payload", "meta"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                frames = decode_image(payload, meta)
                rows.append(
                    {"media_id": int(media_id), "ahash": average_hash(frames[0])}
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AHASH_SCHEMA])

    return src.mapInPandas(run, schema=AHASH_SCHEMA)


def with_audio_features(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    src = media.where(F.col("media_type") == "audio").select(
        F.col(id_col).alias("media_id"), "payload", "meta"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                samples = decode_audio(payload, meta)
                # sample_rate is nullable: degrade to 0 (duration 0.0 via
                # audio_features' own guard) instead of int(None) killing
                # the whole Arrow batch (round-5 review)
                rows.append(
                    {
                        "media_id": int(media_id),
                        **audio_features(samples, int(meta["sample_rate"] or 0)),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA])

    return src.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


def frame_sample(
    media: DataFrame,
    every_k: int = 4,
    resize_to: tuple[int, int] | None = None,
    id_col: str = "media_id",
) -> DataFrame:
    """Sample every k-th frame of video rows (and the single frame of
    images), optionally resizing — one exploded row per kept frame, encoded
    back to rawrgb bytes. The row-explosion happens inside the Arrow stage,
    so the plan stays a single mapInPandas with no separate explode."""
    src = media.where(F.col("media_type").isin("image", "video")).select(
        F.col(id_col).alias("media_id"), "payload", "meta"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                frames = decode_image(payload, meta)
                for idx in range(0, frames.shape[0], every_k):
                    frame = frames[idx]
                    if resize_to is not None:
                        frame = resize_nearest(frame, *resize_to)
                    rows.append(
                        {
                            "media_id": int(media_id),
                            "frame_idx": idx,
                            "frame_payload": frame.tobytes(),
                            "height": frame.shape[0],
                            "width": frame.shape[1],
                            "channels": frame.shape[2],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA])

    return src.mapInPandas(run, schema=FRAME_SCHEMA)


def media_near_dup_pairs(media: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Image near-duplicate pairs via perceptual average-hash + the same
    pigeonhole chunk blocking as SimHash text dedup (operators/dedup.py:109):
    any pair within Hamming<=3 of the 64-bit ahash shares one of 4 exact
    16-bit chunks, so candidate generation is an equi-join on (chunk_id,
    chunk_val) — bucketed, never all-pairs — and verification is one
    JVM-side ``bit_count`` XOR. Returns (doc_a, doc_b, hamming).

    The (media_id, ahash) table feeds both sides of the self-join;
    localCheckpoint (16 bytes/image, ContextCleaner-released) instead of
    persist so repeated calls in one session don't accumulate cached
    tables (round-2 ADVICE). eager=True: a lazy checkpoint feeding both
    sides of a self-join races AQE stage materialization (benign
    "non-existent accumulator" ERROR flood — see ngram_jaccard_pairs_exact)."""
    sigs = with_ahash(media).localCheckpoint(eager=True)
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    # shared kernel: handles the width==64 mask (max_hamming=0 = exact
    # ahash only) that the old inline copy got wrong (round-5 review)
    chunks = hamming_chunk_cols(F.col("ahash"), width, n_chunks)
    blocks = sigs.select(
        "media_id", "ahash", F.posexplode(chunks).alias("chunk_id", "chunk_val")
    )
    a = blocks.select(
        "chunk_id", "chunk_val",
        F.col("media_id").alias("doc_a"), F.col("ahash").alias("h_a"),
    )
    b = blocks.select(
        "chunk_id", "chunk_val",
        F.col("media_id").alias("doc_b"), F.col("ahash").alias("h_b"),
    )
    return (
        a.join(b, ["chunk_id", "chunk_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
