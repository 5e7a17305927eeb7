"""Deterministic embedding fixtures with planted cosine near-duplicates.

Reference analog: the synthetic vector generators — unit-norm cluster
centers plus sigma-scaled noise with known ground truth
(/root/reference/src/shared/forest_insights.py:11-50,
test_forest_vote.py:45-107). Here the planted truth is a set of
(base, perturbed) pairs at a controlled cosine, so the embedding-near-dup
operator gets a recall gate exactly like the text pipeline's planted-dup
corpus (sources/pages.py).

Fully distributed and partition-independent: every vector depends only on
(seed, vec_id), generated per-row inside ``mapInPandas``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        # ground truth: the base vec_id this one was perturbed from
        # (planted near-dup), or -1 for independent vectors
        T.StructField("dup_of", T.LongType(), False),
    ]
)


def _unit(v: np.ndarray) -> np.ndarray:
    return v / np.linalg.norm(v)


def generate_embeddings(
    spark: SparkSession,
    n_base: int = 400,
    n_dup_pairs: int = 40,
    dim: int = 64,
    noise: float = 0.1,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """``n_base`` independent unit vectors (vec_id 0..n_base-1) plus
    ``n_dup_pairs`` perturbed copies: vec n_base+j = unit(base_j + noise*g).
    Expected cosine(base, copy) ~ 1/sqrt(1+noise^2) (~0.995 at noise=0.1),
    well above any random pair (~N(0, 1/sqrt(dim)))."""

    def base_vec(j: int) -> np.ndarray:
        rng = np.random.RandomState(seed * 1_000_003 + j)
        return _unit(rng.standard_normal(dim))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid in pdf["id"]:
                vid = int(vid)
                if vid < n_base:
                    v, dup_of = base_vec(vid), -1
                else:
                    j = vid - n_base
                    g = np.random.RandomState(seed * 7_000_003 + vid).standard_normal(dim)
                    v, dup_of = _unit(base_vec(j) + noise * _unit(g)), j
                rows.append(
                    {
                        "vec_id": vid,
                        "embedding": v.astype(np.float32),
                        "dup_of": dup_of,
                    }
                )
            yield pd.DataFrame(rows)

    rng_df = spark.range(n_base + n_dup_pairs, numPartitions=partitions)
    return rng_df.mapInPandas(gen, schema=EMB_SCHEMA)
