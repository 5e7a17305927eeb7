"""Dense-vector scalar functions — JVM-side Column expressions.

Reference analog: the exact-distance layer (Hamming default,
/root/reference/src/shared/lsh_forest.py:86; dot-product distances in the
chamfer notebooks). Dot products over ``array<float>`` columns are
expressed with ``zip_with`` + ``aggregate`` so they run inside
whole-stage codegen; elements are cast to double before multiplying so
the fold is reproducible (same IEEE ops in the same order everywhere).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_col(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    denom = norm_col(a) * norm_col(b)
    return F.when(denom > 0, dot_col(a, b) / denom).otherwise(F.lit(0.0))


def l2_sq_col(a: Column, b: Column) -> Column:
    diffs = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def hamming_col(a: Column, b: Column) -> Column:
    """Hamming distance between packed 64-bit signatures (the reference's
    default dist, lsh_forest.py:86) — one xor + popcount."""
    return F.bit_count(a.bitwiseXOR(b))
