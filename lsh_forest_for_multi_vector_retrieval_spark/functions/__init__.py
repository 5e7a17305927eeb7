from lsh_forest_for_multi_vector_retrieval_spark.functions.shingles import (
    shingle_hashes_col,
    shingle_strings_col,
    tokens_col,
    with_shingles,
)

__all__ = [
    "shingle_hashes_col",
    "shingle_strings_col",
    "tokens_col",
    "with_shingles",
]
