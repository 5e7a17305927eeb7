from lsh_forest_for_multi_vector_retrieval_spark.functions.shingles import (
    shingle_hashes_col,
    shingle_strings_col,
    tokens_col,
    with_shingle_strings,
    with_shingles,
    with_tokens,
)

__all__ = [
    "shingle_hashes_col",
    "shingle_strings_col",
    "tokens_col",
    "with_shingle_strings",
    "with_shingles",
    "with_tokens",
]
