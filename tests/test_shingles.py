"""Unit tests for tokenization + shingling (hand-computed fixtures — the
reference's pytest.approx style, notebooks/chamfer_approximation.ipynb
cell 1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lsh_forest_for_multi_vector_retrieval_spark.functions.shingles import (
    shingle_strings_col,
    tokens_col,
    with_shingles,
)


def _strings(spark, text: str, k: int = 5) -> list[str]:
    df = spark.createDataFrame([(text,)], ["text"])
    row = df.select(
        shingle_strings_col(tokens_col(F.col("text")), k).alias("sh")
    ).first()
    return sorted(row.sh)


def test_five_gram_strings(spark):
    text = "a b c d e f g"
    assert _strings(spark, text) == sorted(["a b c d e", "b c d e f", "c d e f g"])


def test_short_doc_single_shingle(spark):
    assert _strings(spark, "a b c") == ["a b c"]


def test_lowercase_and_whitespace_runs(spark):
    assert _strings(spark, "  A   B\tC  ") == ["a b c"]


def test_distinct_shingles(spark):
    # repeated 5-gram appears once (set semantics — the reference's
    # unordered vector bag, lsh_forest.py:154-157)
    text = "x y x y x y x y x y x y"
    got = _strings(spark, text)
    assert len(got) == len(set(got)) == 2  # "x y x y x" and "y x y x y"


def test_with_shingles_empty_and_null(spark):
    df = spark.createDataFrame([(1, ""), (2, None), (3, "a b c d e f")], ["doc_id", "text"])
    out = {r.doc_id: r.shingles for r in with_shingles(df).collect()}
    assert out[1] == []
    assert out[2] == []
    assert len(out[3]) == 2


def test_hash_matches_xxhash_of_string(spark):
    # shingle_hashes == xxhash64(shingle_string) elementwise
    df = spark.createDataFrame([("the quick brown fox jumps over dog",)], ["text"])
    row = (
        with_shingles(df)
        .select(
            "shingles",
            F.transform(
                shingle_strings_col(tokens_col(F.col("text")), 5),
                lambda s: F.xxhash64(s),
            ).alias("expected"),
        )
        .first()
    )
    assert sorted(row.shingles) == sorted(row.expected)


def test_md5_60_hash_family_matches_python_md5(spark):
    # the portable hash family must equal int(md5(s)[:15], 16) — the value
    # DuckDB computes as ('0x'||substr(md5(s),1,15))::BIGINT — so the
    # cross-engine oracle queries are bit-exact
    import hashlib

    from lsh_forest_for_multi_vector_retrieval_spark.functions.shingles import (
        hash64_col,
    )

    vals = ["abc", "hello world", "", "the quick brown"]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    got = {r.s: r.h for r in df.select("s", hash64_col(F.col("s"), "md5_60").alias("h")).collect()}
    for v in vals:
        assert got[v] == int(hashlib.md5(v.encode()).hexdigest()[:15], 16)


def test_md5_60_shingle_pipeline(spark):
    # with_shingles(hash_family="md5_60") hashes each shingle string with
    # the portable family, distinct semantics preserved
    import hashlib

    df = spark.createDataFrame([(1, "a b c d e f g")], ["doc_id", "text"])
    row = with_shingles(df, hash_family="md5_60").first()
    toks = "a b c d e f g".split()
    strs = {" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)}
    expected = sorted(int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in strs)
    assert sorted(row.shingles) == expected
