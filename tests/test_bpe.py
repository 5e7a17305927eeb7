"""Corpus-learned BPE tokenizer (training-pipeline token encoding):
hand-computed merges on the canonical Sennrich word table, pure-Python ==
distributed encode equality, determinism at any partitioning, bounded
top_words learning, degenerate inputs."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from lsh_forest_for_multi_vector_retrieval_spark.functions.bpe import (
    END_OF_WORD as EOW,
)
from lsh_forest_for_multi_vector_retrieval_spark.functions.bpe import (
    bpe_encode,
    encode_text,
    encode_word,
    fit_bpe,
    learn_bpe_merges,
    merges_df,
    split_words,
    word_frequencies,
)
from lsh_forest_for_multi_vector_retrieval_spark.sources.pages import (
    generate_pages,
)

# the word table from Sennrich et al. 2016 §3.2
SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_learn_merges_hand_computed():
    merges = learn_bpe_merges(SENNRICH, 4)
    # es: 6+3=9 beats every other pair; then est 9; then est+EOW 9
    # (counts strictly order these); then the 7-7 tie between (l,o) and
    # (o,w) breaks lexicographically to (l,o)
    assert merges == [("e", "s"), ("es", "t"), ("est", EOW), ("l", "o")]
    # input order must not matter
    assert learn_bpe_merges(SENNRICH[::-1], 4) == merges


def test_learn_stops_at_count_one_pairs():
    # every pair unique -> nothing reaches count 2 -> no merges
    assert learn_bpe_merges([("abc", 1), ("xyz", 1)], 10) == []


def test_encode_word_uses_rank_order():
    merges = learn_bpe_merges(SENNRICH, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    # unseen word composed of learned subwords: the canonical example
    assert encode_word("lowest", ranks) == ["low", "est" + EOW]
    # no applicable merges -> raw chars + sentinel
    assert encode_word("qq", {}) == ["q", "q", EOW]


def test_encode_text_lowercases_and_caches():
    merges = learn_bpe_merges(SENNRICH, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    cache: dict = {}
    toks = encode_text("Newest  LOWEST newest", ranks, cache)
    assert toks == ["newest" + EOW, "low", "est" + EOW, "newest" + EOW]
    assert set(cache) == {"newest", "lowest"}
    assert encode_text(None, ranks) == []
    assert encode_text("   ", ranks) == []


def test_fit_bpe_deterministic_across_partitioning(spark):
    docs = generate_pages(spark, n_clusters=20, cluster_size=3,
                          n_singletons=40).select("doc_id", "text")
    m13 = fit_bpe(docs.repartition(13), num_merges=50, top_words=500)
    m1 = fit_bpe(docs.coalesce(1), num_merges=50, top_words=500)
    assert m13 == m1 and len(m13) == 50


def test_fit_bpe_top_words_cap_matches_driver_side(spark):
    docs = generate_pages(spark, n_clusters=5, cluster_size=2,
                          n_singletons=20).select("doc_id", "text")
    top5 = (word_frequencies(docs)
            .orderBy(F.desc("freq"), F.asc("word")).limit(5).collect())
    expected = learn_bpe_merges([(r["word"], r["freq"]) for r in top5], 20)
    assert fit_bpe(docs, num_merges=20, top_words=5) == expected


def test_distributed_encode_equals_pure_python(spark):
    docs = generate_pages(spark, n_clusters=10, cluster_size=3,
                          n_singletons=30).select("doc_id", "text")
    merges = fit_bpe(docs, num_merges=80, top_words=1000)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {r["doc_id"]: r["bpe_tokens"]
           for r in bpe_encode(docs, merges).collect()}
    for r in docs.collect():
        assert got[r["doc_id"]] == encode_text(r["text"], ranks)
    # tokens reassemble the lowercased text exactly (lossless encode)
    for r in docs.collect():
        joined = "".join(got[r["doc_id"]]).replace(EOW, " ").strip()
        assert joined == " ".join(r["text"].lower().split())


def test_degenerate_texts_encode_empty(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, None), (3, "   ")], "doc_id long, text string")
    out = {r["doc_id"]: r["bpe_tokens"]
           for r in bpe_encode(docs, [("a", "b")]).collect()}
    assert out == {1: [], 2: [], 3: []}


def test_merges_df_roundtrip(spark):
    merges = learn_bpe_merges(SENNRICH, 4)
    rows = merges_df(spark, merges).orderBy("rank").collect()
    assert [(r["left"], r["right"]) for r in rows] == merges
    assert [r["rank"] for r in rows] == [0, 1, 2, 3]


def test_learn_rejects_nothing_but_empty_words():
    assert learn_bpe_merges([("", 100)], 5) == []


@pytest.mark.parametrize("word", ["a", "ab"])
def test_encode_short_words(word):
    assert "".join(encode_word(word, {})) == word + EOW


def test_split_words_matches_spark_segmentation(spark):
    """Learn and encode must segment identically: the Python splitter is
    ASCII-whitespace only (Java \\s), NOT str.split()'s Unicode set, and
    both sides strip the sentinel code point from input."""
    tricky = "foo\xa0bar baz\tqux" + EOW + "zap"
    # str.split would split foo\xa0bar into two words — we must not
    assert split_words(tricky) == ["foo\xa0bar", "baz", "quxzap"]
    df = spark.createDataFrame([(tricky,)], "text string")
    spark_words = sorted(
        r["word"] for r in word_frequencies(df).collect()
    )
    assert spark_words == sorted(split_words(tricky))


def test_long_words_encode_in_bounded_chunks():
    """A whitespace-free blob (CJK prose, base64) must not hit the
    O(len^2) encode scan as one giant word."""
    blob = "ab" * 5000  # 10k chars, far over MAX_WORD_LEN
    toks = encode_text(blob, {}, max_word_len=64)
    # every chunk reassembles: strip sentinels and rejoin
    assert "".join(toks).replace(EOW, "") == blob
    # chunking at 64: ceil(10000/64) chunks, each ending in a sentinel
    assert "".join(toks).count(EOW) == (10000 + 63) // 64
    # and the learn side refuses such words entirely
    assert learn_bpe_merges([(blob, 100)], 5) == []


def test_sentinel_cannot_be_forged_by_merges():
    """An HTML-ish corpus whose words contain the literal characters
    < / w > must not learn a symbol that collides with the sentinel."""
    merges = learn_bpe_merges([("a</w>b", 50), ("c</w>d", 49)], 20)
    assert all(left + right != EOW for left, right in merges)
    ranks = {p: i for i, p in enumerate(merges)}
    toks = encode_text("a</w>b c</w>d", ranks)
    # decode by sentinel-split reconstructs the words exactly
    assert "".join(toks).replace(EOW, " ").strip() == "a</w>b c</w>d"
