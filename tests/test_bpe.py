"""Corpus-learned BPE tokenizer (training-pipeline token encoding):
hand-computed merges on the canonical Sennrich word table, pure-Python ==
distributed encode equality, determinism at any partitioning, bounded
top_words learning, degenerate inputs."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from lsh_forest_for_multi_vector_retrieval_spark.functions.bpe import (
    bpe_encode,
    encode_text,
    encode_word,
    fit_bpe,
    learn_bpe_merges,
    merges_df,
    word_frequencies,
)
from lsh_forest_for_multi_vector_retrieval_spark.sources.pages import (
    generate_pages,
)

# the word table from Sennrich et al. 2016 §3.2
SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_learn_merges_hand_computed():
    merges = learn_bpe_merges(SENNRICH, 4)
    # es: 6+3=9 beats every other pair; then est 9; then est</w> 9
    # (lexicographic tie-break vs nothing — counts strictly order these);
    # then lo: 5+2=7
    assert merges == [("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")]
    # input order must not matter
    assert learn_bpe_merges(SENNRICH[::-1], 4) == merges


def test_learn_stops_at_count_one_pairs():
    # every pair unique -> nothing reaches count 2 -> no merges
    assert learn_bpe_merges([("abc", 1), ("xyz", 1)], 10) == []


def test_encode_word_uses_rank_order():
    merges = learn_bpe_merges(SENNRICH, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    # unseen word composed of learned subwords: the canonical example
    assert encode_word("lowest", ranks) == ["low", "est</w>"]
    # no applicable merges -> raw chars + sentinel
    assert encode_word("qq", {}) == ["q", "q", "</w>"]


def test_encode_text_lowercases_and_caches():
    merges = learn_bpe_merges(SENNRICH, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    cache: dict = {}
    toks = encode_text("Newest  LOWEST newest", ranks, cache)
    assert toks == ["newest</w>", "low", "est</w>", "newest</w>"]
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
        joined = "".join(got[r["doc_id"]]).replace("</w>", " ").strip()
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
    assert "".join(encode_word(word, {})) == word + "</w>"
