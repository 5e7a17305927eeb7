"""Text-analysis operators: hand-computed fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lsh_forest_for_multi_vector_retrieval_spark.functions.text_stats import (
    FINGERPRINT_MOD,
    doc_fingerprints,
    lang_id_scores,
    quality_features,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat and the dog, in a box."),
            (2, "el perro y el gato en la casa"),
            (3, ""),
            (4, "word"),
        ],
        "doc_id long, text string",
    )


def test_quality_features_hand_computed(docs):
    r = {x.doc_id: x for x in quality_features(docs).collect()}
    # doc 1: tokens = [the,cat,and,the,dog,,in,a,box.] -> 8 tokens
    assert r[1].n_tokens == 8
    assert r[1].n_chars == 30
    assert r[1].n_punct == 2  # ',' and '.'
    assert r[1].punct_ratio == 2 / 30
    # stopwords (en): the, and, the, in, a -> 5
    assert r[1].stopword_ratio == 5 / 8
    assert r[3].n_tokens == 0
    assert r[3].punct_ratio == 0.0
    assert r[4].mean_token_len == 4.0


def test_lang_id(docs):
    r = {x.doc_id: x for x in lang_id_scores(docs).collect()}
    assert r[1].pred_lang == "en"
    assert r[2].pred_lang == "es"
    assert r[3].pred_lang == "unknown"


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "c b a"), (3, "a b c"), (4, "")],
        "doc_id long, text string",
    )
    r = {x.doc_id: x.fingerprint for x in doc_fingerprints(df).collect()}
    assert r[1] == r[3]  # deterministic
    assert r[1] != r[2]  # order-sensitive
    assert r[4] == 0
    # hand-computed: tokens a,b,c ascii 97,98,99 len 1 each
    # fp = 1*(97+1) + 2*(98+1) + 3*(99+1) = 98 + 198 + 300 = 596
    assert r[1] == 596 % FINGERPRINT_MOD == 596


def test_mean_token_len_irregular_spacing(spark):
    """Round-5 review: the mean must be the exact sum of token lengths /
    token count — repeated/leading/trailing spaces used to inflate it
    via the one-separator closed form."""
    df = spark.createDataFrame(
        [(1, "a  b"), (2, " hello "), (3, "x y z")],
        "doc_id long, text string",
    )
    r = {x.doc_id: x for x in quality_features(df).collect()}
    assert r[1].mean_token_len == 1.0  # was (4-1)/2 = 1.5
    assert r[2].mean_token_len == 5.0  # was 7.0
    assert r[3].mean_token_len == 1.0
