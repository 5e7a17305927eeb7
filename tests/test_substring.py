"""Long-substring duplicate detection (winnowing) — planted-substring oracle."""

from __future__ import annotations

import numpy as np
import pytest

from lsh_forest_for_multi_vector_retrieval_spark.operators.substring import (
    _rolling_hashes,
    _winnow,
    substring_dup_pairs,
)


def test_rolling_hash_properties():
    h = _rolling_hashes("abcdefabcdef", 4)
    assert len(h) == 9
    # same substring -> same hash (positions 0 and 6 are both 'abcd')
    assert h[0] == h[6]
    assert h[1] == h[7]
    # different substrings differ
    assert h[0] != h[1]
    # shorter than gram -> empty
    assert len(_rolling_hashes("abc", 4)) == 0


def test_winnow_guarantee():
    # windows of size w: any run of >= w hashes contributes its min;
    # identical runs in two docs contribute identical mins
    rng = np.random.RandomState(0)
    shared = rng.randint(0, 2**63, 40).astype(np.uint64)
    a = np.concatenate([rng.randint(0, 2**63, 30).astype(np.uint64), shared])
    b = np.concatenate([shared, rng.randint(0, 2**63, 25).astype(np.uint64)])
    wa, wb = _winnow(a, 16), _winnow(b, 16)
    assert len(np.intersect1d(wa, wb)) > 0


def _mk_text(rng, n):
    return "".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz "), n))


def test_substring_dup_pairs_planted(spark):
    rng = np.random.RandomState(5)
    shared = _mk_text(rng, 120)  # long shared block (>= gram+window-1 = 47)
    docs = [
        (0, _mk_text(rng, 200) + shared + _mk_text(rng, 100)),
        (1, shared + _mk_text(rng, 300)),
        (2, _mk_text(rng, 400)),  # unrelated
        (3, _mk_text(rng, 350) + shared),
        (4, None),  # null text
        (5, "short"),  # below gram size
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = substring_dup_pairs(df, gram=32, window=16)
    pairs = {(r.doc_a, r.doc_b): r.shared_grams for r in got.collect()}
    assert set(pairs) == {(0, 1), (0, 3), (1, 3)}
    # a 120-char shared block has 120-32+1 = 89 shared grams
    for v in pairs.values():
        assert v >= 89


def test_substring_no_false_positives_on_distinct_corpus(spark):
    rng = np.random.RandomState(9)
    docs = [(i, _mk_text(rng, 300)) for i in range(30)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    assert substring_dup_pairs(df, gram=32, window=16).count() == 0


def test_substring_hot_bucket_pivot_star(spark):
    """Boilerplate-footer stress (round-3 VERDICT #2): every doc shares one
    >=47-char footer, so one fingerprint bucket holds all n docs. With
    bucket_pivots=k the candidate set must be O(k*n) (star + pivot
    clique), never C(n,2), while every doc still pairs with the pivots
    (dedup recall for "is X a dup of anything" preserved)."""
    rng = np.random.RandomState(11)
    footer = _mk_text(rng, 60)  # > gram + window - 1 = 47
    n = 40
    docs = [(i, _mk_text(rng, 150) + footer) for i in range(n)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    k = 4
    got = substring_dup_pairs(df, gram=32, window=16, bucket_pivots=k)
    pairs = {(r.doc_a, r.doc_b) for r in got.collect()}
    # every pair involves a pivot (one of the k smallest doc_ids)
    assert all(a < k for a, _ in pairs)
    # every non-pivot doc is connected to every pivot (star complete)
    for pivot in range(k):
        for other in range(pivot + 1, n):
            assert (pivot, other) in pairs
    # star + pivot clique size exactly: k*(n-k) + C(k,2)
    assert len(pairs) == k * (n - k) + k * (k - 1) // 2


def test_substring_drop_stats_ledger(spark):
    from lsh_forest_for_multi_vector_retrieval_spark.operators.substring import (
        fingerprint_drop_stats,
    )

    rng = np.random.RandomState(13)
    footer = _mk_text(rng, 60)
    n = 20
    docs = [(i, _mk_text(rng, 120) + footer) for i in range(n)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    led = fingerprint_drop_stats(
        df, gram=32, window=16, max_bucket_docs=16, bucket_pivots=4
    ).collect()
    assert led, "hot bucket must appear in the ledger"
    hot = max(led, key=lambda r: r.bucket_n)
    assert hot.bucket_n == n
    assert hot.dropped_docs == n - 16  # cap discards 4 docs entirely
    # kept=16, pivots=4 -> C(12,2)=66 member-x-member pairs skipped
    assert hot.starred_pairs_skipped == 66
    # clamp: pivot budget above the cap must not go negative (ADVICE r3),
    # and buckets dropping docs under the cap must STILL get a ledger row
    # even though they are below the pivot budget (round-4 ADVICE)
    led2 = fingerprint_drop_stats(
        df, gram=32, window=16, max_bucket_docs=8, bucket_pivots=10**6
    ).collect()
    assert all(r.starred_pairs_skipped == 0 for r in led2)
    hot2 = max(led2, key=lambda r: r.bucket_n)
    assert hot2.bucket_n == n
    assert hot2.dropped_docs == n - 8
