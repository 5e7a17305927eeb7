"""Expected-parquet oracle fixtures stay in sync with the live operators.

tools/make_expected_fixtures.py computes the two deterministic rows-only
driver queries (media_near_dups, winnowed substring_pairs) via an
INDEPENDENT pure-Python brute-force path; the driver's DuckDB oracle
reads the committed parquet. These tests (a) regenerate the expectations
in-memory and compare them to the Spark operators (plumbing cross-check),
and (b) diff the committed fixtures against the regenerated ones, so a
code change that shifts outputs fails HERE before it fails the driver.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd
import pytest
from pyspark.sql import functions as F

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "tools"))

from make_expected_fixtures import (  # noqa: E402
    FIXTURES,
    expected_embedding_near_dups,
    expected_lsh_ann_topk,
    expected_media_near_dups,
    expected_substring_pairs,
)

SF001 = "/root/testdata/sf0.01"


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def media_expected():
    return expected_media_near_dups()


@pytest.fixture(scope="module")
def substring_expected():
    return expected_substring_pairs(SF001)


def test_media_near_dups_matches_bruteforce_expectation(spark, media_expected):
    from lsh_forest_for_multi_vector_retrieval_spark.operators.media import (
        media_near_dup_pairs,
    )
    from lsh_forest_for_multi_vector_retrieval_spark.sources.media import (
        generate_media,
    )

    media = generate_media(spark, n_groups=8, group_size=3, n_singletons=16, seed=7)
    got = _sorted(
        media_near_dup_pairs(media)
        .select("doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming"))
        .toPandas()
    )
    pd.testing.assert_frame_equal(got, _sorted(media_expected), check_dtype=False)


def test_substring_pairs_matches_pure_python_expectation(spark, substring_expected):
    from lsh_forest_for_multi_vector_retrieval_spark.operators.substring import (
        substring_dup_pairs,
    )

    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    got = _sorted(substring_dup_pairs(docs, gram=32, window=16).toPandas())
    pd.testing.assert_frame_equal(
        got, _sorted(substring_expected), check_dtype=False
    )


@pytest.fixture(scope="module")
def ann_expected():
    return expected_lsh_ann_topk(SF001)


def test_lsh_ann_topk_matches_pure_python_expectation(spark, ann_expected):
    """Signatures, chunk blocking, the ensure_k ascend/root-fallback, 6dp
    ranking and n_id tie-break — replicated as plain Python set algebra +
    left-fold cosines — must agree with the distributed plumbing
    bit-for-bit (round-3 VERDICT #4)."""
    import __spark_entry__ as em

    got = (
        em.q_lsh_ann_topk(spark, SF001)
        .toPandas()
        .sort_values(["q_id", "rank"])
        .reset_index(drop=True)
    )
    exp = ann_expected.sort_values(["q_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.fixture(scope="module")
def fv_expected():
    from make_expected_fixtures import expected_forest_vote_topk

    return expected_forest_vote_topk(SF001)


def test_forest_vote_topk_matches_pure_python_expectation(spark, fv_expected):
    """The prefix-node/cap/join/window plumbing vs a dict-arithmetic
    replication of the reference scoring chain (round-3 VERDICT #6)."""
    import __spark_entry__ as em

    got = (
        em.q_forest_vote_topk(spark, SF001)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    exp = fv_expected.sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_forest_vote_topk_stable_across_repartitionings(spark):
    """Determinism audit (round-3 VERDICT #6): the 6dp-rounded top-k must
    not depend on the physical partitioning of the input (cross-partition
    float-sum order is the only nondeterminism candidate; 6dp absorbs it
    on this corpus — this is the evidence the fixture oracle rests on)."""
    import __spark_entry__ as em
    from lsh_forest_for_multi_vector_retrieval_spark.config import DedupConfig

    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    outs = []
    for parts in (1, 3, 17, 32):
        d = docs.repartition(parts) if parts > 1 else docs.coalesce(1)
        # run the same pipeline over a re-laid-out copy via temp view swap
        out = em.forest_vote_pipeline_from(
            d, DedupConfig(hash_family="md5_60"), k=5
        )
        outs.append(
            out.toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
        )
    for other in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], other)


@pytest.fixture(scope="module")
def near_dup_expected():
    return expected_embedding_near_dups(SF001)


def test_embedding_near_dups_matches_pure_python_expectation(
    spark, near_dup_expected
):
    """Seeded hyperplane sigs, chunk-collision blocking, raw-double
    threshold then 6dp rounding — replicated as plain set algebra +
    left-fold cosines — must agree with the distributed
    posexplode/self-join/dropDuplicates plumbing bit-for-bit."""
    import __spark_entry__ as em

    got = _sorted(em.q_embedding_near_dups(spark, SF001).toPandas())
    pd.testing.assert_frame_equal(
        got, _sorted(near_dup_expected), check_dtype=False
    )


@pytest.fixture(scope="module")
def plaid_expected():
    from make_expected_fixtures import expected_plaid_topk

    return expected_plaid_topk(SF001)


def test_plaid_topk_matches_pure_python_expectation(spark, plaid_expected):
    """The crossJoin/window/index-join/ordered-fold-score plumbing vs a
    dict-and-loop emulation of PLAID candidate gen + exact rerank. The
    codebook itself comes from the shared pinned Lloyd kernel (driver-side
    NumPy in both paths; hand-value-tested in test_plaid.py) — what this
    cross-checks is everything DISTRIBUTED downstream of it."""
    import __spark_entry__ as em

    got = (
        em.q_plaid_topk(spark, SF001)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    exp = plaid_expected.sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.fixture(scope="module")
def ivf_expected():
    from make_expected_fixtures import expected_ivf_ann_topk

    return expected_ivf_ann_topk(SF001)


def test_ivf_ann_topk_matches_pure_python_expectation(spark, ivf_expected):
    """The literal-array argmax assignment, top-nprobe probing, cell join,
    ensure_k root fallback and 6dp ranking vs a dict/loop emulation with
    left-fold cosines (codebook from the shared pinned Lloyd kernel)."""
    import __spark_entry__ as em

    got = (
        em.q_ivf_ann_topk(spark, SF001)
        .toPandas()
        .sort_values(["q_id", "rank"])
        .reset_index(drop=True)
    )
    exp = ivf_expected.sort_values(["q_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.fixture(scope="module")
def bpe_vocab_expected():
    from make_expected_fixtures import expected_bpe_vocab

    return expected_bpe_vocab(SF001)


@pytest.fixture(scope="module")
def bpe_stats_expected():
    from make_expected_fixtures import expected_bpe_token_stats

    return expected_bpe_token_stats(SF001)


def test_bpe_vocab_matches_pure_python_expectation(spark, bpe_vocab_expected):
    """The Spark fit (explode/groupBy freq shuffle + bounded orderBy/limit
    collect) must learn the exact merge table the collections.Counter
    pure-Python pass learns."""
    import __spark_entry__ as em

    got = em.q_bpe_vocab(spark, SF001).toPandas().sort_values("rank").reset_index(drop=True)
    exp = bpe_vocab_expected.sort_values("rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_bpe_token_stats_matches_pure_python_expectation(spark, bpe_stats_expected):
    """The Arrow-batched encode UDF (per-batch word memo) must produce the
    exact token sequence per document — md5 digests compare every
    subword, not just counts."""
    import __spark_entry__ as em

    got = (
        em.q_bpe_token_stats(spark, SF001)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = bpe_stats_expected.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_committed_fixtures_are_current(
    media_expected, substring_expected, ann_expected, fv_expected,
    near_dup_expected, plaid_expected, ivf_expected,
    bpe_vocab_expected, bpe_stats_expected,
):
    for name, exp, keys in (
        ("media_near_dups.parquet", media_expected, ["doc_a", "doc_b"]),
        ("substring_pairs_sf0.01.parquet", substring_expected, ["doc_a", "doc_b"]),
        ("lsh_ann_topk_sf0.01.parquet", ann_expected, ["q_id", "rank"]),
        ("forest_vote_topk_sf0.01.parquet", fv_expected, ["query_id", "rank"]),
        ("embedding_near_dups_sf0.01.parquet", near_dup_expected, ["doc_a", "doc_b"]),
        ("plaid_topk_sf0.01.parquet", plaid_expected, ["query_id", "rank"]),
        ("ivf_ann_topk_sf0.01.parquet", ivf_expected, ["q_id", "rank"]),
        ("bpe_vocab_sf0.01.parquet", bpe_vocab_expected, ["rank"]),
        ("bpe_token_stats_sf0.01.parquet", bpe_stats_expected, ["doc_id"]),
    ):
        path = FIXTURES / name
        assert path.exists(), f"missing fixture {path} — run tools/make_expected_fixtures.py"
        pd.testing.assert_frame_equal(
            pd.read_parquet(path).sort_values(keys).reset_index(drop=True),
            exp.sort_values(keys).reset_index(drop=True),
            check_dtype=False,
        )
