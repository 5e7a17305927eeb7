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


def test_committed_fixtures_are_current(media_expected, substring_expected):
    for name, exp in (
        ("media_near_dups.parquet", media_expected),
        ("substring_pairs_sf0.01.parquet", substring_expected),
    ):
        path = FIXTURES / name
        assert path.exists(), f"missing fixture {path} — run tools/make_expected_fixtures.py"
        pd.testing.assert_frame_equal(
            _sorted(pd.read_parquet(path)), _sorted(exp), check_dtype=False
        )
