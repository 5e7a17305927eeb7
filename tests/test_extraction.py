"""Byte-identical html->text extraction (the input_hint per-row invariant)."""

from __future__ import annotations

from lsh_forest_for_multi_vector_retrieval_spark.functions.extraction import (
    _extract_one,
    extraction_parity_check,
)
from lsh_forest_for_multi_vector_retrieval_spark.sources.pages import generate_pages


def test_extraction_byte_identical_on_corpus(spark):
    pages = generate_pages(spark, n_clusters=10, cluster_size=3, n_singletons=50)
    assert extraction_parity_check(pages) == 0


def test_extract_handles_entities_and_nesting():
    html = b"<html><body><div><p>a &amp; b &lt;c&gt;</p>\n<p>d</p></div></body></html>"
    assert _extract_one(html) == "a & b <c> d"


def test_extract_null():
    assert _extract_one(None) is None


def test_extract_no_body_falls_back_to_whole_doc():
    assert _extract_one(b"<p>hello world</p>") == "hello world"


def test_extraction_inverts_special_chars():
    """Round-5 review: the wrap side must escape exactly what extraction
    unescapes, or text containing '&amp;', '<', '>' breaks the
    extract(html) == text invariant."""
    from lsh_forest_for_multi_vector_retrieval_spark.functions.extraction import (
        _extract_one,
    )
    from lsh_forest_for_multi_vector_retrieval_spark.sources.pages import _wrap_html

    for text in (
        "a &amp; b",          # literal entity string must round-trip
        "x < y and y > z",
        "tom & jerry",
        '"quoted" and it\'s fine',
    ):
        got = _extract_one(_wrap_html(text, "https://e.org/1"))
        assert got == text, (text, got)


def test_extraction_truncated_body():
    """Round-5 review: a record missing </body> must still drop the head
    instead of leaking title text into the extraction."""
    from lsh_forest_for_multi_vector_retrieval_spark.functions.extraction import (
        _extract_one,
    )

    html = b"<html><head><title>https://e.org/7</title></head><body><p>hello world"
    assert _extract_one(html) == "hello world"
