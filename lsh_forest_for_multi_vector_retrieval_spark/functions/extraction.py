"""HTML -> text extraction — vectorized Arrow UDF (no per-row Python API).

The input_hint's per-row invariant: byte-identical extracted text per url.
Our synthetic ``pages.html`` wraps text in deterministic trivial markup
(sources/pages.py:_wrap_html); extraction strips tags and unescapes the
minimal entity set, and a golden test asserts ``extract(html) == text``
byte-for-byte for every row.

Reference analog: the BEIR document preparation step
(/root/reference/src/shared/utils.py:338-488) — the reference decodes and
chunks raw documents before hashing; here the raw form is HTML bytes.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")

_ENTITIES = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"', "&#39;": "'"}
# single-pass unescape: sequential str.replace would double-unescape
# double-escaped input ('&amp;lt;' -> '<' instead of '&lt;')
_ENTITY_RE = re.compile("|".join(re.escape(e) for e in _ENTITIES))


def _extract_one(html: bytes | None) -> str | None:
    if html is None:
        return None
    s = html.decode("utf-8", errors="replace")
    # drop head (title etc.) — body text only; a truncated record with a
    # missing </body> still drops the head (everything after <body...>)
    # instead of silently leaking <title> text into the output (round-5
    # review)
    m = re.search(r"<body[^>]*>(.*?)</body>", s, flags=re.S | re.I) or re.search(
        r"<body[^>]*>(.*)$", s, flags=re.S | re.I
    )
    if m:
        s = m.group(1)
    s = _TAG_RE.sub(" ", s)
    s = _ENTITY_RE.sub(lambda m: _ENTITIES[m.group(0)], s)
    return _WS_RE.sub(" ", s).strip()


@pandas_udf(T.StringType())
def extract_text_udf(html_col: pd.Series) -> pd.Series:
    # pandas .map over the Arrow batch: bulk transfer, regex per value —
    # the regex work is inherently per-string; Arrow batching removes the
    # serialization overhead which is the actual scale hazard.
    return html_col.map(_extract_one)


def with_extracted_text(
    df: DataFrame, html_col: str = "html", out_col: str = "extracted_text"
) -> DataFrame:
    return df.withColumn(out_col, extract_text_udf(F.col(html_col)))


def extraction_parity_check(df, html_col: str = "html", text_col: str = "text") -> int:
    """Rows whose extraction does NOT byte-match the ground-truth text
    column. Must be 0 (input_hint invariant); returned as a count so the
    pipeline can record it as a metrics row."""
    ex = with_extracted_text(df, html_col=html_col, out_col="__ex")
    return ex.where(~F.col("__ex").eqNullSafe(F.col(text_col))).count()
