"""Deterministic Common-Crawl-style ``pages`` corpus with planted
near-duplicate clusters (FIXTURES.md F1; the `input_hint` table shape).

Reference analog: the planted-match corpus — a base document plus
variants at linearly increasing noise, where ground truth is known by
construction (/root/reference/notebooks/chamfer_approx_planted_match.ipynb
cell 2; src/shared/test_forest_vote.py:45-107). Here "noise" is token
mutation at a controlled rate, so expected Jaccard of a variant vs its
base is analytically ~(1-rate*k)-ish and the oracle is brute-force exact
Jaccard computed in the test.

Generation is fully distributed: ``spark.range`` + seeded per-row NumPy
inside ``mapInPandas`` — every row's content depends only on (seed,
doc_id), so the corpus is identical at any parallelism/partitioning
(the two-cluster-size scaling runs see byte-identical input).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

VOCAB = [
    "spark", "query", "data", "table", "join", "filter", "group", "order",
    "window", "stream", "batch", "shuffle", "partition", "cluster", "node",
    "executor", "driver", "memory", "disk", "cache", "scan", "merge", "sort",
    "hash", "index", "key", "value", "row", "column", "schema", "type",
    "string", "number", "array", "struct", "map", "null", "true", "false",
    "select", "insert", "update", "delete", "create", "drop", "alter", "grant",
]

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("true_cluster", T.LongType(), False),
    ]
)

_LANGS = ["en", "en", "en", "es", "de", "fr", "zh"]


def _doc_tokens(rng: np.random.RandomState, n_tokens: int) -> list[str]:
    idx = rng.randint(0, len(VOCAB), size=n_tokens)
    return [VOCAB[i] for i in idx]


def _mutate(
    rng: np.random.RandomState, tokens: list[str], rate: float
) -> list[str]:
    out = list(tokens)
    n_mut = int(round(rate * len(out)))
    pos = rng.choice(len(out), size=min(n_mut, len(out)), replace=False)
    for p in pos:
        out[p] = VOCAB[rng.randint(0, len(VOCAB))]
    return out


def _escape_html(s: str) -> str:
    """Escape exactly what extraction unescapes: '&' FIRST (so literal
    entity-lookalike strings like '&quot;' round-trip byte-exactly), then
    the tag delimiters. Without this, the extract(html) == text invariant
    was one-sided — any text containing '&amp;', '<', or '>' failed it
    (round-5 review)."""
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _wrap_html(text: str, url: str) -> bytes:
    """Deterministic trivial markup; extraction must invert this
    byte-exactly (input_hint per-row invariant — exact for any text whose
    whitespace is already single-space-normalized, which the generator
    guarantees; extraction collapses whitespace runs like any real
    extractor)."""
    return (
        f"<html><head><title>{_escape_html(url)}</title></head>"
        f"<body><p>{_escape_html(text)}</p></body></html>"
    ).encode("utf-8")


def generate_pages(
    spark: SparkSession,
    n_clusters: int = 50,
    cluster_size: int = 4,
    n_singletons: int = 300,
    n_exact_dups: int = 30,
    doc_len: int = 120,
    max_mutation: float = 0.08,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Corpus layout (doc ids dense 0..N-1):

    * ``n_clusters`` planted clusters: a base doc + (cluster_size-1)
      variants at mutation rates ramped ``alpha * max_mutation``
      (the planted_match cell-2 pattern);
    * ``n_exact_dups`` byte-identical copies of cluster bases under
      distinct urls;
    * ``n_singletons`` unrelated docs.

    ``true_cluster`` is the generation-time ground truth.
    """
    if n_exact_dups > 0 and n_clusters <= 0:
        # exact dups are copies of CLUSTER bases — without clusters the
        # executor-side `j % n_clusters` would raise ZeroDivisionError
        # mid-job as an opaque task failure (round-5 review; the repo's
        # upfront-validation convention)
        raise ValueError("n_exact_dups > 0 requires n_clusters >= 1")
    n_total = n_clusters * cluster_size + n_exact_dups + n_singletons
    base_ts = pd.Timestamp("2024-06-01", tz="UTC")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["id"]:
                doc_id = int(doc_id)
                if doc_id < n_clusters * cluster_size:
                    cl = doc_id // cluster_size
                    member = doc_id % cluster_size
                    base_rng = np.random.RandomState(seed * 1_000_003 + cl)
                    toks = _doc_tokens(base_rng, doc_len)
                    if member > 0:
                        mrng = np.random.RandomState(
                            seed * 7_000_003 + doc_id
                        )
                        rate = (member / max(cluster_size - 1, 1)) * max_mutation
                        toks = _mutate(mrng, toks, rate)
                    cluster = cl
                elif doc_id < n_clusters * cluster_size + n_exact_dups:
                    j = doc_id - n_clusters * cluster_size
                    cl = j % n_clusters
                    base_rng = np.random.RandomState(seed * 1_000_003 + cl)
                    toks = _doc_tokens(base_rng, doc_len)
                    cluster = cl
                else:
                    srng = np.random.RandomState(seed * 13_000_003 + doc_id)
                    toks = _doc_tokens(srng, doc_len)
                    cluster = n_clusters + doc_id  # unique singleton label
                text = " ".join(toks)
                url = f"https://example.org/{seed}/{doc_id}"
                rows.append(
                    {
                        "url": url,
                        "warc_ts": base_ts + pd.Timedelta(seconds=doc_id),
                        "html": _wrap_html(text, url),
                        "text": text,
                        "lang": _LANGS[doc_id % len(_LANGS)],
                        "doc_id": doc_id,
                        "true_cluster": cluster,
                    }
                )
            yield pd.DataFrame(rows)

    rng_df = spark.range(n_total, numPartitions=partitions)
    return rng_df.mapInPandas(gen, schema=PAGES_SCHEMA)


def true_dup_pairs_oracle(
    pages_pdf: pd.DataFrame,
    threshold: float = 0.8,
    k: int = 5,
    lowercase: bool = True,
) -> set[tuple[int, int]]:
    """Driver-side brute-force exact-Jaccard oracle for tests (the
    reference's brute_nn pattern, notebooks/lsh_forest.ipynb cell 1).

    NULL/empty/whitespace-only text yields an EMPTY shingle set — the
    engine's convention (with_shingles maps empty text to an empty array
    that is never a candidate), so the oracle cannot fabricate
    Jaccard-1.0 pairs between empty docs or crash on None (round-5
    review). ``lowercase`` mirrors DedupConfig.lowercase — a
    case-folding oracle against a case-sensitive engine reports phantom
    recall regressions (same knob ngram_jaccard_pairs_exact carries)."""

    def shingle_set(text) -> set[str]:
        if text is None:
            return set()
        toks = (text.lower() if lowercase else text).split()
        if not toks:
            return set()
        if len(toks) < k:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    sets = {int(r.doc_id): shingle_set(r.text) for r in pages_pdf.itertuples()}
    ids = sorted(sets)
    out = set()
    for i, a in enumerate(ids):
        sa = sets[a]
        for b in ids[i + 1 :]:
            sb = sets[b]
            inter = len(sa & sb)
            if inter == 0:
                continue
            jac = inter / (len(sa) + len(sb) - inter)
            if jac >= threshold:
                out.add((a, b))
    return out
