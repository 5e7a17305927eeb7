"""Local IR-dataset loaders — the sandbox-honest analog of the reference's
network dataset loads (op L5: HF ``load_dataset`` / BEIR HTTP download +
qrels iteration, /root/reference notebooks plaid.ipynb cells 2+9,
colbertv2_for_wiki_db.ipynb cell 3).

No network in this sandbox, so instead of downloading we read the on-disk
layouts those tools materialize, distributed and schema-declared:

* **BEIR directory** (``load_beir``): ``corpus.jsonl`` (one JSON object
  per line: _id, title, text), ``queries.jsonl`` (_id, text), and
  ``qrels/{split}.tsv`` (tab-separated query-id / corpus-id / score with
  a header row). Schemas are EXPLICIT — at 100 TB a schema-inference
  pre-scan of a jsonl corpus is a full extra pass over the data, so the
  reader never infers. Columns are renamed to the engine's conventions
  (doc_id, query_id, text) so every downstream operator (dedup, ANN,
  forest-vote, metrics) consumes them directly.
* **.npy vector files** (``load_npy_vectors``): the reference's ad-hoc
  ``np.load`` embedding scans, re-expressed as ``spark.read.format
  ("binaryFile")`` + ``mapInPandas`` — each 2-D ``.npy`` file is parsed
  INSIDE a task (``np.load`` over the fetched bytes, never on the
  driver), one file per input split, so a directory of shard files loads
  with per-file parallelism and the driver memory footprint is zero.
  Any numeric 2-D array loads (f4/f8, either byte order, C or Fortran
  layout); pickled object arrays are rejected.

Scale notes: jsonl/tsv reads are splittable line formats (Spark
parallelizes WITHIN a large corpus.jsonl by byte range); ``.npy`` is not
splittable, so shard large embedding dumps into many files — exactly how
they are produced by any batched writer.
"""

from __future__ import annotations

import io
from collections.abc import Iterator
from typing import NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: BEIR corpus.jsonl / queries.jsonl field layouts (beir-cellar datasets).
CORPUS_JSON_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)
QUERIES_JSON_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)
#: qrels tsv columns, declared under the FILE's own header names so the
#: CSV header check passes cleanly; load_beir aliases them to engine
#: conventions (query_id, doc_id, relevance).
QRELS_SCHEMA = T.StructType(
    [
        T.StructField("query-id", T.StringType(), False),
        T.StructField("corpus-id", T.StringType(), False),
        T.StructField("score", T.IntegerType(), False),
    ]
)


class BeirDataset(NamedTuple):
    corpus: DataFrame  # doc_id, title, text
    queries: DataFrame  # query_id, text
    qrels: DataFrame  # query_id, doc_id, relevance


def load_beir(
    spark: SparkSession, path: str, split: str = "test"
) -> BeirDataset:
    """Load a BEIR-format directory into engine-convention DataFrames.

    ``path`` holds ``corpus.jsonl``, ``queries.jsonl`` and
    ``qrels/{split}.tsv``. Reads are schema-declared (no inference scan),
    FAILFAST (a malformed line is a loud error, not a silent all-null
    row that would vanish from doc_id joins) and fully splittable;
    nothing is collected. Null text normalizes to the empty string so
    downstream shingle/token operators see the same degenerate-input
    convention as the synthetic generators."""
    corpus = (
        spark.read.schema(CORPUS_JSON_SCHEMA)
        .option("mode", "FAILFAST")
        .json(f"{path}/corpus.jsonl")
        .select(
            F.col("_id").alias("doc_id"),
            F.coalesce(F.col("title"), F.lit("")).alias("title"),
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
        )
    )
    queries = (
        spark.read.schema(QUERIES_JSON_SCHEMA)
        .option("mode", "FAILFAST")
        .json(f"{path}/queries.jsonl")
        .select(
            F.col("_id").alias("query_id"),
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
        )
    )
    qrels = (
        spark.read.option("header", "true")
        .option("sep", "\t")
        # qrels has no quoting convention — a literal '"' in an id must
        # not trigger CSV quote handling
        .option("quote", "")
        .option("mode", "FAILFAST")
        .schema(QRELS_SCHEMA)
        .csv(f"{path}/qrels/{split}.tsv")
        .select(
            F.col("`query-id`").alias("query_id"),
            F.col("`corpus-id`").alias("doc_id"),
            F.col("score").alias("relevance"),
        )
    )
    return BeirDataset(corpus=corpus, queries=queries, qrels=qrels)


# ---------------------------------------------------------------------------
# .npy distributed reader


def _parse_npy(name: str, data: bytes) -> np.ndarray:
    """Parse one .npy payload to a 2-D float32 array. ``np.load`` over a
    BytesIO runs inside the executor task (nothing touches the driver)
    and handles every header version / byte order / memory layout NumPy
    itself writes; pickled object arrays are refused. Errors carry the
    file name so a bad shard in a 10k-file load is attributable."""
    try:
        arr = np.load(io.BytesIO(data), allow_pickle=False)
    except Exception as e:
        raise ValueError(f"{name}: not a loadable .npy file ({e})") from e
    if arr.ndim != 2:
        raise ValueError(f"{name}: expected 2-D array, got shape {arr.shape}")
    if not np.issubdtype(arr.dtype, np.number):
        raise ValueError(f"{name}: expected numeric dtype, got {arr.dtype}")
    # one vectorized cast (free for native-f4 shards), not per-row astype
    return np.ascontiguousarray(arr.astype(np.float32, copy=False))


NPY_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType(), False),
        T.StructField("row_idx", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    ]
)


def load_npy_vectors(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory (or glob) of 2-D ``.npy`` embedding shards into
    (file, row_idx, embedding) rows — the reference's ``np.load`` scans,
    distributed: ``binaryFile`` gives one task per file, the parse runs in
    ``mapInPandas``, and row ids are (file, index-within-file), stable at
    any partitioning. Join against a sidecar id table (or derive doc ids
    from the shard naming convention) to attach document keys."""
    # pathGlobFilter: shard directories routinely hold sidecars (an id
    # manifest, a README) — only .npy payloads reach the parser
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.npy")
        .load(path)
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for name, blob in zip(pdf["path"], pdf["content"]):
                arr = _parse_npy(name, bytes(blob))
                n = arr.shape[0]
                yield pd.DataFrame(
                    {
                        "file": [name] * n,
                        "row_idx": np.arange(n, dtype=np.int64),
                        "embedding": list(arr),
                    }
                )

    return files.select("path", "content").mapInPandas(
        parse, schema=NPY_ROWS_SCHEMA
    )
