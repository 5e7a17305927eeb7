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
  INSIDE a task (never on the driver), one file per input split, so a
  directory of shard files loads with per-file parallelism and the driver
  memory footprint is zero. Supports float32/float64, C-order, v1/v2
  headers — the subset NumPy itself writes by default.

Scale notes: jsonl/tsv reads are splittable line formats (Spark
parallelizes WITHIN a large corpus.jsonl by byte range); ``.npy`` is not
splittable, so shard large embedding dumps into many files — exactly how
they are produced by any batched writer.
"""

from __future__ import annotations

import io
import struct
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
    ``qrels/{split}.tsv``. Reads are schema-declared (no inference scan)
    and fully splittable; nothing is collected. Null text normalizes to
    the empty string so downstream shingle/token operators see the same
    degenerate-input convention as the synthetic generators."""
    corpus = (
        spark.read.schema(CORPUS_JSON_SCHEMA)
        .json(f"{path}/corpus.jsonl")
        .select(
            F.col("_id").alias("doc_id"),
            F.coalesce(F.col("title"), F.lit("")).alias("title"),
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
        )
    )
    queries = (
        spark.read.schema(QUERIES_JSON_SCHEMA)
        .json(f"{path}/queries.jsonl")
        .select(
            F.col("_id").alias("query_id"),
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
        )
    )
    qrels = (
        spark.read.option("header", "true")
        .option("sep", "\t")
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


def _parse_npy(name: str, data: bytes) -> tuple[np.ndarray, int]:
    """Parse one 2-D .npy payload (v1/v2 header, C-order float32/64).
    Tiny by design — implemented here so the hot path never round-trips
    through a driver-side np.load of an executor-fetched blob."""
    if data[:6] != b"\x93NUMPY":
        raise ValueError(f"{name}: not a .npy file (bad magic)")
    major = data[6]
    if major == 1:
        (hlen,) = struct.unpack("<H", data[8:10])
        header, off = data[10 : 10 + hlen], 10 + hlen
    elif major == 2:
        (hlen,) = struct.unpack("<I", data[8:12])
        header, off = data[12 : 12 + hlen], 12 + hlen
    else:
        raise ValueError(f"{name}: unsupported .npy version {major}")
    # header is a Python dict literal: {'descr': '<f4', 'fortran_order':
    # False, 'shape': (n, d), }
    import ast

    meta = ast.literal_eval(header.decode("latin1").strip())
    descr, shape = meta["descr"], meta["shape"]
    if meta.get("fortran_order"):
        raise ValueError(f"{name}: fortran_order .npy not supported")
    if len(shape) != 2:
        raise ValueError(f"{name}: expected 2-D array, got shape {shape}")
    if descr not in ("<f4", "<f8"):
        raise ValueError(f"{name}: expected <f4/<f8 dtype, got {descr!r}")
    arr = np.frombuffer(data, dtype=np.dtype(descr), offset=off).reshape(shape)
    return arr, shape[0]


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
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for name, blob in zip(pdf["path"], pdf["content"]):
                arr, n = _parse_npy(name, bytes(blob))
                yield pd.DataFrame(
                    {
                        "file": [name] * n,
                        "row_idx": np.arange(n, dtype=np.int64),
                        "embedding": [
                            row.astype(np.float32) for row in arr
                        ],
                    }
                )

    return files.select("path", "content").mapInPandas(
        parse, schema=NPY_ROWS_SCHEMA
    )
