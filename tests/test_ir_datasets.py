"""Local IR-dataset loaders (op L5's sandbox-honest analog): BEIR-layout
directories and .npy embedding shards, loaded distributed with declared
schemas, wired end-to-end into the engine's retrieval + metrics path."""

from __future__ import annotations

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from lsh_forest_for_multi_vector_retrieval_spark.operators.metrics import mrr_at_k
from lsh_forest_for_multi_vector_retrieval_spark.sources.ir_datasets import (
    load_beir,
    load_npy_vectors,
)


@pytest.fixture(scope="module")
def beir_dir(tmp_path_factory):
    """A tiny deterministic BEIR-format dataset: 6 docs, 3 queries, one
    relevant doc per query (each query is a verbatim phrase from its
    relevant doc, so lexical retrieval must rank it first)."""
    root = tmp_path_factory.mktemp("beir_toy")
    docs = [
        ("d1", "Spark", "the quick brown fox jumps over the lazy dog"),
        ("d2", "LSH", "minhash signatures estimate jaccard similarity fast"),
        ("d3", "Dedup", "near duplicate detection over web pages at scale"),
        ("d4", "Filler", "completely unrelated text about cooking pasta"),
        ("d5", "Filler2", "another unrelated document about gardening tips"),
        ("d6", None, None),  # null title/text must normalize, not crash
    ]
    with open(root / "corpus.jsonl", "w") as f:
        for _id, title, text in docs:
            f.write(json.dumps({"_id": _id, "title": title, "text": text}) + "\n")
    queries = [
        ("q1", "quick brown fox"),
        ("q2", "minhash signatures jaccard"),
        ("q3", "near duplicate detection"),
    ]
    with open(root / "queries.jsonl", "w") as f:
        for _id, text in queries:
            f.write(json.dumps({"_id": _id, "text": text}) + "\n")
    (root / "qrels").mkdir()
    with open(root / "qrels" / "test.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for q, d in [("q1", "d1"), ("q2", "d2"), ("q3", "d3")]:
            f.write(f"{q}\t{d}\t1\n")
    return str(root)


def test_load_beir_schemas_and_rows(spark, beir_dir):
    ds = load_beir(spark, beir_dir, split="test")
    assert ds.corpus.columns == ["doc_id", "title", "text"]
    assert ds.queries.columns == ["query_id", "text"]
    assert ds.qrels.columns == ["query_id", "doc_id", "relevance"]
    assert ds.corpus.count() == 6
    assert ds.queries.count() == 3
    assert ds.qrels.count() == 3
    # null text/title normalized to "" (engine degenerate-input convention)
    d6 = ds.corpus.where(F.col("doc_id") == "d6").first()
    assert d6.title == "" and d6.text == ""
    # relevance is a real int, not a string
    assert ds.qrels.schema["relevance"].dataType.simpleString() == "int"


def test_beir_retrieval_mrr_end_to_end(spark, beir_dir):
    """qrels iteration (the reference's eval loop) as a DataFrame job:
    token-overlap retrieval over the corpus, ranked per query, scored
    with mrr_at_k against the qrels table. Every query's relevant doc is
    a verbatim phrase source, so MRR@10 must be exactly 1.0."""
    ds = load_beir(spark, beir_dir, split="test")
    toks = lambda col: F.array_distinct(
        F.filter(F.split(F.lower(F.col(col)), r"\s+"), lambda w: w != F.lit(""))
    )
    corpus = ds.corpus.select("doc_id", toks("text").alias("d_toks"))
    queries = ds.queries.select("query_id", toks("text").alias("q_toks"))
    scored = (
        queries.join(F.broadcast(corpus))
        .select(
            "query_id",
            "doc_id",
            F.size(F.array_intersect("q_toks", "d_toks")).alias("overlap"),
        )
        .where(F.col("overlap") > 0)
    )
    from pyspark.sql import Window

    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.desc("overlap"), F.asc("doc_id")
            )
        ),
    )
    mrr = mrr_at_k(
        ranked, ds.qrels, k=10, query_col="query_id", item_col="doc_id"
    )
    assert mrr == pytest.approx(1.0)


@pytest.fixture(scope="module")
def npy_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("npy_shards")
    rng = np.random.RandomState(7)
    shards = {
        "shard_000.npy": rng.rand(5, 4).astype(np.float32),
        "shard_001.npy": rng.rand(3, 4).astype(np.float64),  # f8 shard
    }
    for name, arr in shards.items():
        np.save(root / name, arr)
    return str(root), shards


def test_load_npy_vectors_values_and_parallelism(spark, npy_dir):
    path, shards = npy_dir
    df = load_npy_vectors(spark, path)
    rows = df.collect()
    assert len(rows) == 8
    by_file: dict[str, list] = {}
    for r in rows:
        by_file.setdefault(r.file.rsplit("/", 1)[-1], []).append(r)
    for name, arr in shards.items():
        got = sorted(by_file[name], key=lambda r: r.row_idx)
        assert [r.row_idx for r in got] == list(range(arr.shape[0]))
        np.testing.assert_allclose(
            np.array([r.embedding for r in got]),
            arr.astype(np.float32),
            rtol=1e-6,
        )


def test_load_npy_rejects_malformed(spark, tmp_path):
    bad = tmp_path / "bad.npy"
    bad.write_bytes(b"not a numpy file at all")
    with pytest.raises(Exception, match="not a loadable"):
        load_npy_vectors(spark, str(bad)).collect()
    truncated = tmp_path / "trunc.npy"
    truncated.write_bytes(b"\x93NUMPY\x01\x00")  # magic ok, header cut
    with pytest.raises(Exception, match="not a loadable"):
        load_npy_vectors(spark, str(truncated)).collect()
    one_d = tmp_path / "one_d.npy"
    np.save(one_d, np.ones(4, dtype=np.float32))
    with pytest.raises(Exception, match="2-D"):
        load_npy_vectors(spark, str(one_d)).collect()


def test_load_npy_accepts_fortran_and_f8(spark, tmp_path):
    arr = np.asfortranarray(
        np.arange(6, dtype=np.float64).reshape(2, 3)
    )
    np.save(tmp_path / "f.npy", arr)
    rows = sorted(
        load_npy_vectors(spark, str(tmp_path)).collect(),
        key=lambda r: r.row_idx,
    )
    np.testing.assert_allclose(
        np.array([r.embedding for r in rows]), arr.astype(np.float32)
    )


def test_load_npy_skips_sidecar_files(spark, tmp_path):
    np.save(tmp_path / "shard.npy", np.ones((2, 2), dtype=np.float32))
    (tmp_path / "ids.txt").write_text("d0\nd1\n")  # sidecar must be ignored
    assert load_npy_vectors(spark, str(tmp_path)).count() == 2


def test_load_beir_failfast_on_corrupt_corpus(spark, beir_dir, tmp_path):
    import shutil

    broken = tmp_path / "broken_beir"
    shutil.copytree(beir_dir, broken)
    with open(broken / "corpus.jsonl", "a") as f:
        f.write("{this is not json\n")
    ds = load_beir(spark, str(broken))
    with pytest.raises(Exception):
        ds.corpus.count()


def test_qrels_quote_char_is_literal(spark, beir_dir, tmp_path):
    import shutil

    root = tmp_path / "quoted_beir"
    shutil.copytree(beir_dir, root)
    with open(root / "qrels" / "test.tsv", "a") as f:
        f.write('q9\td"quoted\t2\n')
    row = (
        load_beir(spark, str(root))
        .qrels.where("query_id = 'q9'")
        .first()
    )
    assert row.doc_id == 'd"quoted' and row.relevance == 2
