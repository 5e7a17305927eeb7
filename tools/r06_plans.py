"""Capture .explain("formatted") for the round-6 optimization targets.

Writes plans/r06/<query>_<tag>.txt for each touched query. Run once from
the round-start tree with tag=before (e.g. in a `git worktree` of the
baseline commit) and once from the optimized tree with tag=after.

Usage: python tools/r06_plans.py <tag> [query ...]
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

from lsh_forest_for_multi_vector_retrieval_spark import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
# plans are written to the INVOKING tree's plans/r06 even when the module
# runs from a baseline worktree — pass an absolute out dir via argv[2]?
OUT = Path(__file__).resolve().parent.parent / "plans" / "r06"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    tag = sys.argv[1]
    spark = get_spark(
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    import __spark_entry__ as em

    from lsh_forest_for_multi_vector_retrieval_spark.config import DedupConfig
    from lsh_forest_for_multi_vector_retrieval_spark.operators.ann import ivf_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qs = emb.where(F.col("vec_id") < 20)

    def _plaid_pandas():
        # the bench's production-path plaid call shape (pandas kernels)
        from lsh_forest_for_multi_vector_retrieval_spark.operators.plaid import (
            build_centroids_deterministic,
            plaid_topk,
        )

        corpus = emb.where(F.col("vec_id") >= 20).select(
            (F.col("vec_id") / 4).cast("long").alias("doc_id"), "vec_id", "embedding"
        )
        queries = emb.where(F.col("vec_id") < 20).select(
            (F.col("vec_id") / 4).cast("long").alias("query_id"), "vec_id", "embedding"
        )
        cents = build_centroids_deterministic(corpus, k=16, iters=20, id_col="vec_id")
        return plaid_topk(
            corpus, queries, cents, k=10, nprobe=4, t_cs=0.0, rerank=20,
            assignment="pandas", scoring="pandas",
        )

    def _forest_vote_scores():
        # forest_vote_pipeline materializes via localCheckpoint, which
        # collapses explain() to a bare checkpoint scan — capture the
        # UNCHECKPOINTED scoring plan instead (same operators)
        from lsh_forest_for_multi_vector_retrieval_spark.operators.bands import (
            with_signatures,
        )
        from lsh_forest_for_multi_vector_retrieval_spark.operators.forest_vote import (
            forest_vote_scores,
            get_top_k,
        )

        cfg = DedupConfig()
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
        mirrors = d.where(F.col("doc_id") % 31 == 0).select(
            (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"),
            F.substring(
                F.col("text"), 1, F.greatest(F.length("text") - 25, F.lit(40))
            ).alias("text"),
        )
        corpus_sigs = with_signatures(d, cfg).select("doc_id", "shingles", "sig")
        query_sigs = with_signatures(mirrors, cfg).select("doc_id", "shingles", "sig")
        scores = forest_vote_scores(corpus_sigs, query_sigs, cfg)
        return get_top_k(scores.withColumn("score", F.round("score", 6)), k=5)

    from lsh_forest_for_multi_vector_retrieval_spark.operators.ann import lsh_topk

    targets = {
        "plaid_topk": lambda: em.q_plaid_topk(spark, SF_DIR),
        "plaid_topk_pandas": lambda: _plaid_pandas(),
        "forest_vote_scores": lambda: _forest_vote_scores(),
        "lsh_ann_topk": lambda: lsh_topk(
            emb, qs, k=10, dim=64, bits=64, n_chunks=16, ensure_k=True,
            round_digits=6, scoring="pandas",
        ),
        "ivf_ann_topk": lambda: ivf_topk(
            emb, qs, k=10, n_centroids=64, nprobe=8, iters=10,
            ensure_k=True, round_digits=6, assignment="pandas",
            scoring="pandas",
        ),
        "forest_vote_topk": lambda: em.forest_vote_pipeline(
            spark, SF_DIR, DedupConfig(), k=5
        ),
        "ngram_jaccard_exact": lambda: em.q_ngram_jaccard_pairs(spark, SF_DIR),
    }

    wanted = sys.argv[2:] or list(targets)
    OUT.mkdir(parents=True, exist_ok=True)
    for name in wanted:
        df = targets[name]()
        p = OUT / f"{name}_{tag}.txt"
        p.write_text(plan_of(df))
        print(f"wrote {p}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
