"""PLAID centroid pipeline (reference P2-P4, notebooks/plaid.ipynb cells
5-8): KMeans centroids, inverted index, nprobe/t_cs pruning, centroid
interaction score — gated against brute-force exact chamfer ranking."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lsh_forest_for_multi_vector_retrieval_spark.operators.chamfer import chamfer_scores
from lsh_forest_for_multi_vector_retrieval_spark.operators.metrics import mrr_at_k
from lsh_forest_for_multi_vector_retrieval_spark.operators.plaid import (
    build_centroids,
    centroid_index,
    plaid_topk,
)

N_DOCS = 40
TOKS_PER_DOC = 4
DIM = 32


@pytest.fixture(scope="module")
def doc_vectors(spark):
    # planted multi-vector corpus: each doc's 4 tokens cluster around a
    # doc-specific unit direction (the reference's synthetic doc/vector
    # generator shape, test_forest_vote.py:45-107)
    rows = []
    for d in range(N_DOCS):
        rng = np.random.RandomState(1000 + d)
        center = rng.standard_normal(DIM)
        center /= np.linalg.norm(center)
        for t in range(TOKS_PER_DOC):
            v = center + 0.15 * rng.standard_normal(DIM)
            v /= np.linalg.norm(v)
            rows.append((d, d * TOKS_PER_DOC + t, v.astype(np.float32).tolist()))
    df = spark.createDataFrame(
        rows, "doc_id long, vec_id long, embedding array<float>"
    ).persist()
    df.count()
    return df


@pytest.fixture(scope="module")
def query_vectors(spark, doc_vectors):
    # queries = noisy copies of the tokens of docs 0..7 → planted truth:
    # query q's best doc is q
    pdf = doc_vectors.where(F.col("doc_id") < 8).toPandas()
    rows = []
    for r in pdf.itertuples():
        rng = np.random.RandomState(5000 + r.vec_id)
        v = np.asarray(r.embedding, dtype=np.float64)
        v = v + 0.1 * rng.standard_normal(DIM)
        v /= np.linalg.norm(v)
        rows.append((r.doc_id, r.vec_id, v.astype(np.float32).tolist()))
    return spark.createDataFrame(
        rows, "query_id long, vec_id long, embedding array<float>"
    )


@pytest.fixture(scope="module")
def centroids(doc_vectors):
    # the deterministic codebook: Spark ML KMeans (build_centroids) is
    # seeded but NOT run-deterministic (k-means|| init + float reduce
    # order vary with scheduling), so the strict planted-rank gates below
    # would flake ~1/50 runs on a marginally different codebook; the
    # pinned-Lloyd twin gives the same quality bit-reproducibly. The ML
    # path keeps its own (loose) coverage in test_build_centroids_ml_path.
    from lsh_forest_for_multi_vector_retrieval_spark.operators.plaid import (
        build_centroids_deterministic,
    )

    # no id_col: the xxhash64 sample order spreads the Lloyd init seeds
    # across docs (id order would seed all 12 centroids from docs 0-2)
    return build_centroids_deterministic(doc_vectors, k=12).persist()


def test_build_centroids_ml_path(spark, doc_vectors, query_vectors):
    """The Spark ML KMeans builder (the production-scale P2 path): shape,
    unit normalization, and retrieval quality — gates are deliberately
    loose because ML KMeans is not run-deterministic."""
    cents = build_centroids(doc_vectors, k=12, seed=42)
    rows = cents.collect()
    assert len(rows) == 12
    assert cents.columns == ["centroid_id", "centroid"]
    for r in rows:
        assert np.linalg.norm(r.centroid) == pytest.approx(1.0, abs=1e-6)
    got = plaid_topk(doc_vectors, query_vectors, cents, k=10, nprobe=4, rerank=10)
    top1 = {r.query_id: r.doc_id for r in got.where(F.col("rank") == 1).collect()}
    assert sum(1 for q, d in top1.items() if q == d) >= 6, top1


def test_centroid_index_covers_every_doc(doc_vectors, centroids):
    idx = centroid_index(doc_vectors, centroids)
    # every doc appears; centroid ids are within range
    assert idx.select("doc_id").distinct().count() == N_DOCS
    cids = {r.centroid_id for r in idx.select("centroid_id").distinct().collect()}
    assert cids <= set(range(12))
    # a doc has at most TOKS_PER_DOC distinct centroids
    mx = idx.groupBy("doc_id").count().agg(F.max("count")).first()[0]
    assert mx <= TOKS_PER_DOC


def test_centroid_index_no_crossjoin_and_matches_legacy_plan(
    doc_vectors, centroids
):
    """Round-4 VERDICT #2/Next-#3: assignment must be a literal-codebook
    projection — no |vectors| x k crossJoin row explosion, no window
    shuffle — and bit-identical to the old crossJoin+window plan."""
    from pyspark.sql import Window
    from lsh_forest_for_multi_vector_retrieval_spark.functions.vectors import dot_col

    idx = centroid_index(doc_vectors, centroids)
    plan = idx._jdf.queryExecution().executedPlan().toString()
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "Window"):
        assert bad not in plan, f"{bad} in plan:\n{plan}"
    # the only exchange left is the final distinct's hash aggregate
    assert plan.count("Exchange") <= 1, plan

    # legacy formulation (the pre-round-5 plan) must give identical rows
    scored = doc_vectors.select("doc_id", "embedding").crossJoin(
        F.broadcast(centroids)
    )
    s = dot_col(F.col("embedding"), F.col("centroid"))
    w = Window.partitionBy("doc_id", "embedding").orderBy(
        F.desc("s"), F.asc("centroid_id")
    )
    legacy = (
        scored.select("doc_id", "embedding", "centroid_id", s.alias("s"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("centroid_id", "doc_id")
        .distinct()
    )
    assert idx.exceptAll(legacy).count() == 0
    assert legacy.exceptAll(idx).count() == 0

    # pandas GEMM path agrees (ties are absent in this float data)
    pidx = centroid_index(doc_vectors, centroids, assignment="pandas")
    assert pidx.exceptAll(idx).count() == 0
    assert idx.exceptAll(pidx).count() == 0


def test_centroid_index_sparse_ids(doc_vectors, centroids):
    """A filtered codebook (sparse, non-dense centroid ids) must keep its
    REAL ids in the output: the argmax runs over id-sorted positions and
    maps back through a literal lookup. A monotonic remap preserves the
    lowest-id tie-break, so assignments correspond 1:1 to the dense
    table's."""
    dense = centroid_index(doc_vectors, centroids)
    sparse_cents = centroids.select(
        (F.col("centroid_id") * 3 + 2).alias("centroid_id"), "centroid"
    )
    for mode in ("fold", "pandas"):
        sparse = centroid_index(doc_vectors, sparse_cents, assignment=mode)
        remapped = dense.select(
            (F.col("centroid_id") * 3 + 2).alias("centroid_id"), "doc_id"
        )
        assert sparse.exceptAll(remapped).count() == 0, mode
        assert remapped.exceptAll(sparse).count() == 0, mode


def test_plaid_ranks_planted_doc_first(doc_vectors, query_vectors, centroids):
    # full PLAID: centroid candidates + exact re-rank of the pool
    got = plaid_topk(doc_vectors, query_vectors, centroids, k=10, nprobe=4, rerank=10)
    top1 = {r.query_id: r.doc_id for r in got.where(F.col("rank") == 1).collect()}
    hits = sum(1 for q, d in top1.items() if q == d)
    assert hits == 8, top1  # every planted query ranks its doc #1
    # MRR@10 against the planted qrels (the reference's cell-10 metric)
    rel = query_vectors.select("query_id", F.col("query_id").alias("doc_id")).distinct()
    mrr = mrr_at_k(
        got.select(F.col("query_id").alias("q_id"), F.col("doc_id").alias("n_id"), "rank"),
        rel.select(F.col("query_id").alias("q_id"), F.col("doc_id").alias("n_id")),
        k=10,
    )
    assert mrr >= 0.95, mrr
    # centroid-only scoring (no exact re-rank) is the quantized
    # approximation — it may confuse docs sharing centroids, but must
    # still get most planted queries right. round_digits=6 is required
    # for a strict gate: docs whose tokens map to the SAME centroid set
    # have exactly-equal coarse scores, and without rounding the float
    # sum's reduce order (partitioning-dependent) resolves the tie —
    # observed 5-7 hits across repartitions; rounded ties break by
    # doc_id and the count is stable at 7.
    coarse = plaid_topk(
        doc_vectors, query_vectors, centroids, k=10, nprobe=4, round_digits=6
    )
    ctop1 = {r.query_id: r.doc_id for r in coarse.where(F.col("rank") == 1).collect()}
    assert sum(1 for q, d in ctop1.items() if q == d) >= 6, ctop1


def test_plaid_agrees_with_exact_chamfer_top1(doc_vectors, query_vectors, centroids):
    # with exact re-rank over the centroid pool, PLAID's argmax matches
    # the exact chamfer argmax whenever the true best doc reaches the pool
    got = plaid_topk(doc_vectors, query_vectors, centroids, k=1, nprobe=6, rerank=10)
    plaid_top1 = {r.query_id: r.doc_id for r in got.collect()}
    for q in range(8):
        qv = query_vectors.where(F.col("query_id") == q).select("embedding")
        exact = (
            chamfer_scores(doc_vectors, qv)
            .orderBy(F.desc("chamfer"), F.asc("doc_id"))
            .first()
        )
        assert plaid_top1[q] == exact.doc_id


def test_t_cs_pruning_shrinks_candidates(doc_vectors, query_vectors, centroids):
    # per-token best centroid scores on this fixture: min 0.19 / avg 0.47 /
    # max 0.75 — t_cs=0.3 prunes real mass without blinding the queries
    loose = plaid_topk(doc_vectors, query_vectors, centroids, k=40, nprobe=12, t_cs=-1.0)
    tight = plaid_topk(doc_vectors, query_vectors, centroids, k=40, nprobe=12, t_cs=0.3)
    assert 0 < tight.count() < loose.count()
    # pruning must not evict the planted doc from rank 1 (exact re-rank on)
    tight_rr = plaid_topk(
        doc_vectors, query_vectors, centroids, k=5, nprobe=12, t_cs=0.3, rerank=5
    )
    top1 = {r.query_id: r.doc_id for r in tight_rr.where(F.col("rank") == 1).collect()}
    hits = sum(1 for q, d in top1.items() if q == d)
    assert hits >= 7


def test_train_codebook_hand_values():
    """Hand-computed Lloyd on two planted clusters: init = first 2 distinct
    rows, one iteration moves each centroid to its cluster mean, the fixed
    extra iterations are stationary, normalization divides by the L2 norm.
    This is the shared scalar kernel the plaid_topk expected-parquet
    fixture rests on (tools/make_expected_fixtures.py)."""
    from lsh_forest_for_multi_vector_retrieval_spark.operators.plaid import (
        train_codebook,
    )

    sample = [
        [1.0, 0.0],
        [9.0, 0.0],   # second DISTINCT row -> second init centroid
        [1.0, 0.0],   # duplicate of row 0: skipped at init, counted in mean
        [3.0, 0.0],
        [11.0, 0.0],
    ]
    # cluster A = {1, 1, 3} -> mean (5/3, 0); cluster B = {9, 11} -> (10, 0)
    got = train_codebook(sample, k=2, iters=3, normalize=False, round_digits=None)
    assert got == [[5.0 / 3.0, 0.0], [10.0, 0.0]]
    # normalized + rounded: unit vectors along +x
    got_n = train_codebook(sample, k=2, iters=3, normalize=True, round_digits=6)
    assert got_n == [[1.0, 0.0], [1.0, 0.0]]
    # determinism: byte-identical across calls
    assert got == train_codebook(sample, k=2, iters=3, normalize=False, round_digits=None)


def test_build_centroids_deterministic_matches_kernel(spark, doc_vectors):
    """The Spark-side sample (orderBy id, limit, cast to double) must feed
    the kernel exactly what the fixture's pandas path feeds it."""
    from lsh_forest_for_multi_vector_retrieval_spark.operators.plaid import (
        build_centroids_deterministic,
        train_codebook,
    )

    got = {
        r.centroid_id: r.centroid
        for r in build_centroids_deterministic(
            doc_vectors.repartition(7), k=4, iters=5, id_col="vec_id"
        ).collect()
    }
    rows = (
        doc_vectors.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .orderBy("vec_id")
        .collect()
    )
    exp = train_codebook([r.v for r in rows], k=4, iters=5)
    assert got == {i: c for i, c in enumerate(exp)}


def test_plaid_pandas_scoring_matches_fold(doc_vectors, query_vectors, centroids):
    """Round-5: the Arrow einsum dot (production) must return identical
    ranked rows as the interpreted HOF fold (oracle) at 6dp rounding —
    same contract the ANN family's scoring knob carries."""
    kw = dict(k=10, nprobe=4, rerank=10, round_digits=6)
    a = plaid_topk(doc_vectors, query_vectors, centroids, scoring="fold", **kw)
    b = plaid_topk(doc_vectors, query_vectors, centroids, scoring="pandas", **kw)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert a.count() > 0

    # coarse (centroid-only) path exercises the S_cq kernel alone
    ca = plaid_topk(doc_vectors, query_vectors, centroids, k=5, nprobe=4,
                    round_digits=6, scoring="fold")
    cb = plaid_topk(doc_vectors, query_vectors, centroids, k=5, nprobe=4,
                    round_digits=6, scoring="pandas")
    assert ca.exceptAll(cb).count() == 0 and cb.exceptAll(ca).count() == 0

    with pytest.raises(ValueError):
        plaid_topk(doc_vectors, query_vectors, centroids, scoring="Pandas", **kw)


def test_round6_kernels_degenerate_inputs(spark):
    """Round-6 Arrow kernels must degrade exactly like the relational
    path on dirty data: a NULL token vector is a missing token (skipped
    by the sum, never a task crash), an all-NULL side scores NULL, and
    the per-centroid score vector of a degenerate input vector is an
    array of NULLs (the fold's dot_col is NULL on every such row)."""
    import math

    from pyspark.sql import functions as F

    from lsh_forest_for_multi_vector_retrieval_spark.functions.vectors import (
        centroid_scorevec_pandas_udf,
        chamfer_pair_pandas_udf,
    )

    q = [[1.0, 0.0], [0.0, 2.0]]
    d = [[1.0, 1.0], [3.0, 0.0]]
    rows = [
        # clean: sum over q of max over d of dot = max(1,3) + max(2,0) = 5
        (0, q, d),
        (1, [[1.0, 0.0], None], d),        # null q token skipped -> 3.0
        (2, q, [None, [3.0, 0.0]]),        # null d token ignored -> 3+0
        (3, [None], d),                    # no scoreable q token -> NULL
        (4, q, None),                      # missing doc side -> NULL
        (5, [[1.0]], d),                   # ragged dims -> NULL
    ]
    df = spark.createDataFrame(
        rows, "id long, q array<array<double>>, d array<array<double>>"
    )
    got = {
        r.id: r.s
        for r in df.select(
            "id", chamfer_pair_pandas_udf()(F.col("q"), F.col("d")).alias("s")
        ).collect()
    }
    assert got[0] == 5.0
    assert got[1] == 3.0
    assert got[2] == 3.0
    assert got[3] is None and got[4] is None and got[5] is None

    cents = [[1.0, 0.0], [0.0, 1.0]]
    vdf = spark.createDataFrame(
        [(0, [2.0, 3.0]), (1, None), (2, [1.0])],
        "id long, v array<double>",
    )
    sv = {
        r.id: r.s
        for r in vdf.select(
            "id", centroid_scorevec_pandas_udf(cents)(F.col("v")).alias("s")
        ).collect()
    }
    assert [round(x, 9) for x in sv[0]] == [2.0, 3.0]
    assert list(sv[1]) == [None, None]  # NULL vector -> per-centroid NULLs
    assert list(sv[2]) == [None, None]  # wrong-dim vector -> NULLs

    # non-finite centroids cannot survive a SQL literal — rejected loudly
    import pytest as _pytest

    from lsh_forest_for_multi_vector_retrieval_spark.functions.vectors import (
        _codebook_literal,
    )

    with _pytest.raises(ValueError, match="non-finite"):
        _codebook_literal([[1.0, math.inf]])
