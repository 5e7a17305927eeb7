"""Candidate-pair generation strategies + connected components."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lsh_forest_for_multi_vector_retrieval_spark.config import DedupConfig
from lsh_forest_for_multi_vector_retrieval_spark.operators.bands import (
    adaptive_band_table,
    band_table,
    bucket_stats,
    with_signatures,
)
from lsh_forest_for_multi_vector_retrieval_spark.operators.components import (
    connected_components,
)
from lsh_forest_for_multi_vector_retrieval_spark.operators.pairs import (
    candidate_pairs,
    self_join_candidate_pairs,
)
from lsh_forest_for_multi_vector_retrieval_spark.operators.verify import (
    verify_pairs,
    verify_pairs_pandas,
)
from lsh_forest_for_multi_vector_retrieval_spark.sources.pages import generate_pages

CFG = DedupConfig()


@pytest.fixture(scope="module")
def sigs(spark):
    pages = generate_pages(spark, n_clusters=15, cluster_size=3, n_singletons=60)
    s = with_signatures(pages.select("doc_id", "text"), CFG).select(
        "doc_id", "shingles", "sig", "simhash"
    ).persist()
    s.count()
    return s


def test_grouped_and_selfjoin_pairs_agree(sigs):
    bands = band_table(sigs, CFG)
    p1 = candidate_pairs(bands, CFG)
    p2 = self_join_candidate_pairs(bands, CFG)
    assert p1.exceptAll(p2).count() == 0
    assert p2.exceptAll(p1).count() == 0


def test_pairs_are_canonical_and_distinct(sigs):
    pairs = candidate_pairs(band_table(sigs, CFG), CFG)
    assert pairs.where(F.col("doc_a") >= F.col("doc_b")).count() == 0
    assert pairs.count() == pairs.distinct().count()


def test_band_count_invariant(sigs):
    # every non-empty doc contributes exactly num_bands rows (F6/M8
    # row-count-conservation analog)
    bands = band_table(sigs, CFG)
    n_docs = sigs.where(F.size("shingles") > 0).count()
    assert bands.count() == n_docs * CFG.num_bands
    per_doc = bands.groupBy("doc_id").count().select(F.collect_set("count")).first()[0]
    assert per_doc == [CFG.num_bands]


def test_verify_prune_broadcast_gate(sigs):
    """Round-5 review: the verify prune's explicit broadcast is
    count-gated (verify_prune_max_ids) — on duplicate-dense corpora the
    forced hint would push a multi-GB hash relation past the broadcast
    threshold. A zero cap exercises the shuffle-semi-join fallback and
    must return byte-identical verified pairs; materialize_pairs=False
    (the parquet-backed pipeline path) must too."""
    from dataclasses import replace

    pairs = candidate_pairs(band_table(sigs, CFG), CFG)
    v_bc = verify_pairs(pairs, sigs, CFG)
    v_sh = verify_pairs(pairs, sigs, replace(CFG, verify_prune_max_ids=0))
    assert v_bc.exceptAll(v_sh).count() == 0
    assert v_sh.exceptAll(v_bc).count() == 0
    v_nm = verify_pairs(pairs, sigs, CFG, materialize_pairs=False)
    assert v_bc.exceptAll(v_nm).count() == 0
    assert v_nm.exceptAll(v_bc).count() == 0


def test_verify_native_and_pandas_agree(sigs):
    pairs = candidate_pairs(band_table(sigs, CFG), CFG)
    v1 = verify_pairs(pairs, sigs, CFG).select("doc_a", "doc_b", "jaccard")
    v2 = verify_pairs_pandas(pairs, sigs, CFG).select("doc_a", "doc_b", "jaccard")
    assert v1.exceptAll(v2).count() == 0
    assert v2.exceptAll(v1).count() == 0


def test_verify_parity_holds_with_simhash_prefilter(sigs):
    """Round-5 review: the two verify implementations must agree under
    EVERY config — the pandas path used to skip the SimHash prefilter,
    silently returning a superset whenever the prefilter was enabled."""
    from dataclasses import replace

    cfg = replace(CFG, simhash_prefilter_max_hamming=3)
    pairs = candidate_pairs(band_table(sigs, CFG), CFG)
    v1 = verify_pairs(pairs, sigs, cfg).select("doc_a", "doc_b", "jaccard")
    v2 = verify_pairs_pandas(pairs, sigs, cfg).select(
        "doc_a", "doc_b", "jaccard"
    )
    assert v1.exceptAll(v2).count() == 0
    assert v2.exceptAll(v1).count() == 0
    # the prefilter must actually bite on this fixture (else the test
    # proves nothing): some candidate pair exceeds hamming 3
    loose = verify_pairs(
        pairs, sigs, replace(cfg, simhash_prefilter_max_hamming=None),
        keep_below_threshold=True,
    ).count()
    tight = verify_pairs(
        pairs, sigs, cfg, keep_below_threshold=True
    ).count()
    assert tight < loose


def test_verify_pandas_null_shingles_fold_like_jvm(spark):
    """Round-5 review: a NULL shingle array folds to jaccard 0.0 in the
    JVM path; the pandas path used to crash on np.asarray(None)."""
    docs = spark.createDataFrame(
        [(1, [1, 2, 3]), (2, None), (3, None)],
        "doc_id long, shingles array<long>",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_a long, doc_b long"
    )
    jvm = verify_pairs(pairs, docs, CFG, keep_below_threshold=True)
    got_jvm = {(r.doc_a, r.doc_b): r.jaccard for r in jvm.collect()}
    assert got_jvm == {(1, 2): 0.0, (2, 3): 0.0}
    pd_out = verify_pairs_pandas(pairs, docs, CFG)
    # threshold filters the 0.0 rows; the stage must not crash
    assert pd_out.count() == 0


def test_verify_prune_rescues_dup_dense_broadcast(sigs):
    """Round-5 review: when 2*|pairs| exceeds the cap but the DISTINCT
    id set fits, the prune must still broadcast (exact-count rescue)
    instead of falling back to a shuffle semi-join — and the result is
    identical either way."""
    from dataclasses import replace

    pairs = candidate_pairs(band_table(sigs, CFG), CFG)
    n_pairs = pairs.count()
    n_ids = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .count()
    )
    assert 2 * n_pairs > n_ids  # the rescue regime exists on this fixture
    cfg = replace(CFG, verify_prune_max_ids=n_ids)  # bound fails, exact fits
    v = verify_pairs(pairs, sigs, cfg)
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastQueryStage" in plan
    base = verify_pairs(pairs, sigs, CFG)
    assert base.exceptAll(v).count() == 0
    assert v.exceptAll(base).count() == 0


def test_adaptive_bands_cover_same_docs(spark, sigs):
    small_cfg = DedupConfig(adaptive_max_bucket=2, adaptive_max_extra_rows=3)
    ab = adaptive_band_table(sigs, small_cfg)
    assert ab.select("doc_id").distinct().count() == sigs.where(
        F.size("shingles") > 0
    ).count()
    # depth only grows
    assert ab.where(F.col("depth") < small_cfg.rows_per_band).count() == 0
    # diagnostics table runs
    assert bucket_stats(ab).count() > 0


def test_connected_components_known_graph(spark):
    # components: {1,2,3,4}, {10,11}, isolated {20}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    vertices = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 20]], "doc_id long"
    )
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(edges, vertices).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_long_chain(spark):
    # a 30-node path exercises multi-round convergence + lineage truncation
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "doc_a long, doc_b long"
    )
    got = connected_components(edges)
    assert got.select("cluster_id").distinct().count() == 1
    assert got.count() == 31
    assert got.agg(F.min("cluster_id")).first()[0] == 0


def test_connected_components_paths_agree(spark):
    # the size-gated driver union-find and the distributed hash-min loop
    # must produce the identical labeling (cluster_id = component min) on a
    # graph with chains, merges, duplicate + reversed edges, and self-loops
    import random

    rng = random.Random(7)
    edges_py = [(i, i + 1) for i in range(0, 40, 2)]          # 20 two-node comps
    edges_py += [(100 + i, 100 + i + 1) for i in range(15)]   # one 16-node chain
    edges_py += [(rng.randrange(200, 230), rng.randrange(200, 230)) for _ in range(40)]
    edges_py += [(b, a) for a, b in edges_py[:10]] + [(300, 300)]
    edges = spark.createDataFrame(edges_py, "doc_a long, doc_b long")
    driver = connected_components(edges)  # gate: tiny -> union-find
    for algo in ("star", "hashmin"):
        dist = connected_components(
            edges, driver_max_edges=0, algorithm=algo
        )  # forced distributed loop
        assert driver.exceptAll(dist).count() == 0, algo
        assert dist.exceptAll(driver).count() == 0, algo


def test_star_contraction_is_diameter_robust(spark):
    # a 2,000-vertex path has diameter 2,000: hash-min would need 2,000
    # rounds, the star contraction must finish in O(log^2 n) — and still
    # label every vertex with the component min (round-2 VERDICT #4; the
    # >=1M-edge artifact is tools/cc_stress.py -> CC_STRESS.json)
    n = 2000
    edges = (
        spark.range(n - 1)
        .selectExpr("id as doc_a", "id + 1 as doc_b")
    )
    stats = {}
    got = connected_components(
        edges, driver_max_edges=0, algorithm="star", stats=stats
    )
    assert stats["strategy"] == "star"
    assert stats["rounds"] <= 25, stats
    assert got.count() == n
    assert got.select("cluster_id").distinct().count() == 1
    assert got.agg(F.min("cluster_id")).first()[0] == 0
    assert got.where(F.col("cluster_id") != 0).count() == 0


def test_bucket_drop_stats_clamps_negative_star_skips(spark):
    """bucket_pivots > max_bucket_docs is a legal config (pure
    clique-truncate arm); kept - pivots goes negative and must clamp to a
    0 skip count, not square into a bogus positive (round-3 ADVICE)."""
    from lsh_forest_for_multi_vector_retrieval_spark.operators.pairs import (
        bucket_drop_stats,
    )

    rows = [(0, 7, d) for d in range(30)]  # one 30-doc bucket
    bands = spark.createDataFrame(
        rows, "band_id int, band_hash long, doc_id long"
    )
    cfg = DedupConfig(max_bucket_docs=16, bucket_pivots=10**6)
    got = bucket_drop_stats(bands, cfg).collect()
    # bucket_n=30 <= bucket_pivots but > max_bucket_docs: the cap drops 14
    # docs, so the ledger MUST show a row (round-4 ADVICE: filtering on
    # pivots alone silently hid this drop); star skip clamps to 0
    assert len(got) == 1
    assert got[0].dropped_docs == 14
    assert got[0].starred_pairs_skipped == 0
    cfg2 = DedupConfig(max_bucket_docs=16, bucket_pivots=20)
    got2 = bucket_drop_stats(bands, cfg2).collect()
    assert len(got2) == 1
    assert got2[0].dropped_docs == 14
    assert got2[0].starred_pairs_skipped == 0  # kept=16 < pivots=20 -> clamp


def test_default_adaptive_config_reserves_fresh_rows():
    """Round-3 VERDICT #5: the DEFAULT adaptive path must never wrap a
    deepened key into a neighbor band's base rows — signature_len extends
    the signature with adaptive_reserved_rows fresh permutations."""
    fixed = DedupConfig()
    assert fixed.signature_len == fixed.num_perm == 128
    ad = DedupConfig(use_adaptive_bands=True)
    # 16*8 base + 64 reserved (= num_bands*max_extra, so every band's
    # extras are DISJOINT — round-5 review: the old 32 made bands b and
    # b+8 deepen with identical permutation rows)
    assert ad.signature_len == 192
    # explicit num_perm above base+reserved wins
    big = DedupConfig(use_adaptive_bands=True, num_perm=256)
    assert big.signature_len == 256
    # overlapping reservations are rejected outright; 0 opts into wrap
    with pytest.raises(ValueError, match="overlapping"):
        DedupConfig(use_adaptive_bands=True, adaptive_reserved_rows=32)
    assert DedupConfig(use_adaptive_bands=True, adaptive_reserved_rows=0).signature_len == 128


def test_config_rejects_degenerate_caps():
    """Round-5 review: bucket_pivots=0 would make the star generator emit
    (NULL, doc) pairs via Spark's descending sequence(1, 0); a 1-doc cap
    silently disables pair generation."""
    with pytest.raises(ValueError, match="bucket_pivots"):
        DedupConfig(bucket_pivots=0)
    with pytest.raises(ValueError, match="max_bucket_docs"):
        DedupConfig(max_bucket_docs=1)


def test_star_pair_structs_degenerate_inputs_yield_empty(spark):
    """Round-5 review: 0/1-id arrays and a sub-1 pivot budget must yield
    an EMPTY pair array, never (NULL, doc) rows."""
    from lsh_forest_for_multi_vector_retrieval_spark.operators.pairs import (
        star_pair_structs,
    )

    df = spark.createDataFrame(
        [([],), ([7],), ([1, 2],), ([1, 2, 3],)],
        "ids array<long>",
    )
    for pivots in (0, 1, 64):
        got = df.select(
            F.col("ids"), star_pair_structs(F.col("ids"), pivots).alias("ps")
        ).collect()
        for r in got:
            for p in r.ps:
                assert p.doc_a is not None and p.doc_b is not None, (pivots, r)
            if len(r.ids) <= 1 or pivots < 1:
                assert r.ps == [], (pivots, r)
    # full-clique sanity at pivots=64
    row3 = df.where(F.size("ids") == 3).select(
        star_pair_structs(F.col("ids"), 64).alias("ps")
    ).first()
    assert {(p.doc_a, p.doc_b) for p in row3.ps} == {(1, 2), (1, 3), (2, 3)}


def test_bucket_drop_stats_boundary_bucket_emits_no_row(spark):
    """Round-5 review: a bucket of exactly bucket_pivots+1 docs is a
    complete clique through its pivots (every pair includes a pivot) —
    nothing dropped, nothing skipped, NO ledger row."""
    from lsh_forest_for_multi_vector_retrieval_spark.operators.pairs import (
        bucket_drop_stats,
    )

    cfg = DedupConfig(bucket_pivots=4, max_bucket_docs=100)
    rows = [(0, 7, d) for d in range(5)]  # pivots + 1 docs
    bands = spark.createDataFrame(rows, "band_id int, band_hash long, doc_id long")
    assert bucket_drop_stats(bands, cfg).collect() == []
    # one more doc -> one genuinely skipped pair -> a row appears
    bands6 = spark.createDataFrame(
        rows + [(0, 7, 5)], "band_id int, band_hash long, doc_id long"
    )
    got = bucket_drop_stats(bands6, cfg).collect()
    assert len(got) == 1 and got[0].starred_pairs_skipped == 1
    assert got[0].dropped_docs == 0


def test_default_adaptive_bands_deepen_with_reserved_rows(spark):
    """A mega-bucket corpus under the DEFAULT adaptive config must produce
    deepened rows (depth > rows_per_band) from a 192-row signature."""
    pages = generate_pages(
        spark, n_clusters=1, cluster_size=80, n_singletons=40,
        n_exact_dups=0, doc_len=150, max_mutation=0.01, seed=3,
    ).select("doc_id", "text")
    cfg = DedupConfig(use_adaptive_bands=True, adaptive_max_bucket=16)
    sigs = with_signatures(pages, cfg).select("doc_id", "shingles", "sig")
    assert sigs.select(F.size("sig")).first()[0] == 192
    tbl = adaptive_band_table(sigs, cfg)
    depths = {r.depth for r in tbl.select("depth").distinct().collect()}
    assert cfg.rows_per_band in depths
    assert any(d > cfg.rows_per_band for d in depths), "no deepening happened"
    # every non-empty doc still covered by every band at exactly one depth
    n_docs = sigs.where(F.size("shingles") > 0).count()
    per_band = tbl.groupBy("band_id").agg(F.countDistinct("doc_id").alias("n"))
    assert all(r.n == n_docs for r in per_band.collect())


def test_salted_bucket_cap_equals_unsalted(spark):
    """bucket_ids_capped: the two-stage salted path over a planted
    mega-bucket must return EXACTLY the unsalted answer (the globally
    smallest max_bucket_docs ids per bucket), healthy buckets must be
    untouched, and the pre-shuffle singleton drop must survive."""
    from lsh_forest_for_multi_vector_retrieval_spark.operators.pairs import (
        bucket_ids_capped,
    )

    rows = (
        # hot bucket: 5_000 docs share (0, 0) — above the test threshold
        [(0, 0, d) for d in range(5_000)]
        # healthy buckets: pair + triple + singleton
        + [(1, 7, 10), (1, 7, 11)]
        + [(2, 9, 20), (2, 9, 21), (2, 9, 22)]
        + [(3, 4, 30)]
    )
    bands = spark.createDataFrame(
        rows, "band_id int, band_hash long, doc_id long"
    ).repartition(16)

    kw = dict(key_cols=["band_id", "band_hash"], max_bucket_docs=100)
    salted = {
        (r.band_id, r.band_hash): r.ids
        for r in bucket_ids_capped(bands, salt_partitions=8, **kw).collect()
    }
    unsalted = {
        (r.band_id, r.band_hash): r.ids
        for r in bucket_ids_capped(bands, salt_partitions=1, **kw).collect()
    }
    assert salted == unsalted
    assert salted[(0, 0)] == list(range(100))  # smallest cap ids, sorted
    assert salted[(1, 7)] == [10, 11]
    assert salted[(2, 9)] == [20, 21, 22]
    assert (3, 4) not in salted  # singleton dropped


def test_candidate_pairs_unchanged_by_salting(sigs):
    """The flagship pair set is byte-identical whether the hot-bucket
    salted path is enabled (default) or disabled."""
    bands = band_table(sigs, DedupConfig())
    on = candidate_pairs(bands, DedupConfig(salt_partitions=8))
    off = candidate_pairs(bands, DedupConfig(salt_partitions=0))
    assert on.exceptAll(off).count() == 0
    assert off.exceptAll(on).count() == 0


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 60)),
        min_size=1,
        max_size=120,
    )
)
def test_cc_strategies_match_union_find_oracle(spark, edges_py):
    """Property check on the core clusterer: on arbitrary small graphs
    (self-loops, duplicates, reversed edges, disconnected vertices) all
    three physical strategies — driver union-find, distributed star
    contraction, distributed hash-min — must label every vertex with its
    component MINIMUM, per an independent test-local union-find."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges_py:
        parent[find(a)] = find(b)
    want = {}
    for v in parent:
        want.setdefault(find(v), []).append(v)
    expect = {v: min(vs) for vs in want.values() for v in vs}

    edges = spark.createDataFrame(edges_py, "doc_a long, doc_b long")
    got_driver = {
        r.doc_id: r.cluster_id for r in connected_components(edges).collect()
    }
    assert got_driver == expect
    for algo in ("star", "hashmin"):
        got = {
            r.doc_id: r.cluster_id
            for r in connected_components(
                edges, driver_max_edges=0, algorithm=algo
            ).collect()
        }
        assert got == expect, algo


def test_cc_algorithm_validated_before_size_gate(spark):
    """Round-5 review: a typo'd algorithm used to pass silently whenever
    the small-graph driver path was taken."""
    edges = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    with pytest.raises(ValueError, match="unknown algorithm"):
        connected_components(edges, algorithm="staar")


def test_cc_zero_iterations_warns_not_silently_splits(spark):
    """Round-5 review: hashmin with max_iterations<=0 returned every
    vertex as its own singleton with NO warning (changed stayed 0)."""
    edges = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    with pytest.warns(RuntimeWarning, match="did not converge"):
        connected_components(
            edges, driver_max_edges=0, algorithm="hashmin", max_iterations=0
        ).collect()


def test_cc_stats_contract_on_driver_path(spark):
    """stats receives BOTH strategy and rounds on every path."""
    edges = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    stats: dict = {}
    connected_components(edges, stats=stats).collect()
    assert stats == {"strategy": "driver_union_find", "rounds": 0}


def test_cc_star_converging_at_budget_does_not_warn(spark):
    """Round-5 review: a graph whose contraction stabilizes exactly at
    round max_iterations used to warn spuriously — the fixed point is
    only observable one round later, so the loop runs a +1 detection
    round. A simple path graph converges in very few star rounds; with
    a just-enough budget there must be NO RuntimeWarning."""
    import warnings as w

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "doc_a long, doc_b long"
    )
    # find the exact convergence round first
    stats: dict = {}
    out = connected_components(
        edges, driver_max_edges=0, algorithm="star", stats=stats
    )
    assert {r.cluster_id for r in out.collect()} == {0}
    converge_rounds = stats["rounds"] - 1  # minus the detection round
    with w.catch_warnings():
        w.simplefilter("error", RuntimeWarning)
        out2 = connected_components(
            edges,
            driver_max_edges=0,
            algorithm="star",
            max_iterations=converge_rounds,
        )
        assert {r.cluster_id for r in out2.collect()} == {0}
