"""Incremental dedup over a document stream (Structured Streaming).

The reference is batch-only (SURVEY §2.0: no streaming), but its
*insert* operator (``LSHForest.insert`` threading new vectors into
existing tries, /root/reference/src/shared/lsh_forest.py:66-70) is
exactly the streaming-ingest semantics: new docs join the existing band
index, emit dup pairs against history, and extend the index.

Shape: ``readStream`` (file source) -> signatures -> ``foreachBatch``:
each micro-batch computes band rows, joins them against the persisted
band table (the "trie so far"), verifies collisions exactly, appends
verified pairs + its own band rows. State lives in parquet tables, not
executor memory, so restarts are trivial (checkpointLocation + the table
itself) and the pattern scales to any history size — a normal-sized
micro-batch is BROADCAST against the history (no per-batch history
re-shuffle); an oversized batch (restart over a backlog) falls back to
the shuffle join automatically, and ``maxFilesPerTrigger`` bounds how
much a backlog can deliver per batch in the first place.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lsh_forest_for_multi_vector_retrieval_spark.config import DedupConfig
from lsh_forest_for_multi_vector_retrieval_spark.operators.bands import (
    band_table,
    with_signatures,
)
from lsh_forest_for_multi_vector_retrieval_spark.operators.verify import verify_pairs


def history_collisions(
    new_bands: DataFrame, old_bands: DataFrame, broadcast: bool = True
) -> DataFrame:
    """Candidate pairs of new docs vs history: the micro-batch band rows
    (small, bounded by the trigger) are BROADCAST and the persisted band
    history is PROBED — a broadcast hash join with no Exchange on the
    history side. The previous shuffle join re-partitioned the ENTIRE
    history every micro-batch, a cost that grows without bound with
    stream lifetime (round-4 VERDICT #5). Plan-asserted in
    tests/test_streaming.py. ``broadcast=False`` keeps the shuffle join —
    the caller's escape hatch for an OVERSIZED batch (e.g. a restart over
    an accumulated backlog delivered as one batch), where force-broadcast
    would blow Spark's 8 GB broadcast-table limit; ``process_batch``
    flips it automatically past ``broadcast_max_band_rows``. Pairs are
    canonical (doc_a < doc_b, history ids sort below new ids by arrival);
    caller applies distinct() after unioning with intra-batch pairs.

    Reference analog: incremental insert threading new vectors into an
    EXISTING trie (/root/reference/src/shared/lsh_forest.py:66-70) — the
    trie is probed, not rebuilt."""
    o = old_bands.select(
        "band_id", "band_hash", F.col("doc_id").alias("old_doc")
    )
    n = new_bands.select(
        "band_id", "band_hash", F.col("doc_id").alias("new_doc")
    )
    return (
        o.join(F.broadcast(n) if broadcast else n, ["band_id", "band_hash"])
        .select(
            F.least("old_doc", "new_doc").alias("doc_a"),
            F.greatest("old_doc", "new_doc").alias("doc_b"),
        )
        .where(F.col("doc_a") != F.col("doc_b"))
    )


class IncrementalDedup:
    """File-stream incremental near-dup detection.

    ``state_dir`` holds: ``bands/`` (band rows of all docs seen),
    ``sigs/`` (shingle sets for exact verification), ``pairs/``
    (verified dup pairs, appended per batch), ``_chk/`` (streaming
    checkpoint).
    """

    #: band rows above which the micro-batch is too big to broadcast
    #: against history and the shuffle join is used instead. 2M rows of
    #: (int, long, long) is ~10s of MB serialized — comfortably inside
    #: the broadcast limit; a backlog-restart batch of 10M docs x 16
    #: bands = 160M rows is not.
    BROADCAST_MAX_BAND_ROWS = 2_000_000

    #: DedupConfig fields that determine the persisted hash families: a
    #: store signed under one value of any of these is UNREADABLE (not
    #: wrong — silently collision-free) under another, because new
    #: band_hash values would never equal history's. Checked against a
    #: ``_params.json`` fingerprint in the state dir.
    SIGNATURE_PARAMS = (
        "shingle_size",
        "lowercase",
        "hash_family",
        "num_perm",
        "minhash_seed",
        "num_bands",
        "rows_per_band",
        "simhash_bits",
        "use_adaptive_bands",
        "adaptive_reserved_rows",
    )

    def __init__(
        self,
        state_dir: str,
        cfg: DedupConfig = DedupConfig(),
        broadcast_max_band_rows: int | None = None,
        trust_legacy_state: bool = False,
    ):
        self.state = Path(state_dir)
        self.cfg = cfg
        self.broadcast_max_band_rows = (
            self.BROADCAST_MAX_BAND_ROWS
            if broadcast_max_band_rows is None
            else broadcast_max_band_rows
        )
        self.bands_path = str(self.state / "bands")
        self.sigs_path = str(self.state / "sigs")
        self.pairs_path = str(self.state / "pairs")
        self.chk_path = str(self.state / "_chk")
        self._check_state_params(trust_legacy_state)

    def _check_state_params(self, trust_legacy_state: bool) -> None:
        """Refuse to extend a signature store built under a different
        hash family. A mismatch is not an error Spark can see — new
        band hashes simply never collide with history, so duplicates
        against everything already ingested are SILENTLY missed (pure
        recall loss). Fail at construction instead."""
        want = {k: getattr(self.cfg, k) for k in self.SIGNATURE_PARAMS}
        marker = self.state / "_params.json"
        if marker.exists():
            have = json.loads(marker.read_text())
            diffs = {
                k: (have.get(k), v) for k, v in want.items() if have.get(k) != v
            }
            if diffs:
                raise ValueError(
                    "state_dir was signed under a different hash family: "
                    + ", ".join(
                        f"{k}: stored={s!r} requested={r!r}"
                        for k, (s, r) in sorted(diffs.items())
                    )
                    + ". New batches would never collide with history "
                    "(silent recall loss). Re-sign the store under the new "
                    "config, or use a fresh state_dir."
                )
            return
        if Path(self.bands_path).exists() and not trust_legacy_state:
            raise ValueError(
                f"state_dir {self.state} holds band history but no "
                "_params.json fingerprint (written by an older version). "
                "If it was signed under THIS config, pass "
                "trust_legacy_state=True to stamp and continue; otherwise "
                "re-sign or use a fresh state_dir."
            )
        self.state.mkdir(parents=True, exist_ok=True)
        marker.write_text(json.dumps(want, indent=1, sort_keys=True))

    # -- batch core (reused by foreachBatch) --------------------------------
    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        """Idempotent under foreachBatch's at-least-once delivery: every
        state table is partitioned by ``batch_id`` and written with dynamic
        partition overwrite, so a replayed batch overwrites its own
        partition instead of appending duplicates; history reads exclude
        the current batch_id (a half-written retry partition is invisible).
        """
        spark = batch.sparkSession
        cfg = self.cfg
        sigs = (
            with_signatures(batch.select("doc_id", "text"), cfg)
            .select("doc_id", "shingles", "sig", "simhash")
            .persist()
        )
        new_bands = band_table(sigs, cfg).persist()

        have_history = Path(self.bands_path).exists()
        if have_history:
            old_bands = spark.read.parquet(self.bands_path).where(
                F.col("batch_id") != batch_id
            ).drop("batch_id")
            old_sigs = spark.read.parquet(self.sigs_path).where(
                F.col("batch_id") != batch_id
            ).drop("batch_id")
            # collisions of new docs vs history: micro-batch side broadcast,
            # history probed in place (no per-batch history re-shuffle) —
            # unless the batch itself is oversized (backlog restart), where
            # the shuffle join is the one that survives. count() is free
            # here: new_bands is persisted and consumed below regardless.
            small = new_bands.count() <= self.broadcast_max_band_rows
            hist_hits = history_collisions(
                new_bands, old_bands, broadcast=small
            ).distinct()
            all_sigs = old_sigs.unionByName(sigs)
        else:
            hist_hits = None
            all_sigs = sigs

        # collisions inside the batch itself
        from lsh_forest_for_multi_vector_retrieval_spark.operators.pairs import (
            candidate_pairs,
        )

        intra = candidate_pairs(new_bands, cfg)
        cands = (
            intra if hist_hits is None else intra.unionByName(hist_hits).distinct()
        ).persist()  # verify's candidate prune traverses cands twice
        verified = verify_pairs(cands, all_sigs, cfg)

        def _write(df: DataFrame, path: str) -> None:
            (
                df.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(path)
            )

        _write(verified, self.pairs_path)
        _write(new_bands, self.bands_path)
        _write(sigs, self.sigs_path)
        cands.unpersist(blocking=True)
        sigs.unpersist(blocking=True)
        new_bands.unpersist(blocking=True)

    # -- streaming wiring ----------------------------------------------------
    def start(
        self,
        spark: SparkSession,
        input_dir: str,
        schema: str | None = None,
        max_files_per_trigger: int = 64,
    ):
        # maxFilesPerTrigger bounds what a backlog can deliver per batch:
        # availableNow honors it by draining the backlog as MULTIPLE
        # batches, so a restart over accumulated files never hands
        # process_batch one giant micro-batch (and each batch stays under
        # the broadcast threshold in the common case)
        stream = (
            spark.readStream.schema(schema or "doc_id long, text string")
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(input_dir)
        )
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", self.chk_path)
            .trigger(availableNow=True)
            .start()
        )

    def run_available(self, spark: SparkSession, input_dir: str) -> None:
        q = self.start(spark, input_dir)
        q.awaitTermination()

    def pairs(self, spark: SparkSession) -> DataFrame:
        if not Path(self.pairs_path).exists():
            return spark.createDataFrame([], "doc_a long, doc_b long, jaccard double")
        return spark.read.parquet(self.pairs_path).drop("batch_id")
