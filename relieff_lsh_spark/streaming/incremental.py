"""Incremental dedup via Structured Streaming.

The batch pipeline's band-join design is streaming-compatible (SURVEY.md
§2.9): new clips arriving as files are signed, banded, and joined ONLY
against buckets they touch — never a full recluster. This is the streaming
analog of the reference's incremental refine pass (refineGroupedGraph,
ReliefFFeatureSelector.scala:181-187: improve an existing graph with new
comparisons rather than rebuilding it).

Design (per micro-batch, inside foreachBatch — full batch API available):

  1. sign the new clips (same text/audio/substr/exact channels as batch)
  2. append signatures AND their band rows to state tables — bands are
     computed ONCE per clip when it arrives, so per-batch CPU is O(batch),
     not O(history) (round 1 re-banded the full signature history every
     batch)
  3. the bands state is hash-bucketed on band_hash into BUCKETS partition
     directories; each batch statically prunes the state scan to the
     buckets its new keys hash into (file-level pruning — the DataFrame
     filter is on a partition column), then left-semi joins down to the
     exact touched buckets
  4. candidate pairs within touched buckets, keep only pairs with >= 1 new
     endpoint (old-old pairs were emitted by an earlier batch), exact-verify
     against the signatures state PRUNED to the candidate endpoints' id-hash
     buckets (the signatures state is partitioned by pmod(xxhash64(clip_id),
     BUCKETS), mirroring the bands state — without it the verify join scans
     the full signature history every batch, O(history) I/O), append to the
     verified edge table
  5. components are computed on demand from the accumulated edges (label
     propagation is global by nature; clusters stay correct across batches
     because edges are never lost)

Idempotent replays: foreachBatch is at-least-once, so every state write
lands in a `batch_id=N` subdirectory with overwrite mode — a micro-batch
retried after a partial failure rewrites the same paths instead of
duplicating rows (plain appends would multiply signatures through the
verify joins). The stream checkpoint (processed-files log) provides the
resume cursor, same story as the batch SnapshotCatalog.

Known, documented divergence from batch mode under the skew cap: the cap
applies to the bucket's ACCUMULATED size at each batch, so pairs emitted
while a bucket was still small are kept even if the bucket later grows past
the cap (streaming recall >= batch recall on skewed data). Batch mode
evaluates the cap once over the full corpus and drops the whole bucket.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from relieff_lsh_spark.config import DedupConfig
from relieff_lsh_spark.functions.signatures import clip_signatures
from relieff_lsh_spark.operators.banding import (
    audio_bands,
    substr_bands,
    text_bands,
)
from relieff_lsh_spark.operators.candidates import band_candidates
from relieff_lsh_spark.operators.components import ComponentsResult, connected_components
from relieff_lsh_spark.operators.verify import verify_candidates

BUCKETS = 64  # band-hash bucket fanout of the bands state table; at real
#               scale raise this (pruning granularity = state files read
#               per batch) and compact small files periodically


class IncrementalDedup:
    def __init__(self, spark: SparkSession, cfg: DedupConfig, state_dir: str):
        self.spark = spark
        self.cfg = cfg
        self.state_dir = state_dir
        self.sig_path = os.path.join(state_dir, "signatures")
        self.bands_path = os.path.join(state_dir, "bands")
        self.edges_path = os.path.join(state_dir, "verified")
        self.checkpoint = os.path.join(state_dir, "_stream_checkpoint")
        self.batch_stats: list[dict] = []

    # -- state accessors -------------------------------------------------
    def _read_or_none(self, path: str) -> DataFrame | None:
        try:
            return self.spark.read.parquet(path)
        except Exception:
            return None

    def signatures(self) -> DataFrame:
        return self.spark.read.parquet(self.sig_path)

    def bands_state(self) -> DataFrame:
        return self.spark.read.parquet(self.bands_path)

    def verified_edges(self) -> DataFrame:
        df = self._read_or_none(self.edges_path)
        if df is None:
            return self.spark.createDataFrame([], "a string, b string")
        return df.select("a", "b")

    def components(self) -> ComponentsResult:
        vertices = self.signatures().select(F.col("clip_id")).distinct()
        return connected_components(self.verified_edges(), vertices)

    # -- per-batch work ----------------------------------------------------
    def _batch_bands(self, batch: DataFrame, new_sigs: DataFrame) -> DataFrame:
        """All four channels' band rows for the NEW clips only."""
        exact = batch.select(
            "clip_id",
            F.lit("exact").alias("channel"),
            F.lit(0).alias("band_id"),
            F.xxhash64("bytes").alias("band_hash"),
        )
        return (
            text_bands(new_sigs, self.cfg)
            .unionByName(substr_bands(new_sigs))
            .unionByName(audio_bands(new_sigs, self.cfg))
            .unionByName(exact)
            .withColumn(
                "bucket", F.pmod(F.xxhash64("band_hash"), F.lit(BUCKETS))
            )
        )

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        batch = batch.localCheckpoint()
        n_new = batch.count()
        if n_new == 0:
            return
        new_sigs = clip_signatures(batch, self.cfg).localCheckpoint()
        # idempotent state writes: per-batch subdirectory, overwrite mode —
        # an at-least-once replay of this batch rewrites, never duplicates
        new_sigs.withColumn(
            "sig_bucket", F.pmod(F.xxhash64("clip_id"), F.lit(BUCKETS))
        ).write.mode("overwrite").partitionBy("sig_bucket").parquet(
            os.path.join(self.sig_path, f"batch_id={int(batch_id)}")
        )
        new_bands = self._batch_bands(batch, new_sigs).localCheckpoint()
        new_bands.write.mode("overwrite").partitionBy("bucket").parquet(
            os.path.join(self.bands_path, f"batch_id={int(batch_id)}")
        )

        # Buckets the new keys hash into: a static filter on the state
        # table's partition column -> file-level pruning of the scan.
        new_keys = new_bands.select("channel", "band_id", "band_hash", "bucket").distinct()
        hit_buckets = [int(r["bucket"]) for r in new_keys.select("bucket").distinct().collect()]
        pruned = self.bands_state().where(F.col("bucket").isin(hit_buckets))
        touched = pruned.join(
            F.broadcast(new_keys.select("channel", "band_id", "band_hash")),
            ["channel", "band_id", "band_hash"],
            "left_semi",
        ).select("clip_id", "channel", "band_id", "band_hash")
        rows_scanned = touched.count()

        cand, stats = band_candidates(touched, self.cfg)
        # old-old pairs inside touched buckets were found by earlier batches
        new_ids = batch.select("clip_id")
        is_new = F.broadcast(new_ids.withColumn("is_new", F.lit(True)))
        cand = (
            cand.join(is_new.withColumnRenamed("clip_id", "a"), "a", "left")
            .withColumnRenamed("is_new", "a_new")
            .join(is_new.withColumnRenamed("clip_id", "b"), "b", "left")
            .withColumnRenamed("is_new", "b_new")
            .where(F.coalesce("a_new", F.lit(False)) | F.coalesce("b_new", F.lit(False)))
            .select("a", "b", "channels")
        )
        # prune the signature-state scan to the candidate endpoints' id-hash
        # buckets (partition-column filter -> file-level pruning, symmetric
        # with the bands-state prune above)
        cand = cand.localCheckpoint()
        endpoints = cand.select(F.col("a").alias("clip_id")).union(
            cand.select(F.col("b").alias("clip_id"))
        )
        sig_buckets = [
            int(r[0])
            for r in endpoints.select(
                F.pmod(F.xxhash64("clip_id"), F.lit(BUCKETS)).alias("sb")
            ).distinct().collect()
        ]
        sigs_pruned = self.signatures().where(
            F.col("sig_bucket").isin(sig_buckets)
        )
        verified = verify_candidates(cand, sigs_pruned, self.cfg)
        verified.write.mode("overwrite").parquet(
            os.path.join(self.edges_path, f"batch_id={int(batch_id)}")
        )
        self.batch_stats.append({
            "batch_id": int(batch_id),
            "new_clips": int(n_new),
            "bands_rows_joined": int(rows_scanned),
            "buckets_pruned_to": len(hit_buckets),
            "sig_buckets_pruned_to": len(sig_buckets),
            "dropped_buckets": stats.dropped_buckets,
            "salted_buckets": stats.salted_buckets,
        })

    # -- stream wiring -----------------------------------------------------
    def run_available_now(self, input_dir: str, max_files_per_trigger: int = 1):
        """Process every file currently in `input_dir` (then stop), one file
        per micro-batch. Re-running after new files appear resumes from the
        stream checkpoint and processes only the new ones."""
        schema = self.spark.read.parquet(input_dir).schema
        stream = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(input_dir)
        )
        q = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", self.checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q
