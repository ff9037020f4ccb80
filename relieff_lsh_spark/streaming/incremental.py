"""Incremental dedup via Structured Streaming.

The batch pipeline's band-join design is streaming-compatible (SURVEY.md
§2.9): new clips arriving as files are signed, banded, and joined ONLY
against buckets they touch — never a full recluster. This is the streaming
analog of the reference's incremental refine pass (refineGroupedGraph,
ReliefFFeatureSelector.scala:181-187: improve an existing graph with new
comparisons rather than rebuilding it).

Design (per micro-batch, inside foreachBatch — full batch API available):

  1. sign the new clips (same text/audio/substr/exact channels as batch)
  2. append their signatures to the `signatures` state table (parquet)
  3. band ALL known signatures, semi-join to the band keys the new clips
     touch (bucket-local work), generate candidate pairs within those
     buckets, keep only pairs with >= 1 new endpoint (old-old pairs were
     emitted by an earlier batch)
  4. exact-verify and append to the `verified` edge table
  5. components are computed on demand from the accumulated edges (label
     propagation is global by nature; clusters stay correct across batches
     because edges are never lost)

State tables are plain parquet appends — idempotent restarts come from the
stream checkpoint (processed-files log), the same resume story as the batch
SnapshotCatalog.
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


class IncrementalDedup:
    def __init__(self, spark: SparkSession, cfg: DedupConfig, state_dir: str):
        self.spark = spark
        self.cfg = cfg
        self.state_dir = state_dir
        self.sig_path = os.path.join(state_dir, "signatures")
        # exact-channel state: (clip_id, bytes_hash) only — raw bytes are
        # never persisted as stream state (they'd double corpus storage)
        self.hash_path = os.path.join(state_dir, "bytes_hashes")
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

    def verified_edges(self) -> DataFrame:
        df = self._read_or_none(self.edges_path)
        if df is None:
            return self.spark.createDataFrame([], "a string, b string")
        return df.select("a", "b")

    def components(self) -> ComponentsResult:
        vertices = self.signatures().select(F.col("clip_id")).distinct()
        return connected_components(self.verified_edges(), vertices)

    # -- per-batch work ----------------------------------------------------
    def _sign(self, batch: DataFrame) -> DataFrame:
        return clip_signatures(batch, self.cfg)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        batch = batch.localCheckpoint()
        n_new = batch.count()
        if n_new == 0:
            return
        new_sigs = self._sign(batch).localCheckpoint()
        new_sigs.write.mode("append").parquet(self.sig_path)
        batch.select(
            "clip_id", F.xxhash64("bytes").alias("bytes_hash")
        ).write.mode("append").parquet(self.hash_path)

        # Bands of everything seen so far, restricted to buckets the new
        # clips touch (a broadcastable semi-join at typical batch sizes).
        all_sigs = self.signatures()
        exact = self.spark.read.parquet(self.hash_path).select(
            "clip_id",
            F.lit("exact").alias("channel"),
            F.lit(0).alias("band_id"),
            F.col("bytes_hash").alias("band_hash"),
        )
        bands = (
            text_bands(all_sigs, self.cfg)
            .unionByName(substr_bands(all_sigs))
            .unionByName(audio_bands(all_sigs, self.cfg))
            .unionByName(exact)
        )
        new_ids = batch.select("clip_id")
        new_keys = (
            bands.join(F.broadcast(new_ids), "clip_id")
            .select("channel", "band_id", "band_hash")
            .distinct()
        )
        touched = bands.join(
            F.broadcast(new_keys), ["channel", "band_id", "band_hash"], "left_semi"
        )
        cand, stats = band_candidates(touched, self.cfg)
        # old-old pairs inside touched buckets were found by earlier batches
        is_new = F.broadcast(new_ids.withColumn("is_new", F.lit(True)))
        cand = (
            cand.join(is_new.withColumnRenamed("clip_id", "a"), "a", "left")
            .withColumnRenamed("is_new", "a_new")
            .join(is_new.withColumnRenamed("clip_id", "b"), "b", "left")
            .withColumnRenamed("is_new", "b_new")
            .where(F.coalesce("a_new", F.lit(False)) | F.coalesce("b_new", F.lit(False)))
            .select("a", "b", "channels")
        )
        verified = verify_candidates(cand, all_sigs, self.cfg)
        verified.write.mode("append").parquet(self.edges_path)
        self.batch_stats.append({
            "batch_id": int(batch_id),
            "new_clips": int(n_new),
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
