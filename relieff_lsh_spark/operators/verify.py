"""Exact verification of candidate pairs.

The reference verifies LSH candidates with the *exact* distance inside the
bucket (DistanceProvider passed into computeGraph, reference
ReliefFFeatureSelector.scala:156-165); we do the same with three exact
metrics, all JVM-side expressions (SURVEY.md §2.6 F1):

  hamming  = bit_count(simhash_a XOR simhash_b)        (audio identity)
  jaccard  = |shingles_a ∩ shingles_b| / |union|       (text identity, exact
             over distinct shingle-hash sets — not the MinHash estimate, so
             verification thresholds match the brute-force oracle exactly)
  substr   = word-boundary verbatim containment        (substring channel)

A pair is a duplicate if ANY metric passes its configured threshold.
Signatures are attached with two shuffle equi-joins (the DataFrame form of
the reference's BroadcastLookupProvider, R:124 — broadcast is impossible at
10^12 rows, so the planner's shuffle join on clip_id is the scale-correct
choice; AQE will still broadcast at small SF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from relieff_lsh_spark.config import DedupConfig
from relieff_lsh_spark.functions.distance import hamming64, jaccard_sets, substr_either

VERIFIED_COLS = ["a", "b", "hamming", "jaccard", "substr_hit", "channels"]


def verify_candidates(
    cand: DataFrame, signatures: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """cand(a, b, channels) x signatures(clip_id, simhash, shingles,
    transcript) -> verified pairs with metrics.

    Transcripts are only compared for pairs that arrived via the substr
    channel — containment is meaningless for band-collision pairs and the
    string compare is the most expensive metric.
    """
    # Minimal-column signature attach: only (simhash, shingles) ride the big
    # shuffle. Transcripts are joined ONLY onto the substr-channel subset —
    # shipping every transcript through both signature joins measurably
    # flattened this stage's core scaling at 160k rows.
    sig_a = signatures.select(
        F.col("clip_id").alias("a"),
        F.col("simhash").alias("simhash_a"),
        F.col("shingles").alias("shingles_a"),
    )
    sig_b = signatures.select(
        F.col("clip_id").alias("b"),
        F.col("simhash").alias("simhash_b"),
        F.col("shingles").alias("shingles_b"),
    )
    joined = (
        cand.join(sig_a, "a").join(sig_b, "b")
        .withColumn("hamming", hamming64(F.col("simhash_a"), F.col("simhash_b")))
        .withColumn("jaccard", jaccard_sets(F.col("shingles_a"), F.col("shingles_b")))
    )

    is_substr_cand = F.array_contains(F.col("channels"), F.lit("substr"))
    texts = signatures.select("clip_id", "transcript")
    t_a = texts.select(F.col("clip_id").alias("a"), F.col("transcript").alias("t_a"))
    t_b = texts.select(F.col("clip_id").alias("b"), F.col("transcript").alias("t_b"))
    substr_part = (
        joined.where(is_substr_cand)
        .join(t_a, "a")
        .join(t_b, "b")
        .withColumn("substr_hit", substr_either(F.col("t_a"), F.col("t_b")))
    )
    rest_part = joined.where(~is_substr_cand).withColumn(
        "substr_hit", F.lit(False)
    )
    verified = (
        rest_part.select(*VERIFIED_COLS)
        .unionByName(substr_part.select(*VERIFIED_COLS))
        .where(
            (F.col("hamming") <= cfg.hamming_max)
            | (F.col("jaccard") >= cfg.jaccard_min)
            | F.col("substr_hit")
        )
    )
    return verified
