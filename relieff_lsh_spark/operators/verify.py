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

Two-tier attach (the 100 TB shuffle-budget fix): the first signature join
ships only FIXED-WIDTH columns — simhash (8 B) and the LSH band hashes
(cfg.bands x 8 B) — and computes hamming plus the number of agreeing bands.
Only pairs that could still pass some metric (hamming already passed,
substr channel, or >= cfg.verify_prefilter_min_bands agreeing bands —
counting BOTH primary and, with cfg.refine_bands, rotated band hashes, so
refine-pass collisions keep their credit) join
the unbounded-width shingle arrays for the exact Jaccard — so the dominant
shuffle payload scales with the (small) survivor set, not the full
candidate set. Every OUTPUT row still carries the exact Jaccard: the band
count only prunes, never reports. (Design note: an earlier tier 1 shipped
the full minhash signature, 128 x 8 B — a WORSE payload than typical
shingle arrays and a weaker screen than the band count; see
DedupConfig.verify_prefilter_min_bands for the miss-probability math and
the measured regression that motivated the switch.)

Signatures are attached with shuffle equi-joins (the DataFrame form of the
reference's BroadcastLookupProvider, R:124 — broadcast is impossible at
10^12 rows, so the planner's shuffle join on clip_id is the scale-correct
choice; AQE will still broadcast at small SF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from relieff_lsh_spark.config import DedupConfig
from relieff_lsh_spark.functions.distance import (
    hamming64,
    jaccard_sets,
    minhash_agree_n,
    substr_either,
)

VERIFIED_COLS = ["a", "b", "hamming", "jaccard", "substr_hit", "channels"]


def verify_candidates(
    cand: DataFrame, signatures: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """cand(a, b, channels) x signatures(clip_id, simhash, text_bands,
    shingles, transcript) -> verified pairs with metrics.

    Transcripts are only compared for pairs that arrived via the substr
    channel — containment is meaningless for band-collision pairs and the
    string compare is the most expensive metric.
    """
    # Tier 1: fixed-width signature attach (simhash + band hashes). Shingle
    # arrays and transcripts do NOT ride this join. When the refine pass is
    # on, the rotated band hashes (text_bands_rot, (bands-1) x 8 B) ride too
    # and count toward the agreement — a pair whose ONLY collision is a
    # rotated band starts from 1 agreement like any primary-collision pair,
    # instead of being pruned with certainty (round-3 ADVICE, medium: the
    # primary-only count nullified the refine pass's recall contribution for
    # exactly its target population).
    has_rot = "text_bands_rot" in signatures.columns
    all_bands_col = (
        F.concat(F.col("text_bands"), F.col("text_bands_rot"))
        if has_rot
        else F.col("text_bands")
    )
    n_bands_cols = cfg.bands + (cfg.bands - 1 if has_rot else 0)
    fixed = signatures.select(
        "clip_id", "simhash", all_bands_col.alias("all_bands")
    )
    fx_a = fixed.select(
        F.col("clip_id").alias("a"),
        F.col("simhash").alias("simhash_a"),
        F.col("all_bands").alias("tb_a"),
    )
    fx_b = fixed.select(
        F.col("clip_id").alias("b"),
        F.col("simhash").alias("simhash_b"),
        F.col("all_bands").alias("tb_b"),
    )
    scored = (
        cand.join(fx_a, "a").join(fx_b, "b")
        .withColumn("hamming", hamming64(F.col("simhash_a"), F.col("simhash_b")))
        .withColumn(
            "bands_agree",
            # unrolled fixed-width agreement count (codegen; the HOF fold
            # is CodegenFallback — round-6, functions/distance.py);
            # NULL-safe: a missing signature must not prune (keep)
            F.coalesce(
                minhash_agree_n(F.col("tb_a"), F.col("tb_b"), n_bands_cols),
                F.lit(cfg.bands),
            ),
        )
    )
    is_substr_cand = F.array_contains(F.col("channels"), F.lit("substr"))
    could_pass = (
        F.coalesce(F.col("hamming") <= cfg.hamming_max, F.lit(False))
        | is_substr_cand
        | (F.col("bands_agree") >= F.lit(cfg.verify_prefilter_min_bands))
    )
    kept = scored.where(could_pass).drop("tb_a", "tb_b", "bands_agree")

    # Tier 2: exact Jaccard over shingle arrays, survivors only.
    sh = signatures.select("clip_id", "shingles")
    joined = (
        kept.join(sh.select(F.col("clip_id").alias("a"), F.col("shingles").alias("shingles_a")), "a")
        .join(sh.select(F.col("clip_id").alias("b"), F.col("shingles").alias("shingles_b")), "b")
        .withColumn("jaccard", jaccard_sets(F.col("shingles_a"), F.col("shingles_b")))
    )

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
