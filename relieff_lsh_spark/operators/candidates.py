"""Candidate-pair generation: the capped, salted band self-join.

This is the core join (SURVEY.md §2.3 J4): points sharing an LSH bucket are
paired, with the `a < b` predicate inside the join condition so the pair
space is halved before anything is materialized (the reference's x<y filter,
ReliefFFeatureSelector.scala:128, pushed into the join per SURVEY.md §4 O2).

Skew policy (SURVEY.md §4 O6/O7 — the maxComparisons analog, R:159/173):
  bucket count <= cap                 : join as-is (salt 0)
  cap < count <= cap * salt_factor    : salt into salt_factor sub-buckets
                                        (per-band salt assignment, so different
                                        bands cut a hot group differently and
                                        transitive closure still links it)
  count > cap * salt_factor           : drop the bucket, COUNT THE DROPS
                                        (no silent truncation)

Scale notes: the bucket-count side table is joined back on the band keys —
the same keys the self-join shuffles on, so AQE reuses the exchange; with
10^12 rows the counts table is still ~|distinct buckets| and never collected.
The explicit repartition on the full join key precedes the self-join
(north_rule requirement).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from relieff_lsh_spark.config import DedupConfig

BUCKET_KEYS = ["channel", "band_id", "band_hash"]


@dataclass
class CandidateStats:
    dropped_buckets: int
    dropped_rows: int
    salted_buckets: int


def band_candidates(
    bands: DataFrame, cfg: DedupConfig, shuffle_partitions: int | None = None
) -> tuple[DataFrame, CandidateStats]:
    """bands -> distinct candidate pairs (a, b, channels: array<string>)."""
    counts = bands.groupBy(*BUCKET_KEYS).agg(F.count("*").alias("bucket_n"))

    cap, factor = cfg.bucket_cap, cfg.salt_factor

    # All skew-policy counters come from ONE action over the aggregated
    # counts relation (|distinct buckets| rows) — never a second pass over
    # the full bands relation.
    hot = F.col("bucket_n") > cap * factor
    warm = (F.col("bucket_n") > cap) & ~hot
    stats_row = counts.agg(
        F.coalesce(F.sum(F.when(hot, F.col("bucket_n"))), F.lit(0)).alias("rows"),
        F.count(F.when(hot, 1)).alias("buckets"),
        F.count(F.when(warm, 1)).alias("salted"),
    ).collect()[0]

    annotated = bands.join(counts, BUCKET_KEYS)
    kept = annotated.where(F.col("bucket_n") <= cap * factor).withColumn(
        "salt",
        F.when(
            F.col("bucket_n") > cap,
            F.pmod(F.xxhash64("clip_id", "band_id", "channel"), F.lit(factor)),
        ).otherwise(F.lit(0)),
    )

    join_keys = BUCKET_KEYS + ["salt"]
    n_part = shuffle_partitions or cfg.shuffle_partitions
    # explicit repartition by the signature-band key ahead of the self-join
    # (north_rule); both join sides inherit this partitioning.
    kept = kept.repartition(n_part, *join_keys)

    a, b = kept.alias("a"), kept.alias("b")
    pairs = (
        a.join(b, join_keys)
        .where(F.col("a.clip_id") < F.col("b.clip_id"))
        .select(
            F.col("a.clip_id").alias("a"),
            F.col("b.clip_id").alias("b"),
            F.col("channel"),
        )
    )
    # collect_set dedups channels and groupBy dedups (a, b) — no separate
    # distinct() pass (it would be a second full shuffle of the pair relation).
    cand = pairs.groupBy("a", "b").agg(F.collect_set("channel").alias("channels"))

    stats = CandidateStats(
        dropped_buckets=int(stats_row["buckets"] or 0),
        dropped_rows=int(stats_row["rows"] or 0),
        salted_buckets=int(stats_row["salted"] or 0),
    )
    return cand, stats
