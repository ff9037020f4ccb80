"""Fused per-clip signature projection: ONE narrow scan of the corpus
producing every channel's signature columns, no join.

The original design computed text and audio signatures as separate scans
merged with a shuffle join on clip_id; diagnosing the scaling bench showed
that stage spending most of its wall clock outside the actual signature
math (extra corpus scans, the join exchange, and socket traffic for a
second UDF pass). One projection = one scan, `bytes` consumed by the
scalar SimHash UDF at the source and never shuffled (SURVEY.md §4 O10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from relieff_lsh_spark.config import DedupConfig
from relieff_lsh_spark.functions.audio import make_simhash_udf
from relieff_lsh_spark.functions.text import (
    band_hashes_expr,
    make_minhash_udf,
    minimizer_keys_from,
    rotated_band_hashes_expr,
    shingle_hashes_from_tokens,
    token_hashes_expr,
    tokens_expr,
)


def clip_signatures(
    corpus: DataFrame, cfg: DedupConfig, decoders: dict | None = None
) -> DataFrame:
    """corpus -> (clip_id, transcript, shingles, substr_keys, simhash,
    minhash, text_bands, n_shingles). Narrow; bytes dies at the scan.
    `decoders` overrides the audio codec registry (functions/audio.py).

    Tokens are hashed ONCE (xxhash64 per token) in the simhash-UDF stage;
    both k-gram widths (minhash shingles, substring grams) then derive as
    variadic xxhash64 over k token hashes — no shingle STRING is ever
    materialized (measured on the SQL-twin suite: string construction
    dominated the signature wall). Positional arrays are STAGED as
    projection columns on python-UDF stage boundaries, and the
    distinct/minimizer views derive from the materialized columns — inline
    composition re-evaluates the hashing per window element (O(n^2)/row;
    measured 116s of a 165s stage)."""
    minhash_udf = make_minhash_udf(cfg)
    simhash_udf = make_simhash_udf(cfg, decoders)
    staged = corpus.select(
        "clip_id",
        "transcript",
        "codec",
        token_hashes_expr(tokens_expr("transcript")).alias("th"),
        simhash_udf("bytes", "codec").alias("simhash"),
    )
    # `th` is an attribute here (the python-UDF stage above is a physical
    # boundary), so the k references per position stay O(1) reads
    df = staged.select(
        "clip_id",
        "transcript",
        "codec",
        "simhash",
        F.array_distinct(
            shingle_hashes_from_tokens(F.col("th"), cfg.shingle_k)
        ).alias("shingles"),
        shingle_hashes_from_tokens(F.col("th"), cfg.substr_k).alias("pos_sub"),
    )
    df = df.withColumn("minhash", minhash_udf("shingles"))
    # past the second UDF boundary pos_sub is materialized — required by
    # the O(n) window references inside minimizer_keys_from
    df = df.withColumn(
        "substr_keys", minimizer_keys_from(F.col("pos_sub"), cfg.substr_window)
    )
    cols = [
        "clip_id",
        "transcript",
        "codec",
        "shingles",
        "substr_keys",
        "simhash",  # NULL = codec quarantined (no decoder); the clip still
        #             dedups via exact/text/substr channels
        "minhash",
        band_hashes_expr(F.col("minhash"), cfg).alias("text_bands"),
        F.size("shingles").alias("n_shingles"),
    ]
    if cfg.refine_bands:
        # fixed-width rotated-band hashes ((bands-1) x 8 B): banding
        # explodes them and tier-1 verify credits them in the agreement
        # count, without shipping the 1 KB minhash. Only emitted when the
        # refine pass is on — downstream consumers key off the column's
        # presence, so a placeholder would shadow their inline computation.
        cols.insert(-1, rotated_band_hashes_expr(F.col("minhash"), cfg)
                    .alias("text_bands_rot"))
    return df.select(*cols)
