"""Stage profile of q_jaccard_verify at a given SF dir (default /dev/shm/sf1x).

Times each stage of the chain separately (each on a fresh computation so
stage walls are independent), then A/Bs the current 4-join verify shape
against a combined 2-join variant that carries mh+sh together. Usage:

    python BENCH/jv_profile.py [sf_dir] [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from relieff_lsh_spark.barrier import barrier
from relieff_lsh_spark.operators import dedup_docs as D
from relieff_lsh_spark.session import get_spark


def timed(fn):
    t0 = time.monotonic()
    out = fn()
    return time.monotonic() - t0, out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/sf1x"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_spark("jv_profile")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs = docs.select("doc_id", "text")
    results: dict[str, list[float]] = {}

    def rec(name, fn):
        t, out = timed(fn)
        results.setdefault(name, []).append(round(t, 3))
        print(f"{name:32s} {t:7.2f}s  {out}", flush=True)

    for _ in range(reps):
        # stage 1: tw barrier only (token md5s)
        rec("tw_only", lambda: barrier(
            D.augmented_docs(docs).select("doc_id", D.token_word_hashes("text").alias("tw"))
        ).count())
        # stage 2: shingles on top (Horner chains + distinct)
        rec("shingled", lambda: barrier(D._shingled(D.augmented_docs(docs))).count())
        # stage 3: full signature (sh + mh fold + bands), eager store
        rec("sig_full", lambda: barrier(D.signature_df(D.augmented_docs(docs))).count())
        # stage 3b: slim signature (mh + bands, no sh kept)
        rec("sig_slim", lambda: barrier(
            D.signature_df(D.augmented_docs(docs), keep_shingles=False)
        ).count())

        # stage 4: candidates + prefilter + verify on a PRE-built eager sig
        sig = barrier(D.signature_df(D.augmented_docs(docs)))
        rec("candidates", lambda: D._candidates_from(sig).count())
        rec("prefiltered", lambda: D._prefiltered(D._candidates_from(sig), sig).count())

        def verify_current():
            cand = D._prefiltered(D._candidates_from(sig), sig)
            sh = sig.select("doc_id", "sh")
            return (
                cand.join(sh.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a")), "a")
                .join(sh.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b")), "b")
                .withColumn("n_int", F.size(F.array_intersect("sh_a", "sh_b")))
                .withColumn("jaccard", F.round(F.col("n_int") / (F.size("sh_a") + F.size("sh_b") - F.col("n_int")), 6))
                .where(F.col("jaccard") >= 0.5)
                .count()
            )
        rec("verify_tail_on_built_sig", verify_current)

        # end-to-end shapes
        rec("e2e_current", lambda: D.q_jaccard_verify(docs).count())

        def e2e_2join():
            sig2 = barrier(D.signature_df(D.augmented_docs(docs)))
            from relieff_lsh_spark.functions.distance import minhash_agree
            cand = D._candidates_from(sig2)
            side = sig2.select("doc_id", "mh", "sh")
            return (
                cand.join(side.select(F.col("doc_id").alias("a"), F.col("mh").alias("mh_a"), F.col("sh").alias("sh_a")), "a")
                .join(side.select(F.col("doc_id").alias("b"), F.col("mh").alias("mh_b"), F.col("sh").alias("sh_b")), "b")
                .where(minhash_agree(F.col("mh_a"), F.col("mh_b")) >= D.PREFILTER_MIN_AGREE)
                .withColumn("n_int", F.size(F.array_intersect("sh_a", "sh_b")))
                .withColumn("jaccard", F.round(F.col("n_int") / (F.size("sh_a") + F.size("sh_b") - F.col("n_int")), 6))
                .where(F.col("jaccard") >= 0.5)
                .count()
            )
        rec("e2e_2join_variant", e2e_2join)

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
