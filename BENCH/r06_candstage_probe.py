#!/usr/bin/env python
"""Round-6 A/B: eager vs lazy localCheckpoint of the annotated band
relation in band_candidates (the stats collect is the first action either
way, so lazy folds the store into it — one fewer job per candidates
stage). Interleaved full DedupPipeline runs on the bench corpus; records
per-stage seconds. Writes BENCH/r06_candstage_probe.json.

Usage: python BENCH/r06_candstage_probe.py [n_clips] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import DataFrame

    from relieff_lsh_spark.config import DedupConfig
    from relieff_lsh_spark.plans.dedup_pipeline import DedupPipeline
    from relieff_lsh_spark.session import get_spark
    from relieff_lsh_spark.sources.corpus import write_corpus

    import relieff_lsh_spark.operators.candidates as cands

    d = os.path.join(REPO, "BENCH", "_work", f"corpus_n{N}_s42_b100")
    if not os.path.exists(os.path.join(d, "_SUCCESS_GEN")):
        write_corpus(N, d, seed=42, batch_rows=100)
        open(os.path.join(d, "_SUCCESS_GEN"), "w").close()

    spark = get_spark(
        app_name="r06-candstage-probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)},
    )
    wh_root = "/dev/shm" if os.path.isdir("/dev/shm") else None

    orig = cands.band_candidates

    def patched_eager(bands: DataFrame, cfg, shuffle_partitions=None):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        # replay the original body with an EAGER checkpoint (round-start
        # form) — kept in sync manually for this probe only
        cap, factor = cfg.bucket_cap, cfg.salt_factor
        n_part = shuffle_partitions or cfg.shuffle_partitions
        w = Window.partitionBy(*cands.BUCKET_KEYS)
        annotated = (
            bands.repartition(n_part, *cands.BUCKET_KEYS)
            .withColumn("bucket_n", F.count("*").over(w))
            .withColumn(
                "bucket_rep", F.row_number().over(w.orderBy("clip_id")) == 1
            )
        )
        annotated = annotated.localCheckpoint(eager=True)
        hot = F.col("bucket_n") > cap * factor
        warm = (F.col("bucket_n") > cap) & ~hot
        rep = F.col("bucket_rep")
        stats_row = annotated.agg(
            F.coalesce(F.sum(F.when(hot & rep, F.col("bucket_n"))), F.lit(0)).alias("rows"),
            F.count(F.when(hot & rep, 1)).alias("buckets"),
            F.count(F.when(warm & rep, 1)).alias("salted"),
            F.count("*").alias("n_rows"),
        ).collect()[0]
        kept = annotated.where(~hot).withColumn(
            "salt",
            F.when(
                F.col("bucket_n") > cap,
                F.pmod(F.xxhash64("clip_id", "band_id", "channel"), F.lit(factor)),
            ).otherwise(F.lit(0)),
        )
        join_keys = cands.BUCKET_KEYS + ["salt"]
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
        cand = pairs.groupBy("a", "b").agg(F.collect_set("channel").alias("channels"))
        stats = cands.CandidateStats(
            dropped_buckets=int(stats_row["buckets"] or 0),
            dropped_rows=int(stats_row["rows"] or 0),
            salted_buckets=int(stats_row["salted"] or 0),
            rows_in=int(stats_row["n_rows"] or 0),
        )
        return cand, stats

    import relieff_lsh_spark.plans.dedup_pipeline as dp

    def run_pipeline() -> dict:
        wh = tempfile.mkdtemp(prefix="candprobe_wh_", dir=wh_root)
        t0 = time.time()
        pipe = DedupPipeline(
            spark, DedupConfig(shuffle_partitions=CPUS), wh,
            os.path.join(d, "corpus.parquet"),
        )
        pipe.run(resume=False)
        wall = round(time.time() - t0, 3)
        out = {
            "wall": wall,
            "stages": {
                s: pipe.metrics[s].get("seconds")
                for s in ("signatures", "candidates", "verified", "components")
            },
            "summary": {
                k: pipe.metrics["summary"][k]
                for k in ("n_components", "clips_in_dup_groups")
            },
        }
        shutil.rmtree(wh, ignore_errors=True)
        return out

    run_pipeline()  # warm-up

    res: dict = {"n": N, "reps": REPS, "cpus": CPUS,
                 "runs": {"eager": [], "lazy": []}}
    for _ in range(REPS):
        for label in ("eager", "lazy"):
            dp.band_candidates = patched_eager if label == "eager" else orig
            res["runs"][label].append(run_pipeline())
    dp.band_candidates = orig
    for label, runs in res["runs"].items():
        res[label + "_cand_min"] = min(r["stages"]["candidates"] for r in runs)
        res[label + "_wall_min"] = min(r["wall"] for r in runs)
    res["summaries_identical"] = len({
        json.dumps(r["summary"], sort_keys=True)
        for runs in res["runs"].values() for r in runs
    }) == 1

    spark.stop()
    with open(os.path.join(REPO, "BENCH", "r06_candstage_probe.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
