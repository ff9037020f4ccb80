#!/usr/bin/env python
"""Streaming-path throughput bench: feed a deterministic corpus through the
IncrementalDedup foreachBatch pipeline one file per micro-batch and report
per-batch wall clock + end-to-end clips/sec.

The number that matters for the 100 TB design is the per-batch wall's
FLATNESS as state accumulates (O(batch) work per batch, never O(history)) —
reported as late/early batch-wall ratio alongside the throughput.

Usage:  python BENCH/streaming_bench.py          # n=32000, 16 batches
        STREAM_N=8000 STREAM_BATCHES=8 python BENCH/streaming_bench.py
Writes one JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(os.environ.get("STREAM_N", "32000"))
BATCHES = int(os.environ.get("STREAM_BATCHES", "16"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROOT = os.environ.get("STREAM_ROOT", "/dev/shm/spark_graft_bench")


def main() -> None:
    from pyspark.sql import functions as F

    from relieff_lsh_spark.config import DedupConfig
    from relieff_lsh_spark.session import get_spark
    from relieff_lsh_spark.sources.corpus import write_corpus
    from relieff_lsh_spark.streaming.incremental import IncrementalDedup

    corpus_dir = os.path.join(ROOT, f"corpus_n{N}_s42_b100")
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS_GEN")):
        write_corpus(N, corpus_dir, seed=42, batch_rows=100,
                     procs=min(16, os.cpu_count() or 4))
        open(os.path.join(corpus_dir, "_SUCCESS_GEN"), "w").close()

    spark = get_spark(
        app_name="streaming-bench", master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)},
    )

    # stage the corpus as BATCHES parquet files in an incoming dir
    in_dir = os.path.join(ROOT, "stream_in")
    state = os.path.join(ROOT, "stream_state")
    shutil.rmtree(in_dir, ignore_errors=True)
    shutil.rmtree(state, ignore_errors=True)
    os.makedirs(in_dir)
    corpus = spark.read.parquet(os.path.join(corpus_dir, "corpus.parquet"))
    part = F.pmod(F.xxhash64("clip_id"), F.lit(BATCHES))
    for i in range(BATCHES):
        staged = os.path.join(ROOT, f"stream_staged_{i}")
        files_per_batch = int(os.environ.get("STREAM_FILES_PER_BATCH", "4"))
        corpus.where(part == i).coalesce(files_per_batch).write.mode(
            "overwrite"
        ).parquet(staged)
        for f in os.listdir(staged):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(staged, f), os.path.join(in_dir, f"b{i:03d}_{f}"))
        shutil.rmtree(staged)

    inc = IncrementalDedup(spark, DedupConfig(shuffle_partitions=CPUS), state,
                           auto_compact_every=8)
    walls: list[float] = []
    orig = inc.process_batch

    def timed(batch, batch_id):
        t0 = time.time()
        orig(batch, batch_id)
        walls.append(round(time.time() - t0, 3))

    inc.process_batch = timed
    t0 = time.time()
    inc.run_available_now(in_dir, max_files_per_trigger=1)
    total = round(time.time() - t0, 3)

    comps = inc.components().components
    n_comp = comps.select("component_id").distinct().count()
    early = sorted(walls[1:4])[len(walls[1:4]) // 2] if len(walls) > 4 else walls[0]
    late = sorted(walls[-3:])[1]
    out = {
        "metric": "streaming_dedup",
        "n_clips": N,
        "batches": len(walls),
        "cpus": CPUS,
        "total_seconds": total,
        "clips_per_sec": round(N / total, 1),
        "batch_walls": walls,
        "late_over_early_batch_wall": round(late / early, 3),
        "n_components": n_comp,
        "merge_log_rows": int((inc._state("comp_merges") or comps.limit(0)).count()),
    }
    shutil.rmtree(in_dir, ignore_errors=True)
    shutil.rmtree(state, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
