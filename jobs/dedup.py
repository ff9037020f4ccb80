#!/usr/bin/env python
"""spark-submit entry point for the near-duplicate detection pipeline.

The analog of the reference CLI (``parseParams`` + ``main``, reference
ReliefFFeatureSelector.scala:420-517, 540-602): positional input + tuning
flags, validation with usage on error, timing print — but emitting
structured JSON metrics instead of a driver-side PrintWriter text file
(SURVEY.md §2.1 S3/S4).

Usage (cluster):
    spark-submit --py-files dist/relieff_lsh_spark.zip jobs/dedup.py \
        --corpus /path/corpus.parquet --warehouse /path/wh \
        --shuffle-partitions 512 --metrics-out run.json

Usage (local, no spark-submit):
    python jobs/dedup.py --corpus ... --warehouse ... --master local[8]

Flags mirror the reference's knobs where they have an analog:
  reference -p num_partitions  -> --shuffle-partitions
  reference -c maxComparisons  -> --bucket-cap (per-bucket work budget)
  reference -n/-l (tables/key) -> --bands/--rows-per-band (b x r banding)
  reference -f graph file      -> --resume (read completed stage snapshots)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# When launched via `python jobs/dedup.py` from the repo, make the package
# importable; under spark-submit --py-files the zip is already on sys.path.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_REPO, "relieff_lsh_spark")):
    sys.path.insert(0, _REPO)


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        prog="dedup",
        description="Near-duplicate detection + clustering over an "
        "audio-clip + transcript corpus (PySpark).",
    )
    p.add_argument("--corpus", required=True, help="corpus parquet path")
    p.add_argument("--warehouse", required=True, help="snapshot warehouse dir")
    p.add_argument("--master", default=None,
                   help="Spark master (omit under spark-submit)")
    p.add_argument("--shuffle-partitions", type=int, default=32)
    p.add_argument("--resume", action="store_true",
                   help="skip stages whose snapshot already exists")
    p.add_argument("--metrics-out", default=None,
                   help="write the run-metrics JSON here (default: stdout only)")
    # config knobs (defaults = canonical FIXTURES.md §4 config)
    p.add_argument("--shingle-k", type=int, default=5)
    p.add_argument("--n-perms", type=int, default=128)
    p.add_argument("--bands", type=int, default=32)
    p.add_argument("--rows-per-band", type=int, default=4)
    p.add_argument("--jaccard-min", type=float, default=0.8)
    p.add_argument("--hamming-max", type=int, default=3)
    p.add_argument("--bucket-cap", type=int, default=64)
    p.add_argument("--salt-factor", type=int, default=8)
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> dict:
    args = parse_args(argv)

    from relieff_lsh_spark.config import DedupConfig
    from relieff_lsh_spark.plans.dedup_pipeline import DedupPipeline
    from relieff_lsh_spark.session import get_spark

    cfg = DedupConfig(
        shingle_k=args.shingle_k,
        n_perms=args.n_perms,
        bands=args.bands,
        rows_per_band=args.rows_per_band,
        jaccard_min=args.jaccard_min,
        hamming_max=args.hamming_max,
        bucket_cap=args.bucket_cap,
        salt_factor=args.salt_factor,
        shuffle_partitions=args.shuffle_partitions,
    )
    spark = get_spark(
        app_name="relieff-lsh-dedup",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
        # Small input splits so the fused decode/fingerprint UDF scan
        # parallelizes to the full core count even on few large files
        # (split floor is the parquet row group; the corpus generator
        # writes batch_rows-sized groups — 100 rows in the bench layout).
        # Identical at every parallelism level, so scaling stays fair.
        extra_conf={"spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024)},
    )

    t0 = time.time()
    pipe = DedupPipeline(spark, cfg, args.warehouse, args.corpus)
    metrics = pipe.run(resume=args.resume)
    wall = round(time.time() - t0, 3)

    n_clips = spark.read.parquet(args.corpus).count()
    out = {
        "wall_seconds": wall,
        "n_clips": int(n_clips),
        "clips_per_sec": round(n_clips / wall, 2),
        "config": cfg.to_dict(),
        "stages": metrics,
    }
    line = json.dumps(out)
    print(line)
    if args.metrics_out:
        with open(args.metrics_out, "w") as f:
            f.write(line + "\n")
    spark.stop()
    return out


if __name__ == "__main__":
    main()
