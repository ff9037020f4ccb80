#!/usr/bin/env python
"""Round-6 A/B: (a) the Arrow MinHash fold kernel vs the JVM HOF fold
(re-measuring the round-4 negative A/B now that the Horner rewrite removed
the cost that then dominated the stage), and (b) the unrolled fixed-width
minhash_agree_n vs the HOF agreement fold, both inside full queries.
Interleaved with a steal gate + parity collects.
Writes BENCH/r06_minhash_probe.json.

Usage: python BENCH/r06_minhash_probe.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/sf1x"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def _wait_quiet(max_wait: float = 60.0) -> None:
    deadline = time.time() + max_wait
    while True:
        s0 = _steal()
        time.sleep(2)
        if (_steal() - s0) / 100 < 0.5 or time.time() >= deadline:
            return


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def _release(spark) -> None:
    import gc

    gc.collect()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist(False)


def main() -> None:
    from relieff_lsh_spark.session import get_spark

    import relieff_lsh_spark.functions.distance as dist
    import relieff_lsh_spark.operators.dedup_docs as dd

    spark = get_spark(
        app_name="r06-minhash-probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)},
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    sig_orig = dd.signature_df
    agree_orig = dist.minhash_agree_n

    def set_variant(new: bool):
        if new:
            dd.signature_df = sig_orig
            dist.minhash_agree_n = agree_orig
        else:
            dd.signature_df = lambda d, keep_shingles=True, mh_kernel=True: (
                sig_orig(d, keep_shingles, mh_kernel=False)
            )
            dist.minhash_agree_n = lambda a, b, n: dist.minhash_agree(a, b)

    workloads = {
        "q_minhash_sigs": lambda: dd.q_minhash_sigs(docs),
        "q_lsh_candidates": lambda: dd.q_lsh_candidates(docs),
        "q_jaccard_verify": lambda: dd.q_jaccard_verify(docs),
    }
    for fn in workloads.values():
        _noop(fn())
        _release(spark)

    res: dict = {"sf_dir": SF_DIR, "reps": REPS, "cpus": CPUS}
    for wname, fn in workloads.items():
        walls: dict[str, list[float]] = {"hof": [], "kernel": []}
        for _ in range(REPS):
            for label, flag in (("hof", False), ("kernel", True)):
                _wait_quiet(20)
                set_variant(flag)
                walls[label].append(_noop(fn()))
                _release(spark)
        res[wname] = {k: {"walls": v, "min": min(v)} for k, v in walls.items()}
        set_variant(True)
        ra = sorted(map(tuple, fn().collect()))
        set_variant(False)
        rb = sorted(map(tuple, fn().collect()))
        set_variant(True)
        res[wname]["parity"] = (ra == rb)
        res[wname]["rows"] = len(ra)
        _release(spark)

    spark.stop()
    with open(os.path.join(REPO, "BENCH", "r06_minhash_probe.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
