#!/usr/bin/env python
"""Round-6 focused A/B: spark.sql.join.preferSortMergeJoin true (default)
vs false (allow shuffled-hash joins, guide §3.1/§9), interleaved at batch
512 with a steal-gate. Writes BENCH/r06_shj_probe.json.

Usage: python BENCH/r06_shj_probe.py [sf_dir] [reps]
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
SMJ = "spark.sql.join.preferSortMergeJoin"


def _steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def _wait_quiet(max_wait: float = 120.0) -> None:
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

    import relieff_lsh_spark.operators.dedup_docs as dd

    spark = get_spark(
        app_name="r06-shj-probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)},
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    workloads = {
        "q_jaccard_verify": lambda: dd.q_jaccard_verify(docs),
        "q_simhash_neardup": lambda: dd.q_simhash_neardup(docs),
        "q_lsh_candidates_refined": lambda: dd.q_lsh_candidates_refined(docs),
        "q_text_components": lambda: dd.q_text_components(docs),
    }
    for fn in workloads.values():
        _noop(fn())
        _release(spark)

    res: dict = {"sf_dir": SF_DIR, "reps": REPS, "cpus": CPUS}
    for wname, fn in workloads.items():
        walls: dict[str, list[float]] = {"smj": [], "shj": []}
        for _ in range(REPS):
            for label, flag in (("smj", "true"), ("shj", "false")):
                _wait_quiet(20)
                spark.conf.set(SMJ, flag)
                walls[label].append(_noop(fn()))
                _release(spark)
        res[wname] = {k: {"walls": v, "min": min(v)} for k, v in walls.items()}
    spark.conf.set(SMJ, "true")
    spark.stop()
    with open(os.path.join(REPO, "BENCH", "r06_shj_probe.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
