#!/usr/bin/env python
"""Round-6 A/B: q_embedding_neardup as a grouped Arrow stage (applyInPandas
per label — each vector crosses the Python boundary once per group) vs the
round-5 join+seqfold-kernel form (both full vectors ride every pair).
Interleaved, with a host-quiet gate and a value-parity collect.
Writes BENCH/r06_groupcos_probe.json.

Usage: python BENCH/r06_groupcos_probe.py [sf_dir] [reps]
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


def _wait_quiet(max_wait: float = 120.0) -> list[dict]:
    """Cheap burst gate: 2s steal-tick watch; proceed regardless after
    max_wait (bursts can also start mid-run — this only avoids launching
    into one)."""
    probes = []
    deadline = time.time() + max_wait
    while True:
        s0 = _steal()
        time.sleep(2)
        d = (_steal() - s0) / 100
        probes.append({"steal_2s": round(d, 2)})
        if d < 0.5 or time.time() >= deadline:
            return probes


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

    import relieff_lsh_spark.operators.knn as knn

    spark = get_spark(
        app_name="r06-groupcos-probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)},
    )
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    variants = {
        "grouped": lambda: knn.q_embedding_neardup(emb),
        "joined": lambda: knn.q_embedding_neardup_joined(emb),
    }
    for fn in variants.values():  # warm-up
        _noop(fn())
        _release(spark)

    res: dict = {"sf_dir": SF_DIR, "reps": REPS, "cpus": CPUS,
                 "quiet_gate": _wait_quiet()}
    walls: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(REPS):
        for name, fn in variants.items():
            walls[name].append(_noop(fn()))
            _release(spark)
    res["walls"] = {k: {"walls": v, "min": min(v)} for k, v in walls.items()}
    ra = sorted(map(tuple, variants["grouped"]().collect()))
    rb = sorted(map(tuple, variants["joined"]().collect()))
    res["parity"] = (ra == rb)
    res["rows"] = len(ra)

    spark.stop()
    with open(os.path.join(REPO, "BENCH", "r06_groupcos_probe.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
