#!/usr/bin/env python
"""Round-6 runtime-config A/Bs, interleaved in one session.

  A. Arrow batch sizing: the session default maxRecordsPerBatch=512 was
     tuned for ~75KB binary audio rows (session.py); the SQL-suite Arrow
     kernels (intersect, cosine, minhash) carry rows of a few KB, so 512
     caps their batches ~8x below what the memory budget allows. Spark 4's
     maxBytesPerBatch bounds bytes directly, letting records rise for
     narrow rows while the audio path stays at its working-set budget.
  B. spark.sql.join.preferSortMergeJoin=false (guide §3.1): allow the
     planner shuffled-hash joins where build sides fit.

Both are runtime SQL confs -> interleaved A/B in one warm session.
Writes BENCH/r06_conf_probe.json.

Usage: python BENCH/r06_conf_probe.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

RECORDS = "spark.sql.execution.arrow.maxRecordsPerBatch"
BYTES = "spark.sql.execution.arrow.maxBytesPerBatch"
SMJ = "spark.sql.join.preferSortMergeJoin"


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
    import relieff_lsh_spark.operators.knn as knn

    spark = get_spark(
        app_name="r06-conf-probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)},
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    workloads = {
        "q_jaccard_verify": lambda: dd.q_jaccard_verify(docs),
        "q_embedding_neardup": lambda: knn.q_embedding_neardup(emb),
        "q_minhash_sigs": lambda: dd.q_minhash_sigs(docs),
        "q_simhash_neardup": lambda: dd.q_simhash_neardup(docs),
    }

    def set_conf(records: int, max_bytes: str | None, smj: str):
        spark.conf.set(RECORDS, str(records))
        if max_bytes is None:
            spark.conf.unset(BYTES)
        else:
            spark.conf.set(BYTES, max_bytes)
        spark.conf.set(SMJ, smj)

    variants = {
        "base_512": (512, None, "true"),
        "rec4096_bytes48m": (4096, str(48 * 1024 * 1024), "true"),
        "base_512_shj": (512, None, "false"),
        "rec4096_bytes48m_shj": (4096, str(48 * 1024 * 1024), "false"),
    }

    # warm-up
    for fn in workloads.values():
        _noop(fn())
        _release(spark)

    res: dict = {"sf_dir": SF_DIR, "reps": REPS, "cpus": CPUS}
    for wname, fn in workloads.items():
        walls: dict[str, list[float]] = {k: [] for k in variants}
        for _ in range(REPS):
            for vname, (rec, mb, smj) in variants.items():
                set_conf(rec, mb, smj)
                walls[vname].append(_noop(fn()))
                _release(spark)
        res[wname] = {k: {"walls": v, "min": min(v)} for k, v in walls.items()}
    set_conf(512, None, "true")

    spark.stop()
    out = os.path.join(REPO, "BENCH", "r06_conf_probe.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
