"""Stage profile of the text-SimHash chain at a given SF dir.

Isolates: shingle barrier, the 64-counter vote fold (interpreted
higher-order aggregate), the chunk unpack, and the full near-dup query —
then A/Bs the JVM fold against a numpy/Arrow vote twin to see whether the
fold now dominates post-round-4 (the round-4 measurement that kept the
MINHASH fold JVM-side predates the 5x shingle-construction cut, and the
simhash vote is 4x the minhash fold's width). Usage:

    python BENCH/simhash_profile.py [sf_dir] [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from relieff_lsh_spark.barrier import barrier
from relieff_lsh_spark.operators import dedup_docs as D
from relieff_lsh_spark.session import get_spark


def numpy_vote_df(docs):
    """(doc_id, n_sh, ones) twin of the JVM fold in simhash_df, computed as
    one vectorized numpy pass per Arrow batch."""
    d1 = D._shingled(D.augmented_docs(docs)).select(
        "doc_id",
        F.transform("sh", lambda x: x["h1"]).alias("sh1"),
        F.transform("sh", lambda x: x["h2"]).alias("sh2"),
    )
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("n_sh", LongType()),
        StructField("ones", ArrayType(LongType())),
    ])

    def vote(batches):
        shifts = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            lens = np.fromiter((len(s) for s in pdf["sh1"]), dtype=np.int64, count=len(pdf))
            h1 = np.concatenate(list(pdf["sh1"])).astype(np.uint64)
            h2 = np.concatenate(list(pdf["sh2"])).astype(np.uint64)
            packed = (h2 << np.uint64(32)) | h1  # bits 0-31 from h1, 32-63 from h2
            bits = ((packed[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            ones = np.add.reduceat(bits, starts, axis=0)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_sh": lens,
                "ones": [row.tolist() for row in ones],
            })

    return d1.mapInPandas(vote, schema)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/sf1x"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_spark("simhash_profile")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select("doc_id", "text")
    results: dict[str, list[float]] = {}

    def rec(name, fn):
        t0 = time.monotonic()
        out = fn()
        t = time.monotonic() - t0
        results.setdefault(name, []).append(round(t, 3))
        print(f"{name:28s} {t:7.2f}s  {out}", flush=True)

    for _ in range(reps):
        rec("shingled", lambda: barrier(D._shingled(D.augmented_docs(docs))).count())
        rec("jvm_vote_fold", lambda: barrier(
            D.simhash_df(D.augmented_docs(docs)).select("doc_id", "simhash")
        ).count())
        rec("numpy_vote_fold", lambda: barrier(numpy_vote_df(docs)).count())
        rec("q_simhash_neardup", lambda: D.q_simhash_neardup(docs).count())

    # value check: JVM ones vs numpy ones on a sample
    jvm = (
        D._shingled(D.augmented_docs(docs))
        .select("doc_id", F.size("sh").alias("n_sh"))
        .orderBy("doc_id").limit(5).collect()
    )
    print("sample n_sh:", [(r.doc_id, r.n_sh) for r in jvm])
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
