#!/usr/bin/env python
"""Round-6 kernel A/Bs, interleaved in one session (the tw-kernel probe
discipline: measure before switching, record losers too).

  A. intersect kernel: per-row np.intersect1d loop (round-5) vs flattened
     one-pass-per-batch form (round-5 VERDICT item #4) — timed inside the
     full q_jaccard_verify query.
  B. simhash vote fold: JVM 64-counter HOF aggregate vs Arrow batch kernel
     (_simhash_pack_kernel) — timed inside the full q_simhash_neardup query.

Each variant also collect-compares its output against the other (sorted
rows) so the A/B doubles as a value-parity check. Writes
BENCH/r06_kernel_probe.json.

Usage: python BENCH/r06_kernel_probe.py [sf_dir] [reps]
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
        app_name="r06-kernel-probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)},
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def jv_variant(flat: bool):
        orig = dist.intersect_count_u64pairs

        def patched(a1, a2, b1, b2):
            k = dist._nint_flat_kernel if flat else dist._nint_perrow_kernel
            return k(a1, a2, b1, b2)

        dist.intersect_count_u64pairs = patched
        try:
            return dd.q_jaccard_verify(docs)
        finally:
            dist.intersect_count_u64pairs = orig

    def sn_variant(kernel: bool):
        sig = dd.simhash_df(dd.augmented_docs(docs), kernel=kernel)
        from pyspark.sql import functions as F

        from relieff_lsh_spark.operators.capped import capped_pairs

        chunks = F.array(*[F.col(f"chunk{b}") for b in range(dd.SIM_BANDS)])
        bands = sig.select(
            "doc_id", F.posexplode(chunks).alias("band_id", "chunk")
        )
        cand = capped_pairs(
            bands, ["band_id", "chunk"], "doc_id", dd.DOC_BUCKET_CAP
        )
        sa = sig.select(
            F.col("doc_id").alias("a"), F.col("simhash").alias("sim_a")
        )
        sb = sig.select(
            F.col("doc_id").alias("b"), F.col("simhash").alias("sim_b")
        )
        return (
            cand.join(sa, "a").join(sb, "b")
            .withColumn(
                "hamming",
                F.bit_count(
                    F.col("sim_a").bitwiseXOR(F.col("sim_b"))
                ).cast("int"),
            )
            .where(F.col("hamming") <= dd.SIM_HAMMING_MAX)
            .select("a", "b", "hamming")
        )

    # warm-up (untimed): bring JIT/codegen/python workers to steady state
    _noop(jv_variant(False))
    _release(spark)
    _noop(sn_variant(False))
    _release(spark)

    res: dict = {"sf_dir": SF_DIR, "reps": REPS, "cpus": CPUS}
    for name, build, variants in (
        ("jaccard_verify_intersect", jv_variant, {"perrow": False, "flat": True}),
        ("simhash_neardup_fold", sn_variant, {"jvm_fold": False, "arrow_kernel": True}),
    ):
        walls: dict[str, list[float]] = {k: [] for k in variants}
        for _ in range(REPS):
            for label, flag in variants.items():  # interleaved
                walls[label].append(_noop(build(flag)))
                _release(spark)
        res[name] = {k: {"walls": v, "min": min(v)} for k, v in walls.items()}
        # value parity between the two variants
        (fa, fb) = tuple(variants.values())
        ra = sorted(map(tuple, build(fa).collect()))
        rb = sorted(map(tuple, build(fb).collect()))
        res[name]["parity"] = (ra == rb)
        res[name]["rows"] = len(ra)
        _release(spark)

    spark.stop()
    out = os.path.join(REPO, "BENCH", "r06_kernel_probe.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
