#!/usr/bin/env python
"""A/B probe: HOF left-fold cosine vs the Arrow seqfold kernel
(functions/distance.cosine_seqfold) on the cosine-verify queries.

Protocol: for each query, interleaved timed reps (A,B,A,B,...) of the
noop-sink write at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS], plus an
exact-equality check (exceptAll both directions on the final rounded
output) — the kernel must be bit-identical, not just close. Writes one
JSON line per query to stdout and BENCH/cos_kernel_probe.json.

Usage: SPARK_GRAFT_SF_DIR=/dev/shm/sf1x python BENCH/cos_kernel_probe.py [q ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from relieff_lsh_spark.functions.distance import cosine_seqfold  # noqa: E402
from relieff_lsh_spark.operators import knn  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("PROBE_REPS", "3"))

QUERIES = ["q_embedding_neardup", "q_ivf_ann_pairs", "q_knn_bruteforce"]

_HOF_COS = knn._cos_hof


def main() -> None:
    from relieff_lsh_spark.session import get_spark

    names = sys.argv[1:] or QUERIES
    spark = get_spark(
        app_name="cos-kernel-probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)},
    )
    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    results = {}
    for name in names:
        qf = qmap[name]

        def run(form: str) -> float:
            from bench import _release_query_state

            knn._cos = _HOF_COS if form == "hof" else cosine_seqfold
            t0 = time.time()
            qf(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            _release_query_state(spark)
            return dt

        # warm both forms untimed, then interleave
        run("hof"), run("arrow")
        walls = {"hof": [], "arrow": []}
        for _ in range(REPS):
            walls["hof"].append(round(run("hof"), 3))
            walls["arrow"].append(round(run("arrow"), 3))

        knn._cos = _HOF_COS
        a = qf(spark, SF_DIR)
        knn._cos = cosine_seqfold
        b = qf(spark, SF_DIR)
        knn._cos = _HOF_COS
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        results[name] = {
            "hof": walls["hof"],
            "arrow": walls["arrow"],
            "hof_min": min(walls["hof"]),
            "arrow_min": min(walls["arrow"]),
            "speedup_min": round(min(walls["hof"]) / max(min(walls["arrow"]), 1e-9), 3),
            "bit_identical": diff == 0,
            "diff_rows": diff,
        }
        print(f"[probe] {name}: {results[name]}", file=sys.stderr, flush=True)

    spark.stop()
    line = json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "results": results})
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "cos_kernel_probe.json"), "w") as f:
        f.write(line + "\n")
    print(line, flush=True)


if __name__ == "__main__":
    main()
