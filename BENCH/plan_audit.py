#!/usr/bin/env python
"""Physical-plan audit: capture `explain("formatted")` for every driver
query and scan for scale anti-patterns (SURVEY.md §4).

Writes BENCH/plans/<query>.txt plus BENCH/plans/AUDIT.json with, per query:
  - cartesian / broadcast-nested-loop nodes (forbidden except where a
    bounded side makes a nested-loop the intended plan — see ALLOW_BNLJ)
  - number of Exchange (shuffle) nodes
  - parquet scans with their ReadSchema (column pruning evidence)

The binary plan-shape CLAIMS are enforced by tests/test_plan_shapes.py;
this script exists so the full plan text of every operator is an artifact
a reviewer can read without running Spark.

Usage: python BENCH/plan_audit.py   (sf dir via SPARK_GRAFT_SF_DIR,
default /root/testdata/sf0.001)
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
OUT = os.path.join(REPO, "BENCH", "plans")

# q_knn_bruteforce intentionally nested-loops: the build side is the
# bounded 20-vector query set under a non-equi (!=) condition — a
# broadcast NLJ over a broadcast of 20 rows IS the wanted plan.
ALLOW_BNLJ = {"q_knn_bruteforce"}


def main() -> None:
    from relieff_lsh_spark.session import get_spark

    import __spark_entry__ as entrymod

    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("plan-audit", master="local[4]", shuffle_partitions=4)
    audit: dict[str, dict] = {}
    failures: list[str] = []

    from relieff_lsh_spark.barrier import barrier_capture

    def explain(df) -> str:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    for name, fn in sorted(entrymod.queries().items()):
        if name == "q_audio_dedup_components":
            continue  # runs a whole pipeline (multiple plans), audited via
            # the CLI job's own metrics instead
        # localCheckpoint barriers truncate the physical plan to 'Scan
        # ExistingRDD', which silently emptied the column-pruning evidence
        # for 10 queries (round-4 ADVICE). The audit therefore explains the
        # final plan PLUS every barrier'd subplan (captured pre-checkpoint),
        # which together cover the executed plan including its parquet
        # scans. (Explaining with barriers simply removed is intractable —
        # the CollapseProject expression-tree explosion the barriers exist
        # to prevent also blows up plan compilation.)
        with barrier_capture() as caps:
            df = fn(spark, SF_DIR)
            plan = explain(df)
            plan += "".join(
                f"\n===== barrier subplan {i} =====\n{explain(c)}"
                for i, c in enumerate(caps)
            )
        with open(os.path.join(OUT, f"{name}.txt"), "w") as f:
            f.write(plan)

        cartesian = plan.count("CartesianProduct")
        bnlj = plan.count("BroadcastNestedLoopJoin")
        reads = [
            line.strip()
            for line in plan.splitlines()
            if "ReadSchema" in line
        ]
        entry = {
            "cartesian_nodes": cartesian,
            "bnlj_nodes": bnlj,
            "exchange_nodes": plan.count("\n   +- Exchange")
            + plan.count(": +- Exchange")
            + plan.count("- Exchange"),
            "parquet_read_schemas": reads,
        }
        # every driver query except the LibSVM scan reads parquet — an
        # empty ReadSchema list means the pruning check went vacuous
        # (round-4 ADVICE), which is itself a failure now
        ok = (
            cartesian == 0
            and (bnlj == 0 or name in ALLOW_BNLJ)
            and (bool(reads) or name == "q_libsvm_scan")
        )
        entry["ok"] = ok
        if not ok:
            failures.append(name)
        audit[name] = entry

    with open(os.path.join(OUT, "AUDIT.json"), "w") as f:
        json.dump(audit, f, indent=1)
    print(json.dumps({
        "queries_audited": len(audit),
        "failures": failures,
    }))
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
