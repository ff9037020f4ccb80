"""A/B the star-fixpoint barrier depth (pairs_per_barrier) on a synthetic
edge set matching the round-5 latency work's shape: a 250k-node random tree,
a 2,000-node path (high diameter), and 140k random extra edges — ~392k edges.

Runs each depth twice interleaved at local[8]; reports best-of wall per depth
and asserts the component labelings are IDENTICAL across depths.

Usage: python BENCH/components_depth_probe.py [depths, default 2,3,4]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from pyspark.sql import functions as F  # noqa: E402

from relieff_lsh_spark.session import get_spark  # noqa: E402
from relieff_lsh_spark.operators.components import connected_components  # noqa: E402


def build_edges(spark):
    # deterministic: xxhash64-seeded parents (random tree), path, extras
    n_tree, n_path, n_extra = 250_000, 2_000, 140_000
    tree = (
        spark.range(1, n_tree)
        .select(
            F.col("id").alias("a"),
            (F.abs(F.xxhash64(F.col("id"), F.lit(7))) % F.col("id")).alias("b"),
        )
    )
    path = (
        spark.range(1, n_path)
        .select(
            (F.col("id") + 1_000_000).alias("a"),
            (F.col("id") + 1_000_000 - 1).alias("b"),
        )
    )
    extra = (
        spark.range(n_extra)
        .select(
            (F.abs(F.xxhash64(F.col("id"), F.lit(11))) % 260_000).alias("a"),
            (F.abs(F.xxhash64(F.col("id"), F.lit(13))) % 260_000).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
    )
    edges = tree.unionAll(path).unionAll(extra)
    verts = (
        edges.select(F.col("a").alias("clip_id"))
        .unionAll(edges.select(F.col("b").alias("clip_id")))
        .distinct()
    )
    return edges.localCheckpoint(), verts.localCheckpoint()


def run(depths, reps=2):
    spark = get_spark()
    edges, verts = build_edges(spark)
    # warm-up: one full fixpoint so codegen/python-worker costs don't land
    # on the first measured depth
    connected_components(edges, verts).components.count()

    sums = {}
    walls = {d: [] for d in depths}
    for rep in range(reps):
        for d in depths:
            t0 = time.monotonic()
            res = connected_components(edges, verts, pairs_per_barrier=d)
            row = (
                res.components.agg(
                    F.bit_xor(F.xxhash64("clip_id", "component_id")).alias("s"),
                    F.countDistinct("component_id").alias("k"),
                ).collect()[0]
            )
            walls[d].append(time.monotonic() - t0)
            prev = sums.setdefault(d, (row["s"], row["k"], res.iterations))
            assert prev[:2] == (row["s"], row["k"])
            print(
                f"depth={d} rep={rep} wall={walls[d][-1]:.1f}s "
                f"iters={res.iterations} n_comp={row['k']}",
                flush=True,
            )
    print("---")
    for d in depths:
        print(
            f"pairs_per_barrier={d}: best {min(walls[d]):.1f}s "
            f"(all {[round(w,1) for w in walls[d]]}), iters={sums[d][2]}"
        )
    ks = {sums[d][:2] for d in depths}
    assert len(ks) == 1, f"labelings differ across depths: {sums}"
    print("labelings identical across depths: True")
    spark.stop()


if __name__ == "__main__":
    depths = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "2,3,4").split(",")]
    run(depths)
