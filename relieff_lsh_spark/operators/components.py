"""Connected components by iterative min-label propagation on DataFrames.

Replaces the reference's per-key neighbor aggregation (groupByKey + bounded
neighbor lists, ReliefFFeatureSelector.scala:141-150) with the aggregation a
dedup pipeline needs: every clip gets the minimum clip_id reachable through
verified duplicate edges (SURVEY.md §3.3, §7.1 M6).

Convergence: plain min-propagation needs O(diameter) rounds. Duplicate
clusters are near-cliques (each variant links to its base through at least
one shared band), so diameters are tiny; max_iters bounds pathological
chains and the loop reports whether it converged. Each round is one shuffle
join + one hash aggregation; labels are localCheckpoint'ed to truncate
lineage (the reference's cache/unpersist discipline, R:197/R:364, applied to
an iterative loop). For graphs with giant diameters, swap in the
large-star/small-star algorithm — the operator contract stays the same.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ComponentsResult:
    components: DataFrame   # (clip_id, component_id)
    iterations: int
    converged: bool


def connected_components(
    edges: DataFrame,
    vertices: DataFrame,
    max_iters: int = 25,
) -> ComponentsResult:
    """edges(a, b) undirected + vertices(clip_id) -> (clip_id, component_id)
    where component_id = min clip_id in the component. Singletons keep their
    own id."""
    adj = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
    ).localCheckpoint()

    labels = vertices.select(
        F.col("clip_id").alias("v"), F.col("clip_id").alias("label")
    ).localCheckpoint()

    def checksum(df: DataFrame) -> int:
        # Order-insensitive label-state fingerprint: one hash-agg job per
        # round instead of a join+count against the previous labels (the
        # join was a second shuffle per iteration, pure fixed cost).
        # bit_xor cannot overflow (sum would, under ANSI mode) and the
        # (v, label) tuples are unique, so no xor self-cancellation.
        row = df.agg(F.bit_xor(F.xxhash64("v", "label")).alias("c")).collect()[0]
        return int(row["c"] or 0)

    converged = False
    it = 0
    prev_sum = checksum(labels)
    for it in range(1, max_iters + 1):
        msgs = adj.join(
            labels.withColumnRenamed("v", "src"), "src"
        ).select(F.col("dst").alias("v"), "label")
        new_labels = (
            msgs.union(labels.select("v", "label"))
            .groupBy("v")
            .agg(F.min("label").alias("label"))
        ).localCheckpoint(eager=False)
        # the checksum action materializes the lazy checkpoint — one Spark
        # job per iteration instead of two (materialize + check)
        new_sum = checksum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum

    comps = labels.select(
        F.col("v").alias("clip_id"), F.col("label").alias("component_id")
    )
    return ComponentsResult(components=comps, iterations=it, converged=converged)


def pair_recall(result: DataFrame, oracle: DataFrame) -> dict:
    """Pair-level recall/precision of `result` vs `oracle` component
    assignments, computed from the (oracle_comp x result_comp) contingency
    table — n*(n-1)/2 arithmetic on group sizes, never materializing pairs
    (scales to huge components).

    Both inputs: (clip_id, component_id)."""
    o = oracle.select("clip_id", F.col("component_id").alias("oc"))
    r = result.select("clip_id", F.col("component_id").alias("rc"))
    cell = (
        o.join(r, "clip_id")
        .groupBy("oc", "rc")
        .agg(F.count("*").alias("n"))
    )
    pairs = F.col("n") * (F.col("n") - 1) / 2
    both = cell.agg(F.sum(pairs)).collect()[0][0] or 0.0
    o_pairs_expr = F.col("n") * (F.col("n") - 1) / 2
    o_pairs = (
        o.groupBy("oc").agg(F.count("*").alias("n")).agg(F.sum(o_pairs_expr)).collect()[0][0]
        or 0.0
    )
    r_pairs = (
        r.groupBy("rc").agg(F.count("*").alias("n")).agg(F.sum(o_pairs_expr)).collect()[0][0]
        or 0.0
    )
    return {
        "agree_pairs": float(both),
        "oracle_pairs": float(o_pairs),
        "result_pairs": float(r_pairs),
        "recall": float(both) / float(o_pairs) if o_pairs else 1.0,
        "precision": float(both) / float(r_pairs) if r_pairs else 1.0,
    }
