"""Connected components via alternating large-star/small-star on DataFrames.

Replaces the reference's per-key neighbor aggregation (groupByKey + bounded
neighbor lists, ReliefFFeatureSelector.scala:141-150) with the aggregation a
dedup pipeline needs: every clip gets the minimum clip_id reachable through
verified duplicate edges (SURVEY.md §3.3, §7.1 M6).

Algorithm (Kiveris et al., "Connected Components in MapReduce and Beyond" —
public): alternate
  large-star: every node's larger neighbors re-attach to the minimum of its
              closed neighborhood
  small-star: every node and its smaller neighbors attach to that minimum
until the edge set is a fixpoint (a forest of stars rooted at each
component's minimum id). Converges in O(log n) rounds vs O(diameter) for
plain min-label propagation — and, critically for scale, each round
shuffles only the EDGE relation (duplicate pairs), never the full vertex
set. Vertices untouched by any edge are singletons and join in exactly
once at the end.

Round-2 scaling note: the round-1 min-label loop shuffled all n vertex
labels every iteration and was the worst-scaling stage at 4x cores (1.44x);
this formulation's per-round work is O(|E|), with |E| << n for a dedup
corpus.

Lineage/restart discipline: each round the edge state is truncated with
localCheckpoint; when `checkpoint_dir` is given, every `checkpoint_every`-th
round ALSO writes the state to parquet (the reference's persisted-graph
resume, R:262/336) and a fresh call resumes from the newest valid round —
on a real cluster localCheckpoint blocks die with their executor, so the
fixpoint loop needs storage-backed checkpoints to survive restarts.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

# Tuning note (round 5): disabling AQE for the fixpoint loop — on the
# theory that AQE's per-exchange materialization jobs are pure driver
# latency for a tiny edge relation — was tried and measured 8x SLOWER
# (21-24s -> 167-170s on a 200k-edge synthetic at local[8], eager and lazy
# checkpoints alike): without AQE the round-over-round localCheckpoint
# lineage truncation stops holding the executed plan to O(1) stages per
# round and the static 32/64-partition exchanges lose coalescing. The
# AQE + lazy-checkpoint shape below is load-bearing, not incidental. What
# actually fixed the stage's 2->8-core latency was (a) spark.locality.wait=0
# (session.py): each tiny stage sat a full 3s locality timeout before
# launching its first task on cached fixpoint blocks; and (b) expressing
# each star round's min-per-key as a WINDOW over the edge relation instead
# of groupBy + join-back — one exchange per round instead of two, measured
# (BENCH/_work, 392k-edge synthetic incl. a 250k-node tree and a
# 2k-diameter path, interleaved best-of-2) 41.4s -> 29.5s at local[8] and
# 60.1s -> 51.6s at local[2], identical outputs and round count.
#
# Barrier depth, re-measured at the window-star HEAD
# (BENCH/components_depth_probe.py, same synthetic shape, local[8]):
# pairs_per_barrier 1 and 2 are equivalent within host noise (bests
# 11.9-13.9s vs 14.1-14.3s across two interleaved sessions), 3-4 are
# clearly WORSE (19.6s/28.8s — deeper lazy composition costs more in plan
# depth/AQE materialization than the saved checksum actions). The knob
# exists so the trade stays measurable; the default stays 2 (every
# recorded scaling/bench artifact ran it, and 1 is not a demonstrated win).


@dataclass
class ComponentsResult:
    components: DataFrame   # (clip_id, component_id)
    iterations: int
    converged: bool


def _large_star(e: DataFrame) -> DataFrame:
    """e(u, v) directed child->parent (u > v). Every node's LARGER neighbors
    attach to min(closed neighborhood).

    min-per-key is a window over the SAME relation, not a groupBy +
    join-back: one exchange of the edge relation per round instead of two
    (the fixpoint is latency-bound — every exchange is an AQE
    materialization job's worth of driver latency — and the window's
    per-key sort is bounded by the largest star, trivially small next to
    the join it replaces). Output multiset identical to the join form:
    mins had exactly one row per u, so the join attached m row-for-row."""
    both = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = F.least(F.col("u"), F.min("v").over(W.partitionBy("u"))).alias("m")
    # No distinct here: duplicates produced within one round are bounded
    # (one row per directed input edge) and the round-closing distinct in
    # _small_star canonicalizes the state — dropping this exchange removes
    # a full shuffle of the edge relation from every round.
    return (
        both.select("u", "v", m)
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Every node and its SMALLER neighbors attach to min(closed nbhd).
    Same window-not-join shape as _large_star; the (u, m) root edge is
    emitted once per input row instead of once per group (the join form's
    union with `mins`), and the round-closing distinct — already present —
    canonicalizes, so the output SET is unchanged."""
    d = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    dw = d.select("u", "v", F.min("v").over(W.partitionBy("u")).alias("m"))
    out = dw.select(F.col("v").alias("u"), F.col("m").alias("v")).union(
        dw.select("u", F.col("m").alias("v"))
    )
    return out.where(F.col("u") != F.col("v")).distinct()


def _checksum(df: DataFrame) -> int:
    # Order-insensitive edge-state fingerprint: one hash-agg job per round
    # instead of a join+count against the previous state. bit_xor cannot
    # overflow and (u, v) tuples are distinct, so no xor self-cancellation.
    # A 64-bit collision between consecutive states is ~2^-64/round; the
    # fixpoint is re-verified with an EXACT set comparison when the
    # checksum first repeats (below), so a collision costs one extra round,
    # never a wrong answer.
    row = df.agg(F.bit_xor(F.xxhash64("u", "v")).alias("c")).collect()[0]
    return int(row["c"] or 0)


def _checksum_and_count(df: DataFrame) -> tuple[int, int]:
    # Initial-state variant: the emptiness probe and the first checksum are
    # the SAME aggregate scan, so fold them into one action (one job
    # materializes the entry checkpoint, vs isEmpty + checksum = two).
    row = df.agg(
        F.bit_xor(F.xxhash64("u", "v")).alias("c"), F.count("*").alias("n")
    ).collect()[0]
    return int(row["c"] or 0), int(row["n"])


def _latest_checkpoint(checkpoint_dir: str) -> tuple[int, str] | None:
    if not checkpoint_dir or not os.path.isdir(checkpoint_dir):
        return None
    best = None
    for name in os.listdir(checkpoint_dir):
        if name.startswith("round_"):
            p = os.path.join(checkpoint_dir, name)
            if os.path.exists(os.path.join(p, "_SUCCESS")):
                r = int(name.split("_")[1])
                if best is None or r > best[0]:
                    best = (r, p)
    return best


def connected_components(
    edges: DataFrame,
    vertices: DataFrame,
    max_iters: int = 25,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 10,  # rounds between storage-backed checkpoints;
    # 10 = one mid-fixpoint write for the O(log n) round counts dedup graphs
    # exhibit (the star fixpoint converges in ~8 rounds on the 92k-diameter
    # bench component) — the restart-protection/extra-write trade-off
    # round 2 effectively ran with
    pairs_per_barrier: int = 2,  # star (large+small) pairs composed lazily
    # per materialization barrier/checksum action; the fixpoint is
    # latency-bound so fewer barriers = less fixed cost, at the price of up
    # to pairs_per_barrier-1 wasted (cheap, already-converged) rounds after
    # the true fixpoint and a coarser convergence check
) -> ComponentsResult:
    """edges(a, b) undirected + vertices(clip_id) -> (clip_id, component_id)
    where component_id = min clip_id in the component. Singletons keep their
    own id."""
    spark = edges.sparkSession
    e = (
        edges.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )

    start_round = 0
    resumed = _latest_checkpoint(checkpoint_dir) if checkpoint_dir else None
    if resumed is not None:
        start_round, path = resumed
        e = spark.read.parquet(path)
    # lazy: the entry _checksum_and_count action below is the materializing
    # job (its docstring always promised that); eager=True ran a separate
    # materialization job first — one extra full pass of the edge relation
    # per call (round-6, plan/job-count check in OPTIMIZATION_r06.md)
    e = e.localCheckpoint(eager=False)

    prev_sum, n_edges = _checksum_and_count(e)
    converged = n_edges == 0
    it = start_round
    last_ckpt = start_round  # rounds-since-checkpoint tracker: the loop
    # advances `it` by 2 per pass, so a naive `it % checkpoint_every == 0`
    # with an odd cadence would only fire on multiples of 2*checkpoint_every
    if converged:
        prev_sum = None
    while not converged and it < max_iters:
        # pairs_per_barrier star rounds composed lazily per materialization
        # barrier: the stage is latency-bound (per-job scheduling dwarfs the
        # per-round edge shuffle at dedup edge densities), so halving the
        # number of barriers/checksum actions halves its fixed cost.
        # Convergence is still exact — the checksum repeat is re-verified
        # set-wise below.
        it += pairs_per_barrier
        ne = e
        for _ in range(pairs_per_barrier):
            ne = _small_star(_large_star(ne))
        new_e = ne.localCheckpoint(eager=False)
        # the checksum action materializes the lazy checkpoint: ONE Spark
        # job per double-round
        new_sum = _checksum(new_e)
        if new_sum == prev_sum:
            # exact fixpoint verification (checksums are probabilistic):
            # symmetric difference must be empty. Both states are distinct
            # (u, v) sets (the round-closing distinct in _small_star), so a
            # group of count 1 in the concatenation IS an asymmetric row —
            # ONE job instead of two exceptAll passes.
            diff = (
                new_e.unionAll(e)
                .groupBy("u", "v")
                .count()
                .where(F.col("count") == 1)
                .limit(1)
                .count()
            )
            if diff == 0:
                converged = True
        if checkpoint_dir and (it - last_ckpt >= checkpoint_every) and not converged:
            path = os.path.join(checkpoint_dir, f"round_{it}")
            new_e.write.mode("overwrite").parquet(path)
            new_e = spark.read.parquet(path)
            last_ckpt = it
        e = new_e
        prev_sum = new_sum

    # star edges: (child u -> root v); roots and singletons map to themselves
    active_labels = e.select(
        F.col("u").alias("clip_id"), F.col("v").alias("component_id")
    )
    comps = (
        vertices.select("clip_id")
        .join(active_labels, "clip_id", "left")
        .select(
            "clip_id",
            F.coalesce("component_id", "clip_id").alias("component_id"),
        )
    )
    return ComponentsResult(components=comps, iterations=it, converged=converged)


def pair_recall(result: DataFrame, oracle: DataFrame) -> dict:
    """Pair-level recall/precision of `result` vs `oracle` component
    assignments, computed from the (oracle_comp x result_comp) contingency
    table — n*(n-1)/2 arithmetic on group sizes, never materializing pairs
    (scales to huge components).

    Both inputs: (clip_id, component_id). ONE Spark action (round-4 ADVICE:
    the old three collects ran the contingency join three times, and this
    runs inside every e2e test): the full-outer contingency table is built
    once behind a lazy checkpoint, and the three aggregates — agree pairs
    over both-labeled cells, oracle pairs over all oracle-labeled rows,
    result pairs over all result-labeled rows — collect as one 1-row
    cross-join."""
    o = oracle.select("clip_id", F.col("component_id").alias("oc"))
    r = result.select("clip_id", F.col("component_id").alias("rc"))
    cell = (
        o.join(r, "clip_id", "full")
        .groupBy("oc", "rc")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)
    )
    pairs = F.sum(F.col("n") * (F.col("n") - 1) / 2)
    both_df = cell.where(
        F.col("oc").isNotNull() & F.col("rc").isNotNull()
    ).agg(pairs.alias("agree"))
    o_df = (
        cell.where(F.col("oc").isNotNull())
        .groupBy("oc").agg(F.sum("n").alias("n"))
        .agg(pairs.alias("op"))
    )
    r_df = (
        cell.where(F.col("rc").isNotNull())
        .groupBy("rc").agg(F.sum("n").alias("n"))
        .agg(pairs.alias("rp"))
    )
    row = both_df.crossJoin(o_df).crossJoin(r_df).collect()[0]
    both = float(row["agree"] or 0.0)
    o_pairs = float(row["op"] or 0.0)
    r_pairs = float(row["rp"] or 0.0)
    return {
        "agree_pairs": both,
        "oracle_pairs": o_pairs,
        "result_pairs": r_pairs,
        "recall": both / o_pairs if o_pairs else 1.0,
        "precision": both / r_pairs if r_pairs else 1.0,
    }
