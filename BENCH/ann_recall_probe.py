#!/usr/bin/env python
"""ANN-candidates recall + cost probe at a corpus size past the OLD 8-band
clamp (default n=130,000: bits=ceil(log2(n/8))=14, recall budget asks 9
bands — the first size where round-4's ANN_MAX_BANDS=8 silently cut the
design recall to ~0.875; round-4 ADVICE asked for the degradation to be
observable and for a probe at a post-clamp n).

Reports, on planted near-dup clusters (median cos ~0.98, the dedup
contract):
  * derived geometry + DESIGN recall (ann_design_recall — now exposed)
  * measured recall of q_simhash_ann_candidates on the planted pairs
  * counted cap drops (capped_pairs_stats — never silent)
  * wall at the derived band count vs the old 8-band clamp: the cost of
    raising ANN_MAX_BANDS is linear in bands (signature matmul + exploded
    rows), which is what justified 8 -> 16.

Measured 2026-08-18 (n=130000 -> (9 bands, 14 bits), local[16]):
  design recall 0.9035 (old 8-band clamp: 0.8748)
  measured recall on planted pairs: 0.9827 (planted clusters sit above the
  p=0.9 design point, so measured > design is expected)
  cap drops: 167 buckets / 12,720 rows of 1.17M band rows (~1.1%, counted)
  candidates wall (warm, incl. the probe's own 8M-pair collect):
  9 bands 88.6s vs 8 bands 80.8s — 1.10x wall for 1.125x bands: linear,
  which is what justified raising ANN_MAX_BANDS 8 -> 16

Usage: python BENCH/ann_recall_probe.py [n_vectors]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from relieff_lsh_spark.operators import knn  # noqa: E402
from relieff_lsh_spark.operators.capped import capped_pairs, capped_pairs_stats  # noqa: E402
from relieff_lsh_spark.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 130_000
MEMBERS = 10


def main() -> None:
    rng = np.random.default_rng(13)
    n_clusters = N // MEMBERS
    base = rng.standard_normal((n_clusters, knn.ANN_DIM))
    rows = []
    for c in range(n_clusters):
        for j in range(MEMBERS):
            v = base[c] + 0.15 * rng.standard_normal(knn.ANN_DIM)
            v = v / np.linalg.norm(v)
            rows.append((c * MEMBERS + j, v.astype(np.float32).tolist()))
    n = len(rows)

    spark = get_spark(master="local[16]", shuffle_partitions=16)
    emb = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    ).localCheckpoint()

    bands, bits = knn.ann_cand_geometry(n)
    print(f"n={n} geometry=({bands} bands, {bits} bits) "
          f"design_recall={knn.ann_design_recall(bands, bits):.4f} "
          f"(old 8-band clamp: {knn.ann_design_recall(min(bands, 8), bits):.4f})")

    def run(nb: int) -> tuple[float, set]:
        sigs = knn._ann_band_sigs(emb, band_bits=bits, n_planes=nb * bits)
        t0 = time.time()
        got = {
            (min(a, b), max(a, b))
            for a, b in capped_pairs(
                sigs, ["band_id", "band_hash"], "vec_id", knn.ANN_BUCKET_CAP
            ).collect()
        }
        return time.time() - t0, got

    run(2)  # untimed warm-up: Arrow-UDF worker pool spin-up + codegen —
    # without it the first timed run measures the sandbox, not the bands
    wall, got = run(bands)
    sigs = knn._ann_band_sigs(emb, band_bits=bits, n_planes=bands * bits)
    stats = capped_pairs_stats(
        sigs, ["band_id", "band_hash"], knn.ANN_BUCKET_CAP
    ).collect()[0]
    print(f"cap_drops: buckets={stats['dropped_buckets']} "
          f"rows={stats['dropped_rows']} of {n}x{bands} band rows")

    want = {
        (c * MEMBERS + i, c * MEMBERS + j)
        for c in range(n_clusters)
        for i in range(MEMBERS)
        for j in range(i + 1, MEMBERS)
    }
    print(f"planted pairs: {len(want)} ann candidates: {len(got)} "
          f"measured_recall: {len(got & want) / len(want):.4f}")

    if bands != 8:
        wall8, _ = run(8)
        print(f"cost: {bands} bands {wall:.1f}s vs 8 bands {wall8:.1f}s "
              f"({wall / wall8:.2f}x wall for {bands / 8:.3f}x bands)")


if __name__ == "__main__":
    main()
