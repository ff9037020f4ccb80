#!/usr/bin/env python
"""IVF recall probe at a chosen corpus size (default n=20,000 — past the
largest geometry the pytest gates exercise).

Two populations, measured separately because they answer different
questions:

  * planted near-dup clusters (median cos ~0.98): the DEDUP-relevant
    contract — members of a duplicate cluster must co-probe. This is what
    q_ivf_ann_pairs exists for and what must survive the n-derived
    geometry growing the cell count.
  * the synthetic sf tables' diffuse pairs (all between cos 0.3 and 0.7 —
    the bench embeddings contain NO pair above 0.7): low-similarity pairs
    64 dims apart. IVF recall on these necessarily falls as cells grow
    (they do not co-locate in any coarse quantizer); they are outside the
    dedup contract and the probe reports them only so the number is on
    record, not discovered by surprise.

Measured 2026-08, round 4 (fixed +/-1 plane family, clamped at 4096 cells):
  n=20000 -> geometry (3,14): recall on planted 0.9658, cap drops begin
  past ~30k vectors (the round-4 VERDICT's #1 scale residual)

Measured 2026-08-18, round 5 (TRAINED product-k-means quantizer,
train_ivf_directions; IVF_MAX_DIRS=256):
  n=20000  -> (2,50):  recall on planted 0.9940
  n=50000  -> (2,80):  recall on planted 0.9892, cap drops 0 buckets/0 rows
              (the n where the old clamp bound; round-5 gate was >= 0.95
              with ~zero drops)
  n=200000 -> (2,159): recall on planted 0.9643, cap drops 0/0
              (re-measured at round-5 final HEAD, bit-identical recall)
  n=1000000 -> measured three ways (the decision trail that set the
              round-5 geometry rules; BENCH/BASELINE.md "Round-5 IVF
              recall" has the full reading):
                (3,50)  budget 9 (IVF_MAX_DIRS=256): 0.9238 — the
                        groups=2->3 product-transition step-down
                (2,354) budget 9 (MAX_DIRS=512 + dirs-scaled sample):
                        0.9419
                (2,354) budget 16 (nprobe +1 per dirs doubling past
                        256): 0.9763, cap drops 2 buckets/131 rows
  fill-slack regime (IVF_FILL_SLACK; the full n=2.2M probe exceeds this
              box's ~200GB shuffle scratch — measured via PROBE_MAX_DIRS=256
              scaled replica):
                n=524280 control  (2,256) fill 8.0:  0.9506
                n=550000 slack    (2,256) fill 8.39: 0.9493
              -> slack costs 0.0013 recall where a third group costs ~0.04
  sf1x diffuse pairs (cos 0.3-0.7, outside the dedup contract): unchanged
  character — low by design; see population notes above

Usage: python BENCH/ivf_recall_probe.py [n_vectors]
"""

from __future__ import annotations

import itertools
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from relieff_lsh_spark.operators import knn  # noqa: E402
from relieff_lsh_spark.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
MEMBERS = 10

# PROBE_MAX_DIRS: probe-only override of knn.IVF_MAX_DIRS, for measuring a
# SCALED-DOWN replica of a geometry regime whose full-n probe exceeds this
# single box (the n=2.2M fill-slack point needs >200 GB of shuffle scratch;
# a real cluster spreads that over executor-local disks). Lowering the cap
# at proportionally lower n reproduces the same regime — dirs capped, fill
# over target — at tractable shuffle volume. Affects only this process.
if os.environ.get("PROBE_MAX_DIRS"):
    knn.IVF_MAX_DIRS = int(os.environ["PROBE_MAX_DIRS"])


def main() -> None:
    rng = np.random.default_rng(7)
    n_clusters = N // MEMBERS
    base = rng.standard_normal((n_clusters, knn.ANN_DIM))
    rows = []
    for c in range(n_clusters):
        for j in range(MEMBERS):
            v = base[c] + 0.15 * rng.standard_normal(knn.ANN_DIM)
            v = v / np.linalg.norm(v)
            rows.append((c * MEMBERS + j, v.astype(np.float32).tolist(), c))
    n = len(rows)

    spark = get_spark(master="local[16]", shuffle_partitions=16)
    emb = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    )
    groups, dirs = knn.ivf_geometry(n)
    width = knn._ivf_probe_width(groups, dirs)
    print(f"n={n} geometry=({groups},{dirs}) probe_width={width} "
          f"budget={width}^{min(groups, knn.IVF_PROBE_GROUPS)}")
    # recall is computed DISTRIBUTIVELY (join vs the planted-pair table,
    # collect only counters): at n=2.2M the pair set is ~80M rows and a
    # driver collect broke spark.driver.maxResultSize — the probe now obeys
    # the repo's own no-data-collect rule.
    got_df = knn.q_ivf_ann_pairs(emb, n_vectors=n).select("a", "b")
    got_df = got_df.localCheckpoint(eager=True)  # one evaluation, two counts
    n_got = got_df.count()

    # counted cap drops on the trained primary-cell structure — the round-5
    # "~zero drops at the n where the old clamp bound" evidence
    from pyspark.sql import functions as F

    from relieff_lsh_spark.operators.capped import capped_pairs_stats

    sample = knn.ivf_sample_spark(emb, n)
    D, n2 = knn.train_ivf_directions(sample, groups, dirs)
    asg = knn._ivf_assignments(emb, groups, dirs, D, n2)
    stats = capped_pairs_stats(
        asg.where(F.col("is_primary")),
        [f"c{g}" for g in range(groups)],
        knn.IVF_CELL_CAP,
    ).collect()[0]
    print(f"cap_drops: buckets={stats['dropped_buckets']} "
          f"rows={stats['dropped_rows']} of n={n}")

    vecs = np.array([r[1] for r in rows], dtype=np.float64)
    want, cos_list = [], []
    for c in range(n_clusters):
        ids = list(range(c * MEMBERS, c * MEMBERS + MEMBERS))
        sub = vecs[ids]
        sub = sub / np.linalg.norm(sub, axis=1)[:, None]
        s = np.round(sub @ sub.T, 6)
        for i, j in itertools.combinations(range(MEMBERS), 2):
            if s[i, j] >= knn.IVF_MIN_COS:
                want.append((ids[i], ids[j]))
                cos_list.append(s[i, j])
    want_df = spark.createDataFrame(
        pd.DataFrame(want, columns=["a", "b"]).astype("int64")
    )
    inter = got_df.join(want_df, ["a", "b"], "inner").count()
    print(f"planted pairs>=thr: {len(want)} median_cos: "
          f"{float(np.median(cos_list)):.4f}")
    print(f"ivf pairs: {n_got} recall_on_planted: {inter / len(want):.4f}")


if __name__ == "__main__":
    main()
