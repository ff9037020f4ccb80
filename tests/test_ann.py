"""ANN quality: measured recall of the LSH-banded top-K search against the
brute-force oracle, with the floor derived from LSH theory on the actual
similarity values (no magic constants — the test self-calibrates to the
data):

  per-bit collision  p(cos) = 1 - arccos(cos) / pi     (Goemans-Williamson)
  per-pair candidate P      = 1 - (1 - p^r)^b          (r-bit bands, b bands)

Expected recall = mean P over the brute top-K pairs; the measured recall
must reach 60% of it (slack: one fixed hyperplane draw, not an average
over draws).
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from relieff_lsh_spark.operators import knn

SF_DIR = "/root/testdata/sf0.001"


def test_ann_topk_recall_matches_theory(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    brute = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in knn.q_knn_bruteforce(emb).collect()
    }
    ann = {
        (r.query_id, r.neighbor_id) for r in knn.q_ann_topk(emb).collect()
    }
    assert brute, "brute oracle returned nothing"

    b = knn.ANN_PLANES // knn.ANN_TOPK_BAND_BITS
    r = knn.ANN_TOPK_BAND_BITS

    def p_candidate(cos: float) -> float:
        p_bit = 1.0 - math.acos(max(-1.0, min(1.0, cos))) / math.pi
        return 1.0 - (1.0 - p_bit**r) ** b

    expected = sum(p_candidate(c) for c in brute.values()) / len(brute)
    measured = len(ann & set(brute)) / len(brute)
    assert measured >= 0.6 * expected, (
        f"ANN recall {measured:.3f} < 0.6 x theoretical {expected:.3f}"
    )


def test_ann_topk_pairs_are_true_cosines(spark):
    """Every ANN hit must carry the same cosine the brute path computes —
    the approximation is allowed to MISS pairs, never to mis-score them."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    brute = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in knn.q_knn_bruteforce(emb).collect()
    }
    for row in knn.q_ann_topk(emb).collect():
        key = (row.query_id, row.neighbor_id)
        if key in brute:
            assert row.cos_sim == brute[key]
