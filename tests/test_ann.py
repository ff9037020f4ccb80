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


def test_ivf_hot_cell_is_capped(spark):
    """A degenerate cell (every vector identical -> identical probe cells)
    must NOT emit O(c^2) pairs: the count-filtered cap drops the bucket —
    and the drops are COUNTABLE via capped_pairs_stats (round-3 VERDICT:
    the demo/ANN cap may not be silent)."""
    from relieff_lsh_spark.operators.capped import capped_pairs_stats

    n = 3 * knn.IVF_CELL_CAP  # well past the cap
    rows = [(i, [1.0] + [0.0] * (knn.ANN_DIM - 1), 0) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<float>, label int")
    out = knn.q_ivf_ann_pairs(emb)
    assert out.count() == 0  # bucket over cap -> no pairs from it

    groups, dirs = knn.ivf_geometry(n)
    asg = knn._ivf_assignments(emb, groups, dirs)
    from pyspark.sql import functions as F

    stats = capped_pairs_stats(
        asg.where(F.col("is_primary")),
        [f"c{g}" for g in range(groups)],
        knn.IVF_CELL_CAP,
    ).collect()[0]
    # identical vectors -> one shared PRIMARY cell holding every vector,
    # over the cap -> dropped (probes into it are dropped with it)
    assert stats["dropped_buckets"] == 1
    assert stats["dropped_rows"] == n


def test_ivf_multiprobe_assignments_shape(spark):
    """Every vector probes exactly IVF_PROBES^groups composite cells, with
    per-group direction codes in [1, dirs]."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(50)
    groups, dirs = 2, 8
    asg = knn._ivf_assignments(emb, groups, dirs)
    from pyspark.sql import functions as F

    per_vec = asg.groupBy("vec_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_vec] == [knn.IVF_PROBES ** groups]
    bounds = asg.agg(
        F.min("c0"), F.max("c0"), F.min("c1"), F.max("c1")
    ).collect()[0]
    assert bounds[0] >= 1 and bounds[1] <= dirs
    assert bounds[2] >= 1 and bounds[3] <= dirs
    # exactly ONE primary (assigned) cell per vector among the probes
    prim = (
        asg.where(F.col("is_primary")).groupBy("vec_id").count()
        .select("count").distinct().collect()
    )
    assert [r["count"] for r in prim] == [1]


def test_ivf_geometry_rules_at_scale():
    """Pure-function pins for the round-5 geometry rules (each measured at
    n=1M, BENCH/BASELINE.md 'Round-5 IVF recall'): (a) groups=2 holds
    through the old 2->3 transition via IVF_MAX_DIRS=512 and then via
    bounded fill slack — adding a product group measured ~4 recall points;
    (b) the training sample scales with dirs (>= IVF_TRAIN_PTS_PER_CENTROID
    points per centroid) so the wider codes stay trainable; (c) nprobe
    grows one per dirs doubling past 256 so constant-fill cell shrink does
    not decay recall. Every n <= 524288 is pinned bit-unchanged — recorded
    artifacts and oracle literals at the bench SFs depend on that."""
    # (pre-round-5-late values: unchanged below the old MAX_DIRS ceiling)
    assert knn.ivf_geometry(524288) == (2, 256)
    assert knn.ivf_train_sample_size(524288) == knn.IVF_TRAIN_SAMPLE
    assert knn._ivf_probe_width(2, 256) == knn.IVF_PROBES
    # (a) two product groups held through the measured decade and the slack
    assert knn.ivf_geometry(1_000_000) == (2, 354)
    assert knn.ivf_geometry(2_200_000) == (2, knn.IVF_MAX_DIRS)
    fill = 2_200_000 / knn.IVF_MAX_DIRS ** 2
    assert fill <= knn.IVF_TARGET_FILL * knn.IVF_FILL_SLACK
    groups_5m, _ = knn.ivf_geometry(5_000_000)  # past the slack boundary
    assert groups_5m == 3
    # (b) sample keeps >= the per-centroid floor at the widest code
    assert (
        knn.ivf_train_sample_size(2_200_000)
        >= knn.IVF_TRAIN_PTS_PER_CENTROID * knn.IVF_MAX_DIRS
    )
    # (c) nprobe growth is monotone and polylog
    assert knn._ivf_probe_width(2, 354) == knn.IVF_PROBES + 1
    assert knn._ivf_probe_width(2, 512) == knn.IVF_PROBES + 1
    assert knn._ivf_probe_width(2, 1024) == knn.IVF_PROBES + 2


def test_ivf_geometry_scales_with_n(spark):
    """ivf_geometry derives the cell structure from the corpus size (bigger
    corpus -> more cells), and q_ivf_ann_pairs matches its generated DuckDB
    oracle at two table sizes — the Spark side training its quantizer from
    the Spark-collected sample, the oracle from the parquet-footer sample,
    so the match also pins the two sampling paths to the same literals."""
    import duckdb

    g_small = knn.ivf_geometry(200)
    g_large = knn.ivf_geometry(2000)
    assert g_small != g_large
    cells = lambda g: g[1] ** g[0]
    assert cells(g_large) > cells(g_small)

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.1"):
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        n = emb.count()
        got = {tuple(r) for r in knn.q_ivf_ann_pairs(emb, n_vectors=n).collect()}
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
        )
        sample = knn.ivf_sample_parquet(f"{sf}/embeddings.parquet", n)
        want = {tuple(r) for r in con.execute(knn.ivf_sql(n, sample)).fetchall()}
        con.close()
        assert got == want, (sf, len(got), len(want))


def test_ivf_sample_paths_agree(spark):
    """The Spark-collect and parquet-footer sampling paths must produce the
    SAME float64 sample (and hence the same trained centroid literals) —
    the cross-engine exactness contract hangs on it."""
    import numpy as np

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.1"):
        path = f"{sf}/embeddings.parquet"
        emb = spark.read.parquet(path)
        n = emb.count()
        s_spark = knn.ivf_sample_spark(emb, n)
        s_arrow = knn.ivf_sample_parquet(path, n)
        assert s_spark.shape == s_arrow.shape
        assert np.array_equal(s_spark, s_arrow)
        groups, dirs = knn.ivf_geometry(n)
        d1, n1 = knn.train_ivf_directions(s_spark, groups, dirs)
        d2, n2 = knn.train_ivf_directions(s_arrow, groups, dirs)
        assert np.array_equal(d1, d2) and np.array_equal(n1, n2)


def test_ivf_probe_budget_recall_at_three_groups(spark):
    """At a geometry with more groups than the probe budget, composite
    probes stay <= IVF_PROBES^IVF_PROBE_GROUPS per vector (margin-budgeted
    multi-probe: only the least-confident groups fan out) and recall over
    planted same-cluster pairs stays solid. With the trained quantizer's
    IVF_MAX_DIRS the DERIVED geometry only reaches 3 groups past ~4.2M
    vectors, so the budget check forces groups=3 directly; the recall check
    runs the derived geometry."""
    import itertools

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    base = rng.standard_normal((500, knn.ANN_DIM))
    rows = []
    for c in range(500):
        for j in range(10):
            v = base[c] + 0.15 * rng.standard_normal(knn.ANN_DIM)
            v = v / np.linalg.norm(v)
            rows.append((c * 10 + j, v.astype(np.float32).tolist(), c))
    emb = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    )
    n = len(rows)
    assert knn.IVF_PROBE_GROUPS < 3  # the premise of the budget check
    asg = knn._ivf_assignments(emb, 3, 8)  # forced past the probe budget
    per_vec = asg.groupBy("vec_id").count().agg(F.max("count")).collect()[0][0]
    assert per_vec <= knn.IVF_PROBES ** knn.IVF_PROBE_GROUPS

    got = {(r["a"], r["b"]) for r in knn.q_ivf_ann_pairs(emb, n_vectors=n).collect()}
    vecs = {r[0]: np.array(r[1], dtype=np.float64) for r in rows}
    want = set()
    for c in range(500):
        ids = [c * 10 + j for j in range(10)]
        for a, b in itertools.combinations(ids, 2):
            cs = round(
                float(
                    np.dot(vecs[a], vecs[b])
                    / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b]))
                ),
                6,
            )
            if cs >= knn.IVF_MIN_COS:
                want.add((a, b))
    assert want
    recall = len(got & want) / len(want)
    assert recall >= 0.5, recall


def test_embedding_neardup_hot_label_is_capped(spark):
    """One hot label past EMB_LABEL_CAP contributes no pairs; small labels
    are unaffected (same policy as the corpus bucket cap). The dropped label
    is countable via capped_pairs_stats — not silent."""
    from relieff_lsh_spark.operators.capped import capped_pairs_stats

    hot_n = knn.EMB_LABEL_CAP + 10
    rows = [(i, [1.0] * 4, 99) for i in range(hot_n)]
    rows += [(1000, [1.0] * 4, 1), (1001, [1.0] * 4, 1)]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<float>, label int")
    got = {(r.a, r.b) for r in knn.q_embedding_neardup(emb).collect()}
    assert got == {(1000, 1001)}
    stats = capped_pairs_stats(emb, ["label"], knn.EMB_LABEL_CAP).collect()[0]
    assert stats["dropped_buckets"] == 1
    assert stats["dropped_rows"] == hot_n


def test_ann_cand_geometry_scales_with_n(spark):
    """ann_cand_geometry derives the band structure from the corpus size
    (more selective bands at larger n, bucket fill bounded, band count from
    the recall budget — the round-4 IVF precedent: a fixed 2x8-bit geometry
    measured 77% of rows count-cap-dropped at 20k vectors), and
    q_simhash_ann_candidates matches its generated DuckDB oracle at two
    table sizes with DIFFERENT derived geometry."""
    import duckdb
    import numpy as np
    import pandas as pd

    g_2000 = knn.ann_cand_geometry(2000)
    g_2100 = knn.ann_cand_geometry(2100)   # first size past the 8-bit fill
    g_20000 = knn.ann_cand_geometry(20000)
    assert g_2000[1] < g_2100[1] <= g_20000[1]   # selectivity grows with n
    for n, (bands, bits) in [(2000, g_2000), (2100, g_2100), (20000, g_20000)]:
        assert n / 2 ** bits <= knn.ANN_TARGET_FILL   # expected fill bounded
        assert 2 <= bands <= knn.ANN_MAX_BANDS

    rng = np.random.default_rng(11)
    for n in (500, 2100):   # geometry (5,8) vs (5,9)
        vecs = rng.standard_normal((n, knn.ANN_DIM)).astype(np.float32)
        pdf = pd.DataFrame(
            {"vec_id": range(n), "embedding": list(map(list, vecs))}
        )
        emb = spark.createDataFrame(pdf)
        got = {
            tuple(r)
            for r in knn.q_simhash_ann_candidates(emb, n_vectors=n).collect()
        }
        import pyarrow as pa

        con = duckdb.connect()
        # explicit list<float> Arrow schema: a pandas object column binds as
        # untyped and duckdb's list_transform lambda then fails to resolve
        con.register(
            "embeddings",
            pa.table({
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    list(map(list, vecs)), pa.list_(pa.float32())
                ),
            }),
        )
        want = {tuple(r) for r in con.execute(knn.ann_sql(n)).fetchall()}
        con.close()
        assert got == want, (n, len(got), len(want))


def test_ann_cand_recall_and_drops_at_derived_geometry(spark):
    """At a corpus size past the old fixed geometry's saturation point, the
    derived geometry must (a) stop the cap from mass-dropping buckets on
    non-degenerate data and (b) recover planted near-dup pairs at the
    design recall. (The fixed 2x8-bit layout dropped 77% of rows at 20k
    vectors; 4000 here keeps the test fast — its derived (bands, 9-bit)
    geometry already differs from the n<=2048 one.)"""
    import numpy as np
    import pandas as pd

    from relieff_lsh_spark.operators.capped import capped_pairs_stats

    rng = np.random.default_rng(3)
    n_clusters, members = 400, 10
    base = rng.standard_normal((n_clusters, knn.ANN_DIM))
    rows = []
    for c in range(n_clusters):
        for j in range(members):
            v = base[c] + 0.15 * rng.standard_normal(knn.ANN_DIM)
            rows.append((c * members + j, (v / np.linalg.norm(v)).astype(np.float32).tolist()))
    n = len(rows)
    emb = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    )
    bands, bits = knn.ann_cand_geometry(n)
    sigs = knn._ann_band_sigs(emb, band_bits=bits, n_planes=bands * bits)
    stats = capped_pairs_stats(
        sigs, ["band_id", "band_hash"], knn.ANN_BUCKET_CAP
    ).collect()[0]
    # clustered-but-not-degenerate data: expected fill ~n/2^bits << cap
    assert stats["dropped_rows"] <= 0.05 * n * bands, dict(stats.asDict())

    got = {
        (min(a, b), max(a, b))
        for a, b in knn.q_simhash_ann_candidates(emb, n_vectors=n).collect()
    }
    want = {
        (c * members + i, c * members + j)
        for c in range(n_clusters)
        for i in range(members)
        for j in range(i + 1, members)
    }
    recall = len(got & want) / len(want)
    # planted pairs sit near cos 0.95+ (per-bit p ~0.9+) — the geometry's
    # own design point; 0.8 leaves slack for the single hyperplane draw
    assert recall >= 0.8, recall


def test_ann_design_recall_exposed_and_clamp_observable(caplog):
    """The derived band count meets the recall budget everywhere below the
    ANN_MAX_BANDS clamp (through n~2M at 16 bands), and PAST the clamp the
    degraded design recall is computable and logged — round-4 ADVICE: the
    clamp may not silently cut recall."""
    import logging

    for n in (2_000, 130_000, 2_000_000):
        bands, bits = knn.ann_cand_geometry(n)
        assert knn.ann_design_recall(bands, bits) >= knn.ANN_CAND_RECALL, n

    with caplog.at_level(logging.WARNING, logger="relieff_lsh_spark.operators.knn"):
        bands, bits = knn.ann_cand_geometry(9_000_000)
    assert bands == knn.ANN_MAX_BANDS and bits == knn.ANN_MAX_BAND_BITS
    eff = knn.ann_design_recall(bands, bits)
    assert 0.85 < eff < knn.ANN_CAND_RECALL  # degraded but known (~0.874)
    assert any("clamp binds" in r.message for r in caplog.records)


def test_ivf_multiprobe_recall_vs_brute(spark):
    """Multi-probe IVF recall against the exhaustive pair set: the top-2
    probes per group must recover a solid majority of all cos >= threshold
    pairs (single-probe product quantization alone loses boundary pairs;
    the probes exist to close that gap). Precision is 1.0 by construction
    (every emitted pair is exact-cosine verified)."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    a = e.select(F.col("vec_id").alias("a"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0),
                      lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate("va", F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate("vb", F.lit(0.0), lambda acc, x: acc + x * x))
    brute = {
        (r["a"], r["b"])
        for r in a.join(b, F.col("a") < F.col("b"))
        .withColumn("cos_sim", dot / (na * nb))
        .where(F.col("cos_sim") >= knn.IVF_MIN_COS)
        .collect()
    }
    got = {(r["a"], r["b"]) for r in knn.q_ivf_ann_pairs(emb).collect()}
    assert brute, "brute pair set empty — threshold miscalibrated for testdata"
    assert got <= brute                      # exact verify: no false pairs
    recall = len(got & brute) / len(brute)
    assert recall >= 0.5, f"IVF multi-probe recall {recall:.3f}"


def test_cosine_seqfold_bitexact(spark):
    """The Arrow seqfold cosine kernel must equal the defining HOF left-fold
    form BIT for BIT (not approximately): the driver's oracle gate hashes
    rounded values, so even a last-ulp drift that crosses a rounding
    boundary would show up as a correctness failure. Exercised over every
    a<b pair of the sf0.001 embeddings plus planted degenerate rows
    (subnormal-scale norms; sign-of-zero product terms via exact-zero
    components), compared on raw IEEE-754 bytes. Exact-ZERO norms are
    excluded by construction on both sides: under ANSI mode the HOF
    division THROWS on a zero divisor (verified), while the kernel yields
    NaN -- the kernel is strictly more robust there, and the corpus
    contract has no zero embeddings."""
    import struct

    from pyspark.sql import functions as F

    from relieff_lsh_spark.functions.distance import cosine_seqfold

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    dim = len(emb.select("embedding").first()["embedding"])
    degenerate = spark.createDataFrame(
        [(100001, [1e-30] * dim),
         (100002, [-1e-30] * dim),
         (100003, [1.0, -1.0] + [0.0] * (dim - 2)),
         (100004, [0.0, 0.0, 1.0] + [0.0] * (dim - 3))],
        "vec_id: long, embedding: array<double>",
    )
    v = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).unionByName(degenerate.select("vec_id", F.col("embedding").alias("v")))
    a = v.select(F.col("vec_id").alias("a"), F.col("v").alias("va"))
    b = v.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"))
    both = (
        a.join(b, F.col("a") < F.col("b"))
        .select(
            knn._cos_hof(F.col("va"), F.col("vb")).alias("h"),
            cosine_seqfold(F.col("va"), F.col("vb")).alias("k"),
        )
        .collect()
    )
    assert len(both) > 100_000
    mismatches = [
        (r["h"], r["k"]) for r in both
        if struct.pack("<d", r["h"]) != struct.pack("<d", r["k"])
    ]
    assert not mismatches, f"{len(mismatches)} bit-mismatches, first: {mismatches[:3]}"
