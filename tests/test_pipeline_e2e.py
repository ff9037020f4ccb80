"""End-to-end golden test: pipeline vs brute-force oracle on the 1k corpus.

The oracle is the reference's own validation pattern (brute method as exact
baseline for the LSH method, ReliefFFeatureSelector.scala:70,258-264).
Asserts the BASELINE.json gate: dup-pair recall >= 0.99 at the canonical
shingle/signature config, plus resume and permutation-invariance properties.
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest

from relieff_lsh_spark.operators.components import pair_recall
from relieff_lsh_spark.plans.dedup_pipeline import DedupPipeline
from relieff_lsh_spark.plans.oracle import brute_oracle

WH = os.path.join(os.path.dirname(__file__), "_data", "wh_e2e")


@pytest.fixture(scope="module")
def pipeline(spark, cfg, small_corpus_dir):
    shutil.rmtree(WH, ignore_errors=True)
    pipe = DedupPipeline(spark, cfg, WH, f"{small_corpus_dir}/corpus.parquet")
    pipe.run(resume=False)
    return pipe


@pytest.fixture(scope="module")
def oracle_df(spark, cfg, small_corpus_dir):
    pdf = pd.read_parquet(
        f"{small_corpus_dir}/corpus.parquet",
        columns=["clip_id", "bytes", "codec", "transcript"],
    )
    return spark.createDataFrame(brute_oracle(pdf, cfg))


def test_recall_and_precision_vs_oracle(pipeline, oracle_df):
    comps = pipeline.catalog.read("components")
    m = pair_recall(comps, oracle_df)
    assert m["recall"] >= 0.99, m
    assert m["precision"] >= 0.99, m


def test_all_planted_kinds_recovered(spark, pipeline, small_corpus_dir):
    comps = pipeline.catalog.read("components").toPandas().set_index("clip_id")["component_id"]
    truth_pairs = pd.read_parquet(f"{small_corpus_dir}/truth_pairs.parquet")
    truth_pairs["same"] = [
        comps[a] == comps[b] for a, b in zip(truth_pairs["a"], truth_pairs["b"])
    ]
    by_kind = truth_pairs.groupby("kind")["same"].mean()
    # every planted channel must be essentially fully recovered
    for kind, frac in by_kind.items():
        assert frac >= 0.99, f"{kind}: {frac}"


def test_metrics_and_lineage_recorded(pipeline):
    for stage in ("signatures", "candidates", "verified", "components"):
        man = pipeline.catalog.manifest(stage)
        assert man is not None
        assert man["rows"] > 0
        assert len(man["partitions"]) >= 1
        assert sum(p["rows"] for p in man["partitions"]) == man["rows"]
    assert pipeline.metrics["components"]["counters"]["converged"]


def test_resume_skips_completed_stages(spark, cfg, pipeline, small_corpus_dir):
    pipe2 = DedupPipeline(spark, cfg, WH, f"{small_corpus_dir}/corpus.parquet")
    pipe2.run(resume=True)
    assert all(
        pipe2.metrics[s].get("skipped") for s in
        ("signatures", "candidates", "verified", "components")
    )


def test_resume_from_partial_checkpoint(spark, cfg, pipeline, oracle_df, small_corpus_dir):
    """Kill-after-candidates contract (SURVEY.md §5.6): drop downstream
    snapshots, rerun with resume, components must be identical."""
    wh2 = WH + "_partial"
    shutil.rmtree(wh2, ignore_errors=True)
    shutil.copytree(WH, wh2)
    pipe2 = DedupPipeline(spark, cfg, wh2, f"{small_corpus_dir}/corpus.parquet")
    pipe2.catalog.drop("verified")
    pipe2.catalog.drop("components")
    pipe2.run(resume=True)
    assert pipe2.metrics["candidates"]["skipped"]
    assert not pipe2.metrics["verified"]["skipped"]
    a = pipeline.catalog.read("components")
    b = pipe2.catalog.read("components")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    shutil.rmtree(wh2, ignore_errors=True)


def test_hotband_contained(pipeline, spark, small_corpus_dir):
    """The adversarial hot group lands in ONE component and candidate volume
    stays far below quadratic."""
    truth = spark.read.parquet(f"{small_corpus_dir}/truth_components.parquet")
    comps = pipeline.catalog.read("components")
    hot = truth.where("kind = 'hotband'").select("clip_id").join(comps, "clip_id")
    n_hot_comps = hot.select("component_id").distinct().count()
    assert n_hot_comps == 1
    # candidate stage stats: salting engaged or buckets small enough
    man = pipeline.catalog.manifest("candidates")
    n_cand = man["rows"]
    assert n_cand < 100_000  # 1000-row corpus: far below n^2/2


def test_permutation_invariance(spark, cfg, tiny_corpus_dir, tmp_path):
    """Shuffled input order -> identical component *partition* (ids may
    differ only if min clip changes — it can't: ids are stable)."""
    src = spark.read.parquet(f"{tiny_corpus_dir}/corpus.parquet")
    shuffled_path = str(tmp_path / "shuffled")
    src.orderBy("transcript").repartition(7).write.parquet(shuffled_path)

    out1 = DedupPipeline(spark, cfg, str(tmp_path / "w1"), f"{tiny_corpus_dir}/corpus.parquet")
    out1.run(resume=False)
    out2 = DedupPipeline(spark, cfg, str(tmp_path / "w2"), shuffled_path)
    out2.run(resume=False)
    a = out1.catalog.read("components")
    b = out2.catalog.read("components")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
