"""Similarity search over the embeddings table.

Brute-force cosine top-k is the small-scale oracle path (the reference's
cartesian `brute` method, ReliefFFeatureSelector.scala:120-152, reshaped:
queries x corpus instead of corpus x corpus). The LSH-bucketed variant is
the scale path: random-hyperplane SimHash over embeddings -> multi-probe
band join, the same machinery as the audio channel.

Cosine is computed with built-in higher-order functions (zip_with +
aggregate) in doubles — JVM-side, no UDF — and rounded before output so the
DuckDB oracle (list_dot_product on DOUBLE[]) matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

N_QUERIES = 20   # vec_id < 20 are the query set
TOP_K = 5
NEARDUP_MIN_COS = 0.30


def _cos(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def _dbl(col):
    return F.col(col).cast("array<double>")


def q_knn_bruteforce(emb: DataFrame) -> DataFrame:
    """Top-5 cosine neighbors for each of the first N_QUERIES vectors.
    Broadcast the tiny query side; rank with a window (SURVEY.md §2.5 W1 —
    the reference's bounded top-K selection as row_number <= K)."""
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), _dbl("embedding").alias("qv")
    )
    corpus = emb.select(F.col("vec_id").alias("neighbor_id"), _dbl("embedding").alias("cv"))
    scored = (
        corpus.join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", F.round(_cos(F.col("qv"), F.col("cv")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def q_embedding_neardup(emb: DataFrame) -> DataFrame:
    """Label-blocked near-duplicate pairs (cosine >= threshold). Blocking is
    the deterministic analog of LSH bucketing here: candidates only within a
    partition key, then exact verification — same candidate->verify shape as
    the corpus pipeline."""
    a = emb.select(F.col("vec_id").alias("a"), F.col("label"), _dbl("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("b"), F.col("label"), _dbl("embedding").alias("vb"))
    return (
        a.join(b, "label")
        .where(F.col("a") < F.col("b"))
        .withColumn("cos_sim", F.round(_cos(F.col("va"), F.col("vb")), 6))
        .where(F.col("cos_sim") >= NEARDUP_MIN_COS)
        .select("label", "a", "b", "cos_sim")
    )


def q_simhash_ann_candidates(emb: DataFrame) -> DataFrame:
    """Scale-path ANN: 16-bit random-hyperplane SimHash bands over embeddings
    -> band self-join candidates (exactly the audio channel's multi-index).
    Hyperplanes are derived from md5 of (plane, dim) so the construction is
    engine-independent and SQL-replayable: weight = +1 if md5 hex digit
    even else -1."""
    dim = 64  # embeddings table dimensionality
    n_planes = 16

    def plane_expr(v, p):
        # sign(sum_d w[p,d] * v[d]), w in {+1,-1} from md5 parity
        terms = F.zip_with(
            v,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda d: F.when(
                    F.substring(F.md5(F.concat(F.lit(f"p{p}:"), d.cast("string"))), 1, 1)
                    .isin(*list("02468ace")),
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0)),
            ),
            lambda x, w: x * w,
        )
        return (F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t) > 0).cast("int")

    v = _dbl("embedding")
    bits = [plane_expr(v, p) for p in range(n_planes)]
    # two 8-bit bands
    band0 = sum((bits[i] * F.lit(2**i) for i in range(8)), F.lit(0))
    band1 = sum((bits[i + 8] * F.lit(2**i) for i in range(8)), F.lit(0))
    sigs = emb.select(
        F.col("vec_id"),
        F.stack(F.lit(2), F.lit(0), band0, F.lit(1), band1).alias("band_id", "band_hash"),
    )
    a, b = sigs.alias("x"), sigs.alias("y")
    return (
        a.join(b, ["band_id", "band_hash"])
        .where(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(F.col("x.vec_id").alias("a"), F.col("y.vec_id").alias("b"))
        .distinct()
    )


SQL_KNN_BRUTEFORCE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6)
           AS cos_sim
  FROM e q JOIN e c ON c.vec_id != q.vec_id
  WHERE q.vec_id < {N_QUERIES}),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, rank, neighbor_id, cos_sim FROM ranked WHERE rank <= {TOP_K}
"""

SQL_EMBEDDING_NEARDUP = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.label, a.vec_id AS a, b.vec_id AS b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
         AS cos_sim
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
      >= {NEARDUP_MIN_COS}
"""
