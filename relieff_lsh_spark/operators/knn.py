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


ANN_DIM = 64        # embeddings table dimensionality
ANN_PLANES = 16     # 16 sign bits -> two 8-bit bands
ANN_BAND_BITS = 8
ANN_QUANT = 1_000_000   # fixed-point scale: dot products are exact integers
ANN_BUCKET_CAP = 64     # count-filtered skew cap (SQL-replayable drop tier)


def ann_hyperplanes() -> list[list[int]]:
    """Deterministic {+1,-1} hyperplane matrix (ANN_PLANES x ANN_DIM),
    derived from md5 parity of "p{plane}:{dim}" — engine-independent, and
    PRECOMPUTED here so the plan embeds it as literal arrays (Catalyst does
    not constant-fold inside higher-order-function lambdas; deriving these
    per row cost ~1024 md5 calls/row in the first implementation)."""
    import hashlib

    return [
        [
            1 if hashlib.md5(f"p{p}:{d}".encode()).hexdigest()[0] in "02468ace" else -1
            for d in range(ANN_DIM)
        ]
        for p in range(ANN_PLANES)
    ]


def q_simhash_ann_candidates(emb: DataFrame) -> DataFrame:
    """Scale-path ANN: 16-bit random-hyperplane SimHash bands over embeddings
    -> count-capped band self-join (the audio channel's multi-index,
    reference ReliefFFeatureSelector.scala:156-165, over embeddings).

    Exactness contract: embeddings are quantized to fixed-point bigints
    (round(x * 1e6)) and the hyperplane weights are {+1,-1} literals, so
    every projection is exact integer arithmetic (|dot| < 2^33 << 2^53) and
    the sign bits are bit-identical across engines — this is what makes the
    DuckDB oracle possible where the float version was order-sensitive.

    The hyperplane matrix is one 2-D literal (16 x 64) consumed by nested
    higher-order functions: a compact expression tree (unrolling 16
    separate 64-wide aggregates made codegen compilation the dominant
    cost)."""
    from relieff_lsh_spark.operators.capped import capped_pairs

    sigs = _ann_band_sigs(emb)
    return capped_pairs(sigs, ["band_id", "band_hash"], "vec_id", ANN_BUCKET_CAP)


def _ann_band_sigs(emb: DataFrame, band_bits: int = ANN_BAND_BITS) -> DataFrame:
    """(vec_id, band_id, band_hash): integer-exact random-hyperplane SimHash
    banding over the ANN_PLANES sign bits, band width `band_bits` (so
    ANN_PLANES // band_bits bands — fewer bits per band = more, coarser
    probes = higher recall at lower selectivity)."""
    n_bands = ANN_PLANES // band_bits
    planes_lit = F.array(*[
        F.array(*[F.lit(v) for v in row]) for row in ann_hyperplanes()
    ])
    vq = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * ANN_QUANT).cast("long"),
    )
    bits = F.transform(
        planes_lit,
        lambda w: (
            F.aggregate(
                F.zip_with(F.col("vq"), w, lambda x, s: x * s),
                F.lit(0).cast("long"),
                lambda acc, t: acc + t,
            )
            > 0
        ).cast("int"),
    )
    staged = emb.select("vec_id", vq.alias("vq")).select(
        "vec_id", bits.alias("bits")
    )
    pow2 = F.array(*[F.lit(1 << i) for i in range(band_bits)])

    def band(b: int):
        chunk = F.slice(F.col("bits"), b * band_bits + 1, band_bits)
        return F.aggregate(
            F.zip_with(chunk, pow2, lambda x, w: x * w), F.lit(0),
            lambda acc, t: acc + t,
        )

    stack_args: list = [F.lit(n_bands)]
    for b in range(n_bands):
        stack_args += [F.lit(b), band(b)]
    return staged.select(
        F.col("vec_id"),
        F.stack(*stack_args).alias("band_id", "band_hash"),
    ).localCheckpoint()  # evaluate the signature expression once, not on
    # every side of the downstream self-join


ANN_TOPK_BAND_BITS = 4  # 4 bands x 4 bits: recall-oriented probe geometry;
#                         at per-bit agreement p, P(candidate) = 1-(1-p^4)^4
#                         (~0.43 at the synthetic table's top-5 cos ~0.31)


def q_ann_topk(emb: DataFrame) -> DataFrame:
    """End-to-end approximate top-K search: band-collision candidates ->
    exact cosine verify -> per-query row_number <= K. The approximate twin
    of q_knn_bruteforce (same output shape; may return fewer than K rows
    per query when the LSH probes miss — that recall gap IS the ANN
    trade-off, measured against the theoretical collision probability in
    tests/test_ann.py).

    No bucket cap needed here, by construction: the probe side is the
    bounded query set, so a degenerate bucket of c vectors emits
    O(N_QUERIES * c) pairs — linear in c, never O(c^2)."""
    sigs = _ann_band_sigs(emb, ANN_TOPK_BAND_BITS)
    qb = sigs.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "band_id", "band_hash"
    )
    cand = (
        qb.join(sigs, ["band_id", "band_hash"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    v = emb.select("vec_id", _dbl("embedding").alias("v"))
    scored = (
        cand.join(v.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv")), "query_id")
        .join(v.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv")), "neighbor_id")
        .withColumn("cos_sim", F.round(_cos(F.col("qv"), F.col("cv")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
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

IVF_MIN_COS = 0.30


def q_ivf_ann_pairs(emb: DataFrame) -> DataFrame:
    """IVF-shaped ANN: coarse-quantize every vector to one of ANN_PLANES
    inverted lists (argmax of the exact integer dot with the literal
    direction matrix — deterministic cross-engine, ties -> first index),
    then exact cosine verification within each list. The candidate->verify
    shape of the corpus pipeline with a centroid quantizer instead of LSH
    bands; at scale each cell is an independent partition of the corpus.

    Completeness caveat by construction (same as any single-probe IVF):
    pairs straddling a cell boundary are missed; multi-probe = assign to
    top-P cells. The LSH-banded variant (q_simhash_ann_candidates) is the
    recall-oriented path."""
    planes = ann_hyperplanes()
    planes_lit = F.array(*[
        F.array(*[F.lit(v) for v in row]) for row in planes
    ])
    vq = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * ANN_QUANT).cast("long"),
    )
    dots = F.transform(
        planes_lit,
        lambda w: F.aggregate(
            F.zip_with(F.col("vq"), w, lambda x, s: x * s),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        ),
    )
    staged = emb.select("vec_id", _dbl("embedding").alias("v"), vq.alias("vq"))
    cells = staged.select(
        "vec_id", "v",
        F.array_position(dots, F.array_max(dots)).cast("int").alias("cell"),
    ).localCheckpoint()
    a = cells.select(F.col("vec_id").alias("a"), F.col("cell"), F.col("v").alias("va"))
    b = cells.select(F.col("vec_id").alias("b"), F.col("cell"), F.col("v").alias("vb"))
    return (
        a.join(b, "cell")
        .where(F.col("a") < F.col("b"))
        .withColumn("cos_sim", F.round(_cos(F.col("va"), F.col("vb")), 6))
        .where(F.col("cos_sim") >= IVF_MIN_COS)
        .select("cell", "a", "b", "cos_sim")
    )


def _ivf_sql() -> str:
    planes = ann_hyperplanes()
    rows = ",\n    ".join(
        f"({p + 1}, [{', '.join(str(w) for w in planes[p])}])"
        for p in range(ANN_PLANES)
    )
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * {ANN_QUANT}) AS BIGINT)) AS vq
  FROM embeddings),
planes(c, w) AS (VALUES
    {rows}),
dots AS (
  SELECT e.vec_id, pl.c, list_dot_product(e.vq, pl.w) AS dot
  FROM e CROSS JOIN planes pl),
cells AS (
  SELECT vec_id, CAST(min(c) FILTER (WHERE dot = mx) AS INT) AS cell
  FROM (SELECT vec_id, c, dot, max(dot) OVER (PARTITION BY vec_id) AS mx FROM dots)
  GROUP BY vec_id)
SELECT ca.cell, ea.vec_id AS a, eb.vec_id AS b,
       round(list_dot_product(ea.v, eb.v)
             / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))), 6)
         AS cos_sim
FROM cells ca JOIN cells cb ON ca.cell = cb.cell
JOIN e ea ON ea.vec_id = ca.vec_id
JOIN e eb ON eb.vec_id = cb.vec_id
WHERE ca.vec_id < cb.vec_id
  AND round(list_dot_product(ea.v, eb.v)
            / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))), 6)
      >= {IVF_MIN_COS}
"""


SQL_IVF_ANN_PAIRS = _ivf_sql()


def _ann_sql() -> str:
    from relieff_lsh_spark.operators.capped import capped_pairs_sql

    planes = ann_hyperplanes()
    rows = ",\n    ".join(
        f"({p}, [{', '.join(str(w) for w in planes[p])}])"
        for p in range(ANN_PLANES)
    )
    return f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * {ANN_QUANT}) AS BIGINT)) AS vq
  FROM embeddings),
planes(p, w) AS (VALUES
    {rows}),
bits AS (
  SELECT e.vec_id, pl.p,
         CASE WHEN list_dot_product(e.vq, pl.w) > 0 THEN 1 ELSE 0 END AS bit
  FROM e CROSS JOIN planes pl),
bands AS (
  SELECT vec_id, p // {ANN_BAND_BITS} AS band_id,
         CAST(sum(bit * (1 << (p % {ANN_BAND_BITS}))) AS INT) AS band_hash
  FROM bits GROUP BY vec_id, p // {ANN_BAND_BITS}),
{capped_pairs_sql('bands', ['band_id', 'band_hash'], 'vec_id', ANN_BUCKET_CAP)}
SELECT a, b FROM capped_cand
"""


SQL_SIMHASH_ANN_CANDIDATES = _ann_sql()


def _ann_topk_sql() -> str:
    planes = ann_hyperplanes()
    rows = ",\n    ".join(
        f"({p}, [{', '.join(str(w) for w in planes[p])}])"
        for p in range(ANN_PLANES)
    )
    cos = (
        "round(list_dot_product(ea.v, eb.v)"
        " / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))), 6)"
    )
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * {ANN_QUANT}) AS BIGINT)) AS vq
  FROM embeddings),
planes(p, w) AS (VALUES
    {rows}),
bits AS (
  SELECT e.vec_id, pl.p,
         CASE WHEN list_dot_product(e.vq, pl.w) > 0 THEN 1 ELSE 0 END AS bit
  FROM e CROSS JOIN planes pl),
bands AS (
  SELECT vec_id, p // {ANN_TOPK_BAND_BITS} AS band_id,
         CAST(sum(bit * (1 << (p % {ANN_TOPK_BAND_BITS}))) AS INT) AS band_hash
  FROM bits GROUP BY vec_id, p // {ANN_TOPK_BAND_BITS}),
cand AS (
  SELECT DISTINCT qa.vec_id AS query_id, cb.vec_id AS neighbor_id
  FROM bands qa
  JOIN bands cb ON qa.band_id = cb.band_id AND qa.band_hash = cb.band_hash
  WHERE qa.vec_id < {N_QUERIES} AND cb.vec_id != qa.vec_id),
scored AS (
  SELECT c.query_id, c.neighbor_id, {cos} AS cos_sim
  FROM cand c
  JOIN e ea ON ea.vec_id = c.query_id
  JOIN e eb ON eb.vec_id = c.neighbor_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, rank, neighbor_id, cos_sim FROM ranked WHERE rank <= {TOP_K}
"""


SQL_ANN_TOPK = _ann_topk_sql()

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
