"""SQL-replayable bucket-capped band self-join.

The corpus pipeline's skew policy (operators/candidates.py — cap, salt,
counted drops; the reference's maxComparisons analog,
ReliefFFeatureSelector.scala:159/173) uses xxhash64 for salting, which no
other engine reproduces. The oracle-checked query suites (documents, ANN)
need the same protection in a form DuckDB can replay value-for-value, so
this helper implements the policy's SQL-expressible core: buckets larger
than `cap` are dropped from pair generation (a count-filtered join — two
hash aggregations and one equi-join, all on the band keys, so AQE reuses
one exchange).

Dropping (rather than salting) hot buckets is the policy the reference
itself applies when a bucket exhausts its comparison budget; the corpus
pipeline layers salting on top for the mid-sized tier. Recall impact is
explicit: a bucket with > cap members contributes no pairs from THAT band,
and multi-band OR-construction still links its members through their other
bands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def capped_pairs(bands: DataFrame, keys: list[str], id_col: str, cap: int) -> DataFrame:
    """bands -> distinct (a, b) id pairs co-bucketed on `keys`, skipping
    buckets with more than `cap` rows."""
    counts = bands.groupBy(*keys).agg(F.count("*").alias("bucket_n"))
    kept = bands.join(counts, keys).where(F.col("bucket_n") <= cap)
    a, b = kept.alias("l"), kept.alias("r")
    return (
        a.join(b, keys)
        .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"))
        .distinct()
    )


def capped_pairs_stats(bands: DataFrame, keys: list[str], cap: int) -> DataFrame:
    """Lazy 1-row DataFrame (dropped_buckets, dropped_rows) counting the
    buckets capped_pairs skips — the demo/ANN suites' analog of the corpus
    path's counted drops (operators/candidates.py), so no cap in the repo is
    silent. Lazy so query paths pay nothing unless a caller collects it."""
    return (
        bands.groupBy(*keys)
        .agg(F.count("*").alias("bucket_n"))
        .where(F.col("bucket_n") > cap)
        .agg(
            F.count("*").alias("dropped_buckets"),
            F.coalesce(F.sum("bucket_n"), F.lit(0)).alias("dropped_rows"),
        )
    )


def capped_pairs_sql(bands_cte: str, keys: list[str], id_col: str, cap: int) -> str:
    """DuckDB CTE body mirroring capped_pairs over a CTE named `bands_cte`
    with columns (id_col, *keys). Produces a relation (a, b)."""
    on = " AND ".join(f"l.{k} = r.{k}" for k in keys)
    key_list = ", ".join(keys)
    return f"""
  bucket_counts AS (
    SELECT {key_list}, count(*) AS bucket_n FROM {bands_cte} GROUP BY {key_list}),
  kept AS (
    SELECT b.* FROM {bands_cte} b
    JOIN bucket_counts c USING ({key_list})
    WHERE c.bucket_n <= {cap}),
  capped_cand AS (
    SELECT DISTINCT l.{id_col} AS a, r.{id_col} AS b
    FROM kept l JOIN kept r ON {on} AND l.{id_col} < r.{id_col})
"""
