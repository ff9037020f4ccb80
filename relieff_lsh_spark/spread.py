"""Small-scan parallelism spread for the one-shot query suites.

The demo/driver tables (TESTDATA.md) are single parquet files of a few MB;
Spark's split planner floors split size at `spark.sql.files.openCostInBytes`
(4 MB), so the scan — and with it EVERY pre-shuffle stage built on top,
which for the signature chain is the expensive part (token md5s, Horner
shingle chains, MinHash folds) — runs at 1-4 tasks on a 32-core session.
Measured at sf1x before this helper: the whole tw/shingle/signature chain
ran 4-way (6.6 s / 10.5 s / 12.6 s stage walls on 32 cores).

`spread(df)` re-balances exactly this case: if the DataFrame's planned
parallelism is well below the session default, round-robin repartition to
the default. The shuffle it introduces moves only the raw input projection
(KBs..MBs for these tables) and buys full-width execution of the hash
chains above it.

100-TB story: a production input has thousands of splits, the gate is
false, and this is a no-op — the helper exists to make the sandbox's
single-file inputs behave like a real table layout, not to add a shuffle
at scale. (The corpus pipeline does not use it: its snapshots are written
with explicit partitioning and its signature stage is plan-asserted
shuffle-free, tests/test_plan_shapes.py.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_factor: int = 2) -> DataFrame:
    """Round-robin repartition `df` to the session's default parallelism if
    its planned partition count is at least `min_factor`x below it."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * min_factor <= target:
        return df.repartition(target)
    return df
