"""General relational operators demonstrated on the TPC-H-ish test tables.

Each query exercises one operator family from the reference's inventory
(SURVEY.md §2) in its idiomatic DataFrame form, with an exact DuckDB oracle.
Citations map each query to the reference behavior it re-expresses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_minmax_range(spark, sf_dir) -> DataFrame:
    """Per-key min/max/range — the reference's per-attribute range pass
    (flatMap+reduceByKey, R:213-224) as a hash aggregate with automatic
    partial/final (SURVEY.md §2.4 A3)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_partkey").alias("part_key")).agg(
        F.round(F.min("l_quantity"), 6).alias("qty_min"),
        F.round(F.max("l_quantity"), 6).alias("qty_max"),
        F.round(F.max("l_quantity") - F.min("l_quantity"), 6).alias("qty_range"),
        F.count("*").alias("n_items"),
    )


def q_class_priors(spark, sf_dir) -> DataFrame:
    """Class priors — the reference's driver-side countByValue (R:203-208)
    kept distributed: groupBy + window-sum ratio (SURVEY.md §2.4 A2)."""
    orders = _t(spark, sf_dir, "orders")
    counts = orders.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").alias("n")
    )
    return counts.select(
        "status", "n",
        F.round(F.col("n") / F.sum("n").over(W.partitionBy()), 6).alias("prior"),
    )


def q_topk_per_group(spark, sf_dir) -> DataFrame:
    """Bounded per-group top-K — the reference's hand-rolled replace-max
    selection (getNNearest, R:72-112) as row_number over a window
    (SURVEY.md §2.5 W1). Deterministic tie-break on the full key."""
    li = _t(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_suppkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    return (
        li.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            F.col("l_suppkey").alias("supp_key"), "rank",
            F.col("l_orderkey").alias("order_key"),
            F.col("l_linenumber").alias("line_number"),
            F.round("l_extendedprice", 2).alias("price"),
        )
    )


def q_broadcast_dim_join(spark, sf_dir) -> DataFrame:
    """Broadcast-lookup join — the reference's BroadcastLookupProvider
    (R:124) as an explicit broadcast hash join over two dims
    (SURVEY.md §2.3 J2): revenue per market segment and nation."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


def q_pair_dedup_theta(spark, sf_dir) -> DataFrame:
    """Ordered-pair self-join with the a<b predicate inside the join — the
    reference's cartesian + x<y filter (R:123-128; SURVEY.md §2.3 J1, §4 O2)
    demonstrated on a small dim where a cartesian is legitimate."""
    n1 = _t(spark, sf_dir, "nation").alias("n1")
    n2 = _t(spark, sf_dir, "nation").alias("n2")
    return (
        n1.join(
            n2,
            (F.col("n1.n_regionkey") == F.col("n2.n_regionkey"))
            & (F.col("n1.n_nationkey") < F.col("n2.n_nationkey")),
        )
        .select(
            F.col("n1.n_regionkey").alias("region_key"),
            F.col("n1.n_name").alias("nation_a"),
            F.col("n2.n_name").alias("nation_b"),
        )
    )


def q_conditional_weights(spark, sf_dir) -> DataFrame:
    """when/otherwise conditional aggregation — the reference's class-match
    multiplier dispatch (R:279-284; SURVEY.md §2.2 P6, §2.6 F4)."""
    li = _t(spark, sf_dir, "lineitem")
    contrib = F.when(
        F.col("l_returnflag") == "R", -F.col("l_quantity") / 10.0
    ).otherwise(F.col("l_extendedprice") * (1 - F.col("l_discount")) / 1000.0)
    return li.groupBy(F.col("l_linestatus").alias("line_status")).agg(
        F.round(F.sum(contrib), 4).alias("weight"),
        F.count("*").alias("n_rows"),
    )


def q_range_normalize(spark, sf_dir) -> DataFrame:
    """Range normalization with zero-range guard — the reference's
    normalizingDict divide (R:233-234, R:298-302) plus the div-by-zero guard
    (R:42-45; SURVEY.md §2.2 P7), as window aggregates."""
    li = _t(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_partkey")
    rng = F.max("l_quantity").over(w) - F.min("l_quantity").over(w)
    normed = F.when(rng > 0, (F.col("l_quantity") - F.min("l_quantity").over(w)) / rng) \
              .otherwise(F.lit(0.0))
    return (
        li.select(F.col("l_partkey").alias("part_key"), normed.alias("q_norm"))
        .groupBy("part_key")
        .agg(F.round(F.avg("q_norm"), 6).alias("avg_norm"), F.count("*").alias("n_items"))
    )


def q_hourly_user_activity(spark, sf_dir) -> DataFrame:
    """Time-bucketed aggregation over the events stream table (the batch
    shape of the streaming windowed agg in streaming/stream_dedup.py)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.col("user_id"),
        F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def q_latest_event_per_user(spark, sf_dir) -> DataFrame:
    """Last-row-per-key (dedup-keep-latest): the keep-one-representative
    aggregation every incremental dedup pipeline needs."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("user_id", "event_id", F.col("event_type").alias("latest_type"))
    )


def q_anti_join_unmatched(spark, sf_dir) -> DataFrame:
    """Left-anti join — the incremental-resume exclusion join the corpus
    pipeline uses (SURVEY.md §2.3: corpus.join(done, 'left_anti'))."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select(F.col("c_custkey").alias("cust_key"), F.col("c_name").alias("cust_name"))
    )


SQL = {
    "q_minmax_range": """
        SELECT l_partkey AS part_key,
               round(min(l_quantity), 6) AS qty_min,
               round(max(l_quantity), 6) AS qty_max,
               round(max(l_quantity) - min(l_quantity), 6) AS qty_range,
               count(*) AS n_items
        FROM lineitem GROUP BY 1
    """,
    "q_class_priors": """
        WITH c AS (SELECT o_orderstatus AS status, count(*) AS n FROM orders GROUP BY 1)
        SELECT status, n, round(n * 1.0 / sum(n) OVER (), 6) AS prior FROM c
    """,
    "q_topk_per_group": """
        WITH r AS (
          SELECT l_suppkey AS supp_key, l_orderkey AS order_key,
                 l_linenumber AS line_number,
                 round(l_extendedprice, 2) AS price,
                 row_number() OVER (PARTITION BY l_suppkey
                                    ORDER BY l_extendedprice DESC,
                                             l_orderkey ASC, l_linenumber ASC) AS rank
          FROM lineitem)
        SELECT supp_key, rank, order_key, line_number, price FROM r WHERE rank <= 3
    """,
    "q_broadcast_dim_join": """
        SELECT c.c_mktsegment AS segment, n.n_name AS nation_name,
               count(*) AS n_orders, round(sum(o.o_totalprice), 2) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2
    """,
    "q_pair_dedup_theta": """
        SELECT n1.n_regionkey AS region_key, n1.n_name AS nation_a, n2.n_name AS nation_b
        FROM nation n1 JOIN nation n2
          ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
    """,
    "q_conditional_weights": """
        SELECT l_linestatus AS line_status,
               round(sum(CASE WHEN l_returnflag = 'R' THEN -l_quantity / 10.0
                              ELSE l_extendedprice * (1 - l_discount) / 1000.0 END), 4)
                 AS weight,
               count(*) AS n_rows
        FROM lineitem GROUP BY 1
    """,
    "q_range_normalize": """
        WITH n AS (
          SELECT l_partkey AS part_key,
                 CASE WHEN max(l_quantity) OVER w - min(l_quantity) OVER w > 0
                      THEN (l_quantity - min(l_quantity) OVER w)
                           / (max(l_quantity) OVER w - min(l_quantity) OVER w)
                      ELSE 0.0 END AS q_norm
          FROM lineitem
          WINDOW w AS (PARTITION BY l_partkey))
        SELECT part_key, round(avg(q_norm), 6) AS avg_norm, count(*) AS n_items
        FROM n GROUP BY 1
    """,
    "q_hourly_user_activity": """
        SELECT user_id, date_trunc('hour', ts) AS hour_ts,
               count(*) AS n_events, round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "q_latest_event_per_user": """
        WITH r AS (
          SELECT user_id, event_id, event_type AS latest_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        SELECT user_id, event_id, latest_type FROM r WHERE rn = 1
    """,
    "q_anti_join_unmatched": """
        SELECT c_custkey AS cust_key, c_name AS cust_name
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
}
