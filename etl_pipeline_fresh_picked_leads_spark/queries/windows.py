"""§2B-E: window functions.

Determinism discipline (§2B note): every ORDER BY inside a window
includes a unique tiebreaker key, except rank/dense_rank where tied
rows legitimately share a value, and range frames where the frame is
value-defined.  Running float sums accumulate in DECIMAL so the
prefix-sum association order can't produce cross-engine last-bit
drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import read_table
from .registry import query


@query(
    "q_win_rownum",
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS INT) AS rn
FROM orders
""",
)
def q_win_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey", "o_custkey", F.row_number().over(w).alias("rn")
    )


@query(
    "q_win_rank",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity,
       CAST(RANK() OVER (PARTITION BY l_orderkey
                         ORDER BY l_quantity DESC) AS INT) AS rnk,
       CAST(DENSE_RANK() OVER (PARTITION BY l_orderkey
                               ORDER BY l_quantity DESC) AS INT) AS drnk
FROM lineitem
""",
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rank/dense_rank are deterministic under ties (tied rows get the
    # same value), so no tiebreaker is needed — unlike row_number.
    l = read_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(F.col("l_quantity").desc())
    return l.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "q_win_ntile",
    oracle="""
SELECT o_orderkey,
       CAST(NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INT)
         AS quartile
FROM orders
""",
)
def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global NTILE(4) WITHOUT the single-partition sort (VERDICT r5
    item 3): two-pass distributed rank — range-partition on the sort
    key, per-partition row_number + broadcast cumulative offsets —
    then the quartile derived arithmetically from rank and total.
    Bit-identical to ``NTILE(4) OVER (ORDER BY ...)``; the plan has no
    Exchange SinglePartition (pinned in tests/test_plans.py)."""
    from ..operators.distwindow import global_rank, ntile_expr

    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    ranked, total = global_rank(o, ["o_totalprice", "o_orderkey"])
    return ranked.select(
        "o_orderkey", ntile_expr("_grank", total, 4).alias("quartile")
    )


@query(
    "q_win_lag_lead",
    oracle="""
SELECT event_id, user_id, value,
       LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS prev_value,
       LEAD(value, 1, -1.0) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS next_value
FROM events
""",
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value", 1, -1.0).over(w).alias("next_value"),
    )


@query(
    "q_win_running",
    oracle="""
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_value,
       COUNT(*) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
FROM events
""",
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("running_value"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


@query(
    "q_win_range",
    oracle="""
SELECT o_orderkey, o_totalprice,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         ORDER BY o_totalprice
         RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS near_sum
FROM orders
WHERE o_orderkey % 20 = 0
""",
)
def q_win_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global value-RANGE running sum WITHOUT the single-partition
    sort (VERDICT r5 item 3): range-partition on the value, borrow the
    boundary rows (within 1000.0 of each partition's min) from earlier
    partitions via a broadcast bounds join, evaluate the frame
    per-partition.  RANGE frames are value-defined — ties share a
    frame, and range partitioning keeps ties co-located — so no
    tiebreaker is needed and the result is bit-identical."""
    from ..operators.distwindow import range_frame_agg

    o = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 20 == 0)
        .select("o_orderkey", "o_totalprice")
    )
    return range_frame_agg(
        o,
        "o_totalprice",
        1000,
        lambda w: F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double"),
        "near_sum",
    )


@query(
    "q_win_firstlast",
    oracle="""
SELECT event_id, user_id,
       FIRST_VALUE(event_type) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS first_type,
       LAST_VALUE(event_type) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS last_type
FROM events
""",
)
def q_win_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "event_id",
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
    )


@query(
    "q_topk_pergroup",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def q_topk_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: the row_number-filter formulation is
    one shuffle on the group key; at scale Spark pushes a per-partition
    window-group-limit before the shuffle (WindowGroupLimit)."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "q_win_percent_rank",
    oracle="""
SELECT o_orderkey, o_custkey,
       round(PERCENT_RANK() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice, o_orderkey), 6)
         AS pct_rank,
       round(CUME_DIST() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice, o_orderkey), 6)
         AS cume
FROM orders
""",
)
def q_win_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position window functions (percent_rank / cume_dist);
    order includes the unique key so ties cannot shift either value,
    and both round to 6 dp for cross-engine hash stability."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )
