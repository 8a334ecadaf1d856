"""§2B-B: projections, safe casts, predicates.

Grounding: the reference's SAFE_CAST projection
(/root/reference/big_uery_handler.py:32-42,147-156), NULL predicate
(:191) and date-window parameterization
(/root/reference/fresh_picked_leads.py:140-154).

All predicates/projections here are pure Catalyst expressions: they
compile into the parquet scan (pushed filters + pruned columns), which
is exactly the 100 TB-safe shape — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import read_table
from .registry import query


@query(
    "q_project",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net_price,
       l_quantity AS qty
FROM lineitem
""",
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-row IEEE arithmetic is bit-deterministic cross-engine, so no
    # rounding is needed on unaggregated expressions.
    return read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        F.col("l_quantity").alias("qty"),
    )


@query(
    "q_try_cast",
    oracle="""
SELECT
  o_orderkey,
  TRY_CAST(
    CAST(o_orderkey AS VARCHAR)
      || CASE WHEN o_orderkey % 7 = 0 THEN '!' ELSE '' END
    AS BIGINT) AS key_safe,
  TRY_CAST(o_orderpriority AS DOUBLE) AS prio_num,
  TRY_CAST(CAST(o_custkey AS VARCHAR) AS BIGINT) AS cust_ok
FROM orders
""",
)
def q_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAFE_CAST semantics (big_uery_handler.py:32-42): bad values
    become NULL, never fail the query."""
    o = read_table(spark, sf_dir, "orders")
    dirty = F.concat(
        F.col("o_orderkey").cast("string"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("!")).otherwise(F.lit("")),
    )
    return o.select(
        "o_orderkey",
        dirty.try_cast("bigint").alias("key_safe"),
        F.col("o_orderpriority").try_cast("double").alias("prio_num"),
        F.col("o_custkey").cast("string").try_cast("bigint").alias("cust_ok"),
    )


@query(
    "q_filter_null",
    oracle="""
SELECT o_orderkey, maybe_date
FROM (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN CAST(o_orderdate AS DATE) END
           AS maybe_date
  FROM orders
)
WHERE maybe_date IS NULL
""",
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL predicate (big_uery_handler.py:191)."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_orderdate").cast("date")
        ).alias("maybe_date"),
    )
    return o.filter(F.col("maybe_date").isNull())


@query(
    "q_filter_cmp",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
FROM lineitem
WHERE l_quantity >= 30 AND l_discount < 0.05
  AND (l_returnflag = 'R' OR l_returnflag = 'A')
  AND NOT (l_linenumber <> 1 AND l_quantity <= 35)
""",
)
def q_filter_cmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag"
    ).filter(
        (F.col("l_quantity") >= 30)
        & (F.col("l_discount") < 0.05)
        & ((F.col("l_returnflag") == "R") | (F.col("l_returnflag") == "A"))
        & ~((F.col("l_linenumber") != 1) & (F.col("l_quantity") <= 35))
    )


@query(
    "q_filter_between",
    oracle="""
SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                     AND TIMESTAMP '1996-12-31 23:59:59'
""",
)
def q_filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range window — the engine form of the reference's
    yesterday->today fetch window (fresh_picked_leads.py:140-154)."""
    l = read_table(spark, sf_dir, "lineitem")
    return l.filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1996-12-31 23:59:59").cast("timestamp"),
        )
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_shipdate").cast("date").alias("ship_date"),
    )


@query(
    "q_filter_in",
    oracle="""
SELECT o_orderkey, o_orderpriority
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
""",
)
def q_filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_orderkey", "o_orderpriority"
    )


@query(
    "q_filter_like",
    oracle="""
SELECT p_partkey, p_type, p_name
FROM part
WHERE p_type LIKE 'S%' OR p_name LIKE '%gear%'
""",
)
def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("S%") | F.col("p_name").like("%gear%")
    ).select("p_partkey", "p_type", "p_name")
