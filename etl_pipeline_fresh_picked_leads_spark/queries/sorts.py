"""§2B-F: sorts, limits, top-k.

Scale notes: a global ORDER BY is a range-partitioned total sort
(sampling pass + shuffle) — fine when the result is consumed sorted;
``orderBy().limit(k)`` however is planned as TakeOrderedAndProject
(per-partition top-k + single merge, no total sort), which is the only
acceptable global-top-k shape at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import read_table
from .registry import query


@query(
    "q_sort_multi",
    oracle="""
SELECT c_custkey, maybe_bal, c_mktsegment
FROM (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 <> 0 THEN c_acctbal END AS maybe_bal,
         c_mktsegment
  FROM customer
)
ORDER BY maybe_bal DESC NULLS LAST, c_mktsegment ASC, c_custkey
""",
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null placement.  (The driver's
    value hash is order-insensitive; determinism of the row SET is
    what matters, the ORDER BY exercises the operator.)"""
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 != 0, F.col("c_acctbal")).alias("maybe_bal"),
        "c_mktsegment",
    )
    return c.orderBy(
        F.col("maybe_bal").desc_nulls_last(),
        F.col("c_mktsegment").asc(),
        F.col("c_custkey"),
    )


@query(
    "q_limit",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_orderkey
LIMIT 100
""",
)
def q_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # LIMIT is only deterministic under a total order that includes a
    # unique key (o_orderkey here).
    o = read_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").limit(100)


@query(
    "q_topk_global",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: planned as TakeOrderedAndProject (no total sort).
    Ties broken by the unique o_orderkey per the §2B determinism
    note."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )
