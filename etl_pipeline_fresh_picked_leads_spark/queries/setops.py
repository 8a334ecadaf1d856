"""§2B-G: set operations.

Spark mapping: UNION ALL = ``unionByName`` (bag), UNION =
``union().distinct()``, INTERSECT = ``intersect`` (set), EXCEPT =
``subtract`` (set).  All-variants (intersectAll/exceptAll) exist but
the SQL-standard set forms are what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import read_table
from .registry import query


def _seg(spark: SparkSession, sf_dir: str, seg: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == seg)
        .select("c_nationkey")
    )


@query(
    "q_union_all",
    oracle="""
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION ALL
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
""",
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _seg(spark, sf_dir, "BUILDING").unionByName(
        _seg(spark, sf_dir, "MACHINERY")
    )


@query(
    "q_union_distinct",
    oracle="""
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
""",
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _seg(spark, sf_dir, "BUILDING")
        .unionByName(_seg(spark, sf_dir, "MACHINERY"))
        .distinct()
    )


@query(
    "q_intersect",
    oracle="""
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
""",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _seg(spark, sf_dir, "BUILDING").intersect(
        _seg(spark, sf_dir, "MACHINERY")
    )


@query(
    "q_except",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
EXCEPT
SELECT o_custkey FROM orders WHERE o_totalprice > 250000
""",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with urgent orders but no quarter-million order.
    (Nation-key difference sets are empty on this data — a vacuous
    oracle — so the difference is taken over customer keys.)"""
    o = read_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    big = o.filter(F.col("o_totalprice") > 250000).select("o_custkey")
    return urgent.subtract(big)
