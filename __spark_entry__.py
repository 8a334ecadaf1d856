"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The actual implementations live in the
``etl_pipeline_fresh_picked_leads_spark`` package; this module is a
thin adapter over its query registry (SURVEY.md §2B is the contract).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_pipeline_fresh_picked_leads_spark.queries import ORACLE, QUERIES
from etl_pipeline_fresh_picked_leads_spark.queries.aggregates import flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped agg) on /root/testdata/sf0.001."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2B."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for EVERY registered query — as of round 6
    the registry is 100% oracle-backed: approximate operators hash a
    contract form (exact DuckDB-recomputable rows + recall/accuracy
    flag) and side-effecting ones hash their re-read final state."""
    return dict(ORACLE)
