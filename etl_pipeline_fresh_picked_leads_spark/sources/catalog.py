"""Catalog helpers.

Reference parity: ``table_exists`` via get_table-and-catch
(/root/reference/big_uery_handler.py:56-61) and schema introspection
via ``get_table().schema`` (:139-144).  Spark's catalog gives both
natively.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType


def table_exists(spark: SparkSession, table: str) -> bool:
    """Spark-native equivalent of big_uery_handler.py:56-61."""
    return spark.catalog.tableExists(table)


def table_schema(spark: SparkSession, table: str) -> StructType:
    """Spark-native equivalent of big_uery_handler.py:139-144."""
    return spark.table(table).schema
