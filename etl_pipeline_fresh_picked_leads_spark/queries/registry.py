"""Query/oracle registry plumbing and hash-stability helpers."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(qid: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` marks it rows-only."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[qid] = fn
        if oracle is not None:
            ORACLE[qid] = oracle
        return fn

    return deco


# --- hash-stability helpers -------------------------------------------------
#
# Cross-engine float SUMs are order-dependent (partial aggregation order
# differs between Spark and DuckDB), so a raw SUM(double) can differ in
# the last bits and break the driver's value hash.  The inputs here are
# fixed-decimal-by-construction (prices/quantities/discounts), so we
# accumulate exactly in DECIMAL and cast the exact result back to
# DOUBLE: both engines then produce bit-identical values.  The DuckDB
# side of each query mirrors the same expression (see DSUM_SQL).


def dsum(col: str | Column, scale: int = 2) -> Column:
    """Exact decimal-accumulated SUM, returned as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def dsum_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def davg(col: str | Column, scale: int = 2) -> Column:
    """Deterministic AVG: exact decimal SUM divided by COUNT in double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)


def davg_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT({expr})"
