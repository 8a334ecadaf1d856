"""Declarative data-quality checks: each check reduces a table to one
(check_name, n_violations) row; a report unions them.

The shape of Delta Live Tables expectations / Great Expectations
distilled to engine primitives: every check is a single aggregate (or
anti-join + aggregate) the optimizer can fuse with the scan, so a
full report over a 100 TB table costs one pass per source table plus
one key join per referential check — violations count toward
map-side partial aggregation like any other count.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _named(df: DataFrame, name: str) -> DataFrame:
    return df.select(
        F.lit(name).alias("check_name"), F.col("n_violations")
    )


def check_predicate(df: DataFrame, name: str, holds: Column) -> DataFrame:
    """Rows where ``holds`` is false or NULL are violations (NULL is a
    violation: an unevaluable expectation is a failed one)."""
    bad = F.count(F.when(~F.coalesce(holds, F.lit(False)), 1))
    return _named(df.agg(bad.alias("n_violations")), name)


def check_not_null(df: DataFrame, name: str, col: str) -> DataFrame:
    return _named(
        df.agg(
            F.count(F.when(F.col(col).isNull(), 1)).alias("n_violations")
        ),
        name,
    )


def check_unique(df: DataFrame, name: str, col: str) -> DataFrame:
    """Duplicate-key count: rows beyond the first per key value."""
    return _named(
        df.agg(
            (F.count(col) - F.countDistinct(col)).alias("n_violations")
        ),
        name,
    )


def check_foreign_key(
    child: DataFrame, name: str, fk: str, parent: DataFrame, pk: str
) -> DataFrame:
    """Orphaned children: anti-join against the parent key set.  The
    parent side projects to its key column only, so when the parent is
    dimension-sized the join broadcasts."""
    orphans = child.join(
        parent.select(pk), child[fk] == parent[pk], "left_anti"
    )
    return _named(
        orphans.agg(F.count(F.lit(1)).alias("n_violations")), name
    )


def dq_report(checks: list[DataFrame]) -> DataFrame:
    """Union the one-row check results into the violations report."""
    return reduce(DataFrame.unionByName, checks)
