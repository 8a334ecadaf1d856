"""Physical-plan assertions.

The 100 TB contract is written against plans, not vibes: dimension
joins must broadcast, scans must receive pushed filters and pruned
schemas, global top-k must be TakeOrderedAndProject, and shuffle
(Exchange) count must match the operator's theoretical minimum.
tests/test_plans.py enforces these for the headline queries so a
regression that silently de-optimizes a plan fails CI, not the
cluster bill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def has_wholestage_codegen(df: DataFrame) -> bool:
    """Check via the codegen explain mode — AQE's formatted plan hides
    codegen stage annotations until the final plan exists."""
    out = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "codegen"
        )
    )
    return "WholeStageCodegen" in out


def has_pushed_filters(df: DataFrame, fragment: str) -> bool:
    """True if the scan node advertises a pushed filter mentioning
    ``fragment`` (column name, typically)."""
    plan = formatted_plan(df)
    return any(
        "PushedFilters" in line and fragment in line and "[]" not in line
        for line in plan.splitlines()
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in formatted_plan(df)


def n_exchanges(df: DataFrame) -> int:
    """Number of shuffle boundaries in the plan (excludes broadcast
    exchanges, which move only the small side).  Counts the numbered
    node-detail headers so each node is counted exactly once (the tree
    section at the top repeats node names)."""
    return n_exchanges_in(formatted_plan(df))


def n_exchanges_in(plan: str) -> int:
    """``n_exchanges`` over an ALREADY-FORMATTED plan string — for
    probe sites that test several fingerprints of one plan (r15:
    each ``formatted_plan`` is a full driver-side plan compile; the
    IVF probe paid it four times for four booleans)."""
    import re

    return sum(
        1
        for line in plan.splitlines()
        if re.match(r"^\(\d+\) Exchange", line.strip())
        and "Broadcast" not in line
    )
