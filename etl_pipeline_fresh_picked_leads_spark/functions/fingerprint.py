"""Order-insensitive DataFrame content fingerprints.

One home for the (count, decimal-accumulated xxhash64 sum) pair used
wherever the engine needs to decide "same rows?" without sorting or
collecting: the SCD2 sink's content-derived idempotency tags
(streaming/sinks.py) and the star-contraction convergence probe
(operators/graph.py).  DECIMAL accumulation is load-bearing — a LONG
sum of 64-bit hashes overflows, which is an error under Spark 4's
ANSI mode (CLAUDE.md hash-match discipline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fingerprint_cols(cols: list[str | Column]) -> list[Column]:
    """The (count, hash-sum) aggregate pair over ``cols`` — for
    embedding in a wider agg (e.g. one pass per group)."""
    return [
        F.count(F.lit(1)).alias("fp_n"),
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("fp_h"),
    ]


def df_fingerprint(df: DataFrame, cols: list[str] | None = None) -> tuple:
    """(row_count, order-insensitive content hash) of ``df`` over
    ``cols`` (default: all columns).  Partition-layout-proof: the sum
    is commutative, so any shuffle/split of the same rows fingerprints
    identically.  One scalar aggregate — no corpus-sized driver
    traffic."""
    row = df.agg(*fingerprint_cols(cols or df.columns)).collect()[0]
    return row["fp_n"], row["fp_h"] or 0
