"""Frequency-sketch operators: Misra–Gries heavy hitters (r6).

The 100 TB problem: "which keys occur more than n/k times?" computed
without a full groupBy of every distinct key.  Two-phase shape:

1. **Per-partition Misra–Gries** (`mapInPandas`, bounded k counters
   per task — memory independent of the number of distinct keys).
   Pigeonhole guarantee: any key with global frequency > n/k exceeds
   n_p/k in at least one partition p, so the UNION of per-partition
   candidate sets contains every true heavy hitter — the sketch can
   only over-report, never miss.
2. **Exact verification of candidates only**: semi-join the raw data
   against the (tiny) candidate set, exact count, filter > n/k.
   Shuffle carries candidate-key rows only, never the full distinct
   domain.

This is the frequency analogue of the LSH candidates-then-verify
discipline used across operators/dedup.py.  mapInPandas is the
declared custom-operator path (SURVEY §4.3) — the counter loop is
per-row stateful and has no JVM expression form.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(col: str, k: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:  # state persists across Arrow batches of one partition
            for v in pdf[col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:  # decrement-all: the classic MG step
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({col: list(counters.keys())})

    return run


def heavy_hitters(df: DataFrame, col: str, k: int = 20) -> DataFrame:
    """Exact NON-NULL keys with frequency > n/k, found via
    per-partition Misra–Gries candidates + exact verification.
    Returns ``(col, freq)`` for every true heavy hitter; bit-identical
    to the full-groupBy answer over non-null keys (the sketch only
    prunes, the counts are exact), with per-task memory O(k) and a
    candidate-only shuffle.

    NULL keys are excluded up front: NULLs reach pandas as NaN, and
    NaN != NaN would both corrupt the counter dict (every NaN inserts
    separately) and break the Arrow cast back to the integral schema —
    and a NULL "heavy hitter" is not a meaningful answer anyway.
    Callers wanting the null mass should count it separately."""
    src = df.select(col).filter(F.col(col).isNotNull())
    candidates = (
        src.mapInPandas(_mg_partition(col, k), schema=f"{col} {dict(df.dtypes)[col]}")
        .distinct()
    )
    counts = src.join(F.broadcast(candidates), col, "left_semi").groupBy(col).agg(
        F.count(F.lit(1)).alias("freq")
    )
    n = src.agg(F.count(F.lit(1)).alias("_n"))
    return (
        counts.crossJoin(F.broadcast(n))
        .filter(F.col("freq") * k > F.col("_n"))
        .drop("_n")
    )
