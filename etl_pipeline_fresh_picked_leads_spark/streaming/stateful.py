"""Custom stateful streaming operator via applyInPandasWithState.

The escape hatch for streaming semantics the built-in windows can't
express: arbitrary per-key state evolved batch-by-batch in Python
(Arrow-batched).  Shown here as a running per-user aggregate; the same
shell implements sessionization variants, CDC reconciliation, or
online feature computation.  State is bounded per key (a few counters)
— the finite-state requirement for unbounded 100 TB feeds.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

# state: (n_events, sum_value_cents) — cents keep the accumulation
# exact (values are 2-dp decimals), matching the batch DECIMAL oracle
STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("cents", LongType())]
)


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Per-user lifetime event count + exact value sum, updated every
    micro-batch."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(pdf["value"].mul(100).round().astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [cents / 100.0],
            }
        )

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
