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
    TimestampType,
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


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
    ]
)


def event_time_sessions(
    stream: DataFrame, gap_minutes: int = 30, delay: str = "1 hour"
) -> DataFrame:
    """Gap-based sessions with EVENT-TIME STATE TIMEOUT — the state-
    eviction pattern ``session_window`` hides and NoTimeout state
    never gets: a user's open session lives in state only until the
    watermark passes ``session_end + gap``, then times out, emits
    exactly once (append mode), and its state is REMOVED.  Without a
    timeout, one state entry per ever-seen key accumulates forever —
    the slow state leak that kills month-long streaming jobs on a
    100 TB feed.

    Within a batch, a key's events are sorted and gap-split: every
    session definitionally closed by a later event emits immediately;
    only the trailing open session stays in state.  Deterministic
    output for a bounded replay: sessions followed by same-key events
    emit regardless of batching, and the final watermark
    (max(ts) − delay) decides which trailing sessions time out —
    batch-boundary independent (pinned in tests vs a batch
    recomputation, 1-batch and multi-batch).
    """
    import numpy as np

    gap_us = gap_minutes * 60 * 1_000_000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple] = []
        if state.hasTimedOut:
            s, e, n = state.get
            state.remove()
            closed.append((key[0], s, e, n))
        else:
            ts: list[int] = []
            for pdf in pdfs:
                ts.extend(
                    pdf["ts"]
                    .to_numpy(dtype="datetime64[ns]")
                    .astype("int64")
                    // 1000
                )
            ts.sort()
            # Re-split instead of append-merge: the carried state
            # session is one interval among the batch's single-event
            # intervals; sort by start and gap-merge.  This extends
            # session_start BACKWARDS when a not-yet-late out-of-order
            # event arrives in a later micro-batch, and refuses to
            # absorb events more than `gap` before the open session —
            # both of which the old signed `t - end <= gap` test got
            # wrong (ADVICE r4).  Matches the batch recomputation:
            # the state interval's interior is gap-dense by
            # construction, so interval-merge == event-level merge.
            items = [[int(t), int(t), 1] for t in ts]
            if state.exists:
                s, e, n = state.get
                items.append([int(s), int(e), int(n)])
                items.sort()
            sessions: list[list[int]] = []
            for s, e, n in items:
                if sessions and s - sessions[-1][1] <= gap_us:
                    sessions[-1][1] = max(sessions[-1][1], e)
                    sessions[-1][2] += n
                else:
                    sessions.append([s, e, n])
            for s, e, n in sessions[:-1]:  # closed by a later event
                closed.append((key[0], s, e, n))
            if sessions:
                s, e, n = sessions[-1]
                state.update((int(s), int(e), int(n)))
                # evict once the watermark passes end + gap
                state.setTimeoutTimestamp((e + gap_us) // 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": pd.to_datetime(
                        np.array([c[1] for c in closed], dtype="int64"),
                        unit="us",
                        utc=True,
                    ),
                    "session_end": pd.to_datetime(
                        np.array([c[2] for c in closed], dtype="int64"),
                        unit="us",
                        utc=True,
                    ),
                    "n_events": [c[3] for c in closed],
                }
            )

    return (
        stream.withWatermark("ts", delay)
        .select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            SESSION_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
