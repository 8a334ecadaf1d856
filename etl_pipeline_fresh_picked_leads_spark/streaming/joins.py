"""Stream-static joins: enrich a stream with a dimension table.

The static side is broadcast per micro-batch — no stream-side shuffle,
the same rule as the batch star joins (queries/joins.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dim(
    stream: DataFrame, dim: DataFrame, stream_key: str, dim_key: str
) -> DataFrame:
    return stream.join(
        F.broadcast(dim), stream[stream_key] == dim[dim_key], "inner"
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    time_col: str = "ts",
    max_lag: str = "2 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner interval join: right rows within
    ``(left.ts, left.ts + max_lag]`` of a matching-key left row.

    Both sides carry watermarks AND the join predicate carries an
    event-time range — together they let Spark bound the join state on
    BOTH sides (each side's buffered rows are evicted once the other
    side's watermark passes ts + max_lag).  Without the time-range
    condition the state would grow forever on a real feed; Spark 4
    refuses unbounded stream-stream joins in append mode for exactly
    that reason.  Columns come back prefixed l_/r_ so downstream
    projection never hits ambiguous names."""
    l = left.withWatermark(time_col, watermark).alias("l")
    r = right.withWatermark(time_col, watermark).alias("r")
    cond = F.expr(
        f"l.{key} = r.{key}"
        f" AND r.{time_col} >= l.{time_col}"
        f" AND r.{time_col} <= l.{time_col} + interval {max_lag}"
    )
    joined = l.join(r, cond, "inner")
    out = [
        F.col(f"l.{c}").alias(f"l_{c}") for c in left.columns
    ] + [F.col(f"r.{c}").alias(f"r_{c}") for c in right.columns]
    return joined.select(out)
