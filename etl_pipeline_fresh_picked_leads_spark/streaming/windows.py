"""Streaming window aggregations (tumbling / sliding / session) and
watermarking.

All aggregate values go through DECIMAL accumulation like the batch
side (queries/registry.py): micro-batch partial aggregation order must
not change results between a replay and the original run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dsum6(col: str) -> F.Column:
    return F.sum(F.col(col).cast("decimal(18,6)")).cast("double")


def tumbling_counts(stream: DataFrame, width: str = "1 hour") -> DataFrame:
    """Count/sum per event_type per tumbling window (epoch-aligned,
    same alignment as SQL date_trunc)."""
    return (
        stream.groupBy(F.window("ts", width).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum6("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    stream: DataFrame, width: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    """Overlapping windows: each event lands in width/slide windows."""
    return (
        stream.groupBy(F.window("ts", width, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"), _dsum6("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )


def session_counts(stream: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based session windows per user: a session extends while
    events arrive within ``gap`` of the previous one; session end =
    last event + gap.  Watermark bounds session state; append mode
    emits a session once the watermark passes its end."""
    return (
        stream.withWatermark("ts", "0 seconds")
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


def watermarked_tumbling(
    stream: DataFrame, width: str = "1 hour", lateness: str = "1 hour"
) -> DataFrame:
    """Tumbling agg with a late-data watermark: events more than
    ``lateness`` behind the max seen ts are dropped from their (already
    finalized) windows; append mode emits a window only once the
    watermark passes its end, so trailing unfinalized windows are
    withheld — both behaviors are the correctness contract for
    out-of-order data at scale."""
    return (
        stream.withWatermark("ts", lateness)
        .groupBy(F.window("ts", width).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_events",
        )
    )
