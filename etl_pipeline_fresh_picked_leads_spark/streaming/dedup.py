"""Streaming deduplication: exactly-once rows out of at-least-once
feeds — the streaming form of the reference's implicit "don't load the
same file twice" ledger (/root/reference/big_uery_handler.py:84-89
deletes files as its dedup; we key state by event_id instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_by_id(stream: DataFrame, lateness: str = "1 hour") -> DataFrame:
    """Drop duplicate event_ids.  ``dropDuplicatesWithinWatermark``
    (not plain ``dropDuplicates``) is what makes the watermark bound
    the dedup state: plain dropDuplicates only evicts state when the
    event-time column is part of the key subset, so keying by event_id
    alone would grow state forever on an unbounded feed.  The
    within-watermark variant evicts any key once it falls ``lateness``
    behind the stream — finite state on a 100 TB feed, at the cost of
    re-admitting a duplicate that arrives later than ``lateness``
    (which the watermark contract already declares out of scope)."""
    return stream.withWatermark("ts", lateness).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
