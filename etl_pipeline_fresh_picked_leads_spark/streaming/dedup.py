"""Streaming deduplication: exactly-once rows out of at-least-once
feeds — the streaming form of the reference's implicit "don't load the
same file twice" ledger (/root/reference/big_uery_handler.py:84-89
deletes files as its dedup; we key state by event_id instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_by_id(stream: DataFrame, lateness: str = "1 hour") -> DataFrame:
    """Drop duplicate event_ids.  The watermark bounds the dedup state:
    an id older than ``lateness`` behind the stream can be evicted,
    which is what keeps state finite on an unbounded 100 TB feed."""
    return stream.withWatermark("ts", lateness).dropDuplicates(["event_id"])
