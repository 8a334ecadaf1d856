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


def stream_incremental_lsh(
    spark,
    landing_dir: str,
    index_root: str,
    pairs_root: str,
    checkpoint: str,
    threshold: float = 0.5,
):
    """Streaming near-dup dedup: each micro-batch of documents is
    paired against (itself ∪ everything already indexed) and the
    batch's signatures join the index — so a doc arriving today is
    checked against the whole history without ever re-reading history
    text.  This is `operators/dedup.incremental_lsh_pairs` driven by
    foreachBatch; both sinks are TxTables with per-batch txn tags, so
    an at-least-once replay after a crash commits each batch's pairs
    and signatures exactly once (same contract as
    `sinks.foreach_batch_upsert`).

    Union over batches = exactly the full-corpus LSH pairs (same hash
    family and banding; batch₀ pairs within itself, batchᵢ pairs
    against batch₀..ᵢ) — pinned in tests.
    """
    from ..operators.dedup import incremental_lsh_pairs, minhash_index_append
    from ..sources.txtable import TxTable

    schema = spark.read.parquet(landing_dir).schema

    def handle(batch_df, batch_id: int) -> None:
        pins: list = []
        try:
            pairs = incremental_lsh_pairs(
                batch_df, index_root, threshold, update_index=False,
                pins=pins,
            )
            if not TxTable.is_table(pairs_root):
                # empty-create + txn-append (not create-with-data):
                # create records no txn tag, so batch 0 would double
                # on replay
                TxTable.create(spark, pairs_root, pairs.limit(0))
            TxTable(spark, pairs_root).append(pairs, txn=f"pairs-{batch_id}")
            # signatures append AFTER pairs: a crash between the two
            # replays the batch, and both writes are idempotent under
            # their txn tags
            minhash_index_append(batch_df, index_root, txn=f"sig-{batch_id}")
        finally:  # a failed batch must not leak its signature cache
            for p in pins:
                p.unpersist()

    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
