"""Streaming sinks: foreachBatch incremental upsert.

This is the reference's append + ingestion-date maintenance
(/root/reference/big_uery_handler.py:158-194) made incremental: each
micro-batch is reconciled/stamped and merged into the target by key.

Two backends:

- ``transactional=True`` (default): the target is a TxTable
  (sources/txtable.py) — the merge rewrites only the files holding
  colliding keys (file-granular copy-on-write) and commits atomically,
  so a crash mid-batch leaves the previous snapshot intact and the
  foreachBatch replay simply redoes the batch.  This is the 100 TB
  shape: per-trigger cost is O(batch + files-hit-by-batch-keys), not
  O(table).  With delta-spark on the classpath the same contract is
  ``DeltaTable.merge`` (txtable.delta_available is the seam).
- ``transactional=False``: plain parquet directory,
  read-union-dedup-rewrite.  O(table) per trigger, and the overwrite
  is staged + renamed so the previous table survives a crash up to the
  final atomic rename (a crash between the two renames leaves the old
  data recoverable under ``<target>.old``).  Kept for reading the
  result with a bare ``spark.read.parquet``.
"""

from __future__ import annotations

import os
import shutil
from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.ingest import stamp_ingestion_date
from ..sources.txtable import TxTable


def upsert_batch(
    spark: SparkSession,
    batch: DataFrame,
    target_dir: str,
    key: str,
    run_date: date | None = None,
    transactional: bool = True,
) -> None:
    """Merge one micro-batch into ``target_dir`` keyed by ``key``;
    newest batch wins on conflict.  Batch rows get Ingestion_date
    stamped at write time (big_uery_handler.py:183-194 semantics)."""
    batch = stamp_ingestion_date(batch, run_date)
    if transactional:
        TxTable(spark, target_dir).upsert(batch, key)
        return
    batch = batch.withColumn("_src_pri", F.lit(0))
    if os.path.isdir(target_dir):
        existing = spark.read.parquet(target_dir).withColumn("_src_pri", F.lit(1))
        merged = batch.unionByName(existing)
    else:
        merged = batch
    w = Window.partitionBy(key).orderBy("_src_pri")
    deduped = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src_pri")
    )
    # Stage the rewrite, then swap via atomic renames: the scan and
    # the overwrite never race, and the previous table exists on disk
    # (as <target> or <target>.old) at every instant — a crash cannot
    # destroy both the old and the new state.
    stage, old = target_dir + ".stage", target_dir + ".old"
    shutil.rmtree(stage, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    deduped.write.parquet(stage)
    if os.path.isdir(target_dir):
        os.rename(target_dir, old)
    os.rename(stage, target_dir)
    shutil.rmtree(old, ignore_errors=True)


def foreach_batch_upsert(
    stream: DataFrame,
    spark: SparkSession,
    target_dir: str,
    key: str,
    run_date: date | None = None,
    transactional: bool = True,
):
    """writeStream.foreachBatch wiring for upsert_batch; returns the
    StreamingQuery (caller controls trigger/termination)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        upsert_batch(spark, batch_df, target_dir, key, run_date, transactional)

    return (
        stream.writeStream.foreachBatch(_apply)
        .trigger(availableNow=True)
        .option("checkpointLocation", target_dir + "_chk")
        .start()
    )


def foreach_batch_scd2(
    stream: DataFrame,
    spark: SparkSession,
    dim_root: str,
    key: str,
    tracked: list[str],
    checkpoint: str,
    eff_col: str = "eff_date",
):
    """Streaming SCD2 maintenance: each micro-batch of dimension
    updates (effective date riding in ``eff_col``) folds into the
    TxTable-backed SCD2 dimension at ``dim_root`` via
    operators/scd.scd2_apply, and the FULL new state commits
    atomically under the batch's txn tag — a replayed batch sees its
    tag and no-ops, so at-least-once delivery is exactly-once at the
    table (pinned in tests/test_streaming_multibatch.py).

    The tag is CONTENT-derived (batch_id + row count + order-
    insensitive row hash), not batch_id alone: after a checkpoint
    LOSS, a restart re-reads the landing dir as a fresh batch 0, and
    if new files landed meanwhile that "batch 0" carries MORE data
    than the committed one — a batch-id tag would no-op it and
    silently drop the new rows.  With the content tag a divergent
    bundle proceeds: already-applied rows re-fold as no-ops
    (scd2_apply only versions on tracked-value CHANGE), new rows
    apply, and only a genuinely out-of-order effective date is
    refused loudly (below).

    SCD2 application does not commute: a batch spanning several
    effective dates applies them ascending, and a batch whose
    effective date PRECEDES already-applied history is refused loudly
    rather than committing valid_to < valid_from rows.  (This also
    means a divergent checkpoint-loss bundle that mixes a committed
    MULTI-date batch with new data fails loudly instead of guessing —
    applied_thru sits past the bundle's earliest date.)  The
    dimension must already exist (scd2_init + TxTable.create)."""
    from pyspark.sql import functions as F

    from ..operators.scd import scd2_apply
    from ..sources.txtable import TxTable

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        dim = TxTable(spark, dim_root)
        # Idempotency FIRST (ADVICE r6), on batch CONTENT: if the
        # order guard below ran first, a replayed batch would see
        # applied_thru including its own dates and raise.  The
        # order-insensitive xxhash64 sum is partition-layout-proof;
        # DECIMAL accumulation because a LONG sum of 64-bit hashes
        # overflows under ANSI.
        fp = batch_df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64(*batch_df.columns).cast("decimal(38,0)")
            ).alias("h"),
        ).collect()[0]
        tag = f"scd2-{batch_id}-{fp['n']}-{fp['h'] or 0}"
        if dim.has_txn(tag):
            return
        state = dim.read()
        applied_thru = state.agg(F.max("valid_from")).collect()[0][0]
        effs = sorted(
            r[0] for r in batch_df.select(eff_col).distinct().collect()
        )
        for eff in effs:
            if str(eff) < str(applied_thru):
                raise RuntimeError(
                    f"SCD2 batch effective {eff} arrived after "
                    f"{applied_thru} was applied — refusing to rewrite "
                    "history out of order"
                )
            state = scd2_apply(
                state,
                batch_df.filter(F.col(eff_col) == eff).drop(eff_col),
                key,
                tracked,
                eff,
            )
        dim.overwrite(state, txn=tag)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
