"""Streaming sinks: foreachBatch incremental upsert.

This is the reference's append + ingestion-date maintenance
(/root/reference/big_uery_handler.py:158-194) made incremental: each
micro-batch is reconciled/stamped and merged into the target by key.
Plain parquet has no MERGE, so the upsert is read-union-dedup-rewrite;
on a real deployment the target would be a Delta/Iceberg table and
this becomes a metadata-only MERGE — the operator contract is the
same.
"""

from __future__ import annotations

import os
from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.ingest import stamp_ingestion_date


def upsert_batch(
    spark: SparkSession,
    batch: DataFrame,
    target_dir: str,
    key: str,
    run_date: date | None = None,
) -> None:
    """Merge one micro-batch into ``target_dir`` keyed by ``key``;
    newest batch wins on conflict.  Batch rows get Ingestion_date
    stamped at write time (big_uery_handler.py:183-194 semantics)."""
    batch = stamp_ingestion_date(batch, run_date).withColumn(
        "_src_pri", F.lit(0)
    )
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
    # localCheckpoint breaks lineage before overwriting the directory
    # we just read (otherwise the scan and the overwrite race).
    deduped.localCheckpoint(eager=True).write.mode("overwrite").parquet(target_dir)


def foreach_batch_upsert(
    stream: DataFrame,
    spark: SparkSession,
    target_dir: str,
    key: str,
    run_date: date | None = None,
):
    """writeStream.foreachBatch wiring for upsert_batch; returns the
    StreamingQuery (caller controls trigger/termination)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        upsert_batch(spark, batch_df, target_dir, key, run_date)

    return (
        stream.writeStream.foreachBatch(_apply)
        .trigger(availableNow=True)
        .option("checkpointLocation", target_dir + "_chk")
        .start()
    )
