"""Streaming CSV landing-dir ingest — the scale mapping of the
reference's batch directory scan (/root/reference/big_uery_handler.py:68-89)
to a Structured Streaming file source (the Auto-Loader shape promised
in SURVEY §2A R3).

One stream per target table (the file-source contract: a declared
schema per stream).  Exactly-once is layered:

- the file source's checkpoint tracks which landed files were read —
  the streaming replacement for the batch path's move-to-processed +
  checksum ledger (files stay in place);
- each micro-batch appends to the TxTable target under a txn tag
  derived from the checkpoint + batch_id, so a foreachBatch replay
  after a crash commits nothing twice (sources/txtable.py idempotent
  append — Delta's txnAppId/txnVersion pattern).

Each batch goes through the same ``reconcile`` + ``stamp_ingestion_date``
projection as batch ingest (sources/ingest.py), so dirty VALUES behave
identically (try_cast nulling).  Column LAYOUT is stricter than the
batch path: the file source applies one declared schema per stream,
so ``enforceSchema`` is disabled — a landed file whose header does not
match the first file's column layout fails the batch loudly instead of
being silently mis-parsed positionally (batch ingest, which reads each
file's own header, remains the path for heterogeneous layouts).
``trigger(availableNow=True)`` turns this into incremental batch: each
run drains whatever landed since the last run and stops — rerunning
picks up mid-stream arrivals exactly-once.  On a long-lived cluster
the same code runs with a processing-time trigger and
``maxFilesPerTrigger`` bounding batch size; at 100 TB/day the listing
cost, not the plan, is the knob (cloud-notification file discovery
replaces directory listing — the Auto-Loader/file-notification seam).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from ..sources.ingest import reconcile, stamp_ingestion_date
from ..sources.txtable import TxTable


def _landing_schema(spark: SparkSession, landing_dir: str) -> StructType:
    """All-string read schema from the header of the first landed CSV
    (the stream parses text; ``reconcile`` owns typing via try_cast,
    exactly like the batch path)."""
    first = sorted(
        n for n in os.listdir(landing_dir) if n.lower().endswith(".csv")
    )
    if not first:
        raise FileNotFoundError(f"no .csv under {landing_dir} to take a header from")
    header_df = (
        spark.read.option("header", True)
        .csv(os.path.join(landing_dir, first[0]))
        .limit(0)
    )
    return StructType(
        [StructField(c, StringType()) for c in header_df.columns]
    )


def stream_ingest_directory(
    spark: SparkSession,
    landing_dir: str,
    target_root: str,
    target_schema: StructType,
    run_date=None,
    checkpoint: str | None = None,
    max_files_per_trigger: int | None = None,
):
    """Drain ``landing_dir`` into the TxTable at ``target_root``.
    Returns the started StreamingQuery (availableNow trigger — caller
    awaits termination; rerun with the same checkpoint to ingest files
    landed since)."""
    checkpoint = checkpoint or target_root + "_chk"
    reader = (
        spark.readStream.schema(_landing_schema(spark, landing_dir))
        .option("header", True)
        # Validate each file's header against the declared schema —
        # without this the all-string schema is applied POSITIONALLY
        # and a reordered/extra-column file is silently mis-parsed.
        .option("enforceSchema", False)
        .option("pathGlobFilter", "*.csv")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.csv(landing_dir)

    table = TxTable(spark, target_root)
    tag = os.path.basename(checkpoint.rstrip("/"))

    def _apply(batch_df, batch_id: int) -> None:
        out = stamp_ingestion_date(reconcile(batch_df, target_schema), run_date)
        table.append(out, txn=f"{tag}:{batch_id}")

    return (
        stream.writeStream.foreachBatch(_apply)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .start()
    )
