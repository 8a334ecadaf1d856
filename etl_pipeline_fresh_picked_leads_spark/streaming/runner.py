"""Run a streaming DataFrame to completion and hand back the result.

``availableNow`` processes everything currently in the source (in
bounded batches) and stops — the same trigger a production backfill
uses; the memory sink is only for tests/oracle comparison, real
deployments write parquet/foreachBatch sinks (sinks.py).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession


def run_available_now(
    df: DataFrame,
    spark: SparkSession,
    output_mode: str = "append",
    timeout_s: int = 300,
) -> DataFrame:
    """Execute ``df`` with Trigger.AvailableNow into a memory sink and
    return the completed result as a batch DataFrame."""
    name = f"stream_{uuid.uuid4().hex[:12]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_s):
            raise TimeoutError(f"stream {name} did not finish in {timeout_s}s")
    finally:
        if q.isActive:
            q.stop()
    return spark.table(name)
