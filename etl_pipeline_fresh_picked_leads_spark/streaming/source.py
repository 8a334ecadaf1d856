"""Streaming file source over the events table.

At production scale this is a directory the ingest layer lands files
into (the streaming generalization of the reference's landing-dir scan,
/root/reference/big_uery_handler.py:68-79): the file source tracks
processed files exactly-once and ``maxFilesPerTrigger`` bounds batch
size.  Tests replay the static parquet with ``availableNow``.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import table_path


def _staging_dir(src_path: str) -> str:
    """The file source wants a directory it can list for new files;
    stage a directory holding a symlink to the (read-only) parquet."""
    tag = hashlib.sha1(src_path.encode()).hexdigest()[:12]
    d = os.path.join(
        tempfile.gettempdir(), "fpl_spark_scratch", "stream_src", tag
    )
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, os.path.basename(src_path))
    if not os.path.exists(link):
        os.symlink(src_path, link)
    return d


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet, with the same
    TIMESTAMP(NANOS) -> microsecond conversion as the batch reader
    (sources/readers.py)."""
    from ..session import ensure_engine_confs

    ensure_engine_confs(spark)
    path = table_path(sf_dir, "events")
    schema = spark.read.parquet(path).schema  # raw: ts is bigint nanos
    df = spark.readStream.schema(schema).parquet(_staging_dir(path))
    # Event time must end up tz-aware TIMESTAMP: watermarks/event-time
    # require it; query wrappers cast result columns back to NTZ for
    # output parity (identity under the UTC session).  Two source
    # encodings occur: TIMESTAMP(NANOS) read as raw bigint nanos
    # (nanosAsLong), and TIMESTAMP(MICROS, isAdjustedToUTC=false) read
    # natively as TIMESTAMP_NTZ.
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
