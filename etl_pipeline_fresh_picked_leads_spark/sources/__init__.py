"""Sources: readers, catalog helpers, reconciliation ingest, sinks."""

from .readers import read_csv_inferred, read_table, table_path
from .catalog import table_exists, table_schema
from .ingest import (
    CAST_TARGETS,
    IngestResult,
    ingest_csv,
    ingest_directory,
    reconcile,
    spark_type_for,
    stamp_ingestion_date,
)

__all__ = [
    "CAST_TARGETS",
    "IngestResult",
    "ingest_csv",
    "ingest_directory",
    "read_csv_inferred",
    "read_table",
    "reconcile",
    "spark_type_for",
    "stamp_ingestion_date",
    "table_exists",
    "table_path",
    "table_schema",
]
