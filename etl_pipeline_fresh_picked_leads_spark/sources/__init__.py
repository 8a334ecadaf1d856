"""Sources: readers, catalog helpers, reconciliation ingest, ledger,
maintenance, sinks."""

from .readers import (
    read_csv_inferred,
    read_json_inferred,
    read_table,
    register_tables,
    table_path,
)
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
from .ledger import IngestLedger, file_checksum
from .maintenance import (
    ensure_ingestion_date_column,
    set_ingestion_date_where_null,
)
from .sinks import (
    read_partition,
    write_append,
    write_overwrite,
    write_partitioned,
)

__all__ = [
    "CAST_TARGETS",
    "IngestLedger",
    "IngestResult",
    "ensure_ingestion_date_column",
    "file_checksum",
    "ingest_csv",
    "ingest_directory",
    "read_csv_inferred",
    "read_json_inferred",
    "read_partition",
    "read_table",
    "reconcile",
    "register_tables",
    "set_ingestion_date_where_null",
    "spark_type_for",
    "stamp_ingestion_date",
    "table_exists",
    "table_path",
    "table_schema",
    "write_append",
    "write_overwrite",
    "write_partitioned",
]
