"""Ingestion engine: schema reconciliation + ingestion-date stamping.

This replicates the reference's complete computation semantics
(/root/reference/big_uery_handler.py):

- type-target map ``_CAST_TARGETS`` (:14-29) -> ``CAST_TARGETS``
- SAFE_CAST projection ``_safe_cast_expr`` (:32-42) -> ``try_cast``
  (bad values become NULL, never fail the load)
- append-via-staging reconciliation (:124-165): matched columns
  try_cast to the target type, target columns missing from the input
  NULL-filled, input-only columns silently dropped, output in target
  column order
- Ingestion_date maintenance (:173-194): ensure a DATE column exists
  and every row has it set

Deliberate deviations from the reference (documented in SURVEY.md
section 4.2 — these are scale/correctness fixes, not semantic drift):

- No materialized staging table: Spark pipelines the cast-projection
  straight into the append write, so the reference's extra full
  write+read of each batch (:126-136) disappears.
- Ingestion_date is stamped at write time (O(batch)) instead of a
  post-load full-table ``UPDATE ... WHERE Ingestion_date IS NULL``
  (:188-193, O(table) per batch — unusable at 100 TB).  Visible result
  is identical because the reference's UPDATE only touches NULLs.
- Files are moved to processed/ or failed/ instead of deleted even on
  failure (:84-89 deletes in ``finally`` — a data-loss bug we do not
  replicate).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field
from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    LongType,
    StringType,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from .catalog import table_exists, table_schema
from .readers import read_csv_inferred

INGESTION_DATE_COL = "Ingestion_date"

# Reference _CAST_TARGETS (big_uery_handler.py:14-29) mapped to Spark
# types per SURVEY.md section 1.3.  Unknown types fall back to STRING
# (big_uery_handler.py:37).  Known narrowings: BIGNUMERIC (76,38) ->
# Decimal(38,18) (Spark max precision is 38); TIME and GEOGRAPHY have
# no Spark type and are carried as strings (HH:mm:ss / WKT).
CAST_TARGETS: dict[str, DataType] = {
    "STRING": StringType(),
    "BOOL": BooleanType(),
    "BOOLEAN": BooleanType(),
    "INT64": LongType(),
    "INTEGER": LongType(),
    "FLOAT64": DoubleType(),
    "FLOAT": DoubleType(),
    "NUMERIC": DecimalType(38, 9),
    "BIGNUMERIC": DecimalType(38, 18),
    "DATE": DateType(),
    "DATETIME": TimestampNTZType(),
    "TIMESTAMP": TimestampType(),
    "TIME": StringType(),
    "GEOGRAPHY": StringType(),
}


def spark_type_for(type_name: str) -> DataType:
    """Resolve a reference type name to a Spark type (default STRING,
    matching big_uery_handler.py:37)."""
    return CAST_TARGETS.get(type_name.upper(), StringType())


def reconcile(df: DataFrame, target: StructType) -> DataFrame:
    """Project ``df`` onto ``target``'s schema, reference-style
    (big_uery_handler.py:147-156):

    - column in both: ``try_cast`` to the target type (SAFE_CAST
      semantics, :32-42 — strings use a plain cast, which for Spark is
      the same total operation);
    - column only in target: NULL of the target type (:152-154);
    - column only in ``df``: dropped (select list iterates target
      columns only, :148);
    - output column order = target order (:147-156,159).

    Pure projection — Catalyst folds it into whatever read/write it is
    attached to; no shuffle, no materialization.
    """
    have = {f.name.lower(): f.name for f in df.schema.fields}
    cols = []
    for f in target.fields:
        src = have.get(f.name.lower())
        if src is None:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif isinstance(f.dataType, StringType):
            cols.append(F.col(src).cast("string").alias(f.name))
        else:
            c = F.col(src).try_cast(f.dataType)
            if isinstance(f.dataType, DateType):
                # BigQuery DATE is bounded to [0001-01-01, 9999-12-31];
                # Spark's try_cast happily parses '-1000' as year -1000.
                # Clamp to the reference's domain (out-of-range -> NULL,
                # the same answer BigQuery SAFE_CAST gives).
                c = F.when(
                    c.between(
                        F.lit("0001-01-01").cast("date"),
                        F.lit("9999-12-31").cast("date"),
                    ),
                    c,
                )
            elif isinstance(f.dataType, (TimestampType, TimestampNTZType)):
                lo = F.lit("0001-01-01 00:00:00").cast(f.dataType)
                hi = F.lit("9999-12-31 23:59:59.999999").cast(f.dataType)
                c = F.when(c.between(lo, hi), c)
            cols.append(c.alias(f.name))
    return df.select(*cols)


def stamp_ingestion_date(df: DataFrame, run_date: date | None = None) -> DataFrame:
    """Ensure every row carries a non-NULL Ingestion_date.

    Write-time form of the reference's ADD COLUMN + UPDATE pair
    (big_uery_handler.py:173-194): rows that already have a value keep
    it; NULL/missing rows get the run date.
    """
    d = F.lit(str(run_date)).cast("date") if run_date else F.current_date()
    if INGESTION_DATE_COL in df.columns:
        return df.withColumn(
            INGESTION_DATE_COL, F.coalesce(F.col(INGESTION_DATE_COL).cast("date"), d)
        )
    return df.withColumn(INGESTION_DATE_COL, d)


@dataclass
class IngestResult:
    """Per-run summary — the persistent cross-run record is the
    IngestLedger (ledger.py), replacing the reference's
    delete-file-as-ledger (big_uery_handler.py:84-89).  ``pending``
    lists files whose checksum has a dangling 'loading' intent from a
    crashed earlier run: they are left in place, NOT reloaded, until
    an operator reconciles the ledger (see IngestLedger.pending)."""

    loaded: list[str] = field(default_factory=list)
    failed: dict[str, str] = field(default_factory=dict)
    skipped: list[str] = field(default_factory=list)
    pending: list[str] = field(default_factory=list)
    # populated by run_pipeline's post-load validator (pipeline.py):
    # {check_name: n_violations} for failed checks only
    dq_violations: dict[str, int] = field(default_factory=dict)


def table_name_for_file(file_name: str) -> str:
    """File -> table name: stem, lower-cased
    (big_uery_handler.py:74-75)."""
    return os.path.splitext(os.path.basename(file_name))[0].lower()


def ingest_csv(
    spark: SparkSession,
    path: str,
    table: str | None = None,
    run_date: date | None = None,
) -> str:
    """Load one CSV into its table, reference-style
    (big_uery_handler.py:93-106):

    - table absent: autodetect-create with overwrite (:104,108-122)
    - table present: reconcile to the target schema and append
      (:97,124-165) — no staging table; the cast-select pipelines into
      the write
    - either way, Ingestion_date ends up present and non-NULL
      (:173-194), stamped at write time
    """
    table = table or table_name_for_file(path)
    raw = read_csv_inferred(spark, path)
    if table_exists(spark, table):
        target = table_schema(spark, table)
        df = stamp_ingestion_date(reconcile(raw, target), run_date)
        df.write.mode("append").saveAsTable(table)
    else:
        df = stamp_ingestion_date(raw, run_date)
        df.write.mode("overwrite").saveAsTable(table)
    return table


def ingest_directory(
    spark: SparkSession,
    landing_dir: str,
    run_date: date | None = None,
    archive: bool = True,
    ledger: "IngestLedger | None" = None,
    max_workers: int = 8,
) -> IngestResult:
    """Scan a landing directory and load every ``*.csv``
    (big_uery_handler.py:68-89), with per-file error isolation
    (:78-83).  Successful files move to processed/, failed files to
    failed/ (deviation from the reference's unconditional delete,
    :84-89).  With a ledger, files whose content checksum was already
    loaded are skipped — exactly-once across reruns/replays — and each
    load writes a 'loading' intent first, so a crash between the Spark
    append and the ledger record surfaces as ``result.pending`` on the
    rerun instead of a silent double-load.

    Files are grouped by target table and tables load CONCURRENTLY
    (``max_workers`` driver threads, each submitting independent Spark
    jobs — the scheduler interleaves their stages across executors;
    the reference's one-at-a-time loop serialized cluster-wide I/O
    behind single-file reads).  Files of the SAME table stay
    sequential in name order: appends to one table must not race."""
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from .ledger import file_checksum

    result = IngestResult()
    lock = threading.Lock()

    def _archive(path: str, name: str, sub: str) -> None:
        dest = os.path.join(landing_dir, sub)
        os.makedirs(dest, exist_ok=True)
        target = os.path.join(dest, name)
        n = 1
        while os.path.exists(target):  # same name re-landed: keep both
            target = os.path.join(dest, f"{name}.{n}")
            n += 1
        shutil.move(path, target)

    def _load_one(table: str, name: str) -> None:
        path = os.path.join(landing_dir, name)
        checksum = file_checksum(path) if ledger else ""
        if ledger and ledger.already_loaded(checksum):
            with lock:
                result.skipped.append(name)
            if archive:
                _archive(path, name, "processed")
            return
        if ledger and ledger.pending(checksum):
            with lock:  # crashed mid-load earlier: needs reconciliation
                result.pending.append(name)
            return  # leave in place
        if ledger:
            ledger.record(checksum, name, table, "loading")
        try:
            ingest_csv(spark, path, table=table, run_date=run_date)
            with lock:
                result.loaded.append(name)
            if ledger:
                ledger.record(checksum, name, table, "loaded")
            dest = "processed"
        except Exception as exc:  # noqa: BLE001 — per-file isolation (:78-83)
            with lock:
                result.failed[name] = str(exc)
            if ledger:
                ledger.record(checksum, name, table, "failed")
            dest = "failed"
        if archive:
            _archive(path, name, dest)

    def _load_table(table: str, names: list[str]) -> None:
        for name in names:
            _load_one(table, name)

    by_table: dict[str, list[str]] = {}
    for name in sorted(os.listdir(landing_dir)):
        if name.lower().endswith(".csv"):
            by_table.setdefault(table_name_for_file(name), []).append(name)

    workers = max(1, min(max_workers, len(by_table)))
    if workers == 1:
        for table, names in by_table.items():
            _load_table(table, names)
    else:
        with ThreadPoolExecutor(workers) as pool:
            list(pool.map(_load_table, by_table.keys(), by_table.values()))
    result.loaded.sort()
    result.skipped.sort()
    result.pending.sort()
    return result
