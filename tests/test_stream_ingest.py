"""Streaming landing-dir ingest (streaming/ingest.py) — SURVEY §2A R3
at streaming scale: CSVs landing mid-stream are drained exactly-once
into a TxTable target and the result equals the batch ingest path.
"""

from __future__ import annotations

from datetime import date

from pyspark.sql.types import (
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_pipeline_fresh_picked_leads_spark.sources.ingest import (
    reconcile,
    stamp_ingestion_date,
)
from etl_pipeline_fresh_picked_leads_spark.sources.txtable import TxTable
from etl_pipeline_fresh_picked_leads_spark.streaming.ingest import (
    stream_ingest_directory,
)

TARGET = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("score", DoubleType()),
        StructField("Ingestion_date", DateType()),
    ]
)

FILE1 = "id,name,score\n1,alice,1.5\n2,bob,oops\n"
FILE2 = "id,name,score\n3,carol,2.5\n4,dave,\n"


def _run(spark, landing, target, chk):
    q = stream_ingest_directory(
        spark, str(landing), str(target), TARGET,
        run_date=date(2026, 8, 13), checkpoint=str(chk),
    )
    assert q.awaitTermination(120)


def test_mid_stream_landing_exactly_once(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    target, chk = tmp_path / "tbl", tmp_path / "chk"

    (landing / "leads_a.csv").write_text(FILE1)
    _run(spark, landing, target, chk)
    t = TxTable(spark, str(target))
    assert sorted(r.id for r in t.read().collect()) == [1, 2]

    # land a second file "mid-stream"; the next availableNow run picks
    # up only the new file (checkpoint = the ledger)
    (landing / "leads_b.csv").write_text(FILE2)
    _run(spark, landing, target, chk)
    rows = {r.id: r for r in t.read().collect()}
    assert sorted(rows) == [1, 2, 3, 4]
    # reconcile semantics intact: dirty value -> NULL, stamping applied
    assert rows[2].score is None
    assert all(r.Ingestion_date == date(2026, 8, 13) for r in rows.values())

    # third run with nothing new must commit nothing
    v = t.snapshot().version
    _run(spark, landing, target, chk)
    assert t.snapshot().version == v


def test_stream_matches_batch_reconcile(spark, tmp_path):
    """The streamed table equals the batch reconcile+stamp projection
    of the same files (same rows, same NULLing, same stamping)."""
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "leads_a.csv").write_text(FILE1)
    (landing / "leads_b.csv").write_text(FILE2)
    _run(spark, landing, tmp_path / "tbl", tmp_path / "chk")
    streamed = TxTable(spark, str(tmp_path / "tbl")).read()

    raw = spark.read.option("header", True).csv(str(landing))
    batch = stamp_ingestion_date(reconcile(raw, TARGET), date(2026, 8, 13))
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_replayed_batch_txn_is_skipped(spark, tmp_path):
    """Simulate a foreachBatch replay: appending the same txn tag
    twice lands once (TxTable idempotent append)."""
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    t = TxTable.create(spark, str(tmp_path / "t"), df)
    v = t.append(df, txn="chk:7")
    assert t.append(df, txn="chk:7") == v
    assert t.read().count() == 2  # create + one append, not two

def test_mismatched_header_fails_loudly(spark, tmp_path):
    """A landed file whose header does not match the stream's declared
    column layout must FAIL the batch (enforceSchema=False), never be
    silently mis-parsed positionally (ADVICE r2: reordered columns
    previously landed values in the wrong fields)."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import StreamingQueryException

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "leads_a.csv").write_text(FILE1)
    # reordered columns: positionally valid, by-name wrong
    (landing / "leads_z.csv").write_text("name,id,score\neve,5,3.5\n")
    with pytest.raises((StreamingQueryException, Py4JJavaError, Exception)) as ei:
        q = stream_ingest_directory(
            spark, str(landing), str(tmp_path / "tbl"), TARGET,
            run_date=date(2026, 8, 13), checkpoint=str(tmp_path / "chk"),
        )
        q.awaitTermination(120)
        if q.exception() is not None:
            raise q.exception()
    assert "header" in str(ei.value).lower() or "schema" in str(ei.value).lower()
