"""Streaming invariants the batch oracle can't check: watermark
late-data exclusion via multi-file replay (FIXTURES.md B4), streaming
dedup, foreachBatch upsert (SURVEY §5.2 item 5).
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from etl_pipeline_fresh_picked_leads_spark.streaming.dedup import dedup_by_id
from etl_pipeline_fresh_picked_leads_spark.streaming.runner import (
    run_available_now,
)
from etl_pipeline_fresh_picked_leads_spark.streaming.sinks import (
    foreach_batch_upsert,
)
from etl_pipeline_fresh_picked_leads_spark.streaming.windows import (
    watermarked_tumbling,
)


@pytest.fixture()
def replay_dir(spark, tmp_path):
    """Two-file ordered replay: batch0 = on-time events, batch1 = the
    same stream one hour later plus LATE stragglers >1h behind its max
    ts (the B4 watermark fixture), written as separate files so the
    file source delivers them as ordered micro-batches."""
    base = spark.range(0, 200).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).alias("user_id"),
        F.timestamp_micros(
            (F.lit(1700000000_000000) + F.col("id") * 30_000_000).cast("long")
        ).alias("ts"),
        (F.col("id") % 5.0).alias("value"),
    )
    d = str(tmp_path / "replay")
    os.makedirs(d)
    base.filter("event_id < 100").coalesce(1).write.mode("overwrite").parquet(
        d + "/b0"
    )
    late = spark.range(0, 5).select(
        (F.col("id") + 10_000).alias("event_id"),
        F.lit(0).cast("long").alias("user_id"),
        # ~83 h before the on-time batch: far outside any 1h watermark
        F.timestamp_micros(F.lit(1700000000_000000 - 300_000_000_000)).alias(
            "ts"
        ),
        F.lit(1.0).alias("value"),
    )
    base.filter("event_id >= 100").unionByName(late).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d + "/b1")
    # flat dir with both files, named in arrival order
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    i = 0
    for sub in ["b0", "b1"]:
        for f in sorted(os.listdir(f"{d}/{sub}")):
            if f.endswith(".parquet"):
                os.link(f"{d}/{sub}/{f}", f"{flat}/batch{i}.parquet")
                i += 1
    return flat


def _stream(spark, path):
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .parquet(path)
    )


def test_watermark_drops_late_rows(spark, replay_dir):
    """Rows arriving >1h behind the observed max ts must be excluded
    from their (already-finalized) windows; on-time windows whose end
    the final watermark passed are emitted exactly once."""
    out = run_available_now(
        watermarked_tumbling(_stream(spark, replay_dir), "1 hour", "1 hour"),
        spark,
        "append",
    )
    emitted = {
        (r.window_start, r.n_events) for r in out.collect()
    }
    # the late stragglers' ancient window must not appear
    assert not any(n == 5 for _, n in emitted)
    assert all(r.n_events > 0 for r in out.collect())
    # batch equivalent of the on-time data for cross-checking counts:
    batch = (
        spark.read.parquet(replay_dir)
        .filter("event_id < 10000")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    batch_counts = {
        (r.w.start, r.n) for r in batch.collect()
    }
    # every emitted window matches its batch count exactly
    for ws, n in emitted:
        assert (ws.replace(tzinfo=None), n) in {
            (w.replace(tzinfo=None), n2) for w, n2 in batch_counts
        }


def test_streaming_dedup_two_batches(spark, replay_dir):
    """The same event_id arriving in a later micro-batch (within the
    watermark) must be dropped: replay the flat dir twice via union."""
    s = _stream(spark, replay_dir)
    doubled = s.unionByName(_stream(spark, replay_dir))
    out = run_available_now(
        dedup_by_id(doubled, lateness="200 hours"), spark, "append"
    )
    ids = [r.event_id for r in out.select("event_id").collect()]
    assert len(ids) == len(set(ids))
    assert len(ids) == spark.read.parquet(replay_dir).select(
        "event_id"
    ).distinct().count()


def test_foreach_batch_upsert_idempotent_merge(spark, replay_dir, tmp_path):
    target = str(tmp_path / "tbl")
    s = _stream(spark, replay_dir).select("event_id", "user_id", "ts", "value")
    q = foreach_batch_upsert(s, spark, target, "event_id")
    assert q.awaitTermination(120)
    final = spark.read.parquet(target)
    assert final.count() == final.select("event_id").distinct().count()
    assert final.filter(F.col("Ingestion_date").isNull()).count() == 0
