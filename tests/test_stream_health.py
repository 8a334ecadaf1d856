"""stream_health (r12, VERDICT r11 #8): the streaming observability
surface — state rows/bytes, throughput, watermark lag — extracted
from lastProgress with no extra jobs."""

from __future__ import annotations

import uuid

from etl_pipeline_fresh_picked_leads_spark.queries.streaming import (
    events_stream,
    tumbling_counts,
)
from etl_pipeline_fresh_picked_leads_spark.streaming.windows import (
    watermarked_tumbling,
)
from etl_pipeline_fresh_picked_leads_spark.streaming.runner import (
    log_stream_health,
    stream_health,
)

SF = "/root/testdata/sf0.001"


def test_stream_health_fields_on_tumbling_query(spark):
    name = f"health_{uuid.uuid4().hex[:8]}"
    q = (
        tumbling_counts(events_stream(spark, SF))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(300)
        h = stream_health(q)
        assert h["status"] == "ok"
        assert h["name"] == name
        assert h["batch_id"] is not None
        assert h["num_input_rows"] is not None
        # the windowed aggregate holds state: rows and bytes visible
        assert h["n_state_operators"] >= 1
        assert h["state_rows"] > 0
        assert h["state_bytes"] > 0
        assert h["is_active"] is False
    finally:
        if q.isActive:
            q.stop()


def test_stream_health_watermark_on_watermarked_query(spark):
    """A withWatermark query surfaces the watermark and its lag —
    the unbounded-state early-warning number at 100 TB."""
    name = f"health_{uuid.uuid4().hex[:8]}"
    q = (
        watermarked_tumbling(events_stream(spark, SF))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(300)
        h = stream_health(q)
        assert h["status"] == "ok"
        assert h["event_time_max"] is not None
        assert h["watermark"] is not None
        # availableNow replays history: the final watermark trails the
        # max seen event time by the configured lateness
        if h["watermark_lag_s"] is not None:
            assert h["watermark_lag_s"] >= 0
    finally:
        if q.isActive:
            q.stop()


def test_stream_health_logs_structured_line(spark, caplog):
    import logging

    name = f"health_{uuid.uuid4().hex[:8]}"
    q = (
        tumbling_counts(events_stream(spark, SF))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(300)
        with caplog.at_level(
            logging.INFO, logger="etl_pipeline_fresh_picked_leads_spark"
        ):
            h = log_stream_health(q)
        assert h["status"] == "ok"
        assert any("stream_health" in r.message for r in caplog.records)
    finally:
        if q.isActive:
            q.stop()


def test_stream_health_before_first_progress():
    class _Dead:
        lastProgress = None
        isActive = False

    assert stream_health(_Dead()) == {"status": "no-progress"}
