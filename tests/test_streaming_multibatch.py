"""Multi-batch replay robustness (VERDICT r2 #9): every oracle-checked
streaming query must produce the SAME result whether availableNow
drains the source in one batch or several (maxFilesPerTrigger=1 over a
two-file, time-ordered copy of events — honored under availableNow in
Spark 4.1.2, probe-verified).  This pins down the single-batch-replay
assumption so it can never silently become load-bearing: state must
carry across micro-batches (window partials, session merges, dedup
keys, join buffers, custom state) and intermediate watermarks must not
drop in-order data.
"""

from __future__ import annotations

import os
import shutil
import time

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_pipeline_fresh_picked_leads_spark.sources.readers import read_table
from etl_pipeline_fresh_picked_leads_spark.streaming.dedup import dedup_by_id
from etl_pipeline_fresh_picked_leads_spark.streaming.joins import (
    interval_join_streams,
)
from etl_pipeline_fresh_picked_leads_spark.streaming.runner import (
    run_available_now,
)
from etl_pipeline_fresh_picked_leads_spark.streaming.stateful import (
    running_user_totals,
)
from etl_pipeline_fresh_picked_leads_spark.streaming.windows import (
    session_counts,
    sliding_counts,
    tumbling_counts,
    watermarked_tumbling,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def split_events(spark, tmp_path_factory):
    """Events split at the median ts into two time-ordered files
    (file0 strictly earlier, mtime-ordered so the file source replays
    them oldest-first) — in-order arrival, so watermarks finalize
    early windows between batches but never drop data."""
    ev = read_table(spark, SF, "events")
    lo, hi = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    med = lo + (hi - lo) / 2
    d = str(tmp_path_factory.mktemp("split_events"))
    parts = {
        0: ev.filter(F.col("ts") <= F.lit(med)),
        1: ev.filter(F.col("ts") > F.lit(med)),
    }
    flat = os.path.join(d, "flat")
    os.makedirs(flat)
    now = time.time()
    for i, part in parts.items():
        sub = os.path.join(d, f"_p{i}")
        part.coalesce(1).write.parquet(sub)
        src = next(f for f in os.listdir(sub) if f.endswith(".parquet"))
        dst = os.path.join(flat, f"b{i}.parquet")
        shutil.copyfile(os.path.join(sub, src), dst)
        os.utime(dst, (now - 100 + i * 30,) * 2)
    schema = spark.read.parquet(flat).schema
    return {"dir": flat, "schema": schema}


def _stream(spark, fx, multi: bool):
    r = spark.readStream.schema(fx["schema"])
    if multi:
        r = r.option("maxFilesPerTrigger", "1")
    # event time must be tz-aware for watermarks/session windows
    # (identity under the UTC session; batch files store NTZ)
    return r.parquet(fx["dir"]).withColumn("ts", F.col("ts").cast("timestamp"))


def _rows(df, cols=None):
    cols = cols or df.columns
    return sorted(map(tuple, df.select(*cols).collect()))


def _both(spark, fx, transform, mode):
    one = run_available_now(transform(_stream(spark, fx, False)), spark, mode)
    many = run_available_now(transform(_stream(spark, fx, True)), spark, mode)
    return one, many


def test_batch_count_actually_differs(spark, split_events):
    """Guard the guard: the multi-file replay really is multi-batch."""
    seen = []
    q = (
        _stream(spark, split_events, True)
        .writeStream.foreachBatch(lambda b, i: seen.append(i))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    assert len(seen) >= 2


@pytest.mark.parametrize(
    "transform,mode",
    [
        pytest.param(tumbling_counts, "complete", id="tumbling"),
        pytest.param(sliding_counts, "complete", id="sliding"),
        pytest.param(session_counts, "complete", id="session"),
    ],
)
def test_windowed_aggs_batch_count_invariant(
    spark, split_events, transform, mode
):
    """Complete-mode windowed aggs: partial window/session state must
    merge across micro-batches — final output identical to the
    single-batch replay (which the DuckDB oracle already pins)."""
    one, many = _both(spark, split_events, transform, mode)
    assert _rows(many) == _rows(one)


def test_watermark_append_emission_batch_count_invariant(spark, split_events):
    """Append mode with in-order multi-batch arrival: intermediate
    watermarks emit early windows sooner, but the UNION of emissions
    equals the single-batch emission set (final watermark identical)."""
    one, many = _both(
        spark, split_events, lambda s: watermarked_tumbling(s), "append"
    )
    assert _rows(many) == _rows(one)


def test_dedup_batch_count_invariant(spark, split_events):
    """Dedup state (seen event_ids) must persist across batches: the
    doubled stream still comes out exactly-once under multi-batch."""

    def doubled(multi):
        s = _stream(spark, split_events, multi)
        return dedup_by_id(
            s.unionByName(_stream(spark, split_events, multi)),
            lateness="200 hours",
        )

    one = run_available_now(doubled(False), spark, "append")
    many = run_available_now(doubled(True), spark, "append")
    assert _rows(many, ["event_id"]) == _rows(one, ["event_id"])


def test_stream_stream_join_batch_count_invariant(spark, split_events):
    """Interval-join buffers must hold click rows until their 2h match
    window closes — pairs spanning the batch boundary must still match."""

    def joined(multi):
        clicks = _stream(spark, split_events, multi).filter(
            F.col("event_type") == "click"
        )
        purchases = _stream(spark, split_events, multi).filter(
            F.col("event_type") == "purchase"
        )
        return interval_join_streams(
            clicks, purchases, key="user_id", time_col="ts", max_lag="2 hours"
        ).select("l_event_id", "r_event_id")

    one = run_available_now(joined(False), spark, "append")
    many = run_available_now(joined(True), spark, "append")
    assert _rows(many) == _rows(one)
    # and pairs genuinely cross the file split (the state carry matters)
    assert len(_rows(one)) > 0


def test_stateful_totals_batch_count_invariant(spark, split_events):
    """applyInPandasWithState: per-user state must survive micro-batch
    boundaries; collapsing update-mode emissions to each key's final
    row gives the same totals either way."""

    def final_state(multi):
        hist = run_available_now(
            running_user_totals(_stream(spark, split_events, multi)),
            spark,
            "update",
        )
        w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
        return (
            hist.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    assert _rows(final_state(True)) == _rows(final_state(False))


def test_event_time_sessions_out_of_order_resplit(spark, tmp_path):
    """A not-yet-late out-of-order event arriving in a LATER micro-
    batch must re-split against the carried state session (ADVICE r4):
    within-gap-before-start extends session_start backwards; far-
    earlier forms its own session.  The old signed `t - end <= gap`
    merge absorbed both into the open session with an unchanged
    start."""
    from datetime import datetime, timezone

    from etl_pipeline_fresh_picked_leads_spark.streaming.stateful import (
        event_time_sessions,
    )

    def t(sec):
        return datetime.fromtimestamp(sec, tz=timezone.utc).replace(tzinfo=None)

    batches = [
        [(1, t(1000)), (1, t(1030))],
        # 985 is 15s before the open session's start (within the 60s
        # gap -> extend start back); 700 is 285s before (own session,
        # closed immediately); 40000 opens a new trailing session
        [(1, t(985)), (1, t(700)), (1, t(40000))],
    ]
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    now = time.time()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz")
        sub = str(tmp_path / f"_p{i}")
        df.coalesce(1).write.parquet(sub)
        src = next(f for f in os.listdir(sub) if f.endswith(".parquet"))
        dst = os.path.join(flat, f"b{i}.parquet")
        shutil.copyfile(os.path.join(sub, src), dst)
        os.utime(dst, (now - 100 + i * 30,) * 2)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp_ntz")
        .option("maxFilesPerTrigger", "1")
        .parquet(flat)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = run_available_now(
        event_time_sessions(stream, 1, "1 hour"), spark, "append"
    )
    got = {
        (r.user_id, r.s, r.e, r.n_events)
        for r in out.select(
            "user_id",
            F.unix_micros("session_start").alias("s"),
            F.unix_micros("session_end").alias("e"),
            "n_events",
        ).collect()
    }
    m = 1_000_000
    # trailing [40000] session never times out (wm = 40000s - 1h)
    assert got == {(1, 700 * m, 700 * m, 1), (1, 985 * m, 1030 * m, 3)}


@pytest.mark.parametrize("multi", [False, True])
def test_event_time_timeout_sessions_match_batch(spark, split_events, multi):
    """event_time_sessions (EventTimeTimeout state eviction): emitted
    sessions = every batch-computed gap session EXCEPT a user's
    trailing session whose timeout (end + gap) the final watermark
    (max ts − delay) never passed.  Identical for 1-batch and
    multi-batch replays — in-stream closes don't depend on batching
    and timeouts depend only on the final watermark."""
    from etl_pipeline_fresh_picked_leads_spark.streaming.stateful import (
        event_time_sessions,
    )

    gap_min = 30
    gap_us = gap_min * 60 * 1_000_000
    delay_us = 3_600 * 1_000_000

    stream = _stream(spark, split_events, multi)
    got_df = run_available_now(
        event_time_sessions(stream, gap_min, "1 hour"), spark, "append"
    )
    got = {
        (r.user_id, r.s, r.e, r.n_events)
        for r in got_df.select(
            "user_id",
            F.unix_micros("session_start").alias("s"),
            F.unix_micros("session_end").alias("e"),
            "n_events",
        ).collect()
    }

    ev = read_table(spark, SF, "events").select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us")
    sess = (
        ev.withColumn("prev", F.lag("us").over(w))
        .withColumn(
            "new_s",
            (F.col("prev").isNull() | ((F.col("us") - F.col("prev")) > gap_us))
            .cast("int"),
        )
        .withColumn("sid", F.sum("new_s").over(w))
        .groupBy("user_id", "sid")
        .agg(
            F.min("us").alias("s"),
            F.max("us").alias("e"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    max_us = ev.agg(F.max("us")).collect()[0][0]
    wm_ms = (max_us - delay_us) // 1000
    last = Window.partitionBy("user_id")
    expected = {
        (r.user_id, r.s, r.e, r.n)
        for r in sess.withColumn("max_sid", F.max("sid").over(last))
        .filter(
            (F.col("sid") != F.col("max_sid"))
            | (((F.col("e") + gap_us) / F.lit(1000)).cast("long") < wm_ms)
        )
        .collect()
    }
    assert got == expected and len(got) > 0


def test_stream_scd2_replay_is_exactly_once_and_order_guarded(spark, tmp_path):
    """foreach_batch_scd2: (a) re-running the whole stream over the
    same landing + checkpoint must not re-apply batches (txn tags
    no-op a replay), and (b) an out-of-order effective date is
    REFUSED, never committed as corrupt history."""
    from etl_pipeline_fresh_picked_leads_spark.operators.scd import scd2_init
    from etl_pipeline_fresh_picked_leads_spark.sources.txtable import TxTable
    from etl_pipeline_fresh_picked_leads_spark.streaming.sinks import (
        foreach_batch_scd2,
    )

    base = str(tmp_path)
    landing = os.path.join(base, "landing")
    os.makedirs(landing)
    dim_root = os.path.join(base, "dim")
    cust = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, bal double"
    )
    TxTable.create(spark, dim_root, scd2_init(cust, "2024-01-01"))
    b1 = cust.filter("k <= 2").select(
        "k", (F.col("bal") + 5).alias("bal"), F.lit("2024-03-01").alias("eff_date")
    )
    for i, b in enumerate((b1,)):
        tmp = os.path.join(base, f"tmp{i}")
        b.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        os.rename(os.path.join(tmp, src), os.path.join(landing, f"b{i}.parquet"))

    def drain():
        q = foreach_batch_scd2(
            spark.readStream.schema(b1.schema).parquet(landing),
            spark, dim_root, "k", ["bal"],
            checkpoint=os.path.join(base, "chk"),
        )
        assert q.awaitTermination(300)

    drain()
    v1 = TxTable(spark, dim_root).snapshot().version
    state1 = sorted(
        (r.k, str(r.valid_from), str(r.valid_to), r.is_current)
        for r in TxTable(spark, dim_root).read().collect()
    )
    drain()  # full replay over the same checkpoint: must no-op
    assert TxTable(spark, dim_root).snapshot().version == v1
    state2 = sorted(
        (r.k, str(r.valid_from), str(r.valid_to), r.is_current)
        for r in TxTable(spark, dim_root).read().collect()
    )
    assert state2 == state1
    assert sum(1 for s in state1 if s[3]) == 3  # one current row per key

    # out-of-order batch (eff before the applied 2024-03-01): refused
    stale = cust.filter("k = 3").select(
        "k", (F.col("bal") + 9).alias("bal"), F.lit("2024-02-01").alias("eff_date")
    )
    tmp = os.path.join(base, "tmpx")
    stale.coalesce(1).write.mode("overwrite").parquet(tmp)
    src = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.rename(os.path.join(tmp, src), os.path.join(landing, "b9.parquet"))
    q = foreach_batch_scd2(
        spark.readStream.schema(b1.schema).parquet(landing),
        spark, dim_root, "k", ["bal"],
        checkpoint=os.path.join(base, "chk"),
    )
    with pytest.raises(Exception, match="out of order"):
        q.awaitTermination(300)
        raise RuntimeError("stream should have failed")
    assert TxTable(spark, dim_root).snapshot().version == v1  # nothing committed


def test_stream_scd2_checkpoint_loss_replay_noops(spark, tmp_path):
    """ADVICE r6 (medium): a checkpoint-LOSS replay re-delivers a
    committed batch under the same batch_id.  When that batch spans
    MULTIPLE effective dates, applied_thru already includes the
    batch's latest date, so the out-of-order guard would reject its
    earliest date — the txn-tag idempotency check must run FIRST and
    no-op the whole batch."""
    from etl_pipeline_fresh_picked_leads_spark.operators.scd import scd2_init
    from etl_pipeline_fresh_picked_leads_spark.sources.txtable import TxTable
    from etl_pipeline_fresh_picked_leads_spark.streaming.sinks import (
        foreach_batch_scd2,
    )

    base = str(tmp_path)
    landing = os.path.join(base, "landing")
    os.makedirs(landing)
    dim_root = os.path.join(base, "dim")
    cust = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "k long, bal double"
    )
    TxTable.create(spark, dim_root, scd2_init(cust, "2024-01-01"))
    # ONE batch carrying TWO effective dates: after commit,
    # applied_thru = 2024-04-01 > the batch's own 2024-03-01.
    batch = spark.createDataFrame(
        [(1, 15.0, "2024-03-01"), (2, 25.0, "2024-04-01")],
        "k long, bal double, eff_date string",
    )
    tmp = os.path.join(base, "tmp0")
    batch.coalesce(1).write.mode("overwrite").parquet(tmp)
    src = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.rename(os.path.join(tmp, src), os.path.join(landing, "b0.parquet"))

    def drain(chk):
        q = foreach_batch_scd2(
            spark.readStream.schema(batch.schema).parquet(landing),
            spark, dim_root, "k", ["bal"],
            checkpoint=os.path.join(base, chk),
        )
        assert q.awaitTermination(300)

    drain("chk")
    v1 = TxTable(spark, dim_root).snapshot().version
    state1 = sorted(
        (r.k, str(r.valid_from), str(r.valid_to), r.is_current, r.bal)
        for r in TxTable(spark, dim_root).read().collect()
    )
    # Checkpoint loss: a FRESH checkpoint restarts batch ids at 0 and
    # re-delivers the same file — the committed content tag (same
    # bytes -> same tag) must no-op it (pre-fix: RuntimeError "out of
    # order" from the eff guard).
    drain("chk_fresh")
    assert TxTable(spark, dim_root).snapshot().version == v1
    state2 = sorted(
        (r.k, str(r.valid_from), str(r.valid_to), r.is_current, r.bal)
        for r in TxTable(spark, dim_root).read().collect()
    )
    assert state2 == state1


def test_stream_scd2_checkpoint_loss_with_new_file_applies_it(spark, tmp_path):
    """r7 review finding: after checkpoint loss, the restart bundles
    ALREADY-COMMITTED files AND newly-landed files into one fresh
    batch 0.  A batch-id-keyed tag would see 'scd2-0 committed' and
    silently drop the new rows; the content-derived tag must let the
    bundle proceed — old rows re-fold as no-ops, new rows apply."""
    from etl_pipeline_fresh_picked_leads_spark.operators.scd import scd2_init
    from etl_pipeline_fresh_picked_leads_spark.sources.txtable import TxTable
    from etl_pipeline_fresh_picked_leads_spark.streaming.sinks import (
        foreach_batch_scd2,
    )

    base = str(tmp_path)
    landing = os.path.join(base, "landing")
    os.makedirs(landing)
    dim_root = os.path.join(base, "dim")
    cust = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "k long, bal double"
    )
    TxTable.create(spark, dim_root, scd2_init(cust, "2024-01-01"))
    schema = "k long, bal double, eff_date string"

    def land(name, rows):
        df = spark.createDataFrame(rows, schema)
        tmp = os.path.join(base, "tmp_" + name)
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        os.rename(os.path.join(tmp, src), os.path.join(landing, name))

    def drain(chk):
        q = foreach_batch_scd2(
            spark.readStream.schema(schema).parquet(landing),
            spark, dim_root, "k", ["bal"],
            checkpoint=os.path.join(base, chk),
        )
        assert q.awaitTermination(300)

    land("b0.parquet", [(1, 15.0, "2024-03-01")])
    drain("chk")
    v1 = TxTable(spark, dim_root).snapshot().version
    # checkpoint lost; a new same-effective-date update lands before
    # the restart — the fresh batch 0 now carries BOTH files
    land("b1.parquet", [(2, 25.0, "2024-03-01")])
    drain("chk_fresh")
    dim = TxTable(spark, dim_root)
    assert dim.snapshot().version > v1  # the divergent bundle committed
    cur = {
        r.k: (r.bal, str(r.valid_from))
        for r in dim.read().filter("is_current").collect()
    }
    # new row applied; replayed row did NOT re-version (no value change)
    assert cur == {1: (15.0, "2024-03-01"), 2: (25.0, "2024-03-01")}
    assert dim.read().count() == 4  # 2 keys x (initial + one update)


def test_stream_scd2_divergent_multidate_bundle_applies_new_slice(spark, tmp_path):
    """When the replayed bundle mixes a committed MULTI-date batch with
    new data, the committed slices are skipped via their tags and ONLY
    the new slice applies — no order-guard crash, no re-application
    (the per-slice-tag design; a whole-batch content tag would raise
    here because applied_thru sits past the bundle's earliest date)."""
    from etl_pipeline_fresh_picked_leads_spark.operators.scd import scd2_init
    from etl_pipeline_fresh_picked_leads_spark.sources.txtable import TxTable
    from etl_pipeline_fresh_picked_leads_spark.streaming.sinks import (
        foreach_batch_scd2,
    )

    base = str(tmp_path)
    landing = os.path.join(base, "landing")
    os.makedirs(landing)
    dim_root = os.path.join(base, "dim")
    cust = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, bal double")
    TxTable.create(spark, dim_root, scd2_init(cust, "2024-01-01"))
    schema = "k long, bal double, eff_date string"
    b0 = spark.createDataFrame(
        [(1, 15.0, "2024-03-01"), (2, 25.0, "2024-04-01")], schema
    )
    tmp = os.path.join(base, "t0")
    b0.coalesce(1).write.mode("overwrite").parquet(tmp)
    src = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.rename(os.path.join(tmp, src), os.path.join(landing, "b0.parquet"))

    def drain(chk):
        q = foreach_batch_scd2(
            spark.readStream.schema(schema).parquet(landing),
            spark, dim_root, "k", ["bal"],
            checkpoint=os.path.join(base, chk),
        )
        assert q.awaitTermination(300)

    drain("chk")
    v1 = TxTable(spark, dim_root).snapshot().version
    b1 = spark.createDataFrame([(1, 30.0, "2024-05-01")], schema)
    tmp = os.path.join(base, "t1")
    b1.coalesce(1).write.mode("overwrite").parquet(tmp)
    src = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.rename(os.path.join(tmp, src), os.path.join(landing, "b1.parquet"))
    drain("chk_fresh")
    dim = TxTable(spark, dim_root)
    assert dim.snapshot().version > v1  # the new slice committed
    cur = {
        r.k: (r.bal, str(r.valid_from))
        for r in dim.read().filter("is_current").collect()
    }
    assert cur == {1: (30.0, "2024-05-01"), 2: (25.0, "2024-04-01")}
    v2 = dim.snapshot().version
    drain("chk_fresh2")  # full replay again: everything committed now
    assert TxTable(spark, dim_root).snapshot().version == v2


def test_stream_scd2_multibatch_history_checkpoint_loss_noops(spark, tmp_path):
    """r7 second review: committed history spanning SEVERAL batches
    with ascending effective dates, checkpoint lost, NO new files.
    The fresh restart bundles all files into one batch 0 — every slice
    fingerprint is already committed, so the sink must no-op (a
    whole-batch content tag would mismatch and crash-loop on the order
    guard forever)."""
    from etl_pipeline_fresh_picked_leads_spark.operators.scd import scd2_init
    from etl_pipeline_fresh_picked_leads_spark.sources.txtable import TxTable
    from etl_pipeline_fresh_picked_leads_spark.streaming.sinks import (
        foreach_batch_scd2,
    )

    base = str(tmp_path)
    landing = os.path.join(base, "landing")
    os.makedirs(landing)
    dim_root = os.path.join(base, "dim")
    cust = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, bal double")
    TxTable.create(spark, dim_root, scd2_init(cust, "2024-01-01"))
    schema = "k long, bal double, eff_date string"

    def land(name, rows):
        df = spark.createDataFrame(rows, schema)
        tmp = os.path.join(base, "tmp_" + name)
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        os.rename(os.path.join(tmp, src), os.path.join(landing, name))

    def drain(chk):
        q = foreach_batch_scd2(
            spark.readStream.schema(schema).parquet(landing),
            spark, dim_root, "k", ["bal"],
            checkpoint=os.path.join(base, chk),
        )
        assert q.awaitTermination(300)

    # two separate committed batches on ONE checkpoint (ascending effs)
    land("b0.parquet", [(1, 15.0, "2024-03-01")])
    drain("chk")
    land("b1.parquet", [(2, 25.0, "2024-04-01")])
    drain("chk")
    dim = TxTable(spark, dim_root)
    v = dim.snapshot().version
    state = sorted(
        (r.k, r.bal, str(r.valid_from), str(r.valid_to), r.is_current)
        for r in dim.read().collect()
    )
    # checkpoint loss, no new data: replay must no-op, not crash-loop
    drain("chk_fresh")
    assert TxTable(spark, dim_root).snapshot().version == v
    state2 = sorted(
        (r.k, r.bal, str(r.valid_from), str(r.valid_to), r.is_current)
        for r in TxTable(spark, dim_root).read().collect()
    )
    assert state2 == state


def test_stream_cdc_apply_multibatch_replay_and_checkpoint_loss(spark, tmp_path):
    """foreach_batch_cdc_apply: a change stream (insert/update/delete
    rows with a source sequence) maintains a TxTable replica.
    (a) Two landing files drain as separate exactly-once commits;
    (b) a full replay over the SAME checkpoint no-ops;
    (c) a checkpoint-LOSS replay (whole landing re-read as batch 0,
    a DIFFERENT row set than any committed batch, so txn tags cannot
    save it) still CONVERGES — full-state CDC rows are idempotent at
    the row level (re-update to same values, delete of absent no-ops,
    insert of a present key flips to the update clause)."""
    from etl_pipeline_fresh_picked_leads_spark.sources.txtable import TxTable
    from etl_pipeline_fresh_picked_leads_spark.streaming.sinks import (
        foreach_batch_cdc_apply,
    )

    base = str(tmp_path)
    landing = os.path.join(base, "landing")
    os.makedirs(landing)
    root = os.path.join(base, "replica")
    TxTable.create(
        spark,
        root,
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0)],
            "k bigint, name string, price double",
        ),
    )
    schema = "k bigint, name string, price double, _op string, _seq bigint"
    b0 = spark.createDataFrame(
        [(3, "c", 30.0, "insert", 1), (1, "A", 11.0, "update", 2)], schema
    )
    b1 = spark.createDataFrame(
        [(2, None, None, "delete", 3), (3, "C", 31.0, "update", 4)], schema
    )
    now = time.time()
    for i, b in enumerate((b0, b1)):
        tmp = os.path.join(base, f"tmp{i}")
        b.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = os.path.join(landing, f"b{i}.parquet")
        os.rename(os.path.join(tmp, src), dst)
        os.utime(dst, (now - 100 + i * 30,) * 2)

    def drain(chk, multi=True):
        r = spark.readStream.schema(schema)
        if multi:
            r = r.option("maxFilesPerTrigger", "1")
        q = foreach_batch_cdc_apply(
            r.parquet(landing),
            spark, root, "k", checkpoint=os.path.join(base, chk),
        )
        assert q.awaitTermination(300)

    drain("chk")
    t = TxTable(spark, root)
    v1 = t.snapshot().version
    want = [(1, "A", 11.0), (3, "C", 31.0)]
    assert sorted((r.k, r.name, r.price) for r in t.read().collect()) == want
    assert v1 == 3, "two batch commits after create"
    drain("chk")  # same checkpoint: nothing new, no commit
    assert TxTable(spark, root).snapshot().version == v1
    # checkpoint loss, SAME batch splits (maxFilesPerTrigger=1): both
    # tags are already committed — exactly-once via tags, no commit
    drain("chk_lost_same")
    assert TxTable(spark, root).snapshot().version == v1
    # checkpoint loss, DIFFERENT split (whole landing as one batch):
    # the union tag is new, so the batch re-applies — and converges,
    # because full-state CDC rows are row-level idempotent
    drain("chk_lost_union", multi=False)
    t2 = TxTable(spark, root)
    assert sorted((r.k, r.name, r.price) for r in t2.read().collect()) == want
    assert t2.snapshot().version == v1 + 1, "one convergent re-apply commit"
