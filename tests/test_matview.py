"""Incremental materialized-view maintenance (sources/matview.py):
bit-exact equivalence with full recompute, exactly-once refresh under
replay, and the non-append fallback.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_pipeline_fresh_picked_leads_spark.sources.matview import MatView
from etl_pipeline_fresh_picked_leads_spark.sources.txtable import TxTable


def _rows(df):
    return sorted(
        (r.k, r.n_rows, str(r.sum_v)) for r in df.collect()
    )


def _mk(spark, data):
    return spark.createDataFrame(data, "k int, v double")


def _full(spark, src):
    return src.read().groupBy("k").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("v").cast("decimal(18,2)"))
        .cast("decimal(28,2)")
        .alias("sum_v"),
    )


def test_incremental_equals_full_and_is_exactly_once(spark, tmp_path):
    src_root = str(tmp_path / "src")
    mv_root = str(tmp_path / "mv")
    src = TxTable.create(
        spark, src_root, _mk(spark, [(1, 1.25), (2, 2.50), (1, 0.25)])
    )
    mv = MatView(spark, src_root, mv_root, keys=["k"], sum_cols=["v"])
    assert mv.refresh() == 1  # initial full build
    assert mv.applied_version() == 1

    src.append(_mk(spark, [(1, 10.00), (3, 0.10)]))
    src.append(_mk(spark, [(2, 0.01)]))
    assert mv.refresh() == 3  # folds two commits in one incremental pass
    assert _rows(mv.read()) == _rows(_full(spark, src))

    # no-op when current: version unchanged, no new mv commit
    v_mv = mv.mv.snapshot().version
    assert mv.refresh() == 3
    assert mv.mv.snapshot().version == v_mv

    # crash-replay: a second refresher that re-runs the merge against
    # the same source version must be swallowed by the txn tag
    merged = mv._merge(mv.read(), mv._partial(_mk(spark, [(9, 9.99)])))
    mv.mv.overwrite(merged, txn="matview@3")  # replayed tag -> skipped
    assert _rows(mv.read()) == _rows(_full(spark, src))


def test_non_append_history_falls_back_to_full_recompute(spark, tmp_path):
    src_root = str(tmp_path / "src")
    src = TxTable.create(spark, src_root, _mk(spark, [(1, 1.00), (2, 2.00)]))
    mv = MatView(
        spark, src_root, str(tmp_path / "mv"), keys=["k"], sum_cols=["v"]
    )
    mv.refresh()
    # upsert rewrites a row — read_since would double-count it
    src.upsert(_mk(spark, [(1, 5.00)]), key="k")
    assert not mv._all_appends_since(1, src.snapshot().version)
    mv.refresh()
    assert _rows(mv.read()) == _rows(_full(spark, src))


def test_refresh_cost_reads_only_the_delta(spark, tmp_path):
    """The incremental path must scan the NEW commit's files, not the
    whole source: pin via the file list the delta scan resolves."""
    src_root = str(tmp_path / "src")
    src = TxTable.create(spark, src_root, _mk(spark, [(1, 1.0)] * 3))
    mv = MatView(
        spark, src_root, str(tmp_path / "mv"), keys=["k"], sum_cols=["v"]
    )
    mv.refresh()
    v1_files = set(src.snapshot().files)
    src.append(_mk(spark, [(2, 2.0)]))
    delta_files = {
        f
        for f in src.snapshot().files
        if f not in v1_files
    }
    from urllib.parse import urlparse

    scanned = {
        urlparse(r.f).path
        for r in src.read_since(1)
        .select(F.col("_metadata.file_path").alias("f"))
        .collect()
    }
    assert scanned <= {os.path.abspath(f) for f in delta_files}
    mv.refresh()
    assert _rows(mv.read()) == _rows(_full(spark, src))


def test_streaming_ingest_feeds_incremental_matview(spark, tmp_path):
    """End-to-end exactly-once composition: CSVs land -> streaming
    ingest appends to the source TxTable (txn-tagged batches) ->
    MatView.refresh() folds in only the new commits.  A replayed
    drain (same checkpoint, nothing new landed) plus a re-refresh
    must change nothing."""
    from datetime import date

    from pyspark.sql.types import (
        DateType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from etl_pipeline_fresh_picked_leads_spark.streaming.ingest import (
        stream_ingest_directory,
    )

    target_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("grp", StringType()),
            StructField("score", DoubleType()),
            StructField("Ingestion_date", DateType()),
        ]
    )
    landing = tmp_path / "landing"
    landing.mkdir()
    src_root, chk = str(tmp_path / "src"), str(tmp_path / "chk")

    def drain():
        q = stream_ingest_directory(
            spark, str(landing), src_root, target_schema,
            run_date=date(2026, 8, 14), checkpoint=chk,
        )
        assert q.awaitTermination(120)

    (landing / "a.csv").write_text("id,grp,score\n1,x,1.50\n2,y,2.25\n")
    drain()
    mv = MatView(
        spark, src_root, str(tmp_path / "mv"), keys=["grp"],
        sum_cols=["score"],
    )
    mv.refresh()

    (landing / "b.csv").write_text("id,grp,score\n3,x,0.25\n4,z,9.00\n")
    drain()
    mv.refresh()
    got = {
        r.grp: (r.n_rows, str(r.sum_score)) for r in mv.read().collect()
    }
    assert got == {
        "x": (2, "1.75"),
        "y": (1, "2.25"),
        "z": (1, "9.00"),
    }

    # replay: nothing landed -> drain is a no-op batch (txn-tag
    # guarded), refresh is a no-op (version tag guarded)
    v_src = TxTable(spark, src_root).snapshot().version
    v_mv = mv.mv.snapshot().version
    drain()
    mv.refresh()
    assert TxTable(spark, src_root).snapshot().version == v_src
    assert mv.mv.snapshot().version == v_mv


def test_refresh_delta_is_pinned_against_racing_appends(spark, tmp_path):
    """read_since(until=...) bounds the delta at the version the
    refresh tags: a commit landing after the snapshot is NOT folded
    in now, and IS delivered by the next refresh — no double count."""
    src_root = str(tmp_path / "src")
    src = TxTable.create(spark, src_root, _mk(spark, [(1, 1.0)]))
    mv = MatView(
        spark, src_root, str(tmp_path / "mv"), keys=["k"], sum_cols=["v"]
    )
    mv.refresh()
    src.append(_mk(spark, [(1, 2.0)]))          # v2: in this refresh
    pinned = src.snapshot().version
    src.append(_mk(spark, [(1, 100.0)]))        # v3: the racing commit
    # simulate the race: delta computed against the pinned version
    delta = src.read_since(1, until=pinned)
    assert sorted(r.v for r in delta.collect()) == [2.0]
    # full refresh (now sees v3) still converges to the exact total
    mv.refresh()
    assert _rows(mv.read()) == _rows(_full(spark, src))


def test_matview_composite_keys(spark, tmp_path):
    """Multi-column grouping keys merge correctly through the
    full-outer join (coalesced key columns, not ambiguous refs)."""
    src_root = str(tmp_path / "src")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "k1 int, k2 string, v double"
    )
    src = TxTable.create(
        spark, src_root, mk([(1, "a", 1.0), (1, "b", 2.0), (2, "a", 3.0)])
    )
    mv = MatView(
        spark, src_root, str(tmp_path / "mv"), keys=["k1", "k2"],
        sum_cols=["v"],
    )
    mv.refresh()
    src.append(mk([(1, "a", 0.5), (3, "c", 9.0)]))
    mv.refresh()
    got = {
        (r.k1, r.k2): (r.n_rows, str(r.sum_v)) for r in mv.read().collect()
    }
    assert got == {
        (1, "a"): (2, "1.50"),
        (1, "b"): (1, "2.00"),
        (2, "a"): (1, "3.00"),
        (3, "c"): (1, "9.00"),
    }


def test_minmax_incremental_and_update_fallback(spark, tmp_path):
    """min/max merge correctly on the append path, and stay correct
    after an UPDATE that lowers the max — the non-append history must
    force the full recompute that forgets the old extreme (the case
    where a naive least/greatest merge would be wrong)."""
    src_root, mv_root = str(tmp_path / "s"), str(tmp_path / "m")
    src = TxTable.create(
        spark, src_root, _mk(spark, [(1, 10.0), (1, 50.0), (2, 5.0)])
    )
    mv = MatView(
        spark, src_root, mv_root, keys=["k"], sum_cols=["v"],
        min_cols=["v"], max_cols=["v"],
    )
    mv.refresh()
    src.append(_mk(spark, [(1, 99.0), (2, 1.0)]))
    mv.refresh()  # append fast path: least/greatest merge
    got = {(r.k, r.min_v, r.max_v) for r in mv.read().collect()}
    assert got == {(1, 10.0, 99.0), (2, 1.0, 5.0)}
    # lower the max of k=1: invertible-merge would keep 99.0
    src.update(F.col("v") == 99.0, {"v": F.lit(20.0)})
    mv.refresh()  # history has a rewrite -> full recompute
    got = {(r.k, r.min_v, r.max_v) for r in mv.read().collect()}
    assert got == {(1, 10.0, 50.0), (2, 1.0, 5.0)}
