"""TxTable (sources/txtable.py): transaction-log parquet tables.

Covers the four properties that make it 'transactional':
snapshot isolation, atomic commit (crash = previous snapshot),
file-granular copy-on-write (upsert/update rewrite only affected
files), and optimistic-concurrency conflict detection.
"""

from __future__ import annotations

import os
from datetime import date

import pytest
from pyspark.sql import functions as F

from etl_pipeline_fresh_picked_leads_spark.sources.maintenance import (
    set_ingestion_date_where_null_tx,
)
from etl_pipeline_fresh_picked_leads_spark.sources.txtable import (
    TxConflictError,
    TxTable,
    delta_available,
)


def _mkdf(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def test_roundtrip_overwrite_append(spark, tmp_path):
    root = str(tmp_path / "t")
    t = TxTable.create(spark, root, _mkdf(spark, [(1, "a"), (2, "b")]))
    assert t.snapshot().version == 1
    t.append(_mkdf(spark, [(3, "c")]))
    got = sorted((r.k, r.v) for r in t.read().collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    t.overwrite(_mkdf(spark, [(9, "z")]))
    assert [(r.k, r.v) for r in t.read().collect()] == [(9, "z")]
    assert t.snapshot().version == 3


def test_upsert_is_file_granular(spark, tmp_path):
    """Keys 1..4 land in separate commits; upserting key 1 must carry
    the other commits' files by reference (same paths in the new
    manifest), rewriting only the file that held key 1."""
    root = str(tmp_path / "t")
    t = TxTable.create(spark, root, _mkdf(spark, [(1, "a")]).coalesce(1))
    for k, v in [(2, "b"), (3, "c"), (4, "d")]:
        t.append(_mkdf(spark, [(k, v)]).coalesce(1))
    before = t.snapshot()
    t.upsert(_mkdf(spark, [(1, "A"), (5, "e")]).coalesce(1), "k")
    after = t.snapshot()
    carried = set(before.files) & set(after.files)
    # the three untouched single-key files survive byte-identically
    assert len(carried) == 3
    got = dict((r.k, r.v) for r in t.read().collect())
    assert got == {1: "A", 2: "b", 3: "c", 4: "d", 5: "e"}


def test_update_rewrites_only_matching_files(spark, tmp_path):
    root = str(tmp_path / "t")
    t = TxTable.create(spark, root, _mkdf(spark, [(1, "x"), (2, "y")]).coalesce(1))
    t.append(_mkdf(spark, [(3, "z")]).coalesce(1))
    before = t.snapshot()
    n = t.update(F.col("k") == 3, {"v": F.lit("Z")})
    assert n == 1
    after = t.snapshot()
    # the (1,2) file is carried by reference; only the k=3 file was COW'd
    assert set(before.files) & set(after.files), "untouched file not carried"
    got = dict((r.k, r.v) for r in t.read().collect())
    assert got == {1: "x", 2: "y", 3: "Z"}
    # no matching rows -> no new commit at all
    v = t.snapshot().version
    assert t.update(F.col("k") == 99, {"v": F.lit("!")}) == 0
    assert t.snapshot().version == v


def test_crash_before_commit_preserves_snapshot(spark, tmp_path):
    """Simulate a writer dying after materializing data but before the
    manifest link: the table must still read as the old version, and
    vacuum must clear the orphan."""
    root = str(tmp_path / "t")
    t = TxTable.create(spark, root, _mkdf(spark, [(1, "a")]))
    # "crashed" writer: data files exist, no manifest references them
    orphan_files = t._write_data(_mkdf(spark, [(2, "b")]))
    assert [(r.k, r.v) for r in t.read().collect()] == [(1, "a")]
    assert t.snapshot().version == 1
    removed = t.vacuum(retain=1)
    assert set(removed) == set(orphan_files)
    assert [(r.k, r.v) for r in t.read().collect()] == [(1, "a")]


def test_concurrent_commit_conflict(spark, tmp_path):
    root = str(tmp_path / "t")
    t = TxTable.create(spark, root, _mkdf(spark, [(1, "a")]))
    base = t.snapshot()
    files = t._write_data(_mkdf(spark, [(2, "b")]))
    t._commit(list(base.files) + files, "append", base)  # winner
    loser_files = t._write_data(_mkdf(spark, [(3, "c")]))
    with pytest.raises(TxConflictError):
        t._commit(list(base.files) + loser_files, "append", base)
    # loser retries against the fresh snapshot and succeeds
    fresh = t.snapshot()
    t._commit(list(fresh.files) + loser_files, "append", fresh)
    assert sorted(r.k for r in t.read().collect()) == [1, 2, 3]


def test_vacuum_drops_old_versions(spark, tmp_path):
    root = str(tmp_path / "t")
    t = TxTable.create(spark, root, _mkdf(spark, [(1, "a")]))
    old_files = set(t.snapshot().files)
    t.overwrite(_mkdf(spark, [(2, "b")]))
    removed = t.vacuum(retain=1)
    assert old_files <= set(removed)
    assert t._versions() == [2]
    assert [r.k for r in t.read().collect()] == [2]


def test_tx_ingestion_date_backfill(spark, tmp_path):
    """R13 at-rest UPDATE (big_uery_handler.py:183-194) on a TxTable:
    only NULL rows get the run date, and only files containing NULLs
    are rewritten."""
    root = str(tmp_path / "t")
    stamped = spark.createDataFrame(
        [(1, date(2024, 1, 1))], "k int, Ingestion_date date"
    ).coalesce(1)
    unstamped = spark.createDataFrame(
        [(2, None), (3, None)], "k int, Ingestion_date date"
    ).coalesce(1)
    t = TxTable.create(spark, root, stamped)
    t.append(unstamped)
    before = t.snapshot()
    n = set_ingestion_date_where_null_tx(spark, root, date(2025, 6, 1))
    assert n == 2
    after = TxTable(spark, root).snapshot()
    assert set(before.files) & set(after.files), "stamped file was rewritten"
    got = dict(
        (r.k, r.Ingestion_date) for r in TxTable(spark, root).read().collect()
    )
    assert got == {
        1: date(2024, 1, 1),
        2: date(2025, 6, 1),
        3: date(2025, 6, 1),
    }
    # idempotent: second run touches nothing
    assert set_ingestion_date_where_null_tx(spark, root, date(2025, 6, 2)) == 0


@pytest.mark.skipif(not delta_available(), reason="delta-spark not installed")
def test_delta_backend_available():
    """Placeholder for the Delta seam: when delta-spark is on the
    classpath, maintenance/sinks route through DeltaTable.update/merge
    (txtable.delta_available()).  This environment ships without the
    jars, so the routing is exercised only via TxTable."""
    assert delta_available()


def test_compact_coalesces_small_files(spark, tmp_path):
    """Ten tiny single-row appends -> compact folds them into one
    file; a deliberately 'large' file carries by reference; contents
    are untouched and vacuum can then drop the fragments."""
    root = str(tmp_path / "t")
    t = TxTable.create(spark, root, _mkdf(spark, [(0, "x0")]).coalesce(1))
    for k in range(1, 10):
        t.append(_mkdf(spark, [(k, f"x{k}")]).coalesce(1))
    before = t.snapshot()
    assert len(before.files) == 10
    # every fragment is tiny, so all 10 coalesce into ceil(total/target)=1
    v = t.compact(target_bytes=1 << 20)
    after = t.snapshot()
    assert v == after.version == before.version + 1
    assert after.op == "compact"
    assert len(after.files) == 1
    got = sorted((r.k, r.v) for r in t.read().collect())
    assert got == [(k, f"x{k}") for k in range(10)]
    # threshold respected: nothing under small_frac -> no-op commit
    assert t.compact(target_bytes=1) == after.version
    # fragments are unreferenced now; vacuum reclaims them
    removed = t.vacuum(retain=1)
    assert set(removed) >= set(before.files)
    assert sorted((r.k, r.v) for r in t.read().collect()) == got
