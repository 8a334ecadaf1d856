"""O(1) head discovery + read-path heal hygiene (VERDICT r11 #4,
ADVICE r11): snapshot opens must not pay an O(retained versions)
directory listing, reads must not mutate table storage, and the
process-global index cache must stay bounded."""

import json
import os

import pytest

from etl_pipeline_fresh_picked_leads_spark import txlog
from etl_pipeline_fresh_picked_leads_spark.sources.txtable import TxTable


def _mkdf(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def test_head_open_uses_index_not_listdir(spark, tmp_path, monkeypatch):
    """With a healthy index, head discovery never lists the log dir:
    the index tail is the hint (Delta's _last_checkpoint idea) and a
    forward existence probe confirms it."""
    root = str(tmp_path / "t")
    t = TxTable.create(spark, root, _mkdf(spark, [(0, "a")]))
    for i in range(1, 6):
        t.append(_mkdf(spark, [(i, "a")]).coalesce(1))

    calls = {"n": 0}
    real = txlog.versions

    def counting(log_dir):
        calls["n"] += 1
        return real(log_dir)

    monkeypatch.setattr(txlog, "versions", counting)
    snap = TxTable(spark, root).snapshot()
    assert snap.version == 6
    assert calls["n"] == 0, "head open fell back to the directory listing"


def test_head_probe_heals_index_lag(spark, tmp_path):
    """A crash between manifest link and index append leaves the head
    unindexed; the forward probe must still find it (and the next
    writer-side txn scan heals the line)."""
    root = str(tmp_path / "t")
    t = TxTable.create(spark, root, _mkdf(spark, [(0, "a")]))
    for i in range(1, 5):
        t.append(_mkdf(spark, [(i, "a")]).coalesce(1))
    # simulate the crash: drop the LAST TWO index lines
    idx = os.path.join(t.log_dir, "_idx.jsonl")
    lines = open(idx).read().splitlines()
    with open(idx, "w") as f:
        f.write("\n".join(lines[:-2]) + "\n")
    txlog._IDX_CACHE.clear()  # a fresh process
    t2 = TxTable(spark, root)
    assert t2.snapshot().version == 5
    assert sorted(r.k for r in t2.read().collect()) == [0, 1, 2, 3, 4]


def test_head_falls_back_without_index(spark, tmp_path):
    """Pre-r11 logs (no index at all) still open via the listing."""
    root = str(tmp_path / "t")
    t = TxTable.create(spark, root, _mkdf(spark, [(0, "a")]))
    t.append(_mkdf(spark, [(1, "a")]).coalesce(1))
    os.unlink(os.path.join(t.log_dir, "_idx.jsonl"))
    txlog._IDX_CACHE.clear()
    assert TxTable(spark, root).snapshot().version == 2


def test_read_paths_do_not_mutate_storage(spark, tmp_path):
    """ADVICE r11: history()/version_at/snapshot reads on a hole-y log
    heal IN MEMORY only — the index file must not be (re)written by a
    nominally read-only consumer.  Writer-side scans (txn idempotency)
    are the sanctioned heal point."""
    root = str(tmp_path / "t")
    t = TxTable.create(spark, root, _mkdf(spark, [(0, "a")]))
    for i in range(1, 4):
        t.append(_mkdf(spark, [(i, "a")]).coalesce(1), txn=f"b{i}")
    ts2 = t.snapshot(2).ts
    idx = os.path.join(t.log_dir, "_idx.jsonl")
    os.unlink(idx)
    txlog._IDX_CACHE.clear()
    r = TxTable(spark, root)
    assert [e["version"] for e in r.history()] == [4, 3, 2, 1]
    assert r.version_at(ts2 / 1_000_000) == 2
    assert r.snapshot().version == 4
    assert not os.path.exists(idx), "a read path rewrote the index"
    # writer-side txn scan heals it back for everyone
    assert r.has_txn("b2")
    assert os.path.exists(idx)
    with open(idx) as f:
        healed = [json.loads(x) for x in f if x.strip()]
    assert {e["v"] for e in healed} == {1, 2, 3, 4}
    # and healing is idempotent across repeat writer scans in one
    # process: no duplicate lines accumulate
    assert r.has_txn("b3")
    with open(idx) as f:
        again = [json.loads(x) for x in f if x.strip()]
    assert len(again) == len(healed), "duplicate heal lines appended"


def test_idx_cache_bounded():
    """The process-global index cache evicts dead paths first, then
    oldest entries, and never exceeds its cap (ADVICE r11)."""
    saved = dict(txlog._IDX_CACHE)
    try:
        txlog._IDX_CACHE.clear()
        for i in range(txlog._IDX_CACHE_MAX * 2):
            txlog._cache_put(f"/nonexistent/idx-{i}", (i, 0, {}))
        assert len(txlog._IDX_CACHE) <= txlog._IDX_CACHE_MAX
        # the newest entry always survives its own insertion
        assert f"/nonexistent/idx-{txlog._IDX_CACHE_MAX * 2 - 1}" in (
            txlog._IDX_CACHE
        )
    finally:
        txlog._IDX_CACHE.clear()
        txlog._IDX_CACHE.update(saved)


def test_batch_reader_rejects_labels_option(spark, tmp_path):
    """ADVICE r11: the labels option shapes the STREAMING change feed
    only; a batch read passing it must fail loudly, not silently
    return unlabeled rows."""
    from etl_pipeline_fresh_picked_leads_spark.streaming.txtable_source import (
        register,
    )

    register(spark)
    root = str(tmp_path / "t")
    TxTable.create(spark, root, _mkdf(spark, [(0, "a")]))
    with pytest.raises(Exception, match="labels"):
        spark.read.format("txtable").option("path", root).option(
            "labels", "delta"
        ).load().collect()
