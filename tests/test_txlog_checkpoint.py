"""Transaction-log checkpointing (txlog.py, r11 — VERDICT r10 #2).

The scale contract under test: commit I/O is proportional to the
CHANGE (delta-form manifests between periodic full checkpoints), and
txn-idempotency / history / time-travel lookups are served by the
commit index (one cached file), never O(versions) manifest opens —
while every behavioral surface (reads, time travel, restore, vacuum,
clones, change feed, conflict retries) stays bit-identical to the
self-contained-manifest era.
"""

from __future__ import annotations

import json
import os

import pytest

from etl_pipeline_fresh_picked_leads_spark import txlog
from etl_pipeline_fresh_picked_leads_spark.sources.txtable import TxTable


def _mkdf(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def _raw(t: TxTable, v: int) -> dict:
    return txlog.read_raw(t.log_dir, v)


@pytest.fixture()
def short_checkpoints(monkeypatch):
    """Shrink the checkpoint cadence so a dozen commits exercise
    multiple full->delta->full cycles."""
    monkeypatch.setattr(TxTable, "CHECKPOINT_EVERY", 5)


def test_append_log_writes_delta_manifests(spark, tmp_path, short_checkpoints):
    """Small appends write delta-form manifests (I/O ∝ change, the
    100 TB streaming-sink shape); every CHECKPOINT_EVERY-th link and
    v1 are full; reads/time-travel see the materialized view at every
    version."""
    root = str(tmp_path / "t")
    t = TxTable.create(
        spark,
        root,
        _mkdf(spark, [(0, "r0")]).coalesce(1),
        stats_cols=["k"],  # exercise stats_add reconstruction too
    )
    for i in range(1, 13):
        t.append(_mkdf(spark, [(i, f"r{i}")]).coalesce(1))
    # v1 full; chains of 4 deltas then a checkpoint (chain cap 5)
    assert txlog.is_full(_raw(t, 1))
    forms = [txlog.is_full(_raw(t, v)) for v in range(1, 14)]
    assert forms.count(True) >= 3, f"expected periodic checkpoints: {forms}"
    assert forms.count(False) >= 8, f"expected mostly deltas: {forms}"
    # a delta manifest records ONLY the change
    delta_v = next(v for v in range(2, 14) if not txlog.is_full(_raw(t, v)))
    raw = _raw(t, delta_v)
    assert raw["add"] and not raw["remove"] and "files" not in raw
    assert len(raw["add"]) < len(t.snapshot(delta_v).files)
    # materialized view: every version reads its exact prefix
    for v in (1, delta_v, 13):
        got = sorted(r.k for r in t.read(version=v).collect())
        assert got == list(range(v)), f"v{v}"
    # stats reconstruct identically to a full-form log
    snap = t.snapshot()
    assert snap.stats and len(snap.stats) == len(snap.files)


def test_mutations_and_schema_ops_across_chains(
    spark, tmp_path, short_checkpoints
):
    """Delete/update (file rewrites), schema evolution (zero-file
    deltas) and restore compose across delta chains."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    t = TxTable.create(spark, root, _mkdf(spark, [(0, "a")]).coalesce(1))
    for i in range(1, 8):
        t.append(_mkdf(spark, [(i, "a")]).coalesce(1))
    t.delete(F.col("k") == 3)
    t.update(F.col("k") == 5, {"v": F.lit("B")})
    t.add_column("extra", "integer")  # zero-file-change delta
    got = {(r.k, r.v) for r in t.read().select("k", "v").collect()}
    assert got == {(i, "B" if i == 5 else "a") for i in range(8) if i != 3}
    # restore to a mid-chain incremental version: pick one verified
    # DELTA-form so the restore genuinely crosses a reconstruction
    # (ADVICE r11 — the old assert here was a tautology)
    target = next(
        v for v in range(5, 1, -1) if not txlog.is_full(_raw(t, v))
    )
    t.restore(target)
    # version v holds keys 0..v-1 (v1 created k=0, each append adds 1)
    assert sorted(r.k for r in t.read().collect()) == list(range(target))


def test_txn_idempotency_via_index(spark, tmp_path, short_checkpoints):
    """Exactly-once replay over a delta-chained log: the txn tag is
    found in the commit index without opening manifests."""
    root = str(tmp_path / "t")
    t = TxTable.create(spark, root, _mkdf(spark, [(0, "a")]))
    for i in range(1, 9):
        t.append(_mkdf(spark, [(i, "a")]), txn=f"batch-{i}")
    v = t.snapshot().version
    t.append(_mkdf(spark, [(3, "dup")]), txn="batch-3")  # replay
    assert t.snapshot().version == v, "replayed txn must no-op"
    assert t.has_txn("batch-7") and not t.has_txn("batch-99")
    # the index file exists and covers every live version
    idx = txlog.read_index(t.log_dir, t._versions(), heal=False)
    assert set(idx) == set(t._versions())


def test_index_heals_holes(spark, tmp_path, short_checkpoints):
    """The index is a CACHE: deleting it (≈ a crash between link and
    index append, or a pre-r11 log) changes nothing observable —
    history/version_at/txn lookups materialize the manifests once and
    heal the lines back."""
    root = str(tmp_path / "t")
    t = TxTable.create(spark, root, _mkdf(spark, [(0, "a")]))
    for i in range(1, 6):
        t.append(_mkdf(spark, [(i, "a")]), txn=f"b{i}")
    h_before = [
        (e["version"], e["op"], e["txn"], e["n_files"], e["n_rows"])
        for e in t.history()
    ]
    ts3 = t.snapshot(3).ts
    os.unlink(os.path.join(t.log_dir, "_idx.jsonl"))
    h_after = [
        (e["version"], e["op"], e["txn"], e["n_files"], e["n_rows"])
        for e in t.history()
    ]
    assert h_after == h_before
    assert t.version_at(ts3 / 1_000_000) == 3
    assert t.has_txn("b4")
    assert os.path.exists(os.path.join(t.log_dir, "_idx.jsonl")), "healed"


def test_vacuum_materializes_boundary(spark, tmp_path, short_checkpoints):
    """Vacuum landing its retention boundary on a delta-form manifest
    rewrites it full BEFORE unlinking ancestors — later retained
    deltas keep reconstructing — and compacts the index."""
    root = str(tmp_path / "t")
    t = TxTable.create(spark, root, _mkdf(spark, [(0, "a")]).coalesce(1))
    for i in range(1, 9):
        t.append(_mkdf(spark, [(i, "a")]).coalesce(1))
    # pick a retention whose boundary lands on a delta-form manifest
    versions = t._versions()
    boundary = max(
        v
        for v in versions[:-1]
        if not txlog.is_full(_raw(t, v))
    )
    retain = len(versions) - versions.index(boundary)
    t.vacuum(retain=retain, min_age_seconds=0.0)
    assert t._versions() == versions[-retain:]
    assert txlog.is_full(_raw(t, boundary)), "boundary materialized"
    # every retained version still reads its exact prefix
    for v in t._versions():
        assert sorted(r.k for r in t.read(version=v).collect()) == list(
            range(v)
        )
    # index compacted to retained versions
    with open(os.path.join(t.log_dir, "_idx.jsonl")) as f:
        lines = [json.loads(x) for x in f if x.strip()]
    assert {e["v"] for e in lines} == set(t._versions())


def test_commit_io_proportional_to_change(spark, tmp_path):
    """The scale probe (deterministic, not timing-based): on a
    many-file table, a small append's manifest bytes are a fraction
    of the full form's — commit cost is flat in table size between
    checkpoints, the 100 TB streaming-sink requirement."""
    root = str(tmp_path / "t")
    t = TxTable.create(
        spark,
        root,
        spark.range(0, 200).selectExpr(
            "cast(id as int) k", "cast(id as string) v"
        ).repartition(40),
    )
    t.append(_mkdf(spark, [(900, "x")]).coalesce(1))  # v2: small delta
    raw2 = _raw(t, 2)
    assert not txlog.is_full(raw2) and len(raw2["add"]) == 1
    full_bytes = os.path.getsize(
        os.path.join(t.log_dir, txlog.manifest_name(1))
    )
    delta_bytes = os.path.getsize(
        os.path.join(t.log_dir, txlog.manifest_name(2))
    )
    assert delta_bytes * 5 < full_bytes, (delta_bytes, full_bytes)
    # overwrite-sized changes checkpoint themselves
    t.overwrite(_mkdf(spark, [(1, "z")]))
    assert txlog.is_full(_raw(t, 3))


def test_clone_and_change_feed_across_chains(
    spark, tmp_path, short_checkpoints
):
    """Shallow clone of a delta-chained head and read_changes over a
    window spanning delta manifests both see the materialized view;
    the clone-fate vacuum guard still sees clone references."""
    import pytest as _pytest

    from etl_pipeline_fresh_picked_leads_spark.sources.txtable import (
        TxCloneFateError,
    )

    root = str(tmp_path / "t")
    t = TxTable.create(spark, root, _mkdf(spark, [(0, "a")]).coalesce(1))
    for i in range(1, 7):
        t.append(_mkdf(spark, [(i, "a")]).coalesce(1))
    clone = t.clone_to(str(tmp_path / "c"))
    assert sorted(r.k for r in clone.read().collect()) == list(range(7))
    # versions 3..6 appended keys 2..5 (v1 created key 0)
    ch = t.read_changes(since=2, until=6)
    got = sorted(r.k for r in ch.collect())
    assert got == [2, 3, 4, 5]
    assert set(r._change_type for r in ch.collect()) == {"insert"}
    # the clone still pins the source's files through vacuum
    t.overwrite(_mkdf(spark, [(99, "z")]))
    with _pytest.raises(TxCloneFateError):
        t.vacuum(retain=1, min_age_seconds=0.0)


def test_pre_r11_full_form_logs_read_unchanged(spark, tmp_path):
    """Bit-compat: a log whose manifests are all full-form (pre-r11,
    or CHECKPOINT_EVERY=1) behaves identically — the materializer is
    a passthrough and the index heals lazily."""
    root = str(tmp_path / "t")
    try:
        TxTable.CHECKPOINT_EVERY = 1  # every commit checkpoints
        t = TxTable.create(spark, root, _mkdf(spark, [(0, "a")]))
        for i in range(1, 4):
            t.append(_mkdf(spark, [(i, "a")]), txn=f"b{i}")
    finally:
        TxTable.CHECKPOINT_EVERY = txlog.CHECKPOINT_EVERY
    assert all(txlog.is_full(_raw(t, v)) for v in t._versions())
    os.unlink(os.path.join(t.log_dir, "_idx.jsonl"))  # pre-r11: no index
    t2 = TxTable(spark, root)
    assert sorted(r.k for r in t2.read().collect()) == [0, 1, 2, 3]
    assert t2.has_txn("b2")
    assert [e["version"] for e in t2.history()] == [4, 3, 2, 1]


def test_concurrent_conflict_protocol_unchanged(
    spark, tmp_path, short_checkpoints
):
    """The atomic-exclusive link protocol is unchanged: a stale-head
    writer still loses with TxConflictError; pure-append races still
    auto-resolve for snapshot-derived mutations."""
    from pyspark.sql import functions as F

    from etl_pipeline_fresh_picked_leads_spark.sources.txtable import (
        TxConflictError,
    )

    root = str(tmp_path / "t")
    t1 = TxTable.create(spark, root, _mkdf(spark, [(0, "a")]).coalesce(1))
    t2 = TxTable(spark, root)
    base = t1.snapshot()
    t2.append(_mkdf(spark, [(1, "b")]).coalesce(1))
    with pytest.raises(TxConflictError):
        t1._commit(list(base.files), "test", base)
    # snapshot-derived delete auto-rebases over the racing append
    t1.delete(F.col("k") == 0)
    assert sorted(r.k for r in t1.read().collect()) == [1]


def test_differential_delta_vs_full_form_logs(spark, tmp_path):
    """DIFFERENTIAL probe: the same operation sequence against a log
    that checkpoints every commit (all-full manifests — the pre-r11
    format) and a delta-chained log (cadence 4) must be
    OBSERVATIONALLY IDENTICAL at every step — reads, row sets,
    history shape, time travel, restore, vacuum survivors.  The
    storage form is an encoding, never semantics."""
    from pyspark.sql import functions as F

    def mk(root, every):
        TxTable.CHECKPOINT_EVERY = every
        return TxTable.create(
            spark,
            str(root),
            _mkdf(spark, [(0, "a")]).coalesce(1),
            stats_cols=["k"],
        )

    try:
        a = mk(tmp_path / "full", 1)
        TxTable.CHECKPOINT_EVERY = 1
        ops_a = _run_ops(spark, a, 1)
        b = mk(tmp_path / "delta", 4)
        TxTable.CHECKPOINT_EVERY = 4
        ops_b = _run_ops(spark, b, 4)
    finally:
        TxTable.CHECKPOINT_EVERY = txlog.CHECKPOINT_EVERY
    assert ops_a == ops_b, "observable state diverged between formats"
    # and the delta log actually used delta form (the probe is real)
    forms = [txlog.is_full(_raw(b, v)) for v in b._versions()]
    assert False in forms, forms


def _run_ops(spark, t: TxTable, every: int) -> list:
    """A fixed mutation script touching every commit shape; returns
    the observable state trace."""
    from pyspark.sql import functions as F

    trace = []

    def observe():
        rows = sorted((r.k, r.v) for r in t.read().collect())
        hist = [
            (e["version"], e["op"], e["n_files"], e["n_rows"])
            for e in t.history()
        ]
        trace.append((rows, hist))

    for i in range(1, 7):
        t.append(_mkdf(spark, [(i, "a")]).coalesce(1), txn=f"s{i}")
    observe()
    t.delete(F.col("k") == 3)
    t.update(F.col("k") == 5, {"v": F.lit("B")})
    observe()
    t.append(_mkdf(spark, [(3, "dup")]), txn="s3")  # replay: no-op
    observe()
    t.overwrite(_mkdf(spark, [(100, "z"), (101, "z")]).repartition(2))
    t.append(_mkdf(spark, [(102, "w")]).coalesce(1))
    observe()
    t.restore(5)  # mid-history restore
    observe()
    trace.append(sorted(r.k for r in t.read(version=4).collect()))
    t.vacuum(retain=3, min_age_seconds=0.0)
    trace.append(t._versions() != [] and len(t._versions()) == 3)
    trace.append(sorted((r.k, r.v) for r in t.read().collect()))
    return trace


def test_dv_state_inherits_by_marker_in_delta_manifests(
    spark, tmp_path, short_checkpoints
):
    """Appends onto a DV'd table must not re-serialize the O(DV'd
    files) vector dict per commit: unchanged DV state rides delta
    manifests as a one-byte inherit marker, DV-CHANGING commits store
    the new dict, and materialization reproduces the exact state at
    every version."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    t = TxTable.create(spark, root, _mkdf(spark, [(i, "a") for i in range(8)]).coalesce(1))
    assert t.delete_dv(F.col("k") == 2) == 1          # v2: DVs appear
    for i in (10, 11, 12):                            # v3..v5: appends
        t.append(_mkdf(spark, [(i, "b")]).coalesce(1))
    dv_v = t.snapshot(2).dvs
    assert dv_v, "v2 must carry vectors"
    for v in (3, 4, 5):
        raw = _raw(t, v)
        assert not txlog.is_full(raw), v
        assert raw.get("dvs_inherit") is True and "dvs" not in raw, raw
        assert t.snapshot(v).dvs == dv_v, "materialized DVs identical"
    assert t.delete_dv(F.col("k") == 4) == 1          # v6: DVs change
    raw6 = _raw(t, 6)
    if not txlog.is_full(raw6):
        assert raw6.get("dvs") and not raw6.get("dvs_inherit"), raw6
    # both deletes hit the one initial file: 1 entry, 2 sidecar sets
    assert sum(len(v) for v in t.snapshot(6).dvs.values()) == 2
    # reads at every version stay exact through the inherit chain
    assert sorted(r.k for r in t.read(version=5).collect()) == [
        0, 1, 3, 4, 5, 6, 7, 10, 11, 12
    ]
    assert sorted(r.k for r in t.read().collect()) == [
        0, 1, 3, 5, 6, 7, 10, 11, 12
    ]
    # vacuum boundary materialization expands the marker to the dict
    versions = t._versions()
    t.vacuum(retain=3, min_age_seconds=0.0)
    boundary = t._versions()[0]
    braw = _raw(t, boundary)
    assert txlog.is_full(braw)
    assert sorted(r.k for r in t.read(version=boundary).collect())
