"""Partition spec on TxTable (r12, VERDICT r11 #3): declared at
CREATE, immutable, file-per-partition-value layout enforced by the
writer, partition pruning via the existing stats machinery, and
maintenance (compact/vacuum) scoped to one partition window."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from etl_pipeline_fresh_picked_leads_spark.sources.txtable import TxTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).alias("p"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )


def _mk(spark, tmp_path, **kw):
    root = str(tmp_path / "t")
    return TxTable.create(
        spark, root, _df(spark, 0, 300), partition_by=["p"], **kw
    )


def test_create_records_spec_and_single_valued_files(spark, tmp_path):
    t = _mk(spark, tmp_path, stats_cols=["k"])
    snap = t.snapshot()
    assert snap.partition_by == ("p",)
    assert snap.files and all("__txp_p=" in f for f in snap.files)
    # partition cols forced into stats: min == max tags each file
    assert all(
        s["min"]["p"] == s["max"]["p"] for s in snap.stats.values()
    )
    # the real column stays in the row data — reads untouched
    assert t.read().count() == 300
    assert {r.p for r in t.read().select("p").distinct().collect()} == {
        0,
        1,
        2,
    }


def test_append_and_mutations_keep_invariant(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_df(spark, 300, 400))
    t.delete(F.col("k") == 5)
    t.update(F.col("k") == 7, {"v": F.lit("UPD")})
    snap = t.snapshot()
    assert all("__txp_p=" in f for f in snap.files)
    # every file still single-valued on p (the layout invariant)
    per_file = (
        t.read()
        .withColumn("_fp", F.col("_metadata.file_path"))
        .groupBy("_fp")
        .agg(F.count_distinct("p").alias("nv"))
        .collect()
    )
    assert per_file and all(r.nv == 1 for r in per_file)
    assert t.read().count() == 399
    assert t.read().filter(F.col("k") == 7).first().v == "UPD"


def test_partition_pruned_reads_via_stats(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_df(spark, 300, 400))
    files = t.files_in_range("p", 1, 1)
    assert files and all("__txp_p=1" in f for f in files)
    assert len(files) < len(t.snapshot().files)
    got = sorted(r.k for r in t.read_range("p", 1, 1).collect())
    assert got == sorted(k for k in range(400) if k % 3 == 1)


def test_partitions_listing_metadata_only(spark, tmp_path):
    t = _mk(spark, tmp_path)
    parts = t.partitions()
    assert [p["p"] for p in parts] == ["0", "1", "2"]
    assert sum(p["n_rows"] for p in parts) == 300
    assert sum(p["n_files"] for p in parts) == len(t.snapshot().files)


def test_compact_scoped_to_one_partition(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_df(spark, 300, 400))
    before = t.snapshot()
    out_of_scope = [f for f in before.files if "__txp_p=1" not in f]
    t.compact(target_bytes=1 << 30, partition={"p": 1})
    after = t.snapshot()
    # out-of-scope files carry BY REFERENCE (same paths, not rewritten)
    assert set(out_of_scope) <= set(after.files)
    p1 = [f for f in after.files if "__txp_p=1" in f]
    assert len(p1) == 1  # coalesced
    assert t.read().count() == 400
    # unknown scope column refused
    with pytest.raises(ValueError, match="unknown partition"):
        t.compact(partition={"nope": 1})


def test_vacuum_scoped_to_one_partition(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_df(spark, 300, 400))
    t.compact(target_bytes=1 << 30)  # rewrites -> old files dead
    removed = t.vacuum(
        retain=1, min_age_seconds=0.0, force=True, partition={"p": 1}
    )
    assert removed and all("__txp_p=1" in f for f in removed)
    # other partitions' dead files remain for a later global pass
    rest = t.vacuum(retain=1, min_age_seconds=0.0, force=True)
    assert rest and all("__txp_p=1" not in f for f in rest)
    assert t.read().count() == 400


def test_schema_guards_refuse_spec_changes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="partition column"):
        t.rename_column("p", "q")
    with pytest.raises(ValueError, match="partition column"):
        t.drop_column("p")
    with pytest.raises(ValueError, match="partition column"):
        t.overwrite(_df(spark, 0, 10).drop("p"))
    # non-partition schema evolution still works
    t.add_column("extra", "integer")
    t.rename_column("v", "val")
    assert t.read().filter(F.col("k") == 1).first().val == "v1"
    # ... and writes through the colmap keep the layout invariant
    t.append(
        _df(spark, 400, 410)
        .withColumnRenamed("v", "val")
        .withColumn("extra", F.lit(None).cast("integer"))
    )
    assert all("__txp_p=" in f for f in t.snapshot().files)


def test_create_refuses_generated_partition_and_missing_col(spark, tmp_path):
    with pytest.raises(ValueError, match="absent"):
        TxTable.create(
            spark,
            str(tmp_path / "a"),
            _df(spark, 0, 10),
            partition_by=["nope"],
        )
    with pytest.raises(ValueError, match="generated"):
        TxTable.create(
            spark,
            str(tmp_path / "b"),
            _df(spark, 0, 10),
            partition_by=["p"],
            generated={"p": "k % 3"},
        )


def test_clone_and_restore_carry_spec(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v1 = t.snapshot().version
    t.append(_df(spark, 300, 400))
    c = t.clone_to(str(tmp_path / "c"))
    assert c.snapshot().partition_by == ("p",)
    c.append(_df(spark, 400, 450))  # clone writes stay partitioned
    assert all("__txp_p=" in f for f in c.snapshot().files)
    shutil.rmtree(str(tmp_path / "c"))
    t.restore(v1)
    assert t.snapshot().partition_by == ("p",)
    assert t.read().count() == 300
    t.append(_df(spark, 300, 350))
    assert all("__txp_p=" in f for f in t.snapshot().files)


def test_native_sink_refuses_partitioned_target(spark, tmp_path):
    from etl_pipeline_fresh_picked_leads_spark.streaming.txtable_source import (
        _sink_guards,
    )

    t = _mk(spark, tmp_path)
    import json

    from etl_pipeline_fresh_picked_leads_spark import txlog

    m = txlog.load_manifest(t.log_dir, t.snapshot().version)
    with pytest.raises(ValueError, match="partitioned"):
        _sink_guards(m, t.read().schema, "append")


def test_txtable_source_reads_partitioned_table(spark, tmp_path):
    """The pyarrow-based data source reads partitioned layouts
    unchanged (real columns live in the files)."""
    from etl_pipeline_fresh_picked_leads_spark.streaming.txtable_source import (
        register,
    )

    register(spark)
    t = _mk(spark, tmp_path)
    got = (
        spark.read.format("txtable")
        .option("path", t.root)
        .load()
        .groupBy("p")
        .count()
        .collect()
    )
    assert {r.p: r["count"] for r in got} == {0: 100, 1: 100, 2: 100}


def test_string_partition_values_roundtrip(spark, tmp_path):
    """Escaped path values (spaces etc.) parse back exactly."""
    root = str(tmp_path / "s")
    df = spark.createDataFrame(
        [(1, "north region"), (2, "south:east"), (3, None)],
        "k int, region string",
    )
    t = TxTable.create(spark, root, df, partition_by=["region"])
    parts = t.partitions()
    assert {p["region"] for p in parts} == {
        "north region",
        "south:east",
        None,
    }
    t.compact(target_bytes=1 << 30, partition={"region": "north region"})
    assert t.read().count() == 3
    removedk = t.vacuum(
        retain=1,
        min_age_seconds=0.0,
        force=True,
        partition={"region": "north region"},
    )
    assert all("__txp_region=" in f for f in removedk)


def test_merge_and_dv_paths_keep_layout(spark, tmp_path):
    """Every write path lands in _write_data, so merge rewrites and
    update_dv's new files keep the file-per-partition-value layout."""
    t = _mk(spark, tmp_path, stats_cols=["k"])
    assert t.delete_dv(F.col("k") == 10) == 1
    assert t.update_dv(F.col("k") == 11, {"v": F.lit("U")}) == 1
    t.merge(
        spark.range(0, 5).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).alias("p"),
            F.lit("m").alias("v"),
        ),
        on="k",
        update={"v": F.col("s.v")},
    )
    t.purge_dvs(min_deleted_frac=0.0)
    snap = t.snapshot()
    assert all("__txp_p=" in f for f in snap.files)
    per_file = (
        t.read()
        .withColumn("_fp", F.col("_metadata.file_path"))
        .groupBy("_fp")
        .agg(F.count_distinct("p").alias("nv"))
        .collect()
    )
    assert per_file and all(r.nv == 1 for r in per_file)
    assert t.read().count() == 299
    assert t.read().filter(F.col("k") == 4).first().v == "m"


def test_compact_partition_composes_with_zorder_clustering(spark, tmp_path):
    """Per-window OPTIMIZE ZORDER (the PLANS.md maintenance shape):
    clustering scoped to one partition rewrites only that partition's
    files, sorted on the cluster key, and range reads on the clustered
    column prune files WITHIN the partition."""
    t = _mk(spark, tmp_path, stats_cols=["k"])
    t.append(_df(spark, 300, 600))
    t.append(_df(spark, 600, 900))
    before = t.snapshot()
    untouched = [f for f in before.files if "__txp_p=2" not in f]
    sz = sum(os.path.getsize(f) for f in before.files if "__txp_p=2" in f)
    t.compact(
        target_bytes=max(1, sz // 3),
        cluster_by=["k"],
        partition={"p": 2},
    )
    after = t.snapshot()
    assert set(untouched) <= set(after.files), "out-of-window rewritten"
    p2 = [f for f in after.files if "__txp_p=2" in f]
    assert len(p2) >= 2, "clustering should split the partition"
    # clustered: a k-range read inside p=2 opens a strict subset
    opened = [
        f for f in t.files_in_range("k", 2, 50) if "__txp_p=2" in f
    ]
    assert 0 < len(opened) < len(p2), (len(opened), len(p2))
    assert t.read().count() == 900
