"""TxTable: a minimal transaction-log table format on plain parquet.

Why this exists: the reference mutates tables in place via BigQuery
DML (UPDATE big_uery_handler.py:183-194; load-append :158-165), which
is transactional on BigQuery's side.  On a raw parquet directory the
equivalent is read->rewrite — O(table) per mutation and destroyed by a
crash mid-overwrite.  Real deployments solve this with Delta/Iceberg;
this module re-implements the public core of that idea (a Delta-style
`_delta_log` / Iceberg-style snapshot manifest) with nothing but
parquet + POSIX rename semantics, so the engine has honest
transactional behavior in this environment and a single seam where
Delta slots in when its jars are present (see ``delta_available``).

Layout::

    <root>/
      data/<commit-uuid>/part-*.parquet   immutable once referenced
      _txlog/v0000000001.json             manifest = THE commit point
      _txlog/v0000000002.json             {"version", "op", "files"}

- **Snapshot reads**: the live table is exactly the file list of the
  highest manifest; ``read()`` hands that list to
  ``spark.read.parquet(*files)``.  Writers never modify referenced
  files, so readers are isolated for free.
- **Atomic commit**: a manifest is staged to a temp name and
  hard-linked (``os.link`` — atomic + exclusive on POSIX) into place.
  A crash anywhere before the link leaves the previous snapshot
  intact; a lost race raises ``TxConflictError`` (optimistic
  concurrency, same contract as Delta's commit protocol).
- **Copy-on-write at file granularity**: ``update``/``upsert`` find
  the files that actually contain matching rows via the parquet
  ``_metadata.file_path`` column (a column-pruned metadata scan),
  rewrite only those, and carry every other file into the new
  manifest by reference.  A keyed upsert into a 100 TB table touches
  the few files holding the colliding keys, not the table.
- **vacuum()**: data no longer referenced by the newest ``retain``
  manifests is deleted; old manifests are dropped.  Equivalent of
  Delta VACUUM.

Local/HDFS-rename filesystems only (object stores without atomic
rename need a real log store — that is precisely Delta's LogStore
abstraction; use it there).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG_DIR = "_txlog"
_DATA_DIR = "data"


class TxConflictError(RuntimeError):
    """Another writer committed the same version first (optimistic
    concurrency loss).  Re-read the snapshot and retry."""


def delta_available() -> bool:
    """True when delta-spark is importable — the seam where TxTable
    operations would be routed to DeltaTable.update/merge instead."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


@dataclass(frozen=True)
class TxSnapshot:
    version: int
    op: str
    files: tuple[str, ...]


def _manifest_name(version: int) -> str:
    return f"v{version:010d}.json"


class TxTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = os.path.abspath(root)
        self.log_dir = os.path.join(self.root, _LOG_DIR)
        self.data_dir = os.path.join(self.root, _DATA_DIR)

    # ---------------------------------------------------------- state

    @staticmethod
    def is_table(root: str) -> bool:
        return os.path.isdir(os.path.join(root, _LOG_DIR))

    @classmethod
    def create(cls, spark: SparkSession, root: str, df: DataFrame) -> "TxTable":
        t = cls(spark, root)
        t.overwrite(df)
        return t

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        return sorted(
            int(n[1:11])
            for n in os.listdir(self.log_dir)
            if n.startswith("v") and n.endswith(".json")
        )

    def snapshot(self) -> TxSnapshot | None:
        """Newest committed snapshot (None for a not-yet-created
        table).  The newest manifest IS the table state — there is no
        separate pointer to get out of sync."""
        versions = self._versions()
        if not versions:
            return None
        with open(os.path.join(self.log_dir, _manifest_name(versions[-1]))) as f:
            m = json.load(f)
        return TxSnapshot(m["version"], m["op"], tuple(m["files"]))

    def read(self) -> DataFrame:
        snap = self.snapshot()
        if snap is None:
            raise FileNotFoundError(f"no committed version under {self.root}")
        return self.spark.read.parquet(*snap.files)

    # -------------------------------------------------------- commits

    def _write_data(self, df: DataFrame) -> list[str]:
        """Materialize ``df`` as a fresh immutable commit directory;
        returns the part-file paths (never mutated afterwards)."""
        out = os.path.join(self.data_dir, uuid.uuid4().hex)
        df.write.mode("error").parquet(out)
        return sorted(
            os.path.join(out, n)
            for n in os.listdir(out)
            if n.endswith(".parquet")
        )

    def _committed_txns(self) -> set[str]:
        """Transaction tags of every live manifest (idempotent-write
        bookkeeping, the public Delta ``txnAppId``/``txnVersion``
        pattern: a replayed writer skips a txn it already landed)."""
        txns = set()
        for v in self._versions():
            with open(os.path.join(self.log_dir, _manifest_name(v))) as f:
                t = json.load(f).get("txn")
            if t:
                txns.add(t)
        return txns

    def _commit(
        self,
        files: list[str],
        op: str,
        base: TxSnapshot | None,
        txn: str | None = None,
    ) -> int:
        version = (base.version if base else 0) + 1
        os.makedirs(self.log_dir, exist_ok=True)
        tmp = os.path.join(self.log_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(
                {"version": version, "op": op, "files": files, "txn": txn}, f
            )
            f.flush()
            os.fsync(f.fileno())
        final = os.path.join(self.log_dir, _manifest_name(version))
        try:
            os.link(tmp, final)  # atomic-exclusive: this IS the commit
        except FileExistsError:
            raise TxConflictError(
                f"version {version} of {self.root} was committed concurrently"
            ) from None
        finally:
            os.unlink(tmp)
        return version

    def overwrite(self, df: DataFrame) -> int:
        return self._commit(self._write_data(df), "overwrite", self.snapshot())

    def append(self, df: DataFrame, txn: str | None = None) -> int:
        """Append; with ``txn`` the write is idempotent — a tag already
        committed is skipped, which is what makes an at-least-once
        replayer (foreachBatch keyed by batch_id) exactly-once."""
        base = self.snapshot()
        if txn is not None and txn in self._committed_txns():
            return base.version if base else 0
        files = list(base.files) if base else []
        return self._commit(files + self._write_data(df), "append", base, txn)

    # ---------------------------------------- copy-on-write mutations

    def _scan_with_fp(self, files) -> DataFrame:
        """Snapshot scan carrying each row's source file as a regular
        column.  ``_metadata`` resolves only directly against the file
        source, so it must be projected here, before any join/filter."""
        return self.spark.read.parquet(*files).withColumn(
            "_fp", F.col("_metadata.file_path")
        )

    @staticmethod
    def _affected_files(pred_df: DataFrame) -> list[str]:
        """Distinct source files of ``pred_df``'s rows — metadata-sized
        (a few paths), safe to collect on the driver.  file_path comes
        back as a URI (``file:/x`` or ``file:///x``); normalize to the
        plain paths the manifests store."""
        from urllib.parse import urlparse

        rows = pred_df.select("_fp").distinct().collect()
        return sorted(urlparse(r._fp).path for r in rows)

    def update(self, where: Column, set_map: dict[str, Column]) -> int:
        """``UPDATE <table> SET ... WHERE ...`` as file-granular
        copy-on-write: only files containing matching rows are
        rewritten; everything else carries over by reference.  Returns
        the number of rows updated."""
        base = self.snapshot()
        if base is None:
            raise FileNotFoundError(f"no committed version under {self.root}")
        affected = self._affected_files(
            self._scan_with_fp(base.files).filter(where)
        )
        if not affected:
            return 0
        hit = self.spark.read.parquet(*affected)
        n = hit.filter(where).count()
        updated = hit
        for col_name, value in set_map.items():
            updated = updated.withColumn(
                col_name, F.when(where, value).otherwise(F.col(col_name))
            )
        survivors = [f for f in base.files if f not in set(affected)]
        self._commit(survivors + self._write_data(updated), "update", base)
        return n

    def upsert(self, batch: DataFrame, key: str) -> int:
        """MERGE keyed by ``key``: batch rows replace existing rows
        with the same key, new keys append.  Only files containing a
        colliding key are rewritten.  Within-batch duplicate keys are
        collapsed (arbitrary winner) so the invariant 'one row per key
        per commit' holds.  Returns the committed version."""
        batch = batch.dropDuplicates([key])
        base = self.snapshot()
        if base is None:
            return self._commit(self._write_data(batch), "upsert", None)
        keys = F.broadcast(batch.select(key).distinct())
        affected = self._affected_files(
            self._scan_with_fp(base.files).join(keys, key, "left_semi")
        )
        if affected:
            kept = self.spark.read.parquet(*affected).join(keys, key, "left_anti")
            new_data = kept.unionByName(batch.select(*kept.columns))
        else:
            new_data = batch
        survivors = [f for f in base.files if f not in set(affected)]
        return self._commit(survivors + self._write_data(new_data), "upsert", base)

    def compact(
        self, target_bytes: int = 128 << 20, small_frac: float = 0.5
    ) -> int:
        """OPTIMIZE: coalesce small files into ~``target_bytes``
        outputs (the small-file problem every streaming-append table
        develops — per-trigger commits at 100 TB mean millions of tiny
        parquet files, and scan task count tracks file count).  Files
        already >= ``small_frac * target_bytes`` carry over by
        reference; only the small tail is read and rewritten, so the
        cost is proportional to the fragmentation, not the table.
        Content-neutral: same rows before and after (a lost commit
        race is safe to retry).  Returns the committed version.

        File sizes come from a driver-side stat of the manifest's file
        list — metadata-sized, like the manifest itself; a real log
        store records sizes in the manifest and skips the stat."""
        base = self.snapshot()
        if base is None:
            raise FileNotFoundError(f"no committed version under {self.root}")
        small = [
            f
            for f in base.files
            if os.path.getsize(f) < target_bytes * small_frac
        ]
        if len(small) < 2:
            return base.version  # nothing to coalesce
        total = sum(os.path.getsize(f) for f in small)
        n_out = max(1, -(-total // target_bytes))  # ceil
        packed = self.spark.read.parquet(*small).repartition(n_out)
        survivors = [f for f in base.files if f not in set(small)]
        return self._commit(
            survivors + self._write_data(packed), "compact", base
        )

    # ------------------------------------------------------- cleanup

    def vacuum(self, retain: int = 1) -> list[str]:
        """Delete data files unreferenced by the newest ``retain``
        manifests and drop older manifests.  Crash-orphaned commit
        directories (written but never referenced) go too.  Dropping a
        manifest forgets its txn tag, so keep ``retain`` larger than
        any writer's possible replay horizon (the same contract Delta
        VACUUM has with idempotent-writer history)."""
        import shutil

        versions = self._versions()
        if not versions:
            return []
        keep_versions = versions[-retain:]
        referenced: set[str] = set()
        for v in keep_versions:
            with open(os.path.join(self.log_dir, _manifest_name(v))) as f:
                referenced.update(json.load(f)["files"])
        removed: list[str] = []
        if os.path.isdir(self.data_dir):
            for commit_dir in os.listdir(self.data_dir):
                cdir = os.path.join(self.data_dir, commit_dir)
                members = {
                    os.path.join(cdir, n)
                    for n in os.listdir(cdir)
                    if n.endswith(".parquet")
                }
                if members and not (members & referenced):
                    shutil.rmtree(cdir)
                    removed.extend(sorted(members))
        for v in versions[:-retain]:
            os.unlink(os.path.join(self.log_dir, _manifest_name(v)))
        return removed
