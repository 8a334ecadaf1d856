"""TxTable as a first-class Spark data source (r9): register once,
then ``spark.readStream.format("txtable").option("path", root)`` tails
the table's commit log — the Delta-source pattern on plain parquet,
built on Spark 4's Python Data Source API (public
``pyspark.sql.datasource``).

Streaming semantics = the table's changefeed contract
(``TxTable.read_since``): offsets are committed VERSIONS, each
micro-batch delivers the rows of files ADDED between the previous and
current offset, with the end snapshot's deletion vectors applied to
the delivered files.  Manifests and data files are immutable, so a
(start, end] batch is bit-reproducible — checkpoint replay is
deterministic by construction.  Rewrite ops (update/upsert/compact)
re-deliver carried rows (over-approximation, never a miss — consumers
dedup on their key, the documented feed contract); DV deletes on
already-delivered files are not retracted (an add-only feed cannot
express deletion).

Scale shape: offset bookkeeping is manifest-only (driver reads two
JSON files per trigger), one InputPartition per data file (natural
parallelism = new-file count), executors read their file with pyarrow
and emit Arrow batches zero-copy — no JVM round-trip per row.  Column
mapping resolves physical -> logical per file; per-file DV positions
prune with one ``isin`` mask.

Batch mode (``spark.read.format("txtable")``) is the head snapshot
under the same machinery.

Parity note: the reference polls a directory for new CSVs per run
(fresh_picked_leads.py daily cadence); this source is that pattern
with transactional, exactly-once bookkeeping.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_LOG_DIR = "_txlog"  # mirrors sources/txtable.py (no Spark-session
# dependency here: this module is shipped to Python workers)


def _manifest_name(version: int) -> str:
    return f"v{version:010d}.json"


def _versions(log_dir: str) -> list[int]:
    if not os.path.isdir(log_dir):
        return []
    return sorted(
        int(n[1:11])
        for n in os.listdir(log_dir)
        if n.startswith("v") and n.endswith(".json")
    )


def _manifest(log_dir: str, version: int) -> dict:
    with open(os.path.join(log_dir, _manifest_name(version))) as f:
        return json.load(f)


@dataclass
class _FilePartition(InputPartition):
    file: str
    phys_names: list[str]  # physical column name per logical field
    dv_paths: list[str]  # deletion-vector sidecars naming this file


def _read_file_partition(part: _FilePartition, logical: StructType):
    """Executor-side: one parquet file -> arrow batches under LOGICAL
    names with DV positions masked out.  Runs in the Python worker;
    pyarrow only, no Spark."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    want = to_arrow_schema(logical)
    pf = pq.ParquetFile(part.file)
    avail = set(pf.schema_arrow.names)
    present = [c for c in part.phys_names if c in avail]
    raw = pq.read_table(part.file, columns=present)
    n_rows = pf.metadata.num_rows
    # logical order, NULL-filling columns the file predates (the same
    # schema-evolution semantics Spark's parquet reader gives TxTable)
    arrays = []
    for field, phys in zip(want, part.phys_names):
        if phys in avail:
            arrays.append(raw.column(phys))
        else:
            arrays.append(pa.nulls(n_rows, type=field.type))
    tbl = pa.Table.from_arrays(arrays, schema=None, names=want.names)
    if part.dv_paths:
        dv = pa.concat_tables(pq.read_table(p) for p in part.dv_paths)
        dv = dv.filter(pc.equal(dv["file"], part.file))
        dead = dv["pos"].to_pylist()
        if dead:
            pos = pa.array(range(tbl.num_rows), type=pa.int64())
            keep = pc.invert(
                pc.is_in(pos, value_set=pa.array(dead, type=pa.int64()))
            )
            tbl = tbl.filter(keep)
    # conform arrow types to the logical schema (a file written before
    # an ANSI-widening may carry narrower physical types)
    if tbl.schema != want:
        tbl = tbl.cast(want)
    yield from tbl.to_batches(max_chunksize=1 << 16)


def _partitions_for(
    root: str, manifest: dict, files: list[str]
) -> list[_FilePartition]:
    logical = StructType.fromJson(json.loads(manifest["schema"]))
    colmap = manifest.get("colmap")
    phys = (
        {c["name"]: c["phys"] for c in colmap}
        if colmap is not None
        else {}
    )
    phys_names = [phys.get(f.name, f.name) for f in logical.fields]
    dvs = manifest.get("dvs") or {}
    return [
        _FilePartition(f, phys_names, sorted(dvs.get(f, [])))
        for f in files
    ]


class _TxStreamReader(DataSourceStreamReader):
    def __init__(self, root: str, schema: StructType):
        self.root = root
        self.log_dir = os.path.join(root, _LOG_DIR)
        self.logical = schema

    def initialOffset(self) -> dict:
        # start BEFORE the first commit: the initial snapshot is
        # delivered as the first batch (Delta source default)
        return {"version": 0}

    def latestOffset(self) -> dict:
        vs = _versions(self.log_dir)
        return {"version": vs[-1] if vs else 0}

    def partitions(self, start: dict, end: dict):
        sv, ev = start["version"], end["version"]
        if ev <= sv:
            return [_FilePartition("", [], [])]  # empty trigger
        old_files: set[str] = set()
        if sv > 0:
            old_files = set(_manifest(self.log_dir, sv)["files"])
        head = _manifest(self.log_dir, ev)
        new_files = [f for f in head["files"] if f not in old_files]
        if not new_files:
            return [_FilePartition("", [], [])]
        return _partitions_for(self.root, head, new_files)

    def read(self, partition: _FilePartition):
        if not partition.file:
            return iter(())
        return _read_file_partition(partition, self.logical)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the engine's checkpoint; nothing to GC


class _TxBatchReader(DataSourceReader):
    def __init__(self, root: str, schema: StructType):
        self.root = root
        self.log_dir = os.path.join(root, _LOG_DIR)
        self.logical = schema

    def partitions(self):
        vs = _versions(self.log_dir)
        if not vs:
            return [_FilePartition("", [], [])]
        head = _manifest(self.log_dir, vs[-1])
        return _partitions_for(self.root, head, list(head["files"]))

    def read(self, partition: _FilePartition):
        if not partition.file:
            return iter(())
        return _read_file_partition(partition, self.logical)


class TxTableDataSource(DataSource):
    """``spark.dataSource.register(TxTableDataSource)`` then
    ``.format("txtable").option("path", <root>)`` for batch or
    streaming reads of a TxTable."""

    @classmethod
    def name(cls) -> str:
        return "txtable"

    def _root(self) -> str:
        root = self.options.get("path")
        if not root:
            raise ValueError("txtable source requires .option('path', root)")
        return root

    def schema(self) -> StructType:
        log_dir = os.path.join(self._root(), _LOG_DIR)
        vs = _versions(log_dir)
        if not vs:
            raise FileNotFoundError(
                f"no committed version under {self._root()}"
            )
        m = _manifest(log_dir, vs[-1])
        if not m.get("schema"):
            raise ValueError(
                "txtable source needs a schema-bearing manifest"
            )
        return StructType.fromJson(json.loads(m["schema"]))

    def reader(self, schema: StructType) -> _TxBatchReader:
        return _TxBatchReader(self._root(), schema)

    def streamReader(self, schema: StructType) -> _TxStreamReader:
        return _TxStreamReader(self._root(), schema)


def register(spark) -> None:
    """Idempotent registration of the ``txtable`` format."""
    spark.dataSource.register(TxTableDataSource)
