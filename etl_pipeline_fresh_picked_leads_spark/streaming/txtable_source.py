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

from .. import txlog  # pure Python (no Spark session): safe to ship
# to Python workers alongside this module

_LOG_DIR = "_txlog"  # mirrors sources/txtable.py

_manifest_name = txlog.manifest_name
_versions = txlog.versions
# materialized view: delta-form manifests (r11 log checkpointing)
# reconstruct transparently
_manifest = txlog.load_manifest


def _manifest_ts_us(log_dir: str, version: int) -> "int | None":
    """Commit timestamp (epoch µs) of a version via the commit index
    (r11) — heals pre-r10 manifests with the file-mtime fallback, the
    same rule as TxTable._ts_of."""
    return txlog.read_index(log_dir, [version]).get(version, {}).get("ts")


def _parse_ts_us(value) -> int:
    """User timestamp option -> epoch µs (ISO-8601 string, naive = UTC
    like the engine session, or epoch seconds)."""
    import datetime as _dt

    s = str(value)
    try:
        return int(float(s) * 1_000_000)
    except ValueError:
        pass
    dt = _dt.datetime.fromisoformat(s)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=_dt.timezone.utc)
    return int(dt.timestamp() * 1_000_000)


def _version_at_ts(log_dir: str, bound_us: int, root: str) -> int:
    """Newest retained version committed at or before the bound —
    TIMESTAMP AS OF resolution (ts is monotone over versions).  One
    commit-index read, not a per-version manifest walk (r11)."""
    vs = _versions(log_dir)
    idx = txlog.read_index(log_dir, vs)
    chosen = None
    for v in vs:
        ts = idx.get(v, {}).get("ts")
        if ts is not None and ts <= bound_us:
            chosen = v
    if chosen is None:
        raise FileNotFoundError(
            f"timestampAsOf predates the earliest retained commit of "
            f"{root}" + (f" (earliest version {vs[0]})" if vs else "")
        )
    return chosen


@dataclass
class _FilePartition(InputPartition):
    file: str
    phys_names: list[str]  # physical column name per logical field
    dv_paths: list[str]  # deletion-vector sidecars naming this file
    keep_dv_rows: bool = False  # CDF delete partitions: the DV rows
    # ARE the payload (semi mask) instead of being subtracted (anti)
    change: "tuple | None" = None  # (_change_type, _commit_version)
    # when reading as a change feed; None = plain snapshot read
    cdf_version: "int | None" = None  # when set, ``file`` is an exact
    # per-commit CDF sidecar (r10): logical columns + its own
    # _change_type column; read verbatim, NULL-filling columns the
    # commit's schema predates, tagging this _commit_version
    cdf_labels: str = "simple"  # r11, mirrors read_changes(labels=):
    # "simple" collapses the sidecars' Delta tags to delete/insert
    # (the oracle-gated default); "delta" passes the four-label form
    # through (update_preimage/update_postimage pair updates), so a
    # streaming CDC consumer can tell an update from delete+insert —
    # Delta's readChangeFeed emits these natively


def _read_file_partition(part: _FilePartition, logical: StructType):
    """Executor-side: one parquet file -> arrow batches under LOGICAL
    names with DV positions masked out (or, for CDF delete
    partitions, kept — the sidecar names the payload).  Runs in the
    Python worker; pyarrow only, no Spark."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    want = to_arrow_schema(logical)
    if part.cdf_version is not None:
        # exact CDF sidecar: logical names at commit time + a per-row
        # _change_type column.  NULL-fill columns added after the
        # commit, cast narrower types up to the stream's schema.
        raw = pq.read_table(part.file)
        n = raw.num_rows
        avail = set(raw.schema.names)
        arrays = [
            raw.column(f.name) if f.name in avail else pa.nulls(n, f.type)
            for f in want
        ]
        out_schema = pa.schema(
            list(want)
            + [
                pa.field("_change_type", pa.string()),
                pa.field("_commit_version", pa.int64()),
            ]
        )
        # default ("simple"): collapse the sidecars' Delta labels
        # (update_preimage/postimage, r10) so the feed stays in parity
        # with read_changes' default labeling; labels="delta" (r11)
        # passes the four-label form through, = read_changes(labels=
        # "delta")
        ct = raw.column("_change_type").cast(pa.string())
        if part.cdf_labels != "delta":
            ct = pc.if_else(
                pc.equal(ct, "update_preimage"),
                pa.scalar("delete", pa.string()),
                pc.if_else(
                    pc.equal(ct, "update_postimage"),
                    pa.scalar("insert", pa.string()),
                    ct,
                ),
            )
        tbl = pa.Table.from_arrays(
            arrays
            + [
                ct,
                pa.array([part.cdf_version] * n, pa.int64()),
            ],
            names=out_schema.names,
        )
        if tbl.schema != out_schema:
            tbl = tbl.cast(out_schema)
        yield from tbl.to_batches(max_chunksize=1 << 16)
        return
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
        pos = pa.array(range(tbl.num_rows), type=pa.int64())
        mask = pc.is_in(pos, value_set=pa.array(dead, type=pa.int64()))
        tbl = tbl.filter(mask if part.keep_dv_rows else pc.invert(mask))
    elif part.keep_dv_rows:
        tbl = tbl.slice(0, 0)  # defensive: no sidecar, no payload
    if part.change is not None:
        kind, version = part.change
        n = tbl.num_rows
        tbl = tbl.append_column(
            "_change_type", pa.array([kind] * n, pa.string())
        ).append_column(
            "_commit_version", pa.array([version] * n, pa.int64())
        )
        want = pa.schema(
            list(want)
            + [
                pa.field("_change_type", pa.string()),
                pa.field("_commit_version", pa.int64()),
            ]
        )
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


def _cdf_partitions_for_step(
    log_dir: str, root: str, v: int, labels: str = "simple"
):
    """Change partitions for ONE version step v-1 -> v, mirroring
    TxTable.read_changes semantics: added files -> inserts (live rows
    under the step's own vectors), removed files -> deletes under the
    PREV version's vectors, fresh DV sidecar entries on carried files
    -> exact row deletes; content-neutral compact/purge emit
    nothing.  ``labels="delta"`` (r11) passes the CDF sidecars'
    four-label tags through and tags update_dv steps as
    update_preimage/update_postimage — the same rule as
    read_changes(labels="delta"); merge_dv/pre-r10/restore steps
    can't pair and keep delete/insert under either labeling."""
    cur = _manifest(log_dir, v)
    if cur.get("op") in ("compact", "purge"):
        return []
    if cur.get("cdf"):
        # the commit recorded its exact changeset (r10) — read the
        # sidecar instead of diffing files, exactly like read_changes
        return [
            _FilePartition(p, [], [], cdf_version=v, cdf_labels=labels)
            for p in cur["cdf"]
        ]
    delta_update = labels == "delta" and cur.get("op") == "update_dv"
    prev = _manifest(log_dir, v - 1) if v > 1 else None
    prev_files = set(prev["files"]) if prev else set()
    prev_dvs = (prev.get("dvs") or {}) if prev else {}
    out: list[_FilePartition] = []
    added = [f for f in cur["files"] if f not in prev_files]
    for p in _partitions_for(root, cur, added):
        p.change = ("update_postimage" if delta_update else "insert", v)
        out.append(p)
    if prev:
        removed = [f for f in prev["files"] if f not in set(cur["files"])]
        for p in _partitions_for(root, prev, removed):
            p.change = ("delete", v)
            out.append(p)
        # fresh sidecar entries on carried files: exact row deletes
        # (update_dv: the pre-images of the rewritten rows)
        phys = None
        for f, paths in (cur.get("dvs") or {}).items():
            fresh = sorted(set(paths) - set(prev_dvs.get(f, [])))
            if not fresh or f not in prev_files:
                continue
            if phys is None:
                logical = StructType.fromJson(json.loads(cur["schema"]))
                cm = cur.get("colmap")
                pm = (
                    {c["name"]: c["phys"] for c in cm}
                    if cm is not None
                    else {}
                )
                phys = [pm.get(fd.name, fd.name) for fd in logical.fields]
            out.append(
                _FilePartition(
                    f,
                    phys,
                    fresh,
                    keep_dv_rows=True,
                    change=(
                        "update_preimage" if delta_update else "delete",
                        v,
                    ),
                )
            )
    return out


class _TxStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        root: str,
        schema: StructType,
        starting_version: "int | str | None" = None,
        max_versions_per_trigger: int | None = None,
        change_feed: bool = False,
        starting_timestamp=None,
        cdf_labels: str = "simple",
    ):
        self.root = root
        self.log_dir = os.path.join(root, _LOG_DIR)
        self.logical = schema
        self.cdf_labels = cdf_labels
        self.starting_version = starting_version
        self.starting_timestamp = starting_timestamp
        self.max_versions = max_versions_per_trigger
        self.change_feed = change_feed
        self._seen: int | None = None  # newest end handed to partitions()

    def initialOffset(self) -> dict:
        # default: start BEFORE the first commit — the initial
        # snapshot is delivered as the first batch (Delta source
        # default).  startingVersion="latest" skips the backfill
        # (changes-only tailing); an integer starts after that
        # committed version.  startingTimestamp (r10, Delta parity):
        # deliver every commit AT OR AFTER the bound — the offset is
        # (first version with ts >= bound) - 1; a future bound tails
        # only commits that land after it.
        if self.starting_timestamp is not None:
            if self.starting_version is not None:
                raise ValueError(
                    "txtable source: pass startingVersion OR "
                    "startingTimestamp, not both"
                )
            bound = _parse_ts_us(self.starting_timestamp)
            vs = _versions(self.log_dir)
            idx = txlog.read_index(self.log_dir, vs)
            for v in vs:  # ts monotone: first match wins
                ts = idx.get(v, {}).get("ts")
                if ts is not None and ts >= bound:
                    return {"version": v - 1}
            return {"version": vs[-1] if vs else 0}
        if self.starting_version is None:
            return {"version": 0}
        if self.starting_version == "latest":
            vs = _versions(self.log_dir)
            return {"version": vs[-1] if vs else 0}
        return {"version": int(self.starting_version)}

    def latestOffset(self) -> dict:
        vs = _versions(self.log_dir)
        head = vs[-1] if vs else 0
        if self.max_versions is None:
            return {"version": head}
        # rate limiting: advance at most N versions past the newest
        # end this reader has handed out.  After a restart the first
        # trigger may be empty (we haven't seen the checkpoint's
        # start yet — partitions() records it); the next trigger
        # advances normally.  Under availableNow the run drains to
        # the capped end only — re-trigger to continue (documented).
        base = self._seen if self._seen is not None else 0
        return {"version": min(head, base + self.max_versions)}

    def partitions(self, start: dict, end: dict):
        self._seen = max(start["version"], end["version"])
        return self._partitions(start, end)

    def _partitions(self, start: dict, end: dict):
        sv, ev = start["version"], end["version"]
        if ev <= sv:
            return [_FilePartition("", [], [])]  # empty trigger
        try:
            if self.change_feed:
                first = 1 if sv == 0 else sv + 1
                out = [
                    p
                    for v in range(first, ev + 1)
                    for p in _cdf_partitions_for_step(
                        self.log_dir, self.root, v, self.cdf_labels
                    )
                ]
                return out or [_FilePartition("", [], [])]
            old_files: set[str] = set()
            if sv > 0:
                old_files = set(_manifest(self.log_dir, sv)["files"])
            head = _manifest(self.log_dir, ev)
        except FileNotFoundError as e:
            raise FileNotFoundError(
                f"txtable source at {self.root}: version {sv}..{ev} "
                "is no longer in the log — vacuum retention passed "
                "the stream's checkpoint (keep `retain` above the "
                "longest consumer outage, the Delta-source contract)"
            ) from e
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


def _bounds_from_filters(filters) -> dict:
    """NECESSARY per-column intervals from pushed-down filters (the
    AND of the list): {col: (lo, hi)}.  Strict comparisons widen to
    inclusive bounds — pruning needs a SUPERSET of matching files,
    never exactness.  Unrecognized filter types contribute nothing."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        LessThan,
        LessThanOrEqual,
    )

    out: dict = {}

    def tighten(col, lo, hi):
        plo, phi = out.get(col, (None, None))
        try:
            lo = plo if lo is None else (lo if plo is None else max(plo, lo))
            hi = phi if hi is None else (hi if phi is None else min(phi, hi))
        except TypeError:
            return  # incomparable literals: skip, stay conservative
        out[col] = (lo, hi)

    for f in filters:
        attr = getattr(f, "attribute", None)
        if not attr or len(attr) != 1:
            continue  # nested/qualified columns: not stats-addressed
        col = attr[0]
        if isinstance(f, EqualTo):
            tighten(col, f.value, f.value)
        elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
            tighten(col, f.value, None)
        elif isinstance(f, (LessThan, LessThanOrEqual)):
            tighten(col, None, f.value)
        elif isinstance(f, In):
            vals = list(f.value)  # Tuple[Any, ...] field
            if vals:
                try:
                    tighten(col, min(vals), max(vals))
                except TypeError:
                    pass
    return out


def _prune_files_by_stats(manifest: dict, bounds: dict) -> list:
    """Manifest-level file skipping for the batch reader — the
    pure-Python mirror of TxTable.files_in_range: a file is skipped
    only when its recorded [min, max] provably cannot intersect the
    bound; files without stats (or with incomparable representations)
    are admitted conservatively.  Date/timestamp stats JSON-serialize
    as ISO strings, so non-string bounds compare via str() — lexical
    order == temporal order for ISO forms (same rule as
    TxTable._norm_bound)."""
    files = list(manifest["files"])
    stats = manifest.get("stats") or {}
    if not bounds or not stats:
        return files

    def admit(fp: str) -> bool:
        st = stats.get(fp)
        if not st:
            return True  # stat-less file: conservative
        for col, (lo, hi) in bounds.items():
            smin = (st.get("min") or {}).get(col)
            smax = (st.get("max") or {}).get(col)
            if smin is None or smax is None:
                continue  # NULL-only or unrecorded column
            if isinstance(smin, str):
                lo = str(lo) if lo is not None and not isinstance(lo, str) else lo
                hi = str(hi) if hi is not None and not isinstance(hi, str) else hi
            try:
                if lo is not None and smax < lo:
                    return False
                if hi is not None and smin > hi:
                    return False
            except TypeError:
                continue  # incomparable: admit
        return True

    return [f for f in files if admit(f)]


class _TxBatchReader(DataSourceReader):
    def __init__(
        self, root: str, schema: StructType, version: "int | None" = None
    ):
        self.root = root
        self.log_dir = os.path.join(root, _LOG_DIR)
        self.logical = schema
        self.version = version  # pinned by versionAsOf / timestampAsOf
        self.bounds: dict = {}  # set by pushFilters (pushdown subclass)

    def partitions(self):
        vs = _versions(self.log_dir)
        if not vs:
            return [_FilePartition("", [], [])]
        head = _manifest(self.log_dir, self.version or vs[-1])
        files = _prune_files_by_stats(head, self.bounds)
        if not files:
            return [_FilePartition("", [], [])]
        return _partitions_for(self.root, head, files)

    def read(self, partition: _FilePartition):
        if not partition.file:
            return iter(())
        return _read_file_partition(partition, self.logical)


class _TxBatchReaderPushdown(_TxBatchReader):
    """The default batch reader: adds ``pushFilters`` manifest-stats
    file skipping (Spark 4.1 Python Data Source filter pushdown).
    Split from the base class so ``.option("pushdown", "false")`` can
    return a reader that does NOT implement pushFilters at all —
    Spark hard-errors on a pushFilters-bearing reader whenever
    ``spark.sql.python.filterPushdown.enabled`` is off in the
    planning session, and the option decision rides the DataSource
    options (available in the plan worker, no session needed), so it
    works as an escape hatch in ANY session."""

    def pushFilters(self, filters):
        """Manifest-stats FILE skipping (r11): interval bounds from
        the pushed conjunction prune the partition list — a key-range
        read of a stats-clustered 100 TB table plans partitions for
        one slice instead of every file.  EVERY filter is returned
        for Spark to re-apply row-level: file pruning admits a
        SUPERSET of matching rows by design, so correctness never
        depends on this path (the same contract as Delta's data
        skipping + Spark's post-scan filters)."""
        self.bounds = _bounds_from_filters(filters)
        return filters  # all re-evaluated by Spark post-scan


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

    def _cdf(self) -> bool:
        return str(
            self.options.get("readchangefeed", "false")
        ).lower() in ("true", "1", "yes")

    def _cdf_labels(self) -> str:
        """r11: .option("labels", "delta") emits the four-label Delta
        CDF tags on the change feed; default "simple" keeps the
        two-label form the oracles are keyed on."""
        labels = str(self.options.get("labels", "simple")).lower()
        if labels not in ("simple", "delta"):
            raise ValueError(
                f"txtable: labels must be 'simple' or 'delta', "
                f"got {labels!r}"
            )
        return labels

    def _pinned_version(self) -> "int | None":
        """Batch time travel (r10): versionAsOf / timestampAsOf pin a
        committed version; None = the head.  Mutually exclusive, like
        Delta's reader options."""
        v_opt = self.options.get("versionasof")
        ts_opt = self.options.get("timestampasof")
        if v_opt is not None and ts_opt is not None:
            raise ValueError(
                "txtable: pass versionAsOf OR timestampAsOf, not both"
            )
        log_dir = os.path.join(self._root(), _LOG_DIR)
        if v_opt is not None:
            v = int(v_opt)
            vs = _versions(log_dir)
            if v not in vs:
                raise FileNotFoundError(
                    f"version {v} of {self._root()} does not exist "
                    + (f"(live: {vs[0]}..{vs[-1]})" if vs else "(empty log)")
                )
            return v
        if ts_opt is not None:
            return _version_at_ts(
                log_dir, _parse_ts_us(ts_opt), self._root()
            )
        return None

    def schema(self) -> StructType:
        log_dir = os.path.join(self._root(), _LOG_DIR)
        vs = _versions(log_dir)
        if not vs:
            raise FileNotFoundError(
                f"no committed version under {self._root()}"
            )
        # a pinned read carries the PINNED version's schema — time
        # travel across an add_column must not NULL-fill forward
        m = _manifest(log_dir, self._pinned_version() or vs[-1])
        if not m.get("schema"):
            raise ValueError(
                "txtable source needs a schema-bearing manifest"
            )
        base = StructType.fromJson(json.loads(m["schema"]))
        if self._cdf():
            base = base.add("_change_type", "string").add(
                "_commit_version", "long"
            )
        return base

    def reader(self, schema: StructType) -> _TxBatchReader:
        if "labels" in self.options:
            # ADVICE r11: only the STREAMING change feed honors label
            # shaping; silently ignoring it here would let a batch
            # consumer believe it got four-label output.  Batch users
            # of labeled changes go through TxTable.read_changes(...)
            raise ValueError(
                "txtable: the 'labels' option applies to streaming "
                "readChangeFeed only; for labeled batch changes use "
                "TxTable.read_changes(labels=...)"
            )
        pushdown = str(self.options.get("pushdown", "true")).lower()
        cls = (
            _TxBatchReader
            if pushdown in ("false", "0", "no")
            else _TxBatchReaderPushdown
        )
        return cls(self._root(), schema, version=self._pinned_version())

    def streamReader(self, schema: StructType) -> _TxStreamReader:
        mv = self.options.get("maxversionspertrigger")
        cdf = self._cdf()
        logical = schema
        if cdf:  # the partition readers work on the TABLE schema
            from pyspark.sql.types import StructType as _ST

            logical = _ST(
                [
                    f
                    for f in schema.fields
                    if f.name not in ("_change_type", "_commit_version")
                ]
            )
        return _TxStreamReader(
            self._root(),
            logical,
            starting_version=self.options.get("startingversion"),
            max_versions_per_trigger=int(mv) if mv else None,
            change_feed=cdf,
            starting_timestamp=self.options.get("startingtimestamp"),
            cdf_labels=self._cdf_labels(),
        )

    def writer(self, schema: StructType, overwrite: bool):
        return _TxBatchWriter(self._root(), schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        if overwrite:
            raise ValueError(
                "txtable streaming sink supports append mode only"
            )
        return _TxStreamWriter(self._root(), schema)


def register(spark) -> None:
    """Idempotent registration of the ``txtable`` format.  Also
    enables Python-data-source filter pushdown (r11): the batch
    reader implements ``pushFilters`` for manifest-stats file
    skipping, and Spark REFUSES to plan a pushFilters-bearing reader
    while the conf is off — so the conf is part of registering the
    format, not a tuning knob."""
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        # belt-and-braces: SQLConf.get on a JVM thread with a stale /
        # absent active-session thread-local falls back past the
        # session conf (observed once in a long mixed-workload suite:
        # a pushFilters-bearing reader planned under the conf's FALSE
        # default).  A JVM system property covers that fallback; the
        # per-read .option("pushdown", "false") escape hatch covers
        # anything else.
        spark._jvm.java.lang.System.setProperty(
            "spark.sql.python.filterPushdown.enabled", "true"
        )
    except Exception:  # pragma: no cover — ancient/locked-down session
        pass
    spark.dataSource.register(TxTableDataSource)


# ------------------------------------------------------------------ writers

from dataclasses import field as _field  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)


@dataclass
class _WroteFiles(WriterCommitMessage):
    files: list = _field(default_factory=list)
    n_rows: int = 0
    row_hash_sum: int = 0  # order/partition-insensitive content term
    stats: dict = _field(default_factory=dict)  # {path: rows/min/max}


# Spark's ExternalCatalogUtils.escapePathName charset: partition dir
# segments written here must be byte-identical to what the engine's
# partitionBy writer produces, or compact(partition=)/vacuum path
# matching would silently miss sink-written files.
_PATH_ESCAPE = set('"#%\'*/:=?\\\x7f{[]^')


def _esc_path(s: str) -> str:
    return "".join(
        "%%%02X" % ord(ch) if ch in _PATH_ESCAPE or ord(ch) < 0x20 else ch
        for ch in s
    )


def _part_seg(phys: str, value) -> str:
    """One ``__txp_<phys>=<value>`` path segment, Spark-canonical:
    None/NaN -> the Hive null marker, bools lowercase, ints/dates via
    their canonical str form (the engine's documented round-trip
    set)."""
    try:
        is_nan = value is None or value != value
    except Exception:  # non-comparable exotic type
        is_nan = value is None
    if is_nan:
        raw = "__HIVE_DEFAULT_PARTITION__"
    elif isinstance(value, bool):
        raw = "true" if value else "false"
    else:
        raw = _esc_path(str(value))
    return f"__txp_{phys}={raw}"


def _stat_py(v):
    """JSON-native stat value (json.dumps(default=str) parity with
    the engine: numpy scalars unwrap, dates/timestamps go ISO)."""
    if v is None:
        return None
    try:
        if v != v:
            return None  # NaN/NaT
    except Exception:
        pass
    if hasattr(v, "item"):
        v = v.item()
    if not isinstance(v, (int, float, str, bool)):
        v = str(v)  # date/datetime: ISO, same as default=str
    return v


def _write_task(
    root: str,
    schema: StructType,
    iterator,
    colmap=None,
    partition_by=None,
    stats_cols=None,
):
    """Executor-side: drain this task's Arrow batches into fresh
    parquet under the table's data dir.  The directory is staged
    before any manifest references it — exactly the writer protocol
    TxTable.vacuum's min-age guard assumes — so an aborted batch
    leaves only an unreferenced young dir for vacuum.

    ``colmap`` (r10): the target's column mapping at stream start —
    files must speak PHYSICAL names (every other writer/reader of the
    table does; a logical-named file would silently read as all-NULL
    after the colmap projection).  The fingerprint is computed on the
    logical frame BEFORE the rename: content identity is invariant
    under physical naming.

    ``partition_by`` (r13): the target's partition spec (logical
    names).  The task splits its rows by partition value and writes
    ONE file per value under the engine's ``__txp_<phys>=<value>``
    path layout — the file-per-partition-value invariant holds
    without a Spark session, so the native sink now accepts
    partitioned targets.  File-count shape: a trigger writes up to
    tasks × values-per-task files; for HIGH-cardinality specs,
    pre-repartition the stream on the partition column
    (``df.repartition(col)`` before writeStream) so each value lands
    in one task — the engine's arrange=True does the same shuffle,
    which a post-plan writer cannot inject itself.  ``stats_cols`` min/max/rows ride back to
    the driver per file (spec columns are single-valued per file, so
    min==max and partition pruning works on sink-written files
    exactly as on engine-written ones)."""
    import uuid as _uuid

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    batches = list(iterator)
    if not batches:
        return _WroteFiles([])
    tbl = pa.Table.from_batches(batches)
    want = to_arrow_schema(schema)
    if tbl.schema != want:
        tbl = tbl.cast(want)
    # order-insensitive row fingerprint (vectorized): summed row
    # hashes are invariant under any re-partitioning, so the driver's
    # txn tag survives a checkpoint-loss re-split replay — the same
    # convention as streaming/sinks.df_fingerprint
    pdf = tbl.to_pandas()
    hashes = pd.util.hash_pandas_object(pdf, index=False).to_numpy()
    hsum = int(hashes.astype("uint64").sum() % (1 << 64))
    phys = (
        {c["name"]: c["phys"] for c in colmap} if colmap is not None else {}
    )
    if colmap is not None:
        tbl = tbl.rename_columns(
            [phys.get(n, n) for n in tbl.column_names]
        )
    scols = [c for c in (stats_cols or []) if c in pdf.columns]

    def _stats_of(slice_tbl) -> dict:
        # stats from the ARROW slice, not pandas: the same float64
        # promotion that broke partition path values (above) turns an
        # int64-with-NULL column's min/max into 1.0 where the engine
        # writes 1 — numerically equal for pruning, but the delta-
        # manifest stats-equality guard would then always fall back to
        # full form for sink-written survivors.  min_max skips nulls;
        # an all-null column yields None on both writers.
        import pyarrow.compute as pc

        mins, maxs = {}, {}
        for c in scols:
            mm = pc.min_max(slice_tbl.column(phys.get(c, c)))
            mins[c] = _stat_py(mm["min"].as_py())
            maxs[c] = _stat_py(mm["max"].as_py())
        return {"rows": slice_tbl.num_rows, "min": mins, "max": maxs}

    out_dir = os.path.join(root, "data", _uuid.uuid4().hex)
    if not partition_by:
        os.makedirs(out_dir)
        path = os.path.join(out_dir, "part-00000.parquet")
        pq.write_table(tbl, path)
        stats = {path: _stats_of(tbl)} if scols else {}
        return _WroteFiles([path], tbl.num_rows, hsum, stats)
    files, stats = [], {}
    # group row indices by the ARROW values, not a pandas groupby:
    # pandas promotes an int64 column with any NULL to float64, so
    # (a) the pdf value would write '__txp_p=1.0' where the engine
    # writes '__txp_p=1' (ADVICE r13, fixed r14 for segment values)
    # and (b) two distinct int64 values >= 2^53 that collide in
    # float64 would GROUP into one file under one path key (ADVICE
    # r14) — grouping and segment naming must use the same exact
    # values.  VECTORIZED via Table.group_by (r16, VERDICT r15 #7:
    # the r15 fix looped per row in Python — pure interpreter time at
    # a 1M-row Arrow batch): NaN pre-normalizes to null so all
    # null-ish rows share the Hive null partition (what the per-row
    # _norm_key did); use_threads=False pins first-appearance group
    # order and ascending in-group row order, exactly the dict-insert
    # order of the loop it replaces (pinned in tests).
    import numpy as np
    import pyarrow.compute as pc

    pcols = [phys.get(c, c) for c in partition_by]
    karrs = []
    for name in pcols:
        col = tbl.column(name)
        if pa.types.is_floating(col.type):
            # Arrow's grouper hashes floats bitwise: NaN and -0.0
            # would split from null and +0.0 — the Python-equality
            # loop this replaces grouped them (NaN with nothing ->
            # normalized to the null partition; -0.0 == 0.0)
            col = pc.if_else(
                pc.is_nan(col),
                pa.scalar(None, col.type),
                pc.if_else(
                    pc.equal(col, 0.0), pa.scalar(0.0, col.type), col
                ),
            )
        karrs.append(col)
    gtbl = pa.table(
        dict(
            [(f"_k{i}", a) for i, a in enumerate(karrs)]
            + [
                (
                    "_idx",
                    pa.array(np.arange(tbl.num_rows, dtype=np.int64)),
                )
            ]
        )
    )
    grouped = gtbl.group_by(
        [f"_k{i}" for i in range(len(pcols))], use_threads=False
    ).aggregate([("_idx", "list")])
    idx_lists = grouped.column("_idx_list")
    for i in range(grouped.num_rows):
        seq = idx_lists[i].values
        part_tbl = tbl.take(seq)
        segs = [
            _part_seg(name, part_tbl.column(name)[0].as_py())
            for name in pcols
        ]
        d = os.path.join(out_dir, *segs)
        os.makedirs(d)
        path = os.path.join(d, f"part-{i:05d}.parquet")
        pq.write_table(part_tbl, path)
        files.append(path)
        if scols:
            stats[path] = _stats_of(part_tbl)
    return _WroteFiles(sorted(files), tbl.num_rows, hsum, stats)


def _head_version_and_manifest(log_dir: str):
    # index-hint + forward-probe head discovery (txlog, VERDICT r11
    # #4) — flat in retained version count, listdir only as fallback
    return txlog.head_version_and_manifest(log_dir)


def _sink_guards(
    m: dict | None,
    schema: StructType,
    op: str,
    check_schema: bool = True,
) -> None:
    """The native sink is manifest-only on the driver (no Spark
    session in the commit callback), so table features whose
    enforcement needs a query engine are refused LOUDLY instead of
    silently skipped.  ``check_schema=False`` for overwrite, which
    legitimately replaces the schema but must still refuse
    constraints/colmap (silently DROPPING a CHECK constraint or
    breaking the physical-name contract would be worse than the
    append-path refusal)."""
    if m is None:
        return
    if m.get("constraints"):
        raise ValueError(
            f"txtable {op}: target carries CHECK constraints, which "
            "this sink cannot validate — use txtable_sink_prepared "
            "(streaming/sinks.py, foreachBatch + engine-assisted "
            "append) for gated tables"
        )
    if m.get("generated"):
        raise ValueError(
            f"txtable {op}: target declares generated columns, which "
            "this sink cannot compute/validate — use "
            "txtable_sink_prepared (streaming/sinks.py)"
        )
    # partitioned targets are SUPPORTED since r13: tasks lay out
    # __txp_<phys>=<value> splits in the Arrow writer (_write_task)
    if m.get("identity"):
        # id assignment needs the engine's transactional watermark
        # bookkeeping (per-partition offset blocks under the pin) —
        # there is no sound manifest-only spelling of it
        raise ValueError(
            f"txtable {op}: target has identity column "
            f"{m['identity']['col']!r}, which this sink cannot assign "
            "— use txtable_sink_prepared (streaming/sinks.py)"
        )
    if m.get("colmap") is not None and not check_schema:
        # overwrite replaces the schema: the retired-name fence and
        # field-id bookkeeping need the engine — refuse.  Appends into
        # column-mapped tables are supported since r10: the writer
        # renames to physical names per the snapshot's colmap.
        raise ValueError(
            f"txtable {op}: target uses column mapping; overwrite "
            "needs field-id bookkeeping — use TxTable.overwrite"
        )
    if not check_schema:
        return
    if m.get("schema"):
        want = StructType.fromJson(json.loads(m["schema"]))
        if [
            (f.name, f.dataType.simpleString()) for f in want.fields
        ] != [(f.name, f.dataType.simpleString()) for f in schema.fields]:
            raise ValueError(
                f"txtable {op}: stream schema "
                f"{schema.simpleString()} != table schema "
                f"{want.simpleString()}"
            )


def _commit_append(
    root: str,
    schema: StructType,
    files: list[str],
    txn: str | None,
    op: str = "stream_sink",
    overwrite: bool = False,
    max_retries: int = 20,
    wrote_colmap=None,
    wrote_pby=None,
    new_stats: dict | None = None,
) -> int:
    """Driver-side manifest append — TxTable._commit's protocol
    (fsync temp + atomic-exclusive os.link) in pure Python.  Blind
    appends commute, so a lost race re-reads the head and re-links;
    guards re-run each attempt (a racing add_constraint must refuse
    us).  ``txn`` makes the commit exactly-once per tag.
    ``wrote_colmap`` is the mapping the TASKS renamed under (captured
    at stream start): a rename landing mid-stream makes the staged
    files speak stale physical names, so the commit refuses instead
    of linking them (restart the stream to adopt the new mapping).

    Per-trigger cost (r11): the txn-idempotency check reads the
    cached commit index (one sequential read + suffix parses across a
    stream's life), and the manifest writes delta-form when the
    append is small relative to the table — the two O(history) /
    O(table) terms VERDICT r10 flagged in exactly this code path."""
    log_dir = os.path.join(root, _LOG_DIR)
    os.makedirs(log_dir, exist_ok=True)
    for _ in range(max_retries + 1):
        head_v, m = _head_version_and_manifest(log_dir)
        _sink_guards(m, schema, op, check_schema=not overwrite)
        head_cm = m.get("colmap") if (m and not overwrite) else None
        if head_cm != wrote_colmap:
            raise ValueError(
                f"txtable {op}: the table's column mapping changed "
                "since this stream started (files were written under "
                "the old physical names) — restart the stream"
            )
        head_pby = (m.get("partition_by") or None) if m else None
        if head_pby != (wrote_pby or None):
            # the spec is immutable at CREATE, so this only fires when
            # the table was dropped+recreated under the stream — but
            # linking files laid out under the WRONG spec would break
            # the file-per-partition-value invariant silently
            raise ValueError(
                f"txtable {op}: the table's partition spec changed "
                "since this stream started — restart the stream"
            )
        if txn is not None and m is not None:
            # heal=True: the sink holds write intent here, matching
            # TxTable._committed_txns — a hole-y log heals once
            # instead of re-materializing every trigger (ADVICE r12)
            idx = txlog.read_index(log_dir, _versions(log_dir), heal=True)
            if txn in {e.get("txn") for e in idx.values()}:
                return head_v  # replayed batch: already landed
        carried = list(m["files"]) if (m and not overwrite) else []
        # commit timestamp parity with TxTable._commit (r10): monotone
        # epoch µs so TIMESTAMP AS OF / retain_hours see sink commits
        import time as _time

        parent_ts = m.get("ts") if m else None
        if parent_ts is None and m is not None:
            parent_ts = _manifest_ts_us(log_dir, head_v)
        now_us = int(_time.time() * 1_000_000)
        ts = now_us if parent_ts is None else max(parent_ts + 1, now_us)
        stats = (
            {
                f: m["stats"][f]
                for f in carried
                if m.get("stats") and f in m["stats"]
            }
            if m
            else {}
        )
        if new_stats:
            # per-file rows/min/max the Arrow tasks computed (r13):
            # sink-written files are now prunable like engine-written
            # ones — on partitioned targets the spec columns are
            # single-valued per file, so partition pruning holds
            stats.update(
                {f: new_stats[f] for f in files if f in new_stats}
            )
        manifest = {
            "version": head_v + 1,
            "op": op,
            "ts": ts,
            "files": carried + files,
            "txn": txn,
            "schema": json.dumps(schema.jsonValue()),
            "stats": stats or None,
            "dropped": list(m.get("dropped") or []) if m else [],
        }
        if m and m.get("stats_cols"):
            manifest["stats_cols"] = m["stats_cols"]
        if m and m.get("partition_by"):
            # the spec is a table property: immutable, rides every
            # commit (append AND overwrite) exactly as in the engine
            manifest["partition_by"] = m["partition_by"]
        if m and not overwrite and m.get("dvs"):
            manifest["dvs"] = m["dvs"]  # all carried files still live
        if m and not overwrite and m.get("colmap") is not None:
            # identity-only by guard; carry the mapping metadata
            manifest["colmap"] = m["colmap"]
            manifest["retired_phys"] = m.get("retired_phys") or []
            manifest["max_id"] = m.get("max_id")
        try:
            txlog.write_manifest(
                log_dir,
                manifest,
                parent_files=(m["files"] if m and not overwrite else None),
                parent_stats=(
                    m.get("stats") if m and not overwrite else None
                ),
                parent_chain=(
                    m.get("chain", 0) if m and not overwrite else 0
                ),
                parent_dvs=(
                    m.get("dvs") if m and not overwrite else None
                ),
            )
            return head_v + 1
        except FileExistsError:
            continue  # lost the race: retry against the new head
    raise RuntimeError(f"txtable sink: lost {max_retries} commit races")


def _require_spec_cols(pby, schema: StructType, op: str) -> None:
    """A write into a partitioned table must carry the spec columns
    (the engine's overwrite makes the same check): a file that cannot
    be value-split would break the partition invariant."""
    if not pby:
        return
    missing = [c for c in pby if c not in schema.fieldNames()]
    if missing:
        raise ValueError(
            f"txtable {op}: stream schema lacks partition column(s) "
            f"{missing}; the partition spec is immutable"
        )


def _abort_cleanup(messages) -> None:
    import shutil

    for msg in messages:
        if not msg:
            continue
        for f in msg.files:
            shutil.rmtree(os.path.dirname(f), ignore_errors=True)


class _TxStreamWriter(DataSourceStreamArrowWriter):
    """Streaming sink: every micro-batch commits ONE manifest
    appending all task files, tagged with an order-insensitive
    CONTENT fingerprint (row count + summed row hashes) — a replayed
    batch no-ops even after CHECKPOINT LOSS renumbers batches and
    re-splits the rows (the same partition-layout-proof convention
    as streaming/sinks.df_fingerprint; batch id alone would re-apply
    or drop under re-splits, the r8-reviewed hazard)."""

    def __init__(self, root: str, schema: StructType):
        self.root = root
        self.schema = schema
        # fail fast at stream start, not first commit
        m = _head_version_and_manifest(os.path.join(root, _LOG_DIR))[1]
        _sink_guards(m, schema, "stream_sink")
        # the mapping every task writes under for the stream's life;
        # a mid-stream rename is refused at commit (_commit_append)
        self.colmap = m.get("colmap") if m else None
        # partition spec + stats columns (r13): tasks lay out the
        # __txp_ value splits and compute per-file stats themselves
        self.pby = (m.get("partition_by") or None) if m else None
        self.stats_cols = (m.get("stats_cols") or None) if m else None
        _require_spec_cols(self.pby, schema, "stream_sink")

    def write(self, iterator):
        return _write_task(
            self.root,
            self.schema,
            iterator,
            self.colmap,
            self.pby,
            self.stats_cols,
        )

    def commit(self, messages, batchId: int) -> None:
        files = sorted(f for msg in messages if msg for f in msg.files)
        n = sum(msg.n_rows for msg in messages if msg)
        h = sum(msg.row_hash_sum for msg in messages if msg) % (1 << 64)
        stats: dict = {}
        for msg in messages:
            if msg:
                stats.update(msg.stats)
        _commit_append(
            self.root,
            self.schema,
            files,
            txn=f"txsink|{n}:{h}",
            wrote_colmap=self.colmap,
            wrote_pby=self.pby,
            new_stats=stats,
        )

    def abort(self, messages, batchId: int) -> None:
        _abort_cleanup(messages)


class _TxBatchWriter(DataSourceArrowWriter):
    """Batch sink: ``df.write.format("txtable").mode("append"|
    "overwrite")`` — all task files land in ONE atomic manifest."""

    def __init__(self, root: str, schema: StructType, overwrite: bool):
        self.root = root
        self.schema = schema
        self.overwrite = overwrite
        self.colmap = None
        # the head manifest is read in BOTH modes since r13: overwrite
        # replaces the rows but the partition spec is immutable and the
        # replacement files must be laid out under it
        m = _head_version_and_manifest(os.path.join(root, _LOG_DIR))[1]
        _sink_guards(m, schema, "batch_sink", check_schema=not overwrite)
        if not overwrite:  # append must match; overwrite replaces
            self.colmap = m.get("colmap") if m else None
        self.pby = (m.get("partition_by") or None) if m else None
        self.stats_cols = (m.get("stats_cols") or None) if m else None
        _require_spec_cols(self.pby, schema, "batch_sink")

    def write(self, iterator):
        return _write_task(
            self.root,
            self.schema,
            iterator,
            self.colmap,
            self.pby,
            self.stats_cols,
        )

    def commit(self, messages) -> None:
        files = sorted(f for msg in messages if msg for f in msg.files)
        stats: dict = {}
        for msg in messages:
            if msg:
                stats.update(msg.stats)
        _commit_append(
            self.root,
            self.schema,
            files,
            txn=None,
            op="overwrite" if self.overwrite else "append",
            overwrite=self.overwrite,
            wrote_colmap=self.colmap,
            wrote_pby=self.pby,
            new_stats=stats,
        )

    def abort(self, messages) -> None:
        _abort_cleanup(messages)
