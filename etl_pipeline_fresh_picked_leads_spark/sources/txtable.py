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
- **Log checkpointing (r11)**: manifest STORAGE is delegated to
  ``txlog`` — commits whose file-list change is small write
  delta-form manifests (add/remove vs the parent) with a full
  "checkpoint" manifest every ``txlog.CHECKPOINT_EVERY`` links, and
  an append-only commit index (``_txlog/_idx.jsonl``) serves
  txn-idempotency / ``history()`` / ``version_at`` lookups without
  opening every manifest.  Commit I/O is ∝ the change, not the
  table; txn scans are one cached sequential read, not O(versions)
  file opens — the public Delta checkpoint + per-appId txn-map
  design.  ``snapshot()`` always sees the self-contained view;
  pre-r11 logs (all full-form) read unchanged.

Local/HDFS-rename filesystems only (object stores without atomic
rename need a real log store — that is precisely Delta's LogStore
abstraction; use it there).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .. import txlog

_LOG_DIR = "_txlog"
_DATA_DIR = "data"
# deletion-vector sidecar schema: plain data-file path + row ordinal
# (parquet row_index) of each deleted row
_DV_SCHEMA = "file string, pos bigint"
_CLONES_DIR = "_clones"


class TxConflictError(RuntimeError):
    """Another writer committed the same version first (optimistic
    concurrency loss).  Re-read the snapshot and retry."""


class TxCloneFateError(RuntimeError):
    """A source vacuum would delete files a live shallow clone still
    references (silent data loss in Delta; loud here)."""


class TxGeneratedColumnViolation(RuntimeError):
    """A write provided a generated column whose values do not match
    the table's generation expression (Delta rejects these too)."""


class TxConstraintViolation(RuntimeError):
    """A write contained rows for which a table CHECK constraint
    evaluated to FALSE (Delta semantics: NULL passes).  Nothing was
    committed."""


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
    schema_json: str | None = None  # table schema; None on pre-schema logs
    stats: dict | None = None  # per-file {rows, min:{col}, max:{col}}
    txn: str | None = None  # idempotency tag of the commit, if any
    dropped: tuple[str, ...] = ()  # ever-dropped column names (history;
    # also the legacy re-add fence on manifests without a colmap)
    colmap: tuple | None = None  # column-mapping ids (r8): tuple of
    # {"id", "name", "phys"} — logical name -> physical parquet column.
    # None = identity mapping (phys == name), the state of every table
    # until its first rename_column / re-add-after-drop.
    retired: tuple[str, ...] = ()  # physical names of dropped columns —
    # never reassigned, so old files can't leak pre-drop values
    max_id: int | None = None  # highest field id ever assigned
    constraints: dict | None = None  # CHECK constraints {name: sql_expr}
    # enforced on every data write; None/{} = unconstrained
    stats_cols: tuple[str, ...] | None = None  # the table's committed
    # stats policy (late r8): rides every manifest; stats-less handles
    # adopt it, opt-out writers ([]) still carry it forward
    dvs: dict | None = None  # deletion vectors (r9, merge-on-read):
    # {data_file_path: [dv_parquet_paths]} — each DV parquet holds
    # (file, pos) pairs naming rows DELETED from otherwise-untouched
    # data files; every committed read anti-joins them out.  None/{} =
    # no deletes pending (the identity fast path: plans and manifests
    # stay bit-identical to the pre-DV era)
    cdf: tuple[str, ...] | None = None  # exact change-data sidecar
    # (r10): parquet paths holding THIS commit's exact row-level
    # changes (_change_type + logical columns at commit time).  Written
    # by copy-on-write mutations (merge/update/delete/upsert/
    # replace_where), whose file diffs otherwise over-approximate
    # (carried-along rows of rewritten files).  Per-commit artifact:
    # never rides to later commits.  None = read_changes falls back to
    # the file-diff (exact for appends, over-approximate for pre-r10
    # CoW commits and restore)
    generated: dict | None = None  # generated columns (r10, Delta
    # generation expressions): {col: sql_expr}, declared at CREATE.
    # A write that omits the column gets it computed; a write that
    # provides it is validated value == expr (mismatch raises, commits
    # nothing).  Rides every commit like constraints; restore adopts
    # the target's map with the state.
    ts: int | None = None  # commit timestamp, epoch MICROSECONDS (r10).
    # Monotonic per table: _commit stamps max(parent_ts + 1, now) — the
    # Delta clock-skew adjustment — so ts order == version order and
    # TIMESTAMP AS OF resolution is well-defined.  None on pre-r10
    # manifests (time travel falls back to the manifest file's mtime)
    chain: int = 0  # delta-manifest chain depth (r11): how many
    # delta-form links separate this version from its nearest full
    # (checkpoint) manifest.  0 = this manifest is self-contained on
    # disk.  Purely a storage detail — _commit uses it to decide when
    # the next commit must checkpoint
    identity: dict | None = None  # identity column (r12, Delta
    # GENERATED ALWAYS AS IDENTITY): {"col", "start", "step", "next"}.
    # Declared at CREATE; appends/overwrites auto-assign monotone
    # BIGINT values from the manifest high-watermark ("next") with
    # per-partition offsets — no global shuffle; explicit values are
    # refused (ALWAYS semantics).  "next" only advances (restore
    # inherits the HEAD's watermark, so restored ids are never
    # reused); clone carries the source's watermark.  merge/upsert/
    # replace_* refuse identity tables (the original Delta restriction)
    # — route inserts through append.
    partition_by: tuple[str, ...] | None = None  # partition spec
    # (r12, VERDICT r11 #3): logical column names declared at CREATE.
    # Partition columns stay IN the data files (reads are untouched —
    # no Delta-style value re-injection); the WRITER guarantees every
    # data file holds exactly ONE value tuple (file paths embed
    # __txp_<phys>=<value> directories) and the columns are forced
    # into stats_cols, so each file's min==max tags its partition and
    # the existing stats machinery (read_range, source pushFilters)
    # prunes partitions for free.  The spec is immutable, rides every
    # commit like constraints, and scopes compact()/vacuum()
    # maintenance to one partition.


def _manifest_name(version: int) -> str:
    return f"v{version:010d}.json"


class TxTable:
    # full (checkpoint) manifest cadence — class attribute so tests
    # can shrink it; see txlog.CHECKPOINT_EVERY
    CHECKPOINT_EVERY = txlog.CHECKPOINT_EVERY

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        stats_cols: list[str] | None = None,
    ):
        """``stats_cols``: columns to record per-file min/max for in
        every manifest (numeric/string/date/timestamp; date-family
        stats serialize as ISO strings and ``files_in_range``
        normalizes bounds to match).  Costs one aggregate scan of
        each commit's NEW files (∝ commit, not table) and buys
        manifest-level file skipping via ``read_range`` — the
        Delta/Iceberg data-skipping idea, and the difference between
        'open 10M footers' and 'read one manifest' on a key-range
        query at 100 TB.

        ``stats_cols`` is a TABLE property, not a handle property:
        every commit records it in the manifest, and a handle built
        WITHOUT it (a foreachBatch sink, a maintenance job) adopts the
        committed value on first snapshot read — otherwise each fresh
        writer would silently stop recording stats and erode the
        pruning the table was created for (r8 review)."""
        self.spark = spark
        self.root = os.path.abspath(root)
        self.log_dir = os.path.join(self.root, _LOG_DIR)
        self.data_dir = os.path.join(self.root, _DATA_DIR)
        self.stats_cols = stats_cols

    # ---------------------------------------------------------- state

    @staticmethod
    def is_table(root: str) -> bool:
        return os.path.isdir(os.path.join(root, _LOG_DIR))

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        df: DataFrame,
        stats_cols: list[str] | None = None,
        generated: dict[str, str] | None = None,
        partition_by: list[str] | None = None,
        identity: "str | dict | None" = None,
    ) -> "TxTable":
        """``generated`` (r10): {col: sql_expr} generation
        expressions, declared at CREATE like Delta's — every later
        write computes omitted generated columns and validates
        provided ones.

        ``partition_by`` (r12): low-cardinality column(s) every data
        file must be single-valued on (see TxSnapshot.partition_by).
        Declared at CREATE only, immutable, and automatically added
        to ``stats_cols`` so each file's min==max stats tag its
        partition — partition pruning IS stats pruning.

        ``identity`` (r12): a surrogate-key BIGINT column the engine
        assigns (Delta ``GENERATED ALWAYS AS IDENTITY``) — a name, or
        ``{"col": name, "start": 1, "step": 1}``.  The create frame
        (and every later write) must NOT provide it."""
        if identity is not None:
            if isinstance(identity, str):
                identity = {"col": identity}
            idn = {
                "col": identity["col"],
                "start": int(identity.get("start", 1)),
                "step": int(identity.get("step", 1)),
            }
            if idn["step"] == 0:
                raise ValueError("identity step must be non-zero")
            if idn["col"] in df.columns:
                raise ValueError(
                    f"identity column {idn['col']!r} is GENERATED ALWAYS"
                    " — the create frame must not provide it"
                )
            if idn["col"] in (generated or {}):
                raise ValueError(
                    "a column cannot be both generated and identity"
                )
            if idn["col"] in (partition_by or []):
                raise ValueError(
                    "an identity column cannot be a partition column"
                )
            idn["next"] = idn["start"]
        if partition_by:
            missing = [c for c in partition_by if c not in df.columns]
            if missing:
                raise ValueError(
                    f"partition_by column(s) {missing} absent from the "
                    "create frame"
                )
            if set(partition_by) & set(generated or {}):
                raise ValueError(
                    "generated columns cannot be partition columns"
                )
            stats_cols = list(
                dict.fromkeys((stats_cols or []) + list(partition_by))
            )
        t = cls(spark, root, stats_cols=stats_cols)
        t._create_generated = dict(generated) if generated else None
        t._create_partition_by = (
            list(partition_by) if partition_by else None
        )
        t._create_identity = idn if identity is not None else None
        t.overwrite(df)
        return t

    def _versions(self) -> list[int]:
        return txlog.versions(self.log_dir)

    def snapshot(self, version: int | None = None) -> TxSnapshot | None:
        """Newest committed snapshot (None for a not-yet-created
        table), or — with ``version`` — that exact committed version
        for time travel.  The newest manifest IS the table state —
        there is no separate pointer to get out of sync."""
        if version is None:
            # head open: index-hint + forward probe — O(1)-ish in
            # retained version count (VERDICT r11 #4), no listdir
            head, m = txlog.head_version_and_manifest(self.log_dir)
            if m is None:
                return None
        else:
            versions = self._versions()
            if not versions:
                return None
            if version not in versions:
                raise FileNotFoundError(
                    f"version {version} of {self.root} does not exist "
                    f"(live: {versions[0]}..{versions[-1]}; older versions "
                    "may have been vacuumed)"
                )
            # materialized view — delta-form manifests reconstruct here
            m = txlog.load_manifest(self.log_dir, version)
        if self.stats_cols is None and m.get("stats_cols"):
            # adopt the table's committed stats policy (see __init__)
            self.stats_cols = list(m["stats_cols"])
        return TxSnapshot(
            m["version"],
            m["op"],
            tuple(m["files"]),
            m.get("schema"),
            m.get("stats"),
            m.get("txn"),
            tuple(m.get("dropped") or ()),
            tuple(m["colmap"]) if m.get("colmap") is not None else None,
            tuple(m.get("retired_phys") or ()),
            m.get("max_id"),
            m.get("constraints"),
            tuple(m["stats_cols"]) if m.get("stats_cols") else None,
            m.get("dvs"),
            cdf=tuple(m["cdf"]) if m.get("cdf") else None,
            generated=m.get("generated"),
            ts=m.get("ts"),
            chain=m.get("chain", 0),
            partition_by=(
                tuple(m["partition_by"]) if m.get("partition_by") else None
            ),
            identity=m.get("identity"),
        )

    def read(
        self, version: int | None = None, timestamp=None
    ) -> DataFrame:
        """Snapshot scan under the MANIFEST's schema, not the files'
        (``version`` time-travels to an older un-vacuumed commit —
        immutable data files make old snapshots readable for free).
        ``timestamp`` is TIMESTAMP AS OF (r10): the newest commit at or
        before the bound — datetime / ISO string / epoch seconds; see
        ``version_at``.  Parquet NULL-fills columns a file lacks when
        the read schema is supplied, which is what makes ``add_column``
        a metadata operation: old files are never rewritten, they just
        read as NULL in the new column (the same mechanism
        Delta/Iceberg schema evolution rides on)."""
        if timestamp is not None:
            if version is not None:
                raise ValueError(
                    "read: pass version OR timestamp, not both"
                )
            version = self.version_at(timestamp)
        snap = self.snapshot(version)
        if snap is None:
            raise FileNotFoundError(f"no committed version under {self.root}")
        return self._read_files(
            list(snap.files),
            snap.schema_json,
            self._colmap_or_none(snap),
            dvs=dict(snap.dvs) if snap.dvs else None,
        )

    # ------------------------------------------------- column mapping

    @staticmethod
    def _colmap_or_none(snap: "TxSnapshot | None") -> list[dict] | None:
        """The snapshot's column mapping, or None for the identity
        mapping (phys == logical) every table has until its first
        rename/re-add — the None fast path keeps legacy manifests,
        plans and write layouts bit-identical to the pre-colmap era."""
        if snap is None or snap.colmap is None:
            return None
        return [dict(c) for c in snap.colmap]

    @staticmethod
    def _is_identity(colmap: list[dict] | None) -> bool:
        return colmap is None or all(c["name"] == c["phys"] for c in colmap)

    def _materialized_colmap(
        self, base: "TxSnapshot"
    ) -> tuple[list[dict], list[str], int]:
        """(colmap, retired physical names, max assigned id), deriving
        the identity mapping for manifests that predate column
        mapping.  Legacy ``dropped`` names become retired physical
        names (their phys WAS the logical name), so re-add safety
        holds across the format upgrade."""
        cm = self._colmap_or_none(base)
        if cm is None:
            schema = self._current_schema(base)
            cm = [
                {"id": i + 1, "name": f.name, "phys": f.name}
                for i, f in enumerate(schema.fields)
            ]
            return cm, list(base.dropped), len(cm)
        max_id = (
            base.max_id
            if base.max_id is not None
            else max((c["id"] for c in cm), default=0)
        )
        return cm, list(base.retired), max_id

    @staticmethod
    def _safe_phys(
        name: str, colmap: list[dict], retired: list[str], new_id: int
    ) -> str:
        """Physical column name for a newly added field: the logical
        name itself when no live or retired physical column claims it,
        else a fresh id-suffixed name — old files then simply lack the
        physical column and read NULL (the Delta/Iceberg column-
        mapping re-add semantics)."""
        in_use = {c["phys"] for c in colmap} | set(retired)
        if name not in in_use:
            return name
        # a user schema may legitimately contain a column named like an
        # id-suffixed candidate (e.g. 'a__v3'): probe forward until free
        # rather than asserting (bounded: len(in_use)+1 candidates)
        suffix = new_id
        while f"{name}__v{suffix}" in in_use:
            suffix += 1
        return f"{name}__v{suffix}"

    def _read_files(
        self,
        files: list,
        schema_json: str | None,
        colmap: list[dict] | None = None,
        dvs: dict | None = None,
    ) -> DataFrame:
        """Every scan of committed files goes through here so the
        manifest schema governs even mixed-schema file sets (files
        predating an add_column would otherwise decide the schema by
        footer order — silently dropping the new column in a
        copy-on-write rewrite).  With a non-identity ``colmap`` the
        files are read under their PHYSICAL schema and projected back
        to logical names (renames never rewrite data).  With ``dvs``
        (the snapshot's deletion vectors) rows named by a DV sidecar
        are anti-joined out — the merge-on-read half of DELETE."""
        live = self._live_dvs(files, dvs)
        if live:
            scanned = self._scan_with_pos(files, schema_json, colmap)
            return self._anti_dv(scanned, live).drop("_fp", "_pos")
        reader = self.spark.read
        if schema_json is None:
            return reader.parquet(*files)
        from pyspark.sql.types import StructType

        logical = StructType.fromJson(json.loads(schema_json))
        if self._is_identity(colmap):
            return reader.schema(logical).parquet(*files)
        return self._phys_read(files, logical, colmap).select(
            *self._logical_select(logical, colmap)
        )

    # ------------------------------------------------ deletion vectors

    @staticmethod
    def _live_dvs(files: list, dvs: dict | None) -> dict | None:
        """The DV entries that apply to THIS file set, or None — the
        None fast path keeps every DV-less read's plan (and every
        pre-DV table's behavior) bit-identical."""
        if not dvs:
            return None
        return {f: dvs[f] for f in files if f in dvs} or None

    @staticmethod
    def _dvs_of(snap: "TxSnapshot | None") -> dict | None:
        return dict(snap.dvs) if snap is not None and snap.dvs else None

    # ------------------------------------------------ commit timestamps

    def _ts_of(self, snap: "TxSnapshot") -> int | None:
        """Commit timestamp (epoch µs) of a snapshot; pre-r10 manifests
        carry none, so fall back to the manifest FILE's mtime — the
        same legacy source Delta uses for versions without
        commitInfo.timestamp.  mtimes are not guaranteed monotone
        across versions; the first post-upgrade commit re-anchors
        monotonicity via max(parent + 1, now)."""
        if snap.ts is not None:
            return snap.ts
        path = os.path.join(self.log_dir, _manifest_name(snap.version))
        try:
            return int(os.path.getmtime(path) * 1_000_000)
        except OSError:
            return None

    @staticmethod
    def _to_epoch_us(timestamp) -> int:
        """Normalize a user TIMESTAMP AS OF bound to epoch µs.
        Accepts datetime (naive = UTC, the engine's session timezone),
        ISO-8601 string, or epoch seconds (int/float)."""
        import datetime as _dt

        if isinstance(timestamp, str):
            timestamp = _dt.datetime.fromisoformat(timestamp)
        if isinstance(timestamp, _dt.datetime):
            if timestamp.tzinfo is None:
                timestamp = timestamp.replace(tzinfo=_dt.timezone.utc)
            return int(timestamp.timestamp() * 1_000_000)
        if isinstance(timestamp, (int, float)):
            return int(timestamp * 1_000_000)
        raise TypeError(
            "timestamp must be a datetime, ISO-8601 string, or epoch "
            f"seconds; got {type(timestamp).__name__}"
        )

    def version_at(self, timestamp) -> int:
        """TIMESTAMP AS OF resolution: the newest retained version
        whose commit timestamp is <= ``timestamp``.  Raises when the
        bound predates the earliest retained commit (reading an
        unknown older state would be silently wrong) — the Delta
        contract."""
        bound = self._to_epoch_us(timestamp)
        versions = self._versions()
        if not versions:
            raise FileNotFoundError(f"no committed version under {self.root}")
        idx = txlog.read_index(self.log_dir, versions)
        chosen = None
        for v in versions:  # ts monotone over versions: last match wins
            ts = idx.get(v, {}).get("ts")  # index heals mtime fallback
            if ts is not None and ts <= bound:
                chosen = v
        if chosen is None:
            raise FileNotFoundError(
                f"timestamp {timestamp!r} predates the earliest retained "
                f"commit of {self.root} (earliest version {versions[0]}); "
                "older history may have been vacuumed"
            )
        return chosen

    @staticmethod
    def _norm_fp() -> Column:
        """``_metadata.file_path`` is a URI (``file:/x`` or
        ``file:///x``); manifests and DV sidecars store plain paths."""
        return F.regexp_replace(F.col("_fp"), "^file:(//)?", "")

    def _scan_with_pos(
        self,
        files: list,
        schema_json: str | None,
        colmap: list[dict] | None = None,
    ) -> DataFrame:
        """Snapshot scan carrying ``_fp`` (source file URI) and
        ``_pos`` (``_metadata.row_index`` — the row's ordinal within
        its immutable parquet file, the stable row identity DVs key
        on).  Like ``_scan_with_fp``, metadata columns must be
        projected before any join/filter and, under a colmap, before
        the physical->logical projection.

        ``_fp``/``_pos`` are reserved on every DV code path, not just
        merge(mode='dv') (ADVICE r9): a table column with either name
        would be silently overwritten here and then dropped by
        ``_read_files``/``_anti_dv``, changing the read schema."""
        if schema_json is not None:
            fields = {
                f["name"] for f in json.loads(schema_json)["fields"]
            }
            if {"_fp", "_pos"} & fields:
                raise ValueError(
                    "deletion-vector operations reserve the _fp/_pos "
                    "column names; rename the table column first"
                )
        if schema_json is None or self._is_identity(colmap):
            return (
                self._read_files(files, schema_json)
                .withColumn("_fp", F.col("_metadata.file_path"))
                .withColumn("_pos", F.col("_metadata.row_index"))
            )
        from pyspark.sql.types import StructType

        logical = StructType.fromJson(json.loads(schema_json))
        raw = (
            self._phys_read(files, logical, colmap)
            .withColumn("_fp", F.col("_metadata.file_path"))
            .withColumn("_pos", F.col("_metadata.row_index"))
        )
        return raw.select(
            *self._logical_select(logical, colmap),
            F.col("_fp"),
            F.col("_pos"),
        )

    def _anti_dv(self, scanned: DataFrame, live: dict) -> DataFrame:
        """Subtract DV-named rows from a ``_scan_with_pos`` frame: one
        equi anti-join on (file, position).  The DV side is deleted
        rows only — AQE broadcasts it when small (the scattered-
        mutation common case); a huge accumulated DV set shuffles,
        which is the signal to ``compact()`` and re-materialize."""
        paths = sorted({p for v in live.values() for p in v})
        dv = self.spark.read.schema(_DV_SCHEMA).parquet(*paths)
        d = scanned.withColumn("_fpn", self._norm_fp()).alias("d")
        out = d.join(
            dv.alias("v"),
            (F.col("d._fpn") == F.col("v.file"))
            & (F.col("d._pos") == F.col("v.pos")),
            "left_anti",
        )
        return out.drop("_fpn")

    def _phys_read(self, files, logical, colmap) -> DataFrame:
        from pyspark.sql.types import StructField, StructType

        phys = {c["name"]: c["phys"] for c in colmap}
        phys_schema = StructType(
            [
                StructField(phys.get(f.name, f.name), f.dataType, f.nullable)
                for f in logical.fields
            ]
        )
        return self.spark.read.schema(phys_schema).parquet(*files)

    @staticmethod
    def _logical_select(logical, colmap) -> list[Column]:
        phys = {c["name"]: c["phys"] for c in colmap}
        return [
            F.col(phys.get(f.name, f.name)).alias(f.name)
            for f in logical.fields
        ]

    # -------------------------------------------------------- commits

    def _partition_spec(
        self, base: "TxSnapshot | None" = None
    ) -> list[str] | None:
        """The table's immutable partition spec (logical names), from
        the given/current snapshot or — during CREATE, before any
        manifest exists — the staged create-time spec.  Cached on the
        handle once resolved from a committed manifest (the spec can
        never change after CREATE), so per-write resolution costs no
        extra head-manifest parse on unpartitioned tables."""
        if base is not None:
            return (
                list(base.partition_by) if base.partition_by else None
            )
        cached = getattr(self, "_pby_cache", ())
        if cached != ():
            return list(cached) if cached else None
        snap = self.snapshot()
        if snap is None:
            return getattr(self, "_create_partition_by", None)
        spec = list(snap.partition_by) if snap.partition_by else None
        self._pby_cache = spec
        return spec

    # ------------------------------------------------ identity columns

    def _identity_of(self, base: "TxSnapshot | None") -> "dict | None":
        if base is not None and base.identity:
            return dict(base.identity)
        staged = getattr(self, "_create_identity", None)
        return dict(staged) if staged else None

    @staticmethod
    def _refuse_identity_col(
        df: DataFrame, idn: "dict | None", op: str
    ) -> None:
        """ALWAYS semantics: a write providing the identity column is
        refused (its values are the watermark's business)."""
        if idn and idn["col"] in df.columns:
            raise ValueError(
                f"{op} cannot provide identity column {idn['col']!r} "
                "(GENERATED ALWAYS AS IDENTITY); drop it from the frame"
            )

    def _refuse_identity_set(
        self, set_map: dict, op: str, base: "TxSnapshot | None"
    ) -> None:
        """ALWAYS semantics for mutations: SET on the identity column
        would rewrite generated values in place — refused on every
        update spelling (update / update_range / update_dv)."""
        idn = self._identity_of(base)
        if idn and idn["col"] in set_map:
            raise ValueError(
                f"{op} cannot set identity column {idn['col']!r} "
                "(GENERATED ALWAYS AS IDENTITY)"
            )

    def _refuse_identity_op(
        self, base: "TxSnapshot | None", op: str
    ) -> None:
        """merge/upsert/replace_* would need to assign ids to their
        insert slices mid-plan — refused for now, the restriction the
        original Delta identity release shipped with.  Route inserts
        through append()."""
        if base is not None and base.identity:
            raise ValueError(
                f"{op} is not supported on a table with identity "
                f"column {base.identity['col']!r}; use append/"
                "overwrite/update/delete"
            )

    def _assign_identity(
        self, df: DataFrame, idn: dict
    ) -> "tuple[DataFrame, int, DataFrame]":
        """Assign ``next + step*i`` to every incoming row WITHOUT a
        global shuffle (the Delta high-watermark design): pin the
        frame, collect per-Spark-partition row counts (dimension-
        sized), turn them into cumulative offsets, and let an
        Arrow-batched mapInPandas stamp each partition's contiguous id
        block in place.  Returns (frame-with-ids, new watermark,
        the pin to release after the files are written) — the pin is
        what keeps the partitioning (and so the pid->offset map)
        stable between the count job and the write job."""
        col, step, nxt = idn["col"], idn["step"], idn["next"]
        src = df.persist()
        counts = (
            src.groupBy(F.spark_partition_id().alias("_pid"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        offs, run = {}, 0
        for r in sorted(counts, key=lambda r: r["_pid"]):
            offs[r["_pid"]] = run
            run += r["n"]
        from pyspark.sql.types import LongType, StructField, StructType

        out_schema = StructType(
            [StructField(col, LongType(), False)] + list(src.schema.fields)
        )

        def assign(it):
            import numpy as np
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            seen = 0
            for pdf in it:
                ids = nxt + step * (
                    offs.get(pid, 0) + seen + np.arange(len(pdf))
                )
                seen += len(pdf)
                pdf.insert(0, col, ids.astype("int64"))
                yield pdf

        return src.mapInPandas(assign, out_schema), nxt + step * run, src

    def _write_data(
        self,
        df: DataFrame,
        colmap: list[dict] | None = None,
        arrange: bool = True,
    ) -> list[str]:
        """Materialize ``df`` (LOGICAL column names) as a fresh
        immutable commit directory; returns the part-file paths
        (never mutated afterwards).  A non-identity ``colmap`` renames
        to physical columns first so every data file of the table
        speaks physical names.

        On a PARTITIONED table every write path lands here, so the
        file-per-partition-value invariant is enforced in one place:
        the partition columns are duplicated under reserved
        ``__txp_<phys>`` names and the write partitionBys the COPIES —
        Spark splits files by value (and embeds
        ``__txp_<phys>=<value>`` path segments the maintenance ops
        scope by) while the real columns stay in the row data, keeping
        every read path (colmap, DVs, CDF, the pyarrow source)
        byte-identical to the unpartitioned case.  With ``arrange``
        (the default) rows are hash-repartitioned on the partition
        columns first — write parallelism without breaking
        single-valuedness (a task holding two values still writes them
        to separate files); compact passes arrange=False because it
        already shaped the frame (cluster order, output sizing) and
        the partitionBy alone enforces the invariant."""
        if not self._is_identity(colmap):
            phys = {c["name"]: c["phys"] for c in colmap}
            df = df.select(
                *[F.col(c).alias(phys.get(c, c)) for c in df.columns]
            )
        out = os.path.join(self.data_dir, uuid.uuid4().hex)
        pby = self._partition_spec()
        if pby:
            pmap = (
                {c["name"]: c["phys"] for c in colmap}
                if not self._is_identity(colmap)
                else {}
            )
            pphys = [pmap.get(c, c) for c in pby]
            tmp = [f"__txp_{c}" for c in pphys]
            clash = set(tmp) & set(df.columns)
            if clash:
                raise ValueError(
                    f"column name(s) {sorted(clash)} collide with the "
                    "reserved __txp_ partition-path prefix"
                )
            split = df.select(
                "*", *[F.col(c).alias(t) for c, t in zip(pphys, tmp)]
            )
            if arrange:
                split = split.repartition(
                    self.spark.sparkContext.defaultParallelism,
                    *[F.col(c) for c in pphys],
                )
            split.write.mode("error").partitionBy(*tmp).parquet(out)
            return sorted(
                os.path.join(dp, n)
                for dp, _dirs, names in os.walk(out)
                for n in names
                if n.endswith(".parquet")
            )
        df.write.mode("error").parquet(out)
        return sorted(
            os.path.join(out, n)
            for n in os.listdir(out)
            if n.endswith(".parquet")
        )

    def _committed_txns(self) -> set[str]:
        """Transaction tags of every live manifest (idempotent-write
        bookkeeping, the public Delta ``txnAppId``/``txnVersion``
        pattern: a replayed writer skips a txn it already landed).

        Served from the commit index (r11): one cached sequential
        read + incremental suffix parses, not O(versions) manifest
        opens per commit — the Delta per-appId-txn-map idea.  Index
        holes (pre-r11 logs, crash between link and index append)
        heal by materializing that one manifest."""
        # heal=True: this scan runs with write intent (pre-commit
        # idempotency), the sanctioned place to persist healed lines
        idx = txlog.read_index(self.log_dir, self._versions(), heal=True)
        return {e["txn"] for e in idx.values() if e.get("txn")}

    def has_txn(self, txn: str) -> bool:
        """True if ``txn`` is already committed — for writers that must
        decide idempotency BEFORE doing pre-write validation that could
        reject a replayed batch (e.g. SCD2's order guard, which would
        otherwise raise on a checkpoint-loss replay whose effective
        dates are already in applied history)."""
        return txn in self._committed_txns()

    def committed_txns(self) -> set[str]:
        """All committed transaction tags — for writers whose
        idempotency unit is FINER than a whole commit (the SCD2 sink
        encodes per-effective-date slice fingerprints into its tags
        and skips already-committed slices on replay)."""
        return self._committed_txns()

    @staticmethod
    def _schema_of(df: DataFrame) -> str:
        return json.dumps(df.schema.jsonValue())

    @staticmethod
    def _check_columns(df: DataFrame, base: "TxSnapshot | None", op: str) -> None:
        """Reject writes whose column NAMES don't match the table's
        manifest schema (Delta rejects these too): ``_read_files``
        imposes the manifest schema by name, so a misnamed/missing
        column would silently read back NULL-filled and an extra
        column would be silently dropped.  ``add_column`` is the
        sanctioned way to widen the schema first."""
        if base is None or base.schema_json is None:
            return
        have = set(df.columns)
        want = {f["name"] for f in json.loads(base.schema_json)["fields"]}
        if have != want:
            missing, extra = sorted(want - have), sorted(have - want)
            raise ValueError(
                f"{op} schema mismatch for {_LOG_DIR} table: "
                f"missing columns {missing}, unexpected columns {extra}; "
                "use add_column() to evolve the table schema first"
            )

    @staticmethod
    def _validate_constraints(
        df: DataFrame, base: "TxSnapshot | None", op: str
    ) -> None:
        """Enforce the table's CHECK constraints on a write's LOGICAL
        frame (Delta semantics: a row violates iff the expression
        evaluates to FALSE; NULL passes).  One aggregate pass over the
        incoming/rewritten data — cost ∝ the commit, never the table —
        counting every constraint in the same scan.  Raises
        TxConstraintViolation (committing nothing) with per-constraint
        violation counts."""
        cons = base.constraints if base is not None else None
        if not cons:
            return
        try:
            agg = df.agg(
                *[
                    F.count(
                        F.when(F.expr(e).eqNullSafe(F.lit(False)), F.lit(1))
                    ).alias(name)
                    for name, e in cons.items()
                ]
            )
        except Exception as exc:  # analysis error: constraint column
            # absent from this write's schema (e.g. an overwrite that
            # narrows the schema) — actionable error, not a stack trace
            raise ValueError(
                f"{op} schema cannot resolve CHECK constraint(s) "
                f"{sorted(cons)}: {exc.__class__.__name__}; drop the "
                "constraint first"
            ) from None
        counts = agg.first()
        bad = {name: counts[name] for name in cons if counts[name]}
        if bad:
            raise TxConstraintViolation(
                f"{op} violates CHECK constraint(s) "
                + ", ".join(
                    f"{n!r} ({cons[n]}): {c} row(s)" for n, c in bad.items()
                )
            )

    def _refuse_generated_targets(
        self, set_map: dict, op: str, base: "TxSnapshot | None" = None
    ) -> None:
        """UPDATE may not SET a generated column directly (Delta
        refuses too — its value is the expression's business); updates
        of the expression's INPUTS are validated post-rewrite."""
        if base is None:
            base = self.snapshot()
        hit = sorted(set(set_map) & set((base.generated or {}) if base else {}))
        if hit:
            raise ValueError(
                f"{op} cannot set generated column(s) {hit}; their "
                "values are derived from the generation expression"
            )

    def _guard_generated_schema(self, fields, gen, op: str) -> None:
        """Block a schema change that would leave a generation
        expression unresolvable — probe-analyze each expr against the
        POST-change schema (the constraint-guard pattern)."""
        if not gen:
            return
        from pyspark.sql.types import StructType

        probe = self.spark.createDataFrame([], StructType(list(fields)))
        for name, e in gen.items():
            try:
                probe.select(F.expr(e)).schema
            except Exception:
                raise ValueError(
                    f"{op} would break generated column {name!r} "
                    f"({e}); drop the generated column first"
                ) from None

    @staticmethod
    def _gen_of(base: "TxSnapshot | None") -> dict | None:
        return dict(base.generated) if base and base.generated else None

    def _apply_generated(self, df: DataFrame, gen: dict | None, op: str):
        """Generated-column write contract (r10, Delta generation
        expressions): compute each generated column the write OMITTED,
        then validate every one it PROVIDED — value must equal the
        expression row-for-row (NULL-safe), else the write raises and
        commits nothing.  One added projection + one aggregate pass,
        cost ∝ the commit."""
        if not gen:
            return df
        try:
            for c, e in gen.items():
                if c not in df.columns:
                    df = df.withColumn(c, F.expr(e))
        except Exception as exc:
            raise ValueError(
                f"{op} schema cannot compute generated column(s) "
                f"{sorted(gen)}: {exc.__class__.__name__}"
            ) from None
        self._validate_generated(df, gen, op)
        return df

    @staticmethod
    def _validate_generated(df: DataFrame, gen: dict | None, op: str):
        gen = {c: e for c, e in (gen or {}).items() if c in df.columns}
        if not gen:
            return
        try:
            counts = df.agg(
                *[
                    F.count(
                        F.when(
                            ~F.col(c).eqNullSafe(F.expr(e)), F.lit(1)
                        )
                    ).alias(c)
                    for c, e in gen.items()
                ]
            ).first()
        except Exception as exc:
            raise ValueError(
                f"{op} schema cannot resolve generated column "
                f"expression(s) {sorted(gen)}: {exc.__class__.__name__}"
            ) from None
        bad = {c: counts[c] for c in gen if counts[c]}
        if bad:
            raise TxGeneratedColumnViolation(
                f"{op} provides generated column(s) whose values "
                "disagree with their generation expression: "
                + ", ".join(
                    f"{c!r} ({gen[c]}): {n} row(s)"
                    for c, n in bad.items()
                )
            )

    def _guard_constraint_schema(self, fields, cons, op: str) -> None:
        """Block a schema change that would leave a live CHECK
        constraint unresolvable (Delta refuses rename/drop of
        constrained columns for the same reason): probe-analyze every
        expression against the POST-change schema; failure means the
        caller must ``drop_constraint`` first.  Analysis-only — no
        data is read."""
        if not cons:
            return
        from pyspark.sql.types import StructType

        probe = self.spark.createDataFrame([], StructType(list(fields)))
        for name, e in cons.items():
            try:
                probe.select(F.expr(e))
            except Exception as exc:
                raise ValueError(
                    f"{op} would break CHECK constraint {name!r} "
                    f"({e}): {exc.__class__.__name__}; drop the "
                    "constraint first"
                ) from None

    def add_constraint(self, name: str, expr: str) -> int:
        """``ALTER TABLE ADD CONSTRAINT name CHECK (expr)`` — a
        metadata commit, but only after one validation scan proves the
        EXISTING data satisfies the expression (Delta does the same:
        a constraint can never be born already-violated).  From this
        version on, every append/overwrite/update/upsert validates its
        logical frame against the expression before writing;
        ``restore`` re-validates nothing because it also RESTORES the
        target version's constraint set (metadata restores with the
        state, like the schema) — the table never advertises a rule
        its data predates.  The
        expression is ANSI SQL over LOGICAL column names, so it
        survives rename_column-free schema evolution; constraints ride
        every manifest like the dropped-name history."""
        base = self._head()
        cons = dict(base.constraints or {})
        if name in cons:
            raise ValueError(
                f"constraint {name!r} already exists: {cons[name]}"
            )
        probe = TxSnapshot(  # validate existing data under the new rule
            base.version,
            base.op,
            base.files,
            base.schema_json,
            constraints={name: expr},
        )
        self._validate_constraints(self.read(), probe, "add_constraint")
        cons[name] = expr
        return self._commit(
            list(base.files),
            "add_constraint",
            base,
            schema_json=base.schema_json,
            stats=base.stats,
            constraints=cons,
        )

    def drop_constraint(self, name: str) -> int:
        """``ALTER TABLE DROP CONSTRAINT`` — metadata-only commit."""
        base = self._head()
        cons = dict(base.constraints or {})
        if name not in cons:
            raise ValueError(f"constraint {name!r} does not exist")
        del cons[name]
        return self._commit(
            list(base.files),
            "drop_constraint",
            base,
            schema_json=base.schema_json,
            stats=base.stats,
            constraints=cons,
        )

    @staticmethod
    def _footer_bound_ok(v) -> bool:
        """Is ``v`` (a parquet-footer min/max) a value the footer fast
        path can trust to EQUAL the Spark-aggregate form?  ints, bools
        and strings are exact (Python str comparison is code-point
        order == Spark's UTF8-binary collation; parquet-mr drops
        over-long binary stats rather than truncating, so a present
        string bound is the exact value); floats are exact unless NaN
        (parquet NaN statistics are unreliable by spec) or ±0.0
        (measured on this Spark: a file holding both -0.0 and 0.0
        footers as min=-0.0/max=0.0 while the aggregate returns the
        first-encountered sign for both — row-order-dependent, so any
        zero bound falls back to the scan); dates render
        to the identical ISO string the manifests store.  datetimes are
        REJECTED: Spark's default parquet timestamp encoding (INT96)
        carries no stats anyway, and a micros-encoded file's footer
        datetime may differ in tz-awareness from the collected form —
        the scan path stays authoritative for those."""
        import datetime
        import math

        if isinstance(v, (bool, int, str)):
            return True
        if isinstance(v, float):
            return not math.isnan(v) and v != 0.0
        return isinstance(v, datetime.date) and not isinstance(
            v, datetime.datetime
        )

    def _stats_from_footers(
        self, files: list[str], phys: dict
    ) -> dict | None:
        """Per-file stats from the parquet FOOTERS — metadata-only, no
        Spark job (r15, guide §1/§6: the per-commit stats pass was a
        second full scan of every freshly written file).  Returns None
        whenever any needed bound is missing or of a type the fast
        path can't prove equal to the Spark-aggregate form
        (``_footer_bound_ok``) — the caller then falls back to the
        original aggregate scan, so this path can change COST only,
        never stats values.  Driver cost is one footer read per file
        (threaded); commit sizes are file-count-bounded, never
        row-count-bounded."""
        import pyarrow.parquet as _pq

        need = {phys.get(c, c): c for c in (self.stats_cols or [])}

        def one(f: str):
            md = _pq.ParquetFile(f).metadata
            if md.num_rows == 0:
                # parity: the aggregate scan emits no group for an
                # empty file, so it never gets a stats entry
                return f, None
            per: dict[str, list] = {}
            seen: set[str] = set()
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                for i in range(rg.num_columns):
                    cc = rg.column(i)
                    p = cc.path_in_schema
                    if p not in need:
                        continue
                    seen.add(p)
                    st = cc.statistics
                    if st is None:
                        raise ValueError("no statistics")
                    if st.has_null_count and st.null_count == cc.num_values:
                        continue  # all-NULL chunk: contributes no bound
                    if not st.has_min_max:
                        raise ValueError("no min/max")
                    mn, mx = st.min, st.max
                    if not (
                        self._footer_bound_ok(mn)
                        and self._footer_bound_ok(mx)
                    ):
                        raise ValueError("untrusted bound type")
                    cur = per.get(p)
                    if cur is None:
                        per[p] = [mn, mx]
                    else:
                        cur[0] = min(cur[0], mn)
                        cur[1] = max(cur[1], mx)
            if seen != set(need):
                # a stats column absent from this file's schema: the
                # scan path resolves presence against the UNION schema
                # — ambiguous here, let it decide
                raise ValueError("stats column missing from file")
            entry = {
                "rows": md.num_rows,
                "min": {
                    lc: (per[pc][0] if pc in per else None)
                    for pc, lc in need.items()
                },
                "max": {
                    lc: (per[pc][1] if pc in per else None)
                    for pc, lc in need.items()
                },
            }
            return f, entry

        try:
            if len(files) > 4:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(
                    max_workers=min(16, len(files))
                ) as pool:
                    results = list(pool.map(one, files))
            else:
                results = [one(f) for f in files]
        except Exception:
            return None  # any surprise → the scan path is authoritative
        return {f: e for f, e in results if e is not None}

    def _stats_for(
        self, files: list[str], colmap: list[dict] | None = None
    ) -> dict:
        """Per-file row count + min/max of ``stats_cols`` for freshly
        written files: parquet-footer metadata when every bound is
        footer-exact (``_stats_from_footers`` — no Spark job), else
        one aggregate scan grouped by source file.  Stats are keyed by
        LOGICAL name; the aggregation reads the physical columns when
        a colmap is in force."""
        from urllib.parse import unquote, urlparse

        if not files:
            return {}
        phys = {c["name"]: c["phys"] for c in (colmap or [])}
        footer = self._stats_from_footers(files, phys)
        if footer is not None:
            return footer
        df = self.spark.read.parquet(*files).withColumn(
            "_fp", F.col("_metadata.file_path")
        )
        # A stats column no longer present in the data (dropped via
        # drop_column by another writer instance) must not crash the
        # write — collect bounds for the columns that exist.
        cols = [c for c in self.stats_cols if phys.get(c, c) in df.columns]
        aggs = [F.count(F.lit(1)).alias("_rows")]
        for c in cols:
            pc = F.col(phys.get(c, c))
            aggs += [F.min(pc).alias(f"_min_{c}"), F.max(pc).alias(f"_max_{c}")]
        out = {}
        for r in df.groupBy("_fp").agg(*aggs).collect():
            # _metadata.file_path is URI-encoded: a partition dir with
            # an escapable char (__txp_c=north region -> north%20region)
            # must decode back to the OS path the manifest lists, or
            # the file's stats land under a key no read ever matches
            out[unquote(urlparse(r._fp).path)] = {
                "rows": r._rows,
                "min": {c: r[f"_min_{c}"] for c in cols},
                "max": {c: r[f"_max_{c}"] for c in cols},
            }
        return out

    def _merged_stats(
        self,
        base: TxSnapshot | None,
        carried: list[str],
        new_files: list[str],
        colmap: list[dict] | None = None,
    ) -> dict | None:
        if not self.stats_cols:
            # keep whatever stats the carried files already have (a
            # stats-less writer must not blind a stats-ful table)
            if base and base.stats:
                return {f: base.stats[f] for f in carried if f in base.stats}
            return None
        prev = base.stats if base and base.stats else {}
        merged = {f: prev[f] for f in carried if f in prev}
        if colmap is None:
            colmap = self._colmap_or_none(base)
        merged.update(self._stats_for(new_files, colmap))
        return merged

    def _commit(
        self,
        files: list[str],
        op: str,
        base: TxSnapshot | None,
        txn: str | None = None,
        schema_json: str | None = None,
        stats: dict | None = None,
        dropped: list[str] | None = None,
        colmap: list[dict] | None = None,
        retired: list[str] | None = None,
        max_id: int | None = None,
        constraints: dict | None = None,
        dvs: dict | None = None,
        cdf: list[str] | None = None,
        generated: dict | None = None,
        identity: dict | None = None,
    ) -> int:
        version = (base.version if base else 0) + 1
        if dropped is None:  # dropped-name history rides every commit
            dropped = list(base.dropped) if base else []
        if dvs is None and base is not None:
            dvs = dict(base.dvs) if base.dvs else None
        if dvs:
            # DV entries are keyed by live data file: a rewrite that
            # drops a file from the list physically materialized (or
            # replaced) its deletes, so its vector entry retires with
            # it — and vacuum then GCs the unreferenced DV parquet.
            live = set(files)
            dvs = {f: v for f, v in dvs.items() if f in live} or None
        if constraints is None and base is not None:
            constraints = base.constraints  # constraints ride every commit
        if generated is None and base is not None:
            generated = base.generated  # generation exprs ride every commit
        # partition spec: immutable, declared at CREATE, rides every
        # commit (the create commit picks it off _create_partition_by)
        partition_by = (
            list(base.partition_by)
            if base is not None and base.partition_by
            else getattr(self, "_create_partition_by", None)
        )
        if identity is None:
            # identity watermark rides every commit; assigning writes
            # pass the bumped dict explicitly
            identity = self._identity_of(base)
        if colmap is None and base is not None:
            # column-mapping state rides every commit once materialized
            colmap = self._colmap_or_none(base)
            if colmap is not None:
                retired = list(base.retired)
                max_id = base.max_id
        # commit timestamp (r10): epoch µs, monotone over versions —
        # max(parent + 1, wall clock) is the Delta-style clock-skew
        # adjustment that keeps ts order == version order even when a
        # replica's clock runs behind the previous committer's.
        parent_ts = self._ts_of(base) if base is not None else None
        now_us = int(time.time() * 1_000_000)
        ts = now_us if parent_ts is None else max(parent_ts + 1, now_us)
        manifest = {
            "version": version,
            "op": op,
            "files": files,
            "txn": txn,
            "schema": schema_json,
            "stats": stats,
            "dropped": dropped,
            "ts": ts,
        }
        prop = (
            list(self.stats_cols)
            if self.stats_cols
            else (list(base.stats_cols) if base and base.stats_cols else None)
        )
        if prop:
            # table property: rides every commit (an opt-out writer
            # records no stats for ITS files but must not erase the
            # policy); fresh handles adopt it on snapshot read
            manifest["stats_cols"] = prop
        if constraints is not None:
            manifest["constraints"] = constraints
        if generated is not None:
            manifest["generated"] = generated
        if partition_by:
            manifest["partition_by"] = partition_by
        if identity:
            manifest["identity"] = identity
        if dvs:
            manifest["dvs"] = dvs
        if cdf:
            # exact changeset of THIS commit — never inherited from base
            manifest["cdf"] = cdf
        if colmap is not None:
            manifest["colmap"] = colmap
            manifest["retired_phys"] = retired or []
            manifest["max_id"] = (
                max_id
                if max_id is not None
                else max((c["id"] for c in colmap), default=0)
            )
        try:
            # storage layer (r11): delta-encodes small changes against
            # the parent (I/O ∝ change, checkpoint every Nth link),
            # links atomic-exclusively, appends the commit-index line
            txlog.write_manifest(
                self.log_dir,
                manifest,
                parent_files=base.files if base else None,
                parent_stats=base.stats if base else None,
                parent_chain=base.chain if base else 0,
                checkpoint_every=self.CHECKPOINT_EVERY,
                parent_dvs=(base.dvs if base else None),
            )
        except FileExistsError:
            raise TxConflictError(
                f"version {version} of {self.root} was committed concurrently"
            ) from None
        return version

    def overwrite(
        self, df: DataFrame, txn: str | None = None, max_retries: int = 5
    ) -> int:
        """Replace the table; with ``txn`` the REPLACEMENT STATE and
        its idempotency tag commit in one atomic manifest — the
        primitive an exactly-once view refresher needs (state and
        watermark can never disagree, whatever crashes between).

        Like ``append``, a lost manifest race is resolved by
        re-reading the snapshot: if the txn tag (ours, replayed by a
        twin) is now committed the write no-ops, otherwise the SAME
        already-written files re-commit against the new base — a
        losing refresher never surfaces TxConflictError to its caller
        for a race it can resolve (ADVICE r5)."""
        base = self.snapshot()
        if txn is not None and txn in self._committed_txns():
            return base.version  # replayed refresh: already applied
        pby = self._partition_spec(base)
        if pby:
            p_missing = [c for c in pby if c not in df.columns]
            if p_missing:
                raise ValueError(
                    f"overwrite cannot drop partition column(s) "
                    f"{p_missing}; the partition spec is immutable"
                )
        gen = (
            self._gen_of(base)
            if base is not None
            else getattr(self, "_create_generated", None)
        )
        idn = self._identity_of(base)
        self._refuse_identity_col(df, idn, "overwrite")
        df = self._apply_generated(df, gen, "overwrite")
        pin = None
        assigned_from = None
        try:
            if idn is not None:
                # overwrite REPLACES the rows but the watermark stays
                # monotone (ids are never reused across the
                # replacement)
                assigned_from = idn["next"]
                df, idn["next"], pin = self._assign_identity(df, idn)
            self._validate_constraints(df, base, "overwrite")
            cm, retired, max_id = self._overwrite_colmap(base, df.columns)
            new = self._write_data(df, cm)
        finally:  # a failed check or write must not leak the pin
            if pin is not None:
                pin.unpersist()
        for attempt in range(max_retries + 1):
            try:
                return self._commit(
                    new,
                    "overwrite",
                    base,
                    txn=txn,
                    schema_json=self._schema_of(df),
                    stats=self._merged_stats(None, [], new, cm),
                    colmap=cm,
                    retired=retired,
                    max_id=max_id,
                    generated=gen if base is None else None,
                    identity=idn,
                )
            except TxConflictError:
                if attempt == max_retries:
                    raise
                base = self.snapshot()
                if txn is not None and txn in self._committed_txns():
                    return base.version
                if idn is not None and (
                    base is None
                    or base.identity is None
                    or base.identity["next"] != assigned_from
                ):
                    raise TxConflictError(
                        f"identity watermark advanced concurrently "
                        f"under {self.root}; re-invoke overwrite"
                    ) from None
                # a racing add_constraint must gate OUR rows too
                # (append's retry does the same)
                self._validate_constraints(df, base, "overwrite")
                cm2, retired, max_id = self._overwrite_colmap(
                    base, df.columns
                )
                if cm2 != cm:
                    # the racing commit changed the column mapping; our
                    # files were written under the stale physical names
                    # — the caller must re-invoke against the new base
                    raise
                cm = cm2

    def _overwrite_colmap(
        self, base: "TxSnapshot | None", columns: list[str]
    ) -> tuple[list[dict] | None, list[str] | None, int | None]:
        """Column mapping for a full-replace commit: retained names
        keep their id + physical name (appends after the overwrite
        stay compatible with any carried reader expectations), new
        names get fresh ids, and removed columns retire their
        physical names.  Identity tables stay identity (None)."""
        if base is None or base.colmap is None:
            return None, None, None
        cm, retired, max_id = self._materialized_colmap(base)
        by_name = {c["name"]: c for c in cm}
        out = []
        for name in columns:
            if name in by_name:
                out.append(by_name[name])
            else:
                max_id += 1
                out.append(
                    {
                        "id": max_id,
                        "name": name,
                        "phys": self._safe_phys(name, cm, retired, max_id),
                    }
                )
                cm = cm + [out[-1]]  # later new columns see this phys
        kept = {c["name"] for c in out}
        for c in by_name.values():
            if c["name"] not in kept and c["phys"] not in retired:
                retired.append(c["phys"])
        return out, retired, max_id

    def append(
        self, df: DataFrame, txn: str | None = None, max_retries: int = 5
    ) -> int:
        """Append; with ``txn`` the write is idempotent — a tag already
        committed is skipped, which is what makes an at-least-once
        replayer (foreachBatch keyed by batch_id) exactly-once.

        Concurrent writers are first-class (VERDICT r4 #7): appends
        commute, so a lost manifest race is resolved by re-reading the
        snapshot and re-committing the SAME already-written data files
        against the new base — no data rewrite, just a fresh manifest
        (bounded by ``max_retries``; the txn-tag check re-runs each
        attempt in case the conflicting commit was our own replayed
        tag)."""
        base = self.snapshot()
        idn = self._identity_of(base)
        self._refuse_identity_col(df, idn, "append")
        df = self._apply_generated(df, self._gen_of(base), "append")
        if idn is None:
            self._check_columns(df, base, "append")
        if txn is not None and txn in self._committed_txns():
            return base.version if base else 0
        pin = None
        assigned_from = None
        # the try/finally covers the schema/constraint checks too — a
        # rejected identity append must not leak the persisted pin for
        # the session lifetime (ADVICE r12)
        try:
            if idn is not None:
                # ids assigned AFTER the idempotency check (a replay
                # must not burn watermark); the pin keeps the
                # pid->offset map stable until the files are written
                assigned_from = idn["next"]
                df, idn["next"], pin = self._assign_identity(df, idn)
                self._check_columns(df, base, "append")
            # AFTER the idempotency check: a replayed batch must no-op
            # even if a constraint added since its first commit would
            # now reject it (has_txn's exactly-once contract; also
            # skips a wasted scan)
            self._validate_constraints(df, base, "append")
            cm = self._colmap_or_none(base)
            new = self._write_data(df, cm)
        finally:  # a failed check or write must not leak the pin
            if pin is not None:
                pin.unpersist()
        for attempt in range(max_retries + 1):
            carried = list(base.files) if base else []
            schema = (
                base.schema_json
                if base and base.schema_json
                else self._schema_of(df)
            )
            try:
                return self._commit(
                    carried + new,
                    "append",
                    base,
                    txn,
                    schema_json=schema,
                    stats=self._merged_stats(base, carried, new, cm),
                    identity=idn,
                )
            except TxConflictError:
                if attempt == max_retries:
                    raise
                base = self.snapshot()
                if txn is not None and txn in self._committed_txns():
                    return base.version if base else 0
                self._check_columns(df, base, "append")
                # a racing add_constraint must gate OUR rows too
                self._validate_constraints(df, base, "append")
                if self._colmap_or_none(base) != cm:
                    # racing schema-evolution commit: our files carry
                    # stale physical names — caller must re-invoke
                    raise
                if idn is not None and (
                    base.identity is None
                    or base.identity["next"] != assigned_from
                ):
                    # the racer consumed watermark: our files hold ids
                    # the new head may already have assigned — a
                    # re-commit would duplicate the surrogate key.
                    # Non-commuting, so surface it (the merge/
                    # replace_where convention): callers re-invoke and
                    # the fresh attempt assigns from the new watermark.
                    raise TxConflictError(
                        f"identity watermark advanced concurrently "
                        f"under {self.root}; re-invoke append"
                    ) from None

    def _head(self) -> TxSnapshot:
        base = self.snapshot()
        if base is None:
            raise FileNotFoundError(f"no committed version under {self.root}")
        return base

    def _current_schema(self, base: TxSnapshot):
        """The snapshot's governing schema; pre-schema-era manifests
        adopt the files' current schema (shared by every schema-
        evolution/restore path so the pre-schema handling can't
        drift between them)."""
        from pyspark.sql.types import StructType

        if base.schema_json is not None:
            return StructType.fromJson(json.loads(base.schema_json))
        return self.spark.read.parquet(*base.files).schema

    def add_column(self, name: str, dtype: str) -> int:
        """``ALTER TABLE ADD COLUMN`` as a METADATA-ONLY commit
        (reference R12, big_uery_handler.py:171-181 — there a BigQuery
        schema patch): the new manifest carries the same file list
        with an extended schema; existing files are never rewritten
        and read as NULL in the new column.  Contrast
        ``maintenance.add_column``, which rewrites a raw parquet dir
        O(table) — on a 100 TB table only the metadata form is
        viable.  Idempotent: adding an existing column is a no-op.

        Re-adding a previously DROPPED name is safe (r8): the new
        column gets a fresh field id and a fresh PHYSICAL name, so old
        files — which still hold the dropped column's values under the
        retired physical name — read NULL instead of resurrecting
        them (the Delta/Iceberg column-mapping semantics; pre-r8 this
        raised)."""
        base = self._head()
        schema = self._current_schema(base)
        if name in schema.fieldNames():
            return base.version
        needs_map = (
            base.colmap is not None
            or name in base.dropped  # legacy fence case: map our way out
        )
        if not needs_map:
            # identity fast path: phys == name is free and the
            # manifest stays colmap-less
            schema = schema.add(name, dtype)
            return self._commit(
                list(base.files),
                "add_column",
                base,
                schema_json=json.dumps(schema.jsonValue()),
                stats=self._merged_stats(base, list(base.files), []),
            )
        cm, retired, max_id = self._materialized_colmap(base)
        max_id += 1
        cm = cm + [
            {
                "id": max_id,
                "name": name,
                "phys": self._safe_phys(name, cm, retired, max_id),
            }
        ]
        schema = schema.add(name, dtype)
        return self._commit(
            list(base.files),
            "add_column",
            base,
            schema_json=json.dumps(schema.jsonValue()),
            stats=self._merged_stats(base, list(base.files), []),
            colmap=cm,
            retired=retired,
            max_id=max_id,
        )

    def drop_column(self, name: str) -> int:
        """``ALTER TABLE DROP COLUMN`` as a METADATA-ONLY commit: the
        new manifest keeps the same file list under a schema without
        the column — scans under the manifest schema simply never
        select it (parquet ignores extra file columns), old snapshots
        still time-travel with it, and post-drop writers append
        without it.  No rewrite at any table size.

        The dropped column's PHYSICAL name is retired forever; a
        later ``add_column`` of the same logical name gets a fresh
        field id + physical name and reads NULL from old files
        (column-mapping ids, r8 — pre-r8 the re-add was refused)."""
        from pyspark.sql.types import StructType

        base = self._head()
        schema = self._current_schema(base)
        if name not in schema.fieldNames():
            raise KeyError(f"column {name!r} does not exist in {self.root}")
        if name in (base.partition_by or ()):
            # the spec is immutable and file paths/stats are keyed on
            # it — dropping a partition column would orphan the layout
            raise ValueError(
                f"cannot drop partition column {name!r}; the partition "
                "spec is immutable"
            )
        if base.identity and name == base.identity["col"]:
            raise ValueError(
                f"cannot drop identity column {name!r}"
            )
        remaining = StructType([f for f in schema.fields if f.name != name])
        if not remaining.fields:
            raise ValueError("cannot drop the last remaining column")
        self._guard_constraint_schema(
            remaining.fields, base.constraints, "drop_column"
        )
        gen = dict(base.generated or {})
        gen.pop(name, None)  # dropping the generated col drops its expr
        self._guard_generated_schema(remaining.fields, gen, "drop_column")
        if self.stats_cols and name in self.stats_cols:
            # this writer must stop collecting bounds for the dropped
            # column or its next write crashes on the missing field
            # (_stats_for also self-heals for OTHER instances)
            self.stats_cols = [c for c in self.stats_cols if c != name]
        stats = self._merged_stats(base, list(base.files), [])
        if stats:  # drop the column's now-dead skipping bounds —
            # on COPIES: _merged_stats carries the base snapshot's
            # per-file dicts by reference, and a caller holding the
            # snapshot across this call must not see them mutated
            import copy

            stats = copy.deepcopy(stats)
            for per_file in stats.values():
                for side in ("min", "max"):
                    if isinstance(per_file.get(side), dict):
                        per_file[side].pop(name, None)
        kwargs = {}
        if base.colmap is not None:
            cm, retired, max_id = self._materialized_colmap(base)
            phys = next(c["phys"] for c in cm if c["name"] == name)
            kwargs = {
                "colmap": [c for c in cm if c["name"] != name],
                "retired": [*retired, phys],
                "max_id": max_id,
            }
        # colmap-less tables stay lean: the legacy ``dropped`` record
        # doubles as the retired-physical-name list (phys == name)
        return self._commit(
            list(base.files),
            "drop_column",
            base,
            schema_json=json.dumps(remaining.jsonValue()),
            stats=stats,
            dropped=[*base.dropped, name],
            generated=gen if base.generated is not None else None,
            **kwargs,
        )

    def rename_column(self, old: str, new: str) -> int:
        """``ALTER TABLE RENAME COLUMN`` as a METADATA-ONLY commit
        (reference R12's schema evolution, big_uery_handler.py:173-181;
        the canonical extension VERDICT r7 called for): the column
        keeps its field id and PHYSICAL parquet name — only the
        logical name in the manifest changes, so no data file is
        rewritten at any table size.  Reads map physical -> logical
        through the manifest colmap; per-file skipping stats re-key to
        the new logical name in the same commit.  Time travel across
        the rename sees each version's own name, exactly Delta's
        column-mapping behavior."""
        from pyspark.sql.types import StructField, StructType

        base = self._head()
        schema = self._current_schema(base)
        if old not in schema.fieldNames():
            raise KeyError(f"column {old!r} does not exist in {self.root}")
        if new in schema.fieldNames():
            raise ValueError(
                f"cannot rename {old!r} to {new!r}: target exists"
            )
        if old in (base.partition_by or ()):
            # the spec names LOGICAL columns and path segments key the
            # PHYSICAL name: a rename would desynchronize both; Delta
            # refuses partition-column renames under column mapping's
            # default too
            raise ValueError(
                f"cannot rename partition column {old!r}; the partition "
                "spec is immutable"
            )
        if base.identity and old == base.identity["col"]:
            raise ValueError(
                f"cannot rename identity column {old!r}"
            )
        cm, retired, max_id = self._materialized_colmap(base)
        cm = [
            {**c, "name": new} if c["name"] == old else c for c in cm
        ]
        renamed = StructType(
            [
                StructField(new, f.dataType, f.nullable, f.metadata)
                if f.name == old
                else f
                for f in schema.fields
            ]
        )
        self._guard_constraint_schema(
            renamed.fields, base.constraints, "rename_column"
        )
        if old in (base.generated or {}):
            raise ValueError(
                f"cannot rename generated column {old!r}; drop it first"
            )
        self._guard_generated_schema(
            renamed.fields, base.generated, "rename_column"
        )
        if self.stats_cols and old in self.stats_cols:
            self.stats_cols = [
                new if c == old else c for c in self.stats_cols
            ]
        stats = self._merged_stats(base, list(base.files), [], cm)
        if stats:  # re-key skipping bounds to the new logical name
            import copy

            stats = copy.deepcopy(stats)
            for per_file in stats.values():
                for side in ("min", "max"):
                    d = per_file.get(side)
                    if isinstance(d, dict) and old in d:
                        d[new] = d.pop(old)
        return self._commit(
            list(base.files),
            "rename_column",
            base,
            schema_json=json.dumps(renamed.jsonValue()),
            stats=stats,
            colmap=cm,
            retired=retired,
            max_id=max_id,
        )

    def history(self) -> list[dict]:
        """Commit log, newest first: version / op / txn / timestamp /
        file count / row count (when stats exist) per manifest — the
        DESCRIBE HISTORY observability surface.  Served from the
        commit index (r11): one cached sequential read, never
        O(versions) manifest opens; partial stats (a stats-less
        writer appended) report n_rows=None rather than a confidently
        wrong sum (the rule txlog.index_entry applies at commit
        time).  ``timestamp`` is a tz-aware UTC datetime (pre-r10
        manifests: the manifest file's mtime, the same fallback time
        travel uses)."""
        import datetime as _dt

        idx = txlog.read_index(self.log_dir, self._versions())
        out = []
        for v in sorted(idx, reverse=True):
            e = idx[v]
            ts_us = e.get("ts")
            out.append(
                {
                    "version": v,
                    "op": e.get("op"),
                    "txn": e.get("txn"),
                    "timestamp": (
                        _dt.datetime.fromtimestamp(
                            ts_us / 1_000_000, tz=_dt.timezone.utc
                        )
                        if ts_us is not None
                        else None
                    ),
                    "n_files": e.get("nf"),
                    "n_rows": e.get("nr"),
                }
            )
        return out

    def restore(self, version: int) -> int:
        """RESTORE TABLE TO VERSION AS OF: re-commit an old snapshot's
        file list (+ schema + stats) as the NEW head — the bad-write
        undo.  Metadata-only and non-destructive: the rolled-back
        commits stay in the log for audit/time-travel until vacuumed,
        exactly the Delta RESTORE contract.  Fails if the target's
        files were already vacuumed away.  Restoring the current head
        is a no-op.  Dropped-column history, the retired-physical-name
        set and the field-id high-water mark are carried from the
        HEAD, not the target (they only grow): a restore to a pre-drop
        version resurfaces the column (its files are intact), and a
        later re-add of a dropped name still gets a fresh physical
        name (column-mapping ids, r8).

        Change-feed interaction: ``read_since`` keeps its add-only
        contract across a restore — files the restore brings back that
        a consumer's pinned version predates are (re-)delivered
        (over-approximation, consumers dedup), and rows the rollback
        REMOVED are never retracted (an add-only feed cannot express
        deletion; a consumer needing retraction must diff
        snapshots)."""
        base = self._head()
        if version == base.version:
            return base.version
        target = self.snapshot(version)  # raises if vacuumed/missing
        t_dv_paths = sorted(
            {p for v in (target.dvs or {}).values() for p in v}
        )
        missing = [
            f
            for f in [*target.files, *t_dv_paths]
            if not os.path.exists(f)
        ]
        if missing:
            raise FileNotFoundError(
                f"cannot restore {self.root} to v{version}: "
                f"{len(missing)} data file(s) were vacuumed, e.g. "
                f"{missing[0]}"
            )
        # A pre-schema-era target must not revert the table to
        # footer-order schema governance (the hazard _read_files
        # documents): adopt the target files' schema into the manifest.
        schema_json = target.schema_json
        if schema_json is None:
            schema_json = json.dumps(
                self._current_schema(target).jsonValue()
            )
        kwargs = {}
        if base.colmap is not None or target.colmap is not None:
            # adopt the TARGET's mapping (its files speak its physical
            # names) but keep the HEAD's retired set and id high-water
            # mark — both only ever grow, and forgetting them across a
            # restore could recycle a physical name old files still use
            t_cm, t_retired, t_max = self._materialized_colmap(target)
            _, h_retired, h_max = self._materialized_colmap(base)
            retired = list(
                dict.fromkeys([*h_retired, *t_retired])
            )
            kwargs = {
                "colmap": t_cm,
                "retired": retired,
                "max_id": max(t_max, h_max),
            }
        return self._commit(
            list(target.files),
            "restore",
            base,
            schema_json=schema_json,
            stats=target.stats,
            # CHECK constraints restore WITH the state, like the schema
            # (Delta RESTORE restores metadata): carrying the head's
            # rules over the target's data could advertise a constraint
            # the restored rows violate — the one invariant
            # add_constraint promises never happens.  {} (not None)
            # when the target predates constraints, else _commit would
            # re-inherit the head's.
            constraints=dict(target.constraints or {}),
            generated=dict(target.generated or {}),
            # deletion vectors are STATE, not policy: the target's
            # vectors restore with its file list ({} when it had none
            # — _commit would otherwise re-inherit the head's)
            dvs=self._dvs_of(target) or {},
            **kwargs,
        )

    def read_since(self, version: int, until: int | None = None) -> DataFrame:
        """Rows in files ADDED after ``version`` — incremental
        consumption without reprocessing the table (the append-only
        core of a change-data-feed).  Exact for append/compact-only
        history; an intervening update/upsert rewrites whole files, so
        carried-along unchanged rows of those files appear too — an
        over-approximation, never a miss.  Downstream incremental
        consumers dedup on their own key, same contract as replaying
        an at-least-once feed.

        ``until`` pins the upper bound to a specific committed version
        (default: the newest).  A consumer that records the version it
        processed MUST pin — against the live head, a commit landing
        between "note the head version" and "read the delta" would be
        consumed now but re-delivered next cycle (the matview
        double-count race).

        Deletion vectors (r9): the head's DVs are applied to the
        DELIVERED files (a row appended then DV-deleted inside the
        window is never delivered — consistent with the head state),
        but DV deletes on files the consumer already saw are NOT
        retracted — an add-only feed cannot express deletion, the same
        restore caveat above.  ``delete_dv``/``update_dv`` are
        non-append ops, so matview's incremental fast path already
        falls back to a full recompute when one intervenes."""
        old = self.snapshot(version)
        head = self.snapshot(until)
        if old is None or head is None:
            raise FileNotFoundError(f"no committed version under {self.root}")
        new_files = [f for f in head.files if f not in set(old.files)]
        if not new_files:
            from pyspark.sql.types import StructType

            schema = (
                StructType.fromJson(json.loads(head.schema_json))
                if head.schema_json
                else self.read().schema
            )
            return self.spark.createDataFrame([], schema)
        return self._read_files(
            new_files,
            head.schema_json,
            self._colmap_or_none(head),
            dvs=self._dvs_of(head),
        )

    def _dv_new_rows(
        self,
        cur: TxSnapshot,
        prev: TxSnapshot,
    ) -> "DataFrame | None":
        """Rows newly deletion-vectored between two adjacent
        snapshots: per carried file, the sidecars ``cur`` added over
        ``prev`` name exact (file, pos) identities — a SEMI join
        recovers the deleted rows' full images."""
        new_paths: list[str] = []
        files: list[str] = []
        prev_dvs = prev.dvs or {}
        for f, paths in (cur.dvs or {}).items():
            fresh = [p for p in paths if p not in set(prev_dvs.get(f, []))]
            if fresh and f in set(prev.files):
                new_paths.extend(fresh)
                files.append(f)
        if not new_paths:
            return None
        dv = self.spark.read.schema(_DV_SCHEMA).parquet(
            *sorted(set(new_paths))
        )
        scanned = self._scan_with_pos(
            files, cur.schema_json, self._colmap_or_none(cur)
        ).withColumn("_fpn", self._norm_fp())
        out = (
            scanned.alias("d")
            .join(
                dv.alias("v"),
                (F.col("d._fpn") == F.col("v.file"))
                & (F.col("d._pos") == F.col("v.pos")),
                "left_semi",
            )
            .drop("_fpn", "_fp", "_pos")
        )
        return out

    # ops that re-arrange bytes without changing table content: their
    # file diffs are pure noise to a change consumer
    _CONTENT_NEUTRAL_OPS = frozenset({"compact", "purge"})

    def read_changes(
        self,
        since: int,
        until: int | None = None,
        skip_content_neutral: bool = True,
        labels: str = "simple",
    ) -> DataFrame:
        """ROW-LEVEL change feed (r9, CDF-lite): every row change
        committed after ``since`` up to ``until``, tagged
        ``_change_type`` ('insert' | 'delete') and ``_commit_version``.
        Updates appear as a delete+insert pair (the minimal CDF form;
        Delta's pre/postimage pairing is a labeling refinement).

        Precision by op class:
        - appends / inserts: exact (rows of added files);
        - merge-on-read mutations (delete_dv/update_dv/merge_dv):
          EXACT row-level deletes — the new sidecar entries name the
          (file, position) identities, something the add-only
          ``read_since`` feed cannot express;
        - copy-on-write mutations (update/delete/upsert/merge/
          replace_where) committed since r10: EXACT — the commit
          carries a ``_cdf`` sidecar (Delta's _change_data directory
          idea) naming only the rows that actually changed, and this
          feed reads it INSTEAD of the file diff;
        - pre-r10 CoW commits and restore(): file-granular —
          carried-along unchanged rows of a rewritten file emit as a
          delete+insert pair (an over-approximation that key-folding
          consumers converge through; never a miss);
        - content-neutral maintenance (compact / purge) emits NOTHING
          by default (``skip_content_neutral``) — their diffs are
          byte movement, not change.

        ``labels`` (r10): "simple" (default) emits the two-tag form
        ('insert' | 'delete'; updates appear as a pair) — the form the
        oracles and the streaming feed use; "delta" passes through the
        sidecars' four-tag Delta CDF labels ('update_preimage' /
        'update_postimage' pair updates to their row) and tags
        update_dv steps the same way from the op.  merge(mode='dv'),
        pre-r10 CoW commits and restore cannot pair (their artifacts
        don't distinguish update-fired from delete-fired rows) and
        keep delete/insert under either labeling.

        Cost ∝ the changed files and sidecars in the window, never
        the table; every version step reads under ITS schema and the
        union NULL-fills across schema evolution."""
        from pyspark.sql.types import StructType

        all_versions = self._versions()
        versions = [
            v
            for v in all_versions
            if v > since and (until is None or v <= until)
        ]
        if since not in all_versions and since != 0:
            raise FileNotFoundError(
                f"version {since} of {self.root} is not in the log"
            )
        if labels not in ("simple", "delta"):
            raise ValueError(
                f"labels must be 'simple' or 'delta', got {labels!r}"
            )
        if since == 0 and all_versions and all_versions[0] > 1:
            # the change feed's first step needs snapshot(since) as the
            # base; a vacuum-truncated log cannot reconstruct changes
            # from the beginning (ADVICE r9 — mirror the streaming
            # source's retention error, not a bare version-missing one)
            raise FileNotFoundError(
                f"read_changes(since=0) on {self.root}: versions "
                f"1..{all_versions[0] - 1} are no longer in the log — "
                "vacuum retention passed the requested window (start "
                f"from a retained version, earliest {all_versions[0]})"
            )
        parts: list[DataFrame] = []

        def tag(df: DataFrame, kind: str, v: int) -> DataFrame:
            return df.select(
                F.lit(kind).alias("_change_type"),
                F.lit(v).cast("long").alias("_commit_version"),
                "*",
            )

        for v in versions:
            cur = self.snapshot(v)
            prev = self.snapshot(v - 1) if v - 1 >= 1 else None
            if (
                skip_content_neutral
                and cur.op in self._CONTENT_NEUTRAL_OPS
            ):
                continue
            if cur.cdf:
                # the commit recorded its exact changeset — emit it and
                # skip the (over-approximate) file diff entirely
                ch = self.spark.read.parquet(*cur.cdf)
                data_cols = [c for c in ch.columns if c != "_change_type"]
                tag_col = F.col("_change_type")
                if labels == "simple":
                    tag_col = (
                        F.when(
                            tag_col == "update_preimage", F.lit("delete")
                        )
                        .when(
                            tag_col == "update_postimage",
                            F.lit("insert"),
                        )
                        .otherwise(tag_col)
                    )
                parts.append(
                    ch.select(
                        tag_col.alias("_change_type"),
                        F.lit(v).cast("long").alias("_commit_version"),
                        *data_cols,
                    )
                )
                continue
            prev_files = set(prev.files) if prev else set()
            added = [f for f in cur.files if f not in prev_files]
            removed = (
                [f for f in prev.files if f not in set(cur.files)]
                if prev
                else []
            )
            if added:
                # read added files under CUR's deletion vectors: a
                # commit that (re-)adds DV-carrying files — restore()
                # to a DV'd version — must not emit DV-dead rows as
                # 'insert' (ADVICE r9: the feed would resurrect rows
                # absent from read()).  _live_dvs keeps every DV-less
                # step on the identity fast path.
                ins_tag = (
                    "update_postimage"
                    if labels == "delta" and cur.op == "update_dv"
                    else "insert"
                )
                parts.append(
                    tag(
                        self._read_files(
                            added,
                            cur.schema_json,
                            self._colmap_or_none(cur),
                            dvs=self._dvs_of(cur),
                        ),
                        ins_tag,
                        v,
                    )
                )
            if removed:
                # rows already dead under PREV's vectors were deleted
                # in an earlier version — do not re-emit them
                parts.append(
                    tag(
                        self._read_files(
                            removed,
                            prev.schema_json,
                            self._colmap_or_none(prev),
                            dvs=self._dvs_of(prev),
                        ),
                        "delete",
                        v,
                    )
                )
            if prev is not None:
                dv_rows = self._dv_new_rows(cur, prev)
                if dv_rows is not None:
                    pre_tag = (
                        "update_preimage"
                        if labels == "delta" and cur.op == "update_dv"
                        else "delete"
                    )
                    parts.append(tag(dv_rows, pre_tag, v))
        if not parts:
            head = self.snapshot(until)
            schema = StructType.fromJson(
                json.loads(head.schema_json)
            ).add("_change_type", "string").add("_commit_version", "long")
            empty = self.spark.createDataFrame([], schema)
            return empty.select(
                "_change_type",
                "_commit_version",
                *[
                    c
                    for c in empty.columns
                    if c not in ("_change_type", "_commit_version")
                ],
            )
        out = parts[0]
        for p_ in parts[1:]:
            out = out.unionByName(p_, allowMissingColumns=True)
        return out

    # ------------------------------------------------- file skipping

    @staticmethod
    def _norm_bound(bound, stored_exemplar):
        """Align a caller bound with the manifest's stat representation.
        Stats JSON-round-trip through ``default=str``, so date /
        timestamp mins and maxes are stored as ISO strings (lexical
        order == temporal order); ``str(bound)`` produces the identical
        form.  Decimals/bytes are rejected loudly — their lexical order
        is NOT value order, and a silent mis-compare here would skip
        files and change results."""
        import datetime
        import decimal

        if bound is None or not isinstance(stored_exemplar, str):
            return bound
        if isinstance(bound, str):
            return bound
        if isinstance(bound, (datetime.date, datetime.datetime)):
            return str(bound)
        raise TypeError(
            "files_in_range: stats for this column are stored as strings; "
            f"supported bound types are str/date/datetime, got "
            f"{type(bound).__name__}"
            + (
                " (Decimal lexical order is not value order)"
                if isinstance(bound, decimal.Decimal)
                else ""
            )
        )

    def files_in_range(
        self, col: str, lo=None, hi=None, snap: TxSnapshot | None = None
    ) -> list[str]:
        """Manifest-level data skipping: the files whose recorded
        [min, max] for ``col`` can intersect [lo, hi].  Files without
        stats (pre-stats commits, NULL-only files) are conservatively
        kept — skipping must never change results, only cost.
        Numeric and string columns compare natively; date/timestamp
        bounds are normalized to the manifests' ISO-string form.
        ``snap`` pins the snapshot (mutations prune against the SAME
        base their survivor list derives from); default is the head."""
        if snap is None:
            snap = self.snapshot()
        if snap is None:
            raise FileNotFoundError(f"no committed version under {self.root}")
        keep = []
        for f in snap.files:
            st = (snap.stats or {}).get(f)
            fmin = st["min"].get(col) if st else None
            fmax = st["max"].get(col) if st else None
            if fmin is None or fmax is None:
                keep.append(f)
                continue
            f_lo = self._norm_bound(lo, fmin)
            f_hi = self._norm_bound(hi, fmax)
            if f_lo is not None and fmax < f_lo:
                continue
            if f_hi is not None and fmin > f_hi:
                continue
            keep.append(f)
        return keep

    def read_range(self, col: str, lo=None, hi=None) -> DataFrame:
        """Key-range scan that opens only the files the manifest stats
        admit, then applies the exact predicate (skipping is a
        superset filter).  On a 100 TB time-keyed table this is the
        difference between scanning the table and scanning a day."""
        snap = self.snapshot()
        files = self.files_in_range(col, lo, hi)
        if not files:
            from pyspark.sql.types import StructType

            schema = (
                StructType.fromJson(json.loads(snap.schema_json))
                if snap.schema_json
                else self._read_files(list(snap.files), None).schema
            )
            return self.spark.createDataFrame([], schema)
        df = self._read_files(
            files,
            snap.schema_json,
            self._colmap_or_none(snap),
            dvs=self._dvs_of(snap),
        )
        if lo is not None:
            df = df.filter(F.col(col) >= F.lit(lo))
        if hi is not None:
            df = df.filter(F.col(col) <= F.lit(hi))
        return df

    def _candidate_files_for_keys(
        self, base: TxSnapshot, batch: DataFrame, keys: list[str]
    ) -> list[str]:
        """Manifest-level pruning of the affected-file search shared by
        merge/upsert: a file whose recorded [min, max] for a key column
        cannot intersect the batch's key range cannot contain a match,
        so it is skipped WITHOUT opening its footer.  On a 100 TB table
        clustered/z-ordered on the merge key this turns the
        affected-file scan from O(table) into O(slice); unkeyed tables
        (no ``stats_cols`` on the key) fall back to the full list.  One
        metadata-sized aggregate over the batch computes every key's
        bounds in a single job.  NULL keys never match under equality,
        so non-null bounds are sufficient — an all-NULL key column
        means NOTHING can match and the scan is skipped entirely.
        Files without stats are conservatively kept (pruning changes
        cost, never results)."""
        stats = base.stats or {}
        with_stats = [
            k
            for k in keys
            if any(
                (stats.get(f) or {}).get("min", {}).get(k) is not None
                for f in base.files
            )
        ]
        if not with_stats:
            return list(base.files)
        bounds = batch.agg(
            *[F.min(k).alias(f"lo_{i}") for i, k in enumerate(with_stats)],
            *[F.max(k).alias(f"hi_{i}") for i, k in enumerate(with_stats)],
        ).first()
        cand = list(base.files)
        for i, k in enumerate(with_stats):
            lo, hi = bounds[f"lo_{i}"], bounds[f"hi_{i}"]
            if lo is None:  # every batch key is NULL: no match possible
                return []
            try:
                keep = set(self.files_in_range(k, lo, hi, snap=base))
            except TypeError:  # unorderable stored form: stay conservative
                continue
            cand = [f for f in cand if f in keep]
        return cand

    # ---------------------------------------- copy-on-write mutations

    def _scan_with_fp(
        self,
        files,
        schema_json: str | None = None,
        colmap: list[dict] | None = None,
        dvs: dict | None = None,
    ) -> DataFrame:
        """Snapshot scan carrying each row's source file as a regular
        column.  ``_metadata`` resolves only directly against the file
        source, so it must be projected here, before any join/filter —
        and, under a non-identity colmap, before the physical->logical
        projection.  ``dvs`` subtracts deletion-vector rows, so a file
        whose only predicate matches are already-deleted rows is never
        reported affected."""
        live = self._live_dvs(list(files), dvs)
        if live:
            return self._anti_dv(
                self._scan_with_pos(files, schema_json, colmap), live
            ).drop("_pos")
        if schema_json is None or self._is_identity(colmap):
            return self._read_files(files, schema_json).withColumn(
                "_fp", F.col("_metadata.file_path")
            )
        from pyspark.sql.types import StructType

        logical = StructType.fromJson(json.loads(schema_json))
        raw = self._phys_read(files, logical, colmap).withColumn(
            "_fp", F.col("_metadata.file_path")
        )
        return raw.select(
            *self._logical_select(logical, colmap), F.col("_fp")
        )

    @staticmethod
    def _affected_files(pred_df: DataFrame) -> list[str]:
        """Distinct source files of ``pred_df``'s rows — metadata-sized
        (a few paths), safe to collect on the driver.  file_path comes
        back as a URI (``file:/x`` or ``file:///x``, %-encoded);
        normalize to the plain paths the manifests store — without the
        unquote, a partition dir with an escapable char (a space) would
        yield paths matching NO manifest file and the rewrite would
        silently skip its rows."""
        from urllib.parse import unquote, urlparse

        rows = pred_df.select("_fp").distinct().collect()
        return sorted(unquote(urlparse(r._fp).path) for r in rows)

    @staticmethod
    def _rebaseable_between(
        old: TxSnapshot,
        new: TxSnapshot,
        read_files: "set[str] | None",
    ) -> bool:
        """Can a mutation whose read set was ``read_files`` (the
        manifest-pruned candidate files it scanned for matches; None =
        it read the whole table) safely re-commit against ``new``
        after losing the race to the commits separating ``old`` from
        ``new``?  Two admissible interleavings (r10, widened from
        pure-append-only per VERDICT r9 #4 — Delta's disjoint-file
        admission):

        - PURE APPENDS (the r9 rule): nothing removed, no metadata or
          DV change — appended rows don't participate in a mutation
          whose read set predates them (documented WriteSerializable
          caveat: a racing blind append CAN land rows a merge would
          have claimed).
        - DISJOINT REWRITES: the racer removed/rewrote/DV'd only files
          OUTSIDE my read set.  My pruning already proved those files
          can contain no row my keys/range match (their stats exclude
          my bounds), so re-serializing my mutation after the racer
          reads the same rows and writes the same result; the racer's
          file swaps carry into my survivor list by rebasing.  Two
          merges on different key ranges of a clustered table compose
          this way; two touching the same FILE still conflict (each
          survivor list derives from its snapshot).

        Schema / constraint / colmap changes always conflict
        (metadata governs how my outputs were written and validated)."""
        if not (
            new.schema_json == old.schema_json
            and (new.constraints or {}) == (old.constraints or {})
            and new.colmap == old.colmap
        ):
            return False
        removed = set(old.files) - set(new.files)
        odvs, ndvs = old.dvs or {}, new.dvs or {}
        if not removed and odvs == ndvs:
            return True  # pure appends
        if read_files is None:
            return False  # whole-table read: any rewrite is a conflict
        if removed & read_files:
            return False
        # a racer DV-ing rows inside my read set is a rewrite of it
        dv_changed = {
            f
            for f in set(odvs) | set(ndvs)
            if odvs.get(f) != ndvs.get(f)
        }
        return not (dv_changed & read_files)

    def _commit_vs_appends(
        self,
        base: TxSnapshot,
        op: str,
        affected: set,
        new: list[str],
        txn: str | None = None,
        dv_delta: dict | None = None,
        max_retries: int = 5,
        cdf: list[str] | None = None,
        read_files: "set[str] | None" = None,
    ) -> int:
        """Commit a snapshot-derived mutation (survivors = base.files
        minus ``affected``, plus ``new``), auto-resolving lost races
        against ADMISSIBLE interleavings (``_rebaseable_between``):
        pure appends always, and — when the caller declares the
        ``read_files`` its decisions derived from (the manifest-pruned
        candidate set) — racers that removed/DV'd only files OUTSIDE
        that read set.  The racing commits' files join the survivor
        list and the same already-written outputs re-commit, no
        recomputation.  Any other interleaving raises TxConflictError
        for the caller to re-invoke (their survivor/DV decisions would
        be stale).  ``dv_delta`` ({file: new sidecar paths}) composes
        against EACH retry base's vectors, so a DV mutation rebased
        over a racer's unrelated DV change keeps both.  Delta caveat
        mirrored: a racing blind append CAN land rows a just-committed
        upsert/merge would have claimed (duplicate keys) —
        WriteSerializable, not Serializable."""
        cm = self._colmap_or_none(base)
        for attempt in range(max_retries + 1):
            survivors = [f for f in base.files if f not in affected]
            dvs = None
            if dv_delta is not None:
                dvs = self._dvs_of(base) or {}
                for f, paths in dv_delta.items():
                    dvs[f] = list(dvs.get(f, [])) + list(paths)
            try:
                return self._commit(
                    survivors + new,
                    op,
                    base,
                    txn=txn,
                    schema_json=base.schema_json,
                    stats=self._merged_stats(base, survivors, new, cm),
                    dvs=dvs,
                    cdf=cdf,
                )
            except TxConflictError:
                nb = self.snapshot()
                if txn is not None and txn in self._committed_txns():
                    return nb.version  # our twin's replay landed it
                if attempt == max_retries or not self._rebaseable_between(
                    base, nb, read_files
                ):
                    raise
                base = nb

    def _rewrite_affected(
        self,
        where: Column,
        op: str,
        transform,
        validate: bool = False,
        post_of=None,
        candidates_of=None,
    ) -> int:
        """File-granular copy-on-write scaffold shared by
        UPDATE/DELETE: find the files containing ``where`` matches,
        rewrite them through ``transform(hit_df)``, carry everything
        else by reference.  A no-match predicate commits an
        EMPTY-CHANGE version (same file list) — Delta parity, so every
        mutation call advances the version counter and callers'
        ``restore(v)`` / ``history()`` arithmetic stays predictable
        regardless of whether the predicate matched (VERDICT r7 item 1;
        Delta Lake commits an empty transaction here for the same
        reason).  Returns the number of matching rows.

        Concurrency (r9 conflict matrix, widened r10): a lost race
        against PURE-APPEND commits auto-resolves — the appended files
        join the survivor list, nothing recomputes
        (``_commit_vs_appends``).  With ``candidates_of`` (a callable
        base -> stats-pruned file list, the range forms) the mutation
        also declares its READ SET, so racers that rewrote only files
        outside it rebase too (``_rebaseable_between``).  Any other
        interleaving raises TxConflictError: the survivor list derives
        FROM the snapshot, so a safe retry would have to redo the
        affected-file scan against the new base — callers re-invoke.

        Exact CDF (r10): when rows matched, the commit carries a
        ``_cdf`` sidecar naming the exact preimages (tag 'delete') and
        — via ``post_of(matched)``, UPDATE's transformed images — the
        exact postimages (tag 'insert'), so ``read_changes`` never
        re-emits the rewritten files' carried-along rows."""
        base = self.snapshot()
        if base is None:
            raise FileNotFoundError(f"no committed version under {self.root}")
        cm = self._colmap_or_none(base)
        search = (
            list(base.files)
            if candidates_of is None
            else candidates_of(base)
        )
        read_files = set(search) if candidates_of is not None else None
        affected = (
            self._affected_files(
                self._scan_with_fp(
                    search, base.schema_json, cm, dvs=self._dvs_of(base)
                ).filter(where)
            )
            if search
            else []
        )
        if not affected:
            self._commit_vs_appends(
                base, op, set(), [], read_files=read_files
            )
            return 0
        # r15 (guide §1.4/§5): the affected slice used to be re-scanned
        # four times (match count, validation, rewrite, CDF) — persist
        # it once and let the match count ride the first action via
        # ``observe`` (placed BELOW the transform, so a DELETE's
        # filtered-out matches are still counted).
        hit = self._read_files(
            affected, base.schema_json, cm, dvs=self._dvs_of(base)
        ).persist()
        try:
            obs = Observation()
            rewritten = transform(
                hit.observe(obs, F.count(F.when(where, 1)).alias("n"))
            )
            if validate:  # UPDATE can move rows INTO violation;
                # DELETE can't
                self._validate_constraints(rewritten, base, op)
                # an update of a generation INPUT must keep the
                # generated column consistent (stricter than Delta's
                # recompute: callers update both; documented)
                self._validate_generated(
                    rewritten, self._gen_of(base), op
                )
            new = self._write_data(rewritten, cm)
            n = int(obs.get["n"] or 0)
            cdf = None
            if n > 0:
                matched = hit.filter(where)
                pre_tag = "delete" if post_of is None else "update_preimage"
                changes = matched.withColumn("_change_type", F.lit(pre_tag))
                if post_of is not None:
                    changes = changes.unionByName(
                        post_of(matched).withColumn(
                            "_change_type", F.lit("update_postimage")
                        )
                    )
                cdf = self._write_cdf(changes, parts=len(affected))
            self._commit_vs_appends(
                base, op, set(affected), new, cdf=cdf, read_files=read_files
            )
        finally:
            hit.unpersist()
        return n

    @staticmethod
    def _predicate_bounds(where: Column) -> dict:
        """NECESSARY per-column intervals implied by a predicate —
        ``{col: (lo, hi)}`` such that every row the predicate can
        match has ``col`` within [lo, hi] (None bound = unbounded).
        Derived by walking the Column's expression tree (the public
        ColumnNode shape, Spark 4 classic): comparisons of a bare
        attribute against a literal, IN over literals, and AND/OR
        composition.  CONSERVATIVE by construction — any unrecognized
        node shape contributes nothing under AND and kills the branch
        under OR/NOT, so the result is always an over-approximation
        of the matching rows (missing a necessary bound costs
        pruning, never correctness).  {} = nothing derivable.

        This is the analysis Delta performs on UPDATE/DELETE
        predicates for data skipping; here it feeds both the
        affected-file SEARCH and the declared read set for
        disjoint-writer admission (VERDICT r10 #5)."""
        import datetime as _dt

        def lit_val(n):
            v = n.value()
            if isinstance(v, (int, float, str)):
                return v
            if hasattr(v, "getClass"):  # java.sql.Date / Timestamp
                cls = v.getClass().getName()
                s = str(v.toString())
                if cls == "java.sql.Date":
                    return _dt.date.fromisoformat(s)
                if cls == "java.sql.Timestamp":
                    return _dt.datetime.fromisoformat(s)
            raise ValueError(f"unsupported literal {v!r}")

        def attr_of(n):
            if n.getClass().getSimpleName() != "UnresolvedAttribute":
                return None
            parts = n.nameParts()
            if parts.size() != 1:
                return None  # qualified/nested: ambiguous, bail
            return parts.apply(0)

        def merge_and(a: dict, b: dict) -> dict:
            out = dict(a)
            for c, (lo, hi) in b.items():
                plo, phi = out.get(c, (None, None))
                lo = plo if lo is None else (lo if plo is None else max(plo, lo))
                hi = phi if hi is None else (hi if phi is None else min(phi, hi))
                out[c] = (lo, hi)
            return out

        def merge_or(a: dict, b: dict) -> dict:
            out = {}
            for c in set(a) & set(b):  # only bounds BOTH branches imply
                alo, ahi = a[c]
                blo, bhi = b[c]
                lo = None if alo is None or blo is None else min(alo, blo)
                hi = None if ahi is None or bhi is None else max(ahi, bhi)
                if lo is not None or hi is not None:
                    out[c] = (lo, hi)
            return out

        def walk(n) -> dict:
            if n.getClass().getSimpleName() != "UnresolvedFunction":
                return {}
            fn = n.functionName()
            args = n.arguments()
            if fn == "and":
                return merge_and(walk(args.apply(0)), walk(args.apply(1)))
            if fn == "or":
                left = walk(args.apply(0))
                return merge_or(left, walk(args.apply(1))) if left else {}
            if fn in ("=", "==", "<", "<=", ">", ">="):
                a0, a1 = args.apply(0), args.apply(1)
                col, lit, flip = attr_of(a0), a1, False
                if col is None:  # literal-on-the-left form flips
                    col, lit, flip = attr_of(a1), a0, True
                if (
                    col is None
                    or lit.getClass().getSimpleName() != "Literal"
                ):
                    return {}
                v = lit_val(lit)
                op = fn
                if flip:
                    op = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}.get(
                        op, op
                    )
                if op in ("=", "=="):
                    return {col: (v, v)}
                if op in ("<", "<="):
                    return {col: (None, v)}
                return {col: (v, None)}
            if fn == "in":
                col = attr_of(args.apply(0))
                if col is None:
                    return {}
                vals = []
                for i in range(1, args.size()):
                    a = args.apply(i)
                    if a.getClass().getSimpleName() != "Literal":
                        return {}
                    vals.append(lit_val(a))
                if not vals:
                    return {}
                return {col: (min(vals), max(vals))}
            return {}

        try:
            return walk(where._jc.node())
        except Exception:
            return {}  # analysis is an optimization, never a gate

    def _pruned_candidates_of(self, where: Column):
        """``candidates_of`` for update/delete (r11, VERDICT r10 #5):
        when the predicate implies interval bounds on stats columns,
        the affected-file search opens only the admitted files AND the
        mutation declares that set as its read set — so
        ``UPDATE WHERE date = X`` on a date-clustered table composes
        with concurrent rewrites of other slices, exactly like
        ``update_range``.  Returns None (today's whole-table contract)
        when nothing is derivable."""
        bounds = self._predicate_bounds(where)
        if not bounds:
            return None

        def candidates(base: "TxSnapshot"):
            cols = set(base.stats_cols or self.stats_cols or ())
            cand: "set[str] | None" = None
            for c, (lo, hi) in bounds.items():
                if c not in cols or (lo is None and hi is None):
                    continue
                try:
                    fs = set(self.files_in_range(c, lo, hi, snap=base))
                except TypeError:
                    continue  # bound/stat representation mismatch
                cand = fs if cand is None else cand & fs
            # nothing stats-prunable: the read set is the whole table
            # (same admission behavior as read_files=None)
            return sorted(cand) if cand is not None else list(base.files)

        return candidates

    def update(self, where: Column, set_map: dict[str, Column]) -> int:
        """``UPDATE <table> SET ... WHERE ...`` as file-granular
        copy-on-write: only files containing matching rows are
        rewritten; everything else carries over by reference.  A
        zero-match update still commits an empty-change version
        (Delta parity — see ``_rewrite_affected``).  r11: a predicate
        with derivable interval bounds on a stats column prunes the
        affected-file search via the manifest AND declares the pruned
        read set (disjoint-writer admission — see
        ``_pruned_candidates_of``); opaque predicates keep the
        whole-table-read contract.  Returns the number of rows
        updated."""

        self._refuse_generated_targets(set_map, "update")
        self._refuse_identity_set(set_map, "update", self.snapshot())

        def transform(hit: DataFrame) -> DataFrame:
            for col_name, value in set_map.items():
                hit = hit.withColumn(
                    col_name, F.when(where, value).otherwise(F.col(col_name))
                )
            return hit

        return self._rewrite_affected(
            where,
            "update",
            transform,
            validate=True,
            post_of=transform,
            candidates_of=self._pruned_candidates_of(where),
        )

    def delete(self, where: Column) -> int:
        """``DELETE FROM <table> WHERE ...`` as file-granular
        copy-on-write: only files containing matching rows are
        rewritten (keeping their NON-matching rows) — at 100 TB a
        selective delete rewrites a handful of files, never the
        table.  SQL DELETE semantics: a NULL-predicate row is NOT
        deleted.  A zero-match delete still commits an empty-change
        version (Delta parity — see ``_rewrite_affected``).  r11:
        stats-derivable predicates prune the search and declare the
        read set, like ``update`` above.  Returns the number of rows
        deleted."""
        return self._rewrite_affected(
            where,
            "delete",
            lambda hit: hit.filter(~where.eqNullSafe(F.lit(True))),
            candidates_of=self._pruned_candidates_of(where),
        )

    @staticmethod
    def _range_pred(col: str, lo, hi) -> Column:
        if lo is None and hi is None:
            raise ValueError("range mutation needs at least one bound")
        pred = F.lit(True)
        if lo is not None:
            pred = F.col(col) >= F.lit(lo)
        if hi is not None:
            pred = pred & (F.col(col) <= F.lit(hi))
        return pred

    def delete_range(self, col: str, lo=None, hi=None) -> int:
        """``delete`` specialized to a key range (``lo <= col <= hi``,
        bounds optional) — the affected-file search opens ONLY files
        whose manifest [min, max] for ``col`` can intersect the range
        (``files_in_range``; ``replace_range``'s pruning, r10), so on
        a date-clustered 100 TB table deleting a day costs one slice.
        Because the read set is declared, two range deletes on
        DISJOINT file sets compose without caller retry
        (``_rebaseable_between``) — the concurrent-retention-job
        shape; the generic ``delete`` scans every file and stays
        conservative."""
        return self._rewrite_affected(
            self._range_pred(col, lo, hi),
            "delete",
            lambda hit: hit.filter(
                ~self._range_pred(col, lo, hi).eqNullSafe(F.lit(True))
            ),
            candidates_of=lambda base: self.files_in_range(
                col, lo, hi, snap=base
            ),
        )

    def update_range(
        self, col: str, lo, hi, set_map: dict[str, Column]
    ) -> int:
        """``update`` specialized to a key range — stats-pruned
        affected-file search plus disjoint-writer admission, like
        ``delete_range``.  CHECK constraints gate the rewritten
        rows."""
        where = self._range_pred(col, lo, hi)
        self._refuse_generated_targets(set_map, "update_range")
        self._refuse_identity_set(set_map, "update_range", self.snapshot())

        def transform(hit: DataFrame) -> DataFrame:
            for col_name, value in set_map.items():
                hit = hit.withColumn(
                    col_name,
                    F.when(where, value).otherwise(F.col(col_name)),
                )
            return hit

        return self._rewrite_affected(
            where,
            "update",
            transform,
            validate=True,
            post_of=transform,
            candidates_of=lambda base: self.files_in_range(
                col, lo, hi, snap=base
            ),
        )

    def _write_dv(self, dv_df: DataFrame) -> list[str]:
        """Materialize a (file, pos) frame as an immutable DV sidecar
        commit directory; returns its parquet part paths."""
        out = os.path.join(self.data_dir, uuid.uuid4().hex)
        dv_df.select(
            F.col("file").cast("string").alias("file"),
            F.col("pos").cast("bigint").alias("pos"),
        ).write.mode("error").parquet(out)
        return sorted(
            os.path.join(out, n)
            for n in os.listdir(out)
            if n.endswith(".parquet")
        )

    def _write_cdf(self, changes: DataFrame, parts: int = 1) -> list[str]:
        """Materialize an exact per-commit changeset (``_change_type``
        'insert'|'delete' + the table's logical columns at commit time)
        as an immutable sidecar directory; returns its parquet paths.
        Cost ∝ changed rows, never the table — the whole point: a CoW
        merge's file diff re-emits every carried-along row of a
        rewritten file, the sidecar names only what actually changed
        (Delta CDF's _change_data directory, same idea).

        ``parts`` right-sizes the sidecar: callers pass the AFFECTED
        file count, so a 1-file trickle merge writes one sidecar file
        and a 1000-file backfill writes ~1000 in parallel (Delta's
        per-rewritten-file _change_data layout).  The plan's natural
        partitioning (shuffle width of the clause join) wrote 64 tiny
        files per commit — measured ~0.5 s of pure task/commit
        overhead per mutation at local scale, and 64 footer opens per
        feed step forever after."""
        out = os.path.join(self.data_dir, uuid.uuid4().hex)
        changes.coalesce(max(1, parts)).write.mode("error").parquet(out)
        return sorted(
            os.path.join(out, n)
            for n in os.listdir(out)
            if n.endswith(".parquet")
        )

    def _matches_with_pos(self, base: TxSnapshot, where: Column) -> DataFrame:
        """Live (not-already-deleted) rows matching ``where``, carrying
        ``_fp``/``_pos`` row identity — the shared front half of the
        merge-on-read mutations."""
        cm = self._colmap_or_none(base)
        scanned = self._scan_with_pos(list(base.files), base.schema_json, cm)
        live = self._live_dvs(list(base.files), self._dvs_of(base))
        if live:
            scanned = self._anti_dv(scanned, live)
        return scanned.filter(where)

    def _dv_commit(
        self,
        base: TxSnapshot,
        op: str,
        matched: DataFrame,
        new: list[str],
        txn: str | None = None,
        read_files: "set[str] | None" = None,
    ) -> int:
        """Write the DV sidecar for ``matched`` (persisted, non-empty)
        and commit: same data files (+ optionally ``new`` appended
        ones), each affected file's vector extended — never a data-file
        rewrite.  Per-file row-count stats become upper bounds once a
        file carries a DV; min/max stay sound (a DV only removes rows),
        so manifest pruning is unaffected."""
        dv_rows = matched.select(
            self._norm_fp().alias("file"), F.col("_pos").alias("pos")
        )
        dv_files = self._write_dv(dv_rows)
        # manifest dvs keys must be the RAW paths the file list stores:
        # sidecar 'file' values stay URI-encoded (every read-side join
        # compares them against _norm_fp, same space), but a %-encoded
        # DICT key would be auto-pruned against the committed file list
        # and the deletes would silently resurrect
        from urllib.parse import unquote

        affected = sorted(
            unquote(r.file)
            for r in dv_rows.select("file").distinct().collect()
        )
        # a DELTA, not the composed dict: _commit_vs_appends re-applies
        # it over each retry base, so a rebase over a racer's unrelated
        # DV change keeps both writers' vectors
        dv_delta = {f: list(dv_files) for f in affected}
        return self._commit_vs_appends(
            base,
            op,
            set(),
            new,
            txn=txn,
            dv_delta=dv_delta,
            read_files=read_files,
        )

    def delete_dv(self, where: Column) -> int:
        """Merge-on-read DELETE (Delta deletion vectors): matching rows
        are recorded in a (file, row-position) sidecar and subtracted
        from every subsequent read — NO data file is rewritten.  At
        100 TB with scattered small mutations this is the difference
        between a few-KB sidecar write and rewriting a 1 GB file per
        touched row (copy-on-write amplification, VERDICT r8 #2); the
        read-side cost is one anti-join against the accumulated DV
        set, reclaimed by the next ``compact()``/rewrite of the file
        (which materializes the deletes and retires the vector).
        Same SQL semantics as ``delete``: NULL-predicate rows survive,
        already-deleted rows don't double-count, a zero-match call
        commits an empty-change version.  Returns rows deleted."""
        base = self._head()
        matched = self._matches_with_pos(base, where).persist()
        try:
            n = matched.count()
            if n == 0:
                self._commit_vs_appends(base, "delete_dv", set(), [])
                return 0
            self._dv_commit(base, "delete_dv", matched, [])
            return n
        finally:
            matched.unpersist()

    def update_dv(self, where: Column, set_map: dict[str, Column]) -> int:
        """Merge-on-read UPDATE: matched rows are DV-deleted in place
        and their updated images APPEND as fresh files — the old data
        files are never rewritten (Delta's DV update path).  Cost ∝
        matched rows, not touched-file bytes: the CoW ``update`` of a
        single row in a 1 GB file rewrites the GB; this writes one
        sidecar plus one matched-rows-sized file.  CHECK constraints
        gate the updated images (an update can move rows INTO
        violation); a zero-match call commits an empty-change version
        BEFORE validation, like ``update``.  Returns rows updated."""
        base = self._head()
        self._refuse_generated_targets(set_map, "update_dv", base=base)
        self._refuse_identity_set(set_map, "update_dv", base)
        cols = [f["name"] for f in json.loads(base.schema_json)["fields"]]
        bad = sorted(set(set_map) - set(cols))
        if bad:
            raise ValueError(f"update_dv targets unknown columns {bad}")
        matched = self._matches_with_pos(base, where).persist()
        try:
            n = matched.count()
            if n == 0:
                self._commit_vs_appends(base, "update_dv", set(), [])
                return 0
            updated = matched
            for col_name, value in set_map.items():
                updated = updated.withColumn(col_name, value)
            updated = self._conform_types(updated.select(*cols), base)
            self._validate_constraints(updated, base, "update_dv")
            self._validate_generated(
                updated, self._gen_of(base), "update_dv"
            )
            new = self._write_data(updated, self._colmap_or_none(base))
            self._dv_commit(base, "update_dv", matched, new)
            return n
        finally:
            matched.unpersist()

    def upsert(self, batch: DataFrame, key: str) -> int:
        """MERGE keyed by ``key``: batch rows replace existing rows
        with the same key, new keys append.  Only files containing a
        colliding key are rewritten.  Within-batch duplicate keys are
        collapsed (arbitrary winner) so the invariant 'one row per key
        per commit' holds.  Returns the committed version."""
        batch = batch.dropDuplicates([key])
        base = self.snapshot()
        self._refuse_identity_op(base, "upsert")
        batch = self._apply_generated(
            batch, self._gen_of(base), "upsert"
        )
        self._check_columns(batch, base, "upsert")
        # kept rows already passed at their own commit; gate the batch
        self._validate_constraints(batch, base, "upsert")
        if base is None:
            new = self._write_data(batch)
            return self._commit(
                new,
                "upsert",
                None,
                schema_json=self._schema_of(batch),
                stats=self._merged_stats(None, [], new),
            )
        cm = self._colmap_or_none(base)
        keys = F.broadcast(batch.select(key).distinct())
        candidates = self._candidate_files_for_keys(base, batch, [key])
        affected = (
            self._affected_files(
                self._scan_with_fp(
                    candidates, base.schema_json, cm, dvs=self._dvs_of(base)
                ).join(keys, key, "left_semi")
            )
            if candidates
            else []
        )
        cdf = None
        if affected:
            hit = self._read_files(
                affected, base.schema_json, cm, dvs=self._dvs_of(base)
            )
            kept = hit.join(keys, key, "left_anti")
            new_data = kept.unionByName(batch.select(*kept.columns))
            # exact CDF (r10): replaced rows are the semi-join of the
            # affected files with the batch keys (update preimages);
            # batch rows split into update postimages (key existed)
            # and plain inserts.  A no-collision upsert
            # (affected == []) needs no sidecar — its added files are
            # exactly the batch.
            replaced = hit.join(keys, key, "left_semi")
            rkeys = F.broadcast(replaced.select(key).distinct())
            b = batch.select(*kept.columns)
            cdf = self._write_cdf(
                replaced.withColumn(
                    "_change_type", F.lit("update_preimage")
                )
                .unionByName(
                    b.join(rkeys, key, "left_semi").withColumn(
                        "_change_type", F.lit("update_postimage")
                    )
                )
                .unionByName(
                    b.join(rkeys, key, "left_anti").withColumn(
                        "_change_type", F.lit("insert")
                    )
                ),
                parts=len(affected),
            )
        else:
            new_data = batch
        new = self._write_data(new_data, cm)
        return self._commit_vs_appends(
            base,
            "upsert",
            set(affected),
            new,
            cdf=cdf,
            read_files=set(candidates),
        )

    @staticmethod
    def _conform_types(
        df: DataFrame, base: "TxSnapshot", passthrough: tuple = ()
    ) -> DataFrame:
        """Cast ``df``'s columns to the manifest schema's types where
        they differ — a write whose column TYPE drifts from the
        manifest (a merge update expression CaseWhen-coerced to
        string, a replace batch built with a narrower type) would
        otherwise land parquet files every later manifest-schema read
        chokes on (the table is poisoned until a restore).  Casts run
        under the session's ANSI mode, so a genuinely unconvertible
        value fails THIS write loudly instead of corrupting the
        table (r8 review)."""
        from pyspark.sql.types import StructType

        want = StructType.fromJson(json.loads(base.schema_json))
        have = {f.name: f.dataType for f in df.schema.fields}
        out = [
            F.col(f.name).cast(f.dataType).alias(f.name)
            if have.get(f.name) != f.dataType
            else F.col(f.name)
            for f in want.fields
        ]
        out += [F.col(c) for c in passthrough if c in df.columns]
        return df.select(*out)

    @staticmethod
    def _merge_cond(cond, default: bool) -> Column:
        """Normalize a user WHEN-clause condition: None -> the clause's
        default, string -> F.expr over the t/s-aliased join, and NULL
        evaluations count as FALSE (SQL WHEN-clause semantics)."""
        if cond is None:
            return F.lit(default)
        col = F.expr(cond) if isinstance(cond, str) else cond
        return F.coalesce(col, F.lit(False))

    def _evolve_for_merge(
        self, base: TxSnapshot, source_schema, new_cols: list[str]
    ):
        """An in-memory snapshot with ``new_cols`` appended (source
        types, nullable) — add_column's metadata semantics, batched
        into the merge commit instead of one commit per column.
        Mapping rules identical: identity tables stay identity unless
        a dropped name returns; otherwise fresh ids + safe physical
        names so old files can never resurrect retired values."""
        import dataclasses

        schema = self._current_schema(base)
        needs_map = base.colmap is not None or any(
            c in base.dropped for c in new_cols
        )
        cm = retired = max_id = None
        if needs_map:
            cm, retired, max_id = self._materialized_colmap(base)
            for c in new_cols:
                max_id += 1
                cm = cm + [
                    {
                        "id": max_id,
                        "name": c,
                        "phys": self._safe_phys(c, cm, retired, max_id),
                    }
                ]
        by_name = {f.name: f for f in source_schema.fields}
        for c in new_cols:
            schema = schema.add(c, by_name[c].dataType, True)
        return dataclasses.replace(
            base,
            schema_json=json.dumps(schema.jsonValue()),
            colmap=tuple(cm) if cm is not None else base.colmap,
            retired=tuple(retired) if retired is not None else base.retired,
            max_id=max_id if max_id is not None else base.max_id,
        )

    def merge(
        self,
        source: DataFrame,
        on: "str | list[str]",
        *,
        update: "dict | str | None" = "all",
        update_condition: "Column | str | None" = None,
        delete_condition: "Column | str | None" = None,
        insert: bool = True,
        insert_condition: "Column | str | None" = None,
        extra_source_cols: "list[str] | None" = None,
        txn: str | None = None,
        mode: str = "cow",
        schema_evolution: bool = False,
    ) -> dict:
        """``MERGE INTO`` with full Delta clause semantics, the general
        form of ``upsert``:

        - ``WHEN MATCHED [AND update_condition] THEN UPDATE`` —
          ``update="all"`` replaces the row with the source row;
          a dict maps target columns to expressions; ``None`` disables
          the clause.  Evaluated FIRST among matched clauses (document
          order, like Delta's clause list).
        - ``WHEN MATCHED [AND delete_condition] THEN DELETE`` — only
          rows the update clause did not claim.  ``None`` disables.
        - ``WHEN NOT MATCHED [AND insert_condition] THEN INSERT`` —
          ``insert=False`` disables.

        Conditions and dict values are Columns or SQL strings resolved
        over the joined frame with the TARGET aliased ``t`` and the
        SOURCE aliased ``s`` (e.g. ``"s.price > t.price"``); a NULL
        condition evaluation counts as FALSE.  Matching is equality on
        ``on`` (NULL keys never match — NULL-keyed source rows insert,
        Delta parity), and a target row matched by MORE than one
        source row raises loudly when any matched clause is active
        (Delta's ambiguous-merge error; unmatched duplicate source
        rows all insert).  ``extra_source_cols`` names source columns
        that exist ONLY for clause conditions (e.g. a CDC op flag
        ``s._op = 'delete'``) — usable in every condition and update
        expression, never written to the table.

        Scale shape: only files containing a source key are rewritten
        (semi-join on broadcast batch keys, the upsert scaffold), the
        full-outer clause resolution runs over affected-files ∪ batch,
        and when no matched clause fires the affected files are
        carried BY REFERENCE and only inserts are written — cost ∝
        the batch and the slice it touches, never the table.  With
        ``txn`` the merge is exactly-once under replay (checked BEFORE
        validation, like append).  A merge that changes nothing still
        commits an empty-change version (Delta parity, predictable
        ``restore``/``history`` arithmetic).  A lost race against
        pure-append commits auto-resolves (r9, ``_commit_vs_appends``);
        any other conflict raises — the survivor list derives from the
        snapshot, so callers re-invoke (the txn tag makes that safe).

        ``schema_evolution=True`` (r9, Delta withSchemaEvolution):
        source columns missing from the table are ADDED to the schema
        in the merge commit itself — existing files read NULL in them
        (the add_column metadata mechanism, including the fresh-
        physical-name fence when a dropped name is re-added), updated
        and inserted rows carry the source values.  Off by default:
        an unexpected source column is usually a bug, and Delta makes
        the same choice.

        ``mode="dv"`` (r9) makes the matched clauses MERGE-ON-READ:
        instead of rewriting every affected file, fired
        update/delete targets are deletion-vectored in place and the
        updated images append with the inserts — cost ∝ fired rows,
        never touched-file bytes (the Delta DV merge path; a CDC
        trickle against wide files is the canonical use).  Same
        clause semantics, counts, txn replay, constraint gating and
        empty-change behavior; reclaim read-side anti-join cost with
        ``compact()``.

        Returns ``{"updated", "deleted", "inserted", "version"}``.

        Parity note: the reference's load path has no client-side
        merge — upserts were delegated to the warehouse
        (big_uery_handler.py WRITE_TRUNCATE/WRITE_APPEND targets);
        TxTable expresses the full MERGE clause matrix on plain
        parquet."""
        keys = [on] if isinstance(on, str) else list(on)
        base = self.snapshot()
        if base is None:
            raise FileNotFoundError(f"no committed version under {self.root}")
        self._refuse_identity_op(base, "merge")
        if txn is not None and txn in self._committed_txns():
            return {
                "updated": 0,
                "deleted": 0,
                "inserted": 0,
                "version": base.version,
            }
        extra = list(extra_source_cols or [])
        cols = [f["name"] for f in json.loads(base.schema_json)["fields"]]
        # clash check BEFORE _check_columns: an extra name that is also
        # a table column must raise the intended ValueError, not a
        # confusing missing-columns mismatch from the drop (ADVICE r8)
        clash = sorted(set(extra) & set(cols))
        if clash:
            raise ValueError(
                f"extra_source_cols collide with table columns: {clash}"
            )
        if schema_evolution:
            new_cols = [
                c
                for c in source.columns
                if c not in set(cols) and c not in set(extra)
            ]
            if new_cols:
                # evolve the snapshot IN MEMORY; the merge commit
                # carries the extended schema (+ colmap entries when
                # mapping is in force or a dropped name returns)
                base = self._evolve_for_merge(base, source.schema, new_cols)
                cols = [
                    f["name"]
                    for f in json.loads(base.schema_json)["fields"]
                ]
        if extra:
            missing = sorted(set(extra) - set(source.columns))
            if missing:
                raise ValueError(
                    f"extra_source_cols not in source: {missing}"
                )
            self._check_columns(source.drop(*extra), base, "merge")
        else:
            self._check_columns(source, base, "merge")
        if isinstance(update, dict):
            bad = sorted(set(update) - set(cols))
            if bad:
                raise ValueError(f"merge update targets unknown columns {bad}")
        # four consumers before the clause join materializes (key-bound
        # agg, broadcast distinct keys, ambiguity flag, the s side of
        # the full outer) — a source derived from the table itself
        # would re-run its whole lineage per job (CLAUDE.md trap).
        # No eager count (r15): the consumers run SEQUENTIALLY, so the
        # first job (the candidate-bounds agg below) materializes the
        # cache; the explicit count was one extra pass over the source.
        src = source.select(*cols, *extra).persist()
        cm = self._colmap_or_none(base)
        has_matched_clause = update is not None or delete_condition is not None
        bkeys = F.broadcast(src.select(*keys).distinct())
        candidates = self._candidate_files_for_keys(base, src, keys)
        affected = (
            self._affected_files(
                self._scan_with_fp(
                    candidates, base.schema_json, cm, dvs=self._dvs_of(base)
                ).join(bkeys, keys, "left_semi")
            )
            if candidates
            else []
        )
        dv_mode = mode == "dv" and bool(affected)
        if mode not in ("cow", "dv"):
            raise ValueError(f"merge mode must be 'cow' or 'dv', got {mode!r}")
        if dv_mode and ({"_fp", "_pos"} & set(cols)):
            raise ValueError(
                "merge mode='dv' reserves the _fp/_pos column names"
            )
        if dv_mode:
            # carry row identity through the clause join so fired
            # targets can be deletion-vectored instead of rewritten
            hit = self._scan_with_pos(affected, base.schema_json, cm)
            live = self._live_dvs(affected, self._dvs_of(base))
            if live:
                hit = self._anti_dv(hit, live)
        elif affected:
            hit = self._read_files(
                affected, base.schema_json, cm, dvs=self._dvs_of(base)
            )
        else:
            from pyspark.sql.types import StructType

            hit = self.spark.createDataFrame(
                [], StructType.fromJson(json.loads(base.schema_json))
            )
        tm, sm = "_t_marker", "_s_marker"
        while tm in cols or tm in extra:  # user column shaped like ours
            tm = "_" + tm
        while sm in cols or sm in extra:
            sm = "_" + sm
        t = hit.withColumn(tm, F.lit(True)).alias("t")
        s = src.withColumn(sm, F.lit(True)).alias("s")
        join_cond = None
        for k in keys:
            c = F.col(f"t.{k}") == F.col(f"s.{k}")
            join_cond = c if join_cond is None else (join_cond & c)
        j = t.join(s, join_cond, "full_outer")
        matched = (
            F.col(f"t.{tm}").isNotNull()
            & F.col(f"s.{sm}").isNotNull()
        )
        src_only = F.col(f"t.{tm}").isNull()
        do_update = (
            matched
            & F.lit(update is not None)
            & self._merge_cond(update_condition, True)
        )
        do_delete = (
            matched
            & ~do_update
            & F.lit(delete_condition is not None)
            & self._merge_cond(delete_condition, False)
        )
        do_insert = (
            src_only
            & F.lit(bool(insert))
            & self._merge_cond(insert_condition, True)
        )
        if update == "all" or update is None:
            upd_exprs = {c: F.col(f"s.{c}") for c in cols}
        else:
            upd_exprs = {
                k: (F.expr(v) if isinstance(v, str) else v)
                for k, v in update.items()
            }
        out_cols = [
            F.when(do_insert, F.col(f"s.{c}"))
            .when(do_update, upd_exprs.get(c, F.col(f"t.{c}")))
            .otherwise(F.col(f"t.{c}"))
            .alias(c)
            for c in cols
        ]
        keep = (matched & ~do_delete) | (~src_only & ~matched) | do_insert
        j = j.persist()
        try:
            clause_counts = [
                F.count(F.when(do_update, 1)),
                F.count(F.when(do_delete, 1)),
                F.count(F.when(do_insert, 1)),
            ]
            if affected and has_matched_clause:
                # Delta's ambiguous-merge guard (>1 source rows hitting
                # one target row has no deterministic outcome), folded
                # into the SAME aggregate job as the clause counts
                # (r15 — it was a separate scan of the affected files):
                # a batch-sized dup-key flag broadcast-joins onto the
                # persisted clause join; any matched row carrying the
                # flag is ambiguous.  The probe join exists only under
                # this agg — the result/CDF frames still read the bare
                # persisted join.
                taken = set(cols) | set(extra)
                dup_col = "_dup_src"
                while dup_col in taken:  # user column shaped like ours
                    dup_col = "_" + dup_col
                dks = []
                for i in range(len(keys)):
                    dk = f"_dk{i}"
                    while dk in taken:
                        dk = "_" + dk
                    dks.append(dk)
                dupflag = F.broadcast(
                    src.groupBy(*keys)
                    .agg((F.count(F.lit(1)) > F.lit(1)).alias(dup_col))
                    .select(
                        *[
                            F.col(k).alias(dk)
                            for k, dk in zip(keys, dks)
                        ],
                        dup_col,
                    )
                )
                dcond = None
                for k, dk in zip(keys, dks):
                    c = F.col(f"s.{k}") == F.col(dk)
                    dcond = c if dcond is None else (dcond & c)
                n_upd, n_del, n_ins, n_amb = (
                    j.join(dupflag, dcond, "left")
                    .agg(
                        *clause_counts,
                        F.count(
                            F.when(matched & F.col(dup_col), 1)
                        ),
                    )
                    .first()
                )
                if n_amb:
                    raise ValueError(
                        f"merge: {n_amb} matched pair(s) involve a "
                        "target row matched by multiple source rows; "
                        f"deduplicate the source on {keys} first "
                        "(Delta raises here too)"
                    )
            else:
                n_upd, n_del, n_ins = j.agg(*clause_counts).first()
            changed = (n_upd + n_del) > 0
            if changed and dv_mode:
                # merge-on-read: only fired rows materialize — updated
                # images + inserts append, fired targets DV out
                result = j.filter(do_insert | do_update).select(*out_cols)
            elif changed:
                result = j.filter(keep).select(*out_cols)
            else:
                # matched clauses fired nowhere: carry ALL base files by
                # reference, write only the inserts
                result = j.filter(do_insert).select(*out_cols)
            if changed or n_ins > 0:
                result = self._conform_types(result, base)
                self._validate_constraints(result, base, "merge")
                self._validate_generated(
                    result, self._gen_of(base), "merge"
                )
                new = self._write_data(result, cm)
            else:
                new = []  # empty-change version, Delta parity
            if changed and dv_mode:
                fired = j.filter(do_update | do_delete).select(
                    F.col(f"t._fp").alias("_fp"),
                    F.col(f"t._pos").alias("_pos"),
                )
                version = self._dv_commit(
                    base,
                    "merge_dv",
                    fired,
                    new,
                    txn=txn,
                    read_files=set(candidates),
                )
            else:
                cdf = None
                if changed:
                    # exact CDF (r10): the joined frame knows exactly
                    # which rows fired — preimages of updates/deletes
                    # tag 'delete', postimages of updates + inserts tag
                    # 'insert'; read_changes then skips the file diff
                    # (which would re-emit every carried-along row of
                    # the rewritten files).  Insert-only merges need no
                    # sidecar: their added files are exactly the
                    # inserts.
                    pre = j.filter(do_update | do_delete).select(
                        *[F.col(f"t.{c}").alias(c) for c in cols],
                        F.when(do_update, F.lit("update_preimage"))
                        .otherwise(F.lit("delete"))
                        .alias("_change_type"),
                    )
                    post = self._conform_types(
                        j.filter(do_update | do_insert).select(
                            *out_cols,
                            F.when(
                                do_update, F.lit("update_postimage")
                            )
                            .otherwise(F.lit("insert"))
                            .alias("_change_type"),
                        ),
                        base,
                        passthrough=("_change_type",),
                    )
                    cdf = self._write_cdf(
                        pre.unionByName(post),
                        parts=len(affected),
                    )
                version = self._commit_vs_appends(
                    base,
                    "merge",
                    set(affected) if changed else set(),
                    new,
                    txn=txn,
                    cdf=cdf,
                    read_files=set(candidates),
                )
        finally:
            j.unpersist()
            src.unpersist()
        return {
            "updated": n_upd,
            "deleted": n_del,
            "inserted": n_ins,
            "version": version,
        }

    def replace_where(
        self,
        df: DataFrame,
        where: "Column | str",
        txn: str | None = None,
    ) -> dict:
        """Delta ``replaceWhere`` — dynamic slice overwrite: atomically
        delete every row matching ``where`` and insert ``df``, in ONE
        commit.  The canonical 100 TB pattern for recomputing a
        partition (a day, a region) without touching the rest of the
        table: only files containing matching rows are rewritten (their
        non-matching rows are kept), everything else carries by
        reference, so cost ∝ the replaced slice, never the table.

        Delta parity: every incoming row must satisfy ``where`` (a row
        outside the slice would silently widen the overwrite) — rows
        where the predicate is not TRUE raise ValueError and commit
        NOTHING.  Target rows with a NULL predicate are KEPT (SQL
        DELETE semantics).  With ``txn`` the replace is exactly-once
        under replay (checked before validation).  A lost race against
        pure-append commits auto-resolves (r9); any other conflict
        raises — the survivor list derives from the snapshot; callers
        re-invoke (safe under the txn tag).

        Returns ``{"deleted", "inserted", "version"}``."""
        return self._replace_impl(df, where, txn, None)

    def replace_range(
        self,
        df: DataFrame,
        col: str,
        lo=None,
        hi=None,
        txn: str | None = None,
    ) -> dict:
        """``replace_where`` specialized to a key range (``lo <= col
        <= hi``, bounds optional like ``read_range``) — the common
        form: recompute a day/month of a time-keyed table.  The
        affected-file search opens ONLY the files whose manifest
        [min, max] for ``col`` intersects the range (manifest-level
        skipping, no footer opens outside the slice), so on a
        date-clustered 100 TB table the whole operation — search,
        rewrite, commit — costs one slice, not one table.  The generic
        ``replace_where`` must scan every file's ``col`` column to
        locate matches (predicate pushdown makes that cheap, but it is
        still O(files)); use this form whenever the slice is a range
        on a ``stats_cols`` column."""
        if lo is None and hi is None:
            raise ValueError("replace_range needs at least one bound")
        pred = F.lit(True)
        if lo is not None:
            pred = F.col(col) >= F.lit(lo)
        if hi is not None:
            pred = pred & (F.col(col) <= F.lit(hi))
        base = self.snapshot()
        if base is None:
            raise FileNotFoundError(f"no committed version under {self.root}")
        candidates = self.files_in_range(col, lo, hi, snap=base)
        return self._replace_impl(df, pred, txn, candidates, base=base)

    def _replace_impl(
        self,
        df: DataFrame,
        where: "Column | str",
        txn: str | None,
        candidates: list[str] | None,
        base: "TxSnapshot | None" = None,
    ) -> dict:
        pred = F.expr(where) if isinstance(where, str) else where
        if base is None:
            base = self.snapshot()
        if base is None:
            raise FileNotFoundError(f"no committed version under {self.root}")
        self._refuse_identity_op(base, "replace_where")
        if txn is not None and txn in self._committed_txns():
            return {"deleted": 0, "inserted": 0, "version": base.version}
        df = self._apply_generated(
            df, self._gen_of(base), "replace_where"
        )
        self._check_columns(df, base, "replace_where")
        df = self._conform_types(df, base)
        n_ins, n_outside = df.agg(
            F.count(F.lit(1)),
            F.count(F.when(~F.coalesce(pred, F.lit(False)), 1)),
        ).first()
        if n_outside:
            raise ValueError(
                f"replace_where: {n_outside} incoming row(s) do not "
                "satisfy the predicate; Delta rejects these too "
                "(they would silently widen the overwrite)"
            )
        self._validate_constraints(df, base, "replace_where")
        cm = self._colmap_or_none(base)
        search = base.files if candidates is None else candidates
        affected = (
            self._affected_files(
                self._scan_with_fp(
                    search, base.schema_json, cm, dvs=self._dvs_of(base)
                ).filter(pred)
            )
            if search
            else []
        )
        cdf = None
        hit = None
        try:
            if affected:
                # r15 (guide §1.4/§5): the replaced slice used to be
                # re-scanned three times (delete count, CDF preimages,
                # the kept-rows rewrite) — persist it once and let the
                # count ride the rewrite job via ``observe`` (below the
                # kept-filter, so filtered-out matches still count).
                hit = self._read_files(
                    affected, base.schema_json, cm, dvs=self._dvs_of(base)
                ).persist()
                obs = Observation()
                kept = hit.observe(
                    obs, F.count(F.when(pred, 1)).alias("n")
                ).filter(~pred.eqNullSafe(F.lit(True)))
                new_data = kept.unionByName(df)
                # exact CDF (r10): the replaced slice's rows tag
                # 'delete', the incoming frame tags 'insert' — the
                # rewritten files' kept rows never re-emit.  A
                # no-overlap replace (affected == []) needs no sidecar:
                # added files == df.
                cdf = self._write_cdf(
                    hit.filter(pred)
                    .withColumn("_change_type", F.lit("delete"))
                    .unionByName(
                        df.withColumn("_change_type", F.lit("insert"))
                    ),
                    parts=len(affected),
                )
            else:
                new_data = df
            new = (
                self._write_data(new_data, cm) if (affected or n_ins) else []
            )
            n_del = int(obs.get["n"] or 0) if affected else 0
            version = self._commit_vs_appends(
                base,
                "replace_where",
                set(affected),
                new,
                txn=txn,
                cdf=cdf,
                read_files=set(search),
            )
        finally:
            if hit is not None:
                hit.unpersist()
        return {"deleted": n_del, "inserted": n_ins, "version": version}

    def _zorder_key(self, df: DataFrame, cols: list[str], bits: int = 6):
        """Morton (interleaved-bit) key over quantile-binned numeric
        columns — Delta OPTIMIZE ZORDER's multi-dimensional curve.
        Each column is first binned by its own approx quantiles
        (skew-resistant: uniform BIN occupancy whatever the value
        distribution), then bit ``i`` of every column's bin index is
        interleaved into position ``i*len(cols)+ci`` of the key, so
        files sorted by the key own small hyper-rectangles of the key
        SPACE and min/max stats prune on EVERY clustered column, not
        just the leading one.

        Boundaries come from one approxQuantile pass (driver-side
        (2**bits-1) doubles per column — metadata-sized) and are
        compiled into a BALANCED ``when`` tree: ``bits`` comparisons
        per row along one root-to-leaf path, not a linear scan of all
        2**bits-1 boundaries (a fold over the boundary array measured
        ~30x slower at bits=8 — the array fold evaluates every
        element).  Numeric, date and timestamp columns (temporal
        columns bin on their epoch number — days for DATE, seconds
        for TIMESTAMP/_NTZ; a date cluster key is the overwhelmingly
        common case).  Default 6 bits = 64 quantile bins per column:
        granularity comfortably above any realistic output-file count
        per dimension, while the boundary summaries (approxQuantile
        error scales with bin count) and the compiled search trees
        stay cheap — bits=8 measured 4-5x slower for no extra
        pruning at these file counts."""

        def as_num(c) -> Column:
            # numeric view of a clusterable column (temporal -> epoch;
            # TIMESTAMP_NTZ has no direct long cast: hop via timestamp,
            # identity under the UTC session)
            t = df.schema[c].dataType.simpleString()
            col = F.col(c)
            if t == "date":
                return F.datediff(col, F.lit("1970-01-01").cast("date"))
            if t.startswith("timestamp"):  # timestamp / timestamp_ntz
                return col.cast("timestamp").cast("long")
            return col.cast("double")

        def search(num, bounds, lo, hi):
            # expression for |{b in bounds[lo:hi) : x >= b}| + lo,
            # i.e. the bin index, via binary search
            if lo == hi:
                return F.lit(lo)
            mid = (lo + hi) // 2
            return F.when(
                num >= bounds[mid],
                search(num, bounds, mid + 1, hi),
            ).otherwise(search(num, bounds, lo, mid))

        n_bins = 1 << bits
        probs = [i / n_bins for i in range(1, n_bins)]
        # ONE pass for every column's boundaries (per-column calls
        # re-scan the table each time: 2x wall at 2 columns); quantiles
        # run over the numeric views so temporal columns work too
        qcols = [f"_zq{ci}" for ci in range(len(cols))]
        num_exprs = {c: as_num(c).cast("double") for c in cols}
        qdf = df.select(
            *[num_exprs[c].alias(q) for c, q in zip(cols, qcols)]
        )
        all_bounds = qdf.approxQuantile(qcols, probs, 1.0 / (4 * n_bins))
        key = F.lit(0).cast("long")
        for ci, c in enumerate(cols):
            bounds = all_bounds[ci]
            bin_ = search(num_exprs[c], bounds, 0, len(bounds)).cast("long")
            for i in range(bits):
                key = key + F.shiftleft(
                    F.shiftright(bin_, i).bitwiseAND(F.lit(1)),
                    i * len(cols) + ci,
                )
        return key

    # ------------------------------------------------ partition spec

    @staticmethod
    def _path_partition_values(path: str, cols: list) -> "dict | None":
        """Parse the ``__txp_<col>=<value>`` path segments the
        partitioned writer embeds.  Values come back as the STRINGS
        Spark wrote (ints/dates serialize canonically; %-escapes are
        unquoted); None for the Hive null marker.  Returns None when
        any segment is absent (not a partitioned-layout file)."""
        from urllib.parse import unquote

        segs = path.split(os.sep)
        out = {}
        for c in cols:
            pref = f"__txp_{c}="
            seg = next((s for s in segs if s.startswith(pref)), None)
            if seg is None:
                return None
            raw = unquote(seg[len(pref):])
            out[c] = None if raw == "__HIVE_DEFAULT_PARTITION__" else raw
        return out

    def _partition_filter(
        self, partition: dict, base: "TxSnapshot | None" = None
    ) -> dict:
        """Validate a ``{col: value}`` maintenance scope against the
        table's spec.  Values match by their canonical string form
        (what Spark wrote into the path): str/int/date round-trip
        exactly; None selects the null partition."""
        spec = self._partition_spec(base)
        if not spec:
            raise ValueError(
                f"table {self.root} has no partition spec; "
                "create(partition_by=...) declares one"
            )
        bad = sorted(set(partition) - set(spec))
        if bad:
            raise ValueError(
                f"unknown partition column(s) {bad}; spec is {spec}"
            )
        return dict(partition)

    def _file_in_partition(self, path: str, partition: dict) -> bool:
        vals = self._path_partition_values(path, list(partition))
        if vals is None:
            return False
        for c, want in partition.items():
            got = vals[c]
            if want is None:
                if got is not None:
                    return False
            elif got is None or str(want) != got:
                return False
        return True

    def partitions(self) -> list[dict]:
        """Distinct partition value tuples of the head snapshot with
        file/row counts — METADATA-only (parsed from file paths +
        manifest stats, no data scan), the operational listing that
        scopes maintenance windows (``compact(partition=...)``,
        ``vacuum(partition=...)``).  Values are the canonical strings
        the writer embedded in paths."""
        base = self._head()
        spec = self._partition_spec(base)
        if not spec:
            raise ValueError(f"table {self.root} has no partition spec")
        agg: dict = {}
        for f in base.files:
            vals = self._path_partition_values(f, spec)
            key = (
                tuple(sorted(vals.items())) if vals is not None else None
            )
            e = agg.setdefault(key, {"n_files": 0, "n_rows": 0})
            e["n_files"] += 1
            st = (base.stats or {}).get(f)
            if e["n_rows"] is not None and st and st.get("rows") is not None:
                e["n_rows"] += st["rows"]
            else:
                e["n_rows"] = None  # unknown for any file -> unknown
        out = []

        def _order(k):  # None (unknown layout) last; null values last
            if k is None:
                return (1, [])
            return (0, [(c, v is None, v or "") for c, v in k])

        for key in sorted(agg, key=_order):
            vals = dict(key) if key is not None else {c: None for c in spec}
            out.append({**{c: vals.get(c) for c in spec}, **agg[key]})
        return out

    def maintain(self, policy: dict) -> dict:
        """Policy-driven maintenance in ONE call (r13, VERDICT r12
        #4): "compact partitions whose small-file count exceeds N"
        as a scheduled job instead of hand-rolled loops.  The
        qualification pass is METADATA-only — partitions, file
        counts and per-file sizes come from the head manifest and
        path parsing, never a data scan — so deciding costs O(files
        in the manifest) and the work done is ∝ the qualifying
        fragmentation, the same scaling contract as each underlying
        op.  Policy keys (each optional, applied in this order —
        compaction first so purge/vacuum can reclaim what it
        strands):

        - ``compact``: ``{"min_files": N, **compact_kwargs}`` —
          compact every partition holding >= N files (whole table
          when unpartitioned).  Partition scoping reuses
          ``compact(partition=...)``; other keys pass through
          (``target_bytes``, ``cluster_by``, ...).
        - ``purge_dvs``: kwargs for ``purge_dvs`` (rewrite files
          whose deleted fraction crossed the threshold).
        - ``vacuum``: kwargs for ``vacuum`` (GC unreferenced files
          past the retention horizon).

        Returns a report: ``{"compacted": [partition dicts],
        "purged": version|None, "vacuumed": [paths]}``."""
        known = {"compact", "purge_dvs", "vacuum"}
        bad = sorted(set(policy) - known)
        if bad:
            raise ValueError(
                f"unknown maintain policy key(s) {bad}; known: "
                f"{sorted(known)}"
            )
        report: dict = {"compacted": [], "purged": None, "vacuumed": []}
        cpol = dict(policy.get("compact") or {})
        if cpol:
            min_files = int(cpol.pop("min_files", 2))
            base = self._head()
            spec = self._partition_spec(base)
            if spec:
                counts: dict = {}
                for f in base.files:
                    vals = self._path_partition_values(f, spec)
                    key = (
                        tuple(vals[c] for c in spec)
                        if vals is not None
                        else None
                    )
                    counts[key] = counts.get(key, 0) + 1
                for key in sorted(
                    (k for k in counts if k is not None),
                    key=lambda k: [(v is None, v or "") for v in k],
                ):
                    if counts[key] >= min_files:
                        part = dict(zip(spec, key))
                        self.compact(partition=part, **cpol)
                        report["compacted"].append(part)
            elif len(base.files) >= min_files:
                self.compact(**cpol)
                report["compacted"].append({})
        if "purge_dvs" in policy:
            before = self._head().version
            v = self.purge_dvs(**(policy["purge_dvs"] or {}))
            report["purged"] = v if v != before else None
        if "vacuum" in policy:
            report["vacuumed"] = list(
                self.vacuum(**(policy["vacuum"] or {}))
            )
        return report

    def compact(
        self,
        target_bytes: int = 128 << 20,
        small_frac: float = 0.5,
        cluster_by: list[str] | None = None,
        zorder: bool = False,
        partition: dict | None = None,
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

        ``cluster_by``: Delta OPTIMIZE ZORDER's one-dimensional
        sibling — range-repartition + sort the rewritten rows on the
        given columns, so each output file owns a narrow, disjoint
        key range.  Because manifests record per-file min/max for
        ``stats_cols``, clustering is what turns those stats into
        actual pruning: ``read_range`` on a clustered key opens ~1
        file instead of all of them (append order scatters every key
        range across every file).  Clustering rewrites ALL data files
        (a sort is global), so run it on the cadence of range-query
        value, not every commit.

        ``zorder=True`` (with >=2 numeric ``cluster_by`` columns)
        clusters on the Morton curve of the columns instead of their
        lexicographic order: lexicographic clustering prunes only the
        LEADING column (every file spans the full range of the
        second), the z-curve gives every clustered column partial
        pruning — the right trade when range queries hit more than
        one key (see ``_zorder_key``).

        File sizes come from a driver-side stat of the manifest's file
        list — metadata-sized, like the manifest itself; a real log
        store records sizes in the manifest and skips the stat.

        Content-neutral, so a lost manifest race retries the whole
        rewrite against the fresh snapshot (orphaned data files from
        the lost attempt are vacuum's job, same as any dead version).

        ``partition`` (r12): scope the rewrite to one partition of a
        partitioned table (``{col: value}``, a subset of the spec
        columns) — files outside it carry by reference untouched, so
        maintenance runs per partition window as PLANS.md's z-order
        row prescribes, instead of whole-table.  Composes with
        ``cluster_by`` (clustering WITHIN the partition).
        """
        for attempt in range(3):
            try:
                return self._compact_once(
                    target_bytes, small_frac, cluster_by, zorder, partition
                )
            except TxConflictError:
                if attempt == 2:
                    raise

    def _compact_once(
        self,
        target_bytes: int,
        small_frac: float,
        cluster_by: list[str] | None,
        zorder: bool = False,
        partition: dict | None = None,
    ) -> int:
        base = self.snapshot()
        if base is None:
            raise FileNotFoundError(f"no committed version under {self.root}")
        if not base.files:
            # trivial-table guard (ADVICE r4): nothing to rewrite, and
            # _read_files([]) would raise on a pathless scan
            return base.version
        cm = self._colmap_or_none(base)
        scope = list(base.files)
        out_of_scope: list[str] = []
        if partition is not None:
            pf = self._partition_filter(partition, base)
            scope = [f for f in base.files if self._file_in_partition(f, pf)]
            out_of_scope = [f for f in base.files if f not in set(scope)]
            if not scope:
                return base.version  # empty partition: nothing to do
        if cluster_by:
            total = sum(os.path.getsize(f) for f in scope)
            n_out = max(1, -(-total // target_bytes))  # ceil
            full = self._read_files(
                scope, base.schema_json, cm, dvs=self._dvs_of(base)
            )
            if zorder and len(cluster_by) >= 2:
                keyed = full.withColumn(
                    "_zk", self._zorder_key(full, cluster_by)
                )
                packed = (
                    keyed.repartitionByRange(n_out, "_zk")
                    .sortWithinPartitions("_zk")
                    .drop("_zk")
                )
            else:
                packed = full.repartitionByRange(
                    n_out, *cluster_by
                ).sortWithinPartitions(*cluster_by)
            survivors: list[str] = out_of_scope
            small = scope
        else:
            small = [
                f
                for f in scope
                if os.path.getsize(f) < target_bytes * small_frac
            ]
            if len(small) < 2:
                return base.version  # nothing to coalesce
            total = sum(os.path.getsize(f) for f in small)
            n_out = max(1, -(-total // target_bytes))  # ceil
            packed = self._read_files(
                small, base.schema_json, cm, dvs=self._dvs_of(base)
            )
            spec = self._partition_spec(base)
            if spec is None or (
                partition is not None and set(partition) == set(spec)
            ):
                # unpartitioned, or scoped to ONE fully-named
                # partition (single value): free repartition keeps the
                # target output sizing
                packed = packed.repartition(n_out)
            else:
                # partitioned but spanning values: repartition ON the
                # spec so the partitionBy writer emits ~one file per
                # value instead of n_out x values
                packed = packed.repartition(
                    n_out, *[F.col(c) for c in spec]
                )
            survivors = [f for f in base.files if f not in set(small)]
        # arrange=False: compact already shaped the frame (cluster
        # order / output sizing); the writer's partitionBy alone
        # enforces file-per-value on partitioned tables
        new = self._write_data(packed, cm, arrange=False)
        return self._commit(
            survivors + new,
            "compact",
            base,
            schema_json=base.schema_json,
            stats=self._merged_stats(base, survivors, new, cm),
        )

    def purge_dvs(self, min_deleted_frac: float = 0.05) -> int:
        """``REORG TABLE ... APPLY (PURGE)`` (Delta parity): rewrite
        ONLY the files whose deletion-vector fraction reaches
        ``min_deleted_frac``, materializing their deletes and retiring
        their vectors — the incremental reclaim of the DV read-side
        anti-join.  Cost ∝ dirty files, never the table: clean files
        and lightly-vectored files carry by reference untouched
        (contrast ``compact``, which targets file SIZE).  Dead-row
        counts come from one scan of the sidecars (metadata-sized:
        deleted rows only); per-file totals from manifest stats when
        present, else a driver footer read.  Returns the committed
        version (unchanged when nothing crosses the threshold —
        maintenance no-op, like compact)."""
        base = self._head()
        dvs = self._dvs_of(base)
        if not dvs:
            return base.version
        from urllib.parse import unquote

        paths = sorted({p for v in dvs.values() for p in v})
        # sidecar 'file' values are URI-encoded; the dvs dict keys are
        # raw manifest paths — decode at the boundary or escaped-path
        # files never cross the purge threshold
        dead = {
            unquote(r.file): r.dead
            for r in self.spark.read.schema(_DV_SCHEMA)
            .parquet(*paths)
            .groupBy("file")
            .agg(F.count_distinct("pos").alias("dead"))
            .collect()
        }

        def total_rows(f: str) -> int:
            st = (base.stats or {}).get(f)
            if st and st.get("rows"):
                return st["rows"]
            import pyarrow.parquet as pq

            return pq.ParquetFile(f).metadata.num_rows

        affected = sorted(
            f
            for f in dvs
            if f in dead
            and total_rows(f) > 0
            and dead[f] / total_rows(f) >= min_deleted_frac
        )
        if not affected:
            return base.version
        cm = self._colmap_or_none(base)
        rewritten = self._read_files(
            affected, base.schema_json, cm, dvs=dvs
        )
        new = self._write_data(rewritten, cm)
        # purge reads only the files it rewrites — a racer touching
        # OTHER files rebases cleanly (disjoint-rewrite admission)
        return self._commit_vs_appends(
            base, "purge", set(affected), new, read_files=set(affected)
        )

    # ------------------------------------------------------- cleanup

    def repartitioned_to(
        self, dest: str, partition_by: list[str] | None
    ) -> "TxTable":
        """Partition-spec CHANGE path — the r13 decision (VERDICT r12
        #7): the spec stays IMMUTABLE on a live table, Delta parity.
        Iceberg-style spec versioning (per-file spec ids, pruning
        consulting every historical spec) was considered and
        declined: this engine's partition pruning IS stats pruning,
        so a spec change without a rewrite buys nothing — old files
        keep their old stats tags and prune exactly as well as before,
        and the ONLY thing a new spec changes is the layout of future
        files, which is better served by an explicit rewrite whose
        cost (∝ table) is stated up front rather than hidden behind a
        metadata call.

        So: one head read, one write under the NEW spec into a fresh
        root.  Carries the schema, stats policy (old spec columns
        stay stats-tagged — their pruning value survives the change),
        CHECK constraints and generation expressions; DVs are
        materialized by the rewrite.  Refuses identity tables
        (GENERATED ALWAYS ids cannot be re-provided to a fresh
        create; ``clone_to`` keeps the spec AND the watermark for
        those) and an already-existing destination.  The source is
        untouched — swap roots at the catalog layer when ready.

        ``partition_by=None`` removes the spec (repartition to an
        unpartitioned layout)."""
        base = self._head()
        if base.identity:
            raise ValueError(
                f"repartitioned_to cannot rebuild identity column "
                f"{base.identity['col']!r} (GENERATED ALWAYS); use "
                "clone_to (keeps spec + watermark)"
            )
        if self.is_table(dest):
            raise ValueError(
                f"repartition target {dest} is already a TxTable; "
                "choose a fresh root"
            )
        stats = list(
            dict.fromkeys(
                list(base.stats_cols or self.stats_cols or [])
                + list(partition_by or [])
            )
        )
        out = TxTable.create(
            self.spark,
            dest,
            self.read(),
            stats_cols=stats or None,
            generated=dict(base.generated) if base.generated else None,
            partition_by=list(partition_by) if partition_by else None,
        )
        for name, expr in (base.constraints or {}).items():
            out.add_constraint(name, expr)
        return out

    def clone_to(self, new_root: str) -> "TxTable":
        """SHALLOW CLONE (Delta parity): a new, independently-evolving
        table whose v1 manifest references the SOURCE's current data
        files BY PATH — metadata-sized at any table scale (one
        manifest write, zero data copied).  The clone carries the
        source head's schema, per-file stats, column mapping (+
        retired physical names, so a re-add in the clone can never
        alias an old source file's column), CHECK constraints and
        stats policy; its version history starts fresh at v1.  Writes
        to the clone copy-on-write into the CLONE's own data
        directory — the source is never touched — and the clone's
        ``vacuum`` only walks the clone's data dir, so it cannot GC
        source files.  The shared-fate hazard in the other direction
        (source ``vacuum`` GC-ing files the clone still references —
        silent data loss in Delta) is GUARDED here (r9): every clone
        drops a marker under the source's log dir, and the source's
        ``vacuum`` refuses to delete a file a live clone references
        unless forced — ``compact()`` the clone to re-materialize it
        onto its own files first.  Typical uses: zero-cost dev/test
        copies of a production table and short-lived experiment
        branches.

        Refuses a ``new_root`` that is already a table (cloning over
        history would orphan it silently)."""
        base = self._head()
        if self.is_table(new_root):
            raise ValueError(
                f"clone target {new_root} is already a TxTable; "
                "choose a fresh root"
            )
        # the COMMITTED policy (base.stats_cols) wins: a stats-opt-out
        # handle (stats_cols=[]) must still carry the table property
        # into the clone's first manifest (ADVICE r8).
        clone_stats = (
            list(base.stats_cols)
            if base.stats_cols
            else (list(self.stats_cols) if self.stats_cols else None)
        )
        out = TxTable(self.spark, new_root, stats_cols=clone_stats)
        if base.partition_by:
            # the spec rides _commit's create-path resolution (r12);
            # cloned file paths already embed the __txp_ segments
            out._create_partition_by = list(base.partition_by)
        if base.identity:
            # the clone starts at the source's watermark — ids keep
            # advancing, never collide with cloned rows
            out._create_identity = dict(base.identity)
        cm, retired, max_id = (
            (list(base.colmap), list(base.retired), base.max_id)
            if base.colmap is not None
            else (None, None, None)
        )
        out._commit(
            list(base.files),
            "clone",
            None,
            schema_json=base.schema_json,
            stats=dict(base.stats) if base.stats else None,
            dropped=list(base.dropped),
            colmap=cm,
            retired=retired,
            max_id=max_id,
            constraints=(
                dict(base.constraints) if base.constraints else None
            ),
            generated=(
                dict(base.generated) if base.generated else None
            ),
            dvs=self._dvs_of(base) or {},
        )
        # register the clone with the SOURCE so vacuum can see it:
        # one marker file per clone (append-only, race-free)
        cdir = os.path.join(self.log_dir, _CLONES_DIR)
        os.makedirs(cdir, exist_ok=True)
        with open(os.path.join(cdir, f"{uuid.uuid4().hex}.json"), "w") as f:
            json.dump({"root": out.root}, f)
        return out

    def _clone_roots(self) -> list[str]:
        """Roots of clones registered against this table, pruning
        markers whose clone no longer exists (deleted from disk)."""
        cdir = os.path.join(self.log_dir, _CLONES_DIR)
        if not os.path.isdir(cdir):
            return []
        roots = []
        for name in sorted(os.listdir(cdir)):
            path = os.path.join(cdir, name)
            try:
                with open(path) as f:
                    root = json.load(f)["root"]
            except (OSError, ValueError, KeyError):
                continue
            if self.is_table(root):
                roots.append(root)
            else:
                try:  # stale marker: the clone was deleted
                    os.unlink(path)
                except OSError:
                    pass
        return roots

    def vacuum(
        self,
        retain: int = 1,
        min_age_seconds: float = 3600.0,
        force: bool = False,
        retain_hours: float | None = None,
        partition: dict | None = None,
    ) -> list[str]:
        """Delete data files unreferenced by the newest ``retain``
        manifests and drop older manifests.  ``retain_hours`` (r10)
        adds a TIME window: every manifest whose commit timestamp is
        within the last ``retain_hours`` is ALSO kept (union with the
        count — "keep 7 days" composes with "keep at least N").
        Commit timestamps are monotone over versions, so both criteria
        select a contiguous log suffix.  Crash-orphaned commit
        directories (written but never referenced) go too — but only
        once older than ``min_age_seconds`` (dir mtime): every writer
        stages its data directory BEFORE linking the manifest, so an
        unreferenced young directory may be a concurrent writer's
        in-flight commit, and deleting it would let that writer link a
        manifest referencing vanished files.  The age threshold is the
        same defense Delta VACUUM's retention window provides; pass
        ``min_age_seconds=0`` only when no writer can be concurrent.
        Dropping a manifest forgets its txn tag, so keep ``retain``
        larger than any writer's possible replay horizon (the same
        contract Delta VACUUM has with idempotent-writer history).

        Clone guard (r9): a file still referenced by a LIVE registered
        shallow clone (``clone_to``'s marker registry) refuses to be
        deleted — TxCloneFateError names the clone; ``force=True``
        overrides (the Delta behavior, where this is silent data
        loss).  ``compact()`` the clone to re-materialize it onto its
        own files, or delete the clone, then vacuum.

        ``partition`` (r12): bound THIS pass's file deletion to one
        partition of a partitioned table — the per-window maintenance
        shape.  Manifest retention stays table-global (the log is one
        sequence); files of other partitions left behind stay
        unreferenced and any later (unscoped or differently-scoped)
        vacuum collects them."""
        import shutil
        import time

        pf = (
            self._partition_filter(partition)
            if partition is not None
            else None
        )
        versions = self._versions()
        if not versions:
            return []
        keep_versions = versions[-retain:]
        if retain_hours is not None:
            cutoff = (time.time() - retain_hours * 3600.0) * 1_000_000
            kept = set(keep_versions)
            idx = txlog.read_index(self.log_dir, versions)
            for v in versions:
                if v in kept:
                    continue
                ts = idx.get(v, {}).get("ts")
                if ts is not None and ts >= cutoff:
                    kept.add(v)
            keep_versions = sorted(kept)
        # r11 log-checkpoint invariant: the oldest RETAINED manifest
        # must be self-contained BEFORE its ancestors are unlinked, or
        # later delta-form manifests could not reconstruct.  Atomic
        # (os.replace); a crash right after still leaves a valid log.
        txlog.materialize_boundary(self.log_dir, keep_versions[0])
        referenced: set[str] = set()
        for _, m in txlog.iter_manifests(self.log_dir, keep_versions):
            referenced.update(m["files"])
            for dv_paths in (m.get("dvs") or {}).values():
                referenced.update(dv_paths)
            referenced.update(m.get("cdf") or [])
        clone_refs: dict[str, str] = {}  # file -> clone root holding it
        if not force:
            for croot in self._clone_roots():
                clone = TxTable(self.spark, croot)
                for _, cman in txlog.iter_manifests(
                    clone.log_dir, clone._versions()
                ):
                    for fp in cman["files"]:
                        clone_refs.setdefault(fp, croot)
                    for dvp in (cman.get("dvs") or {}).values():
                        for fp in dvp:
                            clone_refs.setdefault(fp, croot)
                    for fp in cman.get("cdf") or []:
                        clone_refs.setdefault(fp, croot)
        now = time.time()
        removed: list[str] = []
        doomed: list[tuple[str, set[str]]] = []
        if os.path.isdir(self.data_dir):
            for commit_dir in os.listdir(self.data_dir):
                cdir = os.path.join(self.data_dir, commit_dir)
                # recursive: partitioned commit dirs nest files under
                # __txp_<col>=<value>/ segments
                members = {
                    os.path.join(dp, n)
                    for dp, _dirs, names in os.walk(cdir)
                    for n in names
                    if n.endswith(".parquet")
                }
                if members and not (members & referenced):
                    held = members & set(clone_refs)
                    if held:
                        # refuse BEFORE deleting anything: a partial
                        # vacuum that already broke other dirs would
                        # make the guard pointless
                        fp = sorted(held)[0]
                        raise TxCloneFateError(
                            f"vacuum of {self.root} would delete "
                            f"{len(held)} file(s) still referenced by "
                            f"shallow clone {clone_refs[fp]} (e.g. {fp})"
                            " — compact() or drop the clone first, or "
                            "pass force=True to accept breaking it"
                        )
                    try:
                        age = now - os.path.getmtime(cdir)
                    except OSError:
                        continue  # raced with its own writer/cleaner
                    if age < min_age_seconds:
                        continue  # possibly a staged-but-uncommitted write
                    if pf is not None:
                        matching = {
                            m
                            for m in members
                            if self._file_in_partition(m, pf)
                        }
                        if not matching:
                            continue  # out of this pass's window
                        if matching != members:
                            # mixed-partition commit dir: delete only
                            # the in-scope files; the dir (and the
                            # rest) falls to a later pass
                            doomed.append((None, matching))
                            continue
                    doomed.append((cdir, members))
        for cdir, members in doomed:
            if cdir is None:
                for m in sorted(members):
                    try:
                        os.unlink(m)
                    except OSError:
                        continue
            else:
                shutil.rmtree(cdir)
            removed.extend(sorted(members))
        keep_set = set(keep_versions)
        for v in versions:
            if v not in keep_set:
                os.unlink(os.path.join(self.log_dir, _manifest_name(v)))
        # index hygiene: drop lines for unlinked versions (harmless
        # but unbounded otherwise); survivors re-heal on demand
        txlog.compact_index(self.log_dir, keep_versions)
        return removed
