"""Incremental materialized-view maintenance over a TxTable source.

The pattern that keeps a 100 TB fact table's rollups fresh without
rescanning it: the view is itself a TxTable holding a mergeable
aggregate (COUNT + exact DECIMAL SUMs), and ``refresh()`` folds in
only the source commits that arrived since the last refresh — cost
∝ delta + |distinct keys|, never ∝ source.

Replicates the scale shape of the reference's reporting layer (daily
BigQuery aggregate queries over an append-loaded table,
big_uery_handler.py:100-140): there, every report re-scans; here, the
refresher consumes the change feed.

Exactly-once by construction: the merged state and the source version
it reflects commit in ONE manifest (``TxTable.overwrite(txn=...)``),
so a crash-and-replay either sees the tag and no-ops or redoes the
whole merge from the same inputs — the state can never reflect a
half-applied delta, and there is no sidecar watermark to drift.

Only mergeable aggregates are maintained: count/sum always, min/max
optionally (sound here because the incremental least/greatest merge
is only taken on the append-only fast path; deletes force the full
recompute that re-derives them — see the class docstring).
Incremental consumption assumes append-only history; any non-append
commit (upsert/update/compact-with-changes) since the last refresh
triggers a full recompute — detected from the op column of the
manifests, metadata-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .txtable import TxTable

_TXN_PREFIX = "matview@"
# append-only ops whose delta files are safe to fold in incrementally;
# "compact" is content-neutral but rewrites files, so read_since would
# re-surface old rows — treat it as non-incremental too.
_INCREMENTAL_OPS = {"append"}


class MatView:
    """``keys``-grouped COUNT(*) + exact DECIMAL SUMs of ``sum_cols``
    (plus optional ``min_cols``/``max_cols``) over the TxTable at
    ``src_root``, materialized as the TxTable at ``mv_root``.  Column
    layout: keys, ``n_rows``, ``sum_<col>`` as DECIMAL(28, scale)
    (exact and associative, so incremental merge order cannot change a
    single bit — the dsum discipline), ``min_<col>``/``max_<col>``
    verbatim-typed.

    min/max are SOUND in this refresher even though they are not
    invertible under deletes: the incremental least/greatest merge is
    only taken on the append-only fast path (``_all_appends_since``),
    and any rewrite op in the history forces the full recompute, which
    re-derives them from scratch."""

    def __init__(
        self,
        spark: SparkSession,
        src_root: str,
        mv_root: str,
        keys: list[str],
        sum_cols: list[str],
        scale: int = 2,
        min_cols: list[str] | None = None,
        max_cols: list[str] | None = None,
    ):
        self.spark = spark
        self.src = TxTable(spark, src_root)
        self.mv = TxTable(spark, mv_root, stats_cols=None)
        self.keys = list(keys)
        self.sum_cols = list(sum_cols)
        self.scale = scale
        self.min_cols = list(min_cols or [])
        self.max_cols = list(max_cols or [])

    # ------------------------------------------------------- internals

    def _partial(self, df: DataFrame) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("n_rows")] + [
            F.sum(F.col(c).cast(f"decimal(18,{self.scale})"))
            .cast(f"decimal(28,{self.scale})")
            .alias(f"sum_{c}")
            for c in self.sum_cols
        ]
        aggs += [F.min(c).alias(f"min_{c}") for c in self.min_cols]
        aggs += [F.max(c).alias(f"max_{c}") for c in self.max_cols]
        return df.groupBy(*self.keys).agg(*aggs)

    def _merge(self, state: DataFrame, partial: DataFrame) -> DataFrame:
        m, d = state.alias("m"), partial.alias("d")
        zero = F.lit(0).cast(f"decimal(28,{self.scale})")
        cols = [F.col(k) for k in self.keys] + [
            (
                F.coalesce(F.col("m.n_rows"), F.lit(0))
                + F.coalesce(F.col("d.n_rows"), F.lit(0))
            ).alias("n_rows")
        ]
        for c in self.sum_cols:
            cols.append(
                (
                    F.coalesce(F.col(f"m.sum_{c}"), zero)
                    + F.coalesce(F.col(f"d.sum_{c}"), zero)
                )
                .cast(f"decimal(28,{self.scale})")
                .alias(f"sum_{c}")
            )
        for c in self.min_cols:  # NULL side -> other side (coalesce)
            cols.append(
                F.coalesce(
                    F.least(F.col(f"m.min_{c}"), F.col(f"d.min_{c}")),
                    F.col(f"m.min_{c}"),
                    F.col(f"d.min_{c}"),
                ).alias(f"min_{c}")
            )
        for c in self.max_cols:
            cols.append(
                F.coalesce(
                    F.greatest(F.col(f"m.max_{c}"), F.col(f"d.max_{c}")),
                    F.col(f"m.max_{c}"),
                    F.col(f"d.max_{c}"),
                ).alias(f"max_{c}")
            )
        return m.join(d, on=self.keys, how="full_outer").select(*cols)

    @staticmethod
    def _applied_of(snap) -> int | None:
        if snap is None or not (snap.txn or "").startswith(_TXN_PREFIX):
            return None
        return int(snap.txn[len(_TXN_PREFIX):])

    def applied_version(self) -> int | None:
        """Source version the view currently reflects (None = never
        built).  Read from the view's own commit tag — no sidecar."""
        if not TxTable.is_table(self.mv.root):
            return None
        return self._applied_of(self.mv.snapshot())

    def _all_appends_since(self, applied: int, current: int) -> bool:
        try:
            return all(
                self.src.snapshot(v).op in _INCREMENTAL_OPS
                for v in range(applied + 1, current + 1)
            )
        except FileNotFoundError:  # intermediate manifest vacuumed
            return False

    # --------------------------------------------------------- public

    def refresh(self) -> int:
        """Bring the view up to the source's newest version; returns
        that version.  No-op when already current (and when a crashed
        refresh already committed — the txn tag is checked again at
        commit time, so two racing refreshers are also safe)."""
        src_snap = self.src.snapshot()
        if src_snap is None:
            raise FileNotFoundError(f"no source table at {self.src.root}")
        # ONE mv snapshot pins both the applied watermark AND the state
        # to be merged (ADVICE r5): deriving `applied` from an earlier
        # snapshot than the state read would let a refresher that
        # committed in between make the delta overlap the state —
        # a silently double-counted view under a fresh tag.
        mv_snap = self.mv.snapshot() if TxTable.is_table(self.mv.root) else None
        applied = self._applied_of(mv_snap)
        if applied == src_snap.version:
            return applied
        if applied is not None and self._all_appends_since(
            applied, src_snap.version
        ):
            # delta pinned to [applied+1, src_snap.version]: a commit
            # racing in after snapshot() must NOT be folded in under
            # this tag, or the next refresh re-delivers it
            merged = self._merge(
                self.mv.read(version=mv_snap.version),
                self._partial(
                    self.src.read_since(applied, until=src_snap.version)
                ),
            )
        else:  # first build, or history contains a rewrite op
            merged = self._partial(self.src.read(version=src_snap.version))
        self.mv.overwrite(merged, txn=f"{_TXN_PREFIX}{src_snap.version}")
        return src_snap.version

    def read(self) -> DataFrame:
        return self.mv.read()
