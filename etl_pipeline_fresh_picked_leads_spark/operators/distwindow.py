"""Distributed global-window operators (VERDICT r5 item 3).

A global (un-partitioned) window — ``NTILE(4) OVER (ORDER BY v)`` or a
value-RANGE running frame — plans in vanilla Spark as an ``Exchange
SinglePartition`` feeding one ``WindowExec``: every row moves to ONE
task.  Correct at sf0.01, fatal on a fact table at 100 TB.  These
helpers compute bit-identical answers from range partitioning:

- :func:`global_rank` — range-shuffle on the sort key, local
  ``row_number`` per range partition, plus cumulative per-partition
  offsets broadcast as one literal array (P scalars through the
  driver — partition-count-sized, never data-sized).  global rank =
  ``offset[pid] + local rank``.
- :func:`ntile_expr` — ANSI ``NTILE(n)`` derived arithmetically from
  the global rank and the total row count (first ``N mod n`` buckets
  get ``N div n + 1`` rows, the rest ``N div n``).
- :func:`range_frame_agg` — value-RANGE running frame where each range
  partition borrows the boundary rows (values within ``preceding`` of
  the partition's min) from its predecessors via a broadcast bounds
  join, so frames never silently cross task boundaries.

Shared mechanics: ``repartitionByRange`` on the full sort key, then
``localCheckpoint(eager=True)`` to PIN partition ids — the counts
pass and the rank pass must observe identical partitioning, and a
lineage recompute could legitimately re-sample different range
boundaries.  Range partitioning keeps equal keys in one partition, so
value-defined frames (ties share a frame) stay intact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PID = "_rp_pid"


def _npart(df: DataFrame, npart: int | None) -> int:
    if npart is not None:
        return npart
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))


def _range_pinned(df: DataFrame, keys: list[str], npart: int) -> DataFrame:
    """Range-partition on ``keys`` with the partition id materialized
    as a column and the partitioning PINNED (localCheckpoint): every
    later pass must see the same pid for the same row.

    Storage lifetime: the checkpointed blocks live until the returned
    DataFrame is garbage-collected (ContextCleaner releases them with
    the RDD), so repeated calls in one session hold at most the
    not-yet-collected tail, not an unbounded leak.  They cannot be
    unpersisted eagerly — the lineage is truncated, so the data IS
    the only copy while any derived plan may still run."""
    return (
        df.repartitionByRange(npart, *[F.col(k) for k in keys])
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )


def global_rank(
    df: DataFrame,
    keys: list[str],
    npart: int | None = None,
    rank_col: str = "_grank",
) -> tuple[DataFrame, int]:
    """``ROW_NUMBER() OVER (ORDER BY keys)`` without a single-partition
    window.  ``keys`` must be unique as a composite (the usual
    tiebreaker discipline), which also makes the result independent of
    where the sampled range boundaries fall.  Returns ``(df +
    rank_col, total_row_count)``; the intermediate ``_rp_pid`` column
    is dropped."""
    npart = _npart(df, npart)
    ranged = _range_pinned(df, keys, npart)
    counts = {
        r[_PID]: r["cnt"]
        for r in ranged.groupBy(_PID).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for pid in range(npart):
        offsets.append(acc)
        acc += counts.get(pid, 0)
    lw = Window.partitionBy(_PID).orderBy(*keys)
    out = ranged.withColumn(
        rank_col,
        (
            F.element_at(F.lit(offsets), F.col(_PID) + 1)
            + F.row_number().over(lw)
        ).cast("long"),
    ).drop(_PID)
    return out, acc


def ntile_expr(rank_col: str, total: int, n: int) -> Column:
    """ANSI NTILE(n) as arithmetic over a unique 1-based global rank:
    with ``N = total``, the first ``N mod n`` buckets hold ``N div n
    + 1`` rows and the rest ``N div n`` — exactly Spark's and
    DuckDB's semantics."""
    base, rem = divmod(total, n)
    r = F.col(rank_col)
    if base == 0:  # fewer rows than buckets: bucket i == row i
        return r.cast("int")
    cut = rem * (base + 1)
    return (
        F.when(r <= cut, F.floor((r - 1) / (base + 1)) + 1)
        .otherwise(rem + F.floor((r - cut - 1) / base) + 1)
        .cast("int")
    )


def range_frame_agg(
    df: DataFrame,
    value_col: str,
    preceding: int,
    agg_builder,
    out_col: str,
    npart: int | None = None,
) -> DataFrame:
    """``agg OVER (ORDER BY value_col RANGE BETWEEN preceding
    PRECEDING AND CURRENT ROW)`` distributed over range partitions.

    Each partition can evaluate its rows' frames locally EXCEPT for
    values within ``preceding`` of the partition minimum, whose frames
    reach into earlier partitions.  Boundary exchange: a broadcast
    join against the P-row per-partition-minimum table replicates each
    row to every LATER partition whose min it can still reach
    (``min_p - preceding <= v < min_p``) — with partition width >
    ``preceding`` that is at most one copy per row, and never a
    single-partition shuffle.  Borrowed rows contribute to frames and
    are dropped from the output.

    ``agg_builder(window)`` returns the aggregate column (caller keeps
    the dsum/rounding discipline); range partitioning keeps ties in
    one partition, so value-defined frames are never split.
    """
    npart = _npart(df, npart)
    ranged = _range_pinned(df, [value_col], npart)
    bounds = (
        ranged.groupBy(_PID)
        .agg(F.min(value_col).alias("_min_v"))
        .withColumnRenamed(_PID, "_tgt")
    )
    own = ranged.withColumn("_tgt", F.col(_PID))
    v = F.col(value_col)
    borrowed = ranged.join(
        F.broadcast(bounds),
        (F.col("_tgt") > F.col(_PID))
        & (v < F.col("_min_v"))
        & (v >= F.col("_min_v") - F.lit(preceding)),
    ).drop("_min_v")
    w = (
        Window.partitionBy("_tgt")
        .orderBy(value_col)
        .rangeBetween(-preceding, 0)
    )
    return (
        own.unionByName(borrowed)
        .withColumn(out_col, agg_builder(w))
        .filter(F.col("_tgt") == F.col(_PID))
        .drop("_tgt", _PID)
    )
