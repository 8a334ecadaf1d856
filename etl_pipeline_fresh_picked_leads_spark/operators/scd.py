"""Slowly-changing-dimension type 2: keyed history with validity
intervals — the warehouse pattern for "what did this dimension row
look like when the fact happened".

The reference's loader overwrites dimension-ish tables in place
(WRITE_TRUNCATE, big_uery_handler.py:114,133), losing history; SCD2 is
the standard upgrade: a changed row is CLOSED (``valid_to`` stamped,
``is_current`` cleared) and a new current version inserted, unchanged
rows pass through untouched, and brand-new keys insert as current.

Plan shape: ONE full-outer join of the CURRENT slice against the
batch on the business key (closed history never joins — it is a
pass-through union), then pure projections.  Dimensions are small
next to facts, so at 100 TB the batch side broadcasts and the rewrite
is the dimension, never the fact table; to go file-granular, feed the
returned frame to ``TxTable.upsert`` keyed on (key, valid_from).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCD_COLS = ("valid_from", "valid_to", "is_current")


def scd2_init(batch: DataFrame, valid_from) -> DataFrame:
    """First load: every row current from ``valid_from``."""
    return batch.select(
        "*",
        F.lit(valid_from).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def _any_tracked_differs(tracked: list[str]) -> Column:
    # null-safe: NULL -> value and value -> NULL both count as changes
    return reduce(
        lambda a, b: a | b,
        [~F.col(f"c.{t}").eqNullSafe(F.col(f"b.{t}")) for t in tracked],
    )


def scd2_apply(
    dim: DataFrame, batch: DataFrame, key: str, tracked: list[str], batch_date
) -> DataFrame:
    """Fold one batch into an SCD2 dimension; returns the new full
    dimension state.  ``dim`` carries the business columns plus
    ``valid_from``/``valid_to``/``is_current``; ``batch`` carries only
    business columns.  Deterministic — no timestamps are generated,
    ``batch_date`` is the caller's effective date.  The batch must
    carry at most one row per key (dedupe upstream, e.g.
    operators/sampling.per_group_cap or a keyed window): duplicate
    keys would fan out the join and insert conflicting versions."""
    bd = F.lit(batch_date).cast("date")
    data_cols = [c for c in dim.columns if c not in SCD_COLS]
    hist = dim.filter(~F.col("is_current"))
    cur = dim.filter(F.col("is_current"))

    c = cur.withColumn("_c", F.lit(1)).alias("c")
    b = batch.withColumn("_b", F.lit(1)).alias("b")
    j = c.join(b, on=key, how="full_outer")
    in_c, in_b = F.col("c._c").isNotNull(), F.col("b._b").isNotNull()
    differs = _any_tracked_differs(tracked)

    def from_cur(valid_to, is_current):
        return [F.col(key)] + [
            F.col(f"c.{t}") for t in data_cols if t != key
        ] + [
            F.col("c.valid_from"),
            valid_to.alias("valid_to"),
            F.lit(is_current).alias("is_current"),
        ]

    # unchanged current rows (batch absent, or batch equal) carry over
    unchanged = j.filter(in_c & (~in_b | ~differs)).select(
        *from_cur(F.col("c.valid_to"), True)
    )
    # changed rows close at the batch date
    closed = j.filter(in_c & in_b & differs).select(*from_cur(bd, False))
    # changed + brand-new keys insert as the new current version
    fresh = j.filter(in_b & (~in_c | differs)).select(
        *(
            [F.col(key)]
            + [F.col(f"b.{t}") for t in data_cols if t != key]
            + [
                bd.alias("valid_from"),
                F.lit(None).cast("date").alias("valid_to"),
                F.lit(True).alias("is_current"),
            ]
        )
    )
    return hist.unionByName(unchanged).unionByName(closed).unionByName(fresh)


def scd2_asof(dim: DataFrame, as_of) -> DataFrame:
    """Dimension state as of a date: the row version whose validity
    interval covers it — the lookup side of a point-in-time join."""
    d = F.lit(as_of).cast("date")
    return dim.filter(
        (F.col("valid_from") <= d)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > d))
    ).drop(*SCD_COLS)
