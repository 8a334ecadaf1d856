"""Join strategy helpers for scale: bucketed co-located joins and
salted skew joins.

These are the two knobs Catalyst can't turn by itself:

- **Bucketing** is a storage-time decision: writing both fact tables
  bucketed by the join key lets every subsequent join/aggregation on
  that key run with ZERO shuffle (plan shows no Exchange).  At 100 TB
  the shuffle is the bottleneck, so recurring join keys (orderkey,
  custkey) should be bucketed at ingest.  Verified by
  tests/test_plans.py::test_bucketed_join_has_no_shuffle.
- **Salting** splinters a pathologically hot key across N sub-keys so
  one reducer doesn't receive the whole key's data.  AQE's skew-join
  splitting handles sort-merge skew automatically; explicit salting
  remains necessary for skewed *aggregations* and for joins AQE can't
  split (e.g. broadcast-ineligible with a single monster key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table;
    joins/aggs on ``bucket_col`` between tables bucketed the same way
    are co-located — no Exchange in the plan."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key: shuffle-free
    by construction."""
    return spark.table(left_table).join(spark.table(right_table), on)


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: the fact side gets a deterministic
    salt (hash of a row-unique tuple, NOT rand() — reproducibility),
    the dim side is exploded across all salts, and the join key
    becomes (key, salt).  Each hot key now spreads over ``n_salts``
    tasks.  Use when one side is too big to broadcast and a key is hot
    enough to stall a stage."""
    salted_facts = facts.withColumn(
        "_salt", F.pmod(F.xxhash64(*facts.columns), F.lit(n_salts))
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_facts.join(salted_dim, [key, "_salt"])
    return out.drop("_salt")


def skewed_agg_two_phase(
    df: DataFrame, key: str, value: str, n_salts: int = 8
) -> DataFrame:
    """Two-phase (salted) aggregation: partial-aggregate on
    (key, salt), then final-aggregate on key.  The classic fix for a
    hot group key that overwhelms a single reducer; exact same result
    as a direct groupBy (sum is associative), verified in tests."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*df.columns), F.lit(n_salts))
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.sum(F.col(value).cast("decimal(18,2)")).alias("_psum"),
        F.count(F.lit(1)).alias("_pcnt"),
    )
    return partial.groupBy(key).agg(
        F.sum("_psum").cast("double").alias(f"sum_{value}"),
        F.sum("_pcnt").alias("n_rows"),
    )


def bloom_build(keys: DataFrame, key: str, m_bits: int = 1 << 16, k: int = 3) -> list[int]:
    """Build a Bloom filter over ``keys[key]`` as a list of
    ``m_bits/64`` bitmap words.  Build cost is one aggregation of the
    (dimension-sized) key set; the result is KILOBYTES — small enough
    to ship as a plan literal to every task, where the full key set
    (or the dimension itself) might not be.  k positions per key via
    seeded xxhash64.  Driver state = m_bits/64 longs (8 KB at the
    default) — bitmap-sized, never data-sized."""
    pos = F.explode(
        F.array(
            *[
                F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(m_bits))
                for i in range(k)
            ]
        )
    ).alias("pos")
    words = (
        keys.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    arr = [0] * (m_bits // 64)
    for r in words:
        arr[r["w"]] = r["word"]
    return arr


def bloom_prune(
    df: DataFrame, key: str, words: list[int], m_bits: int = 1 << 16, k: int = 3
) -> DataFrame:
    """Filter ``df`` to rows whose ``key`` MIGHT be in the Bloom filter
    (no false negatives; false positives expected — follow with an
    exact semi-join).  The words array enters the plan as ONE nested
    literal; the membership test is pure JVM bit arithmetic evaluated
    at the scan, upstream of any shuffle — the hand-rolled form of a
    runtime row-level filter, for when the build side is known before
    the query (a curated blocklist, yesterday's hot-key set)."""
    df = df.withColumn("_bloom_words", F.lit(words))
    cond = F.lit(True)
    for i in range(k):
        # probe hashes must mirror bloom_build's F.xxhash64(col, lit(i))
        bit = F.expr(
            f"shiftright(element_at(_bloom_words,"
            f" cast(pmod(xxhash64({key}, {i}), {m_bits}) div 64 as int) + 1),"
            f" cast(pmod(xxhash64({key}, {i}), {m_bits}) % 64 as int)) & 1"
        )
        cond = cond & (bit == F.lit(1))
    return df.filter(cond).drop("_bloom_words")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket: int,
) -> DataFrame:
    """Interval overlap join (``l_start < r_end AND r_start < l_end``)
    as an EQUI-join: each interval explodes to the time buckets it
    covers, buckets equi-join, the exact overlap predicate filters,
    and duplicates (pairs sharing several buckets) drop.  A naive
    theta join is a nested-loop O(|L|*|R|); bucketing makes the
    shuffle key-partitioned and the per-key work local — the classic
    range-join optimization.  ``bucket`` should be on the order of
    typical interval length: too small multiplies rows, too large
    degenerates toward all-pairs within a bucket.  Columns must be
    numeric (epoch micros); half-open [start, end) semantics."""
    # integer `div`, never float division + floor: at epoch-micros
    # magnitudes a double quotient can round across a bucket boundary,
    # and a pair overlapping exactly at that boundary would then miss
    # its shared bucket
    def _buckets(df, start, end):
        return df.withColumn(
            "_b",
            F.explode(
                F.sequence(
                    F.expr(f"`{start}` div {bucket}"),
                    F.expr(f"(`{end}` - 1) div {bucket}"),
                )
            ),
        )

    lb = _buckets(left, l_start, l_end)
    rb = _buckets(right, r_start, r_end)
    # bucket-owner dedup: an overlapping pair covers the bucket of
    # max(l_start, r_start) on BOTH sides, and exactly one shared
    # bucket satisfies this equality — so emitting the pair only from
    # that bucket needs no post-join distinct (which would both cost a
    # full-output shuffle and silently collapse genuinely duplicate
    # input rows, diverging from theta-join semantics)
    owner = F.expr(f"greatest(`{l_start}`, `{r_start}`) div {bucket}")
    return (
        lb.join(rb, "_b")
        .filter(
            (F.col(l_start) < F.col(r_end))
            & (F.col(r_start) < F.col(l_end))
            & (F.col("_b") == owner)
        )
        .drop("_b")
    )
