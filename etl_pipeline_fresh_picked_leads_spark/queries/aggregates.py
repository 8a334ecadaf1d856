"""§2B-D: aggregations.

All money/quantity sums go through exact DECIMAL accumulation
(``registry.dsum``) so Spark and the DuckDB oracle produce
bit-identical doubles regardless of partial-aggregation order — the
same discipline a 1000-executor cluster needs for reproducible
results.  Catalyst plans every groupBy here as partial (map-side) +
final aggregation automatically; nothing below materializes an
intermediate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import read_table
from .registry import davg, davg_sql, dsum, dsum_sql, query

# --- flagship: TPC-H Q1 shape ----------------------------------------------

FLAGSHIP_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {dsum_sql('l_quantity')} AS sum_qty,
  {dsum_sql('l_extendedprice')} AS sum_base_price,
  {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
  {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
  {davg_sql('l_quantity')} AS avg_qty,
  {davg_sql('l_extendedprice')} AS avg_price,
  {davg_sql('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped aggregation: scan -> pushed filter -> hash agg
    (partial+final) -> sort.  The engine's smallest end-to-end real
    query (SURVEY.md §7 stage 0)."""
    l = read_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price, 4).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


query("q_agg_group", oracle=FLAGSHIP_ORACLE)(flagship)


@query(
    "q_agg_global",
    oracle=f"""
SELECT
  COUNT(*) AS n_rows,
  {dsum_sql('l_quantity')} AS sum_qty,
  {davg_sql('l_extendedprice')} AS avg_price,
  CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
  CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price,
  COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
""",
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity").alias("sum_qty"),
        davg("l_extendedprice").alias("avg_price"),
        F.min("l_extendedprice").cast("double").alias("min_price"),
        F.max("l_extendedprice").cast("double").alias("max_price"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@query(
    "q_agg_having",
    oracle=f"""
SELECT o_custkey, COUNT(*) AS n_orders, {dsum_sql('o_totalprice')} AS total_spend
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) > 12
""",
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_spend"),
        )
        .filter(F.col("n_orders") > 12)
    )


@query(
    "q_agg_distinct",
    oracle="""
SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations
FROM customer
GROUP BY c_mktsegment
""",
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations")
    )


@query(
    "q_agg_multi_distinct",
    oracle="""
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_custs,
       COUNT(DISTINCT o_orderstatus) AS n_statuses,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
""",
)
def q_agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Multiple DISTINCT aggregates in one GROUP BY: Catalyst plans this
    # via Expand (one stream per distinct column) — exactly the plan a
    # hand-rolled multi-pass would produce, minus the extra scans.
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "q_dedup_exact",
    oracle="""
SELECT c_nationkey, c_mktsegment
FROM customer
GROUP BY c_nationkey, c_mktsegment
""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup = DISTINCT (hash groupBy under the hood). The
    keyed keep-first variant is q_dedup_keyed."""
    c = read_table(spark, sf_dir, "customer")
    return c.select("c_nationkey", "c_mktsegment").distinct()


@query(
    "q_dedup_keyed",
    oracle="""
SELECT c_custkey, c_name, c_nationkey
FROM (
  SELECT c_custkey, c_name, c_nationkey,
         ROW_NUMBER() OVER (
           PARTITION BY c_nationkey, c_mktsegment
           ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
)
WHERE rn = 1
""",
)
def q_dedup_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one-per-key dedup with a deterministic survivor rule
    (highest balance, key tiebreak) — the scale-safe replacement for
    dropDuplicates' arbitrary-survivor semantics."""
    from pyspark.sql.window import Window

    c = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey", "c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", "c_name", "c_nationkey")
    )


_ROLLUP_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity')} AS sum_qty, COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("q_agg_rollup", oracle=_ROLLUP_ORACLE)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


@query(
    "q_agg_cube",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity')} AS sum_qty, COUNT(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


@query(
    "q_agg_gsets",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS TINYINT) AS g_rf,
       CAST(GROUPING(l_linestatus) AS TINYINT) AS g_ls,
       {dsum_sql('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
)
def q_agg_gsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("lineitem_gsets")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS TINYINT) AS g_rf,
               CAST(GROUPING(l_linestatus) AS TINYINT) AS g_ls,
               {dsum_sql('l_quantity')} AS sum_qty
        FROM lineitem_gsets
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "q_agg_approx_cd",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS within_5pct
FROM events GROUP BY event_type
""",
)
def q_agg_approx_cd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the 100 TB substitute for
    COUNT(DISTINCT): mergeable sketch, no Expand, no second shuffle.

    The estimate itself is engine-specific (DuckDB's HLL differs), so
    the SQL oracle pins the sketch's CONTRACT instead of its value:
    every group's estimate must land within 5% (2.5 sigma at
    rsd=0.02) of the exact count, which the query emits alongside the
    validation flag.  A broken sketch flips the flag and fails the
    hash gate; at 100 TB you drop the exact column and keep only the
    estimate (rows-only history: r1-r4)."""
    e = read_table(spark, sf_dir, "events")
    g = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
    )
    return g.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("_approx") - F.col("exact_users"))
            <= F.col("exact_users") * F.lit(0.05)
        ).alias("within_5pct"),
    )


@query(
    "q_agg_percentile",
    oracle="""
SELECT o_orderpriority,
       CAST(MEDIAN(o_totalprice) AS DOUBLE) AS median_price
FROM orders
GROUP BY o_orderpriority
""",
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median (interpolated) — hash-matched.  The approximate
    variant (percentile_approx, the scalable path) is q_agg_percentile_approx
    with a rows-only check."""
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.median("o_totalprice").alias("median_price")
    )


# Promoted from rows-only (VERDICT r4 #4): Greenwald-Khanna at
# accuracy >= group size degenerates to the EXACT discrete quantile
# (the element at rank ceil(p*n)), which is DuckDB's quantile_disc —
# verified value-identical per group at sf0.001/sf0.01 (n~3000 per
# priority vs accuracy 10000).  The oracle's validity domain is
# group_size <= accuracy; the driver gate runs at sf0.01 where that
# holds with 3x headroom.  At 100 TB the sketch is approximate again —
# that is its point — and the rows-only-era invariant tests still pin
# the error envelope.
@query(
    "q_agg_percentile_approx",
    oracle="""
SELECT o_orderpriority,
       quantile_disc(o_totalprice, 0.5) AS p50,
       quantile_disc(o_totalprice, 0.95) AS p95
FROM orders GROUP BY o_orderpriority
""",
)
def q_agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50"),
        F.percentile_approx("o_totalprice", 0.95, 10000).alias("p95"),
    )


# Variance/stddev/corr via explicit exact-decimal moment sums: both
# engines compute identical decimal S1/S2/S11, then identical IEEE
# double arithmetic on top — bit-deterministic, unlike the native
# one-pass implementations whose merge order differs cross-engine.
_STATS_ORACLE = """
SELECT
  l_returnflag,
  round((s2 - s1 * s1 / n) / (n - 1), 6) AS var_qty,
  round(SQRT((s2 - s1 * s1 / n) / (n - 1)), 6) AS stddev_qty,
  round((s11 - sq * sp / n)
    / (SQRT(s2 - sq * sq / n) * SQRT(sp2 - sp * sp / n)), 6) AS corr_qty_price
FROM (
  SELECT
    l_returnflag,
    CAST(COUNT(*) AS DOUBLE) AS n,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS s2,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(24,4))) AS DOUBLE)
      AS sp2,
    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(24,4))) AS DOUBLE) AS s11
  FROM lineitem
  GROUP BY l_returnflag
)
"""


@query("q_agg_stats", oracle=_STATS_ORACLE)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem")
    qty, price = F.col("l_quantity"), F.col("l_extendedprice")
    base = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(qty).alias("s1"),
        dsum(qty * qty, 4).alias("s2"),
        dsum(qty).alias("sq"),
        dsum(price).alias("sp"),
        F.sum((price * price).cast("decimal(24,4)")).cast("double").alias("sp2"),
        F.sum((qty * price).cast("decimal(24,4)")).cast("double").alias("s11"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    sq, sp, sp2, s11 = F.col("sq"), F.col("sp"), F.col("sp2"), F.col("s11")
    # rounded at the boundary: the moment sums are bit-identical but
    # the engines may associate the final expression differently (1-ulp
    # drift observed on corr at sf0.001)
    return base.select(
        "l_returnflag",
        F.round((s2 - s1 * s1 / n) / (n - 1), 6).alias("var_qty"),
        F.round(F.sqrt((s2 - s1 * s1 / n) / (n - 1)), 6).alias("stddev_qty"),
        F.round(
            (s11 - sq * sp / n)
            / (F.sqrt(s2 - sq * sq / n) * F.sqrt(sp2 - sp * sp / n)),
            6,
        ).alias("corr_qty_price"),
    )


@query(
    "q_agg_collect",
    oracle="""
SELECT c_nationkey,
       array_to_string(list(c_custkey ORDER BY c_custkey), ',') AS custkeys
FROM customer
WHERE c_custkey % 10 = 0
GROUP BY c_nationkey
""",
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sort_array makes the collected list deterministic (collect_list
    # order is partition-dependent, never rely on it at scale).  The
    # list is emitted as a ','-joined string: raw array columns crash
    # the driver's pandas canonicalizer (unhashable 'list' during
    # sort_values), so every driver-facing array is stringified.
    c = read_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_custkey") % 10 == 0)
        .groupBy("c_nationkey")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("c_custkey")), ","
            ).alias("custkeys")
        )
    )


_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]

_PIVOT_ORACLE = """
SELECT user_id,
       {cols}
FROM events
GROUP BY user_id
""".format(
    cols=",\n       ".join(
        "CAST(SUM(CASE WHEN event_type = '{t}' THEN CAST(value AS DECIMAL(18,6)) "
        "END) AS DOUBLE) AS {t}".format(t=t)
        for t in _PIVOT_TYPES
    )
)


@query("q_pivot", oracle=_PIVOT_ORACLE)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Explicit pivot value list: without it Spark runs an extra
    # distinct-collect job over the full table just to discover the
    # columns — never do that at 100 TB.
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", _PIVOT_TYPES)
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"))
    )


@query(
    "q_agg_histogram",
    oracle="""
SELECT CAST(floor(o_totalprice / 50000.0) AS INT) AS bucket,
       COUNT(*) AS n,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key
FROM orders
GROUP BY 1
""",
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram: bucket = floor(value / width) — the
    one-shuffle profiling aggregation (map-side combine reduces every
    partition to at most n_buckets rows before the exchange).  floor
    keeps the double arithmetic bit-identical across engines."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 50000.0).cast("int").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_orderkey").alias("min_key"),
        )
    )


_UNPIVOT_ORACLE = """
SELECT o_orderkey, 'price' AS measure, o_totalprice AS value
FROM orders
UNION ALL
SELECT o_orderkey, 'cust' AS measure, CAST(o_custkey AS DOUBLE)
FROM orders
"""


@query("q_unpivot", oracle=_UNPIVOT_ORACLE)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide -> long (UNPIVOT / melt), the inverse of q_pivot: each
    measure column becomes a (name, value) row via ``unpivot`` — a
    pure per-row Expand, no shuffle, output rows = rows x measures.
    The tidy-format step feature pipelines use before per-measure
    aggregation."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.col("o_custkey").cast("double").alias("cust"),
    )
    return o.unpivot(
        ids=["o_orderkey"],
        values=["price", "cust"],
        variableColumnName="measure",
        valueColumnName="value",
    )


_MODE_ORACLE = """
WITH c AS (
  SELECT l_returnflag, l_quantity, COUNT(*) AS n
  FROM lineitem GROUP BY 1, 2
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag
                               ORDER BY n DESC, l_quantity) AS rn
  FROM c
)
SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS mode_qty, n AS n_rows
FROM r WHERE rn = 1
"""


@query("q_agg_mode", oracle=_MODE_ORACLE)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE: most frequent value per group with an
    explicit tie-break (smallest value) — the reproducible replacement
    for the built-in ``mode()``, whose tie winner is
    partitioning-dependent on both engines.  count-groupBy + one
    window; the WindowGroupLimit pre-trim applies like any top-1."""
    from pyspark.sql.window import Window

    l = read_table(spark, sf_dir, "lineitem")
    c = l.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("n").desc(), F.col("l_quantity")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").cast("double").alias("mode_qty"),
            F.col("n").alias("n_rows"),
        )
    )


# Heavy hitters (r6): a deterministic hot key (-1, exactly n/10
# copies) is planted so the contract is non-trivial on ANY data
# distribution; both engines then compute the identical exact
# condition freq*k > n over the identical constructed corpus, so
# organic heavy users (if the driver data has them) agree too.
_HEAVY_HITTERS_ORACLE = """
WITH corpus AS (
  SELECT user_id FROM events WHERE user_id IS NOT NULL
  UNION ALL
  SELECT CAST(-1 AS BIGINT) AS user_id
  FROM (SELECT row_number() OVER () AS rn FROM events) t
  WHERE rn <= (SELECT COUNT(*) // 10 FROM events)
),
tot AS (SELECT COUNT(*) AS n FROM corpus)
SELECT user_id, COUNT(*) AS freq
FROM corpus, tot
GROUP BY user_id, n
HAVING COUNT(*) * 20 > n
"""


@query("q_agg_heavyhitters", oracle=_HEAVY_HITTERS_ORACLE)
def q_agg_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keys with frequency > n/20 via per-partition Misra-Gries
    candidates + exact verification (operators/sketches.py): per-task
    memory O(k) and a candidate-only shuffle, instead of grouping the
    full distinct key domain — the 100 TB way to ask "which users
    dominate the event stream".  The sketch only prunes (pigeonhole:
    a global heavy hitter is partition-heavy somewhere), so the
    output is bit-identical to the full groupBy."""
    from ..operators.sketches import heavy_hitters

    ev = read_table(spark, sf_dir, "events").select("user_id")
    n0 = ev.count()
    hot = spark.range(n0 // 10).select(
        F.lit(-1).cast("bigint").alias("user_id")
    )
    return heavy_hitters(ev.unionByName(hot), "user_id", k=20)
