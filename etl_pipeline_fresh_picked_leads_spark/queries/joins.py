"""§2B-C: joins.

Scale notes baked into each query:

- dimension joins (region/nation/customer-sized) use ``F.broadcast``
  explicitly — no shuffle of the fact side, the single most important
  join optimization at 100 TB;
- fact-fact equi-joins rely on sort-merge/shuffle-hash chosen by
  Catalyst + AQE (skew splitting on);
- the as-of join Spark lacks natively is composed as equi-join +
  windowed row_number, the standard shuffle-once formulation;
- the range join keeps an equality key (user_id) so it plans as an
  equi-join with a range post-filter, not a cartesian product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import read_table
from .registry import dsum, dsum_sql, query


@query(
    "q_join_inner",
    oracle=f"""
SELECT c.c_custkey, c.c_name, COUNT(*) AS n_orders,
       {dsum_sql('o.o_totalprice')} AS total_spend
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
""",
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_spend"),
        )
    )


@query(
    "q_join_left",
    oracle="""
SELECT c.c_custkey, o.o_orderkey
FROM customer c LEFT JOIN orders o
  ON o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
""",
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    cond = (o.o_custkey == c.c_custkey) & (o.o_orderpriority == "1-URGENT")
    return c.join(o, cond, "left").select("c_custkey", "o_orderkey")


@query(
    "q_join_right",
    oracle="""
SELECT o.o_orderkey, c.c_custkey
FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_acctbal > 9000 OR o.o_orderkey IS NULL
""",
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .filter((F.col("c_acctbal") > 9000) | F.col("o_orderkey").isNull())
        .select("o_orderkey", "c_custkey")
    )


@query(
    "q_join_full",
    oracle="""
SELECT a.uid AS uid_clicks, b.uid AS uid_purchases, a.n_clicks, b.n_purchases
FROM (SELECT user_id AS uid, COUNT(*) AS n_clicks
      FROM events WHERE event_type = 'click' AND user_id % 3 = 0
      GROUP BY user_id) a
FULL JOIN (SELECT user_id AS uid, COUNT(*) AS n_purchases
           FROM events WHERE event_type = 'purchase' AND user_id % 2 = 0
           GROUP BY user_id) b
  ON a.uid = b.uid
""",
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    a = (
        e.filter((F.col("event_type") == "click") & (F.col("user_id") % 3 == 0))
        .groupBy(F.col("user_id").alias("uid"))
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    b = (
        e.filter((F.col("event_type") == "purchase") & (F.col("user_id") % 2 == 0))
        .groupBy(F.col("user_id").alias("uid"))
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    return a.join(b, a.uid == b.uid, "full").select(
        a.uid.alias("uid_clicks"),
        b.uid.alias("uid_purchases"),
        "n_clicks",
        "n_purchases",
    )


@query(
    "q_join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
""",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_anti",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000)
""",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no high-value order.  (The unconditioned form —
    customers with no orders at all — is empty on this data, which
    would make the oracle comparison vacuous.)"""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_broadcast",
    oracle="""
SELECT r.r_name, n.n_name, COUNT(*) AS n_customers
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema rollup with explicitly broadcast dims: the fact
    table never shuffles for the join (verified by plan test in
    tests/test_plans.py)."""
    c = read_table(spark, sf_dir, "customer")
    n = F.broadcast(read_table(spark, sf_dir, "nation"))
    r = F.broadcast(read_table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "q_join_cross",
    oracle="""
SELECT r.r_name, n.n_name
FROM region r CROSS JOIN nation n
""",
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = read_table(spark, sf_dir, "region")
    n = read_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "q_join_theta",
    oracle=f"""
SELECT p.p_partkey, COUNT(*) AS n_lines, {dsum_sql('l.l_quantity')} AS sum_qty
FROM lineitem l JOIN part p
  ON l.l_partkey = p.p_partkey AND l.l_quantity < p.p_size
GROUP BY p.p_partkey
""",
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi key + theta condition: plans as a hash/sort-merge join on
    l_partkey with the inequality as a join-time filter — never a
    cartesian."""
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    cond = (l.l_partkey == p.p_partkey) & (l.l_quantity < p.p_size)
    return (
        l.join(p, cond)
        .groupBy("p_partkey")
        .agg(F.count(F.lit(1)).alias("n_lines"), dsum("l_quantity").alias("sum_qty"))
    )


@query(
    "q_join_range",
    oracle="""
SELECT a.event_id AS id_a, b.event_id AS id_b
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 1 HOUR
""",
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: pairs of events of the same user within 1h.
    The user_id equality keeps this an equi-join; the time band is a
    post-condition."""
    e = read_table(spark, sf_dir, "events")
    a = e.alias("a")
    b = e.alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 HOUR"))
    )
    return a.join(b, cond).select(
        F.col("a.event_id").alias("id_a"), F.col("b.event_id").alias("id_b")
    )


@query(
    "q_join_asof",
    oracle="""
SELECT purchase_id, last_click_id, last_click_ts
FROM (
  SELECT p.event_id AS purchase_id,
         c.event_id AS last_click_id,
         c.ts AS last_click_ts,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  JOIN (SELECT * FROM events WHERE event_type = 'click') c
    ON c.user_id = p.user_id AND c.ts <= p.ts
) WHERE rn = 1
""",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest click of the same
    user at or before it.  Spark has no native ASOF: composed as
    equi-join + row_number over (ts DESC, event_id DESC) — one shuffle
    for the join, one for the window, both in the same key family."""
    e = read_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").alias("p")
    c = e.filter(F.col("event_type") == "click").alias("c")
    joined = p.join(
        c,
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.col("c.ts") <= F.col("p.ts")),
    )
    w = Window.partitionBy(F.col("p.event_id")).orderBy(
        F.col("c.ts").desc(), F.col("c.event_id").desc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("p.event_id").alias("purchase_id"),
            F.col("c.event_id").alias("last_click_id"),
            F.col("c.ts").alias("last_click_ts"),
        )
    )


@query(
    "q_join_multikey",
    oracle="""
SELECT a.l_orderkey, a.l_linenumber, b.l_quantity AS qty_twin
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber
WHERE a.l_orderkey % 50 = 0
""",
)
def q_join_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem")
    a = l.filter(F.col("l_orderkey") % 50 == 0).alias("a")
    b = l.alias("b")
    return a.join(b, ["l_orderkey", "l_linenumber"]).select(
        F.col("a.l_orderkey").alias("l_orderkey"),
        F.col("a.l_linenumber").alias("l_linenumber"),
        F.col("b.l_quantity").alias("qty_twin"),
    )


@query(
    "q_join_salted",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, p.p_name, l.l_quantity
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
""",
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant salted join (operators/joins.py salted_join):
    deterministic fact-side salt, dim exploded across salts, join on
    (key, salt) — bit-identical to the plain join, driver-checked
    here; the hot-key task spreading is the point at scale."""
    from ..operators.joins import salted_join

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity"
    )
    dim = read_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_name"
    )
    return salted_join(li, dim, "l_partkey").select(
        "l_orderkey", "l_linenumber", "l_partkey", "p_name", "l_quantity"
    )


@query(
    "q_agg_skew_twophase",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_l_extendedprice,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY 1
""",
)
def q_agg_skew_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators/joins.py
    skewed_agg_two_phase): partial-agg on (key, salt) then final on
    key — the hot-group fix, exact same result as direct groupBy
    (decimal accumulation keeps it hash-identical)."""
    from ..operators.joins import skewed_agg_two_phase

    li = read_table(spark, sf_dir, "lineitem")
    return skewed_agg_two_phase(li, "l_returnflag", "l_extendedprice")


@query(
    "q_join_bucketed",
    oracle="""
SELECT o.o_orderkey, o.o_custkey, c.c_name, o.o_totalprice
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
""",
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located join (operators/joins.py bucketing):
    both sides are written bucketed by the join key into a
    scratch-located database, so the join plans with ZERO Exchange —
    the storage-time decision that removes the dominant cost of
    recurring joins at 100 TB (plan pinned in tests/test_plans.py).
    Result rows are identical to the plain shuffled join, which is
    what the oracle checks."""
    import os
    import shutil
    import tempfile

    from ..operators.joins import bucketed_join, write_bucketed

    loc = os.path.join(
        tempfile.gettempdir(), "fpl_spark_scratch", "bucket_wh"
    )
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS fpl_bucket LOCATION '{loc}'"
    )
    # a previous SESSION may have left the managed-table directories
    # behind while this session's metastore has no entry for them —
    # drop both sides of that split-brain before writing
    for t in ("orders_b", "customer_b"):
        spark.sql(f"DROP TABLE IF EXISTS fpl_bucket.{t}")
        shutil.rmtree(os.path.join(loc, t), ignore_errors=True)
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    write_bucketed(o, "fpl_bucket.orders_b", "o_custkey", 8)
    write_bucketed(c, "fpl_bucket.customer_b", "o_custkey", 8)
    return bucketed_join(
        spark, "fpl_bucket.orders_b", "fpl_bucket.customer_b", "o_custkey"
    ).select("o_orderkey", "o_custkey", "c_name", "o_totalprice")


_PIT_ORACLE = """
SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
       CASE WHEN o.o_custkey % 7 = 0 AND o.o_orderdate >= DATE '1995-01-01'
            THEN c.c_acctbal + 100 ELSE c.c_acctbal END AS acctbal_then
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
"""


@query("q_join_pointintime", oracle=_PIT_ORACLE)
def q_join_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension join — the consumer side of SCD2
    (operators/scd.py): each order joins the customer VERSION whose
    validity interval covers its order date, so a 1994 order sees the
    pre-restatement balance and a 1996 order the +100 one.  Executed
    as a key equi-join with the interval predicate in the join
    condition; exactly one version matches per fact row by SCD2's
    non-overlapping-interval invariant.  The dimension (versions ~
    2x customers) broadcasts; the fact side never shuffles."""
    from datetime import date as _date

    from ..operators.scd import scd2_apply, scd2_init

    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    dim = scd2_init(cust, _date(1992, 1, 1))
    dim = scd2_apply(
        dim,
        cust.filter(F.col("c_custkey") % 7 == 0).withColumn(
            "c_acctbal", F.col("c_acctbal") + 100
        ),
        "c_custkey",
        ["c_acctbal"],
        _date(1995, 1, 1),
    )
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cond = (
        (o.o_custkey == dim.c_custkey)
        & (dim.valid_from <= o.o_orderdate)
        & (dim.valid_to.isNull() | (o.o_orderdate < dim.valid_to))
    )
    return o.join(F.broadcast(dim), cond).select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.col("c_acctbal").alias("acctbal_then"),
    )


_NULLSAFE_ORACLE = """
WITH l AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_custkey END AS k
  FROM orders
),
r AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_custkey END AS k,
         c_name
  FROM customer
)
SELECT l.o_orderkey, r.c_custkey, r.c_name
FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
"""


@query("q_join_nullsafe", oracle=_NULLSAFE_ORACLE)
def q_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): planted NULL
    keys on both sides MATCH each other instead of silently dropping —
    the semantics dirty-key reconciliation joins need (a standard
    equi-join makes NULL-keyed rows vanish without an error).  Still
    plans as a hash join: <=> is an equality family, not a theta
    condition.  NOTE the NULL×NULL block is a cross-product of the
    null-keyed rows — at 100 TB filter or salt the null class first
    unless that product is the intent."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 != 0, F.col("o_custkey")).alias("k"),
    )
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 5 != 0, F.col("c_custkey")).alias("lk"),
        "c_name",
    )
    return o.join(c, o.k.eqNullSafe(c.lk)).select(
        "o_orderkey", "c_custkey", "c_name"
    )


_BLOOM_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_custkey IN
  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""


@query("q_join_bloom", oracle=_BLOOM_ORACLE)
def q_join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned semi join (operators/joins.py bloom_build/prune,
    r6): the BUILDING-customer key set folds into an 8 KB bitmap that
    ships as one plan literal; the fact scan drops non-members with
    pure JVM bit arithmetic BEFORE any shuffle, and the exact
    broadcast semi join then removes the bloom's false positives — no
    false negatives by construction.  The hand-rolled form of a
    runtime row-level filter for a build side known ahead of the
    query (curated blocklist, yesterday's hot keys); at 100 TB the
    bitmap rides the plan where a 10M-key set could not."""
    from ..operators.joins import bloom_build, bloom_prune

    c = (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    pruned = bloom_prune(o, "o_custkey", bloom_build(c, "c_custkey"))
    return pruned.join(
        F.broadcast(c), pruned.o_custkey == c.c_custkey, "left_semi"
    )


# 40 deterministic 6-hour campaign windows every 18 h from 2024-01-01
# (epoch micros; both engines compute the same bigint arithmetic), each
# event carries a 10-minute activity window.
_INTERVAL_ORACLE = """
WITH b AS (
  SELECT epoch_us(CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP)) AS base
  FROM events
)
SELECT e.event_id, CAST(c.i AS BIGINT) AS campaign_id
FROM events e, (SELECT i FROM generate_series(0, 39) t(i)) c, b
WHERE epoch_us(e.ts) < b.base + c.i * 64800000000 + 21600000000
  AND b.base + c.i * 64800000000 < epoch_us(e.ts) + 600000000
"""


@query("q_join_interval", oracle=_INTERVAL_ORACLE)
def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval OVERLAP join via time-bucket equi-join
    (operators/joins.py interval_overlap_join): event activity
    windows (10 min) x campaign windows (6 h) — the exact overlap
    predicate evaluates only within shared 6-hour buckets, so the
    plan is a key join, never a nested-loop product.  At 100 TB both
    sides can be fact-sized; the bucket key is what keeps the shuffle
    partitionable."""
    from ..operators.joins import interval_overlap_join

    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s_us"),
        (F.unix_micros(F.col("ts").cast("timestamp")) + 600_000_000).alias(
            "e_us"
        ),
    )
    # campaign schedule anchors at the corpus's first day (scalar
    # through the driver) so the query stays non-trivial whatever
    # epoch a regenerated events table lands in
    base = (
        read_table(spark, sf_dir, "events")
        .agg(
            F.unix_micros(
                F.date_trunc("day", F.min(F.col("ts").cast("timestamp")))
            ).alias("b")
        )
        .collect()[0]["b"]
    )
    camp = spark.range(40).select(
        F.col("id").alias("campaign_id"),
        (F.lit(base) + F.col("id") * 64_800_000_000).alias("c_s"),
        (F.lit(base) + F.col("id") * 64_800_000_000 + 21_600_000_000).alias(
            "c_e"
        ),
    )
    out = interval_overlap_join(
        ev, camp, "s_us", "e_us", "c_s", "c_e", bucket=21_600_000_000
    )
    return out.select("event_id", "campaign_id")
