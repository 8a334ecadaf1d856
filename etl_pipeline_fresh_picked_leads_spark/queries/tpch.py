"""Composite TPC-H-shaped benchmark queries (adapted to the testdata's
reduced column set): multi-join + aggregate + top-k pipelines that
exercise Catalyst's join ordering, broadcast selection and partial
aggregation together — the end-to-end shapes a reporting layer runs
against a 100 TB warehouse, and the composition proof that the §2B
operators work chained, not just alone.

Hash discipline: revenue sums accumulate in DECIMAL on both engines
(registry.dsum), every LIMIT breaks ties on the unique business key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import read_table
from .registry import dsum, dsum_sql, query

def _rev():
    # built lazily: Column construction needs the live gateway
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_Q3_ORACLE = f"""
SELECT l_orderkey,
       {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
       o_orderdate
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < DATE '1997-03-15' AND l_shipdate > DATE '1997-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("q_tpch_q3", oracle=_Q3_ORACLE)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority, adapted): segment-filtered
    customers ⨝ orders ⨝ lineitem, revenue per urgent order, top 10.
    The dimension-most side filters first; Catalyst broadcasts the
    filtered customer set and the date predicates push to both
    scans."""
    c = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("date")
    )
    l = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(_rev(), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


_Q5_ORACLE = f"""
SELECT n_name,
       {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name
"""


@query("q_tpch_q5", oracle=_Q5_ORACLE)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): six-table join — region ⨝
    nation ⨝ customer/supplier ⨝ orders ⨝ lineitem with the
    same-nation constraint — revenue per Asian nation.  The regional
    dimension chain collapses to broadcasts; only the fact-fact
    order⨝lineitem join shuffles."""
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = read_table(spark, sf_dir, "nation").join(
        r, F.col("n_regionkey") == F.col("r_regionkey")
    )
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    l = read_table(spark, sf_dir, "lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(_rev(), 4).alias("revenue"))
    )


_Q10_ORACLE = f"""
SELECT c_custkey, c_name,
       {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
       CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= DATE '1996-10-01' AND o_orderdate < DATE '1997-01-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("q_tpch_q10", oracle=_Q10_ORACLE)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned item reporting): quarter of orders ⨝
    returned lineitems ⨝ customer ⨝ nation, top-20 customers by lost
    revenue.  TakeOrdered handles the limit — no global sort."""
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    l = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_rev(), 4).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# Round-6 additions (VERDICT r5 item 7): the two optimizer shapes the
# first three composites don't exercise — correlated-scalar-subquery
# decorrelation (Q17) and group-by-having semijoin + partial-agg (Q18).

_Q17_ORACLE = f"""
SELECT {dsum_sql('l_extendedprice', 4)} / 7.0 AS avg_yearly,
       COUNT(*) AS n_small
FROM lineitem, part
WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
  AND l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity)
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


@query("q_tpch_q17", oracle=_Q17_ORACLE)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): correlated scalar
    subquery — each Brand#23 lineitem compared against 0.2x the mean
    quantity of ITS part.  Written as literal correlated SQL so
    Catalyst's decorrelation rewrites it to a per-part aggregate
    joined back to the filtered fact (one lineitem re-scan, not one
    subquery per row — at 100 TB the difference between a job and a
    non-termination).  AVG over integral doubles is order-exact, so
    the 0.2x boundary is bit-identical on both engines; the revenue
    sum uses the DECIMAL discipline."""
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "tpch17_lineitem"
    )
    read_table(spark, sf_dir, "part").createOrReplaceTempView("tpch17_part")
    return spark.sql(
        f"""
        SELECT {dsum_sql('l_extendedprice', 4)} / 7.0 AS avg_yearly,
               COUNT(*) AS n_small
        FROM tpch17_lineitem, tpch17_part
        WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
          AND l_quantity < (
            SELECT 0.2 * AVG(l2.l_quantity)
            FROM tpch17_lineitem l2 WHERE l2.l_partkey = p_partkey)
        """
    )


_Q18_ORACLE = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       {dsum_sql('l_quantity', 2)} AS sum_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@query("q_tpch_q18", oracle=_Q18_ORACLE)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): group-by-having semijoin —
    the IN (GROUP BY ... HAVING) subquery plans as an aggregate whose
    partial (map-side) phase runs before its shuffle, then a LeftSemi
    against orders, never materializing the full per-order rollup
    twice.  Top-100 by o_totalprice with the unique o_orderkey
    tie-break."""
    for t in ("customer", "orders", "lineitem"):
        read_table(spark, sf_dir, t).createOrReplaceTempView(f"tpch18_{t}")
    return spark.sql(
        f"""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice,
               {dsum_sql('l_quantity', 2)} AS sum_qty
        FROM tpch18_customer, tpch18_orders, tpch18_lineitem
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM tpch18_lineitem
            GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
          AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
        """
    )


def _views(spark: SparkSession, sf_dir: str, prefix: str, tables: tuple) -> None:
    for t in tables:
        read_table(spark, sf_dir, t).createOrReplaceTempView(f"{prefix}_{t}")


_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1996-07-01' AND o_orderdate < DATE '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60)
GROUP BY o_orderpriority
"""


@query("q_tpch_q4", oracle=_Q4_ORACLE)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking, adapted to the reduced
    column set: 'late' = shipped >60 days after order date): correlated
    EXISTS with a non-equi inner predicate — Catalyst rewrites it to a
    LeftSemi join, so lineitem is touched once, map-side-filtered by
    the pushed date bound."""
    _views(spark, sf_dir, "tpch4", ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM tpch4_orders
        WHERE o_orderdate >= DATE '1996-07-01'
          AND o_orderdate < DATE '1996-10-01'
          AND EXISTS (SELECT 1 FROM tpch4_lineitem
                      WHERE l_orderkey = o_orderkey
                        AND CAST(l_shipdate AS DATE) > date_add(o_orderdate, 60))
        GROUP BY o_orderpriority
        """
    )


_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) t
GROUP BY c_count
"""


@query("q_tpch_q13", oracle=_Q13_ORACLE)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order distribution): outer join with an
    ON-clause filter (NOT a WHERE — rows must survive as zero-count),
    then a re-aggregation of the aggregate.  Exercises the
    outer-join-condition vs post-filter distinction and double
    partial aggregation."""
    _views(spark, sf_dir, "tpch13", ("customer", "orders"))
    return spark.sql(
        """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
          SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM tpch13_customer c LEFT OUTER JOIN tpch13_orders o
            ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey
        ) t
        GROUP BY c_count
        """
    )


_Q16_ORACLE = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand <> 'Brand#45'
  AND p_size IN (1, 4, 7, 10, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@query("q_tpch_q16", oracle=_Q16_ORACLE)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (supplier-part relationship, adapted: lineitem plays
    partsupp): NOT IN subquery — the null-aware anti-join path — plus
    COUNT(DISTINCT) over a multi-column group.  The excluded-supplier
    set is dimension-sized and broadcasts."""
    _views(spark, sf_dir, "tpch16", ("lineitem", "part", "supplier"))
    return spark.sql(
        """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM tpch16_lineitem, tpch16_part
        WHERE p_partkey = l_partkey
          AND p_brand <> 'Brand#45'
          AND p_size IN (1, 4, 7, 10, 14, 19, 23, 36, 45, 49)
          AND l_suppkey NOT IN
              (SELECT s_suppkey FROM tpch16_supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        """
    )


_Q21_ORACLE = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND CAST(l1.l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 30
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND CAST(l3.l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 30)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@query("q_tpch_q21", oracle=_Q21_ORACLE)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting, adapted: 'late' =
    shipped >30 days after order date): EXISTS + NOT EXISTS on the
    SAME fact table — semijoin and null-tolerant anti-join stacked on
    one scan lineage, with a correlated non-equi predicate referencing
    a column from a third table."""
    _views(spark, sf_dir, "tpch21", ("supplier", "lineitem", "orders"))
    return spark.sql(
        """
        SELECT s_name, COUNT(*) AS numwait
        FROM tpch21_supplier, tpch21_lineitem l1, tpch21_orders
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND CAST(l1.l_shipdate AS DATE) > date_add(o_orderdate, 30)
          AND EXISTS (SELECT 1 FROM tpch21_lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM tpch21_lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND CAST(l3.l_shipdate AS DATE)
                                > date_add(o_orderdate, 30))
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
        """
    )


_Q22_ORACLE = f"""
SELECT c_nationkey, COUNT(*) AS numcust, {dsum_sql('c_acctbal', 2)} AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT {dsum_sql('c_acctbal', 2)} / COUNT(*) FROM customer
    WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""


@query("q_tpch_q22", oracle=_Q22_ORACLE)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity, adapted: nationkey plays
    the country code): uncorrelated scalar subquery (the global
    average becomes a broadcast 1-row join) + NOT EXISTS anti-join
    against the urgent-order subset (every customer here has SOME
    order, so the classic no-orders predicate would be vacuous).  The average accumulates in DECIMAL on both
    engines so the > boundary is bit-identical."""
    _views(spark, sf_dir, "tpch22", ("customer", "orders"))
    return spark.sql(
        f"""
        SELECT c_nationkey, COUNT(*) AS numcust,
               {dsum_sql('c_acctbal', 2)} AS totacctbal
        FROM tpch22_customer
        WHERE c_acctbal > (
            SELECT {dsum_sql('c_acctbal', 2)} / COUNT(*) FROM tpch22_customer
            WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM tpch22_orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        GROUP BY c_nationkey
        """
    )


_Q6_ORACLE = f"""
SELECT {dsum_sql('l_extendedprice * l_discount', 4)} AS revenue,
       COUNT(*) AS n
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("q_tpch_q6", oracle=_Q6_ORACLE)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): the canonical scan-filter-
    aggregate — every predicate pushes to the parquet scan and the
    whole query is one map-side-combined aggregation, zero joins.
    The float boundary (discount BETWEEN 0.05 AND 0.07) is exact on
    both engines because the stored values are identical doubles."""
    _views(spark, sf_dir, "tpch6", ("lineitem",))
    return spark.sql(
        f"""
        SELECT {dsum_sql('l_extendedprice * l_discount', 4)} AS revenue,
               COUNT(*) AS n
        FROM tpch6_lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """
    )


_Q12_ORACLE = """
SELECT o_orderpriority,
       COUNT(CASE WHEN CAST(l_shipdate AS DATE)
                       > CAST(o_orderdate AS DATE) + 45 THEN 1 END)
         AS late_count,
       COUNT(*) AS total_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


@query("q_tpch_q12", oracle=_Q12_ORACLE)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-priority exceptions, adapted to the
    reduced column set): fact-fact join + CONDITIONAL aggregation —
    the late/total split computes in one pass over the joined rows
    (COUNT(CASE ...)), not two scans or a self-join."""
    _views(spark, sf_dir, "tpch12", ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(CASE WHEN CAST(l_shipdate AS DATE)
                               > date_add(CAST(o_orderdate AS DATE), 45)
                          THEN 1 END) AS late_count,
               COUNT(*) AS total_count
        FROM tpch12_orders JOIN tpch12_lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority
        """
    )


_Q14_ORACLE = f"""
SELECT round(
  100.0 * {dsum_sql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 4)}
        / {dsum_sql('l_extendedprice * (1 - l_discount)', 4)}, 6)
  AS promo_share
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-09-01'
  AND CAST(l_shipdate AS DATE) < DATE '1996-10-01'
"""


@query("q_tpch_q14", oracle=_Q14_ORACLE)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): conditional-over-total revenue
    ratio in ONE aggregation pass — numerator and denominator are
    sibling DECIMAL sums over the same joined rows, divided in double
    and rounded on both engines."""
    _views(spark, sf_dir, "tpch14", ("lineitem", "part"))
    return spark.sql(
        f"""
        SELECT round(
          100.0 * {dsum_sql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 4)}
                / {dsum_sql('l_extendedprice * (1 - l_discount)', 4)}, 6)
          AS promo_share
        FROM tpch14_lineitem JOIN tpch14_part ON p_partkey = l_partkey
        WHERE CAST(l_shipdate AS DATE) >= DATE '1996-09-01'
          AND CAST(l_shipdate AS DATE) < DATE '1996-10-01'
        """
    )


_Q19_ORACLE = f"""
SELECT {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
       COUNT(*) AS n
FROM lineitem, part
WHERE p_partkey = l_partkey AND (
     (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      AND l_quantity BETWEEN 1 AND 11)
  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      AND l_quantity BETWEEN 10 AND 20)
  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
      AND l_quantity BETWEEN 20 AND 30))
"""


@query("q_tpch_q19", oracle=_Q19_ORACLE)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): disjunctive OR-of-ANDs join
    predicate — the optimizer must extract the common p_partkey =
    l_partkey conjunct as the join key and evaluate the OR blocks as
    a post-join filter (a naive plan degenerates to a nested loop)."""
    _views(spark, sf_dir, "tpch19", ("lineitem", "part"))
    return spark.sql(
        f"""
        SELECT {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
               COUNT(*) AS n
        FROM tpch19_lineitem, tpch19_part
        WHERE p_partkey = l_partkey AND (
             (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
              AND l_quantity BETWEEN 1 AND 11)
          OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
              AND l_quantity BETWEEN 10 AND 20)
          OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
              AND l_quantity BETWEEN 20 AND 30))
        """
    )


_Q20_ORACLE = """
WITH vol AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS sq
  FROM lineitem GROUP BY 1, 2
),
tot AS (
  SELECT l_partkey, SUM(sq) AS tq, COUNT(*) AS ns FROM vol GROUP BY 1
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT v.l_suppkey
  FROM vol v
  JOIN tot t ON v.l_partkey = t.l_partkey
  JOIN part p ON p.p_partkey = v.l_partkey AND p.p_type = 'PROMO'
  WHERE v.sq * t.ns > 2 * t.tq)
"""


@query("q_tpch_q20", oracle=_Q20_ORACLE)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (dominant suppliers, adapted: lineitem plays
    partsupp): two stacked aggregations of the same fact at different
    grains joined against each other (supplier share vs part total),
    filtered to one part type, collapsed into an IN semijoin against
    the supplier dimension.  'Dominant' = share more than 2x the
    average supplier share of that part (scale-robust where an
    absolute 50% share empties out as supplier counts grow); SUMs of
    integral doubles are order-exact, so the boundary is
    bit-identical."""
    _views(spark, sf_dir, "tpch20", ("lineitem", "part", "supplier"))
    return spark.sql(
        """
        WITH vol AS (
          SELECT l_partkey, l_suppkey, SUM(l_quantity) AS sq
          FROM tpch20_lineitem GROUP BY 1, 2
        ),
        tot AS (
          SELECT l_partkey, SUM(sq) AS tq, COUNT(*) AS ns FROM vol GROUP BY 1
        )
        SELECT s_suppkey, s_name
        FROM tpch20_supplier
        WHERE s_suppkey IN (
          SELECT v.l_suppkey
          FROM vol v
          JOIN tot t ON v.l_partkey = t.l_partkey
          JOIN tpch20_part p
            ON p.p_partkey = v.l_partkey AND p.p_type = 'PROMO'
          WHERE v.sq * t.ns > 2 * t.tq)
        """
    )


# Round-7 additions (VERDICT r6 item 4): the remaining optimizer
# shapes — correlated-MIN-subquery decorrelation over a derived table
# (Q2), two-fact multi-nation join ordering (Q7/Q8/Q9), scalar-
# subquery HAVING (Q11), and max-of-agg view (Q15).  The testdata has
# no partsupp table, so lineitem plays the part-supplier relation
# (supplycost := MIN(l_extendedprice / l_quantity) per (part, supp) —
# deterministic, and bit-identical across engines since both divide
# the same stored doubles).

_Q2_ORACLE = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS supplycost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier, nation, region
  WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
    AND r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supplycost
FROM part, ps, eu
WHERE p_partkey = ps.l_partkey AND eu.s_suppkey = ps.l_suppkey
  AND p_type = 'STANDARD'
  AND ps.supplycost = (
    SELECT MIN(ps2.supplycost)
    FROM ps ps2, eu eu2
    WHERE ps2.l_partkey = p_partkey AND eu2.s_suppkey = ps2.l_suppkey)
ORDER BY s_acctbal DESC, p_partkey, s_name
LIMIT 100
"""


@query("q_tpch_q2", oracle=_Q2_ORACLE)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier, adapted: lineitem plays
    partsupp, supplycost = min unit price offered): correlated MIN
    subquery over a DERIVED relation that itself joins the
    region-filtered supplier dimension — Catalyst must decorrelate it
    into a per-part aggregate joined back (one pass over the
    part-supplier relation, not one subquery per candidate row).
    (p_partkey, s_name) is unique per output row, so the top-100
    order is total."""
    _views(spark, sf_dir, "tpch2", ("part", "supplier", "nation", "region", "lineitem"))
    return spark.sql(
        """
        WITH ps AS (
          SELECT l_partkey, l_suppkey,
                 MIN(l_extendedprice / l_quantity) AS supplycost
          FROM tpch2_lineitem GROUP BY l_partkey, l_suppkey
        ),
        eu AS (
          SELECT s_suppkey, s_name, s_acctbal, n_name
          FROM tpch2_supplier, tpch2_nation, tpch2_region
          WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
            AND r_name = 'EUROPE'
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supplycost
        FROM tpch2_part, ps, eu
        WHERE p_partkey = ps.l_partkey AND eu.s_suppkey = ps.l_suppkey
          AND p_type = 'STANDARD'
          AND ps.supplycost = (
            SELECT MIN(ps2.supplycost)
            FROM ps ps2, eu eu2
            WHERE ps2.l_partkey = p_partkey AND eu2.s_suppkey = ps2.l_suppkey)
        ORDER BY s_acctbal DESC, p_partkey, s_name
        LIMIT 100
        """
    )


_Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year,
       {dsum_sql('volume', 4)} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
    AND c_custkey = o_custkey
    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@query("q_tpch_q7", oracle=_Q7_ORACLE)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): the nation dimension joins TWICE
    under different roles (supplier side n1, customer side n2) with a
    disjunctive cross-role pair predicate, over the two-fact
    lineitem ⨝ orders spine — the join-order-pressure shape the
    verdict called out.  Both nation sides broadcast; only the
    fact-fact join shuffles."""
    s = read_table(spark, sf_dir, "supplier")
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1998-01-01").cast("date"))
    )
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n1 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(_rev(), 4).alias("revenue"))
    )


_Q8_ORACLE = f"""
SELECT o_year,
       round({dsum_sql("CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END", 4)}
             / {dsum_sql('volume', 4)}, 6) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
    AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
    AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1997-01-01'
    AND p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
"""


@query("q_tpch_q8", oracle=_Q8_ORACLE)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): EIGHT-table join — part +
    supplier + both facts + customer + nation-in-two-roles + region —
    then a conditional-over-total share per year (the CASE
    market-share shape).  Every dimension chain collapses to
    broadcasts; numerator and denominator are sibling DECIMAL sums in
    ONE aggregation pass, divided and rounded identically on both
    engines."""
    _views(
        spark, sf_dir, "tpch8",
        ("part", "supplier", "lineitem", "orders", "customer", "nation", "region"),
    )
    return spark.sql(
        f"""
        SELECT o_year,
               round({dsum_sql("CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END", 4)}
                     / {dsum_sql('volume', 4)}, 6) AS mkt_share
        FROM (
          SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume,
                 n2.n_name AS nation
          FROM tpch8_part, tpch8_supplier, tpch8_lineitem, tpch8_orders,
               tpch8_customer, tpch8_nation n1, tpch8_nation n2, tpch8_region
          WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
            AND l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
            AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
            AND o_orderdate >= DATE '1995-01-01'
            AND o_orderdate < DATE '1997-01-01'
            AND p_type = 'ECONOMY'
        ) all_nations
        GROUP BY o_year
        """
    )


_Q9_ORACLE = f"""
SELECT nation, o_year, {dsum_sql('amount', 4)} AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(year(o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount)
           - 0.5 * p_retailprice * l_quantity AS amount
  FROM part, supplier, lineitem, orders, nation
  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
    AND p_name LIKE '%gear%'
) profit
GROUP BY nation, o_year
"""


@query("q_tpch_q9", oracle=_Q9_ORACLE)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit, adapted: supplycost :=
    0.5 * p_retailprice): both facts join part AND supplier AND nation
    with a substring part filter — the classic join-order stress where
    the part filter must prune lineitem before the orders join.  The
    amount expression keeps one multiplication order on both engines
    (left-assoc 0.5 * retail * qty) so the doubles entering the
    DECIMAL accumulator are bit-identical."""
    p = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = read_table(spark, sf_dir, "supplier")
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    n = read_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.5
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum("amount", 4).alias("sum_profit"))
    )


_Q11_ORACLE = f"""
WITH natsupp AS (
  SELECT s_suppkey FROM supplier, nation
  WHERE s_nationkey = n_nationkey AND n_name = 'NATION_9'
)
SELECT l_partkey AS ps_partkey,
       {dsum_sql('l_extendedprice * l_quantity', 2)} AS value
FROM lineitem JOIN natsupp ON l_suppkey = s_suppkey
GROUP BY l_partkey
HAVING {dsum_sql('l_extendedprice * l_quantity', 2)} > (
  SELECT {dsum_sql('l_extendedprice * l_quantity', 2)} * 0.001
  FROM lineitem JOIN natsupp ON l_suppkey = s_suppkey)
ORDER BY value DESC, ps_partkey
"""


@query("q_tpch_q11", oracle=_Q11_ORACLE)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock, adapted: per-part inventory value
    := SUM(l_extendedprice * l_quantity) over one nation's
    suppliers): GROUP BY ... HAVING against an UNCORRELATED scalar
    subquery global share.  r8 rewrite (VERDICT r7 item 8): the
    global threshold derives from the PER-PART aggregate — exact
    DECIMAL sums are associative, so SUM(per-part sums) is
    bit-identical to the direct global sum (the oracle keeps the
    naive two-scan form) — and both consumers then share one
    canonical hashpartitioning(l_partkey) exchange, which AQE
    deduplicates (ReusedExchange, pinned in tests/test_plans.py):
    the fact scans+shuffles ONCE, where the naive form scanned it at
    two grains (the r7 8x probe's steepest grower).  The scalar side
    aggregates the part-grain shuffle output (~1-2%% of fact bytes),
    then broadcasts as a 1-row join."""
    _views(spark, sf_dir, "tpch11", ("supplier", "nation", "lineitem"))
    return spark.sql(
        """
        WITH natsupp AS (
          SELECT s_suppkey FROM tpch11_supplier, tpch11_nation
          WHERE s_nationkey = n_nationkey AND n_name = 'NATION_9'
        ),
        perpart AS (
          SELECT l_partkey AS ps_partkey,
                 SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,2)))
                   AS value_dec
          FROM tpch11_lineitem JOIN natsupp ON l_suppkey = s_suppkey
          GROUP BY l_partkey
        )
        SELECT ps_partkey, CAST(value_dec AS DOUBLE) AS value
        FROM perpart
        WHERE CAST(value_dec AS DOUBLE) > (
          SELECT CAST(SUM(value_dec) AS DOUBLE) * 0.001 FROM perpart)
        ORDER BY value DESC, ps_partkey
        """
    )


_Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS total_revenue
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@query("q_tpch_q15", oracle=_Q15_ORACLE)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): a view (CTE) over a quarter's
    per-supplier revenue, re-consumed TWICE — once as the join input
    and once under MAX in an uncorrelated scalar subquery (max-of-agg
    view).  The MAX compares DECIMAL-exact doubles, so the equality
    predicate selects the same supplier(s) on both engines."""
    _views(spark, sf_dir, "tpch15", ("supplier", "lineitem"))
    return spark.sql(
        f"""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 {dsum_sql('l_extendedprice * (1 - l_discount)', 4)}
                   AS total_revenue
          FROM tpch15_lineitem
          WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
            AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM tpch15_supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey
        """
    )
