"""Bucketed co-located joins (zero shuffle) and salted skew handling —
the storage-time join optimizations Catalyst can't apply by itself.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_fresh_picked_leads_spark.operators.joins import (
    bucketed_join,
    salted_join,
    skewed_agg_two_phase,
    write_bucketed,
)
from etl_pipeline_fresh_picked_leads_spark.plans import n_exchanges
from etl_pipeline_fresh_picked_leads_spark.sources.readers import read_table

from conftest import SF_SMALL


def test_bucketed_join_has_no_shuffle(spark):
    orders = read_table(spark, SF_SMALL, "orders")
    lineitem = read_table(spark, SF_SMALL, "lineitem")
    write_bucketed(orders, "orders_b", "o_orderkey", 4, sort_col="o_orderkey")
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        "o_orderkey",
        4,
        sort_col="o_orderkey",
    )
    joined = bucketed_join(spark, "orders_b", "lineitem_b", "o_orderkey")
    # co-located: the join itself introduces no shuffle Exchange
    assert n_exchanges(joined) == 0
    # and the result matches the plain shuffled join
    plain = orders.join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
    )
    assert joined.count() == plain.count()


def test_salted_join_matches_plain_join(spark):
    facts = read_table(spark, SF_SMALL, "orders")
    dim = read_table(spark, SF_SMALL, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    salted = salted_join(facts, dim, "o_custkey", n_salts=4)
    plain = facts.join(dim, "o_custkey")
    assert salted.count() == plain.count()
    a = {(r.o_orderkey, r.c_name) for r in salted.select("o_orderkey", "c_name").collect()}
    b = {(r.o_orderkey, r.c_name) for r in plain.select("o_orderkey", "c_name").collect()}
    assert a == b


def test_two_phase_agg_matches_direct(spark):
    l = read_table(spark, SF_SMALL, "lineitem")
    two = {
        (r.l_returnflag, r.sum_l_quantity, r.n_rows)
        for r in skewed_agg_two_phase(l, "l_returnflag", "l_quantity", 4).collect()
    }
    direct = {
        (r.l_returnflag, r.sum_l_quantity, r.n_rows)
        for r in l.groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_l_quantity"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    }
    assert two == direct


def test_bloom_prune_no_false_negatives_and_selective(spark):
    """Every true member survives the bloom (no false negatives —
    correctness), and the prune actually drops a large share of
    non-members (effectiveness — otherwise the pattern is pointless);
    the exact semi join then removes any false positives."""
    from etl_pipeline_fresh_picked_leads_spark.operators.joins import (
        bloom_build,
        bloom_prune,
    )

    c = (
        read_table(spark, SF_SMALL, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = read_table(spark, SF_SMALL, "orders")
    words = bloom_build(c, "c_custkey")
    pruned = bloom_prune(o, "o_custkey", words)
    true_hits = o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_semi")
    n_true, n_pruned, n_all = true_hits.count(), pruned.count(), o.count()
    # no false negatives: the pruned set contains every true hit
    assert true_hits.join(pruned, "o_orderkey", "left_anti").count() == 0
    assert n_pruned >= n_true
    # selective: false-positive overhead stays far below the non-member mass
    assert n_pruned - n_true < 0.05 * (n_all - n_true), (n_pruned, n_true, n_all)
    # the membership test is JVM expression work, no Python, no shuffle
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_interval_overlap_join_matches_theta(spark):
    """Bucketized interval join == naive theta join, including
    intervals that touch bucket boundaries exactly and intervals
    spanning multiple buckets; plan must stay an equi join."""
    from etl_pipeline_fresh_picked_leads_spark.operators.joins import (
        interval_overlap_join,
    )

    B = 100
    lrows = [(i, (i * 37) % 1000, (i * 37) % 1000 + 1 + (i % 250)) for i in range(300)]
    rrows = [(j, j * 100, j * 100 + 100) for j in range(12)]  # exactly on boundaries
    left = spark.createDataFrame(lrows, "lid long, ls long, le long")
    right = spark.createDataFrame(rrows, "rid long, rs long, re long")
    got = {
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bucket=B
        ).collect()
    }
    want = {
        (r.lid, r.rid)
        for r in left.join(
            right, (F.col("ls") < F.col("re")) & (F.col("rs") < F.col("le"))
        ).collect()
    }
    assert got == want and len(got) > 0


def test_interval_overlap_join_keeps_duplicate_rows(spark):
    """Theta-join parity on MULTISET semantics: two identical left
    intervals must yield two output pairs (the bucket-owner dedup
    removes only cross-bucket copies of the same pair, never
    genuinely duplicate input rows)."""
    from etl_pipeline_fresh_picked_leads_spark.operators.joins import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(1, 10, 250), (1, 10, 250)], "lid long, ls long, le long"
    )  # same values twice, spans 3 buckets at B=100
    right = spark.createDataFrame([(7, 200, 300)], "rid long, rs long, re long")
    out = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", bucket=100
    ).collect()
    assert len(out) == 2 and all((r.lid, r.rid) == (1, 7) for r in out)
