"""Physical-plan hygiene: the 100 TB contract enforced on explain
output — pushdown, broadcast, top-k plan shape, shuffle counts
(SURVEY §4.3 'free vs custom' dividing line).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_pipeline_fresh_picked_leads_spark.plans import (
    formatted_plan,
    has_broadcast_join,
    has_pushed_filters,
    has_take_ordered,
    has_wholestage_codegen,
    n_exchanges,
)
from etl_pipeline_fresh_picked_leads_spark.queries import QUERIES
from etl_pipeline_fresh_picked_leads_spark.sources.readers import read_table

from conftest import SF_SMALL


def test_filter_pushdown_reaches_scan(spark):
    df = QUERIES["q_filter_cmp"](spark, SF_SMALL)
    assert has_pushed_filters(df, "l_quantity")


def test_column_pruning_reaches_scan(spark):
    df = read_table(spark, SF_SMALL, "lineitem").select("l_orderkey")
    plan = formatted_plan(df)
    # ReadSchema must not include unprojected columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in read_schema
    assert "l_comment" not in read_schema and "l_extendedprice" not in read_schema


def test_dim_joins_broadcast(spark):
    assert has_broadcast_join(QUERIES["q_join_broadcast"](spark, SF_SMALL))
    # stream-static enrich also broadcasts (same rule)
    assert has_broadcast_join(QUERIES["q_join_inner"](spark, SF_SMALL))


def test_global_topk_avoids_total_sort(spark):
    assert has_take_ordered(QUERIES["q_topk_global"](spark, SF_SMALL))


def test_flagship_minimal_shuffles(spark):
    # scan -> partial agg -> exchange -> final agg -> sort exchange: 2
    df = QUERIES["q_agg_group"](spark, SF_SMALL)
    assert n_exchanges(df) <= 2, formatted_plan(df)


def test_whole_stage_codegen_on_hot_path(spark):
    assert has_wholestage_codegen(QUERIES["q_agg_group"](spark, SF_SMALL))


def test_no_python_udf_in_relational_queries(spark):
    # Python only where declared (UDF/extension queries); relational
    # surface must stay JVM-side.  The ngram pipeline is pinned at the
    # OPERATOR: its registered query eagerly checkpoints to release
    # shingle caches (r7), which hides the pipeline from the
    # query-level plan.
    from etl_pipeline_fresh_picked_leads_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    for qid in ["q_agg_group", "q_join_inner", "q_win_running", "q_pivot",
                "q_text_stats"]:
        plan = formatted_plan(QUERIES[qid](spark, SF_SMALL))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, qid
    docs = read_table(spark, SF_SMALL, "documents")
    plan = formatted_plan(ngram_jaccard_pairs(docs, threshold=0.35))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_partial_aggregation_before_shuffle(spark):
    plan = formatted_plan(QUERIES["q_agg_group"](spark, SF_SMALL))
    # partial_ functions before the exchange = map-side combine
    assert "partial_" in plan


def test_semi_join_does_not_materialize_right(spark):
    plan = formatted_plan(QUERIES["q_join_semi"](spark, SF_SMALL))
    assert "LeftSemi" in plan


def test_partitioned_write_prunes_at_scan(spark):
    from datetime import date

    from etl_pipeline_fresh_picked_leads_spark.sources.ingest import (
        stamp_ingestion_date,
    )
    from etl_pipeline_fresh_picked_leads_spark.sources.sinks import (
        read_partition,
        write_partitioned,
    )

    o = read_table(spark, SF_SMALL, "orders").select("o_orderkey")
    write_partitioned(
        stamp_ingestion_date(o, date(2024, 6, 1)), "orders_part", mode="overwrite"
    )
    write_partitioned(stamp_ingestion_date(o, date(2024, 6, 2)), "orders_part")
    one_day = read_partition(
        spark, "orders_part", "Ingestion_date", date(2024, 6, 2)
    )
    plan = formatted_plan(one_day)
    # planner prunes to the single partition directory
    assert "PartitionFilters" in plan and "Ingestion_date" in plan
    assert one_day.count() == o.count()
    assert spark.table("orders_part").count() == 2 * o.count()


def test_pii_redact_is_map_only(spark):
    """Redaction is a pure per-row expression pipeline: no Exchange,
    no Python, inside whole-stage codegen."""
    df = QUERIES["q_text_pii_redact"](spark, SF_SMALL)
    assert n_exchanges(df) == 0, formatted_plan(df)
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert has_wholestage_codegen(df)


def test_repetition_partial_aggregates(spark):
    """Both aggregations of the bigram pipeline must combine map-side
    (the shuffle carries per-(doc,gram) partials, not raw bigrams)."""
    df = QUERIES["q_text_repetition"](spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "partial_" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_tfidf_broadcasts_corpus_count(spark):
    """The 1-row corpus-size aggregate must broadcast into the score
    projection, never shuffle against the vocab-sized tf table.
    Probed at the OPERATOR with caller-owned pins (r14: the pin-less
    path checkpoints to release the tf cache, truncating the plan)."""
    from etl_pipeline_fresh_picked_leads_spark.operators.text import (
        tfidf_top_terms,
    )

    pins: list = []
    df = tfidf_top_terms(
        read_table(spark, SF_SMALL, "documents"), k=3, pins=pins
    )
    try:
        plan = formatted_plan(df)
        assert (
            "BroadcastNestedLoopJoin" in plan
            or "BroadcastHashJoin" in plan
        )
        assert "partial_count" in plan  # tf/df aggregates combine map-side
    finally:
        for p in pins:
            p.unpersist()


def test_funnel_is_two_aggregations_no_joins(spark):
    """Funnel = conditional aggregation, not joins: exactly the
    per-user shuffle plus the global reduce, no Join operator."""
    df = QUERIES["q_funnel_steps"](spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "Join" not in plan, plan
    assert n_exchanges(df) == 2, plan
    assert "partial_min" in plan  # first-ts per step combines map-side


def test_retention_reduces_before_join(spark):
    """The cohort join happens on distinct (user, week) pairs, not raw
    events: HashAggregate (distinct) must sit below the join."""
    df = QUERIES["q_retention_cohorts"](spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "partial_min" in plan or "partial_first" in plan
    assert df.count() > 0


def test_sessionize_single_shuffle(spark):
    """lag window, cumsum window and final group-by all key on
    user_id (or a superset), so ONE Exchange serves the whole plan."""
    df = QUERIES["q_sessionize_batch"](spark, SF_SMALL)
    assert n_exchanges(df) == 1, formatted_plan(df)


def test_dq_fk_check_broadcasts(spark):
    """The referential check anti-joins against the projected parent
    KEY SET — dimension-sized, so it must broadcast."""
    df = QUERIES["q_dq_report"](spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_quantize_is_map_only_after_stats(spark):
    # the dim-stats pass runs eagerly at build time; the RETURNED plan
    # must be a pure map (nested-literal bounds, no shuffle, no Python)
    df = QUERIES["q_embed_quantize"](spark, SF_SMALL)
    assert n_exchanges(df) == 0, formatted_plan(df)
    plan = formatted_plan(df)
    assert "Python" not in plan and "Arrow" not in plan


def test_dup_spans_three_shuffles_and_broadcast_dup_grams(spark):
    # positional-gram groupBy + doc window + final doc groupBy = 3;
    # the dup-gram set joins back as a broadcast, never a shuffle of
    # the full gram-instance table a second time.  Probed at the
    # OPERATOR with caller-owned pins: the registered query releases
    # its grams cache via checkpoint (r14), which truncates the
    # returned plan to Scan ExistingRDD and would make these asserts
    # vacuous.
    from etl_pipeline_fresh_picked_leads_spark.operators.text import (
        dup_span_signals,
    )

    pins: list = []
    df = dup_span_signals(
        read_table(spark, SF_SMALL, "documents"), n=5, pins=pins
    )
    try:
        assert n_exchanges(df) <= 3, formatted_plan(df)
        assert has_broadcast_join(df)
    finally:
        for p in pins:
            p.unpersist()


def test_bucketed_join_query_has_zero_exchanges(spark):
    df = QUERIES["q_join_bucketed"](spark, SF_SMALL)
    assert n_exchanges(df) == 0, formatted_plan(df)


def test_incremental_dedup_shuffle_budget(spark):
    """Batch-vs-index LSH: band-key join + jaccard verify + the r12
    batch-side identical-set collapse (one window shuffle on the
    sorted shingle key + the member re-expansion) = 5 exchanges, all
    on the BATCH side; the signature index joins in without ever
    re-reading corpus text, and the small batch side broadcasts.  No
    Python anywhere (JVM minhash folds + array_sort collapse)."""
    # pin the OPERATOR plan (the r6 query wraps it in an exact-pairs
    # contract join whose ngram side has its own plan)
    import hashlib
    import tempfile

    from etl_pipeline_fresh_picked_leads_spark.operators.dedup import (
        incremental_lsh_pairs,
        minhash_signatures,
    )
    from etl_pipeline_fresh_picked_leads_spark.sources.txtable import TxTable

    docs = read_table(spark, SF_SMALL, "documents")
    root = os.path.join(
        tempfile.gettempdir(),
        "fpl_spark_scratch",
        "lsh_index_plan",
        hashlib.sha1(SF_SMALL.encode()).hexdigest()[:12],
    )
    TxTable.create(
        spark, root, minhash_signatures(docs.filter(F.col("doc_id") % 5 != 0))
    )
    pins = []  # caller-owned caches: keeps the returned plan lazy
    # (pins=None eagerly checkpoints, which would hide the plan)
    df = incremental_lsh_pairs(
        docs.filter(F.col("doc_id") % 5 == 0),
        root,
        threshold=0.5,
        update_index=False,
        pins=pins,
    )
    plan = formatted_plan(df)
    assert n_exchanges(df) <= 5, plan
    assert has_broadcast_join(df)
    assert "Python" not in plan and "Arrow" not in plan
    for p in pins:
        p.unpersist()


def test_ivf_join_final_plan_single_shuffle(spark):
    """After the eager (cached) k-means fit, the RETURNED plan is:
    map-only centroid assignment (nested-literal centroids) ->
    cell-key join -> verify — one data shuffle, centroids broadcast,
    all-JVM expressions."""
    # pin the OPERATOR plan (the r6 query emits the exact pair set —
    # which is Arrow blocked-matmul by design — plus the IVF recall
    # contract; the IVF pipeline itself must stay all-JVM)
    from etl_pipeline_fresh_picked_leads_spark.operators.similarity import (
        ivf_self_join,
    )

    # pins=[] keeps cache lifetime with the test so the RETURNED frame
    # is the real pipeline plan — pin-less calls self-release via
    # localCheckpoint (r8 cache hygiene), which truncates the plan to
    # Scan ExistingRDD and would make these asserts vacuous
    pins: list = []
    df = ivf_self_join(
        read_table(spark, SF_SMALL, "embeddings"), threshold=0.4, pins=pins
    )
    try:
        plan = formatted_plan(df)
        assert n_exchanges(df) <= 2, plan
        assert has_broadcast_join(df)
        assert "Python" not in plan and "Arrow" not in plan
    finally:
        for p in pins:
            p.unpersist()


def test_cluster_star_bounded_lineage(spark, monkeypatch):
    """Star CC localCheckpoints per round, so the final plan's
    exchange count is bounded by the LAST round's shape (label join +
    group) — NOT proportional to the number of rounds.  A lineage
    leak would blow this bound on any multi-round input.  Pinned on
    the OPERATOR composition (r7: the registered query checkpoints to
    release shingle caches, hiding the lineage from its plan).
    r15: forces the DISTRIBUTED loop — the scale-adaptive local
    finish would otherwise take over on this broadcast-class graph
    and there would be no round lineage to bound."""
    monkeypatch.setenv("SPARK_GRAFT_GRAPH_LOCAL_ROWS", "0")
    from etl_pipeline_fresh_picked_leads_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from etl_pipeline_fresh_picked_leads_spark.operators.graph import (
        dedup_clusters,
    )

    docs = read_table(spark, SF_SMALL, "documents")
    df = dedup_clusters(
        docs, ngram_jaccard_pairs(docs, threshold=0.35), algorithm="star"
    )
    plan = formatted_plan(df)
    assert n_exchanges(df) <= 6, plan
    assert "Python" not in plan and "Arrow" not in plan


def test_pointintime_join_broadcasts_dimension(spark):
    """The SCD2 version table is dimension-sized: it must broadcast
    into the fact scan — a shuffled interval join of the 100 TB fact
    side would be the classic temporal-join scale-killer."""
    df = QUERIES["q_join_pointintime"](spark, SF_SMALL)
    assert has_broadcast_join(df)
    plan = formatted_plan(df)
    assert "SortMergeJoin" not in plan, plan


def test_tpch_composites_plan_shape(spark):
    """The composite benchmark queries must compose the right physical
    pieces: dimension chains broadcast, top-k limits plan as
    TakeOrdered (no global sort), revenue aggregates combine
    map-side."""
    q3 = QUERIES["q_tpch_q3"](spark, SF_SMALL)
    assert has_broadcast_join(q3)
    assert has_take_ordered(q3), formatted_plan(q3)
    q5 = QUERIES["q_tpch_q5"](spark, SF_SMALL)
    assert has_broadcast_join(q5)
    assert "partial_sum" in formatted_plan(q5)
    q10 = QUERIES["q_tpch_q10"](spark, SF_SMALL)
    assert has_take_ordered(q10), formatted_plan(q10)


def test_densify_spine_is_broadcast_and_single_event_shuffle(spark):
    """The (type x day) spine derives from a 1-row bounds aggregate
    and a distinct-types set — both broadcast; the event stream
    shuffles once for the daily counts."""
    df = QUERIES["q_time_densify"](spark, SF_SMALL)
    plan = formatted_plan(df)
    assert has_broadcast_join(df)
    assert "partial_count" in plan or "partial_" in plan
    assert "Python" not in plan and "Arrow" not in plan


def test_triangle_census_all_jvm(spark):
    df = QUERIES["q_graph_triangles"](spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "Python" not in plan and "Arrow" not in plan


def test_embed_pool_partial_aggregates(spark):
    """Pooling combines map-side: the shuffle carries (label, pos)
    partial sums, not raw exploded components."""
    df = QUERIES["q_embed_pool"](spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "partial_sum" in plan
    assert "Python" not in plan and "Arrow" not in plan


def test_batch_topk_broadcasts_queries_and_pretrims(spark):
    """The query set broadcasts (corpus never shuffles for scoring)
    and the per-query limit pre-trims map-side (WindowGroupLimit):
    each mapper ships <= k rows per query, not the scored corpus."""
    df = QUERIES["q_sim_topk_batch"](spark, SF_SMALL)
    plan = formatted_plan(df)
    # the scoring join is a broadcast CROSS join (BNLJ BuildRight)
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "WindowGroupLimit" in plan, plan
    assert "Python" not in plan and "Arrow" not in plan


def test_rolling_distinct_has_no_window_operator(spark):
    """The expand-contribution WAU must plan as pure aggregates +
    explode — no Window over per-day user sets, events collapsed to
    distinct pairs before the explode."""
    df = QUERIES["q_win_rolling_distinct"](spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "Window" not in plan, plan
    assert has_broadcast_join(df) or "BroadcastNestedLoopJoin" in plan
    assert "Generate" in plan  # the 7-day contribution explode


def test_global_ntile_no_single_partition_window(spark):
    """VERDICT r5 item 3: the distributed NTILE must never plan an
    Exchange SinglePartition — the global rank comes from range
    partitioning + broadcast offsets, not a one-task sort."""
    plan = formatted_plan(QUERIES["q_win_ntile"](spark, SF_SMALL))
    assert "SinglePartition" not in plan
    assert "rangepartitioning" in plan.lower() or "LocalTableScan" not in plan


def test_global_range_frame_no_single_partition_window(spark):
    """Same contract for the value-RANGE running frame: boundary
    exchange via broadcast bounds join, frames evaluated inside range
    partitions, no single-partition WindowExec."""
    plan = formatted_plan(QUERIES["q_win_range"](spark, SF_SMALL))
    assert "SinglePartition" not in plan


def test_distwindow_matches_vanilla_on_ties_and_gaps(spark):
    """Equivalence of the distributed global-window operators vs the
    single-partition formulation on a tie-heavy, gappy value column —
    ties at a range-partition boundary are the dangerous case (they
    must co-locate; RANGE frames include all ties)."""
    from pyspark.sql.window import Window as W

    from etl_pipeline_fresh_picked_leads_spark.operators.distwindow import (
        global_rank,
        ntile_expr,
        range_frame_agg,
    )

    rows = [(i, float((i * 7) % 13) * 100.0) for i in range(400)]
    df = spark.createDataFrame(rows, "k long, v double")

    ranked, total = global_rank(df, ["v", "k"], npart=8)
    got_nt = {
        r["k"]: r["q"]
        for r in ranked.select("k", ntile_expr("_grank", total, 4).alias("q")).collect()
    }
    want_nt = {
        r["k"]: r["q"]
        for r in df.select(
            "k", F.ntile(4).over(W.orderBy("v", "k")).alias("q")
        ).collect()
    }
    assert got_nt == want_nt

    got_rs = {
        r["k"]: r["s"]
        for r in range_frame_agg(
            df, "v", 250, lambda w: F.sum("v").over(w), "s", npart=8
        ).collect()
    }
    want_rs = {
        r["k"]: r["s"]
        for r in df.select(
            "k",
            F.sum("v").over(W.orderBy("v").rangeBetween(-250, 0)).alias("s"),
        ).collect()
    }
    assert got_rs == want_rs


def test_lsh_verbatim_boilerplate_collapses_before_banding(spark):
    """VERDICT r11 item 2: a boilerplate-heavy corpus (verbatim copies
    of one page — the normal web-scale pathology) must NOT reach the
    band self-join one-row-per-doc: identical shingle sets collapse to
    one representative, so the candidate stage is O(distinct) where it
    used to be O(n^2) in the clone count (10^6 clones -> ~10^12
    candidate pairs before this fix).  The full pair set — including
    every (inherently quadratic) clone pair at jaccard 1.0 — must
    still come out of the member re-expansion."""
    from etl_pipeline_fresh_picked_leads_spark.operators.dedup import (
        _band_candidates,
        _collapse_groups,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    boiler = (
        "subscribe to our newsletter for updates terms of service apply "
        "all rights reserved contact us for more information today"
    )
    docs = read_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.lit(boiler))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    n_planted = docs.filter(F.col("doc_id") % 5 == 0).count()
    n_docs = docs.count()
    assert n_planted * 5 >= n_docs  # >= 20% of the corpus

    base = minhash_signatures(docs).persist()
    base.count()
    try:
        pins = []
        reps, members = _collapse_groups(base, pins=pins)
        n_reps = reps.count()
        # all clones -> ONE group: reps shrink by the clone count
        assert n_reps <= n_docs - (n_planted - 1)
        # candidate pairs are rep-level: bounded by reps^2, and in
        # particular FAR below the ~n_planted^2/2 the uncollapsed band
        # join would emit for the hot bucket alone
        n_cand = _band_candidates(reps).count()
        assert n_cand < n_planted * (n_planted - 1) // 4, n_cand
        for p in pins:
            p.unpersist()
    finally:
        base.unpersist()

    # end-to-end: every clone pair present at jaccard exactly 1.0
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    planted = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in pairs.filter(
            (F.col("doc_id_a") % 5 == 0) & (F.col("doc_id_b") % 5 == 0)
        ).collect()
    }
    clone_pairs = {
        (a, b)
        for a in range(0, 5 * n_planted, 5)
        for b in range(a + 5, 5 * n_planted, 5)
    }
    assert clone_pairs <= set(planted)
    assert all(planted[p] == 1.0 for p in clone_pairs)


def test_lsh_band_join_skew_split_active_and_exact(spark):
    """VERDICT r5 item 5: evidence (not just a claim) that AQE's
    skew-join split absorbs a pathological band key.  20% of a 2000-doc
    corpus is overwritten with NEAR-identical boilerplate (one
    doc-unique trailing token, so shingle sets differ and the
    identical-set collapse — which fully absorbs VERBATIM clones, see
    test above — cannot fire): pairwise jaccard 18/20 = 0.9, and most
    of the 8 band keys still collide across the planted docs -> hot
    band buckets survive into the self-join.  With the broadcast path
    disabled (both sides are fact-sized at 100 TB) and skew thresholds
    scaled to the test corpus (the detection RATIOS, not the
    mechanism, are what the small corpus can't hit at the 256 MB
    defaults), the executed plan must show skew=true and the pair set
    must equal the default-conf run bit-for-bit, with >= 99.9% of
    planted pairs present (banding at j=0.9 misses a pair with
    probability (1-0.81)^8 ~ 2e-6; the assert leaves regen headroom).
    """
    from etl_pipeline_fresh_picked_leads_spark.operators.dedup import (
        _band_candidates,
        _collapse_groups,
        minhash_signatures,
        verify_jaccard,
    )

    boiler = (
        "subscribe to our newsletter for updates terms of service apply "
        "all rights reserved contact us for more information today"
    )
    docs = read_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit(boiler + " marker"), F.col("doc_id")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    n_planted = docs.filter(F.col("doc_id") % 5 == 0).count()
    assert n_planted * 5 >= docs.count()  # >= 20% of the corpus

    def banded_pairs():
        base = minhash_signatures(docs).persist()
        base.count()
        pins = [base]
        reps, members = _collapse_groups(base, pins=pins)
        df = verify_jaccard(
            _band_candidates(reps), reps.select("doc_id", "sh"), 0.5
        )
        got = {(r.doc_id_a, r.doc_id_b) for r in df.collect()}
        plan = df._jdf.queryExecution().executedPlan().toString()
        for p in pins:
            p.unpersist()
        return got, plan

    baseline, _ = banded_pairs()
    planted_pairs = {
        (a, b) for a, b in baseline if a % 5 == 0 and b % 5 == 0
    }
    want = n_planted * (n_planted - 1) // 2
    assert len(planted_pairs) >= 0.999 * want, (len(planted_pairs), want)

    skew_confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8k",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k) for k in skew_confs}
    try:
        for k, v in skew_confs.items():
            spark.conf.set(k, v)
        got, plan = banded_pairs()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    assert "skew=true" in plan, "AQE skew-join split did not activate"
    assert got == baseline  # split changes the plan, never the pairs


def test_tpch_q17_decorrelated_and_q18_semijoin(spark):
    """Q17's correlated scalar subquery must DECORRELATE into a
    per-part aggregate joined back to the fact — no per-row subquery
    execution survives in the physical plan.  Q18's IN(GROUP BY ...
    HAVING) must plan as a LeftSemi against a partially-aggregated
    rollup, and the top-100 as TakeOrdered, not a global sort."""
    q17 = QUERIES["q_tpch_q17"](spark, SF_SMALL)
    p17 = formatted_plan(q17)
    assert "Subquery" not in p17, p17
    assert "partial_avg" in p17 or "partial_sum" in p17, p17
    q18 = QUERIES["q_tpch_q18"](spark, SF_SMALL)
    p18 = formatted_plan(q18)
    assert "LeftSemi" in p18, p18
    assert "partial_sum" in p18, p18
    assert has_take_ordered(q18), p18


def test_interval_join_is_equi_not_nested_loop(spark):
    """The interval overlap join must plan as an equi join on the
    bucket key (hash or sort-merge) — never a nested-loop product,
    which is what a bare theta overlap predicate degenerates to."""
    plan = formatted_plan(QUERIES["q_join_interval"](spark, SF_SMALL))
    assert "NestedLoop" not in plan, plan


def test_tpch_r7_shapes_no_cartesian_broadcast_dims(spark):
    """Round-7 TPC-H additions: none may degenerate to a cartesian /
    nested-loop product (an 8-table join with one missed equi-conjunct
    silently does); dimension chains broadcast; aggregates combine
    map-side.  Q2's correlated MIN over the derived part-supplier
    relation must fully decorrelate (no per-row subquery in the
    physical plan); Q11/Q15 keep their UNCORRELATED scalar subqueries
    (a broadcast 1-row reuse, legitimate at any scale)."""
    for qid in ("q_tpch_q2", "q_tpch_q7", "q_tpch_q8",
                "q_tpch_q9", "q_tpch_q11", "q_tpch_q15"):
        plan = formatted_plan(QUERIES[qid](spark, SF_SMALL))
        assert "CartesianProduct" not in plan, (qid, plan)
        assert "NestedLoop" not in plan, (qid, plan)
    q2 = formatted_plan(QUERIES["q_tpch_q2"](spark, SF_SMALL))
    assert "Subquery" not in q2, q2  # decorrelated, like Q17
    for qid in ("q_tpch_q7", "q_tpch_q8", "q_tpch_q9"):
        df = QUERIES[qid](spark, SF_SMALL)
        assert has_broadcast_join(df), formatted_plan(df)
        assert "partial_sum" in formatted_plan(df), qid
    q11 = formatted_plan(QUERIES["q_tpch_q11"](spark, SF_SMALL))
    assert "partial_sum" in q11, q11


def test_tpch_q11_single_fact_scan_via_exchange_reuse(spark):
    """r8 Q11 rewrite: deriving the global 0.1% threshold from the
    per-part aggregate makes the main stream and the scalar subquery
    share ONE canonical hashpartitioning(l_partkey) exchange — AQE
    must dedup it (ReusedExchange) so the fact scans+shuffles once.
    The reuse only materializes in the FINAL adaptive plan, so the
    query executes first — at SF_MEDIUM: the sf0.001 result is
    EMPTY and AQE's empty-relation propagation elides the exchanges
    entirely."""
    from conftest import SF_MEDIUM

    df = QUERIES["q_tpch_q11"](spark, SF_MEDIUM)
    df.collect()  # a noop WRITE would spawn a fresh queryExecution
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan and "hashpartitioning(l_partkey" in plan, (
        plan
    )


def test_graph_closure_query_backend_selection(spark):
    """q_graph_closure's in-query asserts pin that the forest picked
    pointer doubling and the cycle fell back to star; here we rerun
    the query end-to-end and check the recorder agrees with the
    LAST call (the cycle) plus the result's component structure."""
    from etl_pipeline_fresh_picked_leads_spark.operators import graph

    df = QUERIES["q_graph_closure"](spark, SF_SMALL)
    rows = df.collect()
    assert graph.LAST_BACKEND == "star"  # cycle ran last
    cyc = [r for r in rows if r.part == "cycle"]
    assert len({r.root for r in cyc}) == 1  # one ring component
    forest = [r for r in rows if r.part == "forest"]
    assert all(r.root <= r.id for r in forest)  # chain min terminus


def test_srp_lsh_signatures_cached_before_band_explode(spark):
    """srp_lsh_self_join must explode band keys from the PERSISTED
    signature frame (InMemoryTableScan under Generate): Generate
    re-evaluates an inline expensive child per OUTPUT element, so an
    unpersisted plan would recompute the planes x dim signature fold
    12x per row (the measured 16x shingle trap, dedup.py).  The
    candidate join must stay an equi-join on (band_id, band_key),
    never a nested loop."""
    from etl_pipeline_fresh_picked_leads_spark.operators.similarity import (
        srp_lsh_self_join,
    )

    emb = read_table(spark, SF_SMALL, "embeddings")
    pins: list = []
    df = srp_lsh_self_join(emb, threshold=0.9, pins=pins)
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
        gen_at = plan.find("Generate explode")
        assert gen_at != -1, plan[:2000]
        below = plan[gen_at:]
        assert "InMemoryTableScan" in below, "explode not fed by cache"
        # the expensive hyperplane fold lives in the cached child, not
        # under Generate: no zip_with (the dot kernel) in the explode
        assert "zip_with" not in plan[gen_at : gen_at + 4000].lower()
        assert "NestedLoop" not in plan
    finally:
        for p in pins:
            p.unpersist()


def test_dvless_txtable_read_plan_has_no_join(spark, tmp_path):
    """The deletion-vector None fast path (r9): a table that has never
    had a DV commit must read with the PRE-DV plan — a bare parquet
    scan, no anti-join, no _metadata projection — so r9 costs nothing
    on the overwhelmingly common DV-less read."""
    from etl_pipeline_fresh_picked_leads_spark.sources.txtable import (
        TxTable,
    )

    root = str(tmp_path / "t")
    t = TxTable.create(
        spark,
        root,
        spark.createDataFrame([(1, "a")], "k bigint, v string").coalesce(1),
    )
    plan = t.read()._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "_metadata" not in plan, plan

    # and once a vector exists: ONE anti-join, broadcastable side
    t.append(
        spark.createDataFrame([(2, "b")], "k bigint, v string").coalesce(1)
    )
    from pyspark.sql import functions as F

    t.delete_dv(F.col("k") == 1)
    plan2 = t.read()._jdf.queryExecution().executedPlan().toString()
    assert plan2.count("LeftAnti") == 1, plan2
    assert "BroadcastHashJoin" in plan2, "small DV side must broadcast"
