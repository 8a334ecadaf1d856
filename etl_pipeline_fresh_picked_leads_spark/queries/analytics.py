"""Composite end-user analytics over the events stream: retention
cohorts and ordered funnels — the queries the reference's BigQuery
tables exist to serve downstream, expressed as multi-stage DataFrame
pipelines and oracle-checked end to end.

Scale shape: both queries reduce the event stream to per-user
aggregates first (map-side-combining shuffles keyed by user_id), then
operate on the user-sized — not event-sized — intermediate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import read_table
from .registry import query

# Weeks align on date_trunc boundaries (Monday start in both engines),
# so day-diffs are exact multiples of 7 and the division is exact.
_RETENTION_ORACLE = """
WITH act AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events
),
cohort AS (
  SELECT user_id, MIN(week) AS cohort_week FROM act GROUP BY 1
)
SELECT c.cohort_week,
       CAST(datediff('day', c.cohort_week, a.week) / 7 AS INT)
         AS week_offset,
       COUNT(*) AS n_users
FROM act a JOIN cohort c USING (user_id)
GROUP BY 1, 2
"""


@query("q_retention_cohorts", oracle=_RETENTION_ORACLE)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-active week,
    counted in each later week they return.  Events collapse to
    distinct (user, week) pairs before anything else, so the join and
    final aggregate run on user-sized data."""
    ev = read_table(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    cohort = act.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        act.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# epoch() in DuckDB vs cast-to-long in Spark both give UTC epoch
# seconds on the NTZ ts; ties (same user, same ts) break on event_id
# so the lag/cumsum is deterministic.
_SESSIONIZE_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS INT)
           AS session_idx
  FROM flagged
)
SELECT user_id, session_idx,
       COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sess GROUP BY 1, 2
"""


@query("q_sessionize_batch", oracle=_SESSIONIZE_ORACLE)
def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization in batch (30-min inactivity closes a
    session) — the lag/cumsum idiom: flag gap starts, running-sum the
    flags into session ids, aggregate.  One shuffle on user_id serves
    both windows AND the final group-by (same key, Exchange reuse);
    the batch twin of q_stream_session's session_window."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # NTZ has no direct long cast; NTZ -> TZ is identity under the
    # UTC session, and TZ -> long is epoch seconds (DuckDB epoch())
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap > 1800, 1).otherwise(0).alias("new_sess"),
    )
    sess = flagged.select(
        "user_id",
        "ts",
        F.sum("new_sess")
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .cast("int")
        .alias("session_idx"),
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


_DQ_ORACLE = """
SELECT 'l_quantity_in_range' AS check_name,
       COUNT(CASE WHEN l_quantity NOT BETWEEN 1 AND 50 OR l_quantity IS NULL
                  THEN 1 END) AS n_violations
FROM lineitem
UNION ALL
SELECT 'o_orderkey_unique',
       COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey)
FROM orders
UNION ALL
SELECT 'o_custkey_fk', COUNT(*)
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_custkey IS NULL
UNION ALL
SELECT 'l_shipdate_not_null',
       COUNT(CASE WHEN l_shipdate IS NULL THEN 1 END)
FROM lineitem
"""


@query("q_dq_report", oracle=_DQ_ORACLE)
def q_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations-style data-quality report (operators/dq.py):
    domain range, key uniqueness, referential integrity, and
    null-rate checks, each one fused aggregate pass (FK = anti-join
    against the projected key set), unioned into a violations table.
    The ingest layer's honest answer to 'did the load produce a sane
    table' beyond schema reconciliation."""
    from ..operators.dq import (
        check_foreign_key,
        check_not_null,
        check_predicate,
        check_unique,
        dq_report,
    )

    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    return dq_report(
        [
            check_predicate(
                li, "l_quantity_in_range", F.col("l_quantity").between(1, 50)
            ),
            check_unique(o, "o_orderkey_unique", "o_orderkey"),
            check_foreign_key(o, "o_custkey_fk", "o_custkey", c, "c_custkey"),
            check_not_null(li, "l_shipdate_not_null", "l_shipdate"),
        ]
    )


@query(
    "q_sketch_rollup",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS within_5pct
FROM events GROUP BY event_type
""",
)
def q_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup — the 100 TB pre-aggregation pattern:
    per-(event_type, day) HLL sketches of user_id are built once
    (map-side combinable), then UNIONED per event_type and estimated.
    Register-max union is associative and order-independent, so any
    date-range distinct count comes from merging stored daily
    sketches instead of rescanning raw events.

    The estimate has no SQL twin (DataSketches HLL), so — like
    q_agg_approx_cd — the oracle pins the CONTRACT: the two-level
    merged estimate must land within 5% of exact on every group
    (lgK=12 keeps it well inside).  Two-level-vs-direct equivalence
    is additionally pinned in tests.  (rows-only history: r1-r4)"""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    approx = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_approx")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return exact.join(F.broadcast(approx), "event_type").select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("_approx") - F.col("exact_users"))
            <= F.col("exact_users") * F.lit(0.05)
        ).alias("within_5pct"),
    )


_FUNNEL_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY 1
)
SELECT COUNT(t_view) AS viewed,
       COUNT(CASE WHEN t_click > t_view THEN 1 END) AS clicked_after_view,
       COUNT(CASE WHEN t_purchase > t_click AND t_click > t_view
                  THEN 1 END) AS purchased_after_click
FROM firsts
"""


@query("q_funnel_steps", oracle=_FUNNEL_ORACLE)
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view -> click -> purchase funnel: one conditional-
    aggregation pass to each user's first timestamp per step, then a
    global count of users whose steps happened in order.  No joins,
    no windows — two map-side-combining aggregations total."""
    ev = read_table(spark, sf_dir, "events")

    def first_ts(et: str):
        return F.min(F.when(F.col("event_type") == et, F.col("ts")))

    firsts = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    in_order = F.col("t_click") > F.col("t_view")
    return firsts.agg(
        F.count("t_view").alias("viewed"),
        F.count(F.when(in_order, 1)).alias("clicked_after_view"),
        F.count(
            F.when((F.col("t_purchase") > F.col("t_click")) & in_order, 1)
        ).alias("purchased_after_click"),
    )


_QUANTILE_ROLLUP_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(floor(value / 25.0) AS INT) AS bucket,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2, 3
),
merged AS (
  SELECT event_type, bucket, SUM(c) AS c
  FROM daily GROUP BY 1, 2
),
walk AS (
  SELECT event_type, bucket, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS total
  FROM merged
)
SELECT event_type,
       CAST(MAX(total) AS BIGINT) AS n,
       CAST(MIN(CASE WHEN cum >= 0.5 * total THEN bucket END) AS INT)
         AS p50_bucket,
       CAST(MIN(CASE WHEN cum >= 0.95 * total THEN bucket END) AS INT)
         AS p95_bucket
FROM walk GROUP BY event_type
"""


@query("q_sketch_quantile_rollup", oracle=_QUANTILE_ROLLUP_ORACLE)
def q_sketch_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable QUANTILE rollup — the histogram-sketch sibling of the
    HLL rollup: per-(event_type, day) fixed-width bucket counts are
    the stored daily sketch (map-side combinable), any date range
    merges by bucketwise addition (a groupBy SUM — associative,
    order-independent), and percentiles walk the merged histogram's
    cumulative counts.  Unlike t-digest/KLL this sketch has an exact
    SQL twin, so the whole two-level pipeline is hash-checked against
    the oracle rather than rows-only."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") / 25.0).cast("int").alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("c"))
    merged = daily.groupBy("event_type", "bucket").agg(F.sum("c").alias("c"))
    w = Window.partitionBy("event_type").orderBy("bucket")
    wt = Window.partitionBy("event_type")
    walk = merged.select(
        "event_type",
        "bucket",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(wt).alias("total"),
    )
    return walk.groupBy("event_type").agg(
        F.max("total").alias("n"),
        F.min(
            F.when(F.col("cum") >= 0.5 * F.col("total"), F.col("bucket"))
        ).alias("p50_bucket"),
        F.min(
            F.when(F.col("cum") >= 0.95 * F.col("total"), F.col("bucket"))
        ).alias("p95_bucket"),
    )


# OHLC bars: open/close picked by deterministic row order (ts,
# event_id) via mirrored ROW_NUMBERs on both engines.
_BARS_ORACLE = """
WITH b AS (
  SELECT event_type, CAST(floor(epoch(ts) / 900) AS BIGINT) AS bucket,
         ts, event_id, value
  FROM events
),
r AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                       ORDER BY ts, event_id) AS rn_a,
    ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                       ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM b
)
SELECT event_type, bucket,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       CAST(MAX(value) AS DOUBLE) AS high,
       CAST(MIN(value) AS DOUBLE) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       COUNT(*) AS n_events
FROM r GROUP BY event_type, bucket
"""


@query("q_time_bars", oracle=_BARS_ORACLE)
def q_time_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling to 15-minute OHLC bars — the downsample
    step every metrics/market pipeline runs.  Bucketing is a pure
    projection (epoch div), open/close are first/last by the
    deterministic (ts, event_id) order via two mirrored row_number
    windows; the window partitions and the final groupBy share the
    (event_type, bucket) key, so ONE shuffle serves all three."""
    from pyspark.sql.window import Window

    ev = read_table(spark, sf_dir, "events")
    epoch = F.col("ts").cast("timestamp").cast("long")
    b = ev.select(
        "event_type",
        F.floor(epoch / 900).cast("long").alias("bucket"),
        "ts",
        "event_id",
        "value",
    )
    wa = Window.partitionBy("event_type", "bucket").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = b.select(
        "*",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return r.groupBy("event_type", "bucket").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").cast("double").alias("high"),
        F.min("value").cast("double").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


# Forward fill: DuckDB lacks IGNORE NULLS in last_value, so the oracle
# derives the carried value via the max filled-position trick.
_FFILL_ORACLE = """
WITH planted AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
  FROM events
),
pos AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS rn
  FROM planted
),
grp AS (
  SELECT *, MAX(CASE WHEN v IS NOT NULL THEN rn END) OVER (
              PARTITION BY user_id ORDER BY rn
              ROWS UNBOUNDED PRECEDING) AS src_rn
  FROM pos
)
SELECT g.event_id, g.user_id, g.ts,
       s.v AS value_filled
FROM grp g LEFT JOIN pos s
  ON s.user_id = g.user_id AND s.rn = g.src_rn
"""


@query("q_win_fill_forward", oracle=_FFILL_ORACLE)
def q_win_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF gap filling (last observation carried forward): every 3rd
    reading is planted NULL, then filled from the user's most recent
    non-NULL value in (ts, event_id) order — one window, one shuffle,
    `last(..., ignorenulls=True)` doing the carry.  Leading NULLs
    (no prior observation) stay NULL."""
    from pyspark.sql.window import Window

    ev = read_table(spark, sf_dir, "events")
    planted = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_id") % 3 != 0, F.col("value")).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return planted.select(
        "event_id",
        "user_id",
        "ts",
        F.last("v", ignorenulls=True).over(w).alias("value_filled"),
    )


# Date spine: every (event_type, day) in the observed global range,
# zero-filled where no events happened.
_DENSIFY_ORACLE = """
WITH bounds AS (
  SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi
  FROM events
),
spine AS (
  SELECT t.event_type, CAST(b.lo + to_days(CAST(i AS INT)) AS DATE) AS day
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN bounds b
  CROSS JOIN generate_series(0, 5000) s(i)
  WHERE b.lo + to_days(CAST(i AS INT)) <= b.hi
),
daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT s.event_type, s.day, COALESCE(daily.n, 0) AS n_events
FROM spine s LEFT JOIN daily USING (event_type, day)
"""


@query("q_time_densify", oracle=_DENSIFY_ORACLE)
def q_time_densify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification: a (event_type x day) spine over the
    observed range, zero-filled where nothing happened — the step that
    turns sparse event aggregates into chartable/LOCF-able series
    (missing-row creation; q_win_fill_forward fills missing VALUES).
    The spine is a 1-row bounds aggregate broadcast into a
    sequence-explode — spine size = types x days, never event-scan
    sized; daily counts shuffle once."""
    ev = read_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    types = ev.select("event_type").distinct()
    spine = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi")).alias("day"),
        )
    )
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return spine.join(daily, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce("n", F.lit(0)).alias("n_events"),
    )


# Rolling 7-day distinct users per day via the expand-contribution
# trick; trailing days beyond the data's max drop.
_ROLLING_DISTINCT_ORACLE = """
WITH act AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM act),
contrib AS (
  SELECT a.user_id, CAST(a.day + to_days(CAST(i AS INT)) AS DATE) AS obs_day
  FROM act a CROSS JOIN generate_series(0, 6) s(i)
)
SELECT c.obs_day AS day, COUNT(DISTINCT c.user_id) AS wau_7d
FROM contrib c, bounds b
WHERE c.obs_day <= b.hi
GROUP BY c.obs_day
"""


@query("q_win_rolling_distinct", oracle=_ROLLING_DISTINCT_ORACLE)
def q_win_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users (WAU) per day — DISTINCT defeats
    partial aggregation over sliding frames, so the scalable exact
    shape is the EXPAND-CONTRIBUTION trick: collapse to distinct
    (user, day) pairs first (event-scale -> user-day-scale), explode
    each pair into the <=7 observation days it serves, then one
    count-distinct groupBy.  Shuffle carries user-day pairs x 7, never
    raw events; the window never materializes per-day user sets."""
    ev = read_table(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    hi = act.agg(F.max("day").alias("hi"))
    contrib = act.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("obs_day"),
    )
    return (
        contrib.crossJoin(F.broadcast(hi))
        .filter(F.col("obs_day") <= F.col("hi"))
        .groupBy(F.col("obs_day").alias("day"))
        .agg(F.countDistinct("user_id").alias("wau_7d"))
    )


@query(
    "q_sketch_rolling_wau",
    oracle="""
WITH act AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
bounds AS (SELECT MAX(day) AS hi FROM act),
contrib AS (
  SELECT a.user_id, CAST(a.day + to_days(CAST(i AS INT)) AS DATE) AS obs_day
  FROM act a CROSS JOIN generate_series(0, 6) s(i)
)
SELECT c.obs_day AS day, COUNT(DISTINCT c.user_id) AS exact_wau,
       TRUE AS within_5pct
FROM contrib c, bounds b WHERE c.obs_day <= b.hi
GROUP BY c.obs_day
""",
)
def q_sketch_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users, SKETCH tier: one HLL sketch per
    day (events-scale pass, map-side combinable), then a RANGE-framed
    window UNION of the trailing 7 sketches — the stored-sketch shape
    that answers any rolling-distinct window from day-sized state
    instead of re-expanding user-day pairs (q_win_rolling_distinct is
    the exact tier).  Register-max union is associative, so the same
    daily sketches serve WAU/MAU/arbitrary ranges.  Contract oracle
    (like q_agg_approx_cd): estimate within 5% of exact on every day."""
    from pyspark.sql.window import Window

    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    # Densify over the full obs-day spine BEFORE the window (ADVICE
    # r5): a calendar-gap day that still falls inside some active
    # day's trailing 7-day window must get an approx row — the exact
    # side and the DuckDB oracle both emit it — contributing no sketch
    # of its own (hll_union_agg skips NULL sketches).  sf0.01's 30
    # days happen to be dense; a driver dataset with a gap is not.
    spine = daily.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day")
    ).distinct()
    dense = spine.join(daily, "day", "left")
    # RANGE frame on the epoch-day number: ROWS would silently span
    # more than 7 calendar days across gaps.  This window is global
    # BY DESIGN and day-scale, not data-scale — its input is one
    # HLL sketch per calendar day (~365 rows/year at any corpus
    # size; the events-scale reduction happened in the groupBy
    # above), so the single-partition WindowExec holds kilobytes.
    dayno = F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    w = Window.orderBy(dayno).rangeBetween(-6, 0)
    approx = dense.select(
        "day",
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w)).alias("_approx"),
    )
    exact = (
        ev.select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
            ).alias("day"),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("exact_wau"))
    )
    hi = daily.agg(F.max("day").alias("hi"))
    return (
        exact.join(approx, "day")
        .crossJoin(F.broadcast(hi))
        .filter(F.col("day") <= F.col("hi"))
        .select(
            "day",
            "exact_wau",
            (
                F.abs(F.col("_approx") - F.col("exact_wau"))
                <= F.col("exact_wau") * F.lit(0.05)
            ).alias("within_5pct"),
        )
    )


# Recursive CTE (r6 — Spark 4 WITH RECURSIVE): per-event session-ROOT
# resolution by walking the prev-event chain.  The recursion is LINEAR
# (each event has at most one predecessor edge, so every event appears
# exactly once per step and the working set only shrinks) — the shape
# recursive CTEs are safe for at scale, unlike closure over a cyclic
# or high-fanout graph.  The DuckDB oracle derives the same roots
# NON-recursively (gaps-and-islands + FIRST_VALUE), pinning
# cross-paradigm equivalence.
_SQL_RECURSIVE_ORACLE = """
WITH lagd AS (
  SELECT event_id, user_id, ts,
         LAG(ts) OVER w AS prev_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT event_id, user_id, ts,
         SUM(CASE WHEN prev_ts IS NULL
                    OR ts - prev_ts > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS sid
  FROM lagd
)
SELECT event_id,
       FIRST_VALUE(event_id)
         OVER (PARTITION BY user_id, sid ORDER BY ts, event_id)
         AS root_id
FROM sess
"""


@query("q_sql_recursive", oracle=_SQL_RECURSIVE_ORACLE)
def q_sql_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE session-root resolution: session starts seed the
    recursion with themselves; every chained event (previous same-user
    event within 30 min) inherits its predecessor's root, one hop per
    iteration.  Linear recursion — each event joins exactly one
    predecessor — so iterations = longest chain and total work is
    O(events x depth)."""
    from pyspark.sql.window import Window

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.unix_micros(F.col("prev_ts").cast("timestamp"))
    lagged = (
        ev.withColumn("prev_id", F.lag("event_id").over(w))
        .withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "chained",
            F.col("prev_ts").isNotNull() & (us - prev_us <= 1_800_000_000),
        )
    )
    from ..session import raised_conf

    lagged.createOrReplaceTempView("rcte_events")
    # Headroom for long chains (conf name is Spark 4+) — but the limit
    # must not leak to the shared session (ADVICE r6).  The limit is
    # read at EXECUTION, not analysis, so the result materializes
    # eagerly (localCheckpoint) inside the raised-conf window.
    with raised_conf(spark, "spark.sql.cteRecursionLevelLimit", "10000"):
        return spark.sql(
            """
            WITH RECURSIVE root(event_id, root_id) AS (
              SELECT event_id, event_id FROM rcte_events WHERE NOT chained
              UNION ALL
              SELECT c.event_id, r.root_id
              FROM rcte_events c JOIN root r ON c.prev_id = r.event_id
              WHERE c.chained
            )
            SELECT event_id, root_id FROM root
            """
        ).localCheckpoint(eager=True)


# Planted graph shapes with closed-form (non-recursive) roots: the
# FOREST part chains each customer to its predecessor key within a
# modulo bucket (pointer-chase terminus = the bucket minimum, exactly
# MIN() OVER the bucket partition); the CYCLE part rings the nation
# keys (closure's star fallback canonicalizes to the component
# minimum = the global MIN).  Both derivable without recursion, so
# the oracle pins the two backends' RESULTS while the in-query
# asserts pin the SELECTION.
_GRAPH_CLOSURE_ORACLE = """
SELECT 'forest' AS part,
       CAST(c_custkey AS BIGINT) AS id,
       CAST(MIN(c_custkey) OVER (PARTITION BY c_custkey % 389) AS BIGINT)
         AS root
FROM customer
UNION ALL
SELECT 'cycle',
       CAST(n_nationkey AS BIGINT),
       CAST((SELECT MIN(n_nationkey) FROM nation) AS BIGINT)
FROM nation
"""


@query("q_graph_closure", oracle=_GRAPH_CLOSURE_ORACLE)
def q_graph_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure with AUTOMATIC backend selection
    (operators/graph.py closure, VERDICT r7 item 6): one call on a
    planted FOREST (per-bucket predecessor chains over customer —
    depth grows linearly with SF, resolved in ceil(log2 depth)
    pointer-doubling rounds with parquet-spilled iterations), one on
    a planted CYCLE (nation keys in a ring — the doubling probe
    detects no-fixpoint within its log2|V| bound and falls back to
    large-star/small-star components).  The asserts pin which backend
    each shape selected; the oracle pins both results in closed form.
    At 100 TB the selection is the point: a recursive walk is
    O(depth) full-table joins and never terminates on cycles, while
    doubling is O(log depth) and star O(log^2 n)."""
    from pyspark.sql.window import Window

    from ..operators import graph

    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("bigint").alias("id")
    )
    bucket_w = Window.partitionBy(F.col("id") % 389).orderBy("id")
    forest_edges = (
        cust.withColumn("parent", F.lag("id").over(bucket_w))
        .filter(F.col("parent").isNotNull())
        .select(F.col("id").alias("child"), "parent")
    )
    forest = graph.closure(cust, forest_edges)
    assert graph.LAST_BACKEND == "doubling", graph.LAST_BACKEND

    nation = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("bigint").alias("id")
    )
    # ring: each key points at the next, the max wraps to the min —
    # a 25-row dim, so the global window is partition-count-sized
    ring_w = Window.orderBy("id")
    all_w = Window.orderBy("id").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cycle_edges = nation.select(
        F.col("id").alias("child"),
        F.coalesce(F.lead("id").over(ring_w), F.min("id").over(all_w)).alias(
            "parent"
        ),
    )
    cycle = graph.closure(nation, cycle_edges)
    assert graph.LAST_BACKEND == "star", graph.LAST_BACKEND

    return forest.select(F.lit("forest").alias("part"), "id", "root").unionAll(
        cycle.select(F.lit("cycle").alias("part"), "id", "root")
    )
