"""Deterministic Spark-job counts per bench query (VERDICT r15 #5).

Usage: python tools/count_jobs.py q_txtable_merge [q_... ] [sf_dir]

Counts the Spark jobs a query's construction + noop write submits by
bracketing it between marker jobs in a named job group: job ids are
monotone ints, so (marker2 - marker1 - 1) is exactly the number of
jobs the query ran.  Job counts are box-independent (the guide-§1
measure host noise cannot touch) — the same numbers are pinned as
regression tests in tests/test_job_counts.py.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from etl_pipeline_fresh_picked_leads_spark.queries import QUERIES  # noqa: E402
from etl_pipeline_fresh_picked_leads_spark.session import build_session  # noqa: E402


def _marker_job_id(spark) -> int:
    sc = spark.sparkContext
    sc.setJobGroup("jobcount-marker", "marker")
    try:
        spark.range(1).count()
    finally:
        sc.setJobGroup(None, None)
    ids = spark.sparkContext.statusTracker().getJobIdsForGroup(
        "jobcount-marker"
    )
    return max(ids)


def count_jobs(spark, qid: str, sf_dir: str) -> int:
    before = _marker_job_id(spark)
    QUERIES[qid](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    after = _marker_job_id(spark)
    return after - before - 1


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if args and os.path.isdir(args[-1]):
        sf_dir = args.pop()
    spark = build_session(app_name="count-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup (bench parity)
    QUERIES["q_agg_group"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    out = {qid: count_jobs(spark, qid, sf_dir) for qid in args}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
