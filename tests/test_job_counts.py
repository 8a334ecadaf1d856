"""Spark-job-count regression pins (VERDICT r15 #5).

Wall-clock on the bench/driver boxes swings ±20-70% between sessions
(CLAUDE.md), so the TxTable tier's r15 optimizations were repeatedly
flagged by raw seconds while their job counts had demonstrably
dropped.  Job counts are DETERMINISTIC and box-independent — measured
identical at sf0.001/sf0.1 and at 8/32 shuffle partitions — so this
test enforces them as ceilings: a future change that re-introduces a
removed scan/pass fails here on any box, while further cuts pass.

Counts come from tools/count_jobs.py's marker-job bracketing (job ids
are monotone ints; two marker jobs in a named group bound the query's
submissions exactly).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

from count_jobs import count_jobs  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"

# Measured ceilings (r16 HEAD, stable across SF and shuffle-partition
# settings).  A legitimate optimization may LOWER a count — update the
# pin with the new measurement in the same commit.
JOB_CEILINGS = {
    "q_txtable_zorder": 10,
    "q_txtable_replace_range": 15,
    "q_txtable_identity": 16,
    "q_txtable_constraint": 17,
    "q_txtable_merge": 20,
    "q_txtable_delete_dv": 26,
    "q_txtable_maintain": 28,
    "q_txtable_cdf_cow": 32,
    "q_graph_closure": 19,
    "q_dedup_fuzzy": 30,
    "q_dedup_pipeline": 59,
}


@pytest.mark.parametrize("qid", sorted(JOB_CEILINGS))
def test_job_count_ceiling(spark, qid):
    n = count_jobs(spark, qid, SF_SMALL)
    assert n <= JOB_CEILINGS[qid], (
        f"{qid} now submits {n} Spark jobs (ceiling "
        f"{JOB_CEILINGS[qid]}): a removed scan/pass came back — see "
        "tools/count_jobs.py and OPTIMIZATION_r16.md"
    )
