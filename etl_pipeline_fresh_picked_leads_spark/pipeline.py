"""Run orchestration: the reference's main() flow
(/root/reference/fresh_picked_leads.py:224-266, main.py:18-29) as an
engine entry point.

acquire -> ingest -> report, with the same failure discipline:
acquisition failure aborts before any load (fresh_picked_leads.py:
246-252 re-raises before the uploader runs), per-file load errors are
isolated (big_uery_handler.py:78-83).

Acquisition itself (the reference's Selenium bot, R1) is out of engine
scope — it is a pluggable callable that lands files into the landing
directory; the engine boundary is "CSV files appear" (SURVEY §2A R1).
"""

from __future__ import annotations

import logging
from collections.abc import Callable
from datetime import date

from pyspark.sql import SparkSession

from .sources.ingest import IngestResult, ingest_directory

log = logging.getLogger("etl_pipeline_fresh_picked_leads_spark")

Fetcher = Callable[[str], None]  # lands files into the landing dir


def configure_logging(log_file: str | None = None) -> None:
    """Console + optional file sink — the reference's Loguru setup
    (log_handler.py:24-40) on stdlib logging; executor-side events are
    in the Spark UI/event log, which replaces per-step print logging
    at scale."""
    handlers: list[logging.Handler] = [logging.StreamHandler()]
    if log_file:
        handlers.append(logging.FileHandler(log_file))
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s | %(levelname)-7s | %(name)s - %(message)s",
        handlers=handlers,
        force=True,
    )


Validator = Callable[[SparkSession, "IngestResult"], "DataFrame"]


def run_pipeline(
    spark: SparkSession,
    landing_dir: str,
    fetcher: Fetcher | None = None,
    run_date: date | None = None,
    validator: Validator | None = None,
) -> IngestResult:
    """Full daily run: optional acquisition, then directory ingest,
    then optional post-load validation.

    Mirrors fresh_picked_leads.py:224-266: if the fetcher raises, the
    run aborts before touching any table; ingest errors are per-file.

    ``validator`` receives (spark, result) and returns a violations
    DataFrame shaped like ``operators.dq.dq_report`` (check_name,
    n_violations); any violation row with n_violations > 0 is logged
    as an error and recorded on ``result.dq_violations`` — load
    success and data sanity are separate signals, the run itself does
    not abort (the reference has no DQ stage; this is the engine's
    extension point for one)."""
    if fetcher is not None:
        log.info("acquiring into %s", landing_dir)
        fetcher(landing_dir)  # raises -> abort before load (:246-252)
        log.info("acquisition complete")
    result = ingest_directory(spark, landing_dir, run_date=run_date)
    log.info(
        "ingest done: %d loaded, %d failed", len(result.loaded), len(result.failed)
    )
    for name, err in result.failed.items():
        log.error("failed %s: %s", name, err)
    if validator is not None:
        violations = {
            r.check_name: r.n_violations
            for r in validator(spark, result).collect()
            if r.n_violations > 0
        }
        for check, n in violations.items():
            log.error("dq check failed: %s (%d violations)", check, n)
        result.dq_violations = violations
    return result
