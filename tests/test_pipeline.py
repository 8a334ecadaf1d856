"""Orchestration tests: acquisition-failure abort and full-run flow
(fresh_picked_leads.py:224-266 semantics)."""

from __future__ import annotations

import os

import pytest

from etl_pipeline_fresh_picked_leads_spark.functions import (
    fetch_window,
    normalize_identifier,
    table_name_for_file,
)
from etl_pipeline_fresh_picked_leads_spark.pipeline import run_pipeline


def test_fetch_failure_aborts_before_load(spark, tmp_path):
    landing = str(tmp_path)
    with open(os.path.join(landing, "should_not_load.csv"), "w") as f:
        f.write("a\n1\n")

    def broken_fetcher(_dir: str) -> None:
        raise RuntimeError("site down")

    with pytest.raises(RuntimeError):
        run_pipeline(spark, landing, fetcher=broken_fetcher)
    # file untouched, table never created (:246-252)
    assert os.path.exists(os.path.join(landing, "should_not_load.csv"))
    assert not spark.catalog.tableExists("should_not_load")


def test_full_run_with_fetcher(spark, tmp_path):
    landing = str(tmp_path)

    def fetcher(d: str) -> None:
        with open(os.path.join(d, "fetched_tbl.csv"), "w") as f:
            f.write("k,v\n1,a\n2,b\n")

    result = run_pipeline(spark, landing, fetcher=fetcher)
    assert result.loaded == ["fetched_tbl.csv"] and not result.failed
    assert spark.table("fetched_tbl").count() == 2


def test_date_window_and_names():
    from datetime import date

    y, t = fetch_window(date(2024, 3, 1))
    assert (y, t) == (date(2024, 2, 29), date(2024, 3, 1))
    assert table_name_for_file("X/Y/Daily_Leads.CSV") == "daily_leads"
    assert normalize_identifier("9 Bad-Name!") == "t_9_bad_name_"


def test_post_load_validator_records_violations(spark, tmp_path):
    """DQ hook: violations are logged and recorded on the result, the
    run itself still succeeds (load success and data sanity are
    separate signals)."""
    from pyspark.sql import functions as F

    from etl_pipeline_fresh_picked_leads_spark.operators.dq import (
        check_not_null,
        check_predicate,
        dq_report,
    )

    landing = str(tmp_path)
    with open(os.path.join(landing, "leads_tbl.csv"), "w") as f:
        f.write("k,v\n1,a\n2,\n3,b\n")  # one NULL v

    def validator(s, _result):
        t = s.table("leads_tbl")
        return dq_report(
            [
                check_not_null(t, "v_not_null", "v"),
                check_predicate(t, "k_positive", F.col("k") > 0),
            ]
        )

    result = run_pipeline(spark, landing, validator=validator)
    assert result.loaded == ["leads_tbl.csv"] and not result.failed
    assert result.dq_violations == {"v_not_null": 1}  # passing check absent
