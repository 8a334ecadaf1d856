"""Fast oracle gate: every SQL-oracle query at sf0.001 vs DuckDB —
the same comparison the driver runs at sf0.01 (SURVEY §5.2 item 1).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from etl_pipeline_fresh_picked_leads_spark.queries import ORACLE, QUERIES

from conftest import SF_SMALL
from tools.check_oracle import TABLES, compare, compare_types


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_SMALL, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def test_registry_complete():
    # every oracle has a query; substantial coverage overall
    assert set(ORACLE) <= set(QUERIES)
    assert len(QUERIES) >= 95
    assert len(ORACLE) >= 85


@pytest.mark.parametrize("qid", sorted(ORACLE))
def test_query_matches_oracle(spark, oracle_con, qid):
    stbl = QUERIES[qid](spark, SF_SMALL).toArrow()
    otbl = oracle_con.sql(ORACLE[qid]).arrow()
    problems = compare_types(stbl, otbl) + compare(
        qid, stbl.to_pandas(), otbl.to_pandas()
    )
    assert not problems, f"{qid}: {problems}"


@pytest.mark.parametrize("qid", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(spark, qid):
    df = QUERIES[qid](spark, SF_SMALL)
    assert df.count() >= 0  # runs without error, stable schema
    assert df.columns
