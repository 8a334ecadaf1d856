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


def test_local_gate_rejects_array_columns(spark):
    """VERDICT r4 #2 done-criterion: a deliberately array-returning
    SQL-oracle query must FAIL the local gate (the external driver's
    pandas canonicalizer crashes on list cells), and a stringified
    variant must pass the guard."""
    import sys as _sys

    _sys.path.insert(0, "/root/repo/tools")
    from check_oracle import driver_incompatible_cols

    bad = spark.createDataFrame(
        [(1, [1, 2])], "id int, qvec array<int>"
    ).toArrow()
    assert driver_incompatible_cols(bad) == ["qvec"]
    good = spark.sql(
        "SELECT 1 AS id, array_join(array('1','2'), ',') AS qvec"
    ).toArrow()
    assert driver_incompatible_cols(good) == []
    nested_struct = spark.sql(
        "SELECT named_struct('a', 1) AS s"
    ).toArrow()
    assert driver_incompatible_cols(nested_struct) == ["s"]
