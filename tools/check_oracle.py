"""Local replica of the driver's t2 correctness gate.

Runs every registered query against the DuckDB oracle at the given
scale factor and reports row-count / schema-ish / value mismatches.
Usage:  python tools/check_oracle.py [sf_dir] [query_id ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_cell(x) for x in v)
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    return v


def canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


def _arrow_type_name(t) -> str:
    """Normalized arrow type label: timestamps compare tz-insensitively
    (Spark is always tz-aware, DuckDB naive; values align under the
    UTC session), everything else must match exactly."""
    import pyarrow as pa

    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit}]"
    if pa.types.is_large_string(t):
        return "string"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_arrow_type_name(t.value_type)}>"
    return str(t)


def driver_incompatible_cols(tbl) -> list[str]:
    """Columns the external driver's canonicalizer cannot hash: its
    pandas sort_values over raw columns crashes on list cells
    (TypeError: unhashable type 'list' — CORRECTNESS_r04's one red
    row).  Driver-facing queries must stringify arrays (array_join)
    or explode them; this check makes the violation fail locally."""
    import pyarrow as pa

    return [
        f.name
        for f in tbl.schema
        if pa.types.is_list(f.type)
        or pa.types.is_large_list(f.type)
        or pa.types.is_fixed_size_list(f.type)
        or pa.types.is_struct(f.type)
        or pa.types.is_map(f.type)
    ]


def compare_types(spark_tbl, oracle_tbl) -> list[str]:
    st = {f.name: _arrow_type_name(f.type) for f in spark_tbl.schema}
    ot = {f.name: _arrow_type_name(f.type) for f in oracle_tbl.schema}
    return [
        f"dtype[{c}] spark={st[c]} oracle={ot[c]}"
        for c in sorted(set(st) & set(ot))
        if st[c] != ot[c]
    ]


def compare(qid: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(oracle_df):
        problems.append(f"rowcount spark={len(spark_df)} oracle={len(oracle_df)}")
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        problems.append(f"columns spark={sc} oracle={oc}")
        return problems
    a, b = canon(spark_df), canon(oracle_df)
    n_bad = 0
    first = None
    for ra, rb in zip(a, b):
        if ra != rb:
            # tolerate float repr jitter check: exact match required
            n_bad += 1
            if first is None:
                first = (ra, rb)
    if n_bad:
        problems.append(f"{n_bad}/{len(a)} rows differ; first: {first}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from etl_pipeline_fresh_picked_leads_spark.queries import ORACLE, QUERIES
    from etl_pipeline_fresh_picked_leads_spark.session import build_session

    spark = build_session(shuffle_partitions="8")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = n_rows_only = n_err = 0
    for qid, fn in sorted(QUERIES.items()):
        if only and qid not in only:
            continue
        t0 = time.time()
        try:
            stbl = fn(spark, sf_dir).toArrow()
            sdf = stbl.to_pandas()
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR  {qid}: spark side raised: {exc}")
            n_err += 1
            continue
        bad_cols = driver_incompatible_cols(stbl)
        if qid not in ORACLE:
            n_rows_only += 1
            note = (
                f"  [warn: nested cols {bad_cols} — driver records "
                "rows-only so this passes, but do not promote to a "
                "SQL oracle without stringifying]"
                if bad_cols
                else ""
            )
            print(
                f"rows-only {qid}: {len(sdf)} rows  "
                f"({time.time()-t0:.1f}s){note}"
            )
            continue
        if bad_cols:
            n_fail += 1
            print(
                f"FAIL   {qid}: driver-incompatible nested columns "
                f"{bad_cols} (driver canonicalizer crashes on list "
                "cells; stringify with array_join or explode)"
            )
            continue
        try:
            # go through Arrow so DATE stays date (df() coerces to
            # datetime64 and would spuriously mismatch Spark dates)
            otbl = con.sql(ORACLE[qid]).arrow()
            odf = otbl.to_pandas()
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR  {qid}: oracle side raised: {exc}")
            n_err += 1
            continue
        problems = compare_types(stbl, otbl) + compare(qid, sdf, odf)
        if problems:
            n_fail += 1
            print(f"FAIL   {qid}: {'; '.join(problems)}")
        else:
            n_pass += 1
            print(f"pass   {qid} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
    print(
        f"\n== {n_pass} pass, {n_fail} fail, {n_err} error, "
        f"{n_rows_only} rows-only =="
    )
    return 1 if (n_fail or n_err) else 0


if __name__ == "__main__":
    raise SystemExit(main())
