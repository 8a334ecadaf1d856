"""Regeneration robustness sweep (round-7 checklist item, now
repeatable): every planted-constant / literal-anchored oracle must
degrade to MATCHING (possibly empty) results — never a red row — if
the driver regenerates its testdata with different surface values.

Synthesizes a "regenerated" variant of an sf dir via DuckDB:
  - nation names renamed (NATION_i -> LAND_i)
  - every date/timestamp shifted +37 days
  - doc_id / vec_id shifted +1000 (still under the planted-clone
    offsets, which ASSERT on overflow by design)
then runs the full oracle gate against it.

    python tools/regen_sweep.py [sf_dir]      # default sf0.001

Exit code = the gate's.  Findings from the first run (r7): 197/198
matched immediately; q_sim_topk_vectorized raised on the missing
query vec 0 while its oracle returned empty — fixed to degrade
symmetrically (queries/extensions.py), after which both sf0.001 and
sf0.01 variants run 198/198.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

MODS = {
    "nation": (
        "SELECT n_nationkey, 'LAND_' || CAST(n_nationkey AS VARCHAR) "
        "AS n_name, n_regionkey FROM t"
    ),
    "orders": (
        "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, "
        "o_orderdate + INTERVAL 37 DAY AS o_orderdate, o_orderpriority "
        "FROM t"
    ),
    "lineitem": (
        "SELECT * REPLACE (l_shipdate + INTERVAL 37 DAY AS l_shipdate) FROM t"
    ),
    "events": "SELECT * REPLACE (ts + INTERVAL 37 DAY AS ts) FROM t",
    "documents": "SELECT * REPLACE (doc_id + 1000 AS doc_id) FROM t",
    "embeddings": "SELECT * REPLACE (vec_id + 1000 AS vec_id) FROM t",
}


def build_variant(src: str, dst: str | None = None) -> str:
    """Write the shifted-corpus variant of ``src`` and return its
    path — shared by the CLI below and tests/test_regen_sweep.py (the
    in-suite guard, VERDICT r8 #6)."""
    name = os.path.basename(src.rstrip("/"))
    dst = dst or f"/tmp/fpl_spark_scratch/regen_{name}"
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()
    for t in TABLES:
        q = MODS.get(t, "SELECT * FROM t")
        con.execute(
            f"CREATE OR REPLACE VIEW t AS SELECT * FROM '{src}/{t}.parquet'"
        )
        con.execute(f"COPY ({q}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    return dst


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = build_variant(src)
    print(f"regenerated variant written to {dst}; running gate...")
    return subprocess.call(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"), dst]
    )


if __name__ == "__main__":
    sys.exit(main())
