"""Capture .explain("formatted") for bench queries into plans/r16/.

Usage: python tools/capture_plans.py <suffix> [query_id ...]
  suffix: "before" or "after" — file name becomes
          plans/r16/<query>_<suffix>.txt
  with no query ids, captures every bench HEADLINE query.

Explain-only where possible: building the DataFrame may run the
imperative part of a query (TxTable fixture builds, streaming
replays) but the final frame itself is never executed.
"""

from __future__ import annotations

import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import HEADLINE  # noqa: E402
from etl_pipeline_fresh_picked_leads_spark.plans import formatted_plan  # noqa: E402
from etl_pipeline_fresh_picked_leads_spark.queries import QUERIES  # noqa: E402
from etl_pipeline_fresh_picked_leads_spark.session import build_session  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    qids = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for qid in qids:
        try:
            df = QUERIES[qid](spark, sf_dir)
            plan = formatted_plan(df)
        except Exception:
            plan = "CAPTURE FAILED:\n" + traceback.format_exc()
        with open(os.path.join(out_dir, f"{qid}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"captured {qid}_{suffix}")


if __name__ == "__main__":
    main()
