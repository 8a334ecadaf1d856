"""Driver-window rotation math, mechanized (the computation VERDICTs
r11-r13 each re-derived by hand from CORRECTNESS_r*.json).

Prints the newest-driver-green histogram, the current stale cohort
(every registered query whose newest green row is the oldest round
present), and a ready-to-paste _DRIVER_WINDOW candidate list:
canaries + the full stale cohort + however many slots remain for the
coming round's new queries.

    python tools/rotation.py [--canaries q1,q2,...]
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CANARIES = [
    "q_scan_parquet",
    "q_agg_group",
    "q_join_inner",
    "q_win_rownum",
    "q_topk_pergroup",
]
WINDOW = 50


def newest_green(repo_dir: str = REPO) -> dict[str, int]:
    out: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo_dir, "CORRECTNESS_r*.json"))):
        # parse from the BASENAME: a repo path containing "_r" would
        # otherwise split wrong
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        for q, v in json.load(open(f)).items():
            ok = (
                v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match") in (True, None)
                and not v.get("err")
            )
            if ok:
                out[q] = max(out.get(q, 0), rnd)
    return out


def main() -> None:
    canaries = CANARIES
    if len(sys.argv) > 2 and sys.argv[1] == "--canaries":
        canaries = sys.argv[2].split(",")
    green = newest_green()
    from etl_pipeline_fresh_picked_leads_spark.queries import QUERIES

    registered = list(QUERIES)
    never = sorted(q for q in registered if q not in green)
    hist: dict[int, int] = {}
    for q in registered:
        if q in green:
            hist[green[q]] = hist.get(green[q], 0) + 1
    print("newest-green histogram:", dict(sorted(hist.items())))
    if never:
        print(f"NEVER driver-green ({len(never)}) — window these first:")
        for q in never:
            print("   ", q)
    oldest = min(hist) if hist else None
    stale = sorted(
        q
        for q in registered
        if q in green and green[q] == oldest and q not in canaries
    )
    print(f"stale cohort (newest green = r{oldest}): {len(stale)}")
    front = canaries + never + stale
    spare = WINDOW - len(front)
    if spare < 0:
        print(
            f"WARNING: canaries + cohort = {len(front)} > {WINDOW}; "
            "split the cohort across two rounds (oldest-registered "
            "first) — do NOT silently truncate"
        )
    else:
        print(f"slots left for new queries: {spare}")
    print("\n_DRIVER_WINDOW candidate:")
    for q in front[:WINDOW]:
        print(f'    "{q}",')


if __name__ == "__main__":
    main()
