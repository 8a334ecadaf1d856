"""Registration-vs-verification drift guard (VERDICT r5 item 2).

Round 5 registered 6 queries after the driver-window freeze; they
never received a driver row.  This test makes that failure mode loud:
every registered query ID must either (a) already have a non-failing
row in some historical ``CORRECTNESS_r*.json`` or (b) sit inside the
current front-50 ``_DRIVER_WINDOW`` so THIS round's driver run checks
it.  Adding a query without rotating it forward fails CI immediately.
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER_CHECKS_PER_ROUND = 50


def _historically_checked() -> set[str]:
    ok: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as f:
            rows = json.load(f)
        for qid, row in rows.items():
            hard_fail = (
                row.get("rows_match") is False
                or row.get("hash_match") is False
                or (row.get("err") not in (None, "no_oracle"))
            )
            if not hard_fail:
                ok.add(qid)
    return ok


def test_every_registered_query_is_driver_checked_or_front50():
    from etl_pipeline_fresh_picked_leads_spark.queries import QUERIES

    front = list(QUERIES)[:DRIVER_CHECKS_PER_ROUND]
    checked = _historically_checked()
    unverified = [q for q in QUERIES if q not in checked and q not in front]
    assert not unverified, (
        f"{len(unverified)} registered queries have never been driver-"
        f"verified and are NOT in the current front-{DRIVER_CHECKS_PER_ROUND}"
        f" window — rotate them forward in queries/__init__.py: {unverified}"
    )


def test_driver_window_is_exactly_ordered_prefix():
    """The rotation actually applied: _DRIVER_WINDOW must be the
    registry's leading prefix (dict order IS the driver's order)."""
    from etl_pipeline_fresh_picked_leads_spark.queries import (
        _DRIVER_WINDOW,
        QUERIES,
    )

    assert list(QUERIES)[: len(_DRIVER_WINDOW)] == list(_DRIVER_WINDOW)
    # entries past index 49 silently fall outside the driver's check
    assert len(_DRIVER_WINDOW) <= DRIVER_CHECKS_PER_ROUND
