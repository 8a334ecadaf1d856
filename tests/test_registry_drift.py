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


def test_rotation_tool_cohort_math(tmp_path):
    """tools/rotation.py: newest-green only counts fully-matching
    rows (a hash mismatch or an err must NOT advance a query's
    freshness — that is exactly the staleness the rotation exists to
    burn down)."""
    import json

    from tools.rotation import newest_green

    ok = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"q_a": ok, "q_b": ok, "q_c": ok})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps(
            {
                "q_a": ok,                                 # advances
                "q_b": {**ok, "hash_match": False},        # must NOT
                "q_c": {**ok, "err": "boom"},              # must NOT
            }
        )
    )
    green = newest_green(str(tmp_path))
    assert green == {"q_a": 2, "q_b": 1, "q_c": 1}
