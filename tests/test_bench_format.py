"""Guard for the driver-contract bench line (VERDICT r6 items 1/2/6).

BENCH_r06.json recorded ``parsed: null`` because bench.py's single
headline JSON line outgrew the driver's ~2 KB stdout-tail capture.
These tests pin the fix without running the bench: the final line must
stay parseable and < 1.5 KB even at worst-case timing widths, and the
normalized figures must derive from the steady pass.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _worst_case():
    # Every headline query at a 3-digit-seconds timing — wider than any
    # plausible sf0.1 run — plus a couple of errored queries.
    timings = {q: 999.999 for q in bench.HEADLINE}
    steady = {q: 999.999 for q in bench.HEADLINE}
    errors = {q: "x" * 200 for q in bench.HEADLINE[:2]}
    return timings, steady, errors


def test_final_line_is_compact_and_parseable():
    timings, steady, errors = _worst_case()
    _, final = bench.build_outputs(timings, steady, errors, 0.1)
    line = json.dumps(final, separators=(",", ":"))
    assert len(line.encode()) < 1500, (
        f"driver-contract bench line is {len(line.encode())} bytes; the "
        "driver captures only ~2 KB of stdout tail (r6's line was lost) "
        "— move any new per-query payload to the detail line/artifact"
    )
    parsed = json.loads(line)
    # Driver contract shape (prompt spec): metric/value/unit/queries/sf.
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in parsed
    assert parsed["unit"] == "sec"
    assert len(parsed["queries"]) == len(bench.HEADLINE)
    # Errors must not leak their (unbounded) messages into the line.
    assert "errors" not in parsed and parsed["n_errors"] == 2


def test_normalized_uses_steady_pass():
    # Single-shot is 2x steady (JIT-inflated); normalized figures must
    # come from steady/steady so they agree with the steady raw ratios.
    timings = {"q_agg_group": 2.0, "q_other": 8.0}
    steady = {"q_agg_group": 1.0, "q_other": 2.0}
    detail, final = bench.build_outputs(timings, steady, {}, 0.1)
    assert detail["queries_normalized"]["q_other"] == 2.0
    assert detail["canary_steady_sec"] == 1.0
    assert final["canary_sec"] == 1.0
    # r14 size diet: the steady/normalized totals live in the detail
    # artifact only (the I/O canary pushed the final line past 1.5 KB)
    assert detail["total_normalized"] == 3.0
    assert detail["total_steady"] == 3.0
    # Historical single-shot total is preserved under its old name.
    assert final["value"] == 10.0
    assert detail["total_single_shot"] == 10.0


def test_canary_failure_stays_visible():
    timings = {"q_other": 8.0}
    steady = {"q_other": 2.0}
    detail, final = bench.build_outputs(
        timings, steady, {"q_agg_group": "boom"}, 0.1
    )
    assert detail["queries_normalized"] is None
    assert detail["total_normalized"] is None
    assert final["canary_sec"] is None
    assert final["n_errors"] == 1


def test_regression_verdicts_normalize_by_canary():
    # box 2x slower this round: raw ratios double, normalized flat
    prev = {"queries": {"q_a": 1.0, "q_b": 2.0}, "canary_sec": 0.5}
    steady = {"q_a": 2.0, "q_b": 6.0, "q_new": 1.0}
    ratios, flagged = bench.regression_verdicts(steady, 1.0, prev)
    assert ratios == {"q_a": 1.0, "q_b": 1.5}  # q_new has no baseline
    assert flagged == ["q_b"]
    # no canary / no prev -> verdicts degrade to None, never crash
    assert bench.regression_verdicts(steady, None, prev) == (None, [])
    assert bench.regression_verdicts(steady, 1.0, None) == (None, [])


def test_load_prev_round_picks_newest(tmp_path):
    for n, canary in ((3, 1.0), (12, 2.0)):
        (tmp_path / f"BENCH_r{n:02d}.json").write_text(
            json.dumps(
                {"queries": {"q_a": 1.0}, "canary_sec": canary}
            )
        )
    (tmp_path / "BENCH_r05.json").write_text("not json")
    prev = bench.load_prev_round(str(tmp_path))
    assert prev["_round"] == 12 and prev["canary_sec"] == 2.0
    # the driver wraps bench's final line under "parsed" — the real
    # BENCH_r*.json shape (r13: the first loader missed this and
    # every ratio silently degraded to None)
    (tmp_path / "BENCH_r13.json").write_text(
        json.dumps(
            {
                "n": 13,
                "tail": "...",
                "parsed": {"queries": {"q_a": 2.0}, "canary_sec": 4.0},
            }
        )
    )
    prev = bench.load_prev_round(str(tmp_path))
    assert prev["_round"] == 13 and prev["canary_sec"] == 4.0


def test_detail_carries_regression_fields():
    timings, steady, errors = _worst_case()
    prev = {
        "_round": 12,
        "queries": {q: 999.999 for q in bench.HEADLINE},
        "canary_sec": 999.999,
    }
    detail, final = bench.build_outputs(timings, steady, errors, 0.1, prev)
    assert detail["prev_round"] == 12
    assert detail["regressions_over_1_25x"] == []
    assert all(v == 1.0 for v in detail["normalized_vs_prev"].values())
    # the final driver line must NOT grow from the new fields
    assert "normalized_vs_prev" not in final


def test_regression_flags_require_both_canaries():
    """r14 (VERDICT r13 #7): a >1.25x flag must hold under BOTH the
    CPU and the I/O canary normalization when both rounds carry them
    — an I/O-phase box swing moves one denominator but not a genuine
    query regression."""
    prev = {
        "queries": {"q_a": 1.0},
        "canary_sec": 1.0,
        "canary_io_sec": 1.0,
    }
    steady = {"q_a": 2.0}
    # CPU-normalized ratio 2.0 but the I/O canary also doubled (an
    # I/O-phase swing): io-normalized ratio 1.0 -> suppressed
    ratios, flagged = bench.regression_verdicts(
        steady, 1.0, prev, io_canary=2.0
    )
    assert ratios["q_a"] == 2.0 and flagged == []
    # both normalizations exceed the threshold -> flagged
    _, flagged = bench.regression_verdicts(
        steady, 1.0, prev, io_canary=1.0
    )
    assert flagged == ["q_a"]
    # a prev round without the I/O canary degrades to CPU-only flags
    prev_old = {"queries": {"q_a": 1.0}, "canary_sec": 1.0}
    _, flagged = bench.regression_verdicts(
        steady, 1.0, prev_old, io_canary=1.0
    )
    assert flagged == ["q_a"]
