"""In-suite regeneration sweep (VERDICT r8 #6): the full oracle gate
must stay green against a SHIFTED corpus (renamed nations, +37-day
dates, +1000 doc/vec ids) — the guard that keeps planted-constant
queries honest when the driver regenerates its testdata.  Query-design
discipline (CLAUDE.md): in-query constants must be MODULAR key
arithmetic or data-derived picks, never value/date literals; this test
is what fails when someone forgets.

Runs the gate as a subprocess (its own Spark session, same as the
driver) at sf0.001 — a few minutes, the slowest single test in the
suite by design.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_full_gate_green_on_regenerated_corpus():
    from regen_sweep import build_variant

    dst = build_variant("/root/testdata/sf0.001")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "check_oracle.py"),
            dst,
        ],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    tail = "\n".join(proc.stdout.splitlines()[-30:])
    assert proc.returncode == 0, f"regen sweep gate failed:\n{tail}"
    assert " 0 fail, 0 error" in tail, tail
