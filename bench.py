"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

The FINAL stdout line is the driver contract:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": <sf>}
and MUST stay under ~1.5 KB — the driver captures only the last ~2 KB
of stdout, and round 6's line outgrew it (BENCH_r06.json parsed:null).
So the final line carries ONE compact per-query map (steady min-of-2,
2 dp — the signal CLAUDE.md says to trust) plus scalars; the full
detail (single-shot, steady, normalized, errors, full precision) goes
to an EARLIER stdout line and to BENCH_DETAIL.json in the repo.
tests/test_bench_format.py pins both the parse and the size.

Execution is forced with the noop sink (full computation, no driver
collect) so timings measure the engine, not result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_pipeline_fresh_picked_leads_spark.queries import QUERIES
from etl_pipeline_fresh_picked_leads_spark.session import build_session

# Representative spread: scan+agg, joins (shuffle + broadcast + theta),
# windows (incl. RANGE frame), set ops, multi-key sort, pivot,
# scalar-expression-heavy, Arrow UDF, set-heavy dedup, similarity,
# text, streaming replay.  (r2 additions per VERDICT r1 item 7:
# q_union_distinct, q_except, q_sort_multi, q_win_range, q_str_regex,
# q_udf_pandas.)
HEADLINE = [
    "q_agg_group",
    "q_join_inner",
    "q_join_broadcast",
    "q_join_theta",
    "q_join_asof",
    "q_topk_pergroup",
    "q_win_running",
    "q_win_range",
    "q_sort_multi",
    "q_union_distinct",
    "q_except",
    "q_str_regex",
    "q_udf_pandas",
    "q_pivot",
    "q_agg_rollup",
    "q_dedup_fuzzy",
    "q_dedup_content_hash",
    "q_sim_topk",
    "q_text_tokens",
    "q_text_quality",
    "q_text_repetition",
    "q_text_pii_redact",
    "q_text_decontaminate",
    "q_retention_cohorts",
    "q_funnel_steps",
    "q_stream_tumbling",
    # r4 additions: exact duplicated-span coverage (explode+groupBy+
    # window) and int8 quantization (stats pass + map-only transform)
    "q_text_dup_spans",
    "q_embed_quantize",
    # r5 additions: temperature corpus mixing (broadcast rates +
    # explode) and z-order compaction (quantile binning + Morton sort)
    "q_mix_temperature",
    "q_txtable_zorder",
    # composite TPC-H shapes: multi-join + agg + top-k end to end
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q10",
    # time-series resampling + gap filling
    "q_time_bars",
    "q_win_fill_forward",
    # r6 additions: distributed global ntile (range partition + offset
    # broadcast), decorrelated scalar subquery, having-semijoin top-k,
    # bloom-pruned semi join
    "q_win_ntile",
    "q_tpch_q17",
    "q_tpch_q18",
    "q_join_bloom",
    # r7 additions: correlated-MIN decorrelation over a derived
    # relation (Q2) and the 8-table market-share join (Q8)
    "q_tpch_q2",
    "q_tpch_q8",
    # r8 additions: log-depth transitive closure (pointer doubling with
    # parquet-spilled rounds; cost is per-round fixed overhead) and the
    # CHECK-constraint-gated TxTable write path.  q_sim_join_auto /
    # q_dedup_embed_lsh stay out of the headline deliberately: their
    # steady cost is the forced-IVF verify / exact-contract matmul
    # (7-9 s), probed and explained in PLANS.md round-8 instead.
    "q_graph_closure",
    "q_txtable_constraint",
    # r8: full MERGE INTO — semi-join affected-file search with
    # manifest-stats candidate pruning + one full-outer clause
    # resolution (q_stream_cdc_apply stays out: micro-batch startup
    # would dominate the measurement, like the other J-tier rows)
    "q_txtable_merge",
    # r9: merge-on-read mutations — sidecar write + anti-join read,
    # the DV lifecycle (delete->compact->vacuum) end to end
    "q_txtable_delete_dv",
    # r10: exact CoW change feed — merge/update/replace_where each
    # writing its _cdf sidecar, then the full-window feed read
    "q_txtable_cdf_cow",
    # r11: disjoint-writer range mutations — stats-pruned read sets,
    # a staged commit race, rebase-without-recompute (the concurrent-
    # backfill shape; the r11 streaming queries stay out of the
    # headline like the rest of the J-tier — micro-batch startup
    # would dominate the measurement)
    "q_txtable_replace_range",
    # r12: partitioned layout (split writer + scoped OPTIMIZE + pruned
    # read), watermark identity assignment (two pinned-partition
    # passes, no global shuffle), and the composed exact->LSH->CC
    # dedup pipeline (the end-to-end curation entry point)
    "q_txtable_partitioned",
    "q_txtable_identity",
    "q_dedup_pipeline",
    # r13: the SQL DML statement sequence (INSERT..TRY_CAST landing +
    # CoW stamping UPDATE + full-matrix MERGE, all dispatched from SQL
    # text — the reference-idiom mutation path end to end).  The
    # streaming partitioned-sink query stays out with the rest of the
    # J-tier (micro-batch startup would dominate the measurement).
    "q_txtable_sql_dml",
    # r14: the full-scan I/O canary (see _MIN3 note), exact
    # duplicated-span REMOVAL (the Lee et al. rewrite half: gram
    # groupBy + anti-join + position-ordered rebuild), and
    # policy-driven maintenance (metadata qualification + scoped
    # compact + purge_dvs + vacuum in one call)
    "q_scan_parquet",
    "q_text_remove_dup_spans",
    "q_txtable_maintain",
]
_R14_ADDITIONS = [
    "q_scan_parquet", "q_text_remove_dup_spans", "q_txtable_maintain"
]

# The BENCH_r01 query set — a FIXED cross-round subtotal (VERDICT r8
# item 7): the headline total grows every round as queries are added,
# so `value` alone reads as a regression when it's really new
# coverage.  baseline15_total is comparable across every round since
# r1 without re-deriving the common subset by hand.
BASELINE15 = [
    "q_agg_group", "q_agg_rollup", "q_dedup_content_hash",
    "q_dedup_fuzzy", "q_join_asof", "q_join_broadcast", "q_join_inner",
    "q_join_theta", "q_pivot", "q_sim_topk", "q_stream_tumbling",
    "q_text_quality", "q_text_tokens", "q_topk_pergroup",
    "q_win_running",
]

# Last round's headline set (BENCH_r13), for the other fixed
# comparison: common_prev_total isolates "did anything we both ran
# get slower" from "we added new queries".
PREV_HEADLINE = [q for q in HEADLINE if q not in _R14_ADDITIONS]

# Fixed TxTable-tier subtotal (VERDICT r9 #7): the transactional tier
# is the fastest-growing slice of the headline; like BASELINE15 this
# set is PINNED as of r10 so later rounds' DV/CDF/conflict work has a
# stable cross-round regression guard.
TXTABLE_TIER = [
    "q_txtable_zorder", "q_txtable_constraint", "q_txtable_merge",
    "q_txtable_delete_dv", "q_txtable_cdf_cow",
]


# Queries that get the canary's min-of-3 treatment (r13, VERDICT r12
# #6): q_txtable_zorder swung 1.2->2.3->3.0s across r9-r12 SESSIONS
# with no plan change (min-of-3 isolation confirmed) — its timed
# region includes a multi-commit table build whose first-run I/O noise
# min-of-2 doesn't reliably shave.  One extra run stabilizes it.
# r14 (VERDICT r13 #7): q_scan_parquet is the SECOND canary — the
# 6-row q_agg_group canary under-tracks I/O-phase box swings (r13's
# three-phase session falsely flagged q_txtable_constraint), so
# regression flags now require >1.25x under BOTH normalizations
# before printing.
_MIN3 = {"q_agg_group", "q_txtable_zorder", "q_scan_parquet"}


def load_prev_round(repo_dir: str) -> "dict | None":
    """Newest committed BENCH_r*.json — last round's per-query steady
    map + canary, the baseline for mechanical regression verdicts."""
    import glob as _glob
    import re as _re

    best, best_n = None, -1
    for p in _glob.glob(os.path.join(repo_dir, "BENCH_r*.json")):
        m = _re.search(r"BENCH_r(\d+)\.json$", p)
        if m and int(m.group(1)) > best_n:
            best, best_n = p, int(m.group(1))
    if best is None:
        return None
    try:
        with open(best) as f:
            prev = json.load(f)
        if isinstance(prev, dict) and isinstance(
            prev.get("parsed"), dict
        ):
            prev = prev["parsed"]  # driver wraps the final line
        if not isinstance(prev, dict) or not prev.get("queries"):
            return None
        prev["_round"] = best_n
        return prev
    except (OSError, json.JSONDecodeError):
        return None


def regression_verdicts(
    steady: dict[str, float],
    canary: "float | None",
    prev: "dict | None",
    threshold: float = 1.25,
    io_canary: "float | None" = None,
) -> tuple["dict | None", list[str]]:
    """Per-query canary-normalized ratio vs last round (r13, VERDICT
    r12 #8 — the adjudication done by hand every round, mechanized):
    ratio = (steady/canary) / (prev_steady/prev_canary).  Box-speed
    cancels on both sides; > threshold flags a real slowdown
    candidate.  Returns (ratio map, flagged ids).

    r14 (VERDICT r13 #7): when BOTH rounds carry the I/O canary
    (q_scan_parquet, ``canary_io_sec``), a flag must exceed the
    threshold under BOTH normalizations — the 6-row CPU canary
    under-tracks I/O-phase box swings (r13's false flag on
    q_txtable_constraint), and a genuine query regression moves the
    ratio under every honest denominator.  Rounds before the I/O
    canary existed degrade to CPU-only flagging."""
    if not prev or not canary:
        return None, []
    prev_canary = prev.get("canary_sec")
    prev_q = prev.get("queries") or {}
    if not prev_canary:
        return None, []
    ratios = {}
    for qid, t in steady.items():
        pt = prev_q.get(qid)
        if pt and pt > 0:
            ratios[qid] = round((t / canary) / (pt / prev_canary), 3)
    flagged = [q for q, r in sorted(ratios.items()) if r > threshold]
    prev_io = prev.get("canary_io_sec")
    if io_canary and prev_io:
        flagged = [
            q
            for q in flagged
            if prev_q.get(q)
            and (steady[q] / io_canary) / (prev_q[q] / prev_io)
            > threshold
        ]
    return ratios, flagged


def build_outputs(
    timings: dict[str, float],
    steady: dict[str, float],
    errors: dict[str, str],
    sf: float,
    prev: "dict | None" = None,
) -> tuple[dict, dict]:
    """(detail_dict, final_dict) — separated so tests can pin the
    final driver-contract line's size/parseability without running
    the bench (tests/test_bench_format.py)."""
    total = round(sum(timings.values()), 3)
    total_steady = round(sum(steady.values()), 3)
    # Canary normalization (VERDICT r4 item 6): the box's wall-clock
    # swings ±20-70% between sessions, so raw seconds from different
    # runs aren't comparable.  q_agg_group is the unchanged-since-r1
    # canary; each query divided by the canary from the SAME run gives
    # a box-speed-independent number that IS comparable across rounds.
    # VERDICT r6 item 2: normalize the STEADY timings by the STEADY
    # canary — the single-shot pass carries per-query JIT/codegen cost
    # (~35%) that made r6's normalized map contradict its steady map.
    # A broken canary must be VISIBLE, not silently un-normalized
    # (ADVICE r5): normalized figures are null when the canary errored.
    canary = steady.get("q_agg_group")
    io_canary = steady.get("q_scan_parquet")  # r14 second canary
    normalized = (
        {qid: round(t / canary, 3) for qid, t in steady.items()}
        if canary
        else None
    )
    ratios, flagged = regression_verdicts(
        steady, canary, prev, io_canary=io_canary
    )
    detail = {
        "queries_single_shot": timings,
        "queries_steady": steady,
        "queries_normalized": normalized,
        # r13 (VERDICT r12 #8): canary-normalized ratio vs the newest
        # committed BENCH_r*.json — >1.25x entries are the slowdown
        # candidates a human previously re-derived by hand each round
        "normalized_vs_prev": ratios,
        "prev_round": prev.get("_round") if prev else None,
        "regressions_over_1_25x": flagged,
        "total_single_shot": total,
        "total_steady": total_steady,
        "canary": "q_agg_group",
        "canary_kind": "steady_min_of_3",  # r12: one extra canary run
        "min_of_3_queries": sorted(_MIN3),  # r13: zorder joins the club
        "canary_steady_sec": canary,
        "canary_single_shot_sec": timings.get("q_agg_group"),
        # r14: the I/O canary (full parquet scan, min-of-3) — flags in
        # regressions_over_1_25x now require >threshold under BOTH
        # canary normalizations (VERDICT r13 #7)
        "canary_io": "q_scan_parquet",
        "canary_io_steady_sec": io_canary,
        # r13 size diet: the prev-headline subtotal moved here from
        # the final line (the 51-query map left it 18 bytes over the
        # 1.5 KB budget); normalized_vs_prev supersedes it anyway
        "common_prev_total": round(
            sum(steady.get(q, 0.0) for q in PREV_HEADLINE), 3
        ),
        # r14 size diet: total_steady/total_normalized/txtable_total
        # and the queries_kind marker live ONLY here now — the
        # 54-query worst-case final line outgrew the 1.5 KB budget
        # when the I/O canary landed.  `queries` in the final line is
        # the steady min-of-2 map (unchanged semantics since r7).
        "total_normalized": (
            round(total_steady / canary, 3) if canary else None
        ),
        "queries_kind": "steady_min_of_2",
        "txtable_total": round(
            sum(steady.get(q, 0.0) for q in TXTABLE_TIER), 3
        ),
        "errors": errors,
        "sf": sf,
    }
    final = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        # steady min-of-2 map (semantics marker queries_kind moved to
        # the detail artifact in r14's size diet; unchanged since r7)
        "queries": {q: round(t, 2) for q, t in steady.items()},
        # r12/r14 size diet: `value` IS the single-shot total; steady
        # totals/normalized/txtable subtotal live in BENCH_DETAIL.json.
        # The two canaries MUST stay here — next round's
        # regression_verdicts reads them from this committed line.
        "canary_sec": canary,
        "canary_io_sec": io_canary,
        # fixed cross-round subtotal (steady): the r1 query set
        "baseline15_total": round(
            sum(steady.get(q, 0.0) for q in BASELINE15), 3
        ),
        "n_errors": len(errors),
        "sf": sf,
    }
    return detail, final


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"
    spark = build_session(app_name="fpl-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup on the smallest table so per-query timings
    # measure steady-state execution.
    QUERIES["q_agg_group"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    steady: dict[str, float] = {}
    errors: dict[str, str] = {}
    for qid in HEADLINE:
        try:
            runs = []
            # canary min-of-3 (VERDICT r11 #7): every normalized figure
            # divides by the canary, so its own noise multiplies into
            # all of them — one extra run tightens the denominator
            for _ in range(3 if qid in _MIN3 else 2):
                t0 = time.time()
                QUERIES[qid](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(round(time.time() - t0, 3))
            # first run keeps the historical single-shot semantics
            # (includes per-query codegen compile); min-of-2 is the
            # steady-state signal — the box's ±20-70% session noise
            # and one-shot JIT cost hit the first run hardest
            timings[qid] = runs[0]
            steady[qid] = min(runs)
        except Exception as e:  # one broken query must not void the run
            errors[qid] = str(e).splitlines()[0][:200]

    repo_dir = os.path.dirname(os.path.abspath(__file__))
    prev = load_prev_round(repo_dir)
    detail, final = build_outputs(
        timings, steady, errors, float(sf), prev=prev
    )
    # Full-precision detail: an early stdout line (scrolls out of the
    # driver's 2 KB tail harmlessly) + an in-repo artifact.
    print(json.dumps({"bench_detail": detail}))
    if detail.get("regressions_over_1_25x"):
        print(
            "REGRESSION CANDIDATES (canary-normalized > 1.25x vs "
            f"BENCH_r{detail['prev_round']}): "
            + ", ".join(detail["regressions_over_1_25x"])
        )
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
        "w",
    ) as f:
        json.dump(detail, f, indent=1)
    # The driver-contract line: LAST on stdout, compact (< 1.5 KB —
    # tests/test_bench_format.py enforces).  `queries` is the steady
    # map at 2 dp; `value` keeps the historical single-shot-total
    # semantics for cross-round comparability.
    print(json.dumps(final, separators=(",", ":")))


if __name__ == "__main__":
    main()
