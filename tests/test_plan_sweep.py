"""Registry-wide structural plan sweep (r7): every non-streaming
registered query's physical plan is checked against two global
invariants, freezing today's intentional exceptions so a regression
(a Python UDF sneaking into a relational pipeline, an equi-join
degenerating to a cartesian product) surfaces as a named diff instead
of silent plan rot.  Complements the per-query pins in test_plans.py.
"""

from __future__ import annotations

from etl_pipeline_fresh_picked_leads_spark.plans import formatted_plan
from etl_pipeline_fresh_picked_leads_spark.queries import QUERIES

from conftest import SF_SMALL

# The 14 queries that legitimately run Python (UDF-contract surface,
# Arrow/BLAS vectorized kernels, mapInPandas decoders, the Misra-Gries
# partition sketch).  Anything NEW appearing here must justify itself:
# pyspark.sql.functions first, Pandas-vectorized second, never
# row-at-a-time (CLAUDE.md / SURVEY §4.3).
PY_EVAL_ALLOWED = {
    "q_agg_heavyhitters",
    "q_audio_features",
    "q_dedup_embed",
    "q_multimodal_features",
    "q_sim_join",
    # q_sim_join_ivf left this list in late r8: its Arrow blocked
    # matmul still runs, but the exact pair frame is now persisted
    # (one matmul for three consumers), so the FINAL plan shows
    # InMemoryTableScan and the marker sits behind the cache boundary
    "q_sim_topk_vectorized",
    "q_udaf_pandas",
    "q_udf_cogroup",
    "q_udf_pandas",
    "q_udf_scalar",
    "q_udtf_lateral",
    "q_udtf_mapinpandas",
    "q_video_frames",
}

_PY_MARKERS = ("BatchEvalPython", "ArrowEvalPython", "InPandas")


def test_registry_plan_sweep(spark):
    py_eval, cartesian, errors = [], [], []
    for qid, fn in QUERIES.items():
        if fn.__module__.rsplit(".", 1)[-1] == "streaming":
            continue  # sink-readback scans; covered by the oracle gate
        try:
            plan = formatted_plan(fn(spark, SF_SMALL))
        except Exception as e:  # noqa: BLE001 - report, don't abort sweep
            errors.append((qid, str(e).splitlines()[0][:120]))
            continue
        if any(m in plan for m in _PY_MARKERS):
            py_eval.append(qid)
        if "CartesianProduct" in plan:
            cartesian.append(qid)
    assert not errors, errors
    assert cartesian == [], (
        f"cartesian products appeared in {cartesian} — an equi-conjunct "
        "was probably lost"
    )
    got = set(py_eval)
    assert got <= PY_EVAL_ALLOWED, (
        f"NEW Python evaluation in {sorted(got - PY_EVAL_ALLOWED)} — "
        "JVM expressions first; update the allowlist only with a "
        "vectorization justification"
    )
    assert PY_EVAL_ALLOWED <= got, (
        f"{sorted(PY_EVAL_ALLOWED - got)} no longer run Python — prune "
        "the allowlist so it stays exact"
    )
