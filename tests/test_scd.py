"""SCD2 dimension merge (operators/scd.py): close/insert semantics,
idempotency on an unchanged batch, null-safe change detection, and
point-in-time lookup."""

from __future__ import annotations

from datetime import date

from etl_pipeline_fresh_picked_leads_spark.operators.scd import (
    scd2_apply,
    scd2_asof,
    scd2_init,
)

D0, D1, D2 = date(2024, 1, 1), date(2024, 6, 1), date(2024, 9, 1)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k int, city string")


def _state(df):
    return sorted(
        (r.k, str(r.city), str(r.valid_from), str(r.valid_to), r.is_current)
        for r in df.collect()
    )


def test_scd2_close_insert_passthrough(spark):
    dim = scd2_init(_mk(spark, [(1, "rome"), (2, "oslo")]), D0)
    dim = scd2_apply(
        dim, _mk(spark, [(1, "lima"), (3, "kiev")]), "k", ["city"], D1
    )
    assert _state(dim) == [
        (1, "lima", str(D1), "None", True),   # new version of changed key
        (1, "rome", str(D0), str(D1), False),  # closed old version
        (2, "oslo", str(D0), "None", True),   # untouched pass-through
        (3, "kiev", str(D1), "None", True),   # brand-new key
    ]


def test_scd2_unchanged_batch_is_identity(spark):
    dim = scd2_init(_mk(spark, [(1, "rome"), (2, "oslo")]), D0)
    batch = _mk(spark, [(1, "rome")])  # equal values: no new version
    again = scd2_apply(dim, batch, "k", ["city"], D1)
    assert _state(again) == _state(dim)


def test_scd2_null_transitions_are_changes(spark):
    dim = scd2_init(_mk(spark, [(1, "rome"), (2, None)]), D0)
    batch = _mk(spark, [(1, None), (2, None)])  # 1 changes, 2 does not
    out = scd2_apply(dim, batch, "k", ["city"], D1)
    assert _state(out) == [
        (1, "None", str(D1), "None", True),
        (1, "rome", str(D0), str(D1), False),
        (2, "None", str(D0), "None", True),
    ]


def test_scd2_asof_point_in_time(spark):
    dim = scd2_init(_mk(spark, [(1, "rome")]), D0)
    dim = scd2_apply(dim, _mk(spark, [(1, "lima")]), "k", ["city"], D1)
    dim = scd2_apply(dim, _mk(spark, [(1, "kiev")]), "k", ["city"], D2)
    for when, want in [(D0, "rome"), (D1, "lima"), (D2, "kiev"),
                       (date(2024, 3, 1), "rome"), (date(2030, 1, 1), "kiev")]:
        got = [(r.k, r.city) for r in scd2_asof(dim, when).collect()]
        assert got == [(1, want)], (when, got)
    # three versions total, exactly one current
    assert dim.count() == 3
    assert dim.filter("is_current").count() == 1
