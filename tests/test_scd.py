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


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_scd2_invariants_under_arbitrary_batches(spark, data):
    """Fold 1-3 random batches into a random initial dimension; for
    ANY sequence: (a) exactly one current row per live key, (b) a
    key's intervals are non-overlapping and contiguous, (c) the final
    current slice equals a driver-side replay of last-write-wins."""
    from datetime import timedelta

    keys = list(range(1, data.draw(st.integers(2, 5)) + 1))
    cities = ["rome", "oslo", "lima", None]

    def rand_batch(avail):
        ks = data.draw(
            st.lists(st.sampled_from(avail), min_size=1, max_size=4,
                     unique=True)
        )
        return [(k, data.draw(st.sampled_from(cities))) for k in ks]

    init = [(k, data.draw(st.sampled_from(cities))) for k in keys]
    dim = scd2_init(_mk(spark, init), D0)
    expected = {k: c for k, c in init}
    n_batches = data.draw(st.integers(1, 3))
    for i in range(n_batches):
        when = D0 + timedelta(days=30 * (i + 1))
        batch = rand_batch(keys + [max(keys) + 1 + i])
        dim = scd2_apply(dim, _mk(spark, batch), "k", ["city"], when)
        expected.update({k: c for k, c in batch})

    rows = dim.collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.k, []).append(r)
    cur = {r.k: r.city for r in rows if r.is_current}
    assert cur == expected  # last write wins
    for k, vs in by_key.items():
        assert sum(1 for r in vs if r.is_current) == 1
        ordered = sorted(vs, key=lambda r: r.valid_from)
        for a, b in zip(ordered, ordered[1:]):
            assert a.valid_to == b.valid_from  # contiguous, no overlap
        assert ordered[-1].valid_to is None
