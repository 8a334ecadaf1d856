"""Property-based reconciliation invariants (SURVEY §5.2 item 4):
whatever the input schema/values, ingest never throws, output schema
equals the target, and row counts are preserved.
"""

from __future__ import annotations

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql.types import (
    BooleanType,
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_pipeline_fresh_picked_leads_spark.sources.ingest import reconcile

_colname = st.text(string.ascii_lowercase, min_size=1, max_size=8)
_cell = st.one_of(
    st.none(),
    st.integers(-(10**12), 10**12).map(str),
    st.floats(allow_nan=False, allow_infinity=False).map(str),
    st.text(string.printable, max_size=20),
    st.sampled_from(["true", "false", "2024-01-01", "13/45/2020", "n/a", ""]),
)
_target_type = st.sampled_from(
    [LongType(), DoubleType(), BooleanType(), DateType(), StringType()]
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_reconcile_total_and_shape_preserving(spark, data):
    src_cols = data.draw(
        st.lists(_colname, min_size=1, max_size=5, unique=True)
    )
    tgt_cols = data.draw(
        st.lists(_colname, min_size=1, max_size=5, unique=True)
    )
    target = StructType(
        [StructField(c, data.draw(_target_type)) for c in tgt_cols]
    )
    n_rows = data.draw(st.integers(1, 5))
    rows = [
        tuple(data.draw(_cell) for _ in src_cols) for _ in range(n_rows)
    ]
    raw = spark.createDataFrame(
        rows, schema=StructType([StructField(c, StringType()) for c in src_cols])
    )

    out = reconcile(raw, target)  # must never raise (SAFE_CAST contract)
    assert out.schema == target            # exact target schema, in order
    assert out.count() == n_rows           # row count preserved
    out.collect()                          # and materializes cleanly
