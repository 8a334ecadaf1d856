"""Stream-static joins: enrich a stream with a dimension table.

The static side is broadcast per micro-batch — no stream-side shuffle,
the same rule as the batch star joins (queries/joins.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dim(
    stream: DataFrame, dim: DataFrame, stream_key: str, dim_key: str
) -> DataFrame:
    return stream.join(
        F.broadcast(dim), stream[stream_key] == dim[dim_key], "inner"
    )
