"""§2B-I: UDF / UDAF / UDTF surface.

UDFs are the engine's deliberate slow path (SURVEY §2B-I): everything
expressible as built-ins stays JVM-side; these four queries exist to
prove the Python escape hatches work and to document their cost
ordering — pandas_udf (Arrow-batched) over row-at-a-time F.udf, and
applyInPandas / mapInPandas for grouped / tabular shapes.  The
extension operators (queries/extensions.py) reuse these substrates.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.readers import read_table
from .registry import query


@query(
    "q_udf_scalar",
    oracle="""
SELECT c_custkey,
       lower(trim(regexp_replace(c_name, ' +', ' ', 'g'))) AS name_norm
FROM customer
""",
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (deterministic string normalizer).
    Kept tiny on purpose: this path serializes row-by-row through
    Py4J pickling and is ~10-100x slower than the pandas_udf below —
    never use it in a 100 TB hot path."""

    @F.udf(returnType=StringType(), useArrow=True)
    def normalize(s: str) -> str:
        if s is None:
            return None
        return re.sub(r" +", " ", s.strip()).lower()

    c = read_table(spark, sf_dir, "customer")
    return c.select("c_custkey", normalize(F.col("c_name")).alias("name_norm"))


@query(
    "q_udf_pandas",
    oracle="""
SELECT o_orderkey,
       o_totalprice * 0.9 + 100.0 AS adjusted_price
FROM orders
""",
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized (Arrow-batched) scalar pandas UDF: whole column
    batches cross the JVM<->Python boundary once per batch."""

    @pandas_udf(DoubleType())
    def adjust(price: pd.Series) -> pd.Series:
        return price * 0.9 + 100.0

    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", adjust(F.col("o_totalprice")).alias("adjusted_price")
    )


@query(
    "q_udaf_pandas",
    oracle="""
SELECT o_orderpriority,
       round(
         CAST(SUM(CAST(o_totalprice * (o_custkey % 5 + 1) AS DECIMAL(24,4)))
              AS DOUBLE)
         / CAST(SUM(o_custkey % 5 + 1) AS DOUBLE), 6) AS weighted_avg_price
FROM orders
GROUP BY o_orderpriority
""",
)
def q_udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom grouped aggregation (weighted mean) via applyInPandas.
    Weights/products are pre-computed JVM-side and accumulated with
    exact decimal math inside pandas so the result hash-matches the
    SQL formulation."""
    schema = StructType(
        [
            StructField("o_orderpriority", StringType()),
            StructField("weighted_avg_price", DoubleType()),
        ]
    )

    def weighted_mean(pdf: pd.DataFrame) -> pd.DataFrame:
        # Decimal-exact accumulation (values are 4-dp decimals by
        # construction upstream), mirroring the oracle's DECIMAL sums.
        from decimal import Decimal

        num = sum(Decimal(x) for x in pdf["wp"].map("{:.4f}".format))
        den = int(pdf["w"].sum())
        return pd.DataFrame(
            {
                "o_orderpriority": [pdf["o_orderpriority"].iloc[0]],
                "weighted_avg_price": [round(float(num) / den, 6)],
            }
        )

    o = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        (F.col("o_custkey") % 5 + 1).alias("w"),
        (
            (F.col("o_totalprice") * (F.col("o_custkey") % 5 + 1))
            .cast("decimal(24,4)")
            .cast("double")
        ).alias("wp"),
    )
    return o.groupBy("o_orderpriority").applyInPandas(weighted_mean, schema)


@query(
    "q_udf_cogroup",
    oracle="""
SELECT o.o_orderkey,
       o.o_totalprice,
       COUNT(l.l_orderkey) AS n_lines,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey % 50 = 0
GROUP BY o.o_orderkey, o.o_totalprice
""",
)
def q_udf_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cogroup().applyInPandas — the two-sided custom-merge surface:
    both groups for a key arrive as pandas frames in one Python call.
    Here a per-order line rollup (decimal-exact so it hash-matches the
    SQL join+group formulation); the same shell implements custom
    as-of merges or interval alignment that SQL can't express."""
    schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_totalprice", DoubleType()),
            StructField("n_lines", LongType()),
            StructField("sum_qty", DoubleType()),
        ]
    )

    def merge(orders_pdf: pd.DataFrame, lines_pdf: pd.DataFrame) -> pd.DataFrame:
        if orders_pdf.empty or lines_pdf.empty:
            return pd.DataFrame(
                {c.name: pd.Series(dtype="object") for c in schema.fields}
            )
        cents = int(lines_pdf["l_quantity"].mul(100).round().astype("int64").sum())
        return pd.DataFrame(
            {
                "o_orderkey": [orders_pdf["o_orderkey"].iloc[0]],
                "o_totalprice": [orders_pdf["o_totalprice"].iloc[0]],
                "n_lines": [len(lines_pdf)],
                "sum_qty": [cents / 100.0],
            }
        )

    o = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 50 == 0)
        .select("o_orderkey", "o_totalprice")
    )
    # mirror the key predicate on BOTH sides: cogroup pays one Python
    # invocation per distinct key (~ms each), so unfiltered line keys
    # would 50x the calls only to meet an empty orders group
    l = (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 50 == 0)
        .select("l_orderkey", "l_quantity")
    )
    return (
        o.groupBy("o_orderkey")
        .cogroup(l.groupBy("l_orderkey"))
        .applyInPandas(merge, schema)
    )


@query(
    "q_udtf_mapinpandas",
    oracle="""
SELECT o.o_orderkey,
       CAST(t.i AS INT) AS installment_no,
       o.o_totalprice / 2 AS installment_amount
FROM orders o, generate_series(1, 2) t(i)
""",
)
def q_udtf_mapinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-function shape (1 row -> N rows) via mapInPandas: split
    each order into two deterministic installments.  mapInPandas
    streams Arrow batches per partition — no shuffle, scales linearly
    with input size."""
    schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("installment_no", IntegerType()),
            StructField("installment_amount", DoubleType()),
        ]
    )

    def split_installments(batches):
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "o_orderkey": pdf["o_orderkey"].repeat(2).to_numpy(),
                    "installment_no": [1, 2] * len(pdf),
                    "installment_amount": (pdf["o_totalprice"] / 2)
                    .repeat(2)
                    .to_numpy(),
                }
            )
            yield out

    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return o.mapInPandas(split_installments, schema)
