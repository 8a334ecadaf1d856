"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ETL pipeline (ShujaatAli88/
ETL-Pipeline-Fresh-Picked-Leads), re-expressed Spark-first.

The reference (see /root/reference, cited per-module as file:line) is a
daily CSV -> warehouse ETL whose computational core is schema-inference
plus target-schema reconciliation (SAFE_CAST / NULL-fill / drop-extra /
reorder) and ingestion-date stamping.  This package generalizes that
into a full analytics engine:

- ``session``    — SparkSession builder with scale-oriented defaults
- ``sources``    — readers, catalog helpers, the reconciliation ingest
                   engine, and sinks (reference big_uery_handler.py)
- ``operators``  — relational operators (joins/aggs/windows/setops),
                   dedup, similarity search, text analysis, multimodal
- ``functions``  — scalar/array/JSON function surface + UDF examples
- ``streaming``  — Structured Streaming equivalents of the batch ops
- ``queries``    — the named query registry checked by the driver
                   against a DuckDB oracle (SURVEY.md section 2B)
"""

__version__ = "0.1.0"
