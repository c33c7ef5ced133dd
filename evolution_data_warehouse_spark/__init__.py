"""evolution_data_warehouse_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference warehouse (``haelbrek/Evolution-DATA-WAREHOUSE``), re-expressed
Spark-first: DataFrame/SQL logical plans optimized by Catalyst, Parquet
columnar storage, broadcast star joins, window functions, SCD merges as
pure DataFrame algorithms, and a set of large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
plumbing) designed for 100 TB scale.

Layout:
    session.py    SparkSession factory (AQE, UTC, Arrow).
    sources/      readers/writers + the TableSpec staging pipeline.
    functions/    scalar function library (geo, text, hashing).
    operators/    relational + SCD + dedup + similarity + quality + RLS.
    plans/        star-schema datamart views.
    streaming/    Structured Streaming operators over the events table.
    queries/      the op-id → (Spark callable, DuckDB oracle) registry
                  that backs ``__spark_entry__.py``.
"""

__version__ = "0.1.0"
