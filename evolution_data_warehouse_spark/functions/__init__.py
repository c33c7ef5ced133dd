"""Scalar function library (pure pyspark.sql.functions compositions —
JVM-side, codegen-friendly; no row-at-a-time Python UDFs)."""
