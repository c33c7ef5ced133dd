"""Sources & sinks: parquet/CSV/JSON readers, the TableSpec staging
pipeline, and write helpers."""
