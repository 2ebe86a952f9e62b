"""Shared column-expression library (portable across Spark and the DuckDB
oracle — every function here has an exact SQL twin)."""
