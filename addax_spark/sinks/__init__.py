"""Sinks: Spark re-expression of the reference's 32 writer plugins
(SURVEY.md §2.2): file formats via df.write, the table layer (Iceberg
semantics on a parquet layout) via table.py, JDBC via sources.jdbc
(symmetric), noop/stream sinks for benchmarking."""
