"""Sources: Spark DataSource-V2 re-expression of the reference's 33 reader
plugins (SURVEY.md §2.1). Files (CSV/JSON/parquet/ORC/text) map to
spark.read with the reference's column-config semantics; JDBC maps to
partitioned spark.read.jdbc; the synthetic streamreader maps to
addax_spark.synth; NoSQL/REST connectors are out of scope (connector
datasources exist upstream)."""
