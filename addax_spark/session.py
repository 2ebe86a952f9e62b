"""SparkSession factory tuned for the rollup engine.

Local-mode testing knobs come from the environment:
- SPARK_GRAFT_CPUS   parallelism for local[N] (default: all cores)
- SPARK_GRAFT_SF_DIR default data dir for bench (/root/testdata/sf0.1)

Design notes for cluster scale (the real target is 1000-executor / 100 TB):
- AQE on: runtime partition coalescing + skew-join splitting replace the
  reference's hand-rolled sampled split points
  (reference: lib/addax-rdbms/.../SingleTableSplitUtil.java:271-329).
- shuffle.partitions is sized to cores locally; on a cluster it should be
  ~2-3x total executor cores, and AQE coalesces small post-shuffle outputs.
- Timezone pinned UTC (the reference defaults to GMT+8 —
  core/.../element/ColumnCast.java:91 — an explicit anti-goal here: bucket
  boundaries must be timezone-independent).
- Arrow enabled: all Python-side compute goes through vectorized pandas
  UDFs (north_rule: no per-row Python).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "addax_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``cores`` controls local[N]; on a real cluster the master is supplied by
    spark-submit and this builder only sets SQL-level conf.
    """
    n = cores or cpu_count()
    shuffle = shuffle_partitions or max(n, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # partition-overwrite used by retention/compaction rewrites when the
        # Iceberg catalog is absent (sandbox): only the touched partitions
        # are replaced, mirroring Iceberg overwritePartitions()
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    # If no master configured externally, run local[n].
    if not os.environ.get("SPARK_GRAFT_EXTERNAL_MASTER"):
        b = b.master(f"local[{n}]")
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
