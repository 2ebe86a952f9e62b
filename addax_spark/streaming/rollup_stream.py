"""Streaming 1m rollup: readStream -> watermark -> windowed agg.

Same aggregate semantics as the batch tier (operators.rollup), expressed on
event-time windows so late turns inside the watermark still land in their
bucket; `last` uses max(struct(ts, turn_idx, text)) (streaming-supported
lexicographic struct max == batch max_by on (ts, turn_idx) since turn_idx
is unique per conv).

Sources: file streams (parquet dirs — the sandbox path) or Kafka
(`readStream.format("kafka")` + from_json on a real cluster; the schema
contract is identical). Sink: append-mode parquet/console/memory; the
watermark closes a bucket once event time passes bucket_end + delay, which
is exactly the tier table's eventual-consistency contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bucketize import TIERS
from ..schema import TRANSCRIPTS


def read_transcript_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 10
) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_rollup(
    stream: DataFrame,
    tier: str = "1m",
    watermark: str = "10 minutes",
    key: str = "conv_id",
) -> DataFrame:
    """Windowed continuous aggregate over an unbounded transcript stream."""
    v = F.length("text").cast("long")
    step = TIERS[tier]
    last = F.max(F.struct(F.col("ts"), F.col("turn_idx"), F.col("text"))).alias("_last")
    out = (
        stream.withWatermark("ts", watermark)
        .groupBy(key, F.window("ts", f"{step} seconds").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("turn_count"),
            F.sum(v).alias("sum_len"),
            F.min(v).alias("min_len"),
            F.max(v).alias("max_len"),
            last,
        )
    )
    return out.select(
        key,
        F.col("w.start").alias("bucket_start"),
        "turn_count",
        "sum_len",
        "min_len",
        "max_len",
        (F.col("sum_len").cast("double") / F.col("turn_count")).alias("avg_len"),
        F.col("_last.ts").alias("last_ts"),
        F.col("_last.turn_idx").alias("last_turn_idx"),
        F.col("_last.text").alias("last_text"),
    )


def run_to_memory(
    spark: SparkSession, src_path: str, name: str = "stream_rollup", tier: str = "1m"
) -> None:
    """Drain the source with availableNow and materialize into an in-memory
    table (test/debug harness; production uses parquet/Iceberg sink with
    checkpointLocation)."""
    q = (
        stream_rollup(read_transcript_stream(spark, src_path), tier)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
