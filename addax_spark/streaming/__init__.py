"""Structured Streaming layer: streaming tier rollup with watermarked late
data (the reference's only stream source is a bounded Kafka poll loop,
plugin/reader/kafkareader/.../KafkaReader.java:125-133 — no watermarks, no
windows; Spark's readStream + window + watermark is the native upgrade)."""
