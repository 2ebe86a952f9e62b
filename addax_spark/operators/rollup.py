"""Continuous-aggregate tier rollups (1m/5m/1h/1d) with exact `last` semantics.

The analytic layer the reference lacks entirely (SURVEY.md §2.5: Addax has no
joins/aggregations — the closest artifacts are the InfluxDB2 pivot query,
InfluxDB2Reader.java:147-204, and TDengine time-bucket splits,
TDengineReader.java:124-141). Built natively on Spark groupBy/agg so Catalyst
plans partial (map-side) + final aggregation — one shuffle per tier, and the
cascade re-aggregates tier N from tier N-1 instead of rescanning raw data
(the "continuous aggregate" pattern: 5m buckets = exact merge of five 1m
buckets because 60 | 300 | 3600 | 86400).

Determinism contract (BASELINE.json: "exact rolled-up point parity"):
- `last` = row with max (ts, turn_idx): max_by over a struct key — total
  order, ties broken by turn_idx, identical at any parallelism.
- avg is DERIVED (sum/count on exact int64) rather than engine avg(), so the
  double result is bit-identical across engines and accumulation orders.

Plan audit (see PLANS.md): the struct-keyed max_by puts a struct in the
aggregation buffer, so Spark plans SortAggregate instead of HashAggregate.
Measured alternatives on 2.8M rows / 8 cores: packed-int64 key (bounds
turn_idx to 2^26) — still SortAggregate because last_text's string buffer
also blocks hash agg, ~5% faster, not worth the bound; numeric-only agg +
join-back for last_text — 1.6x SLOWER (extra join pass). SortAggregate
still does map-side partial aggregation, so the shuffle carries one row per
(key, bucket, map partition) either way; the sort is per already-small
partial groups. Struct key kept deliberately.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .bucketize import TIER_ORDER, TIERS, bucket_start

#: columns of a tier table (schema.ROLLUP)
ROLLUP_COLS = [
    "conv_id",
    "bucket_start",
    "turn_count",
    "sum_len",
    "min_len",
    "max_len",
    "avg_len",
    "last_ts",
    "last_turn_idx",
    "last_text",
]


def rollup_from_raw(
    df: DataFrame,
    tier: str,
    value: Column | None = None,
    key: str = "conv_id",
) -> DataFrame:
    """Aggregate raw transcripts into one tier directly.

    ``value`` defaults to ``length(text)`` (int64 — keeps sum/avg exact).
    One shuffle on (key, bucket); partial aggregation is map-side so the
    shuffle carries one row per (key, bucket, map-partition), not raw turns.
    """
    v = (value if value is not None else F.length("text")).cast("long")
    ord_key = F.struct(F.col("ts"), F.col("turn_idx"))
    out = (
        df.withColumn("bucket_start", bucket_start("ts", tier))
        .groupBy(key, "bucket_start")
        .agg(
            F.count(F.lit(1)).alias("turn_count"),
            F.sum(v).alias("sum_len"),
            F.min(v).alias("min_len"),
            F.max(v).alias("max_len"),
            F.max_by(F.col("ts"), ord_key).alias("last_ts"),
            F.max_by(F.col("turn_idx"), ord_key).alias("last_turn_idx"),
            F.max_by(F.col("text"), ord_key).alias("last_text"),
        )
        .withColumn("avg_len", F.col("sum_len").cast("double") / F.col("turn_count"))
    )
    return out.select(*_cols(key))


def rollup_cascade_step(lower: DataFrame, tier: str, key: str = "conv_id") -> DataFrame:
    """Exact re-aggregation of a coarser tier from the next finer tier table.

    count/sum -> sum of partials; min/max -> min/max of partials; last ->
    max_by on (last_ts, last_turn_idx); avg rederived from merged sums.
    This is the classic partial/final agg merge — at 100 TB the 5m/1h/1d
    tiers never touch raw data again.
    """
    ord_key = F.struct(F.col("last_ts"), F.col("last_turn_idx"))
    out = (
        lower.withColumn("bucket_start2", bucket_start("bucket_start", tier))
        .groupBy(key, "bucket_start2")
        .agg(
            F.sum("turn_count").alias("turn_count"),
            F.sum("sum_len").alias("sum_len"),
            F.min("min_len").alias("min_len"),
            F.max("max_len").alias("max_len"),
            F.max_by(F.col("last_ts"), ord_key).alias("last_ts"),
            F.max_by(F.col("last_turn_idx"), ord_key).alias("last_turn_idx"),
            F.max_by(F.col("last_text"), ord_key).alias("last_text"),
        )
        .withColumnRenamed("bucket_start2", "bucket_start")
        .withColumn("avg_len", F.col("sum_len").cast("double") / F.col("turn_count"))
    )
    return out.select(*_cols(key))


def rollup_all_tiers(
    df: DataFrame,
    tiers: list[str] | None = None,
    value: Column | None = None,
    key: str = "conv_id",
) -> dict[str, DataFrame]:
    """Build every tier: raw -> 1m, then cascade 1m -> 5m -> 1h -> 1d.

    Only the 1m rollup reads raw turns; each coarser tier aggregates the
    previous one (≥60x smaller input per step at scale).
    """
    tiers = tiers or TIER_ORDER
    assert tiers == sorted(tiers, key=lambda t: TIERS[t])
    out: dict[str, DataFrame] = {}
    prev: DataFrame | None = None
    for t in tiers:
        cur = rollup_from_raw(df, t, value, key) if prev is None else rollup_cascade_step(prev, t, key)
        out[t] = cur
        prev = cur
    return out


def _cols(key: str) -> list:
    cols = list(ROLLUP_COLS)
    cols[0] = key
    return cols


def rollup_from_raw_salted(
    df: DataFrame,
    tier: str,
    value: Column | None = None,
    key: str = "conv_id",
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-resistant two-phase variant of :func:`rollup_from_raw`.

    Phase 1 aggregates on (key, bucket, salt) — a deterministic xxhash64
    salt derived from turn_idx splits a hot (key, bucket) group across
    ``salt_buckets`` reducers (the engine's answer to the reference's
    sampled skew-resistant split points, SingleTableSplitUtil.java:271-329,
    made deterministic). Phase 2 merges the partials exactly like the tier
    cascade merge (sums of sums, min/max of partials, max_by of lasts), so
    results are identical to the unsalted rollup at any parallelism.

    Use when single (key, bucket) groups are huge relative to a partition —
    e.g. 1d buckets of pathological conversations; for ordinary transcripts
    the unsalted single-shuffle plan is cheaper (one shuffle vs two)."""
    v = (value if value is not None else F.length("text")).cast("long")
    ord_key = F.struct(F.col("ts"), F.col("turn_idx"))
    salt = F.pmod(F.xxhash64(F.col(key), F.col("turn_idx")), F.lit(salt_buckets))
    partial = (
        df.withColumn("bucket_start", bucket_start("ts", tier))
        .withColumn("_salt", salt)
        .groupBy(key, "bucket_start", "_salt")
        .agg(
            F.count(F.lit(1)).alias("turn_count"),
            F.sum(v).alias("sum_len"),
            F.min(v).alias("min_len"),
            F.max(v).alias("max_len"),
            F.max_by(F.col("ts"), ord_key).alias("last_ts"),
            F.max_by(F.col("turn_idx"), ord_key).alias("last_turn_idx"),
            F.max_by(F.col("text"), ord_key).alias("last_text"),
        )
    )
    merge_ord = F.struct(F.col("last_ts"), F.col("last_turn_idx"))
    out = (
        partial.groupBy(key, "bucket_start")
        .agg(
            F.sum("turn_count").alias("turn_count"),
            F.sum("sum_len").alias("sum_len"),
            F.min("min_len").alias("min_len"),
            F.max("max_len").alias("max_len"),
            F.max_by(F.col("last_ts"), merge_ord).alias("last_ts"),
            F.max_by(F.col("last_turn_idx"), merge_ord).alias("last_turn_idx"),
            F.max_by(F.col("last_text"), merge_ord).alias("last_text"),
        )
        .withColumn("avg_len", F.col("sum_len").cast("double") / F.col("turn_count"))
    )
    return out.select(*_cols(key))
