"""Query-time serving over the rollup outputs: tier selection via the
retention ladder, partition-pruned range reads, optional gap-fill, and
chunk decode for raw-resolution reads.

This is the "user switches to your repo" surface: given a job's
output_root, answer range queries without knowing the layout.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.gapfill import gapfill
from .operators.gorilla import decode_chunks
from .retention import DEFAULT_POLICY, finest_available_tier


def read_tier(spark: SparkSession, output_root: str, tier: str) -> DataFrame:
    """One tier of the unified tiers table (partition-pruned on tier=/date=)."""
    return spark.read.parquet(f"{output_root}/tiers").filter(F.col("tier") == tier)


def query_range(
    spark: SparkSession,
    output_root: str,
    t0: str,
    t1: str,
    conv_ids: list[str] | None = None,
    tier: str | None = None,
    fill: str | None = None,  # None | 'locf' | 'linear'
    now: dt.date | None = None,
    policy: dict | None = None,
) -> DataFrame:
    """Rolled-up points for [t0, t1), served from the finest tier the
    retention ladder still holds for the range (or an explicit tier).

    The date/tier predicates prune partitions before any file is read;
    conv_id predicates push into the parquet scan. Gap-fill, when asked,
    densifies exactly the requested window (aligned output across convs).
    """
    if tier is None:
        start_date = dt.date.fromisoformat(t0[:10])
        tier = finest_available_tier(
            output_root, start_date, now or dt.date.today(), policy or DEFAULT_POLICY
        )
        if tier is None:
            raise ValueError(f"no tier retains data at {t0}")
    df = (
        read_tier(spark, output_root, tier)
        .filter((F.col("bucket_start") >= t0) & (F.col("bucket_start") < t1))
        .filter((F.col("date") >= t0[:10]) & (F.col("date") <= t1[:10]))
    )
    if conv_ids:
        df = df.filter(F.col("conv_id").isin(conv_ids))
    df = df.drop("tier", "date")
    if fill:
        df = gapfill(
            df,
            tier,
            ["avg_len"],
            methods=(fill,),
            start=F.to_timestamp(F.lit(t0)),
            end=F.to_timestamp(F.lit(t1)) - F.expr("interval 1 second"),
        )
    return df


def read_points(
    spark: SparkSession,
    output_root: str,
    t0: str,
    t1: str,
    conv_ids: list[str] | None = None,
) -> DataFrame:
    """Raw-resolution point series decoded from Gorilla chunks for [t0, t1).

    Chunk partitions are pruned by date; only chunks overlapping the range
    are decoded (chunk-parallel), then point-filtered to the exact bounds.
    """
    ch = spark.read.parquet(f"{output_root}/chunks").filter(
        (F.col("date") >= t0[:10]) & (F.col("date") <= t1[:10])
    )
    if conv_ids:
        ch = ch.filter(F.col("conv_id").isin(conv_ids))
    pts = decode_chunks(ch)
    return pts.filter((F.col("ts") >= t0) & (F.col("ts") < t1))
