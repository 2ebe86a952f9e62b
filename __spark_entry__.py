"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Engine package: ``addax_spark`` (see SURVEY.md §7). Transcript-shaped input
for the rollup operators is derived deterministically from `events`
(conv := user, turn order := (ts, event_id)) so Spark and the DuckDB oracle
see the same data.
"""

from __future__ import annotations

import functools
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from addax_spark import api  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full 4-tier continuous-aggregate cascade; returns the 1h
    tier over sf0.001 (driver checks rows > 0, stable schema)."""
    return api.rollup_tier(spark, "/root/testdata/sf0.001", "1h")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for tier in ["1m", "5m", "1h", "1d"]:
        q[f"rollup_{tier}"] = functools.partial(_rollup_tier, tier)
    q["gapfill_1m"] = api.gapfill_1m
    q["gorilla_roundtrip"] = api.gorilla_roundtrip
    q["gorilla_chunk_stats"] = api.gorilla_chunk_stats
    q["gorilla_chunk_counts"] = api.gorilla_chunk_counts
    # training-data pipeline ops (documents / embeddings)
    q["token_stats"] = api.token_stats
    q["quality_score"] = api.quality_score
    q["lang_id"] = api.lang_id
    q["fingerprint"] = api.fingerprint
    q["exact_dedup"] = api.exact_dedup
    q["minhash_dedup"] = api.minhash_dedup
    q["simhash"] = api.simhash
    q["dedup_clusters"] = api.dedup_clusters
    q["corpus_keep"] = api.corpus_keep
    q["stratified_sample"] = api.stratified_sample
    q["embedding_dedup"] = api.embedding_dedup
    q["embedding_lsh_dedup"] = api.embedding_lsh_dedup
    q["topk_cosine"] = api.topk_cosine
    q["ann_lsh"] = api.ann_lsh
    q["ann_ivf"] = api.ann_ivf
    q["transform_chain"] = api.transform_chain
    # time-series relational ops
    q["asof_join"] = api.asof_join_events
    q["pivot_1h"] = api.pivot_1h
    q["sessionize"] = api.sessionize_events
    q["rollup_value_1h"] = api.rollup_value_1h
    q["rolling_1h"] = api.rolling_1h
    q["median_value_by_type"] = api.median_value_by_type
    q["pricing_summary"] = api.pricing_summary
    q["revenue_by_nation"] = api.revenue_by_nation
    q["local_supplier_volume"] = api.local_supplier_volume
    q["brand_part_stats"] = api.brand_part_stats
    q["top_customers_per_nation"] = api.top_customers_per_nation
    # serving path: run the real job into a scratch dir, then range-read the
    # WRITTEN tiers/chunks (oracle recomputes from raw -> write+read checked)
    q["serving_range"] = api.serving_range
    q["serving_points"] = api.serving_points
    q["serving_range_filled"] = api.serving_range_filled
    q["serving_range_linear"] = api.serving_range_linear
    q["retention_ladder"] = api.retention_ladder
    q["compaction_roundtrip"] = api.compaction_roundtrip
    q["streaming_rollup_1m"] = api.streaming_rollup_1m
    q["streaming_state"] = api.streaming_state
    return q


def _rollup_tier(tier: str, spark: SparkSession, sf_dir: str) -> DataFrame:
    return api.rollup_tier(spark, sf_dir, tier)


def oracle_sql() -> dict[str, str]:
    o = {f"rollup_{t}": api.oracle_rollup_sql(t) for t in ["1m", "5m", "1h", "1d"]}
    o["gapfill_1m"] = api.oracle_gapfill_sql()
    o["gorilla_roundtrip"] = api.ORACLE_GORILLA_SQL
    o["gorilla_chunk_counts"] = api.ORACLE_GORILLA_COUNTS_SQL
    o.update(api.oracle_text_dedup_sqls())
    o.update(api.oracle_timeseries_sqls())
    o["rollup_value_1h"] = api.ORACLE_ROLLUP_VALUE_SQL
    o["rolling_1h"] = api.ORACLE_ROLLING_SQL
    o["median_value_by_type"] = api.ORACLE_MEDIAN_SQL
    o["pricing_summary"] = api.ORACLE_PRICING_SQL
    o["revenue_by_nation"] = api.ORACLE_REVENUE_SQL
    o["local_supplier_volume"] = api.ORACLE_LOCAL_SUPPLIER_SQL
    o["brand_part_stats"] = api.ORACLE_BRAND_PART_SQL
    o["top_customers_per_nation"] = api.ORACLE_TOP_CUSTOMERS_SQL
    o["serving_range"] = api.oracle_serving_range_sql()
    o["serving_points"] = api.oracle_serving_points_sql()
    o["serving_range_filled"] = api.oracle_serving_range_filled_sql()
    o["serving_range_linear"] = api.oracle_serving_range_linear_sql()
    o["retention_ladder"] = api.oracle_retention_ladder_sql()
    o["compaction_roundtrip"] = api.oracle_compaction_roundtrip_sql()
    # stream == batch after an AvailableNow drain -> the exact batch oracle
    o["streaming_rollup_1m"] = api.oracle_rollup_sql("1m")
    # stateful streaming: final per-conv state after a full drain == the
    # batch recomputation (totals + last-by-key + session count)
    o["streaming_state"] = api.ORACLE_STREAMING_STATE_SQL
    # rows-only (no SQL oracle): gorilla_chunk_stats (binary blob sizes),
    # ann_lsh (approximate by design; recall vs brute force asserted in tests)
    return o
