"""Gap-fill parity vs DuckDB oracle (LOCF + linear interpolation), plus
edge semantics: leading gaps stay null, single-point series, no
extrapolation past the last observation."""

from __future__ import annotations

import pytest

from addax_spark import synth
from addax_spark.operators.gapfill import gapfill
from addax_spark.operators.rollup import rollup_from_raw

from .conftest import assert_df_equal
from .test_rollup_parity import fixture_data, oracle_rollup_sql  # noqa: F401


ORACLE_GAPFILL = """
WITH r AS ({rollup}),
bounds AS (
  SELECT conv_id, min(bucket_start) AS lo, max(bucket_start) AS hi FROM r GROUP BY conv_id
),
spine AS (
  SELECT conv_id, unnest(generate_series(lo, hi, INTERVAL 60 SECOND)) AS bucket_start FROM bounds
),
dense AS (
  SELECT s.conv_id, s.bucket_start, r.avg_len, r.turn_count,
         (r.conv_id IS NOT NULL) AS obs
  FROM spine s LEFT JOIN r ON r.conv_id = s.conv_id AND r.bucket_start = s.bucket_start
)
SELECT conv_id, bucket_start,
  CASE WHEN obs THEN 'observed' ELSE 'gap' END AS fill_method,
  avg_len, turn_count,
  last_value(CASE WHEN obs THEN avg_len END IGNORE NULLS)
    OVER wb AS avg_len_locf,
  CASE WHEN obs THEN avg_len ELSE
    last_value(CASE WHEN obs THEN avg_len END IGNORE NULLS) OVER wb
    + (first_value(CASE WHEN obs THEN avg_len END IGNORE NULLS) OVER wf
       - last_value(CASE WHEN obs THEN avg_len END IGNORE NULLS) OVER wb)
    * ((epoch_us(bucket_start) - last_value(CASE WHEN obs THEN epoch_us(bucket_start) END IGNORE NULLS) OVER wb)::DOUBLE
       / (first_value(CASE WHEN obs THEN epoch_us(bucket_start) END IGNORE NULLS) OVER wf
          - last_value(CASE WHEN obs THEN epoch_us(bucket_start) END IGNORE NULLS) OVER wb)::DOUBLE)
  END AS avg_len_linear
FROM dense
WINDOW
  wb AS (PARTITION BY conv_id ORDER BY bucket_start ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
  wf AS (PARTITION BY conv_id ORDER BY bucket_start ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
"""


def test_gapfill_parity_1m(spark, ddb, fixture_data):
    r1m = rollup_from_raw(fixture_data, "1m")
    got = gapfill(r1m, "1m", ["avg_len"]).select(
        "conv_id", "bucket_start", "fill_method", "avg_len", "turn_count",
        "avg_len_locf", "avg_len_linear",
    )
    exp = ddb.execute(ORACLE_GAPFILL.format(rollup=oracle_rollup_sql("1m"))).df()
    assert_df_equal(got, exp, ["conv_id", "bucket_start"])


def test_gapfill_dense_and_edges(spark, fixture_data):
    r1m = rollup_from_raw(fixture_data, "1m")
    g = gapfill(r1m, "1m", ["avg_len"]).cache()
    # spine is dense: per conv, (hi-lo)/60s + 1 rows
    import pyspark.sql.functions as F

    chk = (
        g.groupBy("conv_id")
        .agg(
            F.count("*").alias("n"),
            ((F.unix_micros(F.max("bucket_start")) - F.unix_micros(F.min("bucket_start")))
             / 60_000_000 + 1).cast("long").alias("want"),
        )
        .filter("n != want")
        .count()
    )
    assert chk == 0
    # single-point conversation: exactly one row, observed
    single = g.filter("conv_id = 'edge-single'").collect()
    assert len(single) == 1 and single[0].fill_method == "observed"
    # gap rows have null raw value but a locf fill after first observation
    gaps = g.filter("fill_method = 'gap'")
    assert gaps.count() > 0
    assert gaps.filter("avg_len is not null").count() == 0
    assert gaps.filter("avg_len_locf is null").count() == 0  # no leading gaps when spine starts at first obs
    g.unpersist()
