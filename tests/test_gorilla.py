"""Gorilla codec property tests (FIXTURES.md F3): bit-exact round-trips on
regular/irregular cadence, constant values, pathological doubles (NaN
payloads, -0.0, infinities, subnormal/huge magnitudes), single-point and
10k-point chunks — plus the end-to-end Spark encode_chunks/decode_chunks
round trip and compression-ratio sanity."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from addax_spark.operators.gorilla import decode, encode, encode_chunks, decode_chunks


def roundtrip(ts, vals):
    t = np.asarray(ts, dtype=np.int64)
    v = np.asarray(vals, dtype=np.float64)
    blob = encode(t, v)
    t2, v2 = decode(blob)
    assert np.array_equal(t, t2), f"ts mismatch: {t[:5]} vs {t2[:5]}"
    assert np.array_equal(v.view(np.uint64), v2.view(np.uint64)), "value bits mismatch"
    return blob


def test_regular_cadence_compresses_hard():
    n = 5000
    t = np.arange(n, dtype=np.int64) * 1_000_000 + 1_700_000_000_000_000
    v = np.full(n, 42.5)
    blob = roundtrip(t, v)
    # constant delta + constant value -> ~2 bits/point
    assert len(blob) < 24 + n // 3


def test_irregular_with_holes():
    rng = np.random.RandomState(7)
    gaps = rng.randint(1, 300, size=2000).astype(np.int64) * 1_000_000
    gaps[::97] += rng.randint(2, 50, size=len(gaps[::97])) * 60_000_000
    t = 1_700_000_000_000_000 + np.cumsum(gaps)
    v = rng.randn(2000) * 1e3
    roundtrip(t, v)


def test_pathological_doubles():
    specials = [0.0, -0.0, 1e-308, 5e-324, 1e308, np.nan, np.inf, -np.inf,
                float.fromhex("0x1.fffffffffffffp+1023"),
                np.frombuffer(np.uint64(0x7FF8DEADBEEF1234).tobytes(), np.float64)[0]]
    t = np.arange(len(specials), dtype=np.int64) * 17
    roundtrip(t, specials)


def test_single_point_and_empty():
    roundtrip([123456789], [np.pi])
    roundtrip([], [])


def test_10k_points():
    rng = np.random.RandomState(3)
    t = np.cumsum(rng.randint(1, 10**7, size=10_000)).astype(np.int64)
    roundtrip(t, rng.randn(10_000))


def test_large_dod_64bit_bucket():
    # deltas jumping by > 2^31 micros exercise the raw-64-bit branch
    t = np.array([0, 1, 10**12, 10**12 + 5, 3 * 10**12], dtype=np.int64)
    roundtrip(t, [1.0, 2.0, 2.0, -2.0, 1e-100])


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=10**10), min_size=1, max_size=300),
    st.randoms(use_true_random=False),
)
def test_property_roundtrip(gaps, rnd):
    t = np.cumsum(np.asarray(gaps, dtype=np.int64))
    v = np.array([rnd.choice([0.0, rnd.uniform(-1e6, 1e6), rnd.random()]) for _ in gaps])
    roundtrip(t, v)


def test_spark_chunk_roundtrip(spark):
    from addax_spark import synth
    from pyspark.sql import functions as F

    df = synth.transcripts(spark, n_convs=20, avg_turns=25).withColumn(
        "value", F.length("text").cast("double")
    )
    chunks = encode_chunks(df, value="value", chunk_tier="1d", order_cols=["ts", "turn_idx"]).cache()
    m = chunks.agg(
        F.sum("n_points").alias("pts"), F.sum("bytes_raw").alias("raw"), F.sum("bytes_enc").alias("enc")
    ).collect()[0]
    assert m.pts == df.count()
    assert m.enc < m.raw, f"no compression: {m.enc} >= {m.raw}"
    back = decode_chunks(chunks)
    orig = df.select(
        "conv_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    # multiset equality of decoded points vs original series
    assert back.exceptAll(orig).count() == 0
    assert orig.exceptAll(back).count() == 0
    chunks.unpersist()
