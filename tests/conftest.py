"""Shared test fixtures: one SparkSession per run, a DuckDB oracle
connection with the driver-provided tables registered, and an exact-equality
DataFrame comparison (BASELINE.json: "exact rolled-up point parity").
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from addax_spark.session import get_spark

SF_TINY = "/root/testdata/sf0.001"
SF_SMALL = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    s = get_spark("addax_spark_tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for sf, prefix in [(SF_TINY, "t_"), (SF_SMALL, "")]:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {prefix}{t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
            )
    yield con
    con.close()


def assert_df_equal(spark_df, expected_pdf: pd.DataFrame, sort_cols: list[str]):
    """Exact-equality compare: collect Spark result, sort both by key, compare
    cell-by-cell (floats must be bit-identical — the engine derives doubles
    from exact int64 sums so this is achievable)."""
    got = spark_df.toPandas()
    assert sorted(got.columns) == sorted(expected_pdf.columns), (
        f"columns differ: {sorted(got.columns)} vs {sorted(expected_pdf.columns)}"
    )
    cols = list(expected_pdf.columns)
    got = got[cols].sort_values(sort_cols).reset_index(drop=True)
    exp = expected_pdf.sort_values(sort_cols).reset_index(drop=True)
    assert len(got) == len(exp), f"row counts differ: {len(got)} vs {len(exp)}"
    for c in cols:
        g, e = got[c], exp[c]
        if g.dtype.kind == "f" or e.dtype.kind == "f":
            same = [
                (math.isnan(a) and math.isnan(b)) or a == b
                for a, b in zip(g.astype(float).fillna(float("nan")), e.astype(float).fillna(float("nan")))
            ]
            bad = [i for i, ok in enumerate(same) if not ok]
        else:
            ga = g.astype(object).where(pd.notna(g), None)
            ea = e.astype(object).where(pd.notna(e), None)
            bad = [i for i, (a, b) in enumerate(zip(ga, ea)) if a != b]
        assert not bad, (
            f"column {c!r}: {len(bad)} mismatches, first at row {bad[0]}:\n"
            f"got: {got.iloc[bad[0]].to_dict()}\nexp: {exp.iloc[bad[0]].to_dict()}"
        )
