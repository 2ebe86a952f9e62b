"""Local mimic of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry at sf0.01 and compare against its
``oracle_sql()`` in DuckDB — row count, column set, and exact
(order-insensitive) values. Keeping this green keeps CORRECTNESS_r{N} green.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

from .conftest import SF_SMALL


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        k = pdf[c].dtype.kind
        if k in "iu":
            pdf[c] = pdf[c].astype("int64")
        elif k == "M":
            pdf[c] = pd.to_datetime(pdf[c]).astype("datetime64[us]")
        elif k == "O":
            pdf[c] = pdf[c].astype(object)
    return pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)


def _compare(got: pd.DataFrame, exp: pd.DataFrame, name: str):
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    # The driver's value-hash is dtype-sensitive: an oracle column that lands
    # in pandas as float64 (e.g. DuckDB HUGEINT from an uncast sum(int)) will
    # hash-mismatch a Spark int64 even when every value is numerically equal.
    # Assert dtype KIND parity up front so the local mimic can never pass a
    # query the driver fails on dtype grounds (VERDICT r1 item 1).
    for c in sorted(got.columns):
        gk, ek = got[c].dtype.kind, exp[c].dtype.kind
        assert gk == ek, (
            f"{name}.{c}: dtype kind mismatch — spark {got[c].dtype} ({gk!r}) "
            f"vs oracle {exp[c].dtype} ({ek!r}); cast the oracle (::BIGINT / "
            f"::DOUBLE) or the Spark column so both sides materialize alike"
        )
    g, e = _canon(got), _canon(exp)
    for c in g.columns:
        if g[c].dtype.kind == "f":
            ga, ea = g[c].to_numpy(), e[c].astype(float).to_numpy()
            ok = (ga == ea) | (np.isnan(ga) & np.isnan(ea))
        else:
            ok = (g[c].astype(object).where(pd.notna(g[c]), None)
                  == e[c].astype(object).where(pd.notna(e[c]), None)).to_numpy()
        bad = np.flatnonzero(~np.asarray(ok, dtype=bool))
        assert bad.size == 0, (
            f"{name}.{c}: {bad.size} mismatches; first row {bad[0]}:\n"
            f"got {g.iloc[bad[0]].to_dict()}\nexp {e.iloc[bad[0]].to_dict()}"
        )


QUERIES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERIES)
def test_driver_contract(spark, ddb, name):
    q = entrymod.queries()[name]
    got = q(spark, SF_SMALL).toPandas()
    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        assert len(got) > 0, f"{name}: rows-only check failed (empty result)"
        return
    exp = ddb.execute(oracle).df()
    _compare(got, exp, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields][:2] == ["conv_id", "bucket_start"]
