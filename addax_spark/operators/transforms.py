"""Record transformers: Spark-native re-expression of the reference's six
built-in transformers (registered at core/.../transport/transformer/
TransformerRegistry.java:204-215, executed per-record by
TransformerExchanger.java:65-138).

Semantics preserved exactly, quirks included:

- dx_filter DROPS the matching record (inverse of SQL WHERE) —
  FilterTransformer.java:51-105; its `like` is a full-match Java regex
  (String.matches, :375-395), so the Spark translation is rlike anchored
  with ^$ — NOT SQL LIKE.
- dx_substr errors when start > len in the reference (:66-70); we keep the
  reference's null-passthrough and clamp the overflow (:76-83).
- dx_pad pads to target length or TRUNCATES when longer —
  PadTransformer.java:45-123.
- dx_replace splices replaceString over [start, start+length) —
  ReplaceTransformer.java:45-97.
- dx_map applies {+,-,*,/,%} BigDecimal arithmetic on a numeric-string
  column — MapTransformer.java:51-118 (we use DecimalType(38,10)).
- dx_groovy (GroovyTransformer.java:49-124) has no translation: arbitrary
  per-record code is the anti-pattern; custom logic enters as vectorized
  pandas UDFs or column exprs.

Each transformer is (DataFrame, config) -> DataFrame; `chain` applies a list
in order, like the reference's per-record transformer chain.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OPS = {">": "__gt__", "<": "__lt__", ">=": "__ge__", "<=": "__le__", "=": "__eq__", "!=": "__ne__"}


def dx_filter(df: DataFrame, col: str, op: str, value) -> DataFrame:
    """Drop records matching the predicate (reference semantics: filter-OUT,
    FilterTransformer.java:51-105; 'like' = anchored Java-regex match)."""
    c = F.col(col)
    if op == "like":
        drop = c.rlike(f"^(?:{value})$")
    elif op == "not like":
        drop = ~c.rlike(f"^(?:{value})$")
    elif op in _OPS:
        drop = getattr(c, _OPS[op])(F.lit(value))
    else:
        raise ValueError(f"dx_filter: unknown op {op!r}")
    # null comparison never matches -> record kept (reference keeps nulls on
    # >/<; = 'null' handled by caller with isNull)
    return df.filter(~F.coalesce(drop, F.lit(False)))


def dx_substr(df: DataFrame, col: str, start: int, length: int) -> DataFrame:
    """substring with overflow clamp (SubstrTransformer.java:51-102);
    0-based start as in the reference config."""
    c = F.col(col)
    return df.withColumn(
        col, F.when(c.isNull(), None).otherwise(F.substring(c, start + 1, length))
    )


def dx_pad(df: DataFrame, col: str, side: str, target_len: int, pad: str) -> DataFrame:
    """l/r pad to target length; longer values truncated
    (PadTransformer.java:45-123)."""
    c = F.col(col)
    padded = F.lpad(c, target_len, pad) if side == "l" else F.rpad(c, target_len, pad)
    return df.withColumn(col, F.when(c.isNull(), None).otherwise(padded))


def dx_replace(df: DataFrame, col: str, start: int, length: int, repl: str) -> DataFrame:
    """Splice repl over [start, start+length) (ReplaceTransformer.java:45-97).
    overlay() truncates at repl end; the reference keeps the tail — so an
    explicit concat of head + repl + tail."""
    c = F.col(col)
    spliced = F.concat(
        F.substring(c, 1, start),
        F.lit(repl),
        F.when(F.length(c) > start + length, F.expr(f"substring({col}, {start + length + 1})")).otherwise(F.lit("")),
    )
    return df.withColumn(col, F.when(c.isNull(), None).otherwise(spliced))


def dx_map(df: DataFrame, col: str, op: str, operand: str) -> DataFrame:
    """Decimal arithmetic on a numeric column (MapTransformer.java:51-118,
    BigDecimal ops in util/MathUtil.java:175-287). DecimalType(38,10) keeps
    exactness like BigDecimal; result rendered back to string like the
    reference's stringly columns."""
    c = F.col(col).cast("decimal(38,10)")
    o = F.lit(operand).cast("decimal(38,10)")
    res = {
        "+": c + o,
        "-": c - o,
        "*": c * o,
        "/": c / o,
        "%": c % o,
    }[op]
    return df.withColumn(col, res)


@dataclass
class Transform:
    name: str
    args: tuple


def chain(df: DataFrame, transforms: list[Transform]) -> DataFrame:
    """Apply transformers in order (the reference's chain evaluation,
    TransformerExchanger.java:65-138; a dropped record short-circuits)."""
    fns = {
        "dx_filter": dx_filter,
        "dx_substr": dx_substr,
        "dx_pad": dx_pad,
        "dx_replace": dx_replace,
        "dx_map": dx_map,
    }
    for t in transforms:
        df = fns[t.name](df, *t.args)
    return df
